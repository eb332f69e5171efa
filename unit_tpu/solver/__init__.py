from .build import build_optimizer, modify_for_weak_only, warmup_multistep

__all__ = ["build_optimizer", "modify_for_weak_only", "warmup_multistep"]
