from .checkpointer import (
    Checkpointer,
    PeriodicCheckpointerWithEval,
    load_torch_resnet,
    load_glove_embeddings,
    d2_resnet_key_to_flax,
)

__all__ = [
    "Checkpointer", "PeriodicCheckpointerWithEval", "load_torch_resnet",
    "load_glove_embeddings", "d2_resnet_key_to_flax",
]
