from .train import (
    Trainer,
    TrainState,
    TrainerBase,
    TrainerNoMeta,
    TrainerFineTune,
    TrainerOnlyWeak,
    TrainerOnlyWeakFineTune,
    create_train_state,
    make_train_step,
    make_predict_fn,
)

__all__ = [
    "TrainState", "Trainer", "TrainerBase", "TrainerNoMeta", "TrainerFineTune",
    "TrainerOnlyWeak", "TrainerOnlyWeakFineTune", "create_train_state", "make_train_step", "make_predict_fn",
]
