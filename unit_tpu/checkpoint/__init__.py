from .checkpointer import (
    Checkpointer,
    PeriodicCheckpointerWithEval,
    load_torch_resnet,
    load_glove_embeddings,
    d2_resnet_key_to_flax,
    merge_params_from_orbax,
)

__all__ = [
    "Checkpointer", "PeriodicCheckpointerWithEval", "load_torch_resnet",
    "load_glove_embeddings", "d2_resnet_key_to_flax", "merge_params_from_orbax",
]
