"""Device mesh + sharding helpers: data parallelism the XLA-SPMD way.

Replaces the reference's NCCL DDP + per-step ``comm.synchronize()`` barrier
(engine/defaults.py:282-285, SURVEY.md §5 "Distributed communication backend"):
one jitted program per step over a 1-D ``data`` mesh; batch arrays are sharded on
their leading axis, parameters are replicated, and XLA inserts the gradient
all-reduce over ICI.  No host barrier is needed — dispatch is async.

The mesh is 1-D for pure DP (all the reference supports) but the helpers accept
any axis layout so model/spatial sharding can be layered on later.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None, axis_names: Sequence[str] = (DATA_AXIS,)) -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    shape = (n,) + (1,) * (len(axis_names) - 1)
    return Mesh(np.asarray(devices[:n]).reshape(shape), axis_names)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh, axis: int = 0) -> NamedSharding:
    """Batch sharding over 'data'; ``axis``=1 for stacked grad-accum
    microbatches [A, B, ...] where the BATCH dim (not A) splits."""
    return NamedSharding(mesh, P(*([None] * axis), DATA_AXIS))


def shard_batch(mesh: Mesh, batch: Any, axis: int = 0) -> Any:
    """Device-put a host batch with the leading axis split across the data mesh.

    Multi-process: each process holds only ITS slice of the global batch (the
    loaders host-shard records, loader.py ``_host_shard``); the global array is
    assembled from the per-process local data — the TPU-native replacement for
    the reference's per-rank DistributedSampler + DDP batch split
    (/root/reference/data/build.py:110-122)."""
    sh = data_sharded(mesh, axis=axis)
    multiproc = jax.process_count() > 1

    def put(x):
        if not hasattr(x, "ndim") or x.ndim <= axis:
            return x
        if multiproc:
            return jax.make_array_from_process_local_data(sh, np.asarray(x))
        return jax.device_put(x, sh)

    return jax.tree.map(put, batch)


def replicate(mesh: Mesh, tree: Any) -> Any:
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


# --------------------------------------------------------------- 2-D (data x spatial)
# Beyond-reference scaling: the reference supports DP only (SURVEY §2.6), but
# large-canvas inputs can additionally shard the image HEIGHT across a second
# mesh axis — XLA's SPMD partitioner splits the backbone convolutions spatially
# and inserts the halo exchanges itself; ops that need the full feature map
# (the ROIAlign custom call) get an all-gather inserted automatically.

SPATIAL_AXIS = "spatial"


# --------------------------------------------------------------- FSDP (ZeRO-3 style)
# Beyond-reference scaling: shard the PARAMETERS and optimizer state over the
# data axis too (the reference replicates them per GPU rank via DDP).  Under
# jit's SPMD partitioner this is fully-sharded data parallelism: XLA inserts
# the per-layer all-gather before each use and a reduce-scatter for the
# gradients — the "How to Scale Your Model" FSDP recipe, with no manual
# collectives.  Detection models are small enough to replicate on one chip,
# so this is an opt-in memory/scale mode, not the default.


def fsdp_sharding(mesh: Mesh, tree: Any, min_shard_elems: int = 2**14) -> Any:
    """Per-leaf NamedSharding tree: shard each large leaf's largest
    data-axis-divisible dimension over ``data``; small or indivisible leaves
    (biases, BN scales, scalars) stay replicated — gathering those costs more
    in latency than the bytes saved."""
    n = int(mesh.shape[DATA_AXIS])

    def spec(x):
        shape = getattr(x, "shape", ())
        if not shape or int(np.prod(shape)) < min_shard_elems:
            return NamedSharding(mesh, P())
        for dim in sorted(range(len(shape)), key=lambda i: -shape[i]):
            if shape[dim] % n == 0 and shape[dim] >= n:
                parts = [None] * len(shape)
                parts[dim] = DATA_AXIS
                return NamedSharding(mesh, P(*parts))
        return NamedSharding(mesh, P())

    return jax.tree.map(spec, tree)


def fsdp_shard(mesh: Mesh, tree: Any) -> Any:
    """Device-put a (state) pytree with ``fsdp_sharding``'s per-leaf layout."""
    return jax.tree.map(jax.device_put, tree, fsdp_sharding(mesh, tree))


# --------------------------------------------------------------- TP (data x model)
# Beyond-reference scaling: tensor parallelism the GSPMD way.  The big kernels
# (dual Res5 heads, res4 trunk — everything with >= ``min_channels`` output
# channels) are annotated with their OUTPUT-channel dim split over a second
# 'model' mesh axis; XLA's SPMD partitioner propagates activation shardings
# through the network and inserts the all-gathers / reduce-scatters itself
# (the "How to Scale Your Model" TP recipe: annotate weights, let the
# partitioner place collectives on ICI).  Combines with data parallelism as a
# 2-D (data x model) mesh.  The reference has no model-parallel mode at all.

MODEL_AXIS = "model"


def make_mesh_tp(n_data: int, n_model: int) -> Mesh:
    devices = jax.devices()
    n = n_data * n_model
    assert len(devices) >= n, f"need {n} devices, have {len(devices)}"
    return Mesh(
        np.asarray(devices[:n]).reshape(n_data, n_model),
        (DATA_AXIS, MODEL_AXIS),
    )


def tp_sharding(mesh: Mesh, tree: Any, min_channels: int = 256) -> Any:
    """Per-leaf NamedSharding tree for tensor parallelism: conv kernels
    [kh, kw, cin, cout] and dense kernels [cin, cout] whose output channels
    are model-axis-divisible and >= ``min_channels`` split on 'model'; biases,
    norm scales, small predictors (num-classes outputs) stay replicated —
    GSPMD reshards around them where needed."""
    m = int(mesh.shape[MODEL_AXIS])

    def spec(x):
        shape = getattr(x, "shape", ())
        if (
            m > 1
            and len(shape) in (2, 4)
            and shape[-1] % m == 0
            and shape[-1] >= min_channels
        ):
            parts = [None] * (len(shape) - 1) + [MODEL_AXIS]
            return NamedSharding(mesh, P(*parts))
        return NamedSharding(mesh, P())

    return jax.tree.map(spec, tree)


def tp_shard(mesh: Mesh, tree: Any) -> Any:
    """Device-put a (state) pytree with ``tp_sharding``'s per-leaf layout."""
    return jax.tree.map(jax.device_put, tree, tp_sharding(mesh, tree))


# --------------------------------------------------------------- PP (data x stage)
# Beyond-reference scaling: pipeline parallelism.  A second 'stage' mesh axis
# carries a 2-stage GPipe split of the train step — stage 0 runs the backbone,
# stage 1 runs RPN + ROI heads + losses — with the feature-map handoff as a
# lax.ppermute over ICI and the backward pipeline arising from the ppermute's
# AD transpose (the "How to Scale Your Model" pipelining recipe).  The
# schedule pipelines the TPU.GRAD_ACCUM microbatches; see
# engine/train.py::make_pipeline_train_step.

STAGE_AXIS = "stage"
PIPELINE_STAGES = 2


def make_mesh_pp(n_data: int, n_stage: int = PIPELINE_STAGES) -> Mesh:
    devices = jax.devices()
    n = n_data * n_stage
    assert len(devices) >= n, f"need {n} devices, have {len(devices)}"
    return Mesh(
        np.asarray(devices[:n]).reshape(n_data, n_stage),
        (DATA_AXIS, STAGE_AXIS),
    )


def make_mesh_2d(n_data: int, n_spatial: int) -> Mesh:
    devices = jax.devices()
    n = n_data * n_spatial
    assert len(devices) >= n, f"need {n} devices, have {len(devices)}"
    return Mesh(
        np.asarray(devices[:n]).reshape(n_data, n_spatial),
        (DATA_AXIS, SPATIAL_AXIS),
    )


def spatial_sharded(mesh: Mesh) -> NamedSharding:
    """[B, H, W, C] images: batch over 'data', height over 'spatial'."""
    return NamedSharding(mesh, P(DATA_AXIS, SPATIAL_AXIS))


def shard_batch_spatial(mesh: Mesh, batch: Any) -> Any:
    """Device-put a batch dict with the image array split (batch, height) over
    the (data, spatial) mesh and every other array split on batch only.

    Spatial sharding is keyed on the batch key name ``image`` — NOT on rank:
    other 4-D arrays (e.g. gt_masks [B, G, m, m]) carry non-spatial dims in
    position 1 and must stay batch-sharded."""
    img_sh = spatial_sharded(mesh)
    row_sh = NamedSharding(mesh, P(DATA_AXIS))

    def put(path, x):
        if not hasattr(x, "ndim") or x.ndim == 0:
            return x
        is_image = x.ndim == 4 and any(
            getattr(p, "key", None) == "image" for p in path
        )
        return jax.device_put(x, img_sh if is_image else row_sh)

    return jax.tree_util.tree_map_with_path(put, batch)
