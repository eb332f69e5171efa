"""Training engine: jitted train step + trainer classes mirroring the reference.

Rebuild of /root/reference/engine/defaults.py: ``TrainerNoMeta`` (two-stream base
training, :266-288), ``TrainerFineTune`` (single k-shot stream, :442-463),
``TrainerOnlyWeak`` variants (:377-425) and ``WeakDetectorTrainer``.  The per-step
flow — pull strong + weak batches, forward, backward, allreduce, step — becomes a
single jitted SPMD program; ``comm.synchronize()`` disappears (XLA dispatch is
async) and DDP's allreduce becomes the compiler-inserted gradient psum.
"""

from __future__ import annotations

import time
from collections import deque
from typing import Any, Callable, Dict, Iterator, Optional

import chex
import jax
import jax.numpy as jnp
import optax

from ..models.meta_arch import ModelConfig, WSRCNN
from ..parallel import mesh as mesh_lib


def _compiler_options():
    """Optional XLA compiler options for the train step (perf experiments):
    UNIT_TPU_COMPILER_OPTIONS='{"xla_tpu_scoped_vmem_limit_kib": "32768"}'.
    Local XLA_FLAGS cannot carry TPU-only flags here (the CPU-client parser
    rejects them before the remote compile service ever sees them)."""
    import json
    import os

    s = os.environ.get("UNIT_TPU_COMPILER_OPTIONS", "")
    return json.loads(s) if s else None


@chex.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray


def create_train_state(model: WSRCNN, optimizer, rng, sample_shape=(1, 64, 64, 3)) -> TrainState:
    imgs = jnp.zeros(sample_shape, jnp.float32)
    sizes = jnp.asarray([[sample_shape[1], sample_shape[2]]] * sample_shape[0], jnp.float32)

    # jit the WHOLE state init (model.init AND optimizer.init): eager init
    # dispatches thousands of tiny ops one-by-one, which on a remote-attached
    # TPU pays tunnel latency per op.  An eager optax init alone (zeros_like
    # per leaf x per masked multi-transform label group) measured ~45 min for
    # an R-101 finetune state through the axon tunnel; as one compiled —
    # and persistently cacheable — program it is seconds.
    def _init(rng_):
        variables = model.init(rng_, imgs, sizes)
        params = variables["params"]
        return TrainState(
            params=params,
            opt_state=optimizer.init(params),
            step=jnp.zeros((), jnp.int32),
        )

    return jax.jit(_init)(rng)


def make_train_step(
    model: WSRCNN,
    optimizer: optax.GradientTransformation,
    train_only_weak: bool = False,
    mesh=None,
    state_sharding=None,
    grad_accum: int = 1,
) -> Callable:
    """Build the jitted (state, strong, weak, rng) -> (state, metrics) step.

    With a mesh, batches are sharded over the 'data' axis and params replicated;
    XLA inserts the gradient all-reduce (replaces DDP, engine/defaults.py:282-285).

    With ``state_sharding`` (a TrainState-structured tree of NamedShardings,
    e.g. from ``parallel.fsdp_sharding(mesh, state)``), parameters and
    optimizer state live sharded over the data axis too (FSDP): XLA inserts
    per-layer all-gathers and a gradient reduce-scatter instead of DDP's
    replicate + all-reduce.

    With ``grad_accum`` = A > 1, the strong/weak batches carry a leading
    microbatch axis [A, B, ...]; the step lax.scans over the A microbatches
    (one microbatch's activations live at a time), averages the gradients and
    applies ONE optimizer update — the same larger-effective-batch semantics
    as averaging per-replica gradients in data parallelism.  The support
    (meta) batch is shared by all microbatches.  The reference has no
    accumulation mode (its effective batch is capped by GPU memory).
    """

    # train-mode dropout applies only to the VGG fc heads (torch .train()
    # semantics); other head families get no dropout rng so their step HLO
    # (and compile-cache entry) is unchanged
    needs_dropout = "VGG" in model.mc.box_head_name

    def loss_fn(params, strong, weak, meta, rng):
        losses = model.apply(
            {"params": params}, rng, strong, weak,
            train_only_weak=train_only_weak, meta=meta,
            method=WSRCNN.train_losses,
            rngs={"dropout": jax.random.fold_in(rng, 7)} if needs_dropout else None,
        )
        total = jnp.asarray(0.0)
        for v in losses.values():
            total = total + v
        return total, losses

    def _apply(state, grads, total, losses):
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = dict(losses)
        metrics["total_loss"] = total
        new_state = TrainState(
            params=new_params, opt_state=new_opt, step=state.step + 1
        )
        return new_state, metrics

    if grad_accum <= 1:
        def step_fn(state: TrainState, strong, weak, meta, rng):
            (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, strong, weak, meta, rng
            )
            return _apply(state, grads, total, losses)
    else:
        def step_fn(state: TrainState, strong, weak, meta, rng):
            grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
            micro0 = jax.tree.map(lambda x: x[0], (strong, weak))
            _, loss_shapes = jax.eval_shape(
                loss_fn, state.params, micro0[0], micro0[1], meta, rng
            )
            zeros = lambda t: jax.tree.map(  # noqa: E731
                lambda s: jnp.zeros(getattr(s, "shape", ()), getattr(s, "dtype", jnp.float32)), t
            )
            carry0 = (
                jax.tree.map(jnp.zeros_like, state.params),
                jnp.zeros(()),
                zeros(loss_shapes),
            )

            def micro(carry, xs):
                i, s, w = xs
                (total, losses), g = grad_fn(
                    state.params, s, w, meta, jax.random.fold_in(rng, i)
                )
                g_acc, t_acc, l_acc = carry
                return (
                    jax.tree.map(jnp.add, g_acc, g),
                    t_acc + total,
                    jax.tree.map(jnp.add, l_acc, losses),
                ), None

            (g_acc, t_acc, l_acc), _ = jax.lax.scan(
                micro, carry0, (jnp.arange(grad_accum), strong, weak)
            )
            inv = 1.0 / grad_accum
            grads = jax.tree.map(lambda g: g * inv, g_acc)
            losses = jax.tree.map(lambda v: v * inv, l_acc)
            return _apply(state, grads, t_acc * inv, losses)

    if mesh is None:
        return jax.jit(
            step_fn, donate_argnums=(0,), compiler_options=_compiler_options()
        )
    repl = mesh_lib.replicated(mesh)
    if mesh_lib.SPATIAL_AXIS in mesh.axis_names:
        # 2-D (data x spatial) mesh: batch arrays carry their own shardings
        # from shard_batch_spatial (images split on batch AND height; other
        # arrays on batch) — None lets jit inherit them, and XLA's SPMD
        # partitioner spatially splits the convolutions with halo exchange.
        assert grad_accum <= 1, "grad accumulation + spatial mesh not supported"
        return jax.jit(
            step_fn,
            donate_argnums=(0,),
            in_shardings=(repl, None, None, repl, repl),
            out_shardings=(repl, repl),
            compiler_options=_compiler_options(),
        )
    # stacked [A, B, ...] microbatches shard the BATCH dim (dim 1), not A
    data = mesh_lib.data_sharded(mesh, axis=1 if grad_accum > 1 else 0)
    state_sh = repl if state_sharding is None else state_sharding
    return jax.jit(
        step_fn,
        donate_argnums=(0,),
        in_shardings=(state_sh, data, data, repl, repl),
        out_shardings=(state_sh, repl),
        compiler_options=_compiler_options(),
    )


def _balanced_unit_groups(costs, g):
    """Minimax contiguous partition of ``costs`` into ``g`` non-empty groups.

    Classic linear-partition DP (n <= ~40, g <= ~8 here, so O(g n^2) is
    negligible and, unlike the greedy prefix cut, exact).  Returns
    ``[(start, stop), ...]`` half-open index ranges.
    """
    n = len(costs)
    assert 1 <= g <= n
    prefix = [0.0]
    for c in costs:
        prefix.append(prefix[-1] + c)
    inf = float("inf")
    best = [[inf] * (n + 1) for _ in range(g + 1)]
    cut = [[0] * (n + 1) for _ in range(g + 1)]
    best[0][0] = 0.0
    for k in range(1, g + 1):
        for i in range(k, n + 1):
            for j in range(k - 1, i):
                v = max(best[k - 1][j], prefix[i] - prefix[j])
                if v < best[k][i]:
                    best[k][i] = v
                    cut[k][i] = j
    bounds = [n]
    k = g
    while k > 0:
        bounds.append(cut[k][bounds[-1]])
        k -= 1
    bounds.reverse()
    return [(bounds[t], bounds[t + 1]) for t in range(g)]


def make_pipeline_train_step(
    model: WSRCNN,
    optimizer: optax.GradientTransformation,
    mesh,
    n_micro: int,
    train_only_weak: bool = False,
    remat: bool = True,
) -> Callable:
    """N-stage GPipe pipeline parallelism over a ('data', 'stage') mesh.

    Beyond-reference scaling (the reference is DP-only): the train step is
    split into ``n_stage`` pipeline stages — the backbone's splittable units
    (unit 0 = stem, units 1.. = each bottleneck block of res2..res4;
    ``models.resnet.num_units``) balanced onto stages ``0..n_stage-2`` by a
    minimax contiguous partition, and the final stage runs
    ``train_losses(backbone_feats=...)`` (RPN + ROI heads + losses).  Interior
    bottleneck blocks cost identical FLOPs in every residual stage (spatial
    shrinks 4x exactly as per-pixel channel FLOPs grow 4x), so unit count is
    the cost model (stem = 0.5) and the split stays balanced even for R-101,
    where res4 alone holds 23 of the 30 blocks.  The ``TPU.GRAD_ACCUM``
    microbatches are pipelined GPipe-style: a ``lax.scan``
    over ``n_micro + n_stage - 1`` ticks where, at tick t, stage s processes
    microbatch ``t - s``, with each inter-stage feature handoff a
    ``lax.ppermute`` hop over ICI.  Boundary feature maps have heterogeneous
    shapes (channels double / spatial halves per residual stage), so handoffs
    ride one flat max-size buffer each stage encodes into / decodes from.
    The backward pipeline needs no extra code: the ppermute's AD transpose is
    the reverse ppermute, so cotangents flow stage s -> s-1 tick by tick and
    each stage's segment gradients materialize on its own devices.  Gradients
    are psum'd over 'stage' (each stage holds its slice) and pmean'd over
    'data', then ONE optimizer update applies — the same averaged-microbatch
    semantics as ``grad_accum`` (bubble fraction (n_stage-1)/(n_micro+n_stage-1)).

    With ``remat`` (default), each stage recomputes its microbatch forward
    during backward (the standard GPipe memory discipline: one microbatch's
    activations resident per stage).

    Composes with data parallelism on the first mesh axis.  Requirements:
    both streams (if present) share one canvas per group (the trainer's
    same-canvas stacking guarantees this), no meta/support stream, and a
    ResNet-C4 backbone when ``n_stage > 2`` (the intra-backbone split points
    are its bottleneck blocks; other backbone families support the 2-stage
    backbone/heads boundary split only).
    """
    from math import prod

    from ..parallel.mesh import STAGE_AXIS

    assert STAGE_AXIS in mesh.axis_names, "pipeline step needs a 'stage' mesh axis"
    n_stage = int(mesh.shape[STAGE_AXIS])
    is_resnet = model.mc.backbone_name == "build_resnet_backbone"
    if is_resnet:
        from ..models.resnet import num_units

        n_units = num_units(model.mc.depth)
    else:
        n_units = 1  # opaque backbone: only the backbone/heads boundary split
    assert 2 <= n_stage <= n_units + 1, (
        f"pipeline stages must be in [2, {n_units + 1}] for this backbone, "
        f"got {n_stage}"
    )
    n_data = int(mesh.shape[mesh_lib.DATA_AXIS])
    M = int(n_micro)
    assert M >= 2, "pipeline parallelism pipelines TPU.GRAD_ACCUM microbatches; set GRAD_ACCUM >= 2"

    # Backbone unit groups for stages 0..n_stage-2: minimax-balanced
    # contiguous partition (every interior block costs ~1 unit, the stem ~0.5
    # — it is a cheap C=3 conv but a large-spatial activation).
    g = n_stage - 1
    costs = [0.5] + [1.0] * (n_units - 1)
    groups = _balanced_unit_groups(costs, g)

    needs_dropout = "VGG" in model.mc.box_head_name

    def make_seg(st, sp):
        if st == 0 and sp == n_units:
            # 2-stage split at the backbone/heads boundary works for EVERY
            # backbone family (backbone_features is the whole backbone pass);
            # intra-backbone splits are ResNet-C4 only (backbone_segment).
            def seg(params, s_mb, w_mb, feats):
                return model.apply(
                    {"params": params}, strong=s_mb, weak=w_mb,
                    method=WSRCNN.backbone_features,
                )
        else:
            def seg(params, s_mb, w_mb, feats):
                return model.apply(
                    {"params": params}, strong=s_mb, weak=w_mb, feats=feats,
                    start_unit=st, stop_unit=sp,
                    method=WSRCNN.backbone_segment,
                )
        return seg

    segs = [make_seg(st, sp) for st, sp in groups]
    seg_fns = [jax.checkpoint(s) if remat else s for s in segs]

    def heads(params, feats, strong_mb, weak_mb, rng):
        losses = model.apply(
            {"params": params}, rng, strong_mb, weak_mb,
            train_only_weak=train_only_weak, backbone_feats=feats,
            method=WSRCNN.train_losses,
            rngs={"dropout": jax.random.fold_in(rng, 7)} if needs_dropout else None,
        )
        total = jnp.asarray(0.0)
        for v in losses.values():
            total = total + v
        return total, losses

    heads_fn = jax.checkpoint(heads) if remat else heads

    def pick(tree, i):
        if tree is None:
            return None
        return jax.tree.map(
            lambda x: jax.lax.dynamic_index_in_dim(x, i, 0, keepdims=False), tree
        )

    def grad_fn_local(params, strong, weak, rng):
        # Local shards: strong/weak are [M, B/n_data, ...]; params replicated.
        if n_data > 1:
            # decorrelate per-shard sampling rngs (GSPMD DP splits keys over
            # the global batch; manual mode sees only the local batch)
            rng = jax.random.fold_in(rng, jax.lax.axis_index(mesh_lib.DATA_AXIS))
        s_idx = jax.lax.axis_index(STAGE_AXIS)
        mb0 = (pick(strong, 0), pick(weak, 0))
        # chain the boundary ShapeDtypeStructs through the segment groups
        bound_sds = []
        x_sd = None
        for gi, seg in enumerate(segs):
            x_sd = jax.eval_shape(
                seg, params,
                mb0[0] if gi == 0 else None,
                mb0[1] if gi == 0 else None,
                None if gi == 0 else x_sd,
            )
            bound_sds.append(x_sd)
        _, loss_sds = jax.eval_shape(
            heads, params, bound_sds[-1], mb0[0], mb0[1], rng,
        )
        buf_elems = max(int(prod(sd.shape)) for sd in bound_sds)
        buf_dtype = bound_sds[-1].dtype

        def encode(x):
            flat = x.reshape(-1).astype(buf_dtype)
            return jnp.pad(flat, (0, buf_elems - flat.shape[0]))

        def decode(buf, sd):
            n = int(prod(sd.shape))
            return jax.lax.slice(buf, (0,), (n,)).reshape(sd.shape).astype(sd.dtype)

        zero_buf = lambda: jnp.zeros((buf_elems,), buf_dtype)  # noqa: E731
        zero_losses = lambda: jax.tree.map(  # noqa: E731
            lambda sd: jnp.zeros(sd.shape, sd.dtype), loss_sds
        )

        def local_loss(params):
            def make_branch(stage):
                if stage < n_stage - 1:
                    def br(buf_in, s_mb, w_mb, rng_i):
                        f = seg_fns[stage](
                            params,
                            s_mb if stage == 0 else None,
                            w_mb if stage == 0 else None,
                            None if stage == 0 else decode(buf_in, bound_sds[stage - 1]),
                        )
                        return encode(f), jnp.zeros((), jnp.float32), zero_losses()
                else:
                    def br(buf_in, s_mb, w_mb, rng_i):
                        total_i, losses_i = heads_fn(
                            params, decode(buf_in, bound_sds[-1]), s_mb, w_mb, rng_i,
                        )
                        return zero_buf(), total_i, losses_i
                return br

            branches = [make_branch(s) for s in range(n_stage)]

            def tick(buf_in, t):
                i = jnp.clip(t - s_idx, 0, M - 1)
                s_mb, w_mb = pick(strong, i), pick(weak, i)
                active = (t >= s_idx) & (t - s_idx < M)
                buf_out, total_i, losses_i = jax.lax.cond(
                    active,
                    lambda: jax.lax.switch(
                        s_idx, branches, buf_in, s_mb, w_mb,
                        jax.random.fold_in(rng, i),
                    ),
                    lambda: (zero_buf(), jnp.zeros((), jnp.float32), zero_losses()),
                )
                buf_next = jax.lax.ppermute(
                    buf_out, STAGE_AXIS, [(s, s + 1) for s in range(n_stage - 1)]
                )
                return buf_next, (total_i, losses_i)

            _, (totals, losses_seq) = jax.lax.scan(
                tick, zero_buf(), jnp.arange(M + n_stage - 1)
            )
            inv = 1.0 / M
            total = jnp.sum(totals) * inv
            losses = jax.tree.map(lambda x: jnp.sum(x, axis=0) * inv, losses_seq)
            return total, losses

        (total, losses), grads = jax.value_and_grad(local_loss, has_aux=True)(params)
        # each stage holds its own segment's grads (arrived via the ppermute
        # transposes); 'data' shards average like DP.
        combine = lambda x: jax.lax.pmean(  # noqa: E731
            jax.lax.psum(x, STAGE_AXIS), mesh_lib.DATA_AXIS
        )
        grads = jax.tree.map(combine, grads)
        total = combine(total)
        losses = jax.tree.map(combine, losses)
        return total, losses, grads

    P = jax.sharding.PartitionSpec
    sharded_grad_fn = jax.shard_map(
        grad_fn_local,
        mesh=mesh,
        in_specs=(P(), P(None, mesh_lib.DATA_AXIS), P(None, mesh_lib.DATA_AXIS), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )

    def step_fn(state: TrainState, strong, weak, meta, rng):
        assert meta is None, "pipeline parallelism does not support the meta/support stream"
        total, losses, grads = sharded_grad_fn(state.params, strong, weak, rng)
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = dict(losses)
        metrics["total_loss"] = total
        new_state = TrainState(
            params=new_params, opt_state=new_opt, step=state.step + 1
        )
        return new_state, metrics

    repl = mesh_lib.replicated(mesh)
    data = mesh_lib.data_sharded(mesh, axis=1)  # stacked [M, B, ...]: batch is dim 1
    return jax.jit(
        step_fn,
        donate_argnums=(0,),
        in_shardings=(repl, data, data, repl, repl),
        out_shardings=(repl, repl),
        compiler_options=_compiler_options(),
    )


def make_predict_fn(model: WSRCNN, mesh=None, with_proposals: bool = False) -> Callable:
    # WeakRCNN configs score with the weak detector alone (rcnn.py:21-185)
    method = (
        WSRCNN.predict_weak_only
        if model.mc.meta_architecture == "WeakRCNN"
        else WSRCNN.predict
    )

    if with_proposals:
        # PrecomputedProposals inference (dock suite): proposals come from the
        # batch, the RPN is skipped inside predict
        def predict_fn(params, images, image_sizes, prop_boxes, prop_valid):
            return model.apply(
                {"params": params}, images, image_sizes,
                proposal_boxes=prop_boxes, proposal_valid=prop_valid,
                method=method,
            )
    else:
        def predict_fn(params, images, image_sizes):
            return model.apply({"params": params}, images, image_sizes, method=method)

    if mesh is None:
        return jax.jit(predict_fn)
    repl = mesh_lib.replicated(mesh)
    data = mesh_lib.data_sharded(mesh)
    # in_shardings must match the predict_fn arity: params replicated, every
    # batch array (images, sizes, and — for the dock path — proposal boxes and
    # validity masks) sharded on the leading batch axis
    n_batch_args = 4 if with_proposals else 2
    return jax.jit(
        predict_fn,
        in_shardings=(repl,) + (data,) * n_batch_args,
        out_shardings=data,
    )


class LazyMetrics:
    """Mapping of one step's scalar losses with a DEFERRED device->host fetch.

    The train loop used to ``jax.device_get`` the metric dict every step — a
    synchronous device round trip per iteration, which on a remote-attached
    chip (axon tunnel) costs ~0.3-0.4 s of pure latency and dominated the CLI
    step wall (BASELINE.md round 5).  ``run_step`` now starts an async host
    copy at dispatch and returns this view; the floats materialize on first
    access (tests, anomaly check) or when the trainer's bounded in-flight
    queue forces the oldest entry, so the fetch latency overlaps subsequent
    steps' compute.  Values are identical to the eager fetch — only the time
    at which the host blocks moves.
    """

    __slots__ = ("_dev", "_vals", "_data_time", "step", "_check")

    def __init__(self, device_metrics, data_time: float, step: int,
                 detect_anomaly: bool):
        self._dev = device_metrics
        self._vals: Optional[Dict[str, float]] = None
        self._data_time = data_time
        self.step = step
        self._check = detect_anomaly

    def resolve(self) -> Dict[str, float]:
        if self._vals is None:
            vals = {k: float(v) for k, v in jax.device_get(self._dev).items()}
            vals["data_time"] = self._data_time
            self._dev = None
            self._vals = vals
            # anomaly guard (the reference's _detect_anomaly NaN/Inf check,
            # engine/defaults.py:281): fail fast with the full loss dict.
            # Runs at resolution, i.e. at most metrics_pipeline_depth (or one
            # MetricsHook period) steps after the bad step.
            if self._check and not all(
                v == v and abs(v) != float("inf") for v in vals.values()
            ):
                raise FloatingPointError(
                    f"non-finite loss at iter {self.step}: {vals}"
                )
        return self._vals

    # Mapping surface (dict(), **unpack, json via dict(), item access)
    def __getitem__(self, key):
        return self.resolve()[key]

    def __iter__(self):
        return iter(self.resolve())

    def __len__(self):
        return len(self.resolve())

    def __contains__(self, key):
        return key in self.resolve()

    def keys(self):
        return self.resolve().keys()

    def values(self):
        return self.resolve().values()

    def items(self):
        return self.resolve().items()

    def get(self, key, default=None):
        return self.resolve().get(key, default)

    def __repr__(self):
        return repr(self._vals) if self._vals is not None else (
            f"LazyMetrics(step={self.step}, in flight)"
        )


class TrainerBase:
    """Shared loop: hooks for metrics, periodic checkpoint/eval are supplied by
    the caller (checkpoint/detection_checkpoint.py equivalent lives in
    unit_tpu/checkpoint)."""

    def __init__(
        self,
        model: WSRCNN,
        optimizer,
        strong_iter: Optional[Iterator] = None,
        weak_iter: Optional[Iterator] = None,
        meta_iter: Optional[Iterator] = None,
        rng: Optional[jax.Array] = None,
        mesh=None,
        train_only_weak: bool = False,
        fsdp: bool = False,
        tp: bool = False,
        grad_accum: int = 1,
        pp: bool = False,
    ):
        self.model = model
        self.optimizer = optimizer
        self.strong_iter = strong_iter
        self.weak_iter = weak_iter
        self.meta_iter = meta_iter
        self.mesh = mesh
        self.detect_anomaly = True
        self.rng = rng if rng is not None else jax.random.PRNGKey(0)
        self._train_only_weak = train_only_weak
        self.grad_accum = max(1, int(grad_accum))
        # per-stream, per-canvas-shape buffers for microbatch stacking (an
        # accum group must share one compile bucket, like the loader's own
        # aspect-ratio batching one level down)
        self._accum_buf = {"strong": {}, "weak": {}}
        if fsdp and tp:
            raise ValueError("fsdp and tp are mutually exclusive sharding modes")
        self.pp = bool(pp)
        if self.pp and (fsdp or tp):
            raise ValueError("pipeline parallelism does not compose with FSDP/TP")
        if self.pp and self.grad_accum < 2:
            raise ValueError(
                "pipeline parallelism pipelines the TPU.GRAD_ACCUM microbatches; "
                "set TPU.GRAD_ACCUM >= 2"
            )
        if self.pp and meta_iter is not None:
            raise ValueError("pipeline parallelism does not support the meta stream")
        # FSDP / TP need the state pytree to derive per-leaf shardings, so the
        # step is built lazily in run_step once a state exists
        if mesh is not None and fsdp:
            self._sharding_fn = mesh_lib.fsdp_sharding
        elif mesh is not None and tp:
            self._sharding_fn = mesh_lib.tp_sharding
        else:
            self._sharding_fn = None
        if self.pp:
            self.train_step = make_pipeline_train_step(
                model, optimizer, mesh, n_micro=self.grad_accum,
                train_only_weak=train_only_weak,
            )
        else:
            self.train_step = None if self._sharding_fn else make_train_step(
                model, optimizer, train_only_weak=train_only_weak, mesh=mesh,
                grad_accum=self.grad_accum,
            )
        self._state: Optional[TrainState] = None
        self.stop_requested = False
        # host-side mirror of state.step: reading the device counter every step
        # (int(state.step)) is a host round-trip — expensive on remote-attached
        # TPUs where each fetch pays tunnel latency
        self._host_step: Optional[int] = None
        self.metrics_history = []
        # bounded queue of steps whose metric fetch is still in flight; forcing
        # the oldest when full doubles as dispatch backpressure (the host can
        # not run more than this many steps ahead of the device)
        self.metrics_pipeline_depth = 8
        self._inflight: "deque[LazyMetrics]" = deque()

    @property
    def state(self) -> Optional[TrainState]:
        return self._state

    @state.setter
    def state(self, value):
        # external assignment (checkpoint resume, warm start) may change step;
        # re-sync the host mirror lazily on the next run_step
        self._state = value
        self._host_step = None

    def init_state(self, sample_shape=(1, 64, 64, 3)):
        init_rng, self.rng = jax.random.split(self.rng)
        self.state = create_train_state(self.model, self.optimizer, init_rng, sample_shape)
        if self._sharding_fn is not None:
            self.state = jax.tree.map(
                jax.device_put, self.state, self._sharding_fn(self.mesh, self.state)
            )
        elif self.mesh is not None:
            self.state = mesh_lib.replicate(self.mesh, self.state)
        return self.state

    def _next_stacked(self, it, buffers):
        """Pull microbatches until grad_accum share one canvas shape, then
        stack them into [A, B, ...] (mismatched orientations stay buffered
        for a later group)."""
        import numpy as np

        while True:
            b = next(it)
            key = tuple(b["image"].shape)
            buffers.setdefault(key, []).append(b)
            if len(buffers[key]) == self.grad_accum:
                group = buffers.pop(key)
                return jax.tree.map(lambda *xs: np.stack(xs), *group)

    def _next_stacked_pair(self):
        """PP variant of _next_stacked: the fused stage-0 backbone pass needs
        the strong and weak groups to share ONE canvas, so groups are emitted
        jointly — draw from both streams until some canvas has a full
        grad_accum group in each (with the host-synchronized orientation
        schedule both streams converge on the same canvas within a few
        draws)."""
        import numpy as np

        sb, wb = self._accum_buf["strong"], self._accum_buf["weak"]
        a = self.grad_accum

        def ready():
            for k_s, v_s in sb.items():
                if len(v_s) < a:
                    continue
                for k_w, v_w in wb.items():
                    if len(v_w) >= a and k_s[1:3] == k_w[1:3]:  # same H, W canvas
                        return k_s, k_w
            return None

        while (r := ready()) is None:
            b_s = next(self.strong_iter)
            sb.setdefault(tuple(b_s["image"].shape), []).append(b_s)
            b_w = next(self.weak_iter)
            wb.setdefault(tuple(b_w["image"].shape), []).append(b_w)
        k_s, k_w = r
        group_s, sb[k_s] = sb[k_s][:a], sb[k_s][a:]
        group_w, wb[k_w] = wb[k_w][:a], wb[k_w][a:]
        stack = lambda g: jax.tree.map(lambda *xs: np.stack(xs), *g)  # noqa: E731
        return stack(group_s), stack(group_w)

    def _next_batches(self):
        if self.pp and self.strong_iter is not None and self.weak_iter is not None:
            strong, weak = self._next_stacked_pair()
        elif self.grad_accum > 1:
            strong = (self._next_stacked(self.strong_iter, self._accum_buf["strong"])
                      if self.strong_iter is not None else None)
            weak = (self._next_stacked(self.weak_iter, self._accum_buf["weak"])
                    if self.weak_iter is not None else None)
        else:
            strong = next(self.strong_iter) if self.strong_iter is not None else None
            weak = next(self.weak_iter) if self.weak_iter is not None else None
        meta = next(self.meta_iter) if self.meta_iter is not None else None
        return strong, weak, meta

    def run_step(self) -> Dict[str, float]:
        t0 = time.perf_counter()
        strong, weak, meta = self._next_batches()
        data_time = time.perf_counter() - t0
        if self.mesh is not None:
            ax = 1 if self.grad_accum > 1 else 0  # stacked micros: batch is dim 1
            strong = mesh_lib.shard_batch(self.mesh, strong, axis=ax) if strong else None
            weak = mesh_lib.shard_batch(self.mesh, weak, axis=ax) if weak else None
            # the support stream is replicated, not batch-sharded
            meta = mesh_lib.replicate(self.mesh, meta) if meta else None
        if self.train_step is None:  # FSDP/TP: shardings derive from the state tree
            self.train_step = make_train_step(
                self.model, self.optimizer, train_only_weak=self._train_only_weak,
                mesh=self.mesh,
                state_sharding=self._sharding_fn(self.mesh, self.state),
                grad_accum=self.grad_accum,
            )
        if self._host_step is None:
            self._host_step = int(self.state.step)
        step_rng = jax.random.fold_in(self.rng, self._host_step)
        self._state, metrics = self.train_step(self.state, strong, weak, meta, step_rng)
        self._host_step += 1
        # Deferred host transfer (LazyMetrics): start the D2H copy now so it
        # rides along while later steps compute; blocking per-step here would
        # pay one full device round trip per iteration (tunnel RTT >> step
        # time on remote-attached chips, BASELINE.md round 5).
        for leaf in jax.tree_util.tree_leaves(metrics):
            copy = getattr(leaf, "copy_to_host_async", None)
            if copy is not None:
                copy()
        lazy = LazyMetrics(metrics, data_time, self._host_step,
                           self.detect_anomaly)
        self._inflight.append(lazy)
        if len(self._inflight) > self.metrics_pipeline_depth:
            self._inflight.popleft().resolve()
        self.metrics_history.append(lazy)
        return lazy

    def train(self, max_iter: int, hooks=()):
        """Run until ``state.step`` reaches ``max_iter`` (the reference's
        ``range(start_iter, max_iter)``, defaults.py d2 loop) — a resumed
        state continues from its restored step instead of running max_iter
        MORE steps.  ``request_stop()`` (e.g. from a preemption signal)
        exits the loop cleanly after the current step."""
        assert self.state is not None, "call init_state() first"
        start = int(self.state.step)
        self.stop_requested = False
        try:
            for _ in range(start, max_iter):
                if self.stop_requested:
                    break
                metrics = self.run_step()
                for hook in hooks:
                    hook(self._host_step, metrics, self)
        finally:
            # resolve any still-in-flight metric fetches so the tail steps
            # get their anomaly check and later readers see plain floats
            inflight = getattr(self, "_inflight", None)
            while inflight:
                inflight.popleft().resolve()
        return self.state

    def request_stop(self):
        """Ask the training loop to exit after the in-flight step (safe to
        call from a signal handler or another thread)."""
        self.stop_requested = True

    def close(self):
        """Stop the prefetch threads behind the data iterators (if any)."""
        for it in (self.strong_iter, self.weak_iter, self.meta_iter):
            if it is not None and hasattr(it, "close"):
                it.close()


class TrainerNoMeta(TrainerBase):
    """Base training: strong query + weak classifier streams (defaults.py:266-288)."""


class Trainer(TrainerBase):
    """Full meta-learning trainer (defaults.py:41-248): strong + weak + per-class
    support streams; the support batch feeds the visual-attention prototypes and
    the rank loss each step."""


class TrainerFineTune(TrainerBase):
    """k-shot fine-tuning: strong stream only (defaults.py:442-463)."""

    def __init__(self, *args, **kwargs):
        kwargs.setdefault("weak_iter", None)
        super().__init__(*args, **kwargs)


class TrainerOnlyWeak(TrainerBase):
    """Weak-branch-only training (defaults.py:377-400)."""

    def __init__(self, *args, **kwargs):
        kwargs["train_only_weak"] = True
        super().__init__(*args, **kwargs)


class TrainerOnlyWeakFineTune(TrainerBase):
    """Classifier-data-as-supervised-batch fine-tuning (defaults.py:402-425):
    the reference calls ``model(classifier_data, weak_batched_inputs=None,
    train_only_weak=False)`` — i.e. the (boxed) classifier stream IS the
    supervised batch and there is no weak stream.  The runner supplies
    ``strong_iter`` built from ``cfg.DATASETS.CLASSIFIER_TRAIN`` with the
    seeded classifier sampling (see ``data.loader.build_classifier_strong_loader``)."""

    def __init__(self, *args, **kwargs):
        kwargs["weak_iter"] = None
        super().__init__(*args, **kwargs)

