"""PreciseBN: refresh frozen BN statistics over N data batches.

Equivalent of the d2 PreciseBN hook option the reference exposes
(engine/defaults.py:304-311, SURVEY.md §7.3): run the backbone over ``num_iters``
batches collecting per-layer batch statistics (captured by FrozenBN via the
'bn_stats' sow collection) and overwrite the frozen mean/var params with their
averages.  Under a data-parallel mesh the batch statistics are global because
the jitted forward sees the full (sharded) batch.
"""

from __future__ import annotations

from typing import Callable, Iterator

import jax
import jax.numpy as jnp
import numpy as np


def collect_bn_stats(model, params, images: jnp.ndarray):
    """One batch's FrozenBN input statistics: pytree matching the bn modules."""
    from ..models.meta_arch import WSRCNN

    _, aux = model.apply(
        {"params": params}, images, method=WSRCNN.features, mutable=["bn_stats"]
    )
    return aux["bn_stats"]


def precise_bn(model, params, batches: Iterator, num_iters: int = 200):
    """Returns params with FrozenBN mean/var replaced by dataset statistics."""
    acc = None
    n = 0
    fn = jax.jit(lambda p, im: collect_bn_stats(model, p, im))
    for _ in range(num_iters):
        try:
            batch = next(batches)
        except StopIteration:
            break
        stats = fn(params, jnp.asarray(batch["image"]))
        stats = jax.device_get(stats)
        acc = stats if acc is None else jax.tree.map(np.add, acc, stats)
        n += 1
    if n == 0:
        return params

    mean_tree = jax.tree.map(lambda x: x / n, acc)
    new_params = jax.tree_util.tree_map(np.asarray, jax.device_get(params))

    def install(stats_node, params_node):
        # stats_node: {'batch_mean': (v,), 'batch_var': (v,)} per FrozenBN module
        for key, sub in stats_node.items():
            if isinstance(sub, dict) and "batch_mean" in sub:
                tgt = params_node[key]
                tgt["mean"] = np.asarray(sub["batch_mean"][0], tgt["mean"].dtype)
                tgt["var"] = np.asarray(sub["batch_var"][0], tgt["var"].dtype)
            elif isinstance(sub, dict):
                install(sub, params_node[key])

    install(mean_tree, new_params)
    return new_params
