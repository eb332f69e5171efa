"""ReLU with an output-saved VJP (backward reads y, not x).

``jax.nn.relu``'s differentiation rule keeps the relu INPUT alive for the
backward pass; XLA then typically materializes it as a u8 ``x > 0`` mask
(measured at ~1.7 ms/step of pure HBM traffic in the R-50-C4 two-stream step,
BASELINE.md "step anatomy").  On conv->BN->relu->conv chains the relu OUTPUT
is already a backward-pass residual — it is the next conv's wgrad operand —
so a VJP that saves ``y`` instead adds NO extra residual and the mask
disappears: ``grad = g * (y > 0)``.

Exactness: ``y = max(x, 0)`` is exact in every dtype, so ``(y > 0) == (x > 0)``
elementwise and the gradient (0 at ``x == 0``) is bit-identical to
``jax.nn.relu``'s custom JVP (``lax.select(x > 0, g, 0)``).

The reference's torch stack stores the relu output for backward for the same
reason (torch ``relu_`` backward keys on the result).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def relu(x):
    return jnp.maximum(x, 0)


def _relu_fwd(x):
    y = jnp.maximum(x, 0)
    return y, y


def _relu_bwd(y, g):
    return (jnp.where(y > 0, g, jnp.zeros_like(g)),)


relu.defvjp(_relu_fwd, _relu_bwd)
