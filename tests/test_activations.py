"""unit_tpu.ops.activations.relu — exactness vs jax.nn.relu.

The custom VJP saves the relu OUTPUT for backward (``g * (y > 0)``) so XLA
never materializes a separate u8 ``x > 0`` mask; the value and gradient must
be bit-identical to ``jax.nn.relu`` in every dtype, including the ``x == 0``
subgradient (0, matching jax's custom JVP).
"""

import jax
import jax.numpy as jnp
import numpy as np

from unit_tpu.ops.activations import relu


def test_relu_value_and_grad_exact():
    x = jnp.array([-2.0, -0.0, 0.0, 1e-30, 0.5, 3.0], dtype=jnp.float32)
    np.testing.assert_array_equal(relu(x), jax.nn.relu(x))

    g_ours = jax.grad(lambda v: jnp.sum(relu(v) * jnp.arange(1.0, 7.0)))(x)
    g_ref = jax.grad(lambda v: jnp.sum(jax.nn.relu(v) * jnp.arange(1.0, 7.0)))(x)
    np.testing.assert_array_equal(g_ours, g_ref)
    # subgradient at exactly 0 is 0 (both signed zeros)
    assert g_ours[1] == 0.0 and g_ours[2] == 0.0


def test_relu_bf16_exact():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (128,), dtype=jnp.bfloat16)
    np.testing.assert_array_equal(
        np.asarray(relu(x), np.float32), np.asarray(jax.nn.relu(x), np.float32)
    )
    g = jax.random.normal(jax.random.PRNGKey(1), (128,), dtype=jnp.bfloat16)
    _, vjp_ours = jax.vjp(relu, x)
    _, vjp_ref = jax.vjp(jax.nn.relu, x)
    np.testing.assert_array_equal(
        np.asarray(vjp_ours(g)[0], np.float32), np.asarray(vjp_ref(g)[0], np.float32)
    )


def test_relu_under_jit_and_vmap():
    x = jax.random.normal(jax.random.PRNGKey(2), (4, 8))
    f = jax.jit(jax.vmap(lambda v: jnp.sum(relu(v) ** 2)))
    f_ref = jax.jit(jax.vmap(lambda v: jnp.sum(jax.nn.relu(v) ** 2)))
    np.testing.assert_allclose(f(x), f_ref(x), rtol=0, atol=0)
    np.testing.assert_allclose(
        jax.grad(lambda v: jnp.sum(f(v)))(x),
        jax.grad(lambda v: jnp.sum(f_ref(v)))(x),
        rtol=0, atol=0,
    )
