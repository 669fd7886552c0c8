import math

import numpy as np
import jax
import jax.numpy as jnp

from transeditor_tpu.ops import fused_leaky_relu
from transeditor_tpu.ops.act import scaled_leaky_relu


def test_fused_leaky_relu_values():
    x = jnp.asarray([[-1.0, 0.0, 2.0]])
    b = jnp.asarray([0.5, 0.5, 0.5])
    got = np.asarray(fused_leaky_relu(x, b))
    ref = np.asarray([[-0.5 * 0.2, 0.5, 2.5]]) * math.sqrt(2)
    np.testing.assert_allclose(got, ref, rtol=1e-6)


def test_bias_broadcast_axis():
    x = jnp.ones((2, 4, 4, 3))
    b = jnp.asarray([1.0, 2.0, 3.0])
    y = fused_leaky_relu(x, b)  # channel-last broadcast
    np.testing.assert_allclose(
        np.asarray(y[0, 0, 0]), (1 + np.array([1, 2, 3])) * math.sqrt(2),
        rtol=1e-6)


def test_second_order():
    f = lambda x: jnp.sum(fused_leaky_relu(x, jnp.zeros(3)) ** 2)
    x = jnp.asarray([[-1.0, 1.0, 3.0]])
    h = jax.grad(lambda x: jnp.sum(jax.grad(f)(x) ** 2))(x)
    # d/dx of (2*s^2*x)^2 summed -> 8*s^4*x, s = slope factor * sqrt2
    s = np.where(np.asarray(x) < 0, 0.2, 1.0) * math.sqrt(2)
    np.testing.assert_allclose(np.asarray(h), 8 * s ** 4 * np.asarray(x),
                               rtol=1e-5)


def test_scaled_leaky_relu():
    x = jnp.asarray([-2.0, 2.0])
    np.testing.assert_allclose(
        np.asarray(scaled_leaky_relu(x)),
        np.asarray([-0.4, 2.0]) * math.sqrt(2), rtol=1e-6)
