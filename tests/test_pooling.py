"""ops/pooling.max_pool_2x2: value parity with flax nn.max_pool and gradient
parity with XLA's reduce_window vjp (select-and-scatter), which it replaces for
speed (BASELINE.md: 3.3 ms/step of pool backward at batch 32)."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssd_object_detection_tpu.ops.pooling import max_pool_2x2


@pytest.mark.parametrize("seed,hw,padding", [
    (0, (8, 8), "VALID"), (1, (8, 8), "SAME"), (2, (7, 9), "SAME"),
    (3, (7, 9), "VALID"), (4, (75, 75), "SAME"),
])
def test_forward_matches_flax(seed, hw, padding):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((2, *hw, 5)).astype(np.float32))
    got = max_pool_2x2(x, padding=padding)
    want = nn.max_pool(x, window_shape=(2, 2), strides=(2, 2), padding=padding)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("hw,padding", [((8, 8), "VALID"), ((7, 9), "SAME")])
def test_gradient_matches_reduce_window_vjp(hw, padding):
    """Random f32 inputs (no in-window ties): the first-match backward must equal
    select-and-scatter's routing exactly."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, *hw, 5)).astype(np.float32))

    def loss_ours(x):
        return jnp.sum(max_pool_2x2(x, padding=padding) ** 2)

    def loss_xla(x):
        return jnp.sum(nn.max_pool(x, (2, 2), (2, 2), padding=padding) ** 2)

    g1 = jax.grad(loss_ours)(x)
    g2 = jax.grad(loss_xla)(x)
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))


def test_gradient_tie_goes_to_first_in_window():
    """On an exact tie inside a window, the gradient routes to the row-major-first
    element only (select-and-scatter's tie-break) — never split."""
    x = jnp.zeros((1, 2, 2, 1), jnp.float32)  # one window, all tied
    g = jax.grad(lambda x: jnp.sum(max_pool_2x2(x)))(x)
    np.testing.assert_array_equal(
        np.asarray(g)[0, :, :, 0], np.array([[1.0, 0.0], [0.0, 0.0]])
    )


def test_bfloat16_dtype():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 6, 6, 3)), jnp.bfloat16)
    got = max_pool_2x2(x)
    want = nn.max_pool(x, (2, 2), (2, 2), "VALID")
    assert got.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(got, np.float32), np.asarray(want, np.float32)
    )
