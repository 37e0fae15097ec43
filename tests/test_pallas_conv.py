"""Pallas fused conv3x3(+bias+relu+pool) kernel (ops/pallas_conv.py): numerical
parity with the XLA reference implementation and exact gradients, exercised via
Pallas interpret mode on CPU (the module auto-selects it off-TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssd_object_detection_tpu.ops.pallas_conv import (
    _conv3x3_xla,
    _pick_row_tile,
    conv3x3_bias_relu,
)


def _inputs(rng, b=1, h=8, w=8, ic=8, oc=8, dtype=jnp.float32):
    x = jnp.asarray(rng.standard_normal((b, h, w, ic)), dtype)
    k = jnp.asarray(rng.standard_normal((3, 3, ic, oc)) * 0.1, dtype)
    bias = jnp.asarray(rng.standard_normal((oc,)), jnp.float32)
    return x, k, bias


@pytest.mark.parametrize("relu,pool", [(False, False), (True, False), (True, True)])
def test_matches_xla_reference(relu, pool):
    rng = np.random.default_rng(0)
    x, k, b = _inputs(rng, b=2, h=8, w=8)
    got = conv3x3_bias_relu(x, k, b, relu, pool)
    want = _conv3x3_xla(x, k, b, relu, pool)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_matches_xla_multi_tile():
    """H larger than one row tile: the halo BlockSpecs must stitch tiles exactly
    (borders between tiles are where the clamped index maps matter)."""
    from ssd_object_detection_tpu.ops.pallas_conv import _conv3x3_pallas

    rng = np.random.default_rng(1)
    x, k, b = _inputs(rng, h=12, w=8)
    got = _conv3x3_pallas(x, k, b, relu=True, pool=False, row_tile=4)  # 3 tiles
    want = _conv3x3_xla(x, k, b, True, False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_gradients_match_xla():
    rng = np.random.default_rng(2)
    x, k, b = _inputs(rng)

    def loss_pallas(x, k, b):
        return jnp.sum(conv3x3_bias_relu(x, k, b, True, True) ** 2)

    def loss_xla(x, k, b):
        return jnp.sum(_conv3x3_xla(x, k, b, True, True) ** 2)

    g1 = jax.grad(loss_pallas, argnums=(0, 1, 2))(x, k, b)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2))(x, k, b)
    for a, c in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=1e-4)


def test_pool_rejects_odd_extent():
    rng = np.random.default_rng(3)
    x, k, b = _inputs(rng, h=7, w=8)
    with pytest.raises(ValueError, match="even"):
        conv3x3_bias_relu(x, k, b, True, True)


def test_pick_row_tile_divides_and_fits():
    for h, w, ic, oc, pool in [
        (300, 300, 3, 64, True), (150, 150, 64, 128, False),
        (38, 38, 512, 512, False), (8, 8, 8, 8, True),
    ]:
        r = _pick_row_tile(h, w, ic, oc, pool)
        assert h % r == 0
        if pool:
            assert r % 2 == 0
        assert r * w * (20 * oc + 10 * ic) <= 10 * 1024 * 1024 or r <= 2
