"""Fused on-device preprocessing (ops/preprocess.py): geometry parity with the host
cv2 path and exactness of the fused predict entry on identity-sized inputs."""

import jax.numpy as jnp
import numpy as np
import pytest

from ssd_object_detection_tpu.ops.preprocess import (
    _axis_grid,
    normalize01,
    pack_canvas,
    resize_bilinear_planar,
)

cv2 = pytest.importorskip("cv2")


def _ref_resize(img_u8: np.ndarray, size: int) -> np.ndarray:
    """The host pipeline's transform (data/pipeline.py:119): cv2 INTER_LINEAR + /255."""
    return cv2.resize(img_u8, (size, size)).astype(np.float32) / 255.0


# cv2 INTER_LINEAR uses fixed-point weights (5 fractional bits on the lerp): the
# f32 gather path lands within a fraction of a uint8 step of it. The matmul path
# (the TPU default) adds bf16 rounding of the interpolation weights and of the one
# row-pass intermediate (~1.5/255 bound; measured worst 2.04/255 vs cv2) — same
# sample grid, slightly looser arithmetic tolerance.
TOL = {"gather": 2.5 / 255.0, "matmul": 3.2 / 255.0}


@pytest.mark.parametrize("method", ["gather", "matmul"])
@pytest.mark.parametrize("hw", [(480, 640), (640, 480), (300, 300), (123, 457), (37, 50)])
def test_resize_matches_cv2(hw, method):
    rng = np.random.default_rng(hw[0] * 1000 + hw[1])  # deterministic across runs
    img = rng.integers(0, 256, (*hw, 3), np.uint8)
    canvas, sizes = pack_canvas([img], (640, 640))
    got = np.asarray(
        resize_bilinear_planar(jnp.asarray(canvas), jnp.asarray(sizes), 300, method=method)
    )[0]
    want = _ref_resize(img, 300)
    assert got.shape == want.shape == (300, 300, 3)
    assert np.max(np.abs(got - want)) < TOL[method], np.max(np.abs(got - want))


@pytest.mark.parametrize("method", ["gather", "matmul"])
def test_resize_batch_mixed_sizes(method):
    rng = np.random.default_rng(0)
    imgs = [
        rng.integers(0, 256, (480, 640, 3), np.uint8),
        rng.integers(0, 256, (100, 200, 3), np.uint8),
    ]
    canvas, sizes = pack_canvas(imgs, (640, 640))
    got = np.asarray(
        resize_bilinear_planar(jnp.asarray(canvas), jnp.asarray(sizes), 300, method=method)
    )
    for i, img in enumerate(imgs):
        want = _ref_resize(img, 300)
        assert np.max(np.abs(got[i] - want)) < TOL[method]


def test_resize_methods_agree():
    """Same sample grid: matmul and gather differ only by bf16 arithmetic rounding."""
    rng = np.random.default_rng(7)
    imgs = [rng.integers(0, 256, (240, 320, 3), np.uint8) for _ in range(2)]
    canvas, sizes = pack_canvas(imgs, (640, 640))
    canvas, sizes = jnp.asarray(canvas), jnp.asarray(sizes)
    a = np.asarray(resize_bilinear_planar(canvas, sizes, 300, method="matmul"))
    b = np.asarray(resize_bilinear_planar(canvas, sizes, 300, method="gather"))
    assert np.max(np.abs(a - b)) < 2.0 / 255.0


def test_axis_grid_identity():
    # valid == out_size -> exact identity sampling (frac == 0, i0 == arange)
    i0, i1, frac = _axis_grid(jnp.asarray([64], jnp.int32), 64)
    np.testing.assert_array_equal(np.asarray(i0)[0], np.arange(64))
    np.testing.assert_array_equal(np.asarray(frac)[0], np.zeros(64))
    assert np.all(np.asarray(i1)[0] <= 63)


def test_pack_canvas_rejects_oversize():
    with pytest.raises(ValueError):
        pack_canvas([np.zeros((700, 10, 3), np.uint8)], (640, 640))


def test_normalize01():
    x = jnp.asarray([[0.0, 0.5, 1.0]])
    np.testing.assert_allclose(np.asarray(normalize01(x)), [[-1.0, 0.0, 1.0]])


def test_fused_predict_matches_host_path_on_identity_resize():
    """With images exactly at model resolution, the fused uint8 path must equal the
    float path bit-for-bit (identity sampling, same /255 and normalize)."""
    import jax

    from ssd_object_detection_tpu.eval.predict import make_fused_predict_fn, make_predict_fn
    from ssd_object_detection_tpu.models.ssd import SSD, ModelSpec
    from ssd_object_detection_tpu.ops.anchors import AnchorSpec, generate_anchors

    anchor_spec = AnchorSpec(
        image_size=64,
        feature_sizes=((8, 8), (4, 4)),
        scale_refs=(13, 26, 45),
        aspect_ratios=((2,), (2,)),
    )
    spec = ModelSpec(
        name="tiny",
        anchor_spec=anchor_spec,
        blocks=(
            ((64, 3, 1, "SAME"), (64, 1, 1, "SAME")),
            ((64, 3, 2, "SAME"), (64, 1, 1, "SAME")),
        ),
    )
    model = SSD(num_classes=11, spec=spec)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    anchors = generate_anchors(anchor_spec)

    rng = np.random.default_rng(1)
    imgs = [rng.integers(0, 256, (64, 64, 3), np.uint8) for _ in range(2)]
    canvas, sizes = pack_canvas(imgs, (96, 96))

    fused = make_fused_predict_fn(model.apply, anchors, image_size=64)
    det_fused = fused(params, jnp.asarray(canvas), jnp.asarray(sizes))

    host_images01 = jnp.asarray(np.stack(imgs).astype(np.float32) / 255.0)
    det_host = make_predict_fn(model.apply, anchors)(params, host_images01)

    np.testing.assert_array_equal(np.asarray(det_fused.valid), np.asarray(det_host.valid))
    np.testing.assert_allclose(
        np.asarray(det_fused.scores), np.asarray(det_host.scores), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(det_fused.boxes), np.asarray(det_host.boxes), atol=1e-6
    )
