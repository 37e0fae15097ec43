"""On-device augmentation (ops/augment.py) vs the host recipe (data/augment.py).

The device path composes photometric -> expand -> min-IoU crop -> flip into one
affine bilinear resample inside jit. These tests drive BOTH implementations to the
SAME geometry (a scripted rng for the host's rejection-sampling loops) and assert
box outputs match exactly and pixels to bilinear tolerance — the round-4 VERDICT
item-4 golden test."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssd_object_detection_tpu.data.augment import random_expand, random_min_iou_crop
from ssd_object_detection_tpu.ops.augment import (
    AugConfig,
    apply_geometry,
    augment_batch,
)

S = 64


class ScriptedRng:
    """Replays a fixed script of draws through the numpy Generator API surface
    data/augment.py uses (uniform / integers), so the host's data-dependent
    rejection loops land on a chosen geometry."""

    def __init__(self, script):
        self._script = list(script)

    def _next(self):
        assert self._script, "script exhausted"
        return self._script.pop(0)

    def uniform(self, low=0.0, high=1.0):
        v = self._next()
        assert low <= v <= high, (v, low, high)
        return v

    def integers(self, low, high):
        v = self._next()
        assert low <= v < high, (v, low, high)
        return int(v)


def _sample_image(seed=0):
    rng = np.random.default_rng(seed)
    img = rng.uniform(0, 1, (S, S, 3)).astype(np.float32)
    boxes = np.array([[0.5, 0.5, 0.5, 0.5], [0.2, 0.2, 0.1, 0.1]], np.float32)
    labels = np.array([3, 5], np.int32)
    return img, boxes, labels


def test_identity_geometry_is_exact():
    img, boxes, labels = _sample_image()
    imgs = jnp.asarray(img[None])
    out_img, out_boxes, out_cls, out_valid = apply_geometry(
        imgs, jnp.asarray(boxes[None]), jnp.asarray(labels[None]),
        jnp.ones((1, 2), bool),
        org_window=jnp.asarray([[0.0, 0.0, 1.0, 1.0]]),
        crop_rect=jnp.asarray([[0.0, 0.0, 1.0, 1.0]]),
        flip=jnp.asarray([False]),
    )
    # identity sampling uses pure 0/1 weights -> bit-exact even through bf16
    np.testing.assert_array_equal(np.asarray(out_img[0]), img)
    np.testing.assert_allclose(np.asarray(out_boxes[0]), boxes, atol=1e-6)
    assert bool(out_valid.all())
    np.testing.assert_array_equal(np.asarray(out_cls[0]), labels)


def test_flip_geometry_matches_numpy_mirror():
    img, boxes, labels = _sample_image(1)
    out_img, out_boxes, _, out_valid = apply_geometry(
        jnp.asarray(img[None]), jnp.asarray(boxes[None]), jnp.asarray(labels[None]),
        jnp.ones((1, 2), bool),
        org_window=jnp.asarray([[0.0, 0.0, 1.0, 1.0]]),
        crop_rect=jnp.asarray([[0.0, 0.0, 1.0, 1.0]]),
        flip=jnp.asarray([True]),
    )
    # mirror sampling lands on exact pixel centers -> bit-exact
    np.testing.assert_array_equal(np.asarray(out_img[0]), img[:, ::-1])
    want = boxes.copy()
    want[:, 0] = 1.0 - want[:, 0]
    np.testing.assert_allclose(np.asarray(out_boxes[0]), want, atol=1e-6)
    assert bool(out_valid.all())


def test_expand_crop_golden_vs_host_recipe():
    """Same geometry through data/augment.py (scripted rng) and apply_geometry:
    expand ratio 2 at integer offsets, then a 0.5x min-IoU crop at integer pixel
    boundaries. Boxes must match exactly; pixels to bilinear/fill tolerance."""
    img, boxes, labels = _sample_image(2)

    # --- host: expand(ratio=2, top=32, left=16) -> crop rect (.25,.25,.75,.75)
    exp_rng = ScriptedRng([0.0, 2.0, 32.0, 16.0])  # coin<p, ratio, top, left
    h_img, h_boxes = random_expand(img, boxes, exp_rng, p=0.5)
    assert h_img.shape == (128, 128, 3)
    # option index 1 -> min_iou 0.1; first attempt: cw=.5 ch=.5 x0=.25 y0=.25
    crop_rng = ScriptedRng([1, 0.5, 0.5, 0.25, 0.25])
    cropped = random_min_iou_crop(h_img, h_boxes, labels, crop_rng)
    assert cropped is not None
    h_patch, h_cboxes, h_clabels = cropped
    assert h_patch.shape == (S, S, 3)  # 0.5 x 128 = 64: no host resize needed

    # --- device: identical geometry in relative coords
    org_window = jnp.asarray([[16 / 128, 32 / 128, (16 + S) / 128, (32 + S) / 128]])
    crop_rect = jnp.asarray([[0.25, 0.25, 0.75, 0.75]])
    out_img, out_boxes, out_cls, out_valid = apply_geometry(
        jnp.asarray(img[None]), jnp.asarray(boxes[None]), jnp.asarray(labels[None]),
        jnp.ones((1, 2), bool), org_window, crop_rect, jnp.asarray([False]),
    )

    kept = np.asarray(out_valid[0])
    assert kept.tolist() == [True, False], (
        "big central box kept, corner box's center is outside the crop"
    )
    assert h_clabels.tolist() == np.asarray(out_cls[0])[kept].tolist()
    np.testing.assert_allclose(
        np.asarray(out_boxes[0])[kept], h_cboxes, atol=1e-5
    )
    # pixels: integer-aligned geometry -> the only differences are the bf16
    # rounding of 0/1 weights (none) and the fill-color blend arithmetic
    np.testing.assert_allclose(np.asarray(out_img[0]), h_patch, atol=2.5 / 255)


def test_fill_region_is_image_mean():
    img, boxes, labels = _sample_image(3)
    # window maps the image to the LEFT half; right half of the output is fill
    out_img, *_ = apply_geometry(
        jnp.asarray(img[None]), jnp.asarray(boxes[None]), jnp.asarray(labels[None]),
        jnp.ones((1, 2), bool),
        org_window=jnp.asarray([[0.0, 0.0, 0.5, 1.0]]),
        crop_rect=jnp.asarray([[0.0, 0.0, 1.0, 1.0]]),
        flip=jnp.asarray([False]),
    )
    fill = img.mean(axis=(0, 1))
    np.testing.assert_allclose(
        np.asarray(out_img[0, :, -16:, :]), np.broadcast_to(fill, (S, 16, 3)),
        atol=2.5 / 255,
    )


def test_augment_batch_jit_contract():
    """augment_batch under jit: correct shapes/dtypes, boxes stay in [0,1],
    invalidated GTs are zeroed, uint8 input accepted, deterministic per key."""
    rng = np.random.default_rng(7)
    b, g = 8, 6
    imgs = rng.integers(0, 256, (b, S, S, 3), np.uint8)
    boxes = np.zeros((b, g, 4), np.float32)
    cls = np.zeros((b, g), np.int32)
    valid = np.zeros((b, g), bool)
    for i in range(b):
        n = int(rng.integers(1, g + 1))
        for j in range(n):
            w_, h_ = rng.uniform(0.1, 0.4, 2)
            boxes[i, j] = [rng.uniform(w_ / 2, 1 - w_ / 2), rng.uniform(h_ / 2, 1 - h_ / 2), w_, h_]
            cls[i, j] = rng.integers(0, 8)
            valid[i, j] = True

    cfg = AugConfig()
    fn = jax.jit(lambda k, im, bx, cl, va: augment_batch(k, im, bx, cl, va, cfg))
    key = jax.random.PRNGKey(0)
    out_img, out_boxes, out_cls, out_valid = fn(
        key, jnp.asarray(imgs), jnp.asarray(boxes), jnp.asarray(cls), jnp.asarray(valid)
    )
    assert out_img.shape == (b, S, S, 3) and out_img.dtype == jnp.float32
    oi = np.asarray(out_img)
    assert oi.min() >= 0.0 and oi.max() <= 1.0
    ob, ov = np.asarray(out_boxes), np.asarray(out_valid)
    assert ov.sum() >= b, "every image keeps at least one GT (crop guarantees it)"
    # valid boxes are inside the unit square (cx +/- w/2 within [0,1] after clip)
    x0 = ob[..., 0] - ob[..., 2] / 2
    x1 = ob[..., 0] + ob[..., 2] / 2
    assert (np.where(ov, x0, 0) >= -1e-5).all() and (np.where(ov, x1, 0) <= 1 + 1e-5).all()
    assert (ob[~ov] == 0).all()
    # deterministic: same key -> same outputs
    out2 = fn(key, jnp.asarray(imgs), jnp.asarray(boxes), jnp.asarray(cls), jnp.asarray(valid))
    np.testing.assert_array_equal(np.asarray(out2[0]), oi)
    # different key -> different pixels somewhere
    out3 = fn(jax.random.PRNGKey(1), jnp.asarray(imgs), jnp.asarray(boxes),
              jnp.asarray(cls), jnp.asarray(valid))
    assert not np.array_equal(np.asarray(out3[0]), oi)


def test_photometric_matches_host_ops():
    """Scripted coins/magnitudes: device photometric == data/augment.py's
    brightness/contrast/saturation ops applied in the same order."""
    from ssd_object_detection_tpu.ops.augment import _photometric

    img, _, _ = _sample_image(4)

    class FakeKey:
        pass

    # device draws u = uniform(key, (6,)): [coin_b, mag_b, coin_c, mag_c, coin_s, mag_s]
    u = np.array([0.1, 0.75, 0.2, 0.5, 0.3, 0.25], np.float32)

    orig_uniform = jax.random.uniform
    try:
        jax.random.uniform = lambda key, shape=(): jnp.asarray(u)  # type: ignore
        got = np.asarray(_photometric(None, jnp.asarray(img), 0.5))
    finally:
        jax.random.uniform = orig_uniform

    want = np.clip(img + (0.75 * 0.24 - 0.12), 0, 1)
    want = np.clip((want - 0.5) * (0.7 + 0.5 * 0.6) + 0.5, 0, 1)
    gray = want.mean(axis=2, keepdims=True)
    want = np.clip(gray + (want - gray) * (0.7 + 0.25 * 0.6), 0, 1)
    np.testing.assert_allclose(got, want, atol=1e-6)
