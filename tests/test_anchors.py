"""Anchor generation: golden parity with the reference's per-cell loop semantics."""

import itertools
import math

import jax.numpy as jnp
import numpy as np
import pytest

from ssd_object_detection_tpu.ops.anchors import (
    SSD300_SPEC,
    SSD512_SPEC,
    AnchorSpec,
    generate_anchors,
)


def _loop_reference(spec: AnchorSpec) -> np.ndarray:
    """Independent scalar-loop restatement of the prior-box math
    (reference models/ssd_model.py:173-194) used as the golden oracle."""
    out = []
    for level, (h, w) in enumerate(spec.feature_sizes):
        s_k = spec.scale_refs[level] / spec.image_size
        s_k_prime = math.sqrt(s_k * (spec.scale_refs[level + 1] / spec.image_size))
        for y, x in itertools.product(range(h), range(w)):
            cx, cy = (x + 0.5) / w, (y + 0.5) / h
            out.append([cx, cy, s_k, s_k])
            out.append([cx, cy, s_k_prime, s_k_prime])
            for r in spec.aspect_ratios[level]:
                rt = math.sqrt(r)
                out.append([cx, cy, s_k * rt, s_k / rt])
                out.append([cx, cy, s_k / rt, s_k * rt])
    return np.asarray(out, dtype=np.float32)


def test_ssd300_anchor_count():
    # 38^2*4 + 19^2*6 + 10^2*6 + 5^2*6 + 3^2*4 + 1*4 = 8732 (SURVEY.md component 10)
    assert SSD300_SPEC.num_anchors == 8732
    assert SSD300_SPEC.anchors_per_cell == (4, 6, 6, 6, 4, 4)
    assert generate_anchors(SSD300_SPEC).shape == (8732, 4)


def test_ssd512_anchor_count():
    assert SSD512_SPEC.anchors_per_cell == (4, 6, 6, 6, 6, 4, 4)
    assert SSD512_SPEC.num_anchors == 24564


def test_ssd300_matches_loop_reference_bitwise():
    got = generate_anchors(SSD300_SPEC)
    want = _loop_reference(SSD300_SPEC)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)


def test_ssd512_matches_loop_reference():
    np.testing.assert_allclose(generate_anchors(SSD512_SPEC), _loop_reference(SSD512_SPEC), atol=1e-6)


def test_first_cell_order():
    """Per-cell order: s_k square, s'_k square, then (r, 1/r) pairs — reference
    models/ssd_model.py:185-192."""
    a = generate_anchors(SSD300_SPEC)
    s_k = 21 / 300
    s_prime = math.sqrt(s_k * 45 / 300)
    cx = cy = 0.5 / 38
    np.testing.assert_allclose(a[0], [cx, cy, s_k, s_k], atol=1e-7)
    np.testing.assert_allclose(a[1], [cx, cy, s_prime, s_prime], atol=1e-7)
    rt = math.sqrt(2)
    np.testing.assert_allclose(a[2], [cx, cy, s_k * rt, s_k / rt], atol=1e-7)
    np.testing.assert_allclose(a[3], [cx, cy, s_k / rt, s_k * rt], atol=1e-7)
    # second cell advances x first (y-major iteration)
    np.testing.assert_allclose(a[4][:2], [1.5 / 38, 0.5 / 38], atol=1e-7)


def test_ssd512_spec_sanity_vs_paper():
    """SSD512 here is a VARIANT, not a port (the reference has no 512 model —
    SURVEY.md section 2); sanity-check it against the SSD paper's structural rules:
    monotone scales spanning ~0.07-0.9 of the image, s_k' = sqrt(s_k * s_{k+1})
    interpolation well-defined (one extra scale ref), anchors inside (0, 1.06]."""
    s = np.asarray(SSD512_SPEC.scale_refs, np.float32) / SSD512_SPEC.image_size
    assert np.all(np.diff(s) > 0)
    assert 0.04 <= s[0] <= 0.12 and 0.85 <= s[-2] <= 1.1
    assert len(SSD512_SPEC.scale_refs) == len(SSD512_SPEC.feature_sizes) + 1
    anchors = generate_anchors(SSD512_SPEC)
    # sqrt(2)-stretched top-level anchors legitimately exceed 1 (paper keeps them)
    assert np.all(anchors > 0) and np.all(anchors[:, 2:] <= 1.35)


@pytest.mark.parametrize("spec", [SSD300_SPEC, SSD512_SPEC], ids=["ssd300", "ssd512"])
def test_anchor_coverage_of_random_boxes(spec):
    """Detection-coverage sanity: any reasonably-shaped box (scale 0.1-0.65, aspect
    0.5-2) must overlap some anchor with IoU >= 0.45 — the matcher's phase-2
    threshold is 0.5 and phase 1 guarantees each GT its argmax anchor regardless."""
    from ssd_object_detection_tpu.ops.boxes import pairwise_iou

    anchors = generate_anchors(spec)
    rng = np.random.default_rng(0)
    n = 200
    scale = rng.uniform(0.1, 0.65, n)
    ar = rng.uniform(0.5, 2.0, n)
    w = scale * np.sqrt(ar)
    h = scale / np.sqrt(ar)
    cx = rng.uniform(w / 2, 1 - w / 2)
    cy = rng.uniform(h / 2, 1 - h / 2)
    boxes = np.stack([cx, cy, w, h], axis=1).astype(np.float32)
    iou = np.asarray(pairwise_iou(jnp.asarray(boxes), jnp.asarray(anchors)))
    best = iou.max(axis=1)
    assert best.min() >= 0.5, float(best.min())  # measured: 0.54 / 0.56
    assert best.mean() >= 0.65, float(best.mean())
