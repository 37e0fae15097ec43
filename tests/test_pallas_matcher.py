"""Pallas matcher kernel (interpret mode on CPU) vs the XLA matcher."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssd_object_detection_tpu.ops.matching import match_anchors
from ssd_object_detection_tpu.ops.pallas_matcher import match_anchors_pallas


def _random_case(seed, batch=3, n_gt=6, n_anchor=40, valid_p=0.7):
    rng = np.random.default_rng(seed)
    anchors = np.concatenate(
        [rng.uniform(0, 1, (n_anchor, 2)), rng.uniform(0.05, 0.5, (n_anchor, 2))], -1
    ).astype(np.float32)
    gt_boxes = np.concatenate(
        [rng.uniform(0, 1, (batch, n_gt, 2)), rng.uniform(0.05, 0.5, (batch, n_gt, 2))], -1
    ).astype(np.float32)
    gt_cls = rng.integers(0, 80, (batch, n_gt)).astype(np.int32)
    gt_valid = rng.uniform(size=(batch, n_gt)) < valid_p
    gt_valid[:, 0] = True
    return gt_cls, gt_boxes, gt_valid, anchors


@pytest.mark.parametrize("seed", range(5))
def test_pallas_matches_xla(seed):
    gt_cls, gt_boxes, gt_valid, anchors = _random_case(seed)
    got = match_anchors_pallas(gt_cls, gt_boxes, gt_valid, anchors, interpret=True)
    for b in range(gt_cls.shape[0]):
        want = match_anchors(gt_cls[b], gt_boxes[b], gt_valid[b], anchors)
        np.testing.assert_array_equal(np.asarray(got.gt_index[b]), np.asarray(want.gt_index))
        np.testing.assert_array_equal(np.asarray(got.cls[b]), np.asarray(want.cls))
        np.testing.assert_array_equal(np.asarray(got.mask[b]), np.asarray(want.mask))
        np.testing.assert_allclose(np.asarray(got.box[b]), np.asarray(want.box), atol=1e-6)


def test_pallas_golden_bipartite():
    """Reference tests/utils/test_bbox.py:39-44 golden case through the kernel."""
    anchors = np.float32([[10, 10, 1, 1], [20, 20, 1.1, 1.1], [20, 20, 0.5, 0.5]])
    gt_boxes = np.float32([[[15, 15, 13, 13], [15, 15, 14, 14]]])
    gt_cls = np.int32([[0, 1]])
    gt_valid = np.ones((1, 2), bool)
    res = match_anchors_pallas(gt_cls, gt_boxes, gt_valid, anchors, interpret=True)
    np.testing.assert_allclose(
        np.asarray(res.box[0]), [[15, 15, 14, 14], [15, 15, 13, 13], [0, 0, 0, 0]], atol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(res.cls[0]), [1, 0, 0])


def test_pallas_zero_valid():
    anchors = np.float32([[0.5, 0.5, 0.2, 0.2], [0.2, 0.2, 0.1, 0.1]])
    res = match_anchors_pallas(
        np.zeros((2, 3), np.int32), np.zeros((2, 3, 4), np.float32),
        np.zeros((2, 3), bool), anchors, interpret=True,
    )
    assert not np.asarray(res.mask).any()


def test_pallas_nonaligned_anchor_count():
    """D=8732 is not a lane multiple; padding columns must never match."""
    gt_cls, gt_boxes, gt_valid, _ = _random_case(9, batch=2, n_gt=4)
    rng = np.random.default_rng(9)
    anchors = np.concatenate(
        [rng.uniform(0, 1, (130, 2)), rng.uniform(0.05, 0.5, (130, 2))], -1
    ).astype(np.float32)
    got = match_anchors_pallas(gt_cls, gt_boxes, gt_valid, anchors, interpret=True)
    for b in range(2):
        want = match_anchors(gt_cls[b], gt_boxes[b], gt_valid[b], anchors)
        np.testing.assert_array_equal(np.asarray(got.gt_index[b]), np.asarray(want.gt_index))


def test_pallas_under_mesh_matches_xla():
    """build_targets(mesh=...) wraps the kernel in jax.shard_map over the batch
    axis (GSPMD cannot partition pallas_call): the 8-way-sharded result must be
    bit-equal to the unsharded XLA matcher path."""
    from ssd_object_detection_tpu.ops.matching import build_targets
    from ssd_object_detection_tpu.parallel.mesh import make_mesh, shard_batch

    gt_cls, gt_boxes, gt_valid, anchors = _random_case(11, batch=8)
    want = build_targets(
        jnp.asarray(gt_cls), jnp.asarray(gt_boxes), jnp.asarray(gt_valid),
        jnp.asarray(anchors), use_pallas=False,
    )
    mesh = make_mesh(8)
    args = shard_batch(
        (jnp.asarray(gt_cls), jnp.asarray(gt_boxes), jnp.asarray(gt_valid)), mesh
    )
    got = build_targets(
        *args, jnp.asarray(anchors), use_pallas=True, mesh=mesh, interpret=True
    )
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_pallas_mesh_nondivisible_batch_falls_back():
    """A (micro-)batch not divisible by the data axis (e.g. batch 16 with
    accum_steps=4 on 8 chips -> micro-batch 4) must fall back to the XLA matcher
    instead of crashing in jax.shard_map (round-3 review finding)."""
    from ssd_object_detection_tpu.ops.matching import build_targets
    from ssd_object_detection_tpu.parallel.mesh import make_mesh

    gt_cls, gt_boxes, gt_valid, anchors = _random_case(17, batch=4)
    want = build_targets(
        jnp.asarray(gt_cls), jnp.asarray(gt_boxes), jnp.asarray(gt_valid),
        jnp.asarray(anchors), use_pallas=False,
    )
    mesh = make_mesh(8)  # 4 % 8 != 0: shard_map would raise at trace
    got = build_targets(
        jnp.asarray(gt_cls), jnp.asarray(gt_boxes), jnp.asarray(gt_valid),
        jnp.asarray(anchors), use_pallas=True, mesh=mesh, interpret=True,
    )
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_pallas_no_mesh_multidevice_falls_back():
    """use_pallas=True with mesh=None on a multi-device backend must fall back:
    GSPMD cannot partition a bare pallas_call (round-3 review finding). On this
    8-virtual-device CPU harness the guard routes to the XLA matcher, so the call
    must succeed even with interpret=False (the kernel would not lower on CPU)."""
    from ssd_object_detection_tpu.ops.matching import build_targets

    assert jax.device_count() > 1  # conftest pins 8 virtual CPU devices
    gt_cls, gt_boxes, gt_valid, anchors = _random_case(18, batch=4)
    want = build_targets(
        jnp.asarray(gt_cls), jnp.asarray(gt_boxes), jnp.asarray(gt_valid),
        jnp.asarray(anchors), use_pallas=False,
    )
    got = build_targets(
        jnp.asarray(gt_cls), jnp.asarray(gt_boxes), jnp.asarray(gt_valid),
        jnp.asarray(anchors), use_pallas=True, mesh=None, interpret=False,
    )
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_dp_train_step_with_pallas_matcher_matches_xla():
    """Round-3 VERDICT item 4: the full DP train step with the Pallas matcher
    (shard_map, interpret mode) produces the same loss/params as the XLA-matcher
    step on the same 8-device mesh."""
    from ssd_object_detection_tpu.models.ssd import SSD
    from ssd_object_detection_tpu.ops.anchors import generate_anchors
    from ssd_object_detection_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from ssd_object_detection_tpu.train.optim import make_optimizer
    from ssd_object_detection_tpu.train.step import (
        StepConfig, create_train_state, make_train_step,
    )
    from tests.test_train_step import NUM_CLASSES, TINY_ANCHORS, TINY_MODEL
    from ssd_object_detection_tpu.data.synthetic import SyntheticDetectionDataset

    model = SSD(num_classes=NUM_CLASSES, spec=TINY_MODEL)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    anchors = generate_anchors(TINY_ANCHORS)
    tx = make_optimizer("adam", 1e-3)
    state = create_train_state(params, tx)
    ds = SyntheticDetectionDataset(num_images=8, image_size=64, max_gt=4, num_classes=8, seed=3)
    batch = next(ds.batches(batch_size=8))

    mesh = make_mesh(8)
    dp_state = replicate(state, mesh)
    sharded = shard_batch({k: jnp.asarray(v) for k, v in batch.items()}, mesh)

    step_xla = make_train_step(
        model.apply, anchors, tx, StepConfig(use_pallas_matcher=False), mesh=mesh
    )
    step_pl = make_train_step(
        model.apply, anchors, tx,
        StepConfig(use_pallas_matcher=True, pallas_interpret=True), mesh=mesh,
    )
    s1, m1 = step_xla(dp_state, sharded)
    s2, m2 = step_pl(dp_state, sharded)
    # the matcher TARGETS are bit-equal (test_pallas_under_mesh_matches_xla); the
    # end-to-end step compiles to a different XLA program (shard_map boundary), so
    # grad reductions may differ in the last ulp — tolerances cover exactly that
    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=1e-6)
    assert float(m1["num_positive"]) == float(m2["num_positive"])
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-8)


def test_chunked_kernel_matches_xla_at_ssd512_scale():
    """Anchor counts that trigger the kernel's column-chunked passes (>12 MB for
    three full (G, D) planes) must still produce identical assignments."""
    rng = np.random.default_rng(7)
    num_anchors = 12700  # d_pad 12800 -> 3*100*12800*4 = 15.4 MB -> chunked
    max_gt = 100
    anchors = np.concatenate(
        [rng.uniform(0.05, 0.95, (num_anchors, 2)), rng.uniform(0.03, 0.4, (num_anchors, 2))],
        -1,
    ).astype(np.float32)
    B = 2
    gt_boxes = np.concatenate(
        [rng.uniform(0.2, 0.8, (B, max_gt, 2)), rng.uniform(0.05, 0.4, (B, max_gt, 2))], -1
    ).astype(np.float32)
    gt_cls = rng.integers(0, 80, (B, max_gt)).astype(np.int32)
    gt_valid = rng.uniform(size=(B, max_gt)) < 0.12

    got = match_anchors_pallas(
        jnp.asarray(gt_cls), jnp.asarray(gt_boxes), jnp.asarray(gt_valid),
        jnp.asarray(anchors), interpret=True,
    )
    want = jax.vmap(
        lambda c, b, v: match_anchors(c, b, v, jnp.asarray(anchors))
    )(jnp.asarray(gt_cls), jnp.asarray(gt_boxes), jnp.asarray(gt_valid))
    np.testing.assert_array_equal(np.asarray(got.gt_index), np.asarray(want.gt_index))
    np.testing.assert_array_equal(np.asarray(got.cls), np.asarray(want.cls))
    np.testing.assert_allclose(np.asarray(got.box), np.asarray(want.box), atol=1e-6)
