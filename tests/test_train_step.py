"""End-to-end training smoke tests on a tiny SSD (hermetic synthetic data, CPU-fast).

Covers SURVEY.md section 7 step 4: the minimum end-to-end slice — overfit a few
synthetic images to near-zero loss through the full jitted step (on-device matching +
mining + loss + clip + accumulation + Adam)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssd_object_detection_tpu.data.synthetic import SyntheticDetectionDataset
from ssd_object_detection_tpu.models.ssd import SSD, ModelSpec
from ssd_object_detection_tpu.ops.anchors import AnchorSpec, generate_anchors
from ssd_object_detection_tpu.train.optim import exponential_decay, make_optimizer, polynomial_decay
from ssd_object_detection_tpu.train.step import (
    StepConfig,
    create_train_state,
    make_train_step,
)

TINY_ANCHORS = AnchorSpec(
    image_size=64,
    feature_sizes=((8, 8), (4, 4)),
    scale_refs=(13, 26, 45),
    aspect_ratios=((2,), (2,)),
)
TINY_MODEL = ModelSpec(
    name="tiny",
    anchor_spec=TINY_ANCHORS,
    blocks=(
        ((128, 3, 1, "SAME"), (128, 1, 1, "SAME")),
        ((128, 3, 2, "SAME"), (128, 1, 1, "SAME")),
    ),
)
NUM_CLASSES = 9  # 8 fg + background LAST


def _setup(accum_steps=1, canonical=False, lr=1e-3):
    model = SSD(num_classes=NUM_CLASSES, spec=TINY_MODEL)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    anchors = generate_anchors(TINY_ANCHORS)
    tx = make_optimizer("adam", lr)
    cfg = StepConfig(accum_steps=accum_steps, canonical_loss=canonical)
    step_fn = make_train_step(model.apply, anchors, tx, cfg)
    state = create_train_state(params, tx)
    return step_fn, state


def test_overfit_synthetic_to_low_loss():
    ds = SyntheticDetectionDataset(num_images=4, image_size=64, max_gt=4, num_classes=8, seed=0)
    batch = next(ds.batches(batch_size=4))
    step_fn, state = _setup(lr=3e-3)
    first = None
    for i in range(120):
        state, metrics = step_fn(state, batch)
        if first is None:
            first = float(metrics["loss"])
    last = float(metrics["loss"])
    assert np.isfinite(last)
    assert last < first * 0.25, (first, last)
    assert int(state.step) == 120


def test_grad_accumulation_matches_full_batch_when_identical_micros():
    """With identical micro-batches, accumulation must give the same update as one
    micro (clip->sum->avg over identical grads is a no-op)."""
    ds = SyntheticDetectionDataset(num_images=2, image_size=64, max_gt=4, num_classes=8, seed=1)
    one = next(ds.batches(batch_size=2))
    doubled = {k: np.concatenate([v, v], axis=0) for k, v in one.items()}

    step1, state1 = _setup(accum_steps=1)
    step2, state2 = _setup(accum_steps=2)
    state1, m1 = step1(state1, one)
    state2, m2 = step2(state2, doubled)
    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=1e-5)
    leaves1 = jax.tree.leaves(state1.params)
    leaves2 = jax.tree.leaves(state2.params)
    for a, b in zip(leaves1, leaves2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_canonical_loss_trains():
    ds = SyntheticDetectionDataset(num_images=2, image_size=64, max_gt=4, num_classes=8, seed=2)
    batch = next(ds.batches(batch_size=2))
    step_fn, state = _setup(canonical=True)
    for _ in range(10):
        state, metrics = step_fn(state, batch)
    assert np.isfinite(float(metrics["loss"]))


def test_schedules_match_tf_formulas():
    exp = exponential_decay(1e-3, 100, 0.99)
    assert float(exp(0)) == pytest.approx(1e-3)
    assert float(exp(100)) == pytest.approx(1e-3 * 0.99)
    assert float(exp(50)) == pytest.approx(1e-3 * 0.99**0.5)
    poly = polynomial_decay(1e-6, 500, 1e-3)
    # rel=1e-4: (start-end)*(1-frac)+end cancels catastrophically in float32 at frac=0,
    # exactly as TF's float32 PolynomialDecay does
    assert float(poly(0)) == pytest.approx(1e-6, rel=1e-4)
    assert float(poly(500)) == pytest.approx(1e-3, rel=1e-4)
    assert float(poly(250)) == pytest.approx((1e-6 + 1e-3) / 2, rel=1e-3)
    assert float(poly(1000)) == pytest.approx(1e-3, rel=1e-4)  # clamped past decay_steps


def test_clip_by_norm_semantics():
    from ssd_object_detection_tpu.train.optim import clip_by_norm_per_tensor

    g = {"a": jnp.ones((10,)) * 3.0, "b": jnp.ones((2,)) * 1e-5}
    clipped = clip_by_norm_per_tensor(g, 0.01)
    # big tensor scaled to norm 0.01; tiny tensor untouched (tf.clip_by_norm semantics)
    assert float(jnp.linalg.norm(clipped["a"])) == pytest.approx(0.01, rel=1e-5)
    np.testing.assert_allclose(np.asarray(clipped["b"]), np.asarray(g["b"]), rtol=1e-6)


def test_train_step_accepts_uint8_images():
    """uint8 batches (the packed-cache contract) produce the same step as the
    equivalent [0,1] float batch — scaling happens on device (4x less H2D)."""
    import numpy as np

    model = SSD(num_classes=NUM_CLASSES, spec=TINY_MODEL)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    anchors = generate_anchors(TINY_ANCHORS)
    tx = make_optimizer("adam", 1e-3)
    step_fn = make_train_step(model.apply, anchors, tx, StepConfig())

    rng = np.random.default_rng(0)
    u8 = rng.integers(0, 256, (2, 64, 64, 3), np.uint8)
    base = {
        "gt_cls": jnp.asarray(rng.integers(0, 8, (2, 4)).astype(np.int32)),
        "gt_boxes": jnp.asarray(np.concatenate(
            [rng.uniform(0.3, 0.7, (2, 4, 2)), rng.uniform(0.1, 0.3, (2, 4, 2))], -1
        ).astype(np.float32)),
        "gt_valid": jnp.asarray(np.ones((2, 4), bool)),
    }
    s_f32, m_f32 = step_fn(create_train_state(params, tx),
                           dict(base, image=jnp.asarray(u8.astype(np.float32) / 255.0)))
    s_u8, m_u8 = step_fn(create_train_state(params, tx),
                         dict(base, image=jnp.asarray(u8)))
    # the two inputs trace to DIFFERENT programs, so XLA may fuse the scaling
    # differently (e.g. u8*(2/255)-1); compare at loss level, not param bits
    # (Adam's first step is sign(grad)*lr — ulp-level grad noise flips it)
    assert float(m_f32["loss"]) == pytest.approx(float(m_u8["loss"]), rel=1e-6)
    assert float(m_f32["num_positive"]) == float(m_u8["num_positive"])
    assert int(s_u8.step) == int(s_f32.step) == 1


def test_train_step_with_device_augmentation():
    """StepConfig.augment runs the on-device recipe (ops/augment.py) inside the
    compiled step: losses stay finite, training still reduces loss, and the same
    (aug_seed, step) gives identical metrics across step-fn rebuilds."""
    from ssd_object_detection_tpu.ops.augment import AugConfig

    ds = SyntheticDetectionDataset(num_images=4, image_size=64, max_gt=4,
                                   num_classes=8, seed=3)
    batch = next(ds.batches(batch_size=4))
    model = SSD(num_classes=NUM_CLASSES, spec=TINY_MODEL)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    anchors = generate_anchors(TINY_ANCHORS)
    tx = make_optimizer("adam", 1e-3)
    cfg = StepConfig(augment=AugConfig(), aug_seed=11)
    step_fn = make_train_step(model.apply, anchors, tx, cfg)
    state = create_train_state(params, tx)

    losses = []
    for _ in range(30):
        state, metrics = step_fn(state, batch)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(l) for l in losses)
    assert min(losses[-5:]) < losses[0], "augmented training is not learning"

    # deterministic per (aug_seed, step): a fresh state + fresh step_fn replays
    # the same augmentation stream -> identical first-step metrics
    step_fn2 = make_train_step(model.apply, anchors, tx, cfg)
    state2 = create_train_state(params, tx)
    _, m2 = step_fn2(state2, batch)
    assert float(m2["loss"]) == losses[0]

    # and augmentation actually changes what the model sees vs the plain step
    plain_fn = make_train_step(model.apply, anchors, tx, StepConfig())
    _, mp = plain_fn(create_train_state(params, tx), batch)
    assert float(mp["loss"]) != losses[0]
