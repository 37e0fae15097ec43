"""PTQ int8 serving path (ops/quant.py).

The quantization subsystem has no reference counterpart (the reference has no
serving path at all, SURVEY.md section 5) — it is a TPU-native extension: the
v5e MXU runs int8 at 2x the bf16 rate, and the eligible middle convs measured
2.31x in-graph (BASELINE.md round 3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssd_object_detection_tpu.models.ssd import SSD, ModelSpec
from ssd_object_detection_tpu.ops.anchors import AnchorSpec
from ssd_object_detection_tpu.ops.quant import (
    calibrate,
    quantize_ssd,
    quantize_weights,
)


@pytest.fixture(scope="module")
def micro():
    anchor_spec = AnchorSpec(
        image_size=64, feature_sizes=((16, 16), (8, 8)),
        scale_refs=(13, 26, 52), aspect_ratios=((2,), (2,)),
    )
    # extra0_conv0 input is the 64-ch micro trunk (NOT eligible at min_in_ch=128);
    # extra1_conv0 input is 160-ch (eligible)
    spec = ModelSpec(
        name="q", anchor_spec=anchor_spec, trunk="micro",
        blocks=(((160, 3, 1, "SAME"),), ((192, 3, 2, "SAME"),)),
    )
    model = SSD(num_classes=9, spec=spec, dtype=jnp.bfloat16, conf_f32=False)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 64, 64, 3)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    return model, params, x


def test_calibrate_selects_eligible_convs_only(micro):
    model, params, x = micro
    stats = calibrate(model, params, [x], min_in_ch=128)
    # only the >=128-input-channel conv qualifies; trunk convs (3/32/64-in),
    # extra0_conv0 (64-in) and heads are excluded
    assert sorted(stats) == ["extra1_conv0"]
    assert stats["extra1_conv0"] > 0

def test_discover_eligible_matches_calibrate_no_compile(micro):
    """The abstract-trace discovery (bench.py's no-compile path) selects exactly
    the convs `calibrate` would."""
    from ssd_object_detection_tpu.ops.quant import discover_eligible

    model, params, x = micro
    assert sorted(discover_eligible(model, params, tuple(x.shape))) == sorted(
        calibrate(model, params, [x], min_in_ch=128)
    )
    with_heads = discover_eligible(model, params, tuple(x.shape), include_heads=True)
    assert "conf_head0" in with_heads and "extra1_conv0" in with_heads


def test_quantize_synthetic_helper(micro):
    """quantize_synthetic (the shared bench/profile/sweep recipe) produces a
    runnable q_apply whose outputs have the model's shapes, and quantizes the
    same convs discover_eligible selects."""
    from ssd_object_detection_tpu.ops.quant import discover_eligible, quantize_synthetic

    model, params, x = micro
    q_apply, q_params, n_q = quantize_synthetic(model, params, tuple(x.shape))
    assert n_q == len(discover_eligible(model, params, tuple(x.shape)))
    assert sorted(q_params["quant"]) == sorted(
        discover_eligible(model, params, tuple(x.shape))
    )
    loc, conf = q_apply(q_params, x)
    ref_loc, ref_conf = model.apply(params, x)
    assert loc.shape == ref_loc.shape and conf.shape == ref_conf.shape


def test_dilated_convs_excluded_from_eligibility():
    """_int8_conv does not forward kernel/input dilation, so dilated convs must
    never pass _eligible (they would compute a different convolution with the
    same output shape — silent corruption)."""
    import flax.linen as nn

    from ssd_object_detection_tpu.ops.quant import _eligible

    x = jnp.zeros((1, 8, 8, 256))
    plain = nn.Conv(features=64, kernel_size=(3, 3), padding="SAME")
    dilated = nn.Conv(features=64, kernel_size=(3, 3), padding="SAME",
                      kernel_dilation=(6, 6))
    assert _eligible(plain, x, min_in_ch=128, include_heads=True)
    assert not _eligible(dilated, x, min_in_ch=128, include_heads=True)


def test_mnv2_depthwise_convs_excluded():
    """MobileNetV2's depthwise convs (feature_group_count=channels) must never
    quantize — _int8_conv runs a dense contraction, and grouped convs have no MXU
    int8 win anyway. Pointwise >=128-in 1x1s and the pyramid stay eligible.
    All-abstract (eval_shape): no compile, no FLOPs."""
    from ssd_object_detection_tpu.models.ssd import MODEL_SPECS, SSD
    from ssd_object_detection_tpu.ops.quant import discover_eligible

    model = SSD(num_classes=81, spec=MODEL_SPECS["ssd300_mnv2"])
    abstract_params = jax.eval_shape(
        model.init, jax.random.PRNGKey(0),
        jax.ShapeDtypeStruct((1, 300, 300, 3), jnp.float32),
    )
    paths = discover_eligible(model, abstract_params, (1, 300, 300, 3))
    assert paths, "expected eligible pointwise convs in MNV2"

    def group_count(path):
        # depthwise convs have kernel in-dim 1 (in_ch/groups); dense have >=128
        node = abstract_params["params"]
        for part in path.split("/"):
            node = node[part]
        return node["kernel"].shape[2]

    for p in paths:
        assert group_count(p) >= 128, f"grouped/depthwise conv selected: {p}"


def test_heads_eligible_only_when_included(micro):
    model, params, x = micro
    with_heads = calibrate(model, params, [x], min_in_ch=128, include_heads=True)
    # both taps are >=128-ch (160 and 192), so all four heads qualify with heads on
    assert {"extra1_conv0", "loc_head0", "conf_head0", "loc_head1", "conf_head1"} == set(
        with_heads
    )


def test_quantized_outputs_close_and_bounded(micro):
    model, params, x = micro
    q_apply, q_params = quantize_ssd(model, params, [x], min_in_ch=128)
    loc_fp, conf_fp = jax.jit(model.apply)(params, x)
    loc_q, conf_q = jax.jit(q_apply)(q_params, x)
    assert loc_q.shape == loc_fp.shape and conf_q.shape == conf_fp.shape
    assert conf_q.dtype == conf_fp.dtype
    for a, b in ((loc_q, loc_fp), (conf_q, conf_fp)):
        rel = float(
            jnp.linalg.norm((a - b).astype(jnp.float32))
            / (jnp.linalg.norm(b.astype(jnp.float32)) + 1e-9)
        )
        assert rel < 0.02, rel  # per-channel weights + per-tensor acts: ~0.3% here


def test_int8_conv_exact_on_grid(micro):
    """When activations and weights are exact multiples of their scales, the int8
    path is EXACT (up to the bf16 output cast): quantization round-trips losslessly."""
    model, params, x = micro
    stats = calibrate(model, params, [x], min_in_ch=128)
    (path,) = stats

    # snap the eligible conv's weights to an int8 grid with the dyadic scale 2^-5
    # and pin every out-channel's absmax to exactly 127 * 2^-5, so the derived
    # per-channel scale is exactly 2^-5 (127*2^-5 and its quotient by 127 are both
    # representable) and the dequantized weights reproduce the kernel bit-exactly
    import flax

    tree = flax.core.unfreeze(params) if hasattr(params, "items") else params
    node = tree["params"]
    for part in path.split("/"):
        node = node[part]
    w = np.asarray(node["kernel"])
    snapped = np.clip(np.round(w / 2.0**-5), -127, 127) * 2.0**-5
    snapped[0, 0, 0, :] = 127 * 2.0**-5  # pin per-channel absmax
    node["kernel"] = jnp.asarray(snapped, np.float32)

    stats2 = {path: 1.0}  # x_scale unused by the weight round-trip
    qspec = quantize_weights(tree, stats2)
    np.testing.assert_array_equal(np.asarray(qspec[path]["w_scale"]), 2.0**-5)
    np.testing.assert_array_equal(
        np.asarray(qspec[path]["w_q"], np.float32) * np.asarray(qspec[path]["w_scale"]),
        snapped.astype(np.float32),
    )


def test_quantized_predict_under_dp_mesh_matches_single_device(micro):
    """The int8 serving path shards like any apply_fn: quantized predict over a
    batch-sharded input on the 8-device mesh returns detections identical to
    single-device (q_params replicate as a plain pytree — the int8 path is
    per-image, so DP cannot change any value)."""
    from ssd_object_detection_tpu.eval.predict import make_predict_fn
    from ssd_object_detection_tpu.ops.anchors import generate_anchors
    from ssd_object_detection_tpu.parallel.mesh import make_mesh, replicate, shard_batch

    model, params, x = micro
    q_apply, q_params = quantize_ssd(model, params, [x], min_in_ch=128)
    anchors = generate_anchors(model.spec.anchor_spec)
    predict = make_predict_fn(q_apply, anchors, pre_nms_top_k=50)

    rng = np.random.default_rng(3)
    images = jnp.asarray(rng.uniform(0, 1, (8, 64, 64, 3)).astype(np.float32))
    det1 = predict(q_params, images)

    mesh = make_mesh(8)
    det8 = predict(replicate(q_params, mesh), shard_batch(images, mesh))
    for a, b in zip(det1, det8):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_quantized_path_through_evaluate_batches(micro):
    """tools/eval.py --ptq drives eval/runner.evaluate_batches with the quantized
    (predict_fn, q_params) pair — the runner must treat q_params as opaque."""
    from ssd_object_detection_tpu.eval.predict import make_predict_fn
    from ssd_object_detection_tpu.eval.runner import evaluate_batches
    from ssd_object_detection_tpu.ops.anchors import generate_anchors

    model, params, x = micro
    q_apply, q_params = quantize_ssd(model, params, [x], min_in_ch=128)
    anchors = generate_anchors(model.spec.anchor_spec)
    predict = make_predict_fn(q_apply, anchors, pre_nms_top_k=50)

    rng = np.random.default_rng(4)
    batch = {
        "image": rng.uniform(0, 1, (4, 64, 64, 3)).astype(np.float32),
        "gt_cls": rng.integers(0, 8, (4, 3)).astype(np.int32),
        "gt_boxes": np.concatenate(
            [rng.uniform(0.3, 0.7, (4, 3, 2)), rng.uniform(0.1, 0.2, (4, 3, 2))],
            axis=-1).astype(np.float32),
        "gt_valid": np.ones((4, 3), bool),
        "orig_size": np.full((4, 2), 64, np.int32),
    }
    metrics = evaluate_batches(predict, q_params, [batch], num_classes=8)
    assert np.isfinite(metrics["mAP@0.5"])


def test_quantized_apply_is_jit_and_predict_compatible(micro):
    """q_apply works as the apply_fn of the production predict path."""
    from ssd_object_detection_tpu.eval.predict import make_predict_fn
    from ssd_object_detection_tpu.ops.anchors import generate_anchors

    model, params, x = micro
    q_apply, q_params = quantize_ssd(model, params, [x], min_in_ch=128)
    anchors = generate_anchors(model.spec.anchor_spec)
    predict = make_predict_fn(q_apply, anchors, pre_nms_top_k=50)
    det = predict(q_params, (x + 1.0) / 2.0)  # predict_fn takes [0,1] images
    assert det.boxes.shape[0] == x.shape[0]
