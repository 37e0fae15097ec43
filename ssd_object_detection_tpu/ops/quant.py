"""Post-training int8 quantization (PTQ) for serving: run the MXU-eligible convs
int8 x int8 -> int32 at the v5e's double (394 TOPS) integer rate.

Why this exists (measured, BASELINE.md round 3): the v5e MXU runs int8 at 2x the
bf16 rate, but the win is REAL only where the contraction fills the array — int8
needs 32-element packing, so <128-channel inputs regress (0.78x at SSD300's
300^2x64 conv). Measured in-graph on the eligible middle section (block2_conv2
through the fc convs), the full quantize -> int8 conv -> dequant chain is 2.31x,
saving ~6 ms of a 17 ms batch-32 device step. So PTQ here is SELECTIVE: only
convs whose input channels >= `min_in_ch` (default 128) quantize; everything
else (early convs, heads by default, decode, NMS) stays in the compute dtype.

Scheme (the standard TensorRT-style recipe):
  - weights: symmetric per-OUTPUT-CHANNEL int8, scale = absmax/127, precomputed
    once from the float params;
  - activations: symmetric per-tensor int8 with STATIC scales calibrated
    offline (max |x| over calibration batches, `calibrate`);
  - accumulation in int32 (`preferred_element_type`), dequant + bias + (the
    caller's relu) fuse into the following elementwise pass.

Zero model-code intrusion: both calibration and the quantized forward use
`flax.linen.intercept_methods` to observe/replace eligible `nn.Conv` calls at
trace time, so every family (VGG/R34/MNV2 x 300/512) and every caller
(make_predict_fn, make_fused_predict_fn, serve exports) works unchanged — pass
the returned `q_apply` wherever an `apply_fn` is expected and the quantized
params dict wherever `params` goes.

The reference has no quantization (or any serving path) — this subsystem is a
TPU-native extension (SURVEY.md section 5, "absent in reference").
Accuracy evidence: tools/eval_synthetic.py --ptq trains a model, evaluates the
float and PTQ paths on the same weights/val split, and reports both mAPs
(EVAL_SYNTHETIC_PTQ.json).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Iterable, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

QuantSpec = Dict[str, Dict[str, jnp.ndarray]]  # path -> {w_q, w_scale, bias, x_scale}


def _conv_path(module: nn.Module) -> str:
    return "/".join(module.path)


def _is_head(path: str) -> bool:
    leaf = path.rsplit("/", 1)[-1]
    return leaf.startswith("loc_head") or leaf.startswith("conf_head")


def _trivial_dilation(d) -> bool:
    if d is None:
        return True
    if isinstance(d, int):
        return d == 1
    return all(int(v) == 1 for v in d)


def _lax_padding(p) -> bool:
    """Whether `p` is a padding form lax.conv_general_dilated accepts verbatim.
    flax's nn.Conv also allows int / per-dim ints ('padding=1'), which it
    canonicalizes internally — _int8_conv forwards module.padding raw, so those
    forms must be excluded here (and asserted there)."""
    if p in ("SAME", "VALID"):
        return True
    return (isinstance(p, (tuple, list))
            and all(isinstance(e, (tuple, list)) and len(e) == 2 for e in p))


def _eligible(module: nn.Module, x: jnp.ndarray, min_in_ch: int, include_heads: bool) -> bool:
    if type(module) is not nn.Conv:  # excludes _S2DConv and any Conv subclass
        return False
    if not _lax_padding(module.padding):
        return False
    if not (_trivial_dilation(module.kernel_dilation)
            and _trivial_dilation(module.input_dilation)):
        # _int8_conv does not forward dilations; a dilated conv would compute a
        # DIFFERENT convolution with the same output shape — exclude it here and
        # assert in _int8_conv so a hand-built QuantSpec fails loudly.
        return False
    if module.feature_group_count != 1:
        # grouped/depthwise (MobileNetV2): per-channel contraction never fills
        # the MXU's 32-element int8 packing, and _int8_conv runs dense — excluded
        return False
    if x.ndim != 4 or x.shape[-1] < min_in_ch:
        return False
    if not include_heads and _is_head(_conv_path(module)):
        return False
    return True


def discover_eligible(
    model: nn.Module,
    params,
    input_shape: Tuple[int, ...],
    min_in_ch: int = 128,
    include_heads: bool = False,
) -> Tuple[str, ...]:
    """Eligible conv paths via an ABSTRACT trace (`jax.eval_shape`) — no device
    compile, no FLOPs. `_eligible` only inspects shapes, so tracing suffices.

    Used where real calibration statistics are not needed (e.g. bench.py, whose
    random weights carry no calibratable signal and whose timing is
    scale-independent); real deployments use `calibrate`/`quantize_ssd`.
    """
    found = []

    def interceptor(next_fun, args, kwargs, context):
        m = context.module
        if context.method_name == "__call__" and _eligible(
            m, args[0], min_in_ch, include_heads
        ):
            found.append(_conv_path(m))
        return next_fun(*args, **kwargs)

    with nn.intercept_methods(interceptor):
        jax.eval_shape(
            model.apply, params, jax.ShapeDtypeStruct(input_shape, jnp.float32)
        )
    return tuple(dict.fromkeys(found))  # dedupe, preserve order


def calibrate(
    model: nn.Module,
    params,
    batches: Iterable[jnp.ndarray],
    min_in_ch: int = 128,
    include_heads: bool = False,
) -> Dict[str, float]:
    """Per-eligible-conv activation absmax over `batches` of model INPUTS (already
    normalized exactly as the serving path will feed them, e.g. (x-0.5)*2).

    Runs the normal float forward under an observing interceptor; jitted, so the
    cost is one forward per batch. Returns {conv_path: absmax float}.
    """

    @jax.jit
    def one_batch(images):
        acc: Dict[str, jnp.ndarray] = {}

        def interceptor(next_fun, args, kwargs, context):
            m = context.module
            if context.method_name == "__call__" and _eligible(
                m, args[0], min_in_ch, include_heads
            ):
                acc[_conv_path(m)] = jnp.max(jnp.abs(args[0].astype(jnp.float32)))
            return next_fun(*args, **kwargs)

        with nn.intercept_methods(interceptor):
            model.apply(params, images)
        return acc

    stats: Dict[str, float] = {}
    for images in batches:
        for path, amax in one_batch(jnp.asarray(images)).items():
            stats[path] = max(stats.get(path, 0.0), float(amax))
    return stats


def quantize_weights(params, stats: Dict[str, float]) -> QuantSpec:
    """Precompute int8 weights (+ scales, biases) for every calibrated conv path.

    Path keys match flax module paths ("vgg/block3_conv1", "extra0_conv0", ...);
    the float kernel/bias live at params["params"][...path...]["kernel"/"bias"].
    """
    tree = params["params"] if "params" in params else params
    qspec: QuantSpec = {}
    for path, amax in stats.items():
        node = tree
        for part in path.split("/"):
            node = node[part]
        kernel = np.asarray(node["kernel"], np.float32)  # (kh, kw, in, out)
        bias = np.asarray(node.get("bias", np.zeros(kernel.shape[-1])), np.float32)
        w_scale = np.abs(kernel).reshape(-1, kernel.shape[-1]).max(axis=0) / 127.0
        w_scale = np.maximum(w_scale, 1e-12)
        w_q = np.clip(np.round(kernel / w_scale), -127, 127).astype(np.int8)
        x_scale = max(float(amax), 1e-12) / 127.0
        qspec[path] = {
            "w_q": jnp.asarray(w_q),
            "w_scale": jnp.asarray(w_scale),
            "bias": jnp.asarray(bias),
            "x_scale": jnp.asarray(np.float32(x_scale)),
        }
    return qspec


def _int8_conv(module: nn.Conv, x: jnp.ndarray, q: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """nn.Conv-equivalent forward through the int8 MXU path."""
    assert _trivial_dilation(module.kernel_dilation) and _trivial_dilation(
        module.input_dilation
    ), f"_int8_conv does not support dilated convs: {_conv_path(module)}"
    assert _lax_padding(module.padding), (
        f"_int8_conv forwards padding raw to lax: {_conv_path(module)} uses "
        f"{module.padding!r} (use 'SAME'/'VALID' or ((lo,hi),...) pairs)")
    strides = module.strides or (1, 1)
    if isinstance(strides, int):
        strides = (strides, strides)
    xq = jnp.clip(
        jnp.round(x.astype(jnp.float32) / q["x_scale"]), -127, 127
    ).astype(jnp.int8)
    yq = jax.lax.conv_general_dilated(
        xq,
        q["w_q"],
        window_strides=tuple(strides),
        padding=module.padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    y = yq.astype(jnp.float32) * (q["x_scale"] * q["w_scale"])
    if module.use_bias:
        y = y + q["bias"]
    return y.astype(module.dtype)


def make_quantized_apply(model: nn.Module) -> Callable:
    """Returns `q_apply(q_params, images) -> model outputs` where
    `q_params = {"fp": <float params>, "quant": <QuantSpec>}`.

    Drop-in `apply_fn` for make_predict_fn / make_fused_predict_fn / serve
    exports — pass `q_params` wherever those take `params`. Convs present in
    the QuantSpec run int8; everything else runs the normal float path (their
    float kernels in "fp" are untouched; XLA dead-code-eliminates the unused
    quantized layers' float weights from the compiled program).
    """

    def q_apply(q_params, images):
        qspec = q_params["quant"]

        def interceptor(next_fun, args, kwargs, context):
            m = context.module
            if context.method_name == "__call__" and isinstance(m, nn.Conv):
                q = qspec.get(_conv_path(m))
                if q is not None:
                    return _int8_conv(m, args[0], q)
            return next_fun(*args, **kwargs)

        with nn.intercept_methods(interceptor):
            return model.apply(q_params["fp"], images)

    return q_apply


def quantize_synthetic(
    model: nn.Module,
    params,
    input_shape: Tuple[int, ...],
    min_in_ch: int = 128,
    include_heads: bool = False,
):
    """PTQ setup with SYNTHETIC unit scales — for timing harnesses only
    (bench.py, tools/profile.py, tools/sweep_infer.py).

    Eligibility comes from an abstract trace (`discover_eligible`, no device
    compile); every scale is 1.0. int8 THROUGHPUT is scale-independent, so the
    timing matches a calibrated deployment exactly, but the outputs are
    numerically meaningless for accuracy work — use `calibrate`/`quantize_ssd`
    there (accuracy gate: tools/eval_synthetic.py --ptq).

    Returns (q_apply, q_params, n_quantized_convs).
    """
    stats = {
        path: 1.0
        for path in discover_eligible(
            model, params, input_shape, min_in_ch=min_in_ch,
            include_heads=include_heads,
        )
    }
    q_apply = make_quantized_apply(model)
    q_params = {"fp": params, "quant": quantize_weights(params, stats)}
    return q_apply, q_params, len(stats)


def quantize_ssd(
    model: nn.Module,
    params,
    calib_batches: Iterable[jnp.ndarray],
    min_in_ch: int = 128,
    include_heads: bool = False,
) -> Tuple[Callable, Dict[str, Any]]:
    """One-call PTQ: calibrate -> quantize -> wrap. Returns (q_apply, q_params).

    `calib_batches` are model inputs in the SERVING normalization ([-1, 1]);
    a handful of batches suffices for per-tensor absmax calibration.
    """
    stats = calibrate(
        model, params, calib_batches, min_in_ch=min_in_ch, include_heads=include_heads
    )
    qspec = quantize_weights(params, stats)
    return make_quantized_apply(model), {"fp": params, "quant": qspec}
