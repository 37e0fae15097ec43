"""Optional ImageNet VGG-16 weight import from a Keras .h5 file.

The reference initializes its trunk from keras.applications.VGG16 ImageNet weights
(models/ssd_model.py:77-82), which requires a network download. This environment has no
egress, so pretrained weights are OPTIONAL here: if the user has
`vgg16_weights_tf_dim_ordering_tf_kernels_notop.h5` (the standard Keras artifact) on
disk, point `model.pretrained_vgg` at it and the trunk loads it; otherwise training
starts from random init.

Layout notes: Keras Conv2D kernels are HWIO — identical to flax nn.Conv — so the copy
is direct, no transpose. The reference feeds [-1,1]-normalized RGB into these weights
even though they were trained with caffe-style preprocessing (models/ssd_model.py:214);
we replicate the reference's behavior by changing nothing about the input path.
"""

from __future__ import annotations

import logging

import jax
import numpy as np

logger = logging.getLogger(__name__)

_TRUNK_LAYERS = [
    "block1_conv1", "block1_conv2",
    "block2_conv1", "block2_conv2",
    "block3_conv1", "block3_conv2", "block3_conv3",
]


def load_vgg16_trunk_weights(h5_path: str):
    """Read {layer: {kernel, bias}} for the trunk layers from a Keras VGG16 .h5."""
    import h5py  # optional dep, present in the base image alongside tensorflow

    out = {}
    with h5py.File(h5_path, "r") as f:
        root = f["model_weights"] if "model_weights" in f else f
        for name in _TRUNK_LAYERS:
            grp = root[name]
            # keras nests one more level: name/name/{kernel:0, bias:0} (old) or
            # name/vars/{0,1} (keras 3)
            if name in grp:
                kernel = np.asarray(grp[name]["kernel:0"])
                bias = np.asarray(grp[name]["bias:0"])
            elif "vars" in grp:
                kernel = np.asarray(grp["vars"]["0"])
                bias = np.asarray(grp["vars"]["1"])
            else:  # weight_names attribute style
                names = [n.decode() if isinstance(n, bytes) else n for n in grp.attrs["weight_names"]]
                kernel = np.asarray(grp[names[0]])
                bias = np.asarray(grp[names[1]])
            out[name] = {"kernel": kernel.astype(np.float32), "bias": bias.astype(np.float32)}
    return out


def load_vgg16_trunk_into(params, h5_path: str):
    """Return a copy of flax `params` with the VGG trunk replaced by Keras weights."""
    weights = load_vgg16_trunk_weights(h5_path)
    params = jax.tree.map(lambda x: x, params)  # shallow copy of the tree
    vgg = dict(params["params"]["vgg"])
    for name, w in weights.items():
        expect = vgg[name]["kernel"].shape
        assert w["kernel"].shape == expect, (name, w["kernel"].shape, expect)
        vgg[name] = {"kernel": w["kernel"], "bias": w["bias"]}
    new_params = dict(params["params"])
    new_params["vgg"] = vgg
    logger.info("loaded VGG16 trunk (%d layers) from %s", len(weights), h5_path)
    return {**params, "params": new_params}


# --------------------------------------------------------------------------- full model
def _layer_conv_weights(grp) -> list:
    """All (name, kernel, bias) conv pairs inside one Keras layer group, in the
    layer's own weight order. Handles the three Keras weight layouts:
      - legacy `weight_names` attr with datasets `<sub>/kernel[:0]` (TF <= 2.15 and
        the Keras-3 legacy .h5 writer — the reference's save format,
        reference models/ssd_model.py:405-411);
      - Keras 3 `vars/{0,1}` groups;
      - bare nested `<name>/<name>/{kernel,bias}` groups.
    """
    import h5py

    out = []
    wn = grp.attrs.get("weight_names")
    if wn is not None and len(wn):
        names = [n.decode() if isinstance(n, bytes) else n for n in wn]
        arrays = {n: np.asarray(grp[n]) for n in names}
        kernels = [n for n in names if n.split("/")[-1].split(":")[0] == "kernel"]
        for kname in kernels:
            bname = kname.replace("kernel", "bias")
            if bname in arrays and arrays[kname].ndim == 4:
                out.append((kname.rsplit("/", 1)[0], arrays[kname], arrays[bname]))
        return out

    def visit(name, obj):
        if isinstance(obj, h5py.Group):
            if "vars" in obj and "0" in obj["vars"]:
                k = np.asarray(obj["vars"]["0"])
                if k.ndim == 4 and "1" in obj["vars"]:
                    out.append((name, k, np.asarray(obj["vars"]["1"])))
            elif "kernel" in obj and "bias" in obj:
                k = np.asarray(obj["kernel"])
                if k.ndim == 4:
                    out.append((name, k, np.asarray(obj["bias"])))

    visit("", grp)
    grp.visititems(visit)
    return out


def _ordered_layer_names(root) -> list:
    """Model-order layer list: the `layer_names` attr when present (it preserves
    build order), else a natural sort of group names (Keras default names are
    `conv2d`, `conv2d_1`, ..., where lexicographic order would put 10 before 2)."""
    import re

    ln = root.attrs.get("layer_names")
    if ln is not None and len(ln):
        return [n.decode() if isinstance(n, bytes) else n for n in ln]

    def natural(name):
        return [int(p) if p.isdigit() else p for p in re.split(r"(\d+)", name)]

    return sorted(root.keys(), key=natural)


def load_reference_ssd_h5(params, h5_path: str, num_feature_maps: int = 6):
    """Import a FULL reference-architecture Keras SSD .h5 into flax `params`.

    The reference saves the whole model per epoch (models/ssd_model.py:405-411,
    `model_weight_epoch_{i}.h5`) with UNNAMED Conv2D layers, so names are Keras
    defaults whose numeric suffixes depend on session-global counters. Mapping is
    therefore positional-by-build-order (the reference builds 13 pyramid convs, then
    6 loc heads, then 6 conf heads — reference models/ssd_model.py:86-162), with the
    nested VGG trunk matched by its stable `block{i}_conv{j}` names. Every assignment
    is shape-checked, so a wrong ordering cannot load silently.

    Returns a new params pytree; raises on any shape mismatch or missing layer.
    """
    import h5py

    p = params["params"]
    vgg = dict(p["vgg"])
    new_p = dict(p)

    trunk_found = {}
    sequence = []  # non-trunk conv (kernel, bias) in model order
    with h5py.File(h5_path, "r") as f:
        root = f["model_weights"] if "model_weights" in f else f
        for lname in _ordered_layer_names(root):
            if lname not in root:
                continue
            for wname, kernel, bias in _layer_conv_weights(root[lname]):
                base = wname.split("/")[-1] if "/" in wname else wname
                m = [part for part in wname.split("/") if part.startswith("block")]
                if m:
                    trunk_found[m[0]] = (kernel, bias)
                elif base.startswith("block"):
                    trunk_found[base] = (kernel, bias)
                else:
                    sequence.append((kernel, bias))

    for name in _TRUNK_LAYERS:
        if name not in trunk_found:
            raise ValueError(f"trunk layer {name} not found in {h5_path}")
        kernel, bias = trunk_found[name]
        expect = vgg[name]["kernel"].shape
        if kernel.shape != expect:
            raise ValueError(f"{name}: kernel {kernel.shape} != expected {expect}")
        vgg[name] = {"kernel": kernel.astype(np.float32), "bias": bias.astype(np.float32)}
    new_p["vgg"] = vgg

    # positional mapping: pyramid convs, then loc heads, then conf heads
    extra_names = [k for k in sorted(p.keys()) if k.startswith("extra")]
    extra_names.sort(key=lambda s: (int(s.split("_")[0][5:]), int(s.split("conv")[1])))
    order = (
        extra_names
        + [f"loc_head{i}" for i in range(num_feature_maps)]
        + [f"conf_head{i}" for i in range(num_feature_maps)]
    )
    if len(sequence) != len(order):
        raise ValueError(
            f"{h5_path} holds {len(sequence)} non-trunk convs; model expects {len(order)}"
        )
    for name, (kernel, bias) in zip(order, sequence):
        expect = p[name]["kernel"].shape
        if kernel.shape != expect:
            raise ValueError(f"{name}: kernel {kernel.shape} != expected {expect}")
        new_p[name] = {"kernel": kernel.astype(np.float32), "bias": bias.astype(np.float32)}

    logger.info(
        "loaded full reference SSD (%d trunk + %d pyramid/head convs) from %s",
        len(_TRUNK_LAYERS), len(sequence), h5_path,
    )
    return {**params, "params": new_p}
