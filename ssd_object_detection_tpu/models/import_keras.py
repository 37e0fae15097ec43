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
