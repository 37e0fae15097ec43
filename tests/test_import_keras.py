"""Keras .h5 weight import (models/import_keras.py): all three weight layouts, plus
activation parity between a reference-architecture tf.keras model and the flax model
loaded from its saved .h5 (VERDICT round-1 item 5)."""

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

import jax
import jax.numpy as jnp

from ssd_object_detection_tpu.models.import_keras import (
    _TRUNK_LAYERS,
    load_reference_ssd_h5,
    load_vgg16_trunk_into,
)
from ssd_object_detection_tpu.models.ssd import SSD, SSD300_SPEC_MODEL

# (name, kernel_shape) for the 13 pyramid convs then 6+6 heads, in reference build
# order (reference models/ssd_model.py:86-162)
_PYRAMID = [
    (3, 3, 256, 512), (3, 3, 512, 512), (1, 1, 512, 512),
    (3, 3, 512, 1024), (1, 1, 1024, 1024),
    (1, 1, 1024, 256), (3, 3, 256, 512),
    (1, 1, 512, 128), (3, 3, 128, 256),
    (1, 1, 256, 128), (3, 3, 128, 256),
    (1, 1, 256, 128), (3, 3, 128, 256),
]
_FM_CH = [512, 1024, 512, 256, 256, 256]
_PRIORS = [4, 6, 6, 6, 4, 4]
_TRUNK_SHAPES = {
    "block1_conv1": (3, 3, 3, 64), "block1_conv2": (3, 3, 64, 64),
    "block2_conv1": (3, 3, 64, 128), "block2_conv2": (3, 3, 128, 128),
    "block3_conv1": (3, 3, 128, 256), "block3_conv2": (3, 3, 256, 256),
    "block3_conv3": (3, 3, 256, 256),
}


def _rand(shape, rng):
    return rng.normal(0, 0.05, shape).astype(np.float32)


def _all_conv_shapes():
    heads = [(3, 3, c, n * 4) for c, n in zip(_FM_CH, _PRIORS)]
    heads += [(3, 3, c, n * 81) for c, n in zip(_FM_CH, _PRIORS)]
    return _PYRAMID + heads


def _write_legacy_h5(path, rng, suffix=":0", nested_model_name="pre-trained-vgg"):
    """The reference's actual save format (TF2.4-era model.save .h5): model_weights/
    <layer>/<layer>/kernel:0 with layer_names + weight_names attrs."""
    layer_names = [nested_model_name] + [
        f"conv2d_{i}" if i else "conv2d" for i in range(len(_all_conv_shapes()))
    ]
    made = {}
    with h5py.File(path, "w") as f:
        mw = f.create_group("model_weights")
        mw.attrs["layer_names"] = np.array([n.encode() for n in layer_names])
        g = mw.create_group(nested_model_name)
        wn = []
        for lname in _TRUNK_LAYERS:
            k = _rand(_TRUNK_SHAPES[lname], rng)
            b = _rand((_TRUNK_SHAPES[lname][-1],), rng)
            g.create_dataset(f"{lname}/kernel{suffix}", data=k)
            g.create_dataset(f"{lname}/bias{suffix}", data=b)
            wn += [f"{lname}/kernel{suffix}", f"{lname}/bias{suffix}"]
            made[lname] = (k, b)
        g.attrs["weight_names"] = np.array([n.encode() for n in wn])
        for lname, shape in zip(layer_names[1:], _all_conv_shapes()):
            g = mw.create_group(lname)
            k, b = _rand(shape, rng), _rand((shape[-1],), rng)
            g.create_dataset(f"{lname}/kernel{suffix}", data=k)
            g.create_dataset(f"{lname}/bias{suffix}", data=b)
            g.attrs["weight_names"] = np.array(
                [f"{lname}/kernel{suffix}".encode(), f"{lname}/bias{suffix}".encode()]
            )
            made[lname] = (k, b)
    return made


def _write_keras3_vars_h5(path, rng):
    """Keras 3 layout: <layer>/vars/{0,1}, no weight_names attrs, no layer_names."""
    made = {}
    with h5py.File(path, "w") as f:
        g = f.create_group("functional")
        for lname in _TRUNK_LAYERS:
            sub = g.create_group(lname).create_group("vars")
            k = _rand(_TRUNK_SHAPES[lname], rng)
            b = _rand((_TRUNK_SHAPES[lname][-1],), rng)
            sub.create_dataset("0", data=k)
            sub.create_dataset("1", data=b)
            made[lname] = (k, b)
        for i, shape in enumerate(_all_conv_shapes()):
            lname = f"conv2d_{i}" if i else "conv2d"
            sub = f.create_group(lname).create_group("vars")
            k, b = _rand(shape, rng), _rand((shape[-1],), rng)
            sub.create_dataset("0", data=k)
            sub.create_dataset("1", data=b)
            made[lname] = (k, b)
    return made


@pytest.fixture(scope="module")
def flax_params():
    model = SSD(num_classes=81, spec=SSD300_SPEC_MODEL)
    return model.init(jax.random.PRNGKey(0), jnp.zeros((1, 300, 300, 3)))


@pytest.mark.parametrize("suffix", [":0", ""])
def test_full_import_legacy_layout(tmp_path, flax_params, suffix):
    rng = np.random.default_rng(0)
    path = str(tmp_path / "ref.h5")
    made = _write_legacy_h5(path, rng, suffix=suffix)
    loaded = load_reference_ssd_h5(flax_params, path)
    p = loaded["params"]
    np.testing.assert_array_equal(p["vgg"]["block2_conv1"]["kernel"], made["block2_conv1"][0])
    # conv2d (first pyramid conv) -> extra0_conv0; conv2d_13 -> loc_head0;
    # conv2d_19 -> conf_head0 (13 pyramid convs precede the heads)
    np.testing.assert_array_equal(p["extra0_conv0"]["kernel"], made["conv2d"][0])
    np.testing.assert_array_equal(p["extra5_conv1"]["bias"], made["conv2d_12"][1])
    np.testing.assert_array_equal(p["loc_head0"]["kernel"], made["conv2d_13"][0])
    np.testing.assert_array_equal(p["conf_head5"]["kernel"], made["conv2d_24"][0])


def test_full_import_keras3_vars_layout(tmp_path, flax_params):
    rng = np.random.default_rng(1)
    path = str(tmp_path / "k3.h5")
    made = _write_keras3_vars_h5(path, rng)
    loaded = load_reference_ssd_h5(flax_params, path)
    p = loaded["params"]
    np.testing.assert_array_equal(p["vgg"]["block3_conv3"]["kernel"], made["block3_conv3"][0])
    np.testing.assert_array_equal(p["extra1_conv0"]["kernel"], made["conv2d_3"][0])
    np.testing.assert_array_equal(p["conf_head0"]["bias"], made["conv2d_19"][1])


def test_full_import_shape_mismatch_raises(tmp_path, flax_params):
    rng = np.random.default_rng(2)
    path = str(tmp_path / "bad.h5")
    shapes = _all_conv_shapes()
    shapes[0] = (3, 3, 256, 99)  # wrong pyramid conv
    with h5py.File(path, "w") as f:
        mw = f.create_group("model_weights")
        names = []
        g = mw.create_group("trunk")
        wn = []
        for lname in _TRUNK_LAYERS:
            g.create_dataset(f"{lname}/kernel", data=_rand(_TRUNK_SHAPES[lname], rng))
            g.create_dataset(f"{lname}/bias", data=_rand((_TRUNK_SHAPES[lname][-1],), rng))
            wn += [f"{lname}/kernel", f"{lname}/bias"]
        g.attrs["weight_names"] = np.array([n.encode() for n in wn])
        names.append("trunk")
        for i, shape in enumerate(shapes):
            lname = f"conv2d_{i}" if i else "conv2d"
            lg = mw.create_group(lname)
            lg.create_dataset(f"{lname}/kernel", data=_rand(shape, rng))
            lg.create_dataset(f"{lname}/bias", data=_rand((shape[-1],), rng))
            lg.attrs["weight_names"] = np.array(
                [f"{lname}/kernel".encode(), f"{lname}/bias".encode()]
            )
            names.append(lname)
        mw.attrs["layer_names"] = np.array([n.encode() for n in names])
    with pytest.raises(ValueError):
        load_reference_ssd_h5(flax_params, path)


def test_trunk_only_import_legacy(tmp_path, flax_params):
    rng = np.random.default_rng(3)
    path = str(tmp_path / "vgg.h5")
    with h5py.File(path, "w") as f:
        for lname in _TRUNK_LAYERS:
            g = f.create_group(lname).create_group(lname)
            g.create_dataset("kernel:0", data=_rand(_TRUNK_SHAPES[lname], rng))
            g.create_dataset("bias:0", data=_rand((_TRUNK_SHAPES[lname][-1],), rng))
    loaded = load_vgg16_trunk_into(flax_params, path)
    assert loaded["params"]["vgg"]["block1_conv1"]["kernel"].shape == (3, 3, 3, 64)


def test_activation_parity_with_tf_keras(tmp_path, flax_params):
    """Gold test: the reference-equivalent tf.keras model (tools/measure_reference.py)
    saved to .h5 and imported must produce the SAME (loc, conf) outputs."""
    tf = pytest.importorskip("tensorflow")
    import sys

    sys.path.insert(0, "/root/repo")
    from tools.measure_reference import build_reference_model

    keras_model = build_reference_model()
    path = str(tmp_path / "full_ref.h5")
    keras_model.save(path)

    loaded = load_reference_ssd_h5(flax_params, path)
    model = SSD(num_classes=81, spec=SSD300_SPEC_MODEL)

    rng = np.random.default_rng(4)
    x = rng.uniform(-1, 1, (2, 300, 300, 3)).astype(np.float32)
    loc_k, conf_k = keras_model(tf.constant(x), training=False)
    loc_j, conf_j = model.apply(loaded, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(loc_j), loc_k.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(conf_j), conf_k.numpy(), atol=2e-4)
