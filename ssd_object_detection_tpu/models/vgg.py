"""VGG-16 feature trunk, truncated at block3_conv3.

The reference builds this from keras.applications.VGG16 with ImageNet weights and taps
the `block3_conv3` activation (reference models/ssd_model.py:77-82). Here it is an
explicit flax module (NHWC) with Keras-compatible layer names so ImageNet weights can be
imported from a Keras .h5 file when one is available (models/import_keras.py); with zero
network egress the default is truncated-normal init.

For a 300x300 input the trunk output is 75x75x256 (two 2x2 max-pools); for 512 -> 128.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class VGG16Trunk(nn.Module):
    """conv3-64 x2, pool, conv3-128 x2, pool, conv3-256 x3 (through block3_conv3)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        stages = ((1, 64, 2), (2, 128, 2), (3, 256, 3))
        for block, features, n_convs in stages:
            if block > 1:
                x = nn.max_pool(x, window_shape=(2, 2), strides=(2, 2))
            for i in range(1, n_convs + 1):
                x = nn.Conv(
                    features,
                    kernel_size=(3, 3),
                    padding="SAME",
                    dtype=self.dtype,
                    param_dtype=jnp.float32,
                    name=f"block{block}_conv{i}",
                )(x)
                x = nn.relu(x)
        return x
