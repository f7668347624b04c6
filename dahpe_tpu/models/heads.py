"""Regression heads: the plain per-scale head and the two multiscale fusion
heads of the reference's cascade.

Parity targets:
- plain head:    ``regda_7.py:4906-4929`` (``PoseResNetx9._make_head``)
- 64→32 fusion:  ``regda_7.py:4508-4581`` (class ``make_head``)
- →16 fusion:    ``regda_7.py:4583-4662`` (class ``make_head2``)

Submodules are named by the torch Sequential indices so ``.pth`` keys map
mechanically (e.g. ``head_adv2.last_lay.2.weight`` → ``head_adv2/last_lay_2``).
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from dahpe_tpu.models.batch_norm import BatchNorm2d

head_init = nn.initializers.normal(stddev=1e-3)


class PlainHead(nn.Module):
    """[Conv3x3 → BN → ReLU] x (num_layers-1) → Conv1x1(C→K)."""

    num_keypoints: int
    num_layers: int = 2
    channel_dim: int = 256
    dtype: Any = None
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool) -> jnp.ndarray:
        conv = partial(
            nn.Conv,
            use_bias=True,
            dtype=self.dtype,
            kernel_init=head_init,
            bias_init=nn.initializers.zeros_init(),
        )
        for i in range(self.num_layers - 1):
            x = conv(self.channel_dim, (3, 3), padding=1, name=str(3 * i))(x)
            x = BatchNorm2d(
                dtype=self.dtype, axis_name=self.bn_axis_name, name=str(3 * i + 1)
            )(x, train=train)
            x = nn.relu(x)
        return conv(
            self.num_keypoints, (1, 1), name=str(3 * (self.num_layers - 1))
        )(x)


class DownsampleStage(nn.Module):
    """``_make_head2`` stack: [BN,ReLU,Conv3x3 s2,BN,ReLU] + Conv1x1 + BN + ReLU.

    One stride-2 block halving the spatial size (``regda_7.py:4544-4571``).
    """

    channel_dim: int = 256
    dtype: Any = None
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool) -> jnp.ndarray:
        conv = partial(
            nn.Conv,
            use_bias=True,
            dtype=self.dtype,
            kernel_init=head_init,
            bias_init=nn.initializers.zeros_init(),
        )
        bn = partial(BatchNorm2d, dtype=self.dtype, axis_name=self.bn_axis_name)
        x = bn(name="0")(x, train=train)
        x = nn.relu(x)
        x = conv(self.channel_dim, (3, 3), strides=2, padding=1, name="2")(x)
        x = bn(name="3")(x, train=train)
        x = nn.relu(x)
        x = conv(self.channel_dim, (1, 1), name="5")(x)
        x = bn(name="6")(x, train=train)
        return nn.relu(x)


class FusionHead(nn.Module):
    """Adversarial fusion head: previous heatmap + features → half-res heatmap.

    ``feature_stride=1`` reproduces ``make_head`` (head_adv2: f@64 + y_adv@64
    fused at 64, downsampled to 32); ``feature_stride=2`` reproduces
    ``make_head2`` (head_adv3: f 64→32 via strided 3x3, + y_adv2@32, fused at
    32, downsampled to 16).
    """

    num_keypoints: int
    feature_stride: int = 1
    num_layers: int = 2
    channel_dim: int = 256
    dtype: Any = None
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(
        self, feature: jnp.ndarray, heatmap: jnp.ndarray, *, train: bool
    ) -> jnp.ndarray:
        conv = partial(
            nn.Conv,
            use_bias=True,
            dtype=self.dtype,
            kernel_init=head_init,
            bias_init=nn.initializers.zeros_init(),
        )
        hm = conv(self.channel_dim, (1, 1), name="heatmap_conv")(heatmap)
        if self.feature_stride == 1:
            ft = conv(self.channel_dim, (1, 1), name="feature_conv")(feature)
        else:
            ft = conv(
                self.channel_dim,
                (3, 3),
                strides=self.feature_stride,
                padding=1,
                name="feature_conv",
            )(feature)
        x = hm + ft
        x = DownsampleStage(
            channel_dim=self.channel_dim,
            dtype=self.dtype,
            bn_axis_name=self.bn_axis_name,
            name="last_lay",
        )(x, train=train)
        return PlainHead(
            num_keypoints=self.num_keypoints,
            num_layers=self.num_layers,
            channel_dim=self.channel_dim,
            dtype=self.dtype,
            bn_axis_name=self.bn_axis_name,
            name="model",
        )(x, train=train)
