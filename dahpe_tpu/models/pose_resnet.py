"""Pose estimation models: supervised Simple-Baseline and the multiscale
adversarial multi-head model.

Parity targets:
- ``PoseResNet``          ← ``uda/model/pose_resnet2.py:157-189``
- ``MultiHeadPoseResNet`` ← ``PoseResNetx9`` / ``PoseResNetx10``
                            (``uda/model/regda_7.py:4861-5061``)

The reference's warm-start gradient layer (mutable ``iter_num`` state) is a
pure ``gl_coeff`` argument here so the whole forward stays jit-traceable; the
coefficient schedule lives in :func:`dahpe_tpu.ops.warm_start_coeff`.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from dahpe_tpu.models.heads import FusionHead, PlainHead, head_init
from dahpe_tpu.models.upsampling import Upsampling
from dahpe_tpu.ops.gradient_scale import gradient_scale


class PoseResNet(nn.Module):
    """Backbone → deconv upsampling → Conv1x1 head (pretrain model)."""

    backbone: nn.Module
    num_keypoints: int = 21
    feature_dim: int = 256
    dtype: Any = None
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, *, train: bool = False, gl_coeff=0.0
    ) -> jnp.ndarray:
        del gl_coeff  # uniform signature with MultiHeadPoseResNet
        x = self.backbone(x, train=train)
        x = Upsampling(
            dtype=self.dtype, bn_axis_name=self.bn_axis_name, name="upsampling"
        )(x, train=train)
        return nn.Conv(
            self.num_keypoints,
            (1, 1),
            use_bias=True,
            dtype=self.dtype,
            kernel_init=head_init,
            bias_init=nn.initializers.zeros_init(),
            name="head",
        )(x)


class MultiHeadPoseResNet(nn.Module):
    """Main head + 3-scale adversarial cascade (64 → 32 → 16 heatmaps).

    ``__call__`` always returns the 5-tuple dict; eval callers read ``y``
    (the reference's eval branch, ``regda_7.py:4943-4946``).

    The forward is split into :meth:`features` / :meth:`main_head` /
    :meth:`adv_heads` so the DA step can reuse the (unchanged) feature and
    main-head computation between its B and C sub-steps instead of running
    the backbone three times per iteration (``train/da.py``); ``__call__``
    composes them and is the only entry eval/serving ever needs. Submodule
    attribute names keep the torch state-dict key map intact.
    """

    backbone: nn.Module
    num_keypoints: int = 21
    feature_dim: int = 256
    num_head_layers: int = 2
    dtype: Any = None
    bn_axis_name: str | None = None

    def setup(self):
        common = dict(
            num_keypoints=self.num_keypoints,
            channel_dim=self.feature_dim,
            dtype=self.dtype,
            bn_axis_name=self.bn_axis_name,
        )
        self.upsampling = Upsampling(
            dtype=self.dtype, bn_axis_name=self.bn_axis_name
        )
        self.head = PlainHead(num_layers=self.num_head_layers, **common)
        self.head_adv = PlainHead(num_layers=self.num_head_layers, **common)
        self.head_adv2 = FusionHead(
            feature_stride=1, num_layers=self.num_head_layers, **common
        )
        self.head_adv3 = FusionHead(
            feature_stride=2, num_layers=self.num_head_layers, **common
        )

    def features(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        """Backbone + deconv upsampling → (B, 64, 64, 256) feature map."""
        return self.upsampling(self.backbone(x, train=train), train=train)

    def main_head(self, f: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        """The supervised 64×64 head on the feature map."""
        return self.head(f, train=train)

    def adv_heads(
        self,
        f: jnp.ndarray,
        *,
        train: bool = False,
        gl_coeff: jnp.ndarray | float = 0.0,
    ) -> dict[str, jnp.ndarray]:
        """The three adversarial heads off the λ-scaled feature map."""
        f_adv = gradient_scale(f, jnp.asarray(gl_coeff, dtype=f.dtype))
        y_adv = self.head_adv(f_adv, train=train)
        y_adv2 = self.head_adv2(f_adv, y_adv, train=train)
        y_adv3 = self.head_adv3(f_adv, y_adv2, train=train)
        return {"y_adv": y_adv, "y_adv2": y_adv2, "y_adv3": y_adv3}

    def __call__(
        self,
        x: jnp.ndarray,
        *,
        train: bool = False,
        gl_coeff: jnp.ndarray | float = 0.0,
    ) -> dict[str, jnp.ndarray]:
        f = self.features(x, train=train)
        y = self.main_head(f, train=train)
        advs = self.adv_heads(f, train=train, gl_coeff=gl_coeff)
        return {"y": y, "f": f, **advs}
