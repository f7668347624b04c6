"""Original RegDA baseline model: three same-scale heads, no fusion cascade.

The reference's ``uda/model/regda_4.py:PoseResNet`` (`:649-742`) — the CVPR'21
RegDA architecture the multiscale model evolved from: main head ``y``,
adversarial head ``y_adv`` behind the GL layer, and a second adversarial head
``y_adv2`` off the clean features; eval returns ``y_adv2``
(``regda_4.py:716-727``). Kept as a first-class model family so RegDA
baselines can be trained/evaluated in this framework.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from dahpe_tpu.models.heads import PlainHead
from dahpe_tpu.models.upsampling import Upsampling
from dahpe_tpu.ops.gradient_scale import gradient_scale


class RegDAPoseResNet(nn.Module):
    backbone: nn.Module
    num_keypoints: int = 21
    feature_dim: int = 256
    num_head_layers: int = 2
    dtype: Any = None
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        *,
        train: bool = False,
        gl_coeff: jnp.ndarray | float = 0.0,
    ) -> dict[str, jnp.ndarray]:
        feats = self.backbone(x, train=train)
        f = Upsampling(
            dtype=self.dtype, bn_axis_name=self.bn_axis_name, name="upsampling"
        )(feats, train=train)
        f_adv = gradient_scale(f, jnp.asarray(gl_coeff, dtype=f.dtype))
        common = dict(
            num_keypoints=self.num_keypoints,
            num_layers=self.num_head_layers,
            channel_dim=self.feature_dim,
            dtype=self.dtype,
            bn_axis_name=self.bn_axis_name,
        )
        y = PlainHead(name="head", **common)(f, train=train)
        y_adv = PlainHead(name="head_adv", **common)(f_adv, train=train)
        y_adv2 = PlainHead(name="head_adv2", **common)(f, train=train)
        # eval consumers read y_adv2 (regda_4.py:716-727); training uses all
        return {"y": y, "y_adv": y_adv, "y_adv2": y_adv2, "f": f}
