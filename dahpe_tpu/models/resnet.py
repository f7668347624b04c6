"""Headless ResNet backbones (NHWC, Flax) for pose estimation.

Re-implements the behavior of ``uda/model/resnet.py`` (a torchvision ResNet
whose forward stops after ``layer4``, stride-32 features) with TPU-friendly
NHWC layout. Submodule names mirror the torch ``state_dict`` keys
(``conv1 / bn1 / layerN.i.convJ / ... / downsample.{0,1}``) so the ``.pth``
importer (``dahpe_tpu.utils.torch_import``) is a mechanical key map.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from dahpe_tpu.models.batch_norm import BatchNorm2d

# Kaiming-normal fan_out (torch's conv default for ResNets).
conv_init = nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal")


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    groups: int = 1
    base_width: int = 64
    dtype: Any = None
    bn_axis_name: str | None = None

    expansion: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool) -> jnp.ndarray:
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype, kernel_init=conv_init)
        bn = partial(BatchNorm2d, dtype=self.dtype, axis_name=self.bn_axis_name)
        identity = x
        out = conv(self.planes, (3, 3), strides=self.stride, padding=1, name="conv1")(x)
        out = bn(name="bn1")(out, train=train)
        out = nn.relu(out)
        out = conv(self.planes, (3, 3), padding=1, name="conv2")(out)
        out = bn(name="bn2")(out, train=train)
        if self.downsample:
            identity = conv(
                self.planes * self.expansion,
                (1, 1),
                strides=self.stride,
                name="downsample_0",
            )(x)
            identity = bn(name="downsample_1")(identity, train=train)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    groups: int = 1
    base_width: int = 64
    dtype: Any = None
    bn_axis_name: str | None = None

    expansion: int = 4

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool) -> jnp.ndarray:
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype, kernel_init=conv_init)
        bn = partial(BatchNorm2d, dtype=self.dtype, axis_name=self.bn_axis_name)
        width = int(self.planes * (self.base_width / 64.0)) * self.groups
        identity = x
        out = conv(width, (1, 1), name="conv1")(x)
        out = nn.relu(bn(name="bn1")(out, train=train))
        out = conv(
            width,
            (3, 3),
            strides=self.stride,
            padding=1,
            feature_group_count=self.groups,
            name="conv2",
        )(out)
        out = nn.relu(bn(name="bn2")(out, train=train))
        out = conv(self.planes * self.expansion, (1, 1), name="conv3")(out)
        out = bn(name="bn3")(out, train=train)
        if self.downsample:
            identity = conv(
                self.planes * self.expansion,
                (1, 1),
                strides=self.stride,
                name="downsample_0",
            )(x)
            identity = bn(name="downsample_1")(identity, train=train)
        return nn.relu(out + identity)


class ResNet(nn.Module):
    """Headless ResNet: stem + layer1..4, stride-32 NHWC features.

    ``forward`` parity target: ``uda/model/resnet.py:23-38``.
    """

    block: type
    layers: Sequence[int]
    groups: int = 1
    base_width: int = 64
    dtype: Any = None
    bn_axis_name: str | None = None

    @property
    def out_features(self) -> int:
        return 512 * self.block.expansion

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        x = nn.Conv(
            64,
            (7, 7),
            strides=2,
            padding=3,
            use_bias=False,
            dtype=self.dtype,
            kernel_init=conv_init,
            name="conv1",
        )(x)
        x = BatchNorm2d(dtype=self.dtype, axis_name=self.bn_axis_name, name="bn1")(
            x, train=train
        )
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        planes = 64
        for li, n_blocks in enumerate(self.layers):
            stride = 1 if li == 0 else 2
            for bi in range(n_blocks):
                blk_stride = stride if bi == 0 else 1
                needs_ds = blk_stride != 1 or x.shape[-1] != planes * self.block.expansion
                x = self.block(
                    planes=planes,
                    stride=blk_stride,
                    downsample=needs_ds,
                    groups=self.groups,
                    base_width=self.base_width,
                    dtype=self.dtype,
                    bn_axis_name=self.bn_axis_name,
                    name=f"layer{li + 1}_{bi}",
                )(x, train=train)
            planes *= 2
        return x


def _make(block, layers, **kw):
    def ctor(dtype=None, bn_axis_name=None):
        return ResNet(
            block=block, layers=layers, dtype=dtype, bn_axis_name=bn_axis_name, **kw
        )

    return ctor


resnet18 = _make(BasicBlock, [2, 2, 2, 2])
resnet34 = _make(BasicBlock, [3, 4, 6, 3])
resnet50 = _make(Bottleneck, [3, 4, 6, 3])
resnet101 = _make(Bottleneck, [3, 4, 23, 3])
resnet152 = _make(Bottleneck, [3, 8, 36, 3])
resnext50_32x4d = _make(Bottleneck, [3, 4, 6, 3], groups=32, base_width=4)
resnext101_32x8d = _make(Bottleneck, [3, 4, 23, 3], groups=32, base_width=8)
wide_resnet50_2 = _make(Bottleneck, [3, 4, 6, 3], base_width=128)
wide_resnet101_2 = _make(Bottleneck, [3, 4, 23, 3], base_width=128)
