"""Model zoo + registry.

Mirrors the reference's reflection-based registry (``uda/model/__init__.py``,
consumed as ``models.__dict__[args.arch]`` at ``train1.py:123,592-596``) with
an explicit dict.
"""

from dahpe_tpu.models.batch_norm import BatchNorm2d
from dahpe_tpu.models.heads import DownsampleStage, FusionHead, PlainHead
from dahpe_tpu.models.pose_resnet import MultiHeadPoseResNet, PoseResNet
from dahpe_tpu.models.regda_baseline import RegDAPoseResNet
from dahpe_tpu.models.resnet import (
    ResNet,
    resnet18,
    resnet34,
    resnet50,
    resnet101,
    resnet152,
    resnext50_32x4d,
    resnext101_32x8d,
    wide_resnet50_2,
    wide_resnet101_2,
)
from dahpe_tpu.models.upsampling import ConvTranspose2dTorch, Upsampling

BACKBONES = {
    "resnet18": resnet18,
    "resnet34": resnet34,
    "resnet50": resnet50,
    "resnet101": resnet101,
    "resnet152": resnet152,
    "resnext50_32x4d": resnext50_32x4d,
    "resnext101_32x8d": resnext101_32x8d,
    "wide_resnet50_2": wide_resnet50_2,
    "wide_resnet101_2": wide_resnet101_2,
}


def get_backbone(name: str, **kwargs):
    """Look up a backbone constructor by name (the ``-a/--arch`` flag)."""
    try:
        return BACKBONES[name](**kwargs)
    except KeyError:
        raise ValueError(
            f"unknown arch {name!r}; choices: {sorted(BACKBONES)}"
        ) from None


__all__ = [
    "BACKBONES",
    "get_backbone",
    "BatchNorm2d",
    "DownsampleStage",
    "FusionHead",
    "PlainHead",
    "MultiHeadPoseResNet",
    "PoseResNet",
    "RegDAPoseResNet",
    "ResNet",
    "ConvTranspose2dTorch",
    "Upsampling",
    "resnet18",
    "resnet34",
    "resnet50",
    "resnet101",
    "resnet152",
    "resnext50_32x4d",
    "resnext101_32x8d",
    "wide_resnet50_2",
    "wide_resnet101_2",
]
