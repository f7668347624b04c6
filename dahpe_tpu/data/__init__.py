"""Datasets, keypoint-aware transforms, and the input pipeline.

Registry mirrors the reference's module-reflection lookup
(``uda/dataset/__init__.py`` consumed via ``datasets.__dict__[args.target]``,
``train1.py:73,82,597-600``).
"""

from dahpe_tpu.data.datasets.base import Hand21KeypointDataset, KeypointDataset
from dahpe_tpu.data.datasets.h3d import Hand3DStudio, Hand3DStudioAll
from dahpe_tpu.data.datasets.rhd import RenderedHandPose
from dahpe_tpu.data.datasets.stb import STB
from dahpe_tpu.data.pipeline import BatchLoader, ForeverIterator, finalize_batch

DATASETS = {
    "RenderedHandPose": RenderedHandPose,
    "Hand3DStudio": Hand3DStudio,
    "Hand3DStudioAll": Hand3DStudioAll,
    "STB": STB,
}


def get_dataset(name: str, **kwargs):
    try:
        return DATASETS[name](**kwargs)
    except KeyError:
        raise ValueError(
            f"unknown dataset {name!r}; choices: {sorted(DATASETS)}"
        ) from None


__all__ = [
    "DATASETS",
    "get_dataset",
    "KeypointDataset",
    "Hand21KeypointDataset",
    "RenderedHandPose",
    "Hand3DStudio",
    "Hand3DStudioAll",
    "STB",
    "BatchLoader",
    "ForeverIterator",
    "finalize_batch",
]
