"""Datasets, keypoint-aware transforms, and the input pipeline.

Registry mirrors the reference's module-reflection lookup
(``uda/dataset/__init__.py`` consumed via ``datasets.__dict__[args.target]``,
``train1.py:73,82,597-600``).
"""

from dahpe_tpu.data.cache import DecodedCache
from dahpe_tpu.data.device_store import DeviceDataStore
from dahpe_tpu.data.datasets.base import Hand21KeypointDataset, KeypointDataset
from dahpe_tpu.data.datasets.h3d import Hand3DStudio, Hand3DStudioAll
from dahpe_tpu.data.datasets.rhd import RenderedHandPose
from dahpe_tpu.data.datasets.stb import STB
from dahpe_tpu.data.pipeline import BatchLoader, ForeverIterator, finalize_batch
from dahpe_tpu.data.synthetic import SyntheticHandsSource, SyntheticHandsTarget

DATASETS = {
    "RenderedHandPose": RenderedHandPose,
    "Hand3DStudio": Hand3DStudio,
    "Hand3DStudioAll": Hand3DStudioAll,
    "STB": STB,
    # asset-free procedural domains with a controlled photometric shift
    # (data/synthetic.py) — the adaptation acceptance experiment + soak runs
    "SyntheticHandsSource": SyntheticHandsSource,
    "SyntheticHandsTarget": SyntheticHandsTarget,
}


def check_exists(root, name: str) -> None:
    """Fail fast on a missing dataset root (``utils/_util.py:40-46`` role).

    The reference's ``check_exits``/``download`` helpers either abort with a
    clear message or auto-download; this image has no network egress, so a
    wrong root must surface here rather than as a FileNotFoundError from a
    pickle/json open deep inside a parser.
    """
    import os

    if root is None or not os.path.isdir(root):
        raise FileNotFoundError(
            f"Dataset root {root!r} for {name} does not exist. Automatic "
            f"download is unavailable in this environment — place the "
            f"dataset there manually (see the reference README for sources) "
            f"or pass the correct root."
        )


def get_dataset(name: str, **kwargs):
    try:
        cls = DATASETS[name]
    except KeyError:
        raise ValueError(
            f"unknown dataset {name!r}; choices: {sorted(DATASETS)}"
        ) from None
    if getattr(cls, "requires_root", True):
        check_exists(kwargs.get("root"), name)
    return cls(**kwargs)


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
    "DecodedCache",
    "DeviceDataStore",
    "ForeverIterator",
    "finalize_batch",
]
