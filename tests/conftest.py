"""Test configuration: force an 8-device virtual CPU platform.

Multi-device tests (data-parallel sharding, cross-replica BN) run on a
virtual CPU mesh via ``--xla_force_host_platform_device_count`` — the
TPU-native substitute for a fake backend (the reference has no test
infrastructure at all; see SURVEY.md §4).

This must run before anything imports jax.
"""

import os
import sys

# Force CPU unconditionally: the session presets JAX_PLATFORMS=axon (one
# tunneled TPU chip), which is both slow for tiny test ops and single-device,
# and the axon sitecustomize further overrides jax_platforms via
# jax.config.update — so we must update the config, not just the env var.
os.environ["JAX_PLATFORMS"] = "cpu"
# Disable the persistent XLA compile cache for the whole in-process suite:
# XLA:CPU AOT entries record compile-machine features that fail to reload in
# this container (cpu_aot_loader feature-mismatch warnings, and executables
# whose numerics can differ from a fresh compile). The TPU-side cache used by
# the CLIs/bench is unaffected; subprocess workers set this themselves
# (tests/multihost_cli_worker.py).
os.environ["DAHPE_JAX_CACHE"] = ""
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (must come after the env setup above)

jax.config.update("jax_platforms", "cpu")

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

REFERENCE_ROOT = "/root/reference"


def reference_available() -> bool:
    """The read-only upstream checkout used for golden-value tests."""
    return os.path.isdir(REFERENCE_ROOT)


def _stub_torchvision():
    """Install a minimal fake torchvision so reference modules import.

    The golden tests only call pure numpy/torch functions from the reference;
    torchvision is touched solely at import time by package ``__init__``s.
    """
    import types

    if "torchvision" in sys.modules:
        return

    tv = types.ModuleType("torchvision")

    class _Stub:  # placeholder for classes never instantiated in tests
        def __init__(self, *a, **k):
            pass

        def __call__(self, x, *a, **k):
            return x

    transforms = types.ModuleType("torchvision.transforms")
    transforms.Normalize = _Stub
    transforms.Compose = _Stub
    transforms.ToPILImage = _Stub
    transforms.ToTensor = _Stub
    transforms.ColorJitter = _Stub
    tf_functional = types.ModuleType("torchvision.transforms.functional")

    # PIL-backed implementations matching torchvision's PIL backend
    def _tv_rotate(img, angle, *a, **k):
        return img.rotate(angle)

    def _tv_crop(img, top, left, height, width):
        return img.crop((left, top, left + width, top + height))

    def _tv_hflip(img):
        from PIL import Image as _Image

        return img.transpose(_Image.FLIP_LEFT_RIGHT)

    def _tv_resize(img, size, interpolation=2):
        if isinstance(size, int):
            w, h = img.size
            if w <= h:
                size = (int(size * h / w), size)  # (h, w)
            else:
                size = (size, int(size * w / h))
        return img.resize((size[1], size[0]), interpolation)

    tf_functional.rotate = _tv_rotate
    tf_functional.crop = _tv_crop
    tf_functional.hflip = _tv_hflip
    tf_functional.resize = _tv_resize
    tf_transforms = types.ModuleType("torchvision.transforms.transforms")
    tf_transforms.ToTensor = _Stub
    tf_transforms.Normalize = _Stub
    tf_transforms.ColorJitter = _Stub
    tf_transforms.Lambda = _Stub
    tf_transforms.RandomApply = _Stub
    tf_transforms.RandomTransforms = _Stub
    tf_transforms.Compose = _Stub
    transforms.functional = tf_functional
    transforms.transforms = tf_transforms

    models = types.ModuleType("torchvision.models")
    models.ResNet = _Stub
    models_utils = types.ModuleType("torchvision.models.utils")
    models_utils.load_state_dict_from_url = lambda *a, **k: {}
    models_resnet = types.ModuleType("torchvision.models.resnet")
    models_resnet.BasicBlock = _Stub
    models_resnet.Bottleneck = _Stub
    models_resnet.model_urls = {}
    models.utils = models_utils
    models.resnet = models_resnet

    datasets = types.ModuleType("torchvision.datasets")
    datasets_utils = types.ModuleType("torchvision.datasets.utils")
    datasets_utils.download_and_extract_archive = lambda *a, **k: None
    datasets.utils = datasets_utils

    tv.transforms = transforms
    tv.models = models
    tv.datasets = datasets

    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = transforms
    sys.modules["torchvision.transforms.functional"] = tf_functional
    sys.modules["torchvision.transforms.transforms"] = tf_transforms
    sys.modules["torchvision.models"] = models
    sys.modules["torchvision.models.utils"] = models_utils
    sys.modules["torchvision.models.resnet"] = models_resnet
    sys.modules["torchvision.datasets"] = datasets
    sys.modules["torchvision.datasets.utils"] = datasets_utils


def add_reference_to_path():
    import numpy as np

    _stub_torchvision()
    # the reference targets numpy<2; restore the removed scalar aliases
    for name, typ in (("int", int), ("float", float), ("bool", bool)):
        if not hasattr(np, name):
            setattr(np, name, typ)
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
