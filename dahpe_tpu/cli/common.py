"""Shared CLI plumbing: model/dataset construction, visualization."""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from dahpe_tpu import models
from dahpe_tpu.data import BatchLoader, get_dataset
from dahpe_tpu.data import transforms as T


def build_model(args, multi_head: bool = True):
    dtype = jnp.bfloat16 if getattr(args, "bf16", False) else None
    backbone = models.get_backbone(args.arch, dtype=dtype)
    if multi_head:
        return models.MultiHeadPoseResNet(
            backbone=backbone,
            num_keypoints=21,
            num_head_layers=args.num_head_layers,
            dtype=dtype,
        )
    return models.PoseResNet(backbone=backbone, num_keypoints=21, dtype=dtype)


def build_datasets(args, *, val_only: bool = False):
    """The four dataset splits; ``val_only=True`` skips constructing the two
    train splits (the eval CLI never touches them, and a real train split —
    e.g. RHD's 41k-sample annotation parse — costs seconds of host time)."""
    val_tf = T.val_transform(args.image_size)
    common = dict(
        image_size=(args.image_size, args.image_size),
        heatmap_size=(args.heatmap_size, args.heatmap_size),
    )
    if val_only:
        train_source = train_target = None
    else:
        train_tf = T.train_transform(
            args.image_size, args.rotation, tuple(args.resize_scale)
        )
        train_source = get_dataset(
            args.source, root=args.source_root, transforms=train_tf, **common
        )
        train_target = get_dataset(
            args.target, root=args.target_root, transforms=train_tf, **common
        )
    val_source = get_dataset(
        args.source, root=args.source_root, split="test", transforms=val_tf, **common
    )
    val_target = get_dataset(
        args.target, root=args.target_root, split="test", transforms=val_tf, **common
    )
    return train_source, val_source, train_target, val_target


def train_loader_mode(args) -> str:
    """Which host pipeline the train loaders use: ``pil`` (reference-parity
    transforms), ``raw`` (decode-only, augmentation fused on device) or
    ``warped`` (fused C++ host augmentation)."""
    if getattr(args, "device_aug", False):
        return "raw"
    if getattr(args, "host_warp", False):
        return "warped"
    return "pil"


def enable_compile_cache() -> None:
    """Persistent XLA compilation cache: repeat CLI runs skip the expensive
    (minutes over remote transports) recompiles. Opt out / relocate with
    ``DAHPE_JAX_CACHE=`` (empty disables)."""
    import os

    import jax

    cache = os.environ.get("DAHPE_JAX_CACHE", "/tmp/dahpe_jax_cache")
    if not cache:
        return
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass


def maybe_decoded_cache(args, dataset, *, raw_size: int = 288):
    """Wrap ``dataset`` in the pre-decoded mmap cache when ``--decoded-cache``
    is set: decode+crop+resize runs once, steady-state fetches become memcpy
    reads (``data/cache.py``)."""
    if not getattr(args, "decoded_cache", None):
        return dataset
    import hashlib
    import os

    from dahpe_tpu.data import DecodedCache

    root_tag = hashlib.sha1(
        os.path.abspath(getattr(dataset, "root", "")).encode()
    ).hexdigest()[:8]
    tag = (
        f"{type(dataset).__name__}_{getattr(dataset, 'split', 'x')}"
        f"_{raw_size}_{root_tag}"
    )
    return DecodedCache(
        dataset,
        os.path.join(args.decoded_cache, tag),
        raw_size=raw_size,
        num_workers=args.workers,
    )


def build_train_loader(args, dataset, *, seed_offset: int = 0, mode: str = "pil"):
    """One sharded, shuffled train loader in the requested pipeline mode.

    Under multi-host DP every process loads a disjoint shard of each epoch
    and its share of the global batch.
    """
    import jax

    n_proc = jax.process_count()
    kwargs = {}
    if mode == "raw":
        kwargs["raw"] = True
    elif mode == "warped":
        kwargs.update(warped=True, image_size=args.image_size)
    elif mode != "pil":
        raise ValueError(f"unknown train loader mode {mode!r}")
    if mode in ("raw", "warped"):
        # the PIL mode is the reference-parity path, uncached on purpose
        dataset = maybe_decoded_cache(args, dataset)
    return BatchLoader(
        dataset,
        max(1, args.batch_size // n_proc),
        shuffle=True,
        drop_last=True,
        num_workers=args.workers,
        seed=args.seed + seed_offset,
        host_index=jax.process_index(),
        host_count=n_proc,
        **kwargs,
    )


def build_val_loader(args, dataset):
    """Full-batch unsharded eval loader (every host sees every sample)."""
    return BatchLoader(
        dataset,
        args.batch_size,
        shuffle=False,
        drop_last=False,
        num_workers=args.workers,
        seed=args.seed,
    )


def build_device_val_loader(args, dataset, *, mesh=None, name=""):
    """HBM-resident validation loader (``--device-store``): the val split is
    uploaded once at ``raw_size == image_size`` (the deterministic PIL val
    geometry is baked into the upload, bit-identical) and every eval batch is
    a pure on-device program — no per-batch host→device traffic. Shared by
    the train CLI's per-epoch validation and ``cli/test.py``."""
    from dahpe_tpu.data.device_store import DeviceDataStore

    store = DeviceDataStore(
        maybe_decoded_cache(args, dataset, raw_size=args.image_size),
        mesh=mesh, shard_samples=False, raw_size=args.image_size,
    )
    print(f"device store (val {name}): {store.n} samples, "
          f"{store.nbytes() / 1e9:.2f} GB HBM")
    return store.eval_loader(args.batch_size, heatmap_size=args.heatmap_size)


def build_loaders(
    args, train_source, val_source, train_target, val_target, *, train_mode=None
):
    mode = train_loader_mode(args) if train_mode is None else train_mode
    return (
        build_train_loader(args, train_source, seed_offset=0, mode=mode),
        build_val_loader(args, val_source),
        build_train_loader(args, train_target, seed_offset=1, mode=mode),
        build_val_loader(args, val_target),
    )


def make_visualizer(dataset, logger):
    from dahpe_tpu.data.transforms import denormalize

    def visualize(image, keypoint2d, name):
        img = (denormalize(np.asarray(image)) * 255).astype(np.uint8)
        dataset.visualize(img, keypoint2d, logger.get_image_path(f"{name}.jpg"))

    return visualize
