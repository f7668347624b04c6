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


def build_datasets(args):
    train_tf = T.train_transform(
        args.image_size, args.rotation, tuple(args.resize_scale)
    )
    val_tf = T.val_transform(args.image_size)
    common = dict(
        image_size=(args.image_size, args.image_size),
        heatmap_size=(args.heatmap_size, args.heatmap_size),
    )
    train_source = get_dataset(
        args.source, root=args.source_root, transforms=train_tf, **common
    )
    val_source = get_dataset(
        args.source, root=args.source_root, split="test", transforms=val_tf, **common
    )
    train_target = get_dataset(
        args.target, root=args.target_root, transforms=train_tf, **common
    )
    val_target = get_dataset(
        args.target, root=args.target_root, split="test", transforms=val_tf, **common
    )
    return train_source, val_source, train_target, val_target


def build_loaders(args, train_source, val_source, train_target, val_target):
    import jax

    # under multi-host DP every process loads a disjoint shard of each epoch
    # and its share of the global batch
    n_proc = jax.process_count()
    per_host_batch = max(1, args.batch_size // n_proc)

    def mk(ds, shuffle, drop, shard):
        return BatchLoader(
            ds,
            per_host_batch if shard else args.batch_size,
            shuffle=shuffle,
            drop_last=drop,
            num_workers=args.workers,
            seed=args.seed,
            host_index=jax.process_index() if shard else 0,
            host_count=n_proc if shard else 1,
        )

    return (
        mk(train_source, True, True, True),
        mk(val_source, False, False, False),
        mk(train_target, True, True, True),
        mk(val_target, False, False, False),
    )


def make_visualizer(dataset, logger):
    from dahpe_tpu.data.transforms import denormalize

    def visualize(image, keypoint2d, name):
        img = (denormalize(np.asarray(image)) * 255).astype(np.uint8)
        dataset.visualize(img, keypoint2d, logger.get_image_path(f"{name}.jpg"))

    return visualize
