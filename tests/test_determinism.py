"""Determinism: identical seeds reproduce batches, augmentation and steps
bit-for-bit (the rebuild's replacement for the reference's cudnn knobs)."""

import numpy as np

import jax
import jax.numpy as jnp

from dahpe_tpu import models
from dahpe_tpu.data import BatchLoader, RenderedHandPose
from dahpe_tpu.data import transforms as T
from dahpe_tpu.data.device_aug import augment_batch
from dahpe_tpu.models.resnet import Bottleneck
from dahpe_tpu.train import create_da_state, make_da_train_step
from tests.fixtures import make_rhd_fixture
import pytest


def test_loader_determinism(tmp_path):
    root = make_rhd_fixture(str(tmp_path))
    ds = RenderedHandPose(root, split="train", transforms=T.train_transform(128))

    def first_batch():
        loader = BatchLoader(ds, batch_size=4, num_workers=2, seed=7)
        return next(iter(loader))

    a, b = first_batch(), first_batch()
    for k in a:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_device_aug_determinism():
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.uniform(0, 255, (2, 80, 80, 3)), jnp.float32)
    kps = jnp.asarray(rng.uniform(0, 80, (2, 21, 2)), jnp.float32)
    intr = jnp.tile(jnp.eye(3), (2, 1, 1))
    out1 = augment_batch(imgs, kps, intr, jax.random.key(5), out_size=64)
    out2 = augment_batch(imgs, kps, intr, jax.random.key(5), out_size=64)
    for a, b in zip(out1, out2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_train_step_determinism():
    rng = np.random.default_rng(1)
    backbone = models.ResNet(block=Bottleneck, layers=[1, 1, 1, 1])
    model = models.MultiHeadPoseResNet(backbone=backbone, num_keypoints=4)
    batch = {
        "image": jnp.asarray(rng.standard_normal((2, 64, 64, 3)), jnp.float32),
        "target": jnp.asarray(
            np.clip(rng.standard_normal((2, 16, 16, 4)), 0, None), jnp.float32
        ),
        "weight": jnp.ones((2, 4), jnp.float32),
    }
    step = jax.jit(make_da_train_step(model, compute_metrics=False))

    def run():
        state = create_da_state(model, jax.random.key(3), image_size=64)
        state, metrics = step(state, batch, batch)
        return float(metrics["loss_s"]), jax.tree.leaves(state.params)[0]

    (l1, p1), (l2, p2) = run(), run()
    assert l1 == l2
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
