"""Learning smoke test: the supervised step must actually learn an easy
synthetic task (bright dot at the keypoint) — evidence the whole trainer
(loss, optimizer order, BN, schedules) trains, beyond single-step parity."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dahpe_tpu import models
from dahpe_tpu.core.heatmap import generate_target
from dahpe_tpu.core.metrics import pck_accuracy
from dahpe_tpu.models.resnet import BasicBlock
from dahpe_tpu.train import create_pretrain_state, make_pretrain_step


def _dot_batch(rng, b=16, k=3, img=64):
    """Images with one bright 5x5 dot per keypoint channel-coded by color."""
    images = np.zeros((b, img, img, 3), np.float32)
    kps = rng.uniform(8, img - 8, size=(b, k, 2)).astype(np.float32)
    for i in range(b):
        for j in range(k):
            x, y = int(kps[i, j, 0]), int(kps[i, j, 1])
            images[i, y - 2 : y + 3, x - 2 : x + 3, j % 3] = 4.0
    target, weight = generate_target(
        jnp.asarray(kps), jnp.ones((b, k)), (img // 4, img // 4), (img, img)
    )
    return {
        "image": jnp.asarray(images),
        "target": target,
        "weight": weight,
    }, kps


@pytest.mark.slow
def test_pretrain_learns_dot_localization():
    rng = np.random.default_rng(0)
    backbone = models.ResNet(block=BasicBlock, layers=[1, 1, 1, 1])
    model = models.PoseResNet(backbone=backbone, num_keypoints=3)
    state = create_pretrain_state(model, jax.random.key(0), image_size=64)
    step = jax.jit(make_pretrain_step(model))

    batch, _ = _dot_batch(rng)  # single fixed batch: memorization suffices

    def acc_of(state):
        y = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["image"],
            train=False,
        )
        _, avg, _, _ = pck_accuracy(y, batch["target"])
        return float(avg)

    acc0 = acc_of(state)
    losses = []
    for _ in range(60):
        state, metrics = step(state, batch, jnp.asarray(0.02))
        losses.append(float(metrics["loss_s"]))
    acc1 = acc_of(state)

    assert losses[-1] < 0.5 * losses[0], (losses[0], losses[-1])
    assert acc1 > max(acc0, 0.5), (acc0, acc1)
