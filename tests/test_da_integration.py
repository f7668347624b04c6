"""DA training stability: many iterations of the full minimax on a toy
domain shift stay finite, keep source accuracy, and step the schedules.

(Whether DA *improves* the target is a research-scale question; what the
framework must guarantee is that the minimax runs stably: finite losses, no
source collapse, λ/lr schedules advancing, EMA tracking.)
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dahpe_tpu import models
from dahpe_tpu.core.heatmap import generate_target
from dahpe_tpu.models.resnet import BasicBlock
from dahpe_tpu.train import (
    create_da_state,
    create_pretrain_state,
    make_da_train_step,
    make_pretrain_step,
)


def _dot_batch(rng, b=8, k=3, img=64, invert=False, noise=0.0):
    images = np.zeros((b, img, img, 3), np.float32)
    kps = rng.uniform(8, img - 8, size=(b, k, 2)).astype(np.float32)
    for i in range(b):
        for j in range(k):
            x, y = int(kps[i, j, 0]), int(kps[i, j, 1])
            images[i, y - 2 : y + 3, x - 2 : x + 3, j % 3] = 4.0
    if invert:  # the "real" domain: inverted contrast + clutter
        images = 2.0 - images
    if noise:
        images += rng.normal(0, noise, images.shape).astype(np.float32)
    target, weight = generate_target(
        jnp.asarray(kps), jnp.ones((b, k)), (img // 4, img // 4), (img, img)
    )
    return {"image": jnp.asarray(images), "target": target, "weight": weight}


@pytest.mark.slow
def test_da_minimax_runs_stably_from_pretrained():
    rng = np.random.default_rng(0)
    backbone = models.ResNet(block=BasicBlock, layers=[1, 1, 1, 1])

    # 1) pretrain the simple model on the source toy task
    pre_model = models.PoseResNet(backbone=backbone, num_keypoints=3)
    pre_state = create_pretrain_state(pre_model, jax.random.key(0), image_size=64)
    pre_step = jax.jit(make_pretrain_step(pre_model, compute_metrics=False))
    src = _dot_batch(rng)
    for _ in range(40):
        pre_state, _ = pre_step(pre_state, src, jnp.asarray(0.02))

    # 2) warm-start the multi-head model (backbone+upsampling transfer)
    model = models.MultiHeadPoseResNet(backbone=backbone, num_keypoints=3)
    state = create_da_state(model, jax.random.key(1), image_size=64, with_ema=True)
    params = dict(state.params)
    params["backbone"] = pre_state.params["backbone"]
    params["upsampling"] = pre_state.params["upsampling"]
    bs = dict(state.batch_stats)
    bs["backbone"] = pre_state.batch_stats["backbone"]
    bs["upsampling"] = pre_state.batch_stats["upsampling"]
    state = state.replace(params=params, batch_stats=bs)

    # 3) run the adversarial minimax source->target
    step = jax.jit(
        make_da_train_step(
            model, gl_max_iters=10, ema_decay=0.99, compute_metrics=False
        )
    )
    tgt = _dot_batch(rng, invert=True, noise=0.1)
    losses_s = []
    for i in range(25):
        state, metrics = step(state, src, tgt)
        assert np.isfinite(float(metrics["loss_s"])), i
        assert np.isfinite(float(metrics["loss_gf"])), i
        assert np.isfinite(float(metrics["loss_gt"])), i
        losses_s.append(float(metrics["loss_s"]))
    assert int(state.step) == 25
    # λ schedule advanced well past warm start
    assert float(metrics["gl_coeff"]) > 0.05
    # EMA tracked the live params
    d = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), state.params, state.ema_params
    )
    assert max(jax.tree.leaves(d)) < 1.0
    # Step A (source supervision, fresh multi-head heads) makes progress
    assert losses_s[-1] < losses_s[0], (losses_s[0], losses_s[-1])
