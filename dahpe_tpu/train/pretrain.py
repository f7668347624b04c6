"""Supervised source-only pretraining step (Simple Baseline).

Reference: ``pretrain`` loop at ``train1.py:278-325`` — KL loss on source
heatmaps, SGD(momentum 0.9, nesterov, wd 1e-4) over three param groups with
the backbone at 0.1x lr (``get_parameters``, ``pose_resnet2.py:184-189``) and
MultiStepLR([45, 60], 0.1) stepped before each epoch.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from flax import struct

from dahpe_tpu.core.losses import joints_kl_loss
from dahpe_tpu.core.metrics import pck_accuracy
from dahpe_tpu.train.optim import (
    apply_partition_updates,
    init_partitioned,
    torch_sgd,
)

PRETRAIN_PARTITIONS = {
    "backbone": ("backbone",),
    "upsampling": ("upsampling",),
    "head": ("head",),
}

# finetune=True at train1.py:162 → backbone gets 10x smaller lr
PRETRAIN_LR_SCALES = {"backbone": 0.1, "upsampling": 1.0, "head": 1.0}


class PretrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt: Any


def create_pretrain_state(
    model,
    rng,
    *,
    image_size: int = 256,
    batch_size: int = 2,
    momentum: float = 0.9,
    weight_decay: float = 1e-4,
) -> PretrainState:
    x = jnp.zeros((batch_size, image_size, image_size, 3), jnp.float32)
    tx = torch_sgd(momentum=momentum, weight_decay=weight_decay)

    @jax.jit
    def build(rng):
        variables = model.init(rng, x, train=False)
        params = dict(variables["params"])
        return PretrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=dict(variables["batch_stats"]),
            opt=init_partitioned(tx, params, PRETRAIN_PARTITIONS),
        )

    return build(rng)


def make_pretrain_step(
    model,
    *,
    momentum: float = 0.9,
    weight_decay: float = 1e-4,
    compute_metrics: bool = True,
) -> Callable:
    """``(state, batch, lr) -> (state, metrics)``; ``lr`` is the epoch-level
    MultiStepLR value (base_lr * pretrain_lr_factor(epoch))."""
    tx = torch_sgd(momentum=momentum, weight_decay=weight_decay)

    def pretrain_step(state: PretrainState, batch: dict, lr):
        x, label, w = batch["image"], batch["target"], batch["weight"]

        def loss_fn(params, batch_stats):
            y, updates = model.apply(
                {"params": params, "batch_stats": batch_stats},
                x,
                train=True,
                mutable=["batch_stats"],
            )
            return joints_kl_loss(y, label, w), (dict(updates["batch_stats"]), y)

        (loss, (bs, y)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            dict(state.params), dict(state.batch_stats)
        )
        params, opt = dict(state.params), dict(state.opt)
        for name, keys in PRETRAIN_PARTITIONS.items():
            params, opt = apply_partition_updates(
                tx, params, opt, grads,
                lr * PRETRAIN_LR_SCALES[name], (name,), PRETRAIN_PARTITIONS,
            )

        metrics = {"loss_s": loss, "lr": jnp.asarray(lr)}
        if compute_metrics:
            _, acc_s, _, _ = pck_accuracy(y, label)
            metrics["acc_s"] = acc_s
        return (
            state.replace(step=state.step + 1, params=params, batch_stats=bs, opt=opt),
            metrics,
        )

    return pretrain_step


def pretrain_step(model, state, batch, lr, **config):
    return make_pretrain_step(model, **config)(state, batch, lr)
