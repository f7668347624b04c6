"""Optimizers and LR schedules with exact torch semantics.

The reference drives five separate ``torch.optim.SGD`` instances over disjoint
parameter partitions, stepped in different subsets per minimax sub-step
(``train1.py:141-154, 392-397, 433-436, 450``), each with an identical
per-iteration ``LambdaLR`` decay. Here a partition is a top-level key group of
the Flax param tree and each partition owns its own momentum trace; learning
rates are pure functions of the step so everything jits.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

# partition name -> top-level param-tree keys
DA_PARTITIONS: dict[str, tuple[str, ...]] = {
    "f": ("backbone", "upsampling"),
    "h": ("head",),
    "h_adv": ("head_adv",),
    "h_adv2": ("head_adv2",),
    "h_adv3": ("head_adv3",),
}


def torch_sgd(
    momentum: float = 0.9, nesterov: bool = True, weight_decay: float = 1e-4
) -> optax.GradientTransformation:
    """SGD direction with torch update order: wd is added to the gradient
    BEFORE the momentum trace (coupled weight decay), nesterov lookahead as in
    torch. Returns the raw direction; callers scale by -lr (the five
    reference optimizers are stepped different numbers of times per iteration,
    so the lr cannot live inside an optax schedule counter).
    """
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.trace(decay=momentum, nesterov=nesterov),
    )


def da_lr(
    step: jnp.ndarray | int,
    *,
    base_lr: float = 0.01,
    gamma: float = 1e-4,
    decay: float = 0.75,
    optimizer_lr: float = 0.1,
) -> jnp.ndarray:
    """Per-iteration DA learning rate.

    torch LambdaLR composes the optimizer's base lr (0.1, ``train1.py:141-148``)
    with ``args.lr * (1 + gamma * i)^(-decay)`` (``train1.py:149``), stepped
    once per iteration — effective lr 1e-3 decaying.
    """
    i = jnp.asarray(step, jnp.float32)
    return optimizer_lr * base_lr * (1.0 + gamma * i) ** (-decay)


def pretrain_lr_factor(
    epoch: int, *, milestones: tuple[int, ...] = (45, 60), factor: float = 0.1
) -> float:
    """MultiStepLR factor for the pretrain phase, with the reference's quirk:
    ``lr_scheduler.step()`` runs BEFORE each epoch (``train1.py:164-167``), so
    during 0-indexed epoch ``e`` the scheduler has counted ``e + 1`` steps.
    """
    count = epoch + 1
    return float(factor ** sum(1 for m in milestones if m <= count))


def init_partitioned(
    tx: optax.GradientTransformation, params: dict, partitions: dict[str, tuple[str, ...]]
) -> dict[str, optax.OptState]:
    """One optimizer state per partition (momentum buffers live per-partition,
    like the reference's five independent SGD instances)."""
    return {
        name: tx.init({k: params[k] for k in keys})
        for name, keys in partitions.items()
    }


def apply_partition_updates(
    tx: optax.GradientTransformation,
    params: dict,
    opt_states: dict[str, optax.OptState],
    grads: dict,
    lr: jnp.ndarray,
    partitions_to_step: tuple[str, ...],
    partitions: dict[str, tuple[str, ...]],
) -> tuple[dict, dict[str, optax.OptState]]:
    """SGD-step the named partitions; others keep params AND momentum frozen.

    This reproduces torch's "zero_grad + backward + step only some optimizers"
    pattern: an optimizer that is not stepped does not decay its momentum.
    """
    new_params = dict(params)
    new_opt = dict(opt_states)
    for name in partitions_to_step:
        keys = partitions[name]
        p_sub = {k: params[k] for k in keys}
        g_sub = {k: grads[k] for k in keys}
        direction, new_opt[name] = tx.update(g_sub, opt_states[name], p_sub)
        stepped = jax.tree.map(lambda p, d: p - lr * d, p_sub, direction)
        new_params.update(stepped)
    return new_params, new_opt


def split_params(params: dict, keys: tuple[str, ...]) -> tuple[dict, dict]:
    """(trainable, frozen) split of the top-level param tree."""
    train = {k: params[k] for k in keys}
    frozen = {k: v for k, v in params.items() if k not in keys}
    return train, frozen
