"""The 3-step adversarial domain-adaptation iteration as ONE jitted function.

Reference hot loop: ``train1.py:355-458`` — per iteration:

  Step A (source):  all five optimizers minimize
                    2·KL(y_s, label) + 4·rd32(min) + 4·rd64(min) + 4·rd16(min)
  Step B (target):  the three adversarial heads maximize disparity against
                    ground-false masks fused with the coarser heads' detached,
                    bilinearly-upsampled heatmaps (``train1.py:408-436``)
  Step C (target):  backbone+upsampling minimize 0.3·rd32(min) + 1·rd64(min),
                    reaching the features only through the λ-scaled GL layer

Torch runs 3 forwards + 3 backwards with per-optimizer ``zero_grad``/``step``
bookkeeping and a device→host→device round trip inside every disparity loss.
Here the whole iteration is a single XLA program: three forwards, three
``jax.grad`` calls over the right param partitions, on-device pseudo-labels,
and partition-masked SGD updates. Under a data mesh the same function runs
SPMD (batch sharded, params replicated; XLA inserts the psum for grads).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from flax import struct

from dahpe_tpu.core.decode import upsample_bilinear
from dahpe_tpu.core.losses import joints_kl_loss
from dahpe_tpu.core.metrics import pck_accuracy
from dahpe_tpu.ops.gradient_scale import warm_start_coeff
from dahpe_tpu.train import disparity
from dahpe_tpu.train.ema import ema_update
from dahpe_tpu.train.optim import (
    DA_PARTITIONS,
    apply_partition_updates,
    da_lr,
    init_partitioned,
    split_params,
    torch_sgd,
)


class DATrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt: Any  # dict: partition name -> optax state
    ema_params: Any = None
    ema_batch_stats: Any = None


def create_da_state(
    model,
    rng,
    *,
    image_size: int = 256,
    batch_size: int = 2,
    with_ema: bool = False,
    momentum: float = 0.9,
    weight_decay: float = 1e-4,
) -> DATrainState:
    x = jnp.zeros((batch_size, image_size, image_size, 3), jnp.float32)
    tx = torch_sgd(momentum=momentum, weight_decay=weight_decay)

    # ONE jitted program builds the whole state: eager tracing would dispatch
    # thousands of tiny init/zeros ops, which is pathological on high-latency
    # device transports.
    @jax.jit
    def build(rng):
        variables = model.init(rng, x, train=False, gl_coeff=0.0)
        params = dict(variables["params"])
        batch_stats = dict(variables["batch_stats"])
        opt = init_partitioned(tx, params, DA_PARTITIONS)
        return DATrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt=opt,
            ema_params=jax.tree.map(jnp.copy, params) if with_ema else None,
            ema_batch_stats=(
                jax.tree.map(jnp.copy, batch_stats) if with_ema else None
            ),
        )

    return build(rng)


def make_da_train_step(
    model,
    *,
    base_lr: float = 0.01,
    lr_gamma: float = 1e-4,
    lr_decay: float = 0.75,
    trade_off: float = 1.0,
    momentum: float = 0.9,
    weight_decay: float = 1e-4,
    ema_decay: float | None = None,
    gl_hi: float = 0.1,
    gl_max_iters: int = 1000,
    compute_metrics: bool = True,
    share_target_features: bool = True,
    bn_momentum: float | None = None,
    conf_gate: float | None = None,
) -> Callable:
    """Build the jittable DA step: ``(state, batch_s, batch_t) -> (state, metrics)``.

    Batches are dicts with ``image (B,H,W,3)``, ``target (B,64,64,K)``,
    ``weight (B,K)``.

    Pseudo-label construction is the closed-form jnp path unconditionally:
    the fused Pallas kernel (``ops/pallas/pseudo_label.py``) measured SLOWER
    inside the full step (71.3 vs 68.3 ms/iter, v5e, resnet101 bf16 batch 32
    — XLA already fuses the jnp label math optimally) and a ``pallas_call``
    does not partition under GSPMD, so the kernel stays a validated bench
    artifact rather than a production knob.

    ``conf_gate`` (default off — the reference has no equivalent,
    ``train1.py:408-458`` trusts every pseudo-label): drift mitigation for
    the self-training steps. The pseudo-labels of Steps B and C are built
    from the main head's own target-domain peaks; as training drifts, low
    peaks mark joints the model is guessing on, and training the minimax
    toward those guesses compounds the error (the post-peak PCK decay
    measured in docs/ACCURACY.md). With ``conf_gate=q`` each target batch
    drops, PER JOINT, the fraction ``q`` of samples whose peak activation
    is lowest (a batch-relative quantile, so the gate self-calibrates as
    the activation scale drifts); their loss weight is zeroed in B and C.
    Source supervision (Step A) is never gated — those labels are real.

    ``share_target_features`` (default on): Steps B and C act on the SAME
    target batch, and neither updates the backbone/upsampling/main-head
    params in between (B steps the adversarial heads only, ``train1.py:
    433-436``), so the reference's second and third full forwards recompute
    identical feature maps and identical main-head heatmaps. Here the target
    features are computed ONCE under ``jax.vjp`` (the cut point for Step C's
    feature gradients) and the main head once; only the tiny adversarial
    heads run twice. BN running stats still advance exactly twice for the
    shared modules via the closed-form double update (the batch statistics
    of both reference forwards are identical, so
    ``r2 = (2 - m)·r1 - (1 - m)·r0``). Numerics match the unshared path to
    float-reassociation noise; set False for the literal 3-forward replica.
    """
    if bn_momentum is None:
        # the closed-form double-BN update is only correct for the momentum
        # the model's norm layers actually run with; every model in the zoo
        # uses BatchNorm2d's class default, so that field IS the source of
        # truth (models/batch_norm.py). Pass bn_momentum explicitly only for
        # a model whose BN layers were built with a non-default momentum.
        from dahpe_tpu.models.batch_norm import BatchNorm2d

        bn_momentum = BatchNorm2d.momentum
    tx = torch_sgd(momentum=momentum, weight_decay=weight_decay)

    def forward(params, batch_stats, x, gl_coeff):
        out, updates = model.apply(
            {"params": params, "batch_stats": batch_stats},
            x,
            train=True,
            gl_coeff=gl_coeff,
            mutable=["batch_stats"],
        )
        return out, dict(updates["batch_stats"])

    def train_step(state: DATrainState, batch_s: dict, batch_t: dict):
        lam = warm_start_coeff(state.step, hi=gl_hi, max_iters=gl_max_iters)
        lr = da_lr(state.step, base_lr=base_lr, gamma=lr_gamma, decay=lr_decay)
        x_s, label_s, w_s = batch_s["image"], batch_s["target"], batch_s["weight"]
        x_t, label_t, w_t = batch_t["image"], batch_t["target"], batch_t["weight"]

        # ---- Step A: source supervision + min-disparity, all partitions ----
        def loss_a(params, batch_stats):
            out, bs = forward(params, batch_stats, x_s, lam)
            y = out["y"]
            loss = (
                2.0 * joints_kl_loss(y, label_s, w_s)
                + 4.0 * disparity.rd_32(y, out["y_adv2"], None, w_s, "min")
                + 4.0 * disparity.rd_64(y, out["y_adv"], None, w_s, "min")
                + 4.0 * disparity.rd_16(y, out["y_adv3"], w_s, "min")
            )
            return loss, (bs, out)

        (loss_s, (bs, out_s)), grads = jax.value_and_grad(loss_a, has_aux=True)(
            dict(state.params), dict(state.batch_stats)
        )
        params, opt = apply_partition_updates(
            tx, dict(state.params), dict(state.opt), grads, lr,
            ("f", "h", "h_adv", "h_adv2", "h_adv3"), DA_PARTITIONS,
        )

        # ---- Steps B + C over the target batch ----
        adv_keys = ("head_adv", "head_adv2", "head_adv3")
        f_keys = ("backbone", "upsampling")

        def gated_weight(y):
            """Confidence-gate the target loss weights on the main head's
            peak activations (see the factory docstring). Identity when the
            gate is off; under SPMD the quantile is per-shard, which keeps
            the gate collective-free (each device drops the q least
            confident of ITS batch rows — the same statistic at shard
            granularity)."""
            if not conf_gate:
                return w_t
            conf = jnp.max(jax.lax.stop_gradient(y), axis=(1, 2))  # (B, K)
            thr = jnp.quantile(
                conf.astype(jnp.float32), conf_gate, axis=0
            )  # (K,)
            mask = (conf >= thr).astype(jnp.float32)
            return mask if w_t is None else w_t * mask

        def step_b_losses(y, advs, w):
            """The fused ground-false maximization objective (Step B)."""
            a3 = jax.lax.stop_gradient(advs["y_adv3"])
            a2 = jax.lax.stop_gradient(advs["y_adv2"])
            hm_full = y.shape[1:3]  # 64x64 at the reference config
            hm_half = advs["y_adv2"].shape[1:3]
            t64 = 0.5 * upsample_bilinear(a3, hm_full) + upsample_bilinear(
                a2, hm_full
            )
            t32 = upsample_bilinear(a3, hm_half)
            l1 = disparity.rd_16(y, advs["y_adv3"], w, "max")
            l2 = disparity.rd_64(y, advs["y_adv"], t64, w, "max")
            l3 = disparity.rd_32(y, advs["y_adv2"], t32, w, "max")
            return trade_off * (0.3 * l1 + 1.0 * l2 + 0.3 * l3)

        def step_c_losses(y, advs, w):
            """The disparity minimization objective (Step C)."""
            l1 = disparity.rd_32(y, advs["y_adv2"], None, w, "min")
            l2 = disparity.rd_64(y, advs["y_adv"], None, w, "min")
            return trade_off * (0.3 * l1 + 1.0 * l2)

        if share_target_features:
            # B only steps the adversarial heads, so the backbone/upsampling
            # features AND the main-head heatmap of the target batch are
            # identical in the reference's B and C forwards — compute each
            # once. jax.vjp at the feature map is Step C's gradient cut.
            f_params, rest_params = split_params(params, f_keys)
            bs_a = bs  # full tree, post-Step-A

            def feat_fwd(fp):
                f, upd = model.apply(
                    {"params": {**fp, **rest_params}, "batch_stats": bs_a},
                    x_t, train=True, method="features",
                    mutable=["batch_stats"],
                )
                return f, dict(upd["batch_stats"])

            f_t, f_vjp, bs_b = jax.vjp(feat_fwd, f_params, has_aux=True)
            f_sg = jax.lax.stop_gradient(f_t)

            y_t, upd = model.apply(
                {"params": params, "batch_stats": bs_b}, f_sg, train=True,
                method="main_head", mutable=["batch_stats"],
            )
            y_t = jax.lax.stop_gradient(y_t)
            bs_b = dict(upd["batch_stats"])
            w_tg = gated_weight(y_t)

            def loss_b(adv_params, frozen, batch_stats):
                advs, upd = model.apply(
                    {"params": {**adv_params, **frozen},
                     "batch_stats": batch_stats},
                    f_sg, train=True, gl_coeff=lam, method="adv_heads",
                    mutable=["batch_stats"],
                )
                return step_b_losses(y_t, advs, w_tg), dict(
                    upd["batch_stats"]
                )

            adv_params, frozen = split_params(params, adv_keys)
            (loss_gf, bs_b), grads_b = jax.value_and_grad(
                loss_b, has_aux=True
            )(adv_params, frozen, bs_b)
            params, opt = apply_partition_updates(
                tx, params, opt, grads_b, lr, ("h_adv", "h_adv2", "h_adv3"),
                DA_PARTITIONS,
            )

            def loss_c(f_):
                advs, upd = model.apply(
                    {"params": params, "batch_stats": bs_b}, f_, train=True,
                    gl_coeff=lam, method="adv_heads", mutable=["batch_stats"],
                )
                return (
                    step_c_losses(y_t, advs, w_tg),
                    (dict(upd["batch_stats"]), advs),
                )

            (loss_gt, (bs_c, advs_t)), g_f = jax.value_and_grad(
                loss_c, has_aux=True
            )(f_t)
            (grads_c,) = f_vjp(g_f)
            params, opt = apply_partition_updates(
                tx, params, opt, grads_c, lr, ("f",), DA_PARTITIONS
            )
            out_t = {"y": y_t, **advs_t}

            # shared modules ran once but the reference's running stats
            # advanced twice with identical batch statistics:
            # r1 = (1-m)·r0 + m·s  ⇒  r2 = (2-m)·r1 - (1-m)·r0.
            keep = 1.0 - bn_momentum
            bs = dict(bs_c)
            for k in (*f_keys, "head"):
                bs[k] = jax.tree.map(
                    lambda r1, r0: (1.0 + keep) * r1 - keep * r0,
                    bs_b[k], bs_a[k],
                )
        else:
            def loss_b(adv_params, frozen, batch_stats):
                out, bs = forward(
                    {**adv_params, **frozen}, batch_stats, x_t, lam
                )
                return step_b_losses(out["y"], out, gated_weight(out["y"])), bs

            adv_params, frozen = split_params(params, adv_keys)
            (loss_gf, bs), grads_b = jax.value_and_grad(loss_b, has_aux=True)(
                adv_params, frozen, bs
            )
            params, opt = apply_partition_updates(
                tx, params, opt, grads_b, lr, ("h_adv", "h_adv2", "h_adv3"),
                DA_PARTITIONS,
            )

            def loss_c(f_params, frozen, batch_stats):
                out, bs = forward(
                    {**f_params, **frozen}, batch_stats, x_t, lam
                )
                return step_c_losses(out["y"], out, gated_weight(out["y"])), (
                    bs, out
                )

            f_params, frozen = split_params(params, f_keys)
            (loss_gt, (bs, out_t)), grads_c = jax.value_and_grad(
                loss_c, has_aux=True
            )(f_params, frozen, bs)
            params, opt = apply_partition_updates(
                tx, params, opt, grads_c, lr, ("f",), DA_PARTITIONS
            )

        ema_params, ema_bs = state.ema_params, state.ema_batch_stats
        if ema_decay is not None and ema_params is not None:
            ema_params = ema_update(ema_params, params, ema_decay)
            ema_bs = ema_update(ema_bs, bs, ema_decay)

        metrics = {
            "loss_s": loss_s,
            "loss_gf": loss_gf,
            "loss_gt": loss_gt,
            "lr": lr,
            "gl_coeff": lam,
        }
        if compute_metrics:
            _, acc_s, _, pred_s = pck_accuracy(out_s["y"], label_s)
            _, acc_t, _, pred_t = pck_accuracy(out_t["y"], label_t)
            _, acc_s_adv, _, _ = pck_accuracy(out_s["y_adv"], label_s)
            _, acc_t_adv, _, _ = pck_accuracy(out_t["y_adv"], label_t)
            metrics.update(
                acc_s=acc_s, acc_t=acc_t, acc_s_adv=acc_s_adv, acc_t_adv=acc_t_adv,
                pred_s=pred_s, pred_t=pred_t,
            )

        new_state = state.replace(
            step=state.step + 1,
            params=params,
            batch_stats=bs,
            opt=opt,
            ema_params=ema_params,
            ema_batch_stats=ema_bs,
        )
        return new_state, metrics

    return train_step


def da_train_step(model, state, batch_s, batch_t, **config):
    """Convenience non-factory entry point (builds + calls the step)."""
    return make_da_train_step(model, **config)(state, batch_s, batch_t)
