"""Keypoint losses (KL / MSE over flattened heatmaps).

TPU-native equivalents of ``uda/model/loss.py`` — the KL loss is both the
supervised criterion and the disparity criterion of the reference
(``train1.py:131,135-137``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.special import xlogy


def joints_kl_loss(
    output: jnp.ndarray,
    target: jnp.ndarray,
    target_weight: jnp.ndarray | None = None,
    *,
    epsilon: float = 0.0,
    reduction: str = "mean",
) -> jnp.ndarray:
    """Per-joint KL divergence between heatmap distributions.

    Mirrors ``JointsKLLoss`` (``uda/model/loss.py:115-158``): prediction is
    log-softmaxed over all pixels, target is ``(target + eps)`` normalized to
    a distribution, elementwise KL ``t * (log t - log p)`` (0 at t == 0) is
    summed over pixels, weighted per joint, and mean-reduced over (B, K).

    Args:
      output / target: ``(B, H, W, K)``.
      target_weight: ``(B, K)`` or ``(B, K, 1)`` visibility weights.
    """
    b, h, w, k = output.shape
    pred = output.reshape(b, h * w, k)
    logp = jax.nn.log_softmax(pred, axis=1)
    t = target.reshape(b, h * w, k) + epsilon
    # NOTE: divergence from the reference (loss.py:151), which divides by the
    # raw sum and therefore returns NaN for an all-zero (invisible /
    # out-of-bounds) joint even at weight 0 — 0/0 * 0 == NaN poisons the
    # batch mean. Guarding the denominator makes such joints contribute
    # exactly 0 while leaving every visible joint bit-identical.
    t = t / jnp.maximum(jnp.sum(t, axis=1, keepdims=True), 1e-12)
    kl = xlogy(t, t) - t * logp  # elementwise; xlogy(0, 0) == 0 as in torch
    loss = jnp.sum(kl, axis=1)  # (B, K)
    if target_weight is not None:
        loss = loss * target_weight.reshape(b, k)
    if reduction == "mean":
        return jnp.mean(loss)
    if reduction == "none":
        return loss
    raise ValueError(f"unknown reduction {reduction!r}")


def joints_mse_loss(
    output: jnp.ndarray,
    target: jnp.ndarray,
    target_weight: jnp.ndarray | None = None,
    *,
    reduction: str = "mean",
) -> jnp.ndarray:
    """0.5 * MSE over flattened heatmaps, visibility-weighted.

    Mirrors ``JointsMSELoss`` (``uda/model/loss.py:27-65``): per-pixel squared
    error halved, mean over pixels, per-joint weight, mean over (B, K).
    """
    b, h, w, k = output.shape
    se = 0.5 * (output - target) ** 2
    loss = jnp.mean(se.reshape(b, h * w, k), axis=1)  # (B, K)
    if target_weight is not None:
        loss = loss * target_weight.reshape(b, k)
    if reduction == "mean":
        return jnp.mean(loss)
    if reduction == "none":
        return loss
    raise ValueError(f"unknown reduction {reduction!r}")
