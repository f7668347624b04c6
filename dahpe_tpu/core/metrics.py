"""On-device PCK evaluation.

Replaces the reference's numpy metric loops — ``calc_dists`` / ``dist_acc`` /
``accuracy`` in ``utils/keypoint_detection.py:38-92`` — with vectorized jnp so
evaluation never leaves the device.
"""

from __future__ import annotations

import jax.numpy as jnp

from dahpe_tpu.core.decode import get_max_preds


def calc_dists(
    preds: jnp.ndarray, target: jnp.ndarray, normalize: jnp.ndarray
) -> jnp.ndarray:
    """Normalized distances, invalid entries marked -1.

    Mirrors ``utils/keypoint_detection.py:38-50``: a joint is only counted
    when BOTH target coords are > 1 (heatmap-pixel units).

    Args: preds/target ``(B, K, 2)``; normalize ``(B, 2)``.
    Returns: ``(K, B)`` distances (reference orientation).
    """
    valid = (target[..., 0] > 1) & (target[..., 1] > 1)  # (B, K)
    diff = (preds - target) / normalize[:, None, :]
    d = jnp.sqrt(jnp.sum(diff * diff, axis=-1))  # (B, K)
    d = jnp.where(valid, d, -1.0)
    return d.T


def dist_acc(dists: jnp.ndarray, thr: float = 0.5) -> jnp.ndarray:
    """Fraction below threshold among valid (-1-free) entries, else -1.

    ``dists``: ``(K, B)`` (or any trailing batch axis). Returns ``(K,)``.
    Mirrors ``utils/keypoint_detection.py:53-60``.
    """
    valid = dists != -1.0
    n = jnp.sum(valid, axis=-1)
    hits = jnp.sum((dists < thr) & valid, axis=-1)
    return jnp.where(n > 0, hits / jnp.maximum(n, 1), -1.0)


def pck_accuracy(
    output: jnp.ndarray, target: jnp.ndarray, *, thr: float = 0.5
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """PCK from heatmaps (both ``(B, H, W, K)``), per the reference metric.

    Normalization is ``heatmap_size / 10`` so ``thr=0.5`` is PCK@0.05 of the
    heatmap (``utils/keypoint_detection.py:63-92``).

    Returns ``(acc (K,), avg_acc (), cnt (), preds (B, K, 2))`` where ``acc``
    entries are -1 for joints with no valid sample and ``avg_acc`` averages
    only over valid joints.
    """
    b, h, w, _ = output.shape
    pred, _ = get_max_preds(output)
    gt, _ = get_max_preds(target)
    norm = jnp.ones((b, 2), dtype=output.dtype) * jnp.asarray(
        [h, w], dtype=output.dtype
    ) / 10.0
    dists = calc_dists(pred, gt, norm)
    acc = dist_acc(dists, thr)
    valid = acc >= 0
    cnt = jnp.sum(valid)
    avg = jnp.where(cnt > 0, jnp.sum(jnp.where(valid, acc, 0.0)) / jnp.maximum(cnt, 1), 0.0)
    return acc, avg, cnt, pred


def group_accuracy(
    acc_per_joint: jnp.ndarray, groups: dict[str, list[int]]
) -> dict[str, jnp.ndarray]:
    """Average per-joint PCK over named joint groups.

    Mirrors ``uda/dataset/keypoint_dataset.py:58-71``: joints reporting -1
    (no valid sample) are skipped; a group with no valid joint reports -1.
    """
    out = {}
    for name, idxs in groups.items():
        vals = acc_per_joint[jnp.asarray(idxs)]
        valid = vals >= 0
        n = jnp.sum(valid)
        out[name] = jnp.where(
            n > 0, jnp.sum(jnp.where(valid, vals, 0.0)) / jnp.maximum(n, 1), -1.0
        )
    return out


def mean_joint_error_2d(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Mean per-joint 2D pixel error (``accuracy_2d``,
    ``utils/keypoint_detection.py:128-136``)."""
    return jnp.mean(jnp.linalg.norm(pred - target, axis=-1))


def mean_joint_error_3d(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Mean per-joint 3D error in mm (inputs in meters), per ``accuracy_3d``.

    ``utils/keypoint_detection.py:95-126`` (reported alongside the PCK-AUC).
    """
    d = jnp.linalg.norm((pred - target) * 1000.0, axis=-1)
    return jnp.mean(d)


def pck_auc_3d(
    pred: jnp.ndarray, target: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """3D PCK-AUC over 20..50 mm thresholds (step 3), per ``accuracy_3d``."""
    d = jnp.linalg.norm((pred - target) * 1000.0, axis=-1)  # (B, K)
    thresholds = jnp.arange(20, 51, 3, dtype=jnp.float32)
    pck = jnp.mean((d[..., None] < thresholds).astype(jnp.float32), axis=(0, 1))
    auc = jnp.trapezoid(pck, thresholds) / 30.0
    return mean_joint_error_3d(pred, target), auc
