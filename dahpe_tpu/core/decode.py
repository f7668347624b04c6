"""Heatmap → keypoint decoding, fully on device.

Replaces the reference's numpy ``get_max_preds`` (``utils/keypoint_detection.py:7-35``)
and the soft-argmax ``compute_uv_from_heatmaps3`` (``:209-239``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def get_max_preds(heatmaps: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Argmax decode of ``(B, H, W, K)`` heatmaps.

    Returns ``preds (B, K, 2)`` float ``(x, y)`` and ``maxvals (B, K, 1)``.
    Matches ``utils/keypoint_detection.py:7-35``: first maximum wins, and
    predictions whose max value is <= 0 are zeroed.
    """
    b, h, w, k = heatmaps.shape
    flat = heatmaps.reshape(b, h * w, k)
    idx = jnp.argmax(flat, axis=1)  # (B, K)
    maxvals = jnp.max(flat, axis=1)  # (B, K)
    px = (idx % w).astype(jnp.float32)
    py = jnp.floor(idx.astype(jnp.float32) / w)
    preds = jnp.stack([px, py], axis=-1)  # (B, K, 2)
    mask = (maxvals > 0.0).astype(jnp.float32)[..., None]
    return preds * mask, maxvals[..., None]


def soft_argmax_decode(
    heatmaps: jnp.ndarray, *, temperature: float = 100.0, scale: float = 4.0
) -> jnp.ndarray:
    """Differentiable soft-argmax decode; ``(B, H, W, K)`` → ``(B, K, 2)``.

    Mirrors ``compute_uv_from_heatmaps3`` (``utils/keypoint_detection.py:209-239``):
    softmax of ``temperature * heatmap`` over all pixels, expectation of the
    coordinate grid, scaled to image space by ``scale``. Returns ``(x, y)``
    order (the reference's ``approx_y`` is the column expectation).
    """
    b, h, w, k = heatmaps.shape
    flat = heatmaps.reshape(b, h * w, k) * temperature
    p = jax.nn.softmax(flat, axis=1).reshape(b, h, w, k)
    ys = jnp.arange(h, dtype=heatmaps.dtype)[None, :, None, None]
    xs = jnp.arange(w, dtype=heatmaps.dtype)[None, None, :, None]
    ey = jnp.sum(p * ys, axis=(1, 2))  # (B, K)
    ex = jnp.sum(p * xs, axis=(1, 2))
    return jnp.stack([ex, ey], axis=-1) * scale


def decode_uv_from_heatmaps(
    heatmaps: jnp.ndarray, resize_dim: tuple[int, int]
) -> jnp.ndarray:
    """Bilinear-upsample to image resolution, then argmax → uv coordinates.

    Equivalent of ``compute_uv_from_heatmaps{,2}``
    (``utils/keypoint_detection.py:155-205``): ``(B, H, W, K)`` → ``(B, K, 2)``
    in ``resize_dim`` pixel units.
    """
    up = upsample_bilinear(heatmaps, resize_dim)
    preds, _ = get_max_preds(up)
    return preds


def upsample_bilinear(
    x: jnp.ndarray, out_hw: tuple[int, int]
) -> jnp.ndarray:
    """Bilinear resize of ``(B, H, W, K)`` with torch ``align_corners=False``.

    Torch's ``nn.Upsample(mode='bilinear')`` (used on detached coarse heads at
    ``train1.py:410-417``) samples source coords ``(i + 0.5) * H_in / H_out - 0.5``
    with edge clamping — identical to ``jax.image.resize(method='linear')``
    for upsampling.
    """
    b, _, _, k = x.shape
    return jax.image.resize(
        x, (b, out_hw[0], out_hw[1], k), method="linear"
    ).astype(x.dtype)
