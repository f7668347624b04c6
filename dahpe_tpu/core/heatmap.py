"""On-device Gaussian heatmap rendering and pseudo-label construction.

The reference renders ground-truth heatmaps on the host with per-joint numpy
loops (``uda/dataset/util.py:9-68``) and builds pseudo-labels by argmaxing on
the CPU and gathering from a precomputed ``(W, H, H, W)`` Gaussian table
(``uda/model/regda_4.py:40-86``, ``regda_7.py:2979-3039,3141-3201``). On TPU
both collapse into one closed-form, fully vectorized expression: the table
entry for a peak ``(mu_x, mu_y)`` is exactly

    g[y, x] = exp(-((x - mu_x)^2 + (y - mu_y)^2) / (2 sigma^2))
              if |x - mu_x| <= reach and |y - mu_y| <= reach else 0

so we evaluate it directly on device — no host round trip, no 67 MB table.

All heatmaps here are channels-last ``(..., H, W, K)``.
"""

from __future__ import annotations

import jax.numpy as jnp


def gaussian_window_reach(sigma: float, window_factor: float) -> int:
    """Integer truncation reach of the reference's windowed Gaussian.

    The reference uses ``tmp_size = sigma * window_factor`` and paints the
    ``[mu - int(tmp_size), mu + int(tmp_size)]`` square (``regda_4.py:48-71``).
    64x64 uses factor 3 (reach 6), 32x32 factor 2 (reach 4, ``regda_7.py:3150``),
    16x16 factor 1.5 (reach 3, ``regda_7.py:2988``), all with sigma = 2.
    """
    return int(sigma * window_factor)


def render_gaussian(
    mu: jnp.ndarray,
    height: int,
    width: int,
    *,
    sigma: float = 2.0,
    reach: int = 6,
    valid: jnp.ndarray | None = None,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Render unnormalized (peak=1) windowed Gaussians at integer peaks.

    Args:
      mu: ``(..., K, 2)`` integer peak coordinates as ``(x, y)``.
      height, width: heatmap size.
      sigma: Gaussian sigma (value formula always uses this, independent of
        the window, matching the reference tables).
      reach: half-width of the square support window in pixels.
      valid: optional ``(..., K)`` bool/float mask; invalid joints render as
        all-zero maps.

    Returns:
      ``(..., H, W, K)`` heatmaps.
    """
    mu = mu.astype(jnp.int32)
    mu_x = mu[..., 0][..., None, None, :]  # (..., 1, 1, K)
    mu_y = mu[..., 1][..., None, None, :]
    xs = jnp.arange(width, dtype=jnp.int32)[None, :, None]  # (1, W, 1)
    ys = jnp.arange(height, dtype=jnp.int32)[:, None, None]  # (H, 1, 1)
    dx = xs - mu_x  # (..., 1, W, K) -> broadcasts to (..., H, W, K)
    dy = ys - mu_y
    d2 = (dx * dx + dy * dy).astype(dtype)
    g = jnp.exp(-d2 / (2.0 * sigma * sigma))
    inside = (jnp.abs(dx) <= reach) & (jnp.abs(dy) <= reach)
    g = jnp.where(inside, g, jnp.zeros_like(g))
    if valid is not None:
        v = valid.astype(dtype)[..., None, None, :]
        g = g * v
    return g


def generate_target(
    keypoints: jnp.ndarray,
    visible: jnp.ndarray,
    heatmap_size: tuple[int, int],
    image_size: tuple[int, int],
    *,
    sigma: float = 2.0,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Batched, on-device equivalent of the reference's ``generate_target``.

    Mirrors ``uda/dataset/util.py:9-68`` exactly: peak at
    ``trunc(kp / stride + 0.5)`` (Python ``int()`` truncates toward zero),
    window reach ``3 * sigma``, a joint whose peak falls outside the map or
    whose visibility is 0 gets weight 0 and an all-zero map.

    Args:
      keypoints: ``(..., K, 2)`` float image-space ``(x, y)``.
      visible:   ``(..., K)`` visibility in {0, 1}.
      heatmap_size: ``(W_hm, H_hm)``.
      image_size:   ``(W_img, H_img)``.

    Returns:
      target ``(..., H_hm, W_hm, K)``, weight ``(..., K)``.
    """
    hm_w, hm_h = heatmap_size
    img_w, img_h = image_size
    stride_x = img_w / hm_w
    stride_y = img_h / hm_h
    mu_x = jnp.trunc(keypoints[..., 0] / stride_x + 0.5).astype(jnp.int32)
    mu_y = jnp.trunc(keypoints[..., 1] / stride_y + 0.5).astype(jnp.int32)
    in_bounds = (mu_x >= 0) & (mu_x < hm_w) & (mu_y >= 0) & (mu_y < hm_h)
    weight = visible.astype(jnp.float32) * in_bounds.astype(jnp.float32)
    mu = jnp.stack([mu_x, mu_y], axis=-1)
    reach = gaussian_window_reach(sigma, 3.0)
    target = render_gaussian(
        mu, hm_h, hm_w, sigma=sigma, reach=reach, valid=weight > 0.5
    )
    return target, weight


def peaks_from_heatmap(y: jnp.ndarray) -> jnp.ndarray:
    """Flat-argmax peaks of ``(..., H, W, K)`` heatmaps → ``(..., K, 2)`` ints.

    Matches ``utils/keypoint_detection.py:7-35`` (first max wins; peaks with
    max value <= 0 are zeroed to the origin).
    """
    *lead, h, w, k = y.shape
    flat = y.reshape(*lead, h * w, k)
    idx = jnp.argmax(flat, axis=-2)  # (..., K), first occurrence
    maxv = jnp.max(flat, axis=-2)
    px = (idx % w).astype(jnp.int32)
    py = (idx // w).astype(jnp.int32)
    keep = maxv > 0.0
    px = jnp.where(keep, px, 0)
    py = jnp.where(keep, py, 0)
    return jnp.stack([px, py], axis=-1)


def pseudo_label_gt(
    y: jnp.ndarray,
    *,
    scale: int = 1,
    out_size: int | None = None,
    sigma: float = 2.0,
    window_factor: float = 3.0,
) -> jnp.ndarray:
    """Ground-truth pseudo heatmaps from a predicted heatmap, on device.

    Equivalent of ``PseudoLabelGenerator{,03,01}.forward`` (``regda_4.py:76-81``,
    ``regda_7.py:3189-3196,3027-3034``): argmax-decode ``y``, integer-divide
    peak coordinates by ``scale`` (1 / 2 / 4 for the 64 / 32 / 16 heads), and
    render the windowed Gaussian at ``out_size``.

    Args:
      y: ``(..., H, W, K)`` predicted heatmap (gradients are NOT stopped here;
        callers wrap with ``stop_gradient`` as the reference detaches).
    """
    *_, h, w, _ = y.shape
    if out_size is None:
        out_size = h // scale
    peaks = peaks_from_heatmap(y) // scale
    reach = gaussian_window_reach(sigma, window_factor)
    return render_gaussian(peaks, out_size, out_size, sigma=sigma, reach=reach)


def gf_union_others(gt: jnp.ndarray) -> jnp.ndarray:
    """GF = clip(sum of the OTHER joints' Gaussians) — ``regda_4.py:83-84``.

    ``gt``: ``(..., H, W, K)``.
    """
    total = jnp.sum(gt, axis=-1, keepdims=True)
    return jnp.clip(total - gt, 0.0, 1.0)


def gf_inverse(gt: jnp.ndarray) -> jnp.ndarray:
    """GF = clip(1 - 10 * GT) — ``regda_7.py:3036-3037, 3198-3199``."""
    return jnp.clip(1.0 - gt * 10.0, 0.0, 1.0)


def gf_union_minus(gt: jnp.ndarray) -> jnp.ndarray:
    """GF = clip(clip(sum_k GT) - 10 * GT) — ``regda_7.py:3614-3616``."""
    label_p = jnp.clip(jnp.sum(gt, axis=-1, keepdims=True), 0.0, 1.0)
    return jnp.clip(label_p - gt * 10.0, 0.0, 1.0)


def fuse_and_normalize_gf(
    gf: jnp.ndarray, gt: jnp.ndarray, fused_target: jnp.ndarray | None
) -> jnp.ndarray:
    """Optionally fuse a coarser head's heatmap into GF, then max-normalize.

    Mirrors ``regda_7.py:3618-3625`` (x6) / ``3542-3548`` (x5): when a fused
    target is given, ``GF = clip(GF + target - 100 * GT)``; then every
    (sample, joint) map is divided by its max. The reference's division can
    produce NaN when a map is all-zero; we guard with a tiny epsilon (an
    all-zero map stays all-zero instead of NaN), otherwise numerics match.
    """
    if fused_target is not None:
        gf = jnp.clip(gf + fused_target - gt * 100.0, 0.0, 1.0)
    m = jnp.max(gf, axis=(-3, -2), keepdims=True)
    return gf / jnp.maximum(m, 1e-12)
