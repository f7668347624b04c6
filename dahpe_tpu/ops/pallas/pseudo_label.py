"""Pallas TPU kernel: fused pseudo-label construction (GT + ground-false).

Fuses the whole label side of a regression-disparity loss into one VMEM pass
per batch element — Gaussian GT rendering, the ground-false mask (channel
union or inverse form), optional fusion with an upsampled coarser heatmap,
and the per-(sample, joint) max-normalization — so GT/GF never round-trip
through HBM between steps. Reference semantics: ``regda_7.py:3609-3632``
(x6), ``:3530-3561`` (x5), ``:3251-3268`` (x1).

The jnp path (``dahpe_tpu.train.disparity``) computes the same values; this
kernel pins the fusion instead of relying on XLA's fuser.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(
    mu_ref,
    fused_ref,
    gt_ref,
    gf_ref,
    *,
    sigma: float,
    reach: int,
    gf_kind: str,
    use_fused: bool,
    normalize: bool,
):
    i = pl.program_id(0)
    _, h, w, k = gt_ref.shape
    ys = jax.lax.broadcasted_iota(jnp.int32, (1, h, w, k), 1)
    xs = jax.lax.broadcasted_iota(jnp.int32, (1, h, w, k), 2)
    mu = mu_ref[i]  # (K, 2)
    dx = xs - mu[:, 0].reshape(1, 1, 1, k)
    dy = ys - mu[:, 1].reshape(1, 1, 1, k)
    d2 = (dx * dx + dy * dy).astype(jnp.float32)
    g = jnp.exp(-d2 / (2.0 * sigma * sigma))
    inside = (jnp.abs(dx) <= reach) & (jnp.abs(dy) <= reach)
    gt = jnp.where(inside, g, 0.0)
    gt_ref[:] = gt

    if gf_kind == "union_minus":
        label_p = jnp.clip(jnp.sum(gt, axis=-1, keepdims=True), 0.0, 1.0)
        gf = jnp.clip(label_p - 10.0 * gt, 0.0, 1.0)
    elif gf_kind == "inverse":
        gf = jnp.clip(1.0 - 10.0 * gt, 0.0, 1.0)
    else:  # union_others (regda_4.py:83-84)
        total = jnp.sum(gt, axis=-1, keepdims=True)
        gf = jnp.clip(total - gt, 0.0, 1.0)

    if use_fused:
        gf = jnp.clip(gf + fused_ref[:] - 100.0 * gt, 0.0, 1.0)
    if normalize:
        m = jnp.max(gf, axis=(1, 2), keepdims=True)
        gf = gf / jnp.maximum(m, 1e-12)
    gf_ref[:] = gf


@functools.partial(
    jax.jit,
    static_argnames=(
        "out_size", "sigma", "reach", "gf_kind", "normalize", "interpret"
    ),
)
def pseudo_labels_pallas(
    peaks: jnp.ndarray,
    fused_target: jnp.ndarray | None = None,
    *,
    out_size: int,
    sigma: float = 2.0,
    reach: int = 6,
    gf_kind: str = "union_minus",
    normalize: bool = True,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fused (GT, GF) from integer peaks. peaks: (B, K, 2) in out_size units.

    ``gf_kind``: 'union_minus' (rd_64), 'inverse' (rd_32/rd_16),
    'union_others' (original RegDA). Returns (gt, gf), each
    (B, out, out, K) float32.
    """
    b, k, _ = peaks.shape
    peaks = peaks.astype(jnp.int32)
    use_fused = fused_target is not None
    if fused_target is None:
        fused_target = jnp.zeros((b, out_size, out_size, k), jnp.float32)
    kernel = functools.partial(
        _kernel,
        sigma=sigma,
        reach=reach,
        gf_kind=gf_kind,
        use_fused=use_fused,
        normalize=normalize,
    )
    block = pl.BlockSpec(
        (1, out_size, out_size, k), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM), block],
        out_specs=(block, block),
        out_shape=(
            jax.ShapeDtypeStruct((b, out_size, out_size, k), jnp.float32),
            jax.ShapeDtypeStruct((b, out_size, out_size, k), jnp.float32),
        ),
        interpret=interpret,
    )(peaks, fused_target.astype(jnp.float32))
