"""Pallas TPU kernel: bilinear 1-D shear of a (C, H, W) canvas.

The jnp three-shear warp (``data/device_aug.py``) expresses each shear as
``ceil(log2(2*kmax))`` masked static whole-canvas shifts plus one 2-tap
blend — every level a separate HBM round trip once canvases exceed cache.
This kernel runs ALL levels and the blend inside VMEM on one block per
image: the HBM traffic per shear drops from ~9 read+write passes to exactly
one read and one write, which is the op's speed of light (the shear is pure
data movement).

Math is bit-identical to ``device_aug._shear_x`` / ``_shear_y``: 8.8
fixed-point uint16 canvases, floor/fraction split of the per-line offset,
int32 round-to-nearest blend (verified by exact-equality tests). The entry
is single-image and composes with ``jax.vmap`` (pallas adds the batch grid
dimension), mirroring how the jnp shears are used inside the vmapped warp.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _levels(kmax: int) -> int:
    return max(1, (2 * kmax).bit_length())


def _shear_kernel(slope_ref, img_ref, out_ref, *, kmax: int, axis: int):
    """Shear img (C, H, W) along ``axis`` (2: per-row shift along W — the
    ``_shear_x`` map; 1: per-column shift along H — ``_shear_y``) by
    ``slope * (line - center)``."""
    c, h, w = img_ref.shape
    sl = slope_ref[0, 0]
    if axis == 2:
        n_lines = h
        # Mosaic iota must be integer-typed; cast after
        line = jax.lax.broadcasted_iota(jnp.int32, (1, h, 1), 1)
    else:
        n_lines = w
        line = jax.lax.broadcasted_iota(jnp.int32, (1, 1, w), 2)
    s = sl * (line.astype(jnp.float32) - (n_lines - 1) / 2.0)
    k = jnp.floor(s)
    kk = jnp.clip(k.astype(jnp.int32) + kmax, 0, 2 * kmax)
    w2 = jnp.round((s - k) * 256.0).astype(jnp.int32)

    block = img_ref[...]
    if axis == 2:
        work = jnp.pad(block, ((0, 0), (0, 0), (kmax, kmax)))
    else:
        work = jnp.pad(block, ((0, 0), (kmax, kmax), (0, 0)))
    for level in range(_levels(kmax)):
        step = 1 << level
        if axis == 2:
            shifted = jnp.pad(work[:, :, step:], ((0, 0), (0, 0), (0, step)))
        else:
            shifted = jnp.pad(work[:, step:, :], ((0, 0), (0, step), (0, 0)))
        bit = ((kk >> level) & 1) > 0
        work = jnp.where(bit, shifted, work)
    if axis == 2:
        lo = work[:, :, :w].astype(jnp.int32)
        hi = work[:, :, 1 : w + 1].astype(jnp.int32)
    else:
        lo = work[:, :h, :].astype(jnp.int32)
        hi = work[:, 1 : h + 1, :].astype(jnp.int32)
    out = (lo * (256 - w2) + hi * w2 + 128) >> 8
    out_ref[...] = out.astype(jnp.uint16)


@functools.partial(jax.jit, static_argnames=("kmax", "axis", "interpret"))
def shear_pallas(
    image: jnp.ndarray,
    slope: jnp.ndarray,
    *,
    kmax: int,
    axis: int = 2,
    interpret: bool = False,
) -> jnp.ndarray:
    """Bilinear shear of one 8.8 fixed-point canvas (vmap for batches).

    Args:
      image: (C, H, W) uint16 (8.8 fixed point).
      slope: scalar float32 shear slope.
      kmax: static bound on the integer shift (same contract as
        ``device_aug._shear_x``).
      axis: 2 shifts along W per row (``_shear_x``), 1 shifts along H per
        column (``_shear_y``).
    Returns: (C, H, W) uint16, bit-identical to the jnp shear.
    """
    c, h, w = image.shape
    kernel = functools.partial(_shear_kernel, kmax=kmax, axis=axis)
    return pl.pallas_call(
        kernel,
        in_specs=[
            # (1, 1) in VMEM, not SMEM: vmap prepends a batch dimension to
            # every operand, and SMEM blocks don't admit the batched layout
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, h, w), jnp.uint16),
        interpret=interpret,
    )(jnp.reshape(slope, (1, 1)).astype(jnp.float32), image)
