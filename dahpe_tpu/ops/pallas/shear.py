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


def _shear_block(block: jnp.ndarray, sl, *, kmax: int, axis: int) -> jnp.ndarray:
    """Shear a (C, H, W) VMEM-resident block along ``axis`` (2: per-row shift
    along W — the ``_shear_x`` map; 1: per-column shift along H —
    ``_shear_y``) by ``slope * (line - center)``. Pure array→array so the
    single-shear and fused three-shear kernels share one body."""
    c, h, w = block.shape
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
    return out.astype(jnp.uint16)


def _shear_kernel(slope_ref, img_ref, out_ref, *, kmax: int, axis: int):
    out_ref[...] = _shear_block(img_ref[...], slope_ref[0, 0],
                                kmax=kmax, axis=axis)


def _rotate3_kernel(slopes_ref, img_ref, out_ref, *, kmax_a: int, kmax_b: int):
    """The full Paeth rotation ShX(a) . ShY(b) . ShX(a) in ONE kernel: the
    canvas is read from HBM once, all three shears (and their two
    intermediate canvases) stay in VMEM, and the result is written once —
    2 HBM passes instead of the 6 the per-shear kernels need."""
    a = slopes_ref[0, 0]
    b = slopes_ref[0, 1]
    x = img_ref[...]
    x = _shear_block(x, a, kmax=kmax_a, axis=2)
    x = _shear_block(x, b, kmax=kmax_b, axis=1)
    x = _shear_block(x, a, kmax=kmax_a, axis=2)
    out_ref[...] = x


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


def _to_fixed(x: jnp.ndarray) -> jnp.ndarray:
    """uint8 or float32 ``[0, 255]`` canvas → 8.8 fixed-point uint16.

    Exact on both inputs: uint8 values scale to at most 65280, and integral
    float values convert through ``round`` unchanged — so a uint8 canvas and
    its float cast produce bit-identical fixed-point canvases. Mosaic has no
    direct float32↔uint16 casts; int32 is the supported waypoint in both
    directions (values are integral in ``[0, 65535]``, so it is exact)."""
    if x.dtype == jnp.uint8:
        return (x.astype(jnp.int32) * 256).astype(jnp.uint16)
    x = jnp.clip(jnp.round(x * 256.0), 0.0, 65535.0)
    return x.astype(jnp.int32).astype(jnp.uint16)


def _rotate3_fused_kernel(slopes_ref, img_ref, out_ref, *, pad: int,
                          kmax_a: int, kmax_b: int):
    """:func:`_rotate3_kernel` plus the canvas entry/exit glue fused in:
    uint8/float→8.8-fixed-point conversion, symmetric zero padding, the
    three shears, the center crop back to the input frame, and the float
    conversion — all in VMEM. Removes the three XLA elementwise HBM passes
    (convert, pad, crop+scale) that bracketed the r3 kernel; ingesting the
    loader's uint8 directly also removes the float-cast pass before it and
    quarters the kernel's HBM input read."""
    a = slopes_ref[0, 0]
    b = slopes_ref[0, 1]
    c, h, w = img_ref.shape
    x = jnp.pad(_to_fixed(img_ref[...]), ((0, 0), (pad, pad), (pad, pad)))
    x = _shear_block(x, a, kmax=kmax_a, axis=2)
    x = _shear_block(x, b, kmax=kmax_b, axis=1)
    x = _shear_block(x, a, kmax=kmax_a, axis=2)
    crop = x[:, pad : pad + h, pad : pad + w].astype(jnp.int32)
    out_ref[...] = crop.astype(jnp.float32) * (1.0 / 256.0)


@functools.partial(
    jax.jit, static_argnames=("pad", "kmax_a", "kmax_b", "interpret")
)
def rotate3_fused_pallas(
    image: jnp.ndarray,
    slope_a: jnp.ndarray,
    slope_b: jnp.ndarray,
    *,
    pad: int,
    kmax_a: int,
    kmax_b: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Paeth rotation of one uint8/float canvas with ALL glue fused (vmap
    for batches): 8.8 fixed-point conversion, symmetric ``pad``, the three
    shears, center crop, float conversion — one HBM read of the input
    canvas and one write of the result.

    Bit-identical to the r3 composition
    ``crop(rotate3_pallas(pad(to_fixed(image)))) / 256`` (conversion is
    elementwise and the padding symmetric, so their order relative to the
    caller's quarter-turn commutes — verified exactly in
    ``tests/test_pallas_shear.py``), and identical across the two input
    dtypes (:func:`_to_fixed` is exact on uint8).

    Args:
      image: (C, H, W) uint8 or float32 in [0, 255] (the post-quarter-turn
        canvas; uint8 is the fast path — 4x less HBM input traffic).
      slope_a / slope_b: scalar float32 shear slopes.
      pad: static symmetric padding (the sqrt(2) rotation margin).
      kmax_a / kmax_b: static integer-shift bounds ON THE PADDED canvas.
    Returns: (C, H, W) float32 in [0, 255] (1/256-quantized).
    """
    c, h, w = image.shape
    kernel = functools.partial(
        _rotate3_fused_kernel, pad=pad, kmax_a=kmax_a, kmax_b=kmax_b
    )
    slopes = jnp.stack(
        [jnp.asarray(slope_a, jnp.float32), jnp.asarray(slope_b, jnp.float32)]
    ).reshape(1, 2)
    return pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, h, w), jnp.float32),
        interpret=interpret,
    )(slopes, image if image.dtype == jnp.uint8
      else image.astype(jnp.float32))


@functools.partial(jax.jit, static_argnames=("kmax_a", "kmax_b", "interpret"))
def rotate3_pallas(
    image: jnp.ndarray,
    slope_a: jnp.ndarray,
    slope_b: jnp.ndarray,
    *,
    kmax_a: int,
    kmax_b: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused three-shear (Paeth) rotation ShX(a) . ShY(b) . ShX(a) of one
    8.8 fixed-point canvas in a single Pallas kernel (vmap for batches).

    Bit-identical to applying :func:`shear_pallas` (or the jnp shears in
    ``data/device_aug.py``) three times; saves the two intermediate HBM
    round trips and two kernel launches.

    Args:
      image: (C, H, W) uint16 (8.8 fixed point).
      slope_a: scalar float32 x-shear slope (applied first and last).
      slope_b: scalar float32 y-shear slope (applied in the middle).
      kmax_a / kmax_b: static integer-shift bounds for the x / y shears.
    Returns: (C, H, W) uint16.
    """
    c, h, w = image.shape
    kernel = functools.partial(_rotate3_kernel, kmax_a=kmax_a, kmax_b=kmax_b)
    slopes = jnp.stack(
        [jnp.asarray(slope_a, jnp.float32), jnp.asarray(slope_b, jnp.float32)]
    ).reshape(1, 2)
    return pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, h, w), jnp.uint16),
        interpret=interpret,
    )(slopes, image)
