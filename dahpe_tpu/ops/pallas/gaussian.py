"""Pallas TPU kernel: windowed-Gaussian heatmap rendering.

Renders (B, H, W, K) unnormalized Gaussian heatmaps from integer peaks — the
inner op of both ground-truth target generation (``util.py:9-68``) and the
three pseudo-label generators. One grid step per batch element; peak
coordinates ride along as small VMEM operands; the (H, W, K) tile is computed
entirely in registers/VMEM from broadcasted iota, so the only HBM traffic is
the output write (the op is output-bandwidth-bound by construction).

The jnp fallback (``dahpe_tpu.core.heatmap.render_gaussian``) fuses to the
same thing under XLA; this kernel exists to pin the codegen and as the
substrate for fusing the downstream GF math into the same pass.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _render_kernel(mu_ref, valid_ref, out_ref, *, sigma: float, reach: int):
    _, h, w, k = out_ref.shape
    i = pl.program_id(0)
    ys = jax.lax.broadcasted_iota(jnp.int32, (1, h, w, k), 1)
    xs = jax.lax.broadcasted_iota(jnp.int32, (1, h, w, k), 2)
    mu = mu_ref[i]  # (K, 2)
    mu_x = mu[:, 0].reshape(1, 1, 1, k)
    mu_y = mu[:, 1].reshape(1, 1, 1, k)
    dx = xs - mu_x
    dy = ys - mu_y
    d2 = (dx * dx + dy * dy).astype(jnp.float32)
    g = jnp.exp(-d2 / (2.0 * sigma * sigma))
    inside = (jnp.abs(dx) <= reach) & (jnp.abs(dy) <= reach)
    v = valid_ref[i].reshape(1, 1, 1, k) > 0
    out_ref[:] = jnp.where(inside & v, g, 0.0)


@functools.partial(
    jax.jit, static_argnames=("height", "width", "sigma", "reach", "interpret")
)
def render_gaussian_pallas(
    mu: jnp.ndarray,
    valid: jnp.ndarray,
    *,
    height: int,
    width: int,
    sigma: float = 2.0,
    reach: int = 6,
    interpret: bool = False,
) -> jnp.ndarray:
    """Pallas version of :func:`dahpe_tpu.core.heatmap.render_gaussian`.

    Args: mu (B, K, 2) int32 peaks; valid (B, K) float/bool mask.
    Returns: (B, H, W, K) float32. Verified bit-exact vs the jnp renderer
    on TPU hardware.
    """
    b, k, _ = mu.shape
    mu = mu.astype(jnp.int32)
    valid = valid.astype(jnp.float32)
    kernel = functools.partial(_render_kernel, sigma=sigma, reach=reach)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # full (B, K, 2)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # full (B, K)
        ],
        out_specs=pl.BlockSpec(
            (1, height, width, k), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, height, width, k), jnp.float32),
        interpret=interpret,
    )(mu, valid)
