"""Layout converters between this framework's NHWC and torch's NCHW worlds.

dahpe_tpu keeps every image as ``(B, H, W, C)`` and every heatmap as
``(B, H, W, K)`` — the layout XLA tiles best onto the TPU's (8, 128) vector
registers and the MXU. The reference (and its checkpoints / golden values)
are ``(B, K, H, W)``; these helpers live at that boundary only.
"""

from __future__ import annotations

import jax.numpy as jnp


def to_bkhw(x: jnp.ndarray) -> jnp.ndarray:
    """``(B, H, W, K)`` → ``(B, K, H, W)`` (torch layout)."""
    return jnp.transpose(x, (0, 3, 1, 2))


def from_bkhw(x: jnp.ndarray) -> jnp.ndarray:
    """``(B, K, H, W)`` (torch layout) → ``(B, H, W, K)``."""
    return jnp.transpose(x, (0, 2, 3, 1))


def nchw_to_nhwc(x: jnp.ndarray) -> jnp.ndarray:
    """Alias of :func:`from_bkhw` for images."""
    return from_bkhw(x)


def nhwc_to_nchw(x: jnp.ndarray) -> jnp.ndarray:
    """Alias of :func:`to_bkhw` for images."""
    return to_bkhw(x)
