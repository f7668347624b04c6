"""Warm-start gradient scaling — the reference's GL layer as a custom VJP.

``utils/gl.py:8-69``: identity forward, backward multiplies the gradient by a
coefficient scheduled from ``lo`` to ``hi``. In the reference the coefficient
lives in mutable module state stepped once per iteration
(``train1.py:453``); here it is a pure function of the step count so the whole
train step stays jittable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def gradient_scale(x: jnp.ndarray, coeff: jnp.ndarray) -> jnp.ndarray:
    """Identity forward; backward scales ``dx`` by ``coeff`` (no grad to coeff)."""
    del coeff
    return x


def _fwd(x, coeff):
    return x, coeff


def _bwd(coeff, g):
    return (g * coeff, jnp.zeros_like(coeff))


gradient_scale.defvjp(_fwd, _bwd)


def warm_start_coeff(
    step: jnp.ndarray | int,
    *,
    alpha: float = 1.0,
    lo: float = 0.0,
    hi: float = 0.1,
    max_iters: int = 1000,
) -> jnp.ndarray:
    """λ(i) = 2(hi-lo) / (1 + exp(-α i / N)) - (hi-lo) + lo  (``utils/gl.py:57-62``).

    The reference instantiates this with ``hi=0.1, N=1000`` (``regda_7.py:4902``),
    so λ ramps 0 → 0.1 over roughly the first two epochs.
    """
    i = jnp.asarray(step, dtype=jnp.float32)
    span = hi - lo
    return 2.0 * span / (1.0 + jnp.exp(-alpha * i / max_iters)) - span + lo
