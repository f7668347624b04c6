"""BatchNorm with exact torch semantics + optional cross-replica statistics.

Torch's ``nn.BatchNorm2d`` differs from ``flax.linen.BatchNorm`` in two ways
that matter for checkpoint/training parity with the reference:

1. running stats update: ``running = (1 - momentum) * running + momentum * new``
   with ``momentum = 0.1`` (flax uses the complementary convention), and
2. the running **variance** is updated with the *unbiased* batch variance
   while normalization uses the biased one.

Under data parallelism the batch statistics can be averaged across the mesh's
``data`` axis (``axis_name``), which torch/DDP never did — the reference is
single-device (``train1.py:34``) — so cross-replica sync is optional and off
by default to match.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn


class BatchNorm2d(nn.Module):
    """Torch-semantics batch norm over all axes but the last (channel)."""

    momentum: float = 0.1
    epsilon: float = 1e-5
    axis_name: str | None = None
    dtype: Any = None  # compute dtype; params/stats always float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool) -> jnp.ndarray:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones_init(), (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(), (c,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda s: jnp.zeros(s, jnp.float32), (c,)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda s: jnp.ones(s, jnp.float32), (c,)
        )

        if train:
            x32 = x.astype(jnp.float32)
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(x32, axis=axes)
            mean_sq = jnp.mean(jnp.square(x32), axis=axes)
            n = x32.size // c
            if self.axis_name is not None:
                mean = jax.lax.pmean(mean, self.axis_name)
                mean_sq = jax.lax.pmean(mean_sq, self.axis_name)
                n = n * jax.lax.psum(1, self.axis_name)
            var = mean_sq - jnp.square(mean)  # biased, used for normalization
            if not self.is_initializing():
                unbiased = var * (n / max(n - 1, 1))
                m = self.momentum
                ra_mean.value = (1.0 - m) * ra_mean.value + m * mean
                ra_var.value = (1.0 - m) * ra_var.value + m * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value

        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.epsilon)
        y = y * scale + bias
        return y.astype(self.dtype or x.dtype)
