"""Pallas kernels, run in interpreter mode on CPU (real-hardware runs are
exercised by bench.py / the driver on the TPU chip)."""

import numpy as np

import jax
import jax.numpy as jnp

from dahpe_tpu.core.heatmap import render_gaussian
from dahpe_tpu.ops.pallas.gaussian import render_gaussian_pallas


def test_render_gaussian_pallas_matches_jnp_interpret():
    rng = np.random.default_rng(0)
    b, k, h, w = 4, 21, 64, 64
    mu = jnp.asarray(rng.integers(0, 64, size=(b, k, 2)), jnp.int32)
    valid = jnp.asarray(rng.uniform(size=(b, k)) > 0.2, jnp.float32)
    ref = render_gaussian(mu, h, w, sigma=2.0, reach=6, valid=valid)
    out = render_gaussian_pallas(
        mu, valid, height=h, width=w, sigma=2.0, reach=6, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_render_gaussian_pallas_small_scales_interpret():
    rng = np.random.default_rng(1)
    for size, reach, factor in ((32, 4, 2.0), (16, 3, 1.5)):
        mu = jnp.asarray(rng.integers(0, size, size=(2, 21, 2)), jnp.int32)
        valid = jnp.ones((2, 21), jnp.float32)
        ref = render_gaussian(mu, size, size, sigma=2.0, reach=reach, valid=valid)
        out = render_gaussian_pallas(
            mu, valid, height=size, width=size, sigma=2.0, reach=reach,
            interpret=True,
        )
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
