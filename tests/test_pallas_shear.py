"""Pallas shear kernel (``ops/pallas/shear.py``): bit-exact vs the jnp
masked-shift shears, including under vmap and inside the full warp path.

Runs in interpret mode on CPU (the kernel's TPU compilation is exercised by
``bench.py aug <batch> pallas`` on hardware).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dahpe_tpu.data import device_aug as da
from dahpe_tpu.ops.pallas.shear import shear_pallas


@pytest.mark.parametrize("slope", [0.0, 0.3, -0.41422, 0.70711])
def test_shear_x_exact(slope):
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.integers(0, 65535, (3, 70, 66)), jnp.uint16)
    kmax = 32
    ref = da._shear_x(img, jnp.float32(slope), kmax)
    got = shear_pallas(img, jnp.float32(slope), kmax=kmax, axis=2,
                       interpret=True)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


@pytest.mark.parametrize("slope", [0.0, -0.3, 0.70711])
def test_shear_y_exact(slope):
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.integers(0, 65535, (3, 66, 70)), jnp.uint16)
    kmax = 28
    ref = da._shear_y(img, jnp.float32(slope), kmax)
    got = shear_pallas(img, jnp.float32(slope), kmax=kmax, axis=1,
                       interpret=True)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_vmapped_shear_exact():
    rng = np.random.default_rng(2)
    imgs = jnp.asarray(rng.integers(0, 65535, (4, 3, 70, 66)), jnp.uint16)
    sl = jnp.asarray(rng.uniform(-0.4, 0.4, (4,)), jnp.float32)
    got = jax.vmap(
        lambda im, s: shear_pallas(im, s, kmax=16, axis=2, interpret=True)
    )(imgs, sl)
    ref = jax.vmap(lambda im, s: da._shear_x(im, s, 16))(imgs, sl)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_rotate3_fused_exact():
    """The fused three-shear kernel == the three jnp shears, bit for bit."""
    from dahpe_tpu.ops.pallas.shear import rotate3_pallas

    rng = np.random.default_rng(4)
    img = jnp.asarray(rng.integers(0, 65535, (3, 70, 70)), jnp.uint16)
    for a, b in ((0.0, 0.0), (-0.2, 0.38), (0.41421, -0.70710)):
        ref = da._shear_x(
            da._shear_y(da._shear_x(img, jnp.float32(a), 30),
                        jnp.float32(b), 51),
            jnp.float32(a), 30)
        got = rotate3_pallas(img, jnp.float32(a), jnp.float32(b),
                             kmax_a=30, kmax_b=51, interpret=True)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_rotate3_glue_fused_exact():
    """The glue-fused kernel == to_fixed → pad → three shears → crop →
    to_float done with the jnp ops, bit for bit."""
    from dahpe_tpu.ops.pallas.shear import rotate3_fused_pallas

    rng = np.random.default_rng(5)
    img = jnp.asarray(rng.uniform(0.0, 255.0, (3, 48, 48)), jnp.float32)
    pad = 12
    for a, b in ((0.0, 0.0), (-0.2, 0.38), (0.41421, -0.70710)):
        fx = jnp.pad(
            jnp.clip(jnp.round(img * 256.0), 0.0, 65535.0).astype(jnp.uint16),
            ((0, 0), (pad, pad), (pad, pad)),
        )
        ref = da._shear_x(
            da._shear_y(da._shear_x(fx, jnp.float32(a), 31),
                        jnp.float32(b), 52),
            jnp.float32(a), 31)
        ref = ref[:, pad:-pad, pad:-pad].astype(jnp.float32) * (1.0 / 256.0)
        got = rotate3_fused_pallas(img, jnp.float32(a), jnp.float32(b),
                                   pad=pad, kmax_a=31, kmax_b=52,
                                   interpret=True)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_rotate3_glue_fused_uint8_exact():
    """uint8 ingestion (in-kernel fixed-point conversion) == the float-cast
    path, bit for bit — the production device-store path feeds uint8."""
    from dahpe_tpu.ops.pallas.shear import rotate3_fused_pallas

    rng = np.random.default_rng(6)
    img_u8 = jnp.asarray(rng.integers(0, 256, (3, 48, 48)), jnp.uint8)
    for a, b in ((0.0, 0.0), (-0.2, 0.38), (0.41421, -0.70710)):
        ref = rotate3_fused_pallas(
            img_u8.astype(jnp.float32), jnp.float32(a), jnp.float32(b),
            pad=12, kmax_a=31, kmax_b=52, interpret=True)
        got = rotate3_fused_pallas(img_u8, jnp.float32(a), jnp.float32(b),
                                   pad=12, kmax_a=31, kmax_b=52,
                                   interpret=True)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_rotate_shears_pallas_exact(monkeypatch):
    """The full quarter-turn + three-shear rotation through the fused kernel."""
    import dahpe_tpu.ops.pallas.shear as shear_mod

    real = shear_mod.rotate3_fused_pallas
    monkeypatch.setattr(
        shear_mod, "rotate3_fused_pallas",
        lambda *a, **kw: real(*a, interpret=True, **kw),
    )
    rng = np.random.default_rng(3)
    img_u8 = jnp.asarray(rng.integers(0, 255, (64, 64, 3)), jnp.uint8)
    img = img_u8.astype(jnp.float32)
    for angle in (0.0, 33.0, -117.5, 180.0):
        ref = da._rotate_shears(img, jnp.float32(angle), use_pallas=False)
        got = da._rotate_shears(img, jnp.float32(angle), use_pallas=True)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))
        # uint8 in, conversion in-kernel: still bit-identical
        got_u8 = da._rotate_shears(img_u8, jnp.float32(angle), use_pallas=True)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(got_u8))
