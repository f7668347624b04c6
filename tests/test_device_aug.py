"""On-device augmentation: geometric consistency + parity with the host path."""

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from dahpe_tpu.data import device_aug
from dahpe_tpu.data import transforms as T


def _checker(h=96, w=96, seed=0):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 255, size=(h, w, 3)).astype(np.float32)
    return img


def test_resize_batch_matches_host_resize():
    rng = np.random.default_rng(0)
    img = _checker(120, 120)
    kp = rng.uniform(10, 110, size=(21, 2)).astype(np.float32)
    intr = np.asarray([[100.0, 0, 60], [0, 100.0, 60], [0, 0, 1]], np.float32)

    pil = Image.fromarray(img.astype(np.uint8))
    ref_img, ref_kp, ref_intr = T.resize(pil, 64, kp, intr)
    ref_arr = T.to_normalized_array(ref_img)

    out, kp2, intr2 = device_aug.resize_batch(
        jnp.asarray(img)[None], jnp.asarray(kp)[None], jnp.asarray(intr)[None],
        out_size=64,
    )
    np.testing.assert_allclose(np.asarray(kp2[0]), ref_kp, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(intr2[0]), ref_intr, rtol=1e-6)
    # resampling kernels differ slightly (PIL antialiases on downscale);
    # normalized images must still agree closely in the mean
    diff = np.abs(np.asarray(out[0]) - ref_arr)
    assert diff.mean() < 0.25


def test_augment_batch_keypoints_track_pixels():
    """A bright dot placed at a known keypoint must land (approximately) at
    the transformed keypoint location after the fused warp."""
    key = jax.random.key(3)
    img = np.zeros((96, 96, 3), np.float32)
    kp_src = np.asarray([[48.0, 32.0]], np.float32)
    y0, x0 = int(kp_src[0, 1]), int(kp_src[0, 0])
    img[y0 - 1 : y0 + 2, x0 - 1 : x0 + 2] = 255.0
    intr = np.eye(3, dtype=np.float32)

    out, kp, _ = device_aug.augment_batch(
        jnp.asarray(img)[None],
        jnp.asarray(kp_src)[None],
        jnp.asarray(intr)[None],
        key,
        out_size=64,
        rotation=45.0,
        scale_range=(0.8, 1.0),
        jitter=0.0,
        blur=False,
    )
    out = np.asarray(out[0])
    kp = np.asarray(kp[0, 0])
    # un-normalize and find the dot
    img_un = out * np.asarray(T.IMAGENET_STD) + np.asarray(T.IMAGENET_MEAN)
    intensity = img_un.sum(-1)
    py, px = np.unravel_index(np.argmax(intensity), intensity.shape)
    if 0 <= kp[0] < 64 and 0 <= kp[1] < 64:
        assert abs(px - kp[0]) <= 2.0 and abs(py - kp[1]) <= 2.0


def test_augment_batch_shapes_and_finite():
    rng = np.random.default_rng(1)
    imgs = rng.uniform(0, 255, size=(4, 80, 80, 3)).astype(np.float32)
    kps = rng.uniform(0, 80, size=(4, 21, 2)).astype(np.float32)
    intr = np.tile(np.eye(3, dtype=np.float32), (4, 1, 1))
    out, kp, ii = device_aug.augment_batch(
        jnp.asarray(imgs), jnp.asarray(kps), jnp.asarray(intr), jax.random.key(0),
        out_size=64,
    )
    assert out.shape == (4, 64, 64, 3)
    assert np.isfinite(np.asarray(out)).all()
    assert np.isfinite(np.asarray(kp)).all()
    # different batch elements got different augmentations
    assert not np.allclose(np.asarray(out[0]), np.asarray(out[1]))


def _smooth(h=96):
    yy, xx = np.mgrid[0:h, 0:h].astype(np.float32)
    return np.stack(
        [
            50 + xx * 1.5,
            50 + yy * 1.5,
            100 + 80 * np.exp(-((xx - 30) ** 2 + (yy - 50) ** 2) / 200.0),
        ],
        axis=-1,
    )


def test_matmul_warp_matches_gather_scale_only():
    """With no rotation the matmul path is the same bilinear resample as the
    gather oracle — must agree to float tolerance, keypoints bit-identical."""
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, (96, 96, 3)).astype(np.float32)
    kp = rng.uniform(10, 80, (21, 2)).astype(np.float32)
    intr = np.eye(3, dtype=np.float32)
    for seed in range(6):
        key = jax.random.key(seed)
        args = (jnp.asarray(img), jnp.asarray(kp), jnp.asarray(intr), key)
        kw = dict(out_size=64, rotation=1e-6, scale_range=(0.6, 1.3))
        og, kg, _ = device_aug._warp_one(*args, **kw, method="gather")
        om, km, _ = device_aug._warp_one(*args, **kw, method="matmul")
        np.testing.assert_array_equal(np.asarray(kg), np.asarray(km))
        np.testing.assert_allclose(
            np.asarray(om), np.asarray(og), atol=5e-3, rtol=0
        )


def test_matmul_warp_matches_gather_rotated_interior():
    """Full random rotation: three-shear resampling vs the single-pass gather
    agree on the interior of a smooth image (the black-fill boundary differs
    by construction — multi-pass edges are soft); keypoints bit-identical."""
    from scipy.ndimage import binary_erosion

    img = _smooth(96)
    kp = np.full((21, 2), 40, np.float32)
    intr = np.eye(3, dtype=np.float32)
    for seed in range(10):
        key = jax.random.key(seed)
        args = (jnp.asarray(img), jnp.asarray(kp), jnp.asarray(intr), key)
        kw = dict(out_size=64, rotation=180.0, scale_range=(0.6, 1.3))
        og, kg, _ = device_aug._warp_one(*args, **kw, method="gather")
        om, km, _ = device_aug._warp_one(*args, **kw, method="matmul")
        np.testing.assert_array_equal(np.asarray(kg), np.asarray(km))
        og, om = np.asarray(og), np.asarray(om)
        interior = binary_erosion(og.sum(-1) > 1.0, iterations=4)
        d = np.abs(og - om)[interior]
        assert d.max() < 2.0, f"seed {seed}: interior max {d.max()}"
        assert d.mean() < 0.05, f"seed {seed}: interior mean {d.mean()}"


def test_augment_batch_matmul_default_keypoints_track_pixels():
    """The default (matmul) batch path keeps keypoints locked to content."""
    key = jax.random.key(3)
    img = np.zeros((96, 96, 3), np.float32)
    kp_src = np.asarray([[48.0, 32.0]], np.float32)
    y0, x0 = int(kp_src[0, 1]), int(kp_src[0, 0])
    img[y0 - 1 : y0 + 2, x0 - 1 : x0 + 2] = 255.0
    intr = np.eye(3, dtype=np.float32)
    for warp in ("matmul", "gather"):
        out, kp, _ = device_aug.augment_batch(
            jnp.asarray(img)[None],
            jnp.asarray(kp_src)[None],
            jnp.asarray(intr)[None],
            key,
            out_size=64,
            rotation=170.0,
            scale_range=(0.8, 1.0),
            jitter=0.0,
            blur=False,
            warp=warp,
        )
        out = np.asarray(out[0])
        kp = np.asarray(kp[0, 0])
        img_un = out * np.asarray(T.IMAGENET_STD) + np.asarray(T.IMAGENET_MEAN)
        intensity = img_un.sum(-1)
        py, px = np.unravel_index(np.argmax(intensity), intensity.shape)
        if 0 <= kp[0] < 64 and 0 <= kp[1] < 64:
            assert abs(px - kp[0]) <= 2.0 and abs(py - kp[1]) <= 2.0, warp


def test_gaussian_blur_preserves_mean():
    img = _checker(64, 64, seed=2)
    out = device_aug._gaussian_blur(jnp.asarray(img), jax.random.key(1))
    assert out.shape == img.shape
    assert abs(float(out.mean()) - float(img.mean())) < 1.5


def test_gaussian_blur_matmul_matches_depthwise_conv():
    """The banded-matmul blur (r5 MXU mapping) is numerically the depthwise
    conv it replaced: same sampled kernel, same edge padding, f32-roundoff
    differences only."""

    def conv_oracle(image, key, low=0.0, high=0.8, kernel_radius=2):
        radius = jax.random.uniform(key, (), minval=low, maxval=high)
        sigma = jnp.maximum(radius, 1e-3)
        offs = jnp.arange(
            -kernel_radius, kernel_radius + 1, dtype=jnp.float32
        )
        k = jnp.exp(-(offs**2) / (2 * sigma**2))
        k = jnp.where(radius < 1e-2, (offs == 0).astype(jnp.float32), k)
        k = k / k.sum()
        r = kernel_radius
        c = image.shape[-1]
        img = jnp.pad(image, ((r, r), (r, r), (0, 0)), mode="edge")[None]
        kv = jnp.tile(k[:, None, None, None], (1, 1, 1, c))
        kh = jnp.tile(k[None, :, None, None], (1, 1, 1, c))
        img = jax.lax.conv_general_dilated(
            img, kv, (1, 1), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
        )
        img = jax.lax.conv_general_dilated(
            img, kh, (1, 1), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
        )
        return img[0]

    rng = np.random.default_rng(5)
    for shape in [(64, 64, 3), (37, 53, 3)]:
        img = jnp.asarray(rng.uniform(0, 255, shape).astype(np.float32))
        for seed in (1, 7, 42):
            key = jax.random.key(seed)
            got = device_aug._gaussian_blur(img, key)
            want = conv_oracle(img, key)
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), atol=2e-3
            )


def test_augment_batch_pallas_uint8_equals_float(monkeypatch):
    """The pallas warp's uint8 fast path (in-kernel fixed-point conversion,
    no float-cast HBM pass) is bit-identical to feeding the float cast."""
    import dahpe_tpu.ops.pallas.shear as shear_mod

    real = shear_mod.rotate3_fused_pallas
    monkeypatch.setattr(
        shear_mod, "rotate3_fused_pallas",
        lambda *a, **kw: real(*a, interpret=True, **kw),
    )
    rng = np.random.default_rng(7)
    imgs_u8 = jnp.asarray(rng.integers(0, 256, (2, 64, 64, 3)), jnp.uint8)
    kps = jnp.asarray(rng.uniform(10, 54, (2, 21, 2)), jnp.float32)
    intr = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (2, 3, 3))
    key = jax.random.key(11)
    out_u8 = device_aug.augment_batch(
        imgs_u8, kps, intr, key, out_size=32, warp="pallas")
    out_f = device_aug.augment_batch(
        imgs_u8.astype(jnp.float32), kps, intr, key, out_size=32,
        warp="pallas")
    for a, b in zip(out_u8, out_f):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
