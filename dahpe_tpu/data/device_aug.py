"""On-device batched augmentation — the TPU-native input hot path.

The reference augments per sample on the host with PIL: rotate (one bilinear
resample) → random resized crop (crop + another resample) → color jitter →
Gaussian blur → normalize (``train1.py:56-63``). Here the whole geometric
chain composes into ONE affine map applied with a single bilinear gather per
batch on the TPU, followed by vectorized photometric ops — no host work
beyond the raw decoded crop, no multiple resamplings, and keypoints /
intrinsics transform through the exact same matrix.

Semantics intentionally match the reference distributions (angle ~ U(-180,
180), square crop area ratio ~ U(0.6, 1.3) clamped to the image, jitter
factors ~ U(1±0.25) in random order, blur radius ~ U(0, 0.8)); pixel values
differ from PIL only by resampling-composition order, which is augmentation
noise by construction.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

# plain numpy on purpose: a module-level jnp array would initialize the
# device backend (and claim the TPU) on mere import
IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)


def _affine_params(key, h: int, w: int, out_size: int, rotation: float,
                   scale_range: tuple[float, float]):
    """Sample per-image rotation + square-crop and compose into a single
    output-pixel → source-pixel affine map (2x2 matrix + offset)."""
    k_ang, k_area, k_i, k_j = jax.random.split(key, 4)
    angle = jax.random.uniform(k_ang, (), minval=-rotation, maxval=rotation)
    rad = jnp.deg2rad(angle)

    area = jnp.asarray(h * w, jnp.float32)
    target_area = jax.random.uniform(
        k_area, (), minval=scale_range[0], maxval=scale_range[1]
    ) * area
    side = jnp.sqrt(target_area)
    side = jnp.clip(jnp.round(side), 1.0, jnp.minimum(h, w))
    i = jnp.floor(jax.random.uniform(k_i, ()) * (h - side + 1.0))
    j = jnp.floor(jax.random.uniform(k_j, ()) * (w - side + 1.0))

    # source = R^{-1} (crop(x)) composed: out pixel p -> crop-space q =
    # p * side/out + (j, i) -> rotate back around image center.
    s = side / out_size
    cos, sin = jnp.cos(rad), jnp.sin(rad)
    # keypoint transform used by the reference rotates keypoints by -angle
    # around the center; the inverse image map rotates source coords by the
    # forward angle.
    rot_inv = jnp.array([[cos, -sin], [sin, cos]])  # maps crop coords to src
    center = jnp.array([w / 2.0, h / 2.0])
    # out (x, y) -> pre-rotation coords
    scale_mat = jnp.array([[s, 0.0], [0.0, s]])
    offset = jnp.array([j, i])
    # full map: src = R_inv @ (scale @ p + offset - center) + center
    mat = rot_inv @ scale_mat
    off = rot_inv @ (offset - center) + center
    factor = out_size / side
    return mat, off, angle, side, offset, factor


def _bilinear_sample(image: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Sample image (H, W, C) at float coords (Ho, Wo, 2) as (x, y)."""
    h, w, _ = image.shape
    x = coords[..., 0]
    y = coords[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    dx = x - x0
    dy = y - y0
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)

    def gather(yy, xx):
        valid = (xx >= 0) & (xx < w) & (yy >= 0) & (yy < h)
        xx = jnp.clip(xx, 0, w - 1)
        yy = jnp.clip(yy, 0, h - 1)
        vals = image[yy, xx]  # (Ho, Wo, C)
        return vals * valid[..., None]

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    wx = dx[..., None]
    wy = dy[..., None]
    return (
        v00 * (1 - wx) * (1 - wy)
        + v01 * wx * (1 - wy)
        + v10 * (1 - wx) * wy
        + v11 * wx * wy
    )


def _shift_rows_x(image: jnp.ndarray, k: jnp.ndarray, kmax: int) -> jnp.ndarray:
    """Per-row integer shift: ``out[c, y, x] = image[c, y, x + k[y]]``,
    zero-filled.

    TPU-native formulation of the shear's data movement: the per-row shift
    amount is binary-decomposed, and each bit level applies one STATIC
    whole-image shift (pad + slice — a dense copy, no gather) selected per
    row with a mask. ``ceil(log2(2*kmax))`` dense passes replace the
    scalar-load-bound per-pixel gather that made the round-1 warp 261 img/s.
    Channels-first layout on purpose: the last (TPU lane) dimension is the
    wide image axis, not the 3 color channels.
    """
    c, h, w = image.shape
    work = jnp.pad(image, ((0, 0), (0, 0), (kmax, kmax)))
    kk = jnp.clip(k + kmax, 0, 2 * kmax)  # non-negative left-shift amounts
    for level in range(max(1, (2 * kmax).bit_length())):
        step = 1 << level
        shifted = jnp.pad(work[:, :, step:], ((0, 0), (0, 0), (0, step)))
        bit = ((kk >> level) & 1).astype(bool)
        work = jnp.where(bit[None, :, None], shifted, work)
    # one extra column so the caller's fractional blend still has the
    # (k+1)-th tap available at the right edge
    return work[:, :, : w + 1]


def _shear_x(image: jnp.ndarray, slope: jnp.ndarray, kmax: int) -> jnp.ndarray:
    """Bilinear x-shear about the image center on a ``(C, H, W)`` canvas:
    ``out[y, x] = image[y, x + slope * (y - cy)]`` (coords at pixel centers).

    Integer part via :func:`_shift_rows_x`; ONE fractional 2-tap blend on
    top — exactly the bilinear shear a direct resample would compute. The
    canvas is 8.8 fixed-point ``uint16`` (see :func:`_rotate_shears`), so
    the blend runs in int32 with round-to-nearest at 1/256 resolution.
    """
    h, w = image.shape[1], image.shape[2]
    y = jnp.arange(h, dtype=jnp.float32)
    s = slope * (y - (h - 1) / 2.0)
    k = jnp.floor(s)
    f = (s - k)[None, :, None]
    base = _shift_rows_x(image, k.astype(jnp.int32), kmax)  # (c, h, w + 1)
    w2 = jnp.round(f * 256.0).astype(jnp.int32)
    lo = base[:, :, :w].astype(jnp.int32)
    hi = base[:, :, 1 : w + 1].astype(jnp.int32)
    return ((lo * (256 - w2) + hi * w2 + 128) >> 8).astype(jnp.uint16)


def _shear_y(image: jnp.ndarray, slope: jnp.ndarray, kmax: int) -> jnp.ndarray:
    return _shear_x(image.swapaxes(1, 2), slope, kmax).swapaxes(1, 2)


def _rotate_shears(image: jnp.ndarray, angle_deg: jnp.ndarray,
                   use_pallas: bool = False) -> jnp.ndarray:
    """Rotate a square ``(H, W, C)`` image (float32 in [0, 255]; the pallas
    path also accepts uint8) about its center — zero gathers — returning the
    rotated float canvas channels-first ``(C, H, W)``.

    ``angle = 90q + r`` with ``|r| <= 45``: the quarter-turns are exact
    transpose/reverse ops, and ``R(r)`` is the classic three-shear (Paeth)
    factorization ``ShX(-tan(r/2)) . ShY(sin r) . ShX(-tan(r/2))``, each
    shear a banded 1-D resample built from static shifts + one 2-tap blend.
    Replaces the reference's PIL ``rotate`` (keypoint_detection.py:116-131)
    resampling; out-of-frame regions are black in both.
    """
    h, w, _ = image.shape
    assert h == w, "shear rotation requires square crops"
    q = jnp.round(angle_deg / 90.0)
    r = jnp.deg2rad(angle_deg - 90.0 * q)
    qi = jnp.asarray(q, jnp.int32) % 4

    # shears run channels-first so the TPU lane dimension is the image width
    # (vector units 128 wide; a trailing C=3 would leave 125/128 lanes idle
    # on every one of the ~25 shift/select passes), and in 8.8 fixed-point
    # uint16: the passes are memory-bound, so halving bytes halves time.
    # uint8 sources are exact in 8.8 (val*256 <= 65280); each shear's blend
    # rounds to 1/256 — three blends bound the quantization error by ~0.012
    # of a uint8 level, far inside the resampling noise the augmentation
    # already accepts.
    image = image.transpose(2, 0, 1)

    # run the shears on a sqrt(2)-padded canvas: intermediate shears push
    # content up to 0.707*h from the center before later shears bring it
    # back, and clipping it against the original frame would punch holes in
    # the rotated corners. Symmetric padding keeps the center (and thus the
    # quarter-turn transposes) exact; the final center-crop restores the
    # original frame, which is all the downstream crop box ever samples.
    pad = int(np.ceil(0.2072 * h)) + 2
    n = h + 2 * pad

    quarter_turn = lambda im: jax.lax.switch(
        qi,
        [
            lambda x: x,
            lambda x: jnp.rot90(x, k=1, axes=(1, 2)),
            lambda x: jnp.rot90(x, k=2, axes=(1, 2)),
            lambda x: jnp.rot90(x, k=3, axes=(1, 2)),
        ],
        im,
    )
    a = -jnp.tan(r / 2.0)  # |a| <= tan(22.5 deg)
    b = jnp.sin(r)  # |b| <= sin(45 deg)
    kmax_a = int(np.ceil(0.41422 * (n - 1) / 2.0)) + 1
    kmax_b = int(np.ceil(0.70711 * (n - 1) / 2.0)) + 1
    if use_pallas:
        # ALL three shears in one VMEM-resident kernel, WITH the fixed-point
        # conversion, padding, center crop and float conversion fused in —
        # HBM traffic is one float-canvas read + one write total. The
        # quarter-turn runs first, on the unpadded float canvas: it commutes
        # with the (elementwise) conversion and the (symmetric) padding, so
        # the result stays bit-identical to the jnp path below
        # (ops/pallas/shear.py, tests/test_pallas_shear.py).
        from dahpe_tpu.ops.pallas.shear import rotate3_fused_pallas

        return rotate3_fused_pallas(
            quarter_turn(image), a, b, pad=pad, kmax_a=kmax_a, kmax_b=kmax_b
        )
    image = jnp.clip(jnp.round(image * 256.0), 0.0, 65535.0).astype(jnp.uint16)
    image = jnp.pad(image, ((0, 0), (pad, pad), (pad, pad)))
    image = quarter_turn(image)
    image = _shear_x(image, a, kmax_a)
    image = _shear_y(image, b, kmax_b)
    image = _shear_x(image, a, kmax_a)
    image = image[:, pad : pad + h, pad : pad + w]
    return image.astype(jnp.float32) * (1.0 / 256.0)


def _interp_matrix(n_out: int, n_in: int, scale, offset) -> jnp.ndarray:
    """Bilinear 1-D interpolation matrix ``W[j, x] = hat(u(j) - x)`` with
    ``u(j) = scale * (j + 0.5) + offset - 0.5`` — the same 2-tap weights the
    point-sampled gather uses, with out-of-range taps dropping to zero
    exactly like its validity mask."""
    j = jnp.arange(n_out, dtype=jnp.float32)
    u = scale * (j + 0.5) + offset - 0.5
    x = jnp.arange(n_in, dtype=jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(u[:, None] - x[None, :]))


def _crop_resize_matmul(image, side, crop_off, out_size: int) -> jnp.ndarray:
    """Axis-aligned crop + resize of a ``(C, H, W)`` canvas as two
    interpolation-matrix matmuls (MXU); returns ``(out, out, C)``."""
    c, h, w = image.shape
    s = side / out_size
    wy = _interp_matrix(out_size, h, s, crop_off[1])
    wx = _interp_matrix(out_size, w, s, crop_off[0])
    t = jnp.einsum("iy,cyx->cix", wy, image)
    return jnp.einsum("jx,cix->ijc", wx, t)


def _warp_one(image, keypoint2d, intrinsic, key, *, out_size, rotation,
              scale_range, method: str = "matmul"):
    h, w, _ = image.shape
    mat, off, angle, side, crop_off, factor = _affine_params(
        key, h, w, out_size, rotation, scale_range
    )
    if method in ("matmul", "pallas"):
        # rotate the source once (three shears, dense ops only), then the
        # crop-resize is separable → two MXU matmuls. "pallas" runs each
        # shear as one VMEM-resident kernel (bit-identical); the gather path
        # below computes the same map in one resample and is kept as the
        # numerical oracle and for non-square inputs.
        rotated = _rotate_shears(image, angle, use_pallas=method == "pallas")
        out = _crop_resize_matmul(rotated, side, crop_off, out_size)
    else:
        ys = jnp.arange(out_size, dtype=jnp.float32) + 0.5
        xs = jnp.arange(out_size, dtype=jnp.float32) + 0.5
        grid = jnp.stack(
            jnp.meshgrid(xs, ys, indexing="xy"), axis=-1
        )  # (out, out, 2) as (x, y)
        src = grid @ mat.T + off - 0.5
        out = _bilinear_sample(image, src)

    # keypoints follow the reference algebra: rotate by -angle around the
    # center, subtract the crop offset, scale by out/side
    rad = -jnp.deg2rad(angle)
    rot_kp = jnp.array(
        [[jnp.cos(rad), -jnp.sin(rad)], [jnp.sin(rad), jnp.cos(rad)]]
    )
    center = jnp.array([w / 2.0, h / 2.0])
    kp = (keypoint2d - center) @ rot_kp.T + center
    kp = (kp - crop_off) * factor

    intr = intrinsic.at[0, 0].mul(factor).at[1, 1].mul(factor)
    intr = intr.at[0, 2].mul(factor).at[1, 2].mul(factor)
    return out, kp, intr


def _color_jitter(image, key, strength=0.25):
    """Brightness/contrast/saturation in random order, torchvision factors.

    image: (H, W, C) in [0, 255] float.
    """
    keys = jax.random.split(key, 4)
    factors = jax.random.uniform(
        keys[0], (3,), minval=1.0 - strength, maxval=1.0 + strength
    )
    order = jax.random.permutation(keys[1], 3)

    def brightness(img, f):
        return jnp.clip(img * f, 0, 255)

    def contrast(img, f):
        gray = (
            0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]
        ).mean()
        return jnp.clip(img * f + gray * (1 - f), 0, 255)

    def saturation(img, f):
        gray = (
            0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]
        )[..., None]
        return jnp.clip(img * f + gray * (1 - f), 0, 255)

    def apply(i, img):
        op = order[i]
        f = factors[op]
        return jax.lax.switch(
            op,
            [brightness, contrast, saturation],
            img,
            f,
        )

    return jax.lax.fori_loop(0, 3, apply, image)


def _blur_band(n_out, k, r):
    """(n_out, n_out + 2r) banded matrix applying the 2r+1-tap kernel k."""
    d = jnp.arange(n_out + 2 * r)[None, :] - jnp.arange(n_out)[:, None]
    return jnp.where((d >= 0) & (d <= 2 * r), k[jnp.clip(d, 0, 2 * r)], 0.0)


def _gaussian_blur(image, key, low=0.0, high=0.8, kernel_radius=2):
    """PIL-style Gaussian blur with a random radius.

    A fixed 5-tap separable kernel whose sigma is the sampled radius (PIL
    treats 'radius' as the standard deviation); radius ~ U(0, 0.8) so 2
    pixels of support suffice. Applied as two banded matmuls rather than
    C=3 depthwise convs: XLA:TPU maps a 3-channel depthwise conv onto the
    MXU at ~1% utilization, while the (H, H+2r) band matrices ride it at
    full tile width (r5 producer audit, docs/PERF.md).
    """
    radius = jax.random.uniform(key, (), minval=low, maxval=high)
    sigma = jnp.maximum(radius, 1e-3)
    offs = jnp.arange(-kernel_radius, kernel_radius + 1, dtype=jnp.float32)
    k = jnp.exp(-(offs**2) / (2 * sigma**2))
    # radius ~ 0 -> identity kernel
    k = jnp.where(radius < 1e-2, (offs == 0).astype(jnp.float32), k)
    k = k / k.sum()
    r = kernel_radius
    h, w, _ = image.shape
    img = jnp.pad(image, ((r, r), (r, r), (0, 0)), mode="edge")
    out = jnp.einsum("yh,hwc->ywc", _blur_band(h, k, r), img)
    return jnp.einsum("xw,ywc->yxc", _blur_band(w, k, r), out)


@partial(
    jax.jit,
    static_argnames=(
        "out_size", "rotation", "scale_range", "jitter", "blur", "warp"
    ),
)
def augment_batch(
    images: jnp.ndarray,
    keypoints: jnp.ndarray,
    intrinsics: jnp.ndarray,
    key,
    *,
    out_size: int = 256,
    rotation: float = 180.0,
    scale_range: tuple[float, float] = (0.6, 1.3),
    jitter: float = 0.25,
    blur: bool = True,
    warp: str = "matmul",
):
    """Fused train-time augmentation for a batch of same-sized crops.

    Args:
      images: (B, H, W, 3) in [0, 255] — uint8 straight from the host
        loader (preferred: 4x less H2D traffic, cast happens on device) or
        float32.
      keypoints: (B, K, 2); intrinsics: (B, 3, 3).
      warp: "matmul" (three-shear rotation + interpolation-matrix resize —
        the TPU fast path), "pallas" (same map, each shear one VMEM-resident
        kernel — bit-identical to "matmul"), or "gather" (single-pass
        per-pixel bilinear gather — the numerical oracle; required for
        non-square inputs).
    Returns: normalized images (B, out, out, 3), keypoints, intrinsics.
    """
    b = images.shape[0]
    keys = jax.random.split(key, (b, 3))
    if warp in ("matmul", "pallas") and images.shape[1] != images.shape[2]:
        warp = "gather"
    if not (warp == "pallas" and images.dtype == jnp.uint8):
        # the pallas warp ingests the loader's uint8 directly (fixed-point
        # conversion happens inside the kernel — bit-identical, and skips
        # the 4x-bytes float-cast HBM pass); every other path needs float
        images = images.astype(jnp.float32)

    def one(img, kp, intr, ks):
        img, kp, intr = _warp_one(
            img, kp, intr, ks[0], out_size=out_size, rotation=rotation,
            scale_range=scale_range, method=warp,
        )
        if jitter:
            img = _color_jitter(img, ks[1], jitter)
        if blur:
            img = _gaussian_blur(img, ks[2])
        img = (img / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
        return img, kp, intr

    return jax.vmap(one)(images, keypoints, intrinsics, keys)


@partial(jax.jit, static_argnames=("out_size",))
def resize_batch(images, keypoints, intrinsics, *, out_size: int = 256):
    """Fused eval-time square resize + normalize (the val transform)."""
    b, h, w, c = images.shape
    out = jax.image.resize(images, (b, out_size, out_size, c), method="linear")
    factor = out_size / w
    out = (out / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
    kp = keypoints * factor
    intr = intrinsics.at[:, 0, 0].mul(factor).at[:, 1, 1].mul(factor)
    intr = intr.at[:, 0, 2].mul(factor).at[:, 1, 2].mul(factor)
    return out, kp, intr
