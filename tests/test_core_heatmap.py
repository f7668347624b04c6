"""Golden tests: on-device heatmap/pseudo-label ops vs the reference's
numpy/torch implementations (imported read-only from /root/reference)."""

import numpy as np
import pytest

import jax.numpy as jnp

from dahpe_tpu.core import heatmap as hm
from dahpe_tpu.core.layout import from_bkhw, to_bkhw
from tests.conftest import add_reference_to_path, reference_available

requires_reference = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not present"
)


def _rand_heatmaps(rng, b=4, k=21, h=64, w=64):
    """Random heatmaps with sharp peaks so argmax is unambiguous."""
    y = rng.standard_normal((b, k, h, w)).astype(np.float32)
    px = rng.integers(0, w, size=(b, k))
    py = rng.integers(0, h, size=(b, k))
    y[np.arange(b)[:, None], np.arange(k)[None, :], py, px] += 10.0
    return y


@requires_reference
def test_generate_target_matches_reference():
    add_reference_to_path()
    from uda.dataset.util import generate_target as ref_generate_target

    rng = np.random.default_rng(0)
    k = 21
    # include out-of-bounds and invisible joints
    kps = rng.uniform(-30, 290, size=(k, 2)).astype(np.float32)
    vis = (rng.uniform(size=(k, 1)) > 0.2).astype(np.float32)
    ref_t, ref_w = ref_generate_target(kps, vis, (64, 64), 2, (256, 256))

    t, w = hm.generate_target(
        jnp.asarray(kps), jnp.asarray(vis[:, 0]), (64, 64), (256, 256), sigma=2.0
    )
    # ours is (H, W, K); reference is (K, H, W)
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(t), -1, 0), ref_t, rtol=1e-5, atol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(w), ref_w[:, 0])


@requires_reference
@pytest.mark.parametrize(
    "plg_name,scale,size",
    [("PseudoLabelGenerator", 1, 64),
     ("PseudoLabelGenerator03", 2, 32),
     ("PseudoLabelGenerator01", 4, 16)],
)
def test_pseudo_label_gt_matches_reference(plg_name, scale, size):
    add_reference_to_path()
    import torch

    if plg_name == "PseudoLabelGenerator":
        from uda.model.regda_4 import PseudoLabelGenerator as PLG
        window_factor = 3.0
    else:
        import uda.model.regda_7 as regda_7

        PLG = getattr(regda_7, plg_name)
        window_factor = {32: 2.0, 16: 1.5}[size]

    rng = np.random.default_rng(1)
    y = _rand_heatmaps(rng)
    # numpy>=2 removed np.int which the reference uses; alias for the import
    if not hasattr(np, "int"):
        np.int = int  # noqa: NPY001
    plg = PLG(21) if plg_name == "PseudoLabelGenerator" else PLG(21)
    gt_ref, gf_ref = plg(torch.from_numpy(y))

    gt = hm.pseudo_label_gt(
        from_bkhw(jnp.asarray(y)), scale=scale, window_factor=window_factor
    )
    np.testing.assert_allclose(
        np.asarray(to_bkhw(gt)), gt_ref.numpy(), rtol=1e-5, atol=1e-6
    )

    if plg_name == "PseudoLabelGenerator":
        gf = hm.gf_union_others(gt)
    else:
        gf = hm.gf_inverse(gt)
    np.testing.assert_allclose(
        np.asarray(to_bkhw(gf)), gf_ref.numpy(), rtol=1e-5, atol=1e-6
    )


def test_render_gaussian_window_and_peak():
    mu = jnp.asarray([[[10, 20]]])  # (1, 1, 2) -> (x=10, y=20)
    g = hm.render_gaussian(mu, 64, 64, sigma=2.0, reach=6)
    g = np.asarray(g)[0, :, :, 0]
    assert g[20, 10] == pytest.approx(1.0)
    assert g[20, 16] > 0  # inside window (dx=6)
    assert g[20, 17] == 0  # outside window (dx=7)
    assert g[26, 10] > 0 and g[27, 10] == 0


def test_gf_union_minus_formula():
    rng = np.random.default_rng(2)
    y = _rand_heatmaps(rng, b=2, k=5)
    gt = hm.pseudo_label_gt(from_bkhw(jnp.asarray(y)))
    gf = np.asarray(hm.gf_union_minus(gt))
    total = np.clip(np.asarray(gt).sum(-1, keepdims=True), 0, 1)
    expect = np.clip(total - 10 * np.asarray(gt), 0, 1)
    np.testing.assert_allclose(gf, expect, atol=1e-6)


def test_fuse_and_normalize_gf_max_is_one():
    rng = np.random.default_rng(3)
    # x5 consumes the 64x64 main heatmap and emits 32x32 pseudo-labels
    y = _rand_heatmaps(rng, b=2, k=5, h=64, w=64)
    gt = hm.pseudo_label_gt(from_bkhw(jnp.asarray(y)), scale=2, window_factor=2.0)
    fused = jnp.asarray(rng.uniform(0, 1, size=(2, 32, 32, 5)).astype(np.float32))
    gf = hm.fuse_and_normalize_gf(hm.gf_inverse(gt), gt, fused)
    m = np.asarray(gf).max(axis=(1, 2))
    np.testing.assert_allclose(m, np.ones_like(m), atol=1e-6)
