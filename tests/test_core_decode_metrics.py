"""Golden tests: decode + PCK metric vs reference numpy implementations."""

import numpy as np
import pytest

import jax.numpy as jnp

from dahpe_tpu.core import decode, metrics
from dahpe_tpu.core.layout import from_bkhw
from tests.conftest import add_reference_to_path, reference_available

requires_reference = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not present"
)


def _rand_heatmaps(rng, b=6, k=21, h=64, w=64, peaky=True):
    y = rng.standard_normal((b, k, h, w)).astype(np.float32)
    if peaky:
        px = rng.integers(0, w, size=(b, k))
        py = rng.integers(0, h, size=(b, k))
        y[np.arange(b)[:, None], np.arange(k)[None, :], py, px] += 10.0
    return y


@requires_reference
def test_get_max_preds_matches_reference():
    add_reference_to_path()
    from utils.keypoint_detection import get_max_preds as ref_gmp

    rng = np.random.default_rng(0)
    y = _rand_heatmaps(rng)
    # include an all-negative map to exercise the <=0 mask
    y[0, 0] = -np.abs(y[0, 0]) - 1.0
    ref_preds, ref_max = ref_gmp(y)
    preds, maxvals = decode.get_max_preds(from_bkhw(jnp.asarray(y)))
    np.testing.assert_allclose(np.asarray(preds), ref_preds, atol=0)
    np.testing.assert_allclose(np.asarray(maxvals), ref_max, rtol=1e-6)


@requires_reference
def test_pck_accuracy_matches_reference():
    add_reference_to_path()
    from utils.keypoint_detection import accuracy as ref_accuracy

    rng = np.random.default_rng(1)
    out = _rand_heatmaps(rng)
    tgt = _rand_heatmaps(rng)
    # some target joints at the origin-ish so the "coords > 1" filter triggers
    tgt[1, 3] = 0.0
    ref_acc, ref_avg, ref_cnt, ref_pred = ref_accuracy(out, tgt)
    acc, avg, cnt, pred = metrics.pck_accuracy(
        from_bkhw(jnp.asarray(out)), from_bkhw(jnp.asarray(tgt))
    )
    np.testing.assert_allclose(np.asarray(acc), ref_acc, rtol=1e-6)
    assert float(avg) == pytest.approx(ref_avg, rel=1e-6)
    assert int(cnt) == ref_cnt
    np.testing.assert_allclose(np.asarray(pred), ref_pred, atol=0)


@requires_reference
def test_soft_argmax_matches_reference():
    add_reference_to_path()
    import torch
    from utils.keypoint_detection import compute_uv_from_heatmaps3

    rng = np.random.default_rng(2)
    y = _rand_heatmaps(rng, b=2, k=4, h=64, w=64)
    ref = compute_uv_from_heatmaps3(torch.from_numpy(y)).numpy()
    ours = decode.soft_argmax_decode(from_bkhw(jnp.asarray(y)))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-4)


@requires_reference
def test_upsample_bilinear_matches_torch():
    import torch

    rng = np.random.default_rng(3)
    y = rng.standard_normal((2, 5, 16, 16)).astype(np.float32)
    ref = (
        torch.nn.functional.interpolate(
            torch.from_numpy(y), size=64, mode="bilinear", align_corners=False
        )
        .numpy()
    )
    ours = decode.upsample_bilinear(from_bkhw(jnp.asarray(y)), (64, 64))
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(ours), -1, 1), ref, rtol=1e-4, atol=1e-5
    )


def test_group_accuracy_skips_invalid():
    acc = jnp.asarray([0.5, -1.0, 1.0, 0.0])
    groups = {"a": [0, 1], "b": [2, 3], "empty": [1]}
    out = metrics.group_accuracy(acc, groups)
    assert float(out["a"]) == pytest.approx(0.5)
    assert float(out["b"]) == pytest.approx(0.5)
    assert float(out["empty"]) == -1.0
