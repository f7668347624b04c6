"""Pre-decoded crop cache (``data/cache.py``): exactness + reuse + loader fit.

The cache must be invisible to training: ``fetch_raw`` through the cache is
bit-identical to the live decode path, ``fetch_warped`` consumes the same
rng stream, and a ``BatchLoader`` over the cache yields the exact batches a
loader over the live dataset yields.
"""

import numpy as np
import pytest

from tests.fixtures import make_rhd_fixture

from dahpe_tpu.data import BatchLoader, DecodedCache, RenderedHandPose
from dahpe_tpu.data.cache import cache_is_valid


@pytest.fixture(scope="module")
def rhd(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("rhd"))
    make_rhd_fixture(root, n=10)
    return RenderedHandPose(root, split="train", transforms=None)


def test_fetch_raw_bit_identical(rhd, tmp_path):
    cache = DecodedCache(rhd, str(tmp_path / "c"), num_workers=2)
    rng = np.random.default_rng(0)
    for i in (0, 3, len(rhd) - 1):
        live = rhd.fetch_raw(i, rng, 288)
        cached = cache.fetch_raw(i, rng)
        for k in live:
            np.testing.assert_array_equal(
                np.asarray(live[k], np.float32),
                np.asarray(cached[k], np.float32),
                err_msg=k,
            )


def test_manifest_guards_reuse_and_staleness(rhd, tmp_path):
    d = str(tmp_path / "c")
    DecodedCache(rhd, d)
    assert cache_is_valid(rhd, d, 288)
    assert not cache_is_valid(rhd, d, 224)  # different raw_size -> rebuild
    with pytest.raises(FileNotFoundError):
        DecodedCache(rhd, d, raw_size=224, build=False)
    # raw_size mismatch at fetch time is an explicit error
    cache = DecodedCache(rhd, d, build=False)
    with pytest.raises(ValueError):
        cache.fetch_raw(0, np.random.default_rng(0), raw_size=224)
    # manifests written before the optional "extra" identity key existed
    # must stay valid — the exact-dict comparison would otherwise silently
    # re-decode every pre-existing cache
    import json
    from dahpe_tpu.data.cache import _identity
    assert "extra" not in _identity(rhd, 288)
    manifest = json.load(open(tmp_path / "c" / "manifest.json"))
    assert "extra" not in manifest
    assert cache_is_valid(rhd, d, 288)


def test_fetch_warped_consumes_same_rng_stream(rhd, tmp_path):
    """Warping from the cached crop must draw the same random numbers as the
    live path (determinism across cache on/off for the warp parameters)."""
    pytest.importorskip("dahpe_tpu.utils.native")
    from dahpe_tpu.utils import native

    if not native.available():
        pytest.skip("native library not built")
    cache = DecodedCache(rhd, str(tmp_path / "c"))
    a = cache.fetch_warped(1, np.random.default_rng(7), image_size=128)
    b = cache.fetch_warped(1, np.random.default_rng(7), image_size=128)
    np.testing.assert_array_equal(a["image"], b["image"])
    np.testing.assert_array_equal(a["keypoint2d"], b["keypoint2d"])
    assert a["image"].shape == (128, 128, 3)


def test_batchloader_over_cache_matches_live(rhd, tmp_path):
    cache = DecodedCache(rhd, str(tmp_path / "c"))
    mk = lambda ds: BatchLoader(  # noqa: E731
        ds, 4, shuffle=True, drop_last=True, num_workers=2, seed=5, raw=True
    )
    for live_b, cached_b in zip(mk(rhd), mk(cache)):
        assert set(live_b) == set(cached_b)
        for k in live_b:
            np.testing.assert_array_equal(live_b[k], cached_b[k], err_msg=k)


def test_metadata_delegation(rhd, tmp_path):
    cache = DecodedCache(rhd, str(tmp_path / "c"))
    assert len(cache) == len(rhd)
    assert cache.num_keypoints == 21
    assert cache.keypoints_group is rhd.keypoints_group
