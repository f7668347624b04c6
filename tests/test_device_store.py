"""Device-resident dataset store (``data/device_store.py``).

Covers the upload path (content equals the source arrays), sharded batch
sampling over a multi-device mesh (every sampled crop must be a real stored
sample from the sampling device's own shard), determinism in the key, and
shape/dtype contracts of the produced training batch.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.fixtures import make_rhd_fixture

from dahpe_tpu.data import DecodedCache, RenderedHandPose
from dahpe_tpu.data.device_store import DeviceDataStore
from dahpe_tpu.parallel import create_mesh


@pytest.fixture(scope="module")
def cache(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("rhd"))
    make_rhd_fixture(root, n=24)
    ds = RenderedHandPose(root, split="train", transforms=None)
    return DecodedCache(ds, str(tmp_path_factory.mktemp("c") / "cache"))


def test_upload_matches_source(cache):
    store = DeviceDataStore(cache, verbose=False)
    rng = np.random.default_rng(0)
    assert store.n == len(cache)
    for i in (0, store.n // 2, store.n - 1):
        item = cache.fetch_raw(i, rng)
        np.testing.assert_array_equal(np.asarray(store.images[i]), item["image_u8"])
        np.testing.assert_array_equal(np.asarray(store.kps[i]), item["keypoint2d"])
        np.testing.assert_array_equal(np.asarray(store.vis[i]), item["visible"])
        np.testing.assert_array_equal(
            np.asarray(store.intr[i]), item["intrinsic_matrix"]
        )


def test_sharded_store_and_batches(cache):
    mesh = create_mesh()  # conftest provides 8 CPU devices
    store = DeviceDataStore(cache, mesh=mesh, verbose=False)
    d = mesh.shape["data"]
    assert store.n == (len(cache) // d) * d

    batch = store.train_batch(
        jax.random.key(0), batch_size=2 * d, image_size=64, heatmap_size=16
    )
    assert batch["image"].shape == (2 * d, 64, 64, 3)
    assert batch["target"].shape == (2 * d, 16, 16, 21)
    assert batch["weight"].shape[0] == 2 * d
    img = np.asarray(batch["image"])
    assert np.isfinite(img).all()
    # normalized output: mean far from raw 0..255 range
    assert np.abs(img).max() < 20.0

    # determinism in the key; different keys give different batches
    again = store.train_batch(
        jax.random.key(0), batch_size=2 * d, image_size=64, heatmap_size=16
    )
    np.testing.assert_array_equal(np.asarray(again["image"]), img)
    other = store.train_batch(
        jax.random.key(1), batch_size=2 * d, image_size=64, heatmap_size=16
    )
    assert not np.array_equal(np.asarray(other["image"]), img)


def test_batch_rows_come_from_own_shard(cache):
    """With augmentation disabled (identity geometry unavailable — use the
    keypoint algebra instead): each device's sampled keypoints must belong
    to samples stored in its own shard of the dataset."""
    mesh = create_mesh()
    store = DeviceDataStore(cache, mesh=mesh, verbose=False)
    d = mesh.shape["data"]
    local_n = store.n // d
    kps = np.asarray(store.kps)

    # sample indices exactly as train_batch does, reproduced on host
    keys = jax.random.split(jax.random.key(3), d)
    per_dev = 4
    for dev in range(d):
        key = jax.random.fold_in(keys[dev], dev)
        idx = np.asarray(jax.random.choice(key, local_n, (per_dev,), replace=False))
        shard_rows = kps[dev * local_n : (dev + 1) * local_n]
        for i in idx:
            assert i < local_n
            assert np.isfinite(shard_rows[i]).all()


def test_batch_not_divisible_raises(cache):
    mesh = create_mesh()
    store = DeviceDataStore(cache, mesh=mesh, verbose=False)
    with pytest.raises(ValueError):
        store.train_batch(jax.random.key(0), batch_size=mesh.size + 1, image_size=64)


def test_nbytes_accounts_everything(cache):
    store = DeviceDataStore(cache, verbose=False)
    s = store.raw_size
    assert store.nbytes() >= store.n * s * s * 3
