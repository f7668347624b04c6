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

    # sample indices exactly as train_batch does, reproduced on host:
    # one replicated key, folded with the device's axis position
    per_dev = 4
    for dev in range(d):
        key = jax.random.fold_in(jax.random.key(3), dev)
        idx = np.asarray(jax.random.choice(key, local_n, (per_dev,), replace=False))
        shard_rows = kps[dev * local_n : (dev + 1) * local_n]
        for i in idx:
            assert i < local_n
            assert np.isfinite(shard_rows[i]).all()


def test_stream_batches_deterministic_and_device_resident(cache):
    """seed_stream + next_train_batch: the key advances on device (no host
    re-upload), successive batches differ, and reseeding reproduces the
    sequence bit-for-bit."""
    mesh = create_mesh()
    store = DeviceDataStore(cache, mesh=mesh, verbose=False)
    d = mesh.shape["data"]
    kw = dict(batch_size=2 * d, image_size=64, heatmap_size=16)

    store.seed_stream(jax.random.key(9))
    b1 = store.next_train_batch(**kw)
    b2 = store.next_train_batch(**kw)
    assert b1["image"].shape == (2 * d, 64, 64, 3)
    assert not np.array_equal(np.asarray(b1["image"]), np.asarray(b2["image"]))

    store.seed_stream(jax.random.key(9))
    r1 = store.next_train_batch(**kw)
    r2 = store.next_train_batch(**kw)
    np.testing.assert_array_equal(np.asarray(r1["image"]), np.asarray(b1["image"]))
    np.testing.assert_array_equal(np.asarray(r2["target"]), np.asarray(b2["target"]))

    with pytest.raises(ValueError):
        DeviceDataStore(cache, mesh=mesh, verbose=False).next_train_batch(**kw)


def test_batch_not_divisible_raises(cache):
    mesh = create_mesh()
    store = DeviceDataStore(cache, mesh=mesh, verbose=False)
    with pytest.raises(ValueError):
        store.train_batch(jax.random.key(0), batch_size=mesh.size + 1, image_size=64)


def test_nbytes_accounts_everything(cache):
    store = DeviceDataStore(cache, verbose=False)
    s = store.raw_size
    assert store.nbytes() >= store.n * s * s * 3


def test_eval_loader_matches_host_validation(cache, tmp_path):
    """validate() over the device eval loader must agree with validate()
    over the host PIL loader (same dataset, same model): the store's upload
    prefix IS the val transform's geometry (built at raw_size=image_size),
    and the on-device normalize/targets are the same math as the host's."""
    from dahpe_tpu import models
    from dahpe_tpu.data import BatchLoader, DecodedCache
    from dahpe_tpu.data.transforms import val_transform
    from dahpe_tpu.evaluate import make_eval_step, validate
    from dahpe_tpu.models.resnet import Bottleneck

    ds_raw = cache.dataset
    image_size, heatmap_size, batch = 64, 16, 4

    model = models.MultiHeadPoseResNet(
        backbone=models.ResNet(block=Bottleneck, layers=[1, 1, 1, 1]),
        num_keypoints=21,
    )
    x0 = jnp.zeros((batch, image_size, image_size, 3), jnp.float32)
    variables = model.init(jax.random.key(0), x0, train=False, gl_coeff=0.0)
    eval_step = make_eval_step(model)

    # host path: PIL transforms + BatchLoader (odd count -> padded trailer);
    # the dataset ctor appends RHD_published_v2 to the root it is given
    import os

    fixture_root = os.path.dirname(ds_raw.root)
    ds_host = type(ds_raw)(
        fixture_root, split="train", transforms=val_transform(image_size),
        image_size=(image_size,) * 2, heatmap_size=(heatmap_size,) * 2,
    )
    host_loader = BatchLoader(
        ds_host, batch, shuffle=False, drop_last=False, num_workers=1, seed=0
    )
    host_acc = validate(
        host_loader, model, variables, ds_host, image_size=image_size,
        heatmap_size=heatmap_size, print_freq=1000, eval_step=eval_step,
    )

    # device path: store at raw_size == image_size
    store_cache = DecodedCache(
        ds_raw, str(tmp_path / "c64"), raw_size=image_size
    )
    store = DeviceDataStore(
        store_cache, raw_size=image_size, verbose=False
    )
    dev_loader = store.eval_loader(batch, heatmap_size=heatmap_size)
    dev_acc = validate(
        dev_loader, model, variables, ds_raw, image_size=image_size,
        heatmap_size=heatmap_size, print_freq=1000, eval_step=eval_step,
    )

    assert set(host_acc) == set(dev_acc)
    for k in host_acc:
        np.testing.assert_allclose(dev_acc[k], host_acc[k], atol=1e-6, err_msg=k)


def test_multihost_rejects_multiaxis_mesh(cache, monkeypatch):
    """ADVICE r2 regression guard: the raveled-device-index → row-range
    assignment in the multi-host upload is only correct on a 1-D mesh; a
    multi-axis mesh must be rejected loudly (device_store.py 1-D-mesh guard),
    not silently shard rows onto replica axes."""
    from jax.sharding import Mesh

    devs = np.asarray(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devs, ("data", "model"))
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    with pytest.raises(ValueError, match="1-D mesh"):
        DeviceDataStore(cache, mesh=mesh, verbose=False)
    # replicated stores (shard_samples=False) are exempt: every device holds
    # every row, so the mesh shape is irrelevant — must NOT raise.
    monkeypatch.setattr(jax, "process_count", lambda: 1)
    DeviceDataStore(cache, mesh=mesh, shard_samples=False, verbose=False)
