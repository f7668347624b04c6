"""Data-layer tests: parser parity vs the reference on synthetic fixtures,
transform co-updates, loader + on-device batch finalization."""

import json
import os
import pickle

import numpy as np
import pytest
from PIL import Image

from dahpe_tpu.data import (
    BatchLoader,
    ForeverIterator,
    Hand3DStudio,
    RenderedHandPose,
    STB,
    finalize_batch,
    get_dataset,
)
from dahpe_tpu.data import transforms as T
from tests.conftest import add_reference_to_path, reference_available

requires_reference = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not present"
)


# ------------------------------------------------------------------ fixtures

def _make_rhd_fixture(root, n=8, seed=0):
    rng = np.random.default_rng(seed)
    set_dir = os.path.join(root, "RHD_published_v2", "training")
    os.makedirs(os.path.join(set_dir, "color"), exist_ok=True)
    anno = {}
    for i in range(n):
        # two hands; put them in disjoint regions so some samples pass filters
        base_l = rng.uniform(30, 100, size=2)
        base_r = rng.uniform(180, 250, size=2)
        kp = np.concatenate(
            [
                base_l + rng.uniform(0, 80, size=(21, 2)),
                base_r + rng.uniform(0, 60, size=(21, 2)),
            ]
        )
        vis = (rng.uniform(size=42) > 0.1).astype(np.float64)
        anno[i] = {
            "uv_vis": np.concatenate([kp, vis[:, None]], axis=1),
            "xyz": rng.uniform(-0.1, 0.4, size=(42, 3)),
            "K": np.asarray([[283.0, 0, 160.0], [0, 283.0, 160.0], [0, 0, 1.0]]),
        }
        img = rng.integers(0, 255, size=(320, 320, 3), dtype=np.uint8)
        Image.fromarray(img).save(os.path.join(set_dir, "color", "%.5d.png" % i))
    with open(os.path.join(set_dir, "anno_training.pickle"), "wb") as f:
        pickle.dump(anno, f)
    return root


def _make_h3d_fixture(root, n=30, seed=1):
    rng = np.random.default_rng(seed)
    d = os.path.join(root, "H3D_crop", "part1")
    os.makedirs(d, exist_ok=True)
    samples = []
    for i in range(n):
        name = f"part1/img_{i}.png"
        img = rng.integers(0, 255, size=(240, 240, 3), dtype=np.uint8)
        Image.fromarray(img).save(os.path.join(root, "H3D_crop", name))
        kp3 = rng.uniform(0.2, 0.6, size=(21, 3))
        K = [[240.0, 0, 120.0], [0, 240.0, 120.0], [0, 0, 1.0]]
        kp2 = (np.asarray(K) @ kp3.T).T
        kp2 = kp2[:, :2] / kp2[:, 2:3]
        samples.append(
            {
                "name": name,
                "keypoint2d": kp2.tolist(),
                "keypoint3d": kp3.tolist(),
                "intrinsic_matrix": K,
                "without_object": 1 if i % 3 else 0,
            }
        )
    with open(os.path.join(root, "H3D_crop", "annotation.json"), "w") as f:
        json.dump(samples, f)
    return root


def _make_stb_fixture(root, n=5, seed=2):
    rng = np.random.default_rng(seed)
    for seq in ["B1Counting", "B1Random"]:
        os.makedirs(os.path.join(root, "STB", seq), exist_ok=True)
        for i in range(n):
            img = rng.integers(0, 255, size=(480, 640, 3), dtype=np.uint8)
            Image.fromarray(img).save(
                os.path.join(root, "STB", seq, f"SK_color_{i}.png")
            )
    os.makedirs(os.path.join(root, "STB", "labels"), exist_ok=True)
    import scipy.io as sio

    for seq in ["B1Counting", "B1Random"]:
        # plausible depth-frame mm coordinates in front of the camera
        base = rng.uniform([-50, -50, 450], [50, 50, 650], size=(n, 1, 3))
        hand = base + rng.uniform(-40, 40, size=(n, 21, 3))
        sio.savemat(
            os.path.join(root, "STB", "labels", f"{seq}_SK.mat"),
            {"handPara": hand.transpose(2, 1, 0)},
        )
    return root


# -------------------------------------------------------------------- tests

@requires_reference
def test_rhd_sample_list_matches_reference(tmp_path):
    add_reference_to_path()
    root = _make_rhd_fixture(str(tmp_path))
    from uda.dataset.rendered_hand_pose import RenderedHandPose as RefRHD

    ref_samples = RefRHD.get_samples(
        None, os.path.join(root, "RHD_published_v2"), "train"
    )
    ours = RenderedHandPose.get_samples(
        os.path.join(root, "RHD_published_v2"), "train"
    )
    assert len(ours) == len(ref_samples) > 0
    for a, b in zip(ours, ref_samples):
        assert a["name"] == b["name"]
        assert a["left"] == b["left"]
        np.testing.assert_allclose(a["keypoint2d"], b["keypoint2d"])
        np.testing.assert_allclose(a["visible"], b["visible"])


@requires_reference
def test_stb_sample_list_matches_reference(tmp_path):
    add_reference_to_path()
    root = _make_stb_fixture(str(tmp_path))
    from uda.dataset.STB import STB as RefSTB

    ref_samples = RefSTB.get_samples(
        RefSTB.__new__(RefSTB), os.path.join(root, "STB"), ["B1Counting", "B1Random"]
    )
    ours = STB.get_samples(os.path.join(root, "STB"), ["B1Counting", "B1Random"])
    assert len(ours) == len(ref_samples) > 0
    for a, b in zip(ours, ref_samples):
        assert a["name"] == b["name"]
        np.testing.assert_allclose(a["keypoint2d"], b["keypoint2d"], rtol=1e-10)
        np.testing.assert_allclose(a["keypoint3d"], b["keypoint3d"], rtol=1e-10)


def test_h3d_split_is_deterministic_and_disjoint(tmp_path):
    root = _make_h3d_fixture(str(tmp_path))
    tr = Hand3DStudio(root, split="train", transforms=T.val_transform())
    te = Hand3DStudio(root, split="test", transforms=T.val_transform())
    names_tr = {s["name"] for s in tr.samples}
    names_te = {s["name"] for s in te.samples}
    assert names_tr.isdisjoint(names_te)
    assert len(names_te) == min(int((len(names_tr) + len(names_te)) * 0.2), 3200)
    # task filter removed the without_object == 0 third
    te2 = Hand3DStudio(root, split="test", transforms=T.val_transform())
    assert [s["name"] for s in te.samples] == [s["name"] for s in te2.samples]


def test_val_transform_keeps_keypoints_consistent(tmp_path):
    root = _make_h3d_fixture(str(tmp_path))
    ds = Hand3DStudio(root, split="test", transforms=T.val_transform(256))
    rng = np.random.default_rng(0)
    item = ds.fetch(0, rng)
    assert item["image"].shape == (256, 256, 3)
    # keypoints were scaled by 256/240
    orig = np.asarray(ds.samples[0]["keypoint2d"])
    np.testing.assert_allclose(item["keypoint2d"], orig * (256 / 240), rtol=1e-5)


def test_train_transform_pipeline_runs(tmp_path):
    root = _make_rhd_fixture(str(tmp_path))
    ds = RenderedHandPose(root, split="train", transforms=T.train_transform())
    rng = np.random.default_rng(3)
    item = ds.fetch(0, rng)
    assert item["image"].shape == (256, 256, 3)
    assert item["keypoint2d"].shape == (21, 2)
    assert np.isfinite(item["image"]).all()


def test_loader_and_finalize_batch(tmp_path):
    root = _make_rhd_fixture(str(tmp_path))
    ds = RenderedHandPose(root, split="train", transforms=T.val_transform())
    loader = BatchLoader(ds, batch_size=4, num_workers=2, seed=0)
    it = ForeverIterator(lambda: iter(loader))
    batch = next(it)
    assert batch["image"].shape == (4, 256, 256, 3)
    final = finalize_batch(batch)
    assert final["target"].shape == (4, 64, 64, 21)
    assert final["weight"].shape == (4, 21)
    # weights respect visibility
    assert float(final["weight"].max()) <= 1.0
    # iterating "forever" crosses epoch boundaries without StopIteration
    for _ in range(len(loader) + 2):
        next(it)


def test_registry():
    with pytest.raises(ValueError):
        get_dataset("NoSuchDataset")


def test_raw_loader_and_device_train_batch(tmp_path):
    import jax

    from dahpe_tpu.data.pipeline import device_train_batch

    root = _make_rhd_fixture(str(tmp_path))
    ds = RenderedHandPose(root, split="train", transforms=None)
    loader = BatchLoader(ds, batch_size=4, num_workers=2, seed=0, raw=True,
                         raw_size=160)
    batch = next(iter(loader))
    assert batch["image_u8"].shape == (4, 160, 160, 3)
    assert batch["image_u8"].dtype == np.uint8
    final = device_train_batch(
        batch, jax.random.key(0), image_size=128, heatmap_size=32
    )
    assert final["image"].shape == (4, 128, 128, 3)
    assert final["target"].shape == (4, 32, 32, 21)
    assert np.isfinite(np.asarray(final["image"])).all()


def test_host_sharded_loader_disjoint(tmp_path):
    root = _make_rhd_fixture(str(tmp_path))
    ds = RenderedHandPose(root, split="train", transforms=T.val_transform())
    loaders = [
        BatchLoader(ds, batch_size=2, num_workers=1, seed=7,
                    host_index=i, host_count=2, drop_last=False)
        for i in range(2)
    ]
    seen = []
    for ld in loaders:
        idxs = [tuple(b) for b in ld._index_batches()]
        ld._epoch += 1
        seen.append({i for b in idxs for i in b})
    assert seen[0].isdisjoint(seen[1])
    assert len(seen[0] | seen[1]) == len(ds)


def test_warped_loader_host_cpp_path(tmp_path):
    """Host C++ fused-warp path: fixed-size normalized output, keypoints
    track the warp (bright-dot test), plugs into finalize_batch."""
    root = _make_rhd_fixture(str(tmp_path))
    ds = RenderedHandPose(root, split="train", transforms=None)
    loader = BatchLoader(ds, batch_size=4, num_workers=2, seed=0,
                         warped=True, image_size=128)
    batch = next(iter(loader))
    assert batch["image"].shape == (4, 128, 128, 3)
    assert np.isfinite(batch["image"]).all()
    final = finalize_batch(batch, heatmap_size=(32, 32), image_size=(128, 128))
    assert final["target"].shape == (4, 32, 32, 21)


def test_host_warp_keypoints_track_pixels():
    from dahpe_tpu.data.host_warp import warp_augment
    from dahpe_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD

    rng = np.random.default_rng(4)
    img = np.zeros((96, 96, 3), np.uint8)
    kp = np.asarray([[48.0, 32.0]], np.float32)
    img[30:35, 46:51] = 255
    out, kp2, _ = warp_augment(
        img, kp, np.eye(3, dtype=np.float32), rng,
        out_size=64, rotation=45.0, scale_range=(0.8, 1.0),
        jitter=0.0, blur=0.0,
    )
    un = out * IMAGENET_STD + IMAGENET_MEAN
    py, px = np.unravel_index(np.argmax(un.sum(-1)), un.shape[:2])
    if 0 <= kp2[0, 0] < 64 and 0 <= kp2[0, 1] < 64:
        assert abs(px - kp2[0, 0]) <= 2.5 and abs(py - kp2[0, 1]) <= 2.5
