"""Synthetic on-disk dataset fixtures in the reference's file formats."""

from __future__ import annotations

import json
import os
import pickle

import numpy as np
from PIL import Image


def make_rhd_fixture(root, n=8, seed=0, sets=("training",)):
    rng = np.random.default_rng(seed)
    for set_name in sets:
        set_dir = os.path.join(root, "RHD_published_v2", set_name)
        os.makedirs(os.path.join(set_dir, "color"), exist_ok=True)
        anno = {}
        for i in range(n):
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
                "xyz": rng.uniform(0.1, 0.5, size=(42, 3)),
                "K": np.asarray([[283.0, 0, 160.0], [0, 283.0, 160.0], [0, 0, 1.0]]),
            }
            img = rng.integers(0, 255, size=(320, 320, 3), dtype=np.uint8)
            Image.fromarray(img).save(
                os.path.join(set_dir, "color", "%.5d.png" % i)
            )
        with open(
            os.path.join(set_dir, f"anno_{set_name}.pickle"), "wb"
        ) as f:
            pickle.dump(anno, f)
    return root


def make_h3d_fixture(root, n=30, seed=1):
    rng = np.random.default_rng(seed)
    d = os.path.join(root, "H3D_crop", "part1")
    os.makedirs(d, exist_ok=True)
    samples = []
    for i in range(n):
        name = f"part1/img_{i}.png"
        img = rng.integers(0, 255, size=(240, 240, 3), dtype=np.uint8)
        Image.fromarray(img).save(os.path.join(root, "H3D_crop", name))
        # keypoints INSIDE the pre-cropped frame (like the real dataset):
        # sample pixel coords, back-project to a consistent 3D point
        K = [[240.0, 0, 120.0], [0, 240.0, 120.0], [0, 0, 1.0]]
        kp2 = rng.uniform(30.0, 210.0, size=(21, 2))
        z = rng.uniform(0.3, 0.6, size=(21, 1))
        kp3 = np.concatenate(
            [(kp2 - 120.0) * z / 240.0, z], axis=1
        )
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


def make_stb_fixture(root, n=5, seed=2, sequences=("B1Counting", "B1Random")):
    rng = np.random.default_rng(seed)
    import scipy.io as sio

    for seq in sequences:
        os.makedirs(os.path.join(root, "STB", seq), exist_ok=True)
        for i in range(n):
            img = rng.integers(0, 255, size=(480, 640, 3), dtype=np.uint8)
            Image.fromarray(img).save(
                os.path.join(root, "STB", seq, f"SK_color_{i}.png")
            )
    os.makedirs(os.path.join(root, "STB", "labels"), exist_ok=True)
    for seq in sequences:
        base = rng.uniform([-50, -50, 450], [50, 50, 650], size=(n, 1, 3))
        hand = base + rng.uniform(-40, 40, size=(n, 21, 3))
        sio.savemat(
            os.path.join(root, "STB", "labels", f"{seq}_SK.mat"),
            {"handPara": hand.transpose(2, 1, 0)},
        )
    return root
