"""Resume is a TRUE continuation (VERDICT r2 item 3).

The orbax state alone is state-complete but stream-incomplete: without the
``save_aux`` sidecar a resumed run replays the sampling/augmentation key
sequence from iteration 0 and resets the best-accuracy watermark. These
tests pin the fixed behavior:

- N iterations + save + restore + N iterations is BIT-IDENTICAL to 2N
  straight iterations on the fused device-store path (the production mode),
- the sidecar round-trips the key buffers and the best-acc watermark,
- the CLI resumes with the stream keys and does not rewind to epoch 0.

Reference anchor: ``train1.py:190-201`` saves/restores only model +
optimizers + epoch — the reference itself replays its data order on resume;
this is a deliberate behavior improvement, not a parity target.
"""

import os
import tempfile

import numpy as np
import pytest

import jax

from tests.fixtures import make_rhd_fixture

from dahpe_tpu import models
from dahpe_tpu.data import DecodedCache, RenderedHandPose
from dahpe_tpu.data.device_store import DeviceDataStore
from dahpe_tpu.models.resnet import Bottleneck
from dahpe_tpu.parallel import create_mesh, replicate
from dahpe_tpu.train import (
    create_da_state,
    make_fused_da_iteration,
    seed_key,
)
from dahpe_tpu.utils import checkpoint as ckpt

K = 21
IMG, HM = 64, 16


@pytest.fixture(scope="module")
def stores():
    mesh = create_mesh()
    out = []
    for seed in (0, 1):
        root = tempfile.mkdtemp(prefix=f"resume_rhd{seed}_")
        make_rhd_fixture(root, n=16, seed=seed)
        ds = RenderedHandPose(root, split="train", transforms=None)
        cache = DecodedCache(ds, root + "/_c")
        out.append(DeviceDataStore(cache, mesh=mesh, verbose=False))
    return mesh, out[0], out[1]


def tiny_model():
    backbone = models.ResNet(block=Bottleneck, layers=[1, 1, 1, 1])
    return models.MultiHeadPoseResNet(backbone=backbone, num_keypoints=K)


def _params_equal(a, b):
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_aux_sidecar_roundtrip(tmp_path):
    path = str(tmp_path / "ckpt")
    key = np.arange(4, dtype=np.uint32)
    ckpt.save_aux(path, best_acc=0.625, key_s=key, key_t=key + 10)
    aux = ckpt.load_aux(path)
    assert float(aux["best_acc"]) == 0.625
    np.testing.assert_array_equal(aux["key_s"], key)
    np.testing.assert_array_equal(aux["key_t"], key + 10)
    # None values are dropped, absent sidecars load as {}
    ckpt.save_aux(path + "2", best_acc=1.0, key_s=None, key_t=None)
    assert set(ckpt.load_aux(path + "2")) == {"best_acc"}
    assert ckpt.load_aux(str(tmp_path / "nope")) == {}
    # the write is atomic (no .tmp survivor) and a sidecar truncated by a
    # crash degrades to {} (step-folded key fallback) instead of crashing
    assert not (tmp_path / "ckpt_aux.npz.tmp").exists()
    (tmp_path / "ckpt_aux.npz").write_bytes(b"not a zipfile")
    assert ckpt.load_aux(path) == {}


@pytest.mark.slow
def test_fused_resume_is_bit_identical_to_straight_run(stores, tmp_path):
    """N iters + checkpoint + restore + N iters == 2N iters, on the fused
    single-dispatch device-store path (cli/train.py's production mode)."""
    mesh, src, tgt = stores
    b = 2 * mesh.shape["data"]
    model = tiny_model()
    fused = make_fused_da_iteration(
        model, mesh, src, tgt, b, compute_metrics=False,
        image_size=IMG, heatmap_size=HM,
    )

    def fresh_state():
        return replicate(
            create_da_state(model, jax.random.key(0), image_size=IMG,
                            batch_size=b),
            mesh,
        )

    # straight run: 4 iterations
    state_a = fresh_state()
    ks, kt = seed_key(mesh, jax.random.key(3)), seed_key(mesh, jax.random.key(4))
    for _ in range(4):
        state_a, _, ks, kt = fused(state_a, ks, kt)

    # interrupted run: 2 iterations, checkpoint (state + aux sidecar)
    state_b = fresh_state()
    ks, kt = seed_key(mesh, jax.random.key(3)), seed_key(mesh, jax.random.key(4))
    for _ in range(2):
        state_b, _, ks, kt = fused(state_b, ks, kt)
    path = str(tmp_path / "mid")
    ckpt.save_state(path, state_b)
    ckpt.save_aux(path, best_acc=0.125, key_s=ks, key_t=kt)

    # restore exactly as cli/train.py does, then run the remaining 2
    template = create_da_state(model, jax.random.key(0), image_size=IMG,
                               batch_size=b)
    state_c = replicate(ckpt.restore_state(path, template), mesh)
    aux = ckpt.load_aux(path)
    ks = replicate(np.asarray(aux["key_s"], np.uint32), mesh)
    kt = replicate(np.asarray(aux["key_t"], np.uint32), mesh)
    for _ in range(2):
        state_c, _, ks, kt = fused(state_c, ks, kt)

    assert int(state_c.step) == int(state_a.step) == 4
    _params_equal(state_a.params, state_c.params)
    _params_equal(state_a.batch_stats, state_c.batch_stats)
    _params_equal(state_a.opt, state_c.opt)


@pytest.mark.slow
def test_cli_resume_continues_epoch_and_watermark(tmp_path):
    """CLI-level: --resume on the fused device-store path starts at the next
    epoch, reads the stream-key sidecar, and seeds best_acc from the saved
    watermark instead of -inf (cli/train.py:234-242,424)."""
    from tests.fixtures import make_h3d_fixture

    rhd_root = make_rhd_fixture(str(tmp_path / "rhd"), n=6,
                                sets=("training", "evaluation"))
    h3d_root = make_h3d_fixture(str(tmp_path / "h3d"), n=20)
    log_dir = str(tmp_path / "logs")

    from dahpe_tpu.cli import train as train_cli
    from dahpe_tpu.cli.args import build_parser

    base = [
        h3d_root, "--source_root", rhd_root, "-t", "Hand3DStudio",
        "-a", "resnet18", "-b", "2", "--pretrain-epochs", "0", "-i", "2",
        "--workers", "2", "--log", log_dir, "--print-freq", "1",
        "--image-size", "64", "--heatmap-size", "16",
        "--device-store", "--decoded-cache", str(tmp_path / "cache"),
    ]
    train_cli.main(build_parser("train").parse_args(base + ["--epochs", "1"]))
    ckpt_dir = os.path.join(log_dir, "checkpoints")
    assert os.path.exists(os.path.join(ckpt_dir, "0_aux.npz"))
    aux = ckpt.load_aux(os.path.join(ckpt_dir, "0"))
    assert {"best_acc", "key_s", "key_t"} <= set(aux)

    # poison the watermark high: the resumed epoch's (likely worse) accuracy
    # must NOT overwrite checkpoints/best
    ckpt.save_aux(os.path.join(ckpt_dir, "0"), best_acc=2.0,
                  key_s=aux["key_s"], key_t=aux["key_t"])
    best_mtime = os.path.getmtime(os.path.join(ckpt_dir, "best"))
    train_cli.main(build_parser("train").parse_args(
        base + ["--epochs", "2", "--resume", os.path.join(ckpt_dir, "0")]
    ))
    logs = sorted(f for f in os.listdir(log_dir) if f.endswith(".txt"))
    text = "".join(open(os.path.join(log_dir, f)).read() for f in logs)
    assert "(with stream keys)" in text
    assert "Epoch: [1]" in text
    # watermark held: best checkpoint untouched, printed best is the poison
    assert os.path.getmtime(os.path.join(ckpt_dir, "best")) == best_mtime
    assert "Target(best): 2.000" in text
