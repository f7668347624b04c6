"""End-to-end CLI tests on synthetic fixtures: pretrain → DA train →
checkpoint → evaluate, all through the public command-line surface."""

import os
import sys

import pytest

from tests.fixtures import make_h3d_fixture, make_rhd_fixture


def _args(argv, phase="train"):
    from dahpe_tpu.cli.args import build_parser

    return build_parser(phase).parse_args(argv)


@pytest.mark.slow
def test_train_cli_end_to_end(tmp_path):
    rhd_root = make_rhd_fixture(str(tmp_path / "rhd"), n=6,
                                sets=("training", "evaluation"))
    h3d_root = make_h3d_fixture(str(tmp_path / "h3d"), n=20)
    log_dir = str(tmp_path / "logs")

    from dahpe_tpu.cli import train as train_cli

    args = _args(
        [
            h3d_root,
            "--source_root", rhd_root,
            "-t", "Hand3DStudio",
            "-a", "resnet18",
            "-b", "2",
            "--pretrain-epochs", "1",
            "--epochs", "1",
            "-i", "2",
            "--workers", "2",
            "--log", log_dir,
            "--print-freq", "1",
            "--image-size", "128",
            "--heatmap-size", "32",
        ]
    )
    train_cli.main(args)

    # checkpoints were produced
    ckpt_dir = os.path.join(log_dir, "checkpoints")
    assert os.path.isdir(os.path.join(ckpt_dir, "pretrain"))
    assert os.path.isdir(os.path.join(ckpt_dir, "0"))
    assert os.path.isdir(os.path.join(ckpt_dir, "best"))

    # evaluate the saved checkpoint through the test CLI
    from dahpe_tpu.cli import test as test_cli

    targs = _args(
        [
            h3d_root,
            "--source_root", rhd_root,
            "-t", "Hand3DStudio",
            "-a", "resnet18",
            "-b", "2",
            "--workers", "2",
            "--log", str(tmp_path / "logs_test"),
            "--image-size", "128",
            "--heatmap-size", "32",
            "--checkpoint", os.path.join(ckpt_dir, "best"),
        ],
        phase="test",
    )
    test_cli.main(targs)


@pytest.mark.slow
def test_train_cli_device_store_fused(tmp_path):
    """The production input mode end to end: --device-store --decoded-cache
    drives pretrain + DA through the single-dispatch fused iteration
    (train/fused.py) and the device-resident eval loaders."""
    rhd_root = make_rhd_fixture(str(tmp_path / "rhd"), n=6,
                                sets=("training", "evaluation"))
    h3d_root = make_h3d_fixture(str(tmp_path / "h3d"), n=20)
    log_dir = str(tmp_path / "logs")

    from dahpe_tpu.cli import train as train_cli

    args = _args(
        [
            h3d_root,
            "--source_root", rhd_root,
            "-t", "Hand3DStudio",
            "-a", "resnet18",
            "-b", "2",
            "--pretrain-epochs", "1",
            "--epochs", "1",
            "-i", "2",
            "--workers", "2",
            "--log", log_dir,
            "--print-freq", "1",
            "--image-size", "64",
            "--heatmap-size", "16",
            "--device-store",
            "--decoded-cache", str(tmp_path / "cache"),
        ]
    )
    train_cli.main(args)
    ckpt_dir = os.path.join(log_dir, "checkpoints")
    assert os.path.isdir(os.path.join(ckpt_dir, "pretrain"))
    assert os.path.isdir(os.path.join(ckpt_dir, "best"))
    # validation PCK must be a real number on BOTH domains: -1.000 means
    # every ground-truth peak was invalid (this caught an out-of-frame
    # keypoint bug in the H3D fixture)
    logs = [f for f in os.listdir(log_dir) if f.endswith(".txt")]
    text = "".join(
        open(os.path.join(log_dir, f)).read() for f in logs
    )
    assert "Target: -1.000" not in text, "target validation PCK is -1"
    assert "Source: -1.000" not in text, "source validation PCK is -1"

    # evaluate the orbax checkpoint through the test CLI's device-resident
    # eval path (--device-store, VERDICT r2 item 4): no host val loaders
    from dahpe_tpu.cli import test as test_cli

    test_log = str(tmp_path / "logs_test")
    targs = _args(
        [
            h3d_root, "--source_root", rhd_root, "-t", "Hand3DStudio",
            "-a", "resnet18", "-b", "2", "--workers", "2",
            "--log", test_log, "--image-size", "64", "--heatmap-size", "16",
            "--device-store", "--decoded-cache", str(tmp_path / "cache"),
            "--checkpoint", os.path.join(ckpt_dir, "best"),
        ],
        phase="test",
    )
    test_cli.main(targs)
    ttext = "".join(
        open(os.path.join(test_log, f)).read()
        for f in os.listdir(test_log) if f.endswith(".txt")
    )
    assert "device store (val target)" in ttext
    assert "Target: -1.000" not in ttext


@pytest.mark.slow
def test_test_cli_with_reference_pth(tmp_path):
    """Round-trip: export our weights as a reference .pth, evaluate it."""
    torch = pytest.importorskip("torch")
    del torch
    import jax
    import jax.numpy as jnp

    h3d_root = make_h3d_fixture(str(tmp_path / "h3d"), n=20)
    rhd_root = make_rhd_fixture(str(tmp_path / "rhd"), n=6,
                                sets=("training", "evaluation"))

    from dahpe_tpu.cli.common import build_model
    from dahpe_tpu.utils import checkpoint as ckpt

    args = _args(
        [
            h3d_root,
            "--source_root", rhd_root,
            "-t", "Hand3DStudio",
            "-a", "resnet18",
            "-b", "2",
            "--workers", "2",
            "--log", str(tmp_path / "logs_pth"),
            "--image-size", "128",
            "--heatmap-size", "32",
            # the .pth route through the device-resident eval path too
            "--device-store", "--decoded-cache", str(tmp_path / "cache"),
            "--checkpoint", "PLACEHOLDER",
        ],
        phase="test",
    )
    model = build_model(args, multi_head=True)
    variables = model.init(
        jax.random.key(0), jnp.zeros((1, 128, 128, 3)), train=False, gl_coeff=0.0
    )
    pth = str(tmp_path / "model.pth")
    ckpt.save_reference_pth(pth, variables)
    args.checkpoint = pth

    from dahpe_tpu.cli import test as test_cli

    test_cli.main(args)
