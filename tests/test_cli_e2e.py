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

    # structured metrics landed: one pretrain epoch + one DA epoch
    import json

    metrics = [json.loads(l)
               for l in open(os.path.join(log_dir, "metrics.jsonl"))]
    kinds = [m["kind"] for m in metrics]
    assert kinds == ["pretrain_epoch", "da_epoch"]
    assert metrics[1]["val_target"].keys() >= {"all", "MCP", "fingertip"}
    assert metrics[1]["step"] == 2.0

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


@pytest.mark.slow
def test_test_cli_artifact_eval(tmp_path):
    """Deployment acceptance through the eval CLI: evaluate an EXPORTED
    artifact (`--artifact`, float and int8) against the same fixture the
    checkpoint evaluates on. The float artifact must reproduce the
    checkpoint PCK (same decode, same coordinates); the int8 artifact must
    produce a valid score (its gap to float IS the quantization cost)."""
    import re

    import jax
    import jax.numpy as jnp

    from dahpe_tpu.cli import test as test_cli
    from dahpe_tpu.cli.export import build_export_parser, main as export_main
    from dahpe_tpu.utils import checkpoint as ckpt
    from dahpe_tpu import models

    rhd_root = make_rhd_fixture(str(tmp_path / "rhd"), n=4,
                                sets=("training", "evaluation"))
    h3d_root = make_h3d_fixture(str(tmp_path / "h3d"), n=8)

    model = models.MultiHeadPoseResNet(
        backbone=models.get_backbone("resnet18"), num_keypoints=21
    )
    variables = jax.jit(
        lambda: model.init(
            jax.random.key(0), jnp.zeros((1, 64, 64, 3)), train=False,
            gl_coeff=0.0,
        )
    )()
    ckpt_dir = str(tmp_path / "ckpt")
    ckpt.save_state(ckpt_dir, variables)

    artifact_f = str(tmp_path / "model.stablehlo")
    export_main(build_export_parser().parse_args([
        ckpt_dir, "-o", artifact_f, "-a", "resnet18", "--image-size", "64",
        "--heatmap-size", "16", "--batch-size", "2",
    ]))
    artifact_q = str(tmp_path / "model_int8.stablehlo")
    export_main(build_export_parser().parse_args([
        ckpt_dir, "-o", artifact_q, "-a", "resnet18", "--image-size", "64",
        "--heatmap-size", "16", "--batch-size", "2", "--int8",
    ]))

    def run(log_name, extra):
        log_dir = str(tmp_path / log_name)
        test_cli.main(_args(
            [
                h3d_root, "--source_root", rhd_root, "-t", "Hand3DStudio",
                "-a", "resnet18", "-b", "2", "--workers", "2",
                "--log", log_dir, "--image-size", "64",
                "--heatmap-size", "16",
            ] + extra,
            phase="test",
        ))
        text = "".join(
            open(os.path.join(log_dir, f)).read()
            for f in os.listdir(log_dir) if f.endswith(".txt")
        )
        m = re.search(r"Source: (-?\d+\.\d+) Target: (-?\d+\.\d+)", text)
        assert m, text[-500:]
        return float(m.group(1)), float(m.group(2))

    src_c, tgt_c = run("logs_ckpt", ["--checkpoint", ckpt_dir])
    src_f, tgt_f = run("logs_art_f", ["--artifact", artifact_f])
    src_q, tgt_q = run("logs_art_q", ["--artifact", artifact_q])

    # untrained weights + 16² heatmaps: some batches report -1 groups the
    # meter averages in (reference-parity), so values may dip slightly
    # below 0 — the gates here are float/checkpoint AGREEMENT and that the
    # int8 run produces scores in the plausible band (its accuracy gate on
    # a trained model lives in test_quant.py).
    assert -1.0 <= src_c <= 1.0 and -1.0 <= tgt_c <= 1.0
    # float artifact: same model, same decode — PCK within argmax-tie noise
    assert abs(src_f - src_c) <= 0.02 and abs(tgt_f - tgt_c) <= 0.02, (
        (src_c, tgt_c), (src_f, tgt_f)
    )
    assert -1.0 <= src_q <= 1.0 and -1.0 <= tgt_q <= 1.0

    # exactly one of --checkpoint / --artifact
    with pytest.raises(SystemExit):
        run("logs_bad", [])


def test_nan_watchdog_preserves_last_good_checkpoint(tmp_path):
    """Failure detection: a non-finite loss raises DivergenceError, dumps
    the poisoned state to checkpoints/nan_abort, and does NOT touch
    checkpoints/latest (the pre-divergence resume point)."""
    import math

    import jax.numpy as jnp

    from dahpe_tpu.cli.train import DivergenceError, check_finite
    from dahpe_tpu.utils import checkpoint as ckpt
    from dahpe_tpu.utils import fast_ckpt

    ckdir = tmp_path / "checkpoints"
    ckdir.mkdir()

    class StubLogger:
        def get_checkpoint_path(self, name):
            return str(ckdir / str(name))

    logger = StubLogger()
    saver = fast_ckpt.AsyncSaver()
    good = {"params": jnp.ones((3,)), "step": jnp.asarray(7, jnp.int32)}
    saver.save(logger.get_checkpoint_path("latest"), good)
    saver.flush()

    # finite losses: no-op
    check_finite(saver, logger, good, 10, loss_s=1.25, loss_gf=0.5)

    poisoned = {"params": jnp.full((3,), jnp.nan), "step": jnp.asarray(9, jnp.int32)}
    with pytest.raises(DivergenceError, match="loss_s=nan"):
        check_finite(saver, logger, poisoned, 12,
                     loss_s=float("nan"), loss_gf=0.5)

    # latest untouched; nan_abort holds the diverged state for forensics
    latest = ckpt.restore_state(logger.get_checkpoint_path("latest"),
                                {"params": jnp.zeros((3,)),
                                 "step": jnp.zeros((), jnp.int32)})
    assert int(latest["step"]) == 7
    dumped = ckpt.restore_state(logger.get_checkpoint_path("nan_abort"),
                                {"params": jnp.zeros((3,)),
                                 "step": jnp.zeros((), jnp.int32)})
    assert int(dumped["step"]) == 9 and math.isnan(float(dumped["params"][0]))


@pytest.mark.slow
def test_train_cli_steps_per_call_chunked(tmp_path):
    """--steps-per-call 2 end to end on the fused device-store path: the DA
    epoch runs as -i/K scanned dispatches but the step accounting, epoch
    checkpoints and validation cadence are identical to K=1 (the chunk size
    is an execution detail, not a schedule change). Guards the CLI wiring of
    train/fused.py's scan mode (equivalence of the scanned numerics is
    pinned at the train level in test_fused.py)."""
    import json

    rhd_root = make_rhd_fixture(str(tmp_path / "rhd"), n=6,
                                sets=("training", "evaluation"))
    h3d_root = make_h3d_fixture(str(tmp_path / "h3d"), n=20)
    log_dir = str(tmp_path / "logs")

    from dahpe_tpu.cli import train as train_cli

    train_cli.main(_args([
        h3d_root, "--source_root", rhd_root, "-t", "Hand3DStudio",
        "-a", "resnet18", "-b", "2", "--pretrain-epochs", "1",
        "--epochs", "1", "-i", "4", "--workers", "2", "--log", log_dir,
        "--print-freq", "2", "--image-size", "64", "--heatmap-size", "16",
        "--device-store", "--decoded-cache", str(tmp_path / "cache"),
        "--steps-per-call", "2",
    ]))
    ckpt_dir = os.path.join(log_dir, "checkpoints")
    assert os.path.isdir(os.path.join(ckpt_dir, "pretrain"))
    assert os.path.isdir(os.path.join(ckpt_dir, "best"))
    # the chunked epoch must account for exactly -i optimizer steps
    rows = [json.loads(line)
            for line in open(os.path.join(log_dir, "metrics.jsonl"))]
    da_rows = [r for r in rows if r.get("kind") == "da_epoch"]
    assert len(da_rows) == 1 and da_rows[0]["step"] == 4, da_rows
    text = "".join(
        open(os.path.join(log_dir, f)).read()
        for f in os.listdir(log_dir) if f.endswith(".txt")
    )
    assert "Target: -1.000" not in text
    assert "Source: -1.000" not in text
