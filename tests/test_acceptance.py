"""Published-checkpoint acceptance harness (`experiments/acceptance.py`).

The real assets are environment-blocked (BASELINE.md), so these tests pin
the harness itself: expected-score parsing, the BLOCKED exit contract, and
one full execution against a fixture-trained `.pth` — the exact code path
that will judge `H3D_best_754.pth` when it lands.
"""

import json
import os

import pytest

from dahpe_tpu.experiments.acceptance import parse_expected, run_acceptance


def test_parse_expected():
    assert parse_expected("models/H3D_best_754.pth") == 75.4
    assert parse_expected("STB_best_750.pth") == 75.0
    assert parse_expected("pretrain_rhd.pth") is None
    assert parse_expected("model_12.pth") is None  # needs 3 digits


def test_blocked_exit_codes(tmp_path, capsys):
    # missing checkpoint file -> 2 (blocked, not failed)
    rc = run_acceptance([
        str(tmp_path / "nope_data"), "-t", "Hand3DStudio",
        "--checkpoint", str(tmp_path / "H3D_best_754.pth"),
    ])
    assert rc == 2
    assert "BLOCKED" in capsys.readouterr().out
    # unparseable expected score -> 2
    ckpt = tmp_path / "weird.pth"
    ckpt.write_bytes(b"x")
    rc = run_acceptance([
        str(tmp_path), "-t", "Hand3DStudio", "--checkpoint", str(ckpt),
    ])
    assert rc == 2
    # checkpoint present + parseable but dataset root missing -> 2
    ckpt754 = tmp_path / "H3D_best_754.pth"
    ckpt754.write_bytes(b"x")
    rc = run_acceptance([
        str(tmp_path / "nope_data"), "-t", "Hand3DStudio",
        "--checkpoint", str(ckpt754),
    ])
    assert rc == 2


@pytest.mark.slow
def test_acceptance_runs_reference_pth(tmp_path, capsys):
    """Full path on fixtures: train 1 epoch, export the reference-format
    .pth, self-consistency acceptance (expected := this framework's own
    eval of that .pth, so PASS pins import + eval + judging together)."""
    from tests.fixtures import make_h3d_fixture, make_rhd_fixture

    import jax

    from dahpe_tpu.cli import train as train_cli
    from dahpe_tpu.cli.args import build_parser
    from dahpe_tpu.utils import checkpoint as ckpt

    rhd_root = make_rhd_fixture(str(tmp_path / "rhd"), n=6,
                                sets=("training", "evaluation"))
    h3d_root = make_h3d_fixture(str(tmp_path / "h3d"), n=20)
    log_dir = str(tmp_path / "logs")
    train_cli.main(build_parser("train").parse_args([
        h3d_root, "--source_root", rhd_root, "-t", "Hand3DStudio",
        "-a", "resnet18", "-b", "2", "--pretrain-epochs", "0",
        "--epochs", "1", "-i", "2", "--workers", "2", "--log", log_dir,
        "--print-freq", "1", "--image-size", "64", "--heatmap-size", "16",
    ]))

    # export the trained state in the reference's .pth format, named like a
    # published checkpoint claiming 50.0 PCK
    state = ckpt.load_model_variables(
        os.path.join(log_dir, "checkpoints", "0"))
    pth = str(tmp_path / "H3D_best_500.pth")
    ckpt.save_reference_pth(pth, state)

    common = [
        h3d_root, "--source_root", rhd_root, "-t", "Hand3DStudio",
        "-a", "resnet18", "-b", "2", "--workers", "2",
        "--image-size", "64", "--heatmap-size", "16",
        "--checkpoint", pth,
    ]
    # first run judges against the filename's 50.0 claim — whatever the
    # verdict, its printed JSON carries the measured PCK
    rc1 = run_acceptance(common + ["--log", str(tmp_path / "acc1")])
    out = capsys.readouterr().out
    record = json.loads([l for l in out.splitlines()
                         if l.startswith("{")][-1])
    assert record["published"] == 50.0
    assert rc1 == (0 if record["accepted"] else 1)
    measured = record["pck_at_005_percent"]

    # second run with --expected = the measured value must PASS exactly
    rc2 = run_acceptance(common + [
        "--log", str(tmp_path / "acc2"), "--expected", str(measured),
    ])
    out2 = capsys.readouterr().out
    assert rc2 == 0
    assert "PASS" in out2
