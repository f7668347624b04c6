"""Preemption-safe training: --save-every / --max-steps / SIGTERM.

The reference's only recovery story is manual per-epoch ``--resume``
(``train1.py:190-201``); a preempted run loses the whole epoch in flight.
The rebuild bounds lost work: ``--save-every N`` writes a mid-epoch
``latest`` checkpoint (full state + stream-key sidecar) every N iterations,
``--max-steps`` stops a budget-bound run cleanly at an arbitrary step, and
SIGTERM/SIGINT finish the in-flight iteration, save ``latest`` and exit 0
(mirroring cli/serve's drain contract). Resuming ``latest`` continues
MID-epoch — on the fused device-store path, bit-identically to a run that
was never interrupted.
"""

import os
import signal
import subprocess
import sys
import time

import numpy as np
import pytest

import jax

from tests.conftest import REPO_ROOT
from tests.fixtures import make_h3d_fixture, make_rhd_fixture

from dahpe_tpu.cli import train as train_cli
from dahpe_tpu.cli.args import build_parser
from dahpe_tpu.utils import checkpoint as ckpt


def _base_args(tmp_path, log_name):
    rhd_root = str(tmp_path / "rhd")
    h3d_root = str(tmp_path / "h3d")
    if not os.path.isdir(rhd_root):
        make_rhd_fixture(rhd_root, n=6, sets=("training", "evaluation"))
        make_h3d_fixture(h3d_root, n=20)
    return [
        h3d_root, "--source_root", rhd_root, "-t", "Hand3DStudio",
        "-a", "resnet18", "-b", "2", "--pretrain-epochs", "0",
        "--epochs", "1", "-i", "4", "--workers", "2",
        "--log", str(tmp_path / log_name), "--print-freq", "1",
        "--image-size", "64", "--heatmap-size", "16",
        "--device-store", "--decoded-cache", str(tmp_path / "cache"),
    ]


def _variables(path):
    return ckpt.load_model_variables(path)


def _trees_equal(a, b):
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def _log_text(log_dir):
    logs = sorted(f for f in os.listdir(log_dir) if f.endswith(".txt"))
    return "".join(
        open(os.path.join(log_dir, f)).read() for f in logs
    )


@pytest.mark.slow
def test_max_steps_then_resume_matches_straight_run(tmp_path):
    """--max-steps 2 exits cleanly with a mid-epoch 'latest'; resuming it
    finishes the epoch and produces the SAME epoch-0 checkpoint, bit for
    bit, as an uninterrupted run (fused device-store path)."""
    # straight run, with --save-every also exercising the periodic path
    train_cli.main(build_parser("train").parse_args(
        _base_args(tmp_path, "logs_a") + ["--save-every", "3"]
    ))
    ckpt_a = str(tmp_path / "logs_a" / "checkpoints")
    assert os.path.isdir(os.path.join(ckpt_a, "0"))
    # --save-every wrote 'latest' at step 3, mid-epoch, with stream keys
    assert os.path.isdir(os.path.join(ckpt_a, "latest"))
    aux = ckpt.load_aux(os.path.join(ckpt_a, "latest"))
    assert {"best_acc", "key_s", "key_t"} <= set(aux)

    # interrupted run: stops after 2 of 4 iterations, before validation
    train_cli.main(build_parser("train").parse_args(
        _base_args(tmp_path, "logs_b") + ["--max-steps", "2"]
    ))
    ckpt_b = str(tmp_path / "logs_b" / "checkpoints")
    latest = os.path.join(ckpt_b, "latest")
    assert os.path.isdir(latest)
    assert not os.path.exists(os.path.join(ckpt_b, "0"))
    text = _log_text(str(tmp_path / "logs_b"))
    assert "--max-steps reached at step 2 (epoch 0 iteration 1)" in text

    # resume: must start at epoch 0 ITERATION 2 with the stream keys and
    # converge on the identical epoch checkpoint
    train_cli.main(build_parser("train").parse_args(
        _base_args(tmp_path, "logs_b") + ["--resume", latest]
    ))
    text = _log_text(str(tmp_path / "logs_b"))
    assert "at epoch 0 iteration 2 (with stream keys)" in text
    _trees_equal(
        _variables(os.path.join(ckpt_a, "0")),
        _variables(os.path.join(ckpt_b, "0")),
    )

    # a resume whose budget is already spent is a clean no-op
    train_cli.main(build_parser("train").parse_args(
        _base_args(tmp_path, "logs_b")
        + ["--resume", os.path.join(ckpt_b, "0"), "--max-steps", "4"]
    ))
    assert "--max-steps 4 already reached" in _log_text(
        str(tmp_path / "logs_b")
    )


@pytest.mark.slow
def test_save_every_never_persists_a_poisoned_state(tmp_path, monkeypatch):
    """Every checkpoint write is finiteness-gated: with --print-freq far
    above --save-every (detection would otherwise lag divergence by a full
    print window), a loss that goes NaN mid-window must abort at the NEXT
    save point — leaving checkpoints/latest at the last finite step, never
    overwritten with poisoned state the abort message tells the user to
    resume from."""
    import jax.numpy as jnp

    import dahpe_tpu.train as train_mod
    from dahpe_tpu.cli.train import DivergenceError
    from dahpe_tpu.utils import fast_ckpt

    real_factory = train_mod.make_fused_da_iteration
    calls = {"n": 0}

    def poisoned_factory(*a, **kw):
        fused = real_factory(*a, **kw)

        def wrapper(state, key_s, key_t):
            state, metrics, key_s, key_t = fused(state, key_s, key_t)
            calls["n"] += 1
            if calls["n"] >= 3:  # diverge at the third iteration
                metrics = dict(metrics)
                metrics["loss_s"] = metrics["loss_s"] * jnp.nan
            return state, metrics, key_s, key_t

        return wrapper

    monkeypatch.setattr(train_mod, "make_fused_da_iteration",
                        poisoned_factory)
    with pytest.raises(DivergenceError, match="loss_s=nan"):
        train_cli.main(build_parser("train").parse_args(
            _base_args(tmp_path, "logs_nan")
            + ["--save-every", "1", "--print-freq", "1000"]
        ))
    ckdir = str(tmp_path / "logs_nan" / "checkpoints")
    # latest = the step-2 save (the last finite one); step 3 never landed
    latest = fast_ckpt.load_packed_tree(os.path.join(ckdir, "latest"))
    assert int(latest["step"][()]) == 2
    for leaf in jax.tree.leaves(latest["params"]):
        assert np.isfinite(np.asarray(leaf, np.float32)).all()
    # the poisoned state went to nan_abort for forensics
    dumped = fast_ckpt.load_packed_tree(os.path.join(ckdir, "nan_abort"))
    assert int(dumped["step"][()]) == 3


@pytest.mark.slow
def test_sigterm_during_pretrain_drains_and_exits_zero(tmp_path):
    """The preemption contract covers the pretrain phase too (the reference
    schedule is 70 pretrain epochs): SIGTERM mid-pretraining finishes the
    in-flight iteration, saves checkpoints/pretrain_interrupt, exits 0."""
    make_rhd_fixture(str(tmp_path / "rhd"), n=6,
                     sets=("training", "evaluation"))
    make_h3d_fixture(str(tmp_path / "h3d"), n=20)
    log_dir = str(tmp_path / "logs")
    argv = [
        str(tmp_path / "h3d"), "--source_root", str(tmp_path / "rhd"),
        "-t", "Hand3DStudio", "-a", "resnet18", "-b", "2",
        "--pretrain-epochs", "1", "--epochs", "1", "-i", "100000",
        "--workers", "2", "--log", log_dir, "--print-freq", "1",
        "--image-size", "64", "--heatmap-size", "16",
        "--device-store", "--decoded-cache", str(tmp_path / "cache"),
    ]
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = REPO_ROOT
    code = (
        "import sys, jax; jax.config.update('jax_platforms', 'cpu');\n"
        "from dahpe_tpu.cli.args import build_parser\n"
        "from dahpe_tpu.cli.train import main\n"
        "main(build_parser('train').parse_args(sys.argv[1:]))\n"
    )
    proc = subprocess.Popen([sys.executable, "-c", code, *argv], env=env)
    try:
        deadline = time.time() + 600
        while time.time() < deadline:
            if os.path.isdir(log_dir) and "Epoch: [0]" in _log_text(log_dir):
                break  # pretrain loop is iterating (DA is 100k iters away)
            assert proc.poll() is None, "train CLI died before iterating"
            time.sleep(1.0)
        else:
            pytest.fail("train CLI never reached the pretrain loop")
        proc.send_signal(signal.SIGTERM)
        assert proc.wait(timeout=300) == 0
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.wait()
    interrupt = os.path.join(log_dir, "checkpoints", "pretrain_interrupt")
    assert os.path.isdir(interrupt)
    v = ckpt.load_model_variables(interrupt)
    assert "params" in v and "batch_stats" in v
    text = _log_text(log_dir)
    assert "saved" in text and "pretrain_interrupt" in text
    assert "continue with --pretrain" in text


@pytest.mark.slow
def test_sigterm_saves_latest_and_exits_zero(tmp_path):
    """A real SIGTERM to the train CLI process: the in-flight iteration
    completes, checkpoints/latest lands, exit code is 0 (container-stop /
    preemption contract, same as cli/serve)."""
    make_rhd_fixture(str(tmp_path / "rhd"), n=6,
                     sets=("training", "evaluation"))
    make_h3d_fixture(str(tmp_path / "h3d"), n=20)
    log_dir = str(tmp_path / "logs")
    argv = [
        str(tmp_path / "h3d"), "--source_root", str(tmp_path / "rhd"),
        "-t", "Hand3DStudio", "-a", "resnet18", "-b", "2",
        "--pretrain-epochs", "0", "--epochs", "1", "-i", "100000",
        "--workers", "2", "--log", log_dir, "--print-freq", "1",
        "--image-size", "64", "--heatmap-size", "16",
        "--device-store", "--decoded-cache", str(tmp_path / "cache"),
    ]
    # fresh process on plain CPU jax (drop the axon plugin + XLA_FLAGS like
    # tests/test_multihost.py; JAX_PLATFORMS alone would not stick)
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = REPO_ROOT
    code = (
        "import sys, jax; jax.config.update('jax_platforms', 'cpu');\n"
        "from dahpe_tpu.cli.args import build_parser\n"
        "from dahpe_tpu.cli.train import main\n"
        "main(build_parser('train').parse_args(sys.argv[1:]))\n"
    )
    proc = subprocess.Popen([sys.executable, "-c", code, *argv], env=env)
    try:
        # wait until the DA loop is demonstrably iterating (the RunLogger
        # tee mirrors every progress line into {log}/*.txt)
        deadline = time.time() + 600
        while time.time() < deadline:
            if os.path.isdir(log_dir) and "Epoch: [0]" in _log_text(log_dir):
                break
            assert proc.poll() is None, "train CLI died before iterating"
            time.sleep(1.0)
        else:
            pytest.fail("train CLI never reached the DA loop")
        proc.send_signal(signal.SIGTERM)
        assert proc.wait(timeout=300) == 0
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.wait()
    latest = os.path.join(log_dir, "checkpoints", "latest")
    assert os.path.isdir(latest)
    assert {"best_acc", "key_s", "key_t"} <= set(ckpt.load_aux(latest))
    text = _log_text(log_dir)
    assert "saving checkpoints/latest" in text
    assert "stop requested at step" in text


# ---------------------------------------------------------------------------
# Stop-poller unit semantics (the multihost consensus cadence)
# ---------------------------------------------------------------------------

def test_stop_poller_single_process_is_immediate():
    """Single-process mode: the local flag is returned at the very next
    poll, and the collective machinery is never touched (no import, no
    allgather) — the drain latency contract of every 1-host run."""
    flag = []
    poll = train_cli.make_stop_poller(flag, poll_every=100)
    assert poll() is None
    flag.append(signal.SIGTERM)
    assert poll() == signal.SIGTERM  # no 100-call wait in single-process


def test_stop_poller_multihost_cadence_and_consensus(monkeypatch):
    """Multihost mode (process_count forced to 2): the allgather is a HOST
    sync, so it must run only every poll_every-th call — a locally-set flag
    between cadence points is DEFERRED, never acted on locally (acting
    early is the one-process-drains-alone deadlock the consensus exists to
    prevent). At the cadence point the answer is the max over all
    processes' flags, so a peer's signal stops this host too."""
    from jax.experimental import multihost_utils

    monkeypatch.setattr(jax, "process_count", lambda: 2)
    gathered = []

    def fake_allgather(x):
        gathered.append(int(x))
        return np.asarray([int(x), peer_flag[0]], np.int32)

    monkeypatch.setattr(multihost_utils, "process_allgather", fake_allgather)

    peer_flag = [0]
    flag = []
    poll = train_cli.make_stop_poller(flag, poll_every=3)
    flag.append(signal.SIGTERM)  # local signal lands before call 1
    assert poll() is None and not gathered   # deferred
    assert poll() is None and not gathered   # still deferred
    assert poll() == signal.SIGTERM          # cadence point: consensus
    assert gathered == [signal.SIGTERM]

    # peer-only signal: local flag clear, the gathered max must stop us
    flag.clear()
    peer_flag[0] = signal.SIGINT
    poll = train_cli.make_stop_poller(flag, poll_every=2)
    assert poll() is None and len(gathered) == 1
    assert poll() == signal.SIGINT
    assert gathered == [signal.SIGTERM, 0]

    # quiet cluster: the cadence-point consensus answers None and training
    # continues
    peer_flag[0] = 0
    poll = train_cli.make_stop_poller(flag, poll_every=1)
    assert poll() is None
    assert gathered[-1] == 0
