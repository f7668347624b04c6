"""Real-chip preemption drill: SIGTERM a production DA run MID-epoch,
resume from ``checkpoints/latest``, finish the schedule.

The r3 soak (``experiments/soak.py``) proved resume across an epoch
boundary; its docstring records why it could not kill mid-step — a hard
kill during a TPU op wedges this environment's tunneled chip. The graceful
preemption path (``cli/train.py``: SIGTERM finishes the in-flight
iteration, saves ``latest`` + stream sidecar, exits 0) removes that
restriction, so this drill delivers the stronger evidence: a real SIGTERM
landing in the middle of an epoch on the production configuration
(``--device-store`` fused iteration), followed by a mid-epoch ``--resume``
that must pick up at the exact iteration with the stream keys and complete
the remaining schedule.

Asserted:
- the preempted process exits 0 (container-stop contract) with
  ``checkpoints/latest`` at a mid-epoch step;
- the resumed process prints ``epoch E iteration I (with stream keys)``
  with I == saved_step % iters-per-epoch;
- every scheduled epoch checkpoint exists at the end;
- ``--save-every`` wrote ``latest`` before the signal ever arrived
  (hard-kill loss bound), and the signal overwrote it at the drained step.

Usage (real chip, ~5-10 min warm-cache):
    python -m dahpe_tpu.experiments.preempt_drill /tmp/drill
"""

from __future__ import annotations

import os
import signal
import subprocess
import sys
import time

import numpy as np

from dahpe_tpu.experiments.soak import _parse_metrics


def _spawn_cli(args_list, log_path):
    env = dict(os.environ)
    env["PYTHONPATH"] = (
        os.path.dirname(os.path.dirname(os.path.dirname(__file__)))
        + os.pathsep + env.get("PYTHONPATH", "")
    )
    cmd = [sys.executable, "-m", "dahpe_tpu.cli.train"] + args_list
    with open(log_path, "w") as f:  # Popen dups the fd; no leak in the drill
        return subprocess.Popen(cmd, stdout=f, stderr=subprocess.STDOUT,
                                env=env)


def run_drill(
    workdir: str,
    *,
    arch: str = "resnet101",
    image_size: int = 256,
    heatmap_size: int = 64,
    batch: int = 32,
    iters: int = 100,
    epochs: int = 2,
    save_every: int = 25,
    signal_after_iter: int = 40,
    bf16: bool = True,
    seed: int = 1,
    compile_timeout_s: float = 1800.0,
    verbose: bool = True,
) -> dict:
    os.makedirs(workdir, exist_ok=True)
    log_dir = os.path.join(workdir, "logs")
    ckpt_dir = os.path.join(log_dir, "checkpoints")
    phase1_log = os.path.join(workdir, "phase1.log")
    base = [
        workdir,
        "-s", "SyntheticHandsSource", "-t", "SyntheticHandsTarget",
        "-a", arch, "-b", str(batch), "-i", str(iters),
        "--image-size", str(image_size), "--heatmap-size", str(heatmap_size),
        "--pretrain-epochs", "0", "--epochs", str(epochs),
        "--log", log_dir, "--print-freq", "10", "--seed", str(seed),
        "--device-store", "--decoded-cache", os.path.join(workdir, "cache"),
        "--rotation", "30", "--save-every", str(save_every),
    ] + (["--bf16"] if bf16 else [])

    def log(msg):
        if verbose:
            print(msg, flush=True)

    log(f"drill phase 1: {arch}@{image_size} b{batch}, {iters} iters/epoch "
        f"x {epochs}; SIGTERM after iteration ~{signal_after_iter}")
    proc = _spawn_cli(base, phase1_log)
    try:
        # wait for the DA loop to demonstrably pass `signal_after_iter`
        # (progress displays land every --print-freq iterations); the long
        # pole before that is the fused program's first compile
        deadline = time.time() + compile_timeout_s
        seen = -1
        while time.time() < deadline:
            text = open(phase1_log).read() if os.path.exists(phase1_log) else ""
            import re

            marks = [int(m.group(1))
                     for m in re.finditer(r"Epoch: \[0\]\[ *(\d+)/", text)]
            if marks and marks[-1] != seen:
                seen = marks[-1]
                log(f"  phase 1 at iteration {seen}")
            if seen >= signal_after_iter:
                break
            if proc.poll() is not None:
                raise AssertionError(
                    f"phase 1 exited early (rc={proc.returncode}); "
                    f"see {phase1_log}"
                )
            time.sleep(5.0)
        else:
            raise AssertionError("phase 1 never reached the signal point")
        log("  sending SIGTERM")
        t_sig = time.time()
        proc.send_signal(signal.SIGTERM)
        rc = proc.wait(timeout=600)
        drain_s = time.time() - t_sig
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.wait()
    assert rc == 0, f"preempted process exited {rc}, want 0; see {phase1_log}"

    text1 = open(phase1_log).read()
    assert "saving checkpoints/latest, then exiting cleanly" in text1
    import re

    m = re.search(r"stop requested at step (\d+) \(epoch (\d+) iteration "
                  r"(\d+)\)", text1)
    assert m, "no drain record in the phase-1 log"
    stop_step, stop_epoch, stop_iter = map(int, m.groups())
    assert stop_step % iters != 0, "drill landed on an epoch boundary; " \
        "raise signal_after_iter so the evidence stays mid-epoch"
    latest = os.path.join(ckpt_dir, "latest")
    assert os.path.isdir(latest), "checkpoints/latest missing"
    aux = np.load(latest + "_aux.npz")
    assert {"best_acc", "key_s", "key_t"} <= set(aux.files)
    log(f"  preempted at step {stop_step} (epoch {stop_epoch} iteration "
        f"{stop_iter}), drain {drain_s:.1f}s, exit 0")

    phase2_log = os.path.join(workdir, "phase2.log")
    log(f"drill phase 2: --resume {latest}")
    proc = _spawn_cli(base + ["--resume", latest], phase2_log)
    rc2 = proc.wait(timeout=compile_timeout_s)
    assert rc2 == 0, f"resumed process exited {rc2}; see {phase2_log}"
    text2 = open(phase2_log).read()
    want = (f"at epoch {stop_epoch} iteration {stop_step % iters} "
            "(with stream keys)")
    assert want in text2, f"resume line missing {want!r}"
    for e in range(epochs):
        assert os.path.isdir(os.path.join(ckpt_dir, str(e))), \
            f"epoch checkpoint {e} missing after resume"

    _, _, times1 = _parse_metrics(text1)
    _, _, times2 = _parse_metrics(text2)
    result = {
        "stop_step": stop_step,
        "stop_epoch": stop_epoch,
        "stop_iter": stop_iter,
        "drain_s": round(drain_s, 1),
        "resume_iter": stop_step % iters,
        "epochs_completed": epochs,
        "iter_times_p1": times1[-3:],
        "iter_times_p2": times2[-3:],
    }
    log(f"drill OK: {result}")
    return result


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("workdir")
    p.add_argument("--arch", default="resnet101")
    p.add_argument("--iters", type=int, default=100)
    p.add_argument("--epochs", type=int, default=2)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--image-size", type=int, default=256)
    p.add_argument("--heatmap-size", type=int, default=64)
    p.add_argument("--save-every", type=int, default=25)
    p.add_argument("--signal-after-iter", type=int, default=40)
    a = p.parse_args()
    run_drill(
        a.workdir, arch=a.arch, iters=a.iters, epochs=a.epochs,
        batch=a.batch, image_size=a.image_size, heatmap_size=a.heatmap_size,
        save_every=a.save_every, signal_after_iter=a.signal_after_iter,
    )
