"""Adaptation acceptance: the DA minimax must BEAT source-only training.

VERDICT r2 item 1 — the highest-leverage missing evidence. The controlled
photometric shift (``data/synthetic.py``) keeps geometry identical across
domains, so the target-PCK gap is purely appearance, and any gain of the
3-step loop over the equal-budget source-only control is the adaptation the
reference exists to deliver (``train1.py:328-458`` vs ``:278-325``).

The measured acceptance run (resnet18@128, shift 0.4, 4000+3000 iters on a
v5e chip): source-only 0.108 → DA **0.990** (EMA 0.961) — docs/ACCURACY.md.
This regression guard re-runs a shortened version of that exact
configuration on the real chip; iteration budgets this size are not
feasible on the single-core CPU backend, so the test runs the experiment in
a SUBPROCESS that keeps the session's default (TPU) platform — the suite's
conftest pins the parent to CPU — and skips when no accelerator is there.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _tpu_env():
    """Environment for a child that should see the session's accelerator
    (undo the conftest's CPU pin; PYTHONPATH appended, never overwritten —
    the axon plugin registers through the inherited entries)."""
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "host_platform_device_count" not in f
    )
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return env


def _has_accelerator() -> bool:
    probe = subprocess.run(
        [sys.executable, "-c",
         "import jax; print(jax.default_backend())"],
        capture_output=True, text=True, env=_tpu_env(), timeout=300,
    )
    return probe.returncode == 0 and probe.stdout.strip() not in ("", "cpu")


@pytest.mark.slow
def test_da_beats_source_only():
    if not _has_accelerator():
        pytest.skip("needs the real accelerator (budget infeasible on the "
                    "single-core CPU backend)")
    out = os.path.join("/tmp", f"adapt_accept_{os.getpid()}.json")
    proc = subprocess.run(
        [sys.executable, "-m", "dahpe_tpu.experiments.adaptation",
         "--pre-iters", "3000", "--da-iters", "1000",
         "--eval-every", "500", "--json", out],
        env=_tpu_env(), timeout=2700, capture_output=True, text=True,
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    with open(out) as f:
        r = json.load(f)
    # the task must be non-trivially solved on target after DA…
    assert r["da"] >= 0.30, r
    # …with a clear margin over the equal-budget source-only control
    # (threshold from VERDICT r2 item 1: >=10 PCK points; measured headroom
    # is ~9x that)
    assert r["gain"] >= 0.10, r
