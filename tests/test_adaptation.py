"""Adaptation acceptance: the DA minimax must BEAT source-only training.

VERDICT r2 item 1 — the highest-leverage missing evidence. The controlled
photometric shift (``data/synthetic.py``) keeps geometry identical across
domains, so any target-PCK gap is purely the appearance gap, and any gain of
the 3-step loop over the equal-budget source-only control is the adaptation
the reference exists to deliver (``train1.py:328-458`` vs ``:278-325``).

Budgets here are sized for the 8-device CPU mesh; the real-chip version of
the experiment (larger model/budget) is recorded in docs/ACCURACY.md.
"""

import pytest


@pytest.mark.slow
def test_da_beats_source_only():
    from dahpe_tpu.experiments.adaptation import run_adaptation_experiment

    r = run_adaptation_experiment(
        n_train=192, n_val=96, pre_iters=160, da_iters=160,
        batch=16, eval_every=80, seed=0, verbose=True,
    )
    # the task must be non-trivially solved on target after DA…
    assert r["da"] >= 0.30, r
    # …and the minimax must add a clear margin over the equal-budget
    # source-only control (threshold from VERDICT r2 item 1: >=10 PCK pts)
    assert r["gain"] >= 0.10, r
