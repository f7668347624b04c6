"""CLI flag-default guards for defaults that DIVERGE from the reference.

Most flag defaults mirror the reference CLI verbatim (``train1.py:640-700``)
and are covered by the e2e tests; the ones asserted here were deliberately
changed on measured evidence, so a silent revert (e.g. a parity-minded
refactor "fixing" them back) must fail a test that points at the evidence.
"""

from dahpe_tpu.cli.args import build_parser


def test_ema_decay_default_is_tuned_not_reference():
    """--ema-decay defaults to 0.99, NOT the reference's untuned 0.999
    (train1.py:667): the r5 decay sweep (docs/ACCURACY.md) measured 0.99 as
    the only decay whose EMA twin beats the live model's end-of-run PCK on
    both studied shift regimes."""
    args = build_parser("train").parse_args(["root", "-t", "Hand3DStudio"])
    assert args.ema_decay == 0.99


def test_conf_gate_defaults_off():
    """--conf-gate defaults to off (0.0): pseudo-label confidence gating is
    an opt-in drift mitigation (docs/ACCURACY.md r5 study), and the default
    behavior must match the reference's trust-every-label training
    (train1.py:408-458)."""
    args = build_parser("train").parse_args(["root", "-t", "Hand3DStudio"])
    assert args.conf_gate == 0.0


def test_steps_per_call_validation():
    """--steps-per-call chunking only runs where its semantics are exact:
    the fused device-store path, with every host-side cadence
    (iters-per-epoch, print-freq, save-every, max-steps) a multiple of K —
    anything else must be rejected up front, not silently reinterpreted
    (cli/train.py:validate_steps_per_call)."""
    import pytest

    from dahpe_tpu.cli.train import validate_steps_per_call

    def ns(**kw):
        base = ["root", "-t", "Hand3DStudio", "--device-store",
                "-i", "500", "-p", "100"]
        args = build_parser("train").parse_args(base)
        for k, v in kw.items():
            setattr(args, k, v)
        return args

    assert validate_steps_per_call(ns()) == 1
    assert validate_steps_per_call(ns(steps_per_call=20)) == 20
    assert validate_steps_per_call(
        ns(steps_per_call=10, save_every=100, max_steps=1000)) == 10
    for bad in (ns(steps_per_call=20, device_store=False),
                ns(steps_per_call=20, debug=True),
                ns(steps_per_call=7),                    # 500 % 7, 100 % 7
                ns(steps_per_call=20, save_every=30),
                ns(steps_per_call=20, max_steps=50),
                ns(steps_per_call=20, print_freq=30)):
        with pytest.raises(SystemExit):
            validate_steps_per_call(bad)
