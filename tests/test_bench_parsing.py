"""Regression guards for bench.py's CLI parsing (ADVICE r2 item: the
`e2e unfused` / `serve 96 int8` forms crashed when a non-numeric flag sat
where the batch int was expected). bench.py imports jax only inside the
bench functions, so the parse is testable on CPU without touching the TPU."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import parse_flagged_args


def test_batch_and_flags_in_either_order():
    assert parse_flagged_args(["32", "unfused"], 99) == 32
    assert parse_flagged_args(["unfused", "32"], 99) == 32


def test_flags_only_falls_back_to_default():
    assert parse_flagged_args(["unfused"], 32) == 32
    assert parse_flagged_args(["int8", "f32glue"], 96) == 96
    assert parse_flagged_args([], 112) == 112


def test_non_numeric_args_never_crash():
    # the ADVICE r2 failure mode: int() over a word flag
    assert parse_flagged_args(["pallas"], 256) == 256
    assert parse_flagged_args(["-x", "--flag", "7"], 1) == 7
