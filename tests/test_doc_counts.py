"""Docs-vs-reality guard for the test-count table (VERDICT r4 weak #5).

TESTING.md quotes exact collected-test counts for the two tiers; those
numbers drifted twice across rounds. This test collects the suite the same
way the doc's commands do and fails if the table is stale — exact counts
stay in the docs AND stay true.
"""

import os
import re
import subprocess
import sys

from tests.conftest import REPO_ROOT

TESTING_MD = os.path.join(REPO_ROOT, "docs", "TESTING.md")


def _collect_count(extra_args):
    env = dict(os.environ, PYTHONPATH=REPO_ROOT)
    out = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "-q", "--collect-only",
         "-p", "no:cacheprovider", *extra_args],
        cwd=REPO_ROOT, env=env, capture_output=True, text=True, timeout=600,
    ).stdout
    m = re.search(r"(\d+)(?:/\d+)? tests? collected", out)
    assert m, f"could not parse collection output:\n{out[-2000:]}"
    return int(m.group(1))


def test_testing_md_counts_match_collection():
    text = open(TESTING_MD).read()
    fast = re.search(r"\| fast[^|]*\|[^|]*\|\s*(\d+)\s*\|", text)
    full = re.search(r"\| full\s*\|[^|]*\|\s*(\d+)\s*\|", text)
    assert fast and full, "TESTING.md tier table rows not found"
    doc_fast, doc_full = int(fast.group(1)), int(full.group(1))

    got_full = _collect_count([])
    got_fast = _collect_count(["-m", "not slow"])
    assert (doc_fast, doc_full) == (got_fast, got_full), (
        f"TESTING.md quotes fast={doc_fast}/full={doc_full} but collection "
        f"says fast={got_fast}/full={got_full} — update the table "
        "(and CLAUDE.md if it quotes counts)"
    )
