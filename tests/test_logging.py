"""RunLogger structured metrics (`{log}/metrics.jsonl`).

Beyond-reference observability: the reference's only record is the
stdout hijack text file (`utils/logger.py:54-61`); experiments that need
numbers back out of a run (soak, drill) must regex the console text. The
JSONL stream is the machine-readable channel: one line per event,
append-only across `--resume` processes.
"""

import json
import os

import numpy as np

from dahpe_tpu.utils.logging import RunLogger


def test_log_metrics_jsonl(tmp_path):
    logger = RunLogger(str(tmp_path), "train", tee=False)
    logger.log_metrics(
        kind="da_epoch", epoch=0, step=np.int64(500),
        val_target={"all": np.float32(0.75), "MCP": 0.5},
        checkpoint="ckpt/0",
    )
    logger.log_metrics(kind="eval", val_source=1.0)
    logger.close()

    path = os.path.join(str(tmp_path), "metrics.jsonl")
    lines = [json.loads(l) for l in open(path)]
    assert len(lines) == 2
    rec = lines[0]
    assert rec["kind"] == "da_epoch" and rec["phase"] == "train"
    # numpy/jax scalars coerce to plain floats, dicts per-entry,
    # non-numeric strings pass through
    assert rec["step"] == 500.0
    assert rec["val_target"] == {"all": 0.75, "MCP": 0.5}
    assert rec["checkpoint"] == "ckpt/0"
    assert isinstance(rec["time"], float)
    assert lines[1]["kind"] == "eval"

    # appends (resume semantics), never truncates
    logger2 = RunLogger(str(tmp_path), "train", tee=False)
    logger2.log_metrics(kind="da_epoch", epoch=1)
    logger2.close()
    assert len(open(path).readlines()) == 3
