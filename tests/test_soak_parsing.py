"""The soak driver's log parsing (`experiments/soak.py:_parse_metrics`).

The stability assertion quartiles must see DA-iteration times ONLY: the
pretrain phase prints the same ``Time`` meter at ~1/3 the cost (1 fwd/bwd
vs 3), and mixing phases lets an epoch-split choice fake or hide a drift.
"""

from dahpe_tpu.experiments.soak import _parse_metrics

_LOG = """\
pretrain epoch 0 lr 1.00e-03
Epoch: [0][  0/50]\tTime 21.10 (21.10)\tLoss (s) 2.00e-03\tAcc (s) 0.01
Epoch: [0][ 40/50]\tTime 0.031 ( 0.52)\tLoss (s) 1.00e-03\tAcc (s) 0.10
Test: [0/8]\tLoss 1.3e+00 (1.3e+00)\tall 0.100
Source: 0.1000 best: 0.1000
Epoch: [0][  0/50]\tTime 30.00 (30.00)\tLoss (s) 1.9e-03\tLoss (t, false) 1.1e+00\tLoss (t, truth) 1.5e+00\tAcc (s) 0.11\tAcc (t) 0.02
Epoch: [0][ 40/50]\tTime 0.074 ( 0.82)\tLoss (s) 1.8e-03\tLoss (t, false) 1.0e+00\tLoss (t, truth) 1.4e+00\tAcc (s) 0.12\tAcc (t) 0.03
Source:  0.990 Target:  0.068 Target(best):  0.068
Epoch: [1][  0/50]\tTime 0.075 ( 0.08)\tLoss (s) 1.7e-03\tLoss (t, false) 0.9e+00\tLoss (t, truth) 1.3e+00\tAcc (s) 0.13\tAcc (t) 0.05
Source:  0.991 Target:  0.096 Target(best):  0.096
"""


def test_parse_metrics_da_lines_only():
    tgt, best, times = _parse_metrics(_LOG)
    assert tgt == [0.068, 0.096]
    assert best == [0.068, 0.096]
    # 3 DA display lines; the 2 pretrain Time lines (21.10, 0.031) excluded
    assert times == [30.00, 0.074, 0.075]
