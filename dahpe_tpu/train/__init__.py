"""Training: partitioned SGD, disparity losses, jitted DA minimax step."""

from dahpe_tpu.train import disparity, optim
from dahpe_tpu.train.da import (
    DATrainState,
    create_da_state,
    da_train_step,
    make_da_train_step,
)
from dahpe_tpu.train.ema import ema_update
from dahpe_tpu.train.fused import (
    make_fused_da_iteration,
    make_fused_pretrain_iteration,
    seed_key,
)
from dahpe_tpu.train.pretrain import (
    PretrainState,
    create_pretrain_state,
    make_pretrain_step,
    pretrain_step,
)

__all__ = [
    "disparity",
    "optim",
    "DATrainState",
    "create_da_state",
    "da_train_step",
    "make_da_train_step",
    "ema_update",
    "make_fused_da_iteration",
    "make_fused_pretrain_iteration",
    "seed_key",
    "PretrainState",
    "create_pretrain_state",
    "make_pretrain_step",
    "pretrain_step",
]
