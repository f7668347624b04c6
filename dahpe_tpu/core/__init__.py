"""Pure, stateless jnp ops: heatmap rendering, decoding, metrics, geometry.

These are the on-device replacements for the reference's numpy/CPU utility
layer (``utils/keypoint_detection.py``, ``uda/dataset/util.py``, and the
pseudo-label generators in ``uda/model/regda_4.py`` / ``regda_7.py``).
"""

from dahpe_tpu.core import geometry, heatmap, layout, losses, metrics
from dahpe_tpu.core.decode import get_max_preds, soft_argmax_decode
from dahpe_tpu.core.heatmap import (
    gaussian_window_reach,
    generate_target,
    pseudo_label_gt,
    render_gaussian,
)
from dahpe_tpu.core.losses import joints_kl_loss, joints_mse_loss
from dahpe_tpu.core.metrics import pck_accuracy

__all__ = [
    "geometry",
    "heatmap",
    "layout",
    "losses",
    "metrics",
    "get_max_preds",
    "soft_argmax_decode",
    "gaussian_window_reach",
    "generate_target",
    "pseudo_label_gt",
    "render_gaussian",
    "joints_kl_loss",
    "joints_mse_loss",
    "pck_accuracy",
]
