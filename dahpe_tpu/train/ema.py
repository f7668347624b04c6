"""Exponential moving average of a variable tree.

``update_ema_variables5`` semantics (``uda/model/loss.py:252-261``): every
state-dict entry — parameters AND batch-norm running stats — follows
``v_ema = m * v_ema + (1 - m) * v``. The reference instantiates the EMA twin
(``PoseResNetx10``) but the per-iteration update is commented out
(``train1.py:461``); we keep it as a first-class option.
"""

from __future__ import annotations

import jax


def ema_update(ema_tree, tree, decay: float):
    return jax.tree.map(lambda e, v: decay * e + (1.0 - decay) * v, ema_tree, tree)
