"""dahpe_tpu — TPU-native domain-adaptive hand pose estimation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
CVlab315/Domain-Adaptative-Hand-Pose-Estimation (RegDA-style multiscale
adversarial domain adaptation for 2D hand keypoint detection), designed
TPU-first:

- all heatmap/pseudo-label/metric math is on-device jnp (no host round trips),
- models are Flax modules in NHWC layout feeding the MXU,
- the 3-step minimax DA iteration is a single jitted train step,
- data parallelism rides a ``jax.sharding.Mesh`` with psum gradient reduction.

Layout convention: heatmaps are ``(B, H, W, K)`` (channels-last) throughout.
Use :func:`dahpe_tpu.core.layout.to_bkhw` / ``from_bkhw`` at torch-compat
boundaries.
"""

__version__ = "0.1.0"

from dahpe_tpu import core, models, ops  # noqa: F401
