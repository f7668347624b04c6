"""Custom differentiation ops and Pallas TPU kernels."""

from dahpe_tpu.ops.gradient_scale import gradient_scale, warm_start_coeff

__all__ = ["gradient_scale", "warm_start_coeff"]
