"""Acceptance experiments (accuracy-level evidence, not unit tests)."""

from dahpe_tpu.experiments.adaptation import run_adaptation_experiment

__all__ = ["run_adaptation_experiment"]
