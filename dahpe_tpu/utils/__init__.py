"""Infra utilities: checkpoint import/export, meters, logging."""

from dahpe_tpu.utils.meters import AverageMeter, AverageMeterDict, ProgressMeter

__all__ = ["AverageMeter", "AverageMeterDict", "ProgressMeter"]
