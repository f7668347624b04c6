"""Console progress meters (host-side), mirroring ``utils/meter.py``."""

from __future__ import annotations


class AverageMeter:
    """Running average with formatted display (``utils/meter.py:4-40``)."""

    def __init__(self, name: str, fmt: str = ":f"):
        self.name = name
        self.fmt = fmt
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n: int = 1):
        val = float(val)
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / self.count if self.count > 0 else 0.0

    def __str__(self):
        fmtstr = "{name} {val" + self.fmt + "} ({avg" + self.fmt + "})"
        return fmtstr.format(**self.__dict__)


class AverageMeterDict:
    """Dict of meters keyed by group name (``utils/meter.py:43-62``)."""

    def __init__(self, names, fmt: str = ":f"):
        self.dict = {name: AverageMeter(name, fmt) for name in names}

    def update(self, accuracies, n: int = 1):
        for name, acc in accuracies.items():
            self.dict[name].update(acc, n)

    def average(self):
        return {name: m.avg for name, m in self.dict.items()}

    def __getitem__(self, name):
        return self.dict[name]


class ProgressMeter:
    """Formatted per-iteration progress line (``utils/meter.py:65-95``)."""

    def __init__(self, num_batches: int, meters, prefix: str = ""):
        self.batch_fmtstr = self._get_batch_fmtstr(num_batches)
        self.meters = meters
        self.prefix = prefix

    def display(self, batch: int):
        entries = [self.prefix + self.batch_fmtstr.format(batch)]
        entries += [str(meter) for meter in self.meters]
        print("\t".join(entries), flush=True)

    @staticmethod
    def _get_batch_fmtstr(num_batches: int) -> str:
        num_digits = len(str(num_batches // 1))
        fmt = "{:" + str(num_digits) + "d}"
        return "[" + fmt + "/" + fmt.format(num_batches) + "]"
