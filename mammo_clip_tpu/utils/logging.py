"""Observability: metrics logging.

Replaces the reference's DistSummaryWriter (reference:
breastclip/util/dist_summery_writer.py:6-31 — a TensorBoard writer whose every method
is master-gated through the GlobalEnv singleton) and the hidden loss->TB coupling
(loss/breast_clip.py:102-120). Here losses RETURN their sub-terms and the trainer
logs them; the logger is plain and explicitly constructed with ``enabled`` (callers
pass ``is_master()``).

Backends: TensorBoard events when the ``tensorboard`` package is available, always a
JSONL mirror (metrics.jsonl) for machine-readable scraping.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class MetricsLogger:
    def __init__(self, workdir: str, enabled: bool = True):
        self.enabled = enabled
        self._tb = {}
        self._jsonl = None
        self.workdir = workdir
        if not enabled:
            return
        os.makedirs(workdir, exist_ok=True)
        self._jsonl = open(os.path.join(workdir, "metrics.jsonl"), "a")
        try:
            from torch.utils.tensorboard import SummaryWriter  # cpu torch is baked in

            self._tb_cls = SummaryWriter
        except Exception:
            self._tb_cls = None

    def _writer(self, prefix: str):
        if self._tb_cls is None:
            return None
        if prefix not in self._tb:
            self._tb[prefix] = self._tb_cls(os.path.join(self.workdir, "tensorboard", prefix))
        return self._tb[prefix]

    def log(self, step: int, scalars: Dict[str, float], prefix: str = "train") -> None:
        if not self.enabled:
            return
        w = self._writer(prefix)
        if w is not None:
            for k, v in scalars.items():
                w.add_scalar(k, v, step)
        self._jsonl.write(
            json.dumps({"step": step, "prefix": prefix, "time": time.time(), **scalars}) + "\n"
        )
        self._jsonl.flush()

    def close(self) -> None:
        if not self.enabled:
            return
        for w in self._tb.values():
            w.close()
        if self._jsonl:
            self._jsonl.close()


class AverageMeter:
    """Running average (reference: src/codebase/utils.py:16-29)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.sum = 0.0
        self.count = 0

    def update(self, value: float, n: int = 1):
        self.sum += value * n
        self.count += n

    @property
    def avg(self) -> float:
        return self.sum / max(self.count, 1)
