"""TensorBoard writing with the reference's scalar/image taxonomy.

Wraps torch's SummaryWriter when available (tensorboard ships in this image
via torch-cpu); degrades to a JSONL event log otherwise so headless
environments still get metrics. Tag names follow the reference
(``train_recon_loss_iter``, ``val_recon_loss``, ``val_img_<axis>`` ...,
``train_autoencoder.py:509-531,650-675``).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

__all__ = ["MetricsWriter"]


class MetricsWriter:
    def __init__(self, logdir: str, enabled: bool = True):
        self.logdir = logdir
        self.enabled = enabled
        self._tb = None
        self._jsonl = None
        if not enabled:
            return
        os.makedirs(logdir, exist_ok=True)
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._tb = SummaryWriter(logdir)
        except Exception:
            self._jsonl = open(os.path.join(logdir, "metrics.jsonl"), "a")

    def add_scalar(self, tag: str, value, step: int) -> None:
        if not self.enabled:
            return
        v = float(value)
        if self._tb is not None:
            self._tb.add_scalar(tag, v, step)
        elif self._jsonl is not None:
            self._jsonl.write(json.dumps({"t": time.time(), "tag": tag, "value": v, "step": step}) + "\n")
            self._jsonl.flush()

    def add_image(self, tag: str, img, step: int) -> None:
        """img: (1, H, W) float array in [0, 1] (or None, ignored)."""
        if not self.enabled or img is None:
            return
        arr = np.clip(np.asarray(img, dtype=np.float32), 0.0, 1.0)
        if self._tb is not None:
            self._tb.add_image(tag, arr, step, dataformats="CHW")

    def flush(self) -> None:
        if self._tb is not None:
            self._tb.flush()
        if self._jsonl is not None:
            self._jsonl.flush()

    def close(self) -> None:
        if self._tb is not None:
            self._tb.close()
        if self._jsonl is not None:
            self._jsonl.close()
