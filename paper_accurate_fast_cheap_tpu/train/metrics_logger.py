"""Training metrics logging: JSONL + optional TensorBoard.

Parity target: `wenet/utils/train_utils.py:497-503,732-796` (tensorboardX +
wandb per-step losses/lr/grad-norm/frames-seen).  Here: an append-only JSONL
file as the system of record (greppable, survives crashes) with an optional
TensorBoard writer (torch.utils.tensorboard is available in-image); wandb
is gated on importability.
"""
from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class MetricsLogger:
    def __init__(self, log_dir: Optional[str], use_tensorboard: bool = True,
                 use_wandb: bool = False, wandb_config: Dict = None):
        self.log_dir = log_dir
        self._jsonl = None
        self._tb = None
        self._wandb = None
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)
            self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a",
                               buffering=1)
            if use_tensorboard:
                try:
                    from torch.utils.tensorboard import SummaryWriter

                    self._tb = SummaryWriter(
                        os.path.join(log_dir, "tensorboard"))
                except ImportError:
                    pass
        if use_wandb:
            try:
                import wandb

                self._wandb = wandb
                wandb.init(config=wandb_config or {}, dir=log_dir)
            except ImportError:
                pass

    def log(self, step: int, metrics: Dict[str, float],
            prefix: str = "train"):
        rec = {"step": step, "time": time.time(),
               **{f"{prefix}/{k}": float(v) for k, v in metrics.items()}}
        if self._jsonl:
            self._jsonl.write(json.dumps(rec) + "\n")
        if self._tb:
            for k, v in metrics.items():
                self._tb.add_scalar(f"{prefix}/{k}", float(v), step)
        if self._wandb:
            self._wandb.log(rec, step=step)

    def close(self):
        if self._jsonl:
            self._jsonl.close()
        if self._tb:
            self._tb.close()
        if self._wandb:
            self._wandb.finish()
