"""Metric sinks: JSONL (always), TensorBoard and Weights & Biases (optional).

Dual-sink parity with the reference (``SummaryWriter`` + optional wandb run,
``train_fp8.py:836-844``), with a JSONL file as the always-available sink in
air-gapped environments.
"""
from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional

__all__ = ["MetricLogger"]


class MetricLogger:
    def __init__(
        self,
        log_dir: str,
        *,
        use_tensorboard: bool = True,
        use_wandb: bool = False,
        wandb_project: str = "llm-fp8-tpu",
        wandb_run_name: Optional[str] = None,
        config: Optional[dict] = None,
    ):
        os.makedirs(log_dir, exist_ok=True)
        self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        self._tb = None
        self._wandb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_dir)
            except Exception:
                pass
        if use_wandb:
            try:
                import wandb

                self._wandb = wandb.init(
                    project=wandb_project, name=wandb_run_name, config=config
                )
            except Exception:
                pass

    def log(self, metrics: Dict[str, float], step: int, prefix: str = ""):
        tagged = {
            (f"{prefix}/{k}" if prefix else k): float(v)
            for k, v in metrics.items()
            if isinstance(v, (int, float))
        }
        self._jsonl.write(
            json.dumps({"step": step, "time": time.time(), **tagged}) + "\n"
        )
        self._jsonl.flush()
        if self._tb is not None:
            for k, v in tagged.items():
                self._tb.add_scalar(k, v, step)
        if self._wandb is not None:
            self._wandb.log(tagged, step=step)

    def log_summary(self, summary: Dict):
        self._jsonl.write(json.dumps({"summary": summary}, default=str) + "\n")
        self._jsonl.flush()
        if self._wandb is not None:
            for k, v in summary.items():
                try:
                    self._wandb.summary[k] = v
                except Exception:
                    pass

    def close(self):
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
        if self._wandb is not None:
            self._wandb.finish()
