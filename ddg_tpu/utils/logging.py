"""Logging: process-zero python logger + JSONL metrics sink (wandb is
unavailable offline; the JSONL schema carries the same scalar streams
the reference logs to wandb — trainer/loss, lr, val/nll etc.,
reference diffusion.py:882-917)."""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Optional


def get_logger(name: str = 'ddg_tpu',
               level: int = logging.INFO) -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        handler = logging.StreamHandler()
        handler.setFormatter(logging.Formatter(
            '[%(asctime)s][%(name)s][%(levelname)s] - %(message)s'))
        logger.addHandler(handler)
    logger.setLevel(level)
    try:
        # Only consult the process index if a backend already exists:
        # jax.process_index() would otherwise *initialize* the backend,
        # which forbids a later jax.distributed.initialize() (multi-host
        # init must precede any backend use). Modules that call
        # get_logger at import time must stay init-neutral.
        from jax._src import xla_bridge
        if xla_bridge._backends:
            import jax
            if jax.process_index() != 0:
                logger.setLevel(logging.ERROR)
    except Exception:
        pass
    return logger


class MetricsLogger:
    """Append-only JSONL metrics stream + optional wandb mirror."""

    def __init__(self, path: Optional[str] = None,
                 use_wandb: bool = False, wandb_kwargs: dict = None):
        self.path = path
        self._fh = None
        if path:
            os.makedirs(os.path.dirname(os.path.abspath(path)),
                        exist_ok=True)
            self._fh = open(path, 'a')
        self._wandb = None
        if use_wandb:
            try:
                import wandb
                self._wandb = wandb
                wandb.init(**(wandb_kwargs or {}))
            except ImportError:
                pass

    def log(self, step: int, metrics: dict) -> None:
        record = {'step': int(step), 'time': time.time()}
        for k, v in metrics.items():
            try:
                record[k] = float(v)
            except (TypeError, ValueError):
                record[k] = v
        if self._fh:
            self._fh.write(json.dumps(record) + '\n')
            self._fh.flush()
        if self._wandb:
            self._wandb.log(metrics, step=step)

    def close(self) -> None:
        if self._fh:
            self._fh.close()
