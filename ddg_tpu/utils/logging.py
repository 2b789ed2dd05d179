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
    if _known_process_index() not in (None, 0):
        logger.setLevel(logging.ERROR)
    return logger


def _known_process_index():
    """Process index if the distributed runtime is initialized, else
    None — WITHOUT touching the backend: jax.process_index() would
    otherwise *initialize* it, which forbids a later
    jax.distributed.initialize() (multi-host init must precede any
    backend use). Modules that call get_logger at import time must stay
    init-neutral. jax.distributed.is_initialized() is the public
    signal: False means single-process (index 0 by definition); True
    means initialize() already ran, so jax.process_index() is safe —
    the multi-host ordering constraint is already satisfied."""
    try:
        import jax
        import jax.distributed
        if not jax.distributed.is_initialized():
            return None
        return jax.process_index()
    except Exception:
        import warnings
        warnings.warn('ddg_tpu.utils.logging: could not probe '
                      'jax.distributed state; non-zero-host log '
                      'suppression disabled', stacklevel=2)
        return None


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
