"""Orbax checkpointing of the full training state.

Replaces the reference's Lightning ModelCheckpoint + custom hooks
(/root/reference/diffusion.py:194-250, configs/callbacks/*):
  * `last` checkpoint every N steps + `best` by val NLL;
  * EMA/SWA shadow params are part of the TrainState pytree, so they
    are saved/restored without special-casing (the reference stores
    them under checkpoint['ema']);
  * the data-loader state (epoch/counter/seed) and python-side step
    counters ride along as JSON metadata — fault-tolerant-sampler
    resume parity (diffusion.py:252-288, dataloader.py:590-690).
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, *, every_n_steps: int = 500,
                 max_to_keep: Optional[int] = None):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.every_n_steps = every_n_steps
        self.max_to_keep = max_to_keep
        self._ckptr = ocp.StandardCheckpointer()
        self.best_metric = float('inf')

    # -- paths -------------------------------------------------------------
    def _path(self, name: str) -> str:
        return os.path.join(self.directory, name)

    # -- save --------------------------------------------------------------
    def save(self, name: str, state, *, loader_state: dict = None,
             extra: dict = None) -> None:
        path = self._path(name)
        if os.path.exists(path):
            import shutil
            shutil.rmtree(path)
        self._ckptr.save(path, state)
        self._ckptr.wait_until_finished()
        meta = {'loader_state': loader_state or {},
                'extra': extra or {}}
        with open(path + '.meta.json', 'w') as f:
            json.dump(meta, f)

    def maybe_save_last(self, step: int, state, *, loader_state=None,
                        extra=None) -> bool:
        if step % self.every_n_steps != 0:
            return False
        self.save('last', state, loader_state=loader_state, extra=extra)
        return True

    def maybe_save_best(self, metric: float, state, *,
                        loader_state=None, extra=None) -> bool:
        """Keep the best-by-val-NLL checkpoint
        (configs/callbacks/checkpoint_monitor.yaml: monitor val/nll,
        mode min)."""
        if metric >= self.best_metric:
            return False
        self.best_metric = metric
        self.save('best', state, loader_state=loader_state,
                  extra={'val_nll': metric, **(extra or {})})
        return True

    def save_step_snapshot(self, step: int, state, **kw) -> None:
        """Numbered snapshot trail consumed by LCSC
        (reference main.py:122-145)."""
        self.save(f'step-{step}', state, **kw)
        if self.max_to_keep:
            snaps = sorted(self.list_snapshots())
            for s in snaps[:-self.max_to_keep]:
                import shutil
                shutil.rmtree(self._path(f'step-{s}'), ignore_errors=True)
                meta = self._path(f'step-{s}.meta.json')
                if os.path.exists(meta):
                    os.remove(meta)

    def list_snapshots(self):
        out = []
        for d in os.listdir(self.directory):
            if d.startswith('step-') and not d.endswith('.json'):
                out.append(int(d.split('-', 1)[1]))
        return sorted(out)

    # -- restore -----------------------------------------------------------
    def exists(self, name: str) -> bool:
        return os.path.isdir(self._path(name))

    def restore(self, name: str, abstract_state):
        """Restore into the structure/shardings of `abstract_state`
        (pass a concrete state or jax.eval_shape output)."""
        state = self._ckptr.restore(self._path(name), abstract_state)
        meta_path = self._path(name) + '.meta.json'
        meta = {}
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                meta = json.load(f)
        return state, meta
