"""Batch iteration: fault-tolerant shuffled loader + device prefetch.

Replaces the reference's torch DataLoader + RandomFaultTolerantSampler /
FaultTolerantDistributedSampler (/root/reference/dataloader.py:590-690):
the loader checkpoints its RNG state and consumed-batch counter and
fast-forwards on restore, and shards batches across hosts by
`jax.process_index()` (the DistributedSampler equivalent).

Device transfer is double-buffered: the next batch is placed on device
(with its NamedSharding) while the current step runs.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Iterator, Optional

import jax
import numpy as np


@dataclasses.dataclass
class LoaderState:
    """Serializable iteration state (sampler `state_dict` parity)."""
    epoch: int = 0
    counter: int = 0  # examples consumed within the epoch
    seed: int = 0


class FaultTolerantLoader:
    """Shuffled, host-sharded, resumable epoch iterator over numpy
    arrays of equal leading dimension."""

    def __init__(self, data: Dict[str, np.ndarray], batch_size: int, *,
                 shuffle: bool = True, seed: int = 0,
                 drop_last: bool = True,
                 process_index: Optional[int] = None,
                 process_count: Optional[int] = None,
                 native: str | bool = 'auto'):
        # native: gather batches with the C++ pipeline
        # (native/data_pipeline.cpp — threaded row gather + bounded
        # prefetch queue off the GIL, the torch-DataLoader-worker
        # equivalent). RNG / epoch order / resume state stay in
        # Python either way, so batches are identical. 'auto' = use
        # it when the library builds and all columns are numpy.
        self.data = data
        self.native = native
        n = {len(v) for v in data.values()}
        assert len(n) == 1, 'ragged dataset columns'
        self.num_examples = n.pop()
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.process_index = (jax.process_index()
                              if process_index is None else process_index)
        self.process_count = (jax.process_count()
                              if process_count is None else process_count)
        self.state = LoaderState(seed=seed)

    def state_dict(self) -> dict:
        return dataclasses.asdict(self.state)

    def load_state_dict(self, d: dict) -> None:
        self.state = LoaderState(**d)

    def _epoch_order(self, epoch: int) -> np.ndarray:
        if self.shuffle:
            rs = np.random.RandomState(
                (self.state.seed * 1_000_003 + epoch) % (2 ** 31))
            order = rs.permutation(self.num_examples)
        else:
            order = np.arange(self.num_examples)
        # Host sharding: contiguous round-robin by process
        # (FaultTolerantDistributedSampler parity).
        return order[self.process_index::self.process_count]

    def _native_pipeline(self):
        """A NativeBatchPipeline per iterator, or None (fallback)."""
        if self.native is False:
            return None
        # POD numpy columns only: an object-dtype column holds raw
        # PyObject* that the C++ memcpy would copy without refcounting
        # (over-decref on batch GC -> heap corruption).
        usable = all(isinstance(v, np.ndarray) and v.dtype != object
                     for v in self.data.values())
        if not usable:
            if self.native is True:
                raise ValueError(
                    'native loader requires numpy columns with '
                    'non-object dtypes')
            return None
        try:
            from ddg_tpu.data.native import NativeBatchPipeline
            return NativeBatchPipeline(self.data, self.batch_size)
        except RuntimeError:
            if self.native is True:
                raise
            return None

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        pipeline = self._native_pipeline()
        while True:
            order = self._epoch_order(self.state.epoch)
            n_batches = len(order) // self.batch_size
            if n_batches == 0 and (self.drop_last
                                   or len(order) == 0):
                raise ValueError(
                    f'batch_size {self.batch_size} exceeds the '
                    f'{len(order)} examples available to this host; '
                    'lower loader.eval_batch_size / batch_size')
            start_batch = self.state.counter // self.batch_size
            if pipeline is not None:
                for b, batch in pipeline.run_epoch(order, start_batch):
                    self.state.counter = (b + 1) * self.batch_size
                    yield batch
            else:
                for b in range(start_batch, n_batches):
                    idx = order[b * self.batch_size:
                                (b + 1) * self.batch_size]
                    self.state.counter = (b + 1) * self.batch_size
                    yield {k: v[idx] for k, v in self.data.items()}
            if not self.drop_last and len(order) % self.batch_size:
                idx = order[n_batches * self.batch_size:]
                yield {k: v[idx] for k, v in self.data.items()}
            self.state.epoch += 1
            self.state.counter = 0

    def take_first(self) -> Dict[str, np.ndarray]:
        """Gather the next not-yet-consumed batch via the Python path
        and advance the resume counter — for the model-init example
        batch. Behavior-identical to `next(iter(self))` but without
        spinning up (and abandoning) a native pipeline, its worker
        threads, and its contiguous column copies for a single batch."""
        order = self._epoch_order(self.state.epoch)
        b = self.state.counter // self.batch_size
        assert (b + 1) * self.batch_size <= len(order), (
            f'batch_size {self.batch_size} exceeds the {len(order)} '
            'examples available to this host')
        idx = order[b * self.batch_size:(b + 1) * self.batch_size]
        self.state.counter = (b + 1) * self.batch_size
        return {k: v[idx] for k, v in self.data.items()}

    def epoch_batches(self) -> int:
        per_host = self.num_examples // self.process_count
        return per_host // self.batch_size


def prefetch_to_device(iterator, *, size: int = 2, sharding=None):
    """Double-buffered host->device pipeline. `sharding` may be a pytree
    prefix of NamedShardings (or None for default placement)."""
    import collections
    buf = collections.deque()

    def place(batch):
        if sharding is None:
            return jax.tree.map(jax.numpy.asarray, batch)
        return jax.device_put(batch, sharding)

    for batch in iterator:
        buf.append(place(batch))
        if len(buf) >= size:
            yield buf.popleft()
    while buf:
        yield buf.popleft()
