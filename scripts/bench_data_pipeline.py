"""Host-side A/B of the C++ batch-gather pipeline vs the pure-Python
gather (ddg_tpu/data/loader.py `native=True|False`).

Two measurements per shape:
  * raw gather throughput (consumer does nothing): rows/s and GB/s of
    batch assembly alone;
  * overlapped stall (consumer "trains" for STEP_MS per batch): the
    per-batch time the consumer spends WAITING on data — with the C++
    workers prefetching `lookahead` batches ahead, the wait should
    collapse toward the condvar overhead, while the Python gather runs
    serially on the consumer thread by construction.

Shapes mirror the two training regimes: LM1B-class (B=512 x L=128
int32 rows) and Species10-class (B=2 x L=32768 int32 rows).

Run: PYTHONPATH=/root/repo python scripts/bench_data_pipeline.py
(no TPU needed — this is pure host work).
"""
import json
import time

import numpy as np

from ddg_tpu.data.loader import FaultTolerantLoader


def bench(name, n_rows, row_shape, batch, step_ms, epochs=3,
          overlap_batches=40):
    rng = np.random.RandomState(0)
    data = {
        'input_ids': rng.randint(0, 30000, size=(n_rows,) + row_shape,
                                 ).astype(np.int32),
        'attention_mask': np.ones((n_rows,) + row_shape, np.float32),
    }
    bytes_per_row = sum(v.itemsize * int(np.prod(row_shape))
                        for v in data.values())
    results = {}
    for native in (False, True):
        ld = FaultTolerantLoader(dict(data), batch, seed=1,
                                 process_index=0, process_count=1,
                                 native=native)
        n_batches = ld.epoch_batches()
        it = iter(ld)
        next(it)  # warm up (build .so / first allocation)

        # raw gather: consume as fast as possible
        t0 = time.perf_counter()
        for _ in range(n_batches * epochs - 1):
            next(it)
        raw_s = time.perf_counter() - t0
        rows = batch * (n_batches * epochs - 1)

        # overlapped: consumer busy step_ms per batch; measure only the
        # time spent waiting on next(it). A fixed batch budget keeps
        # the sleep total bounded.
        ld2 = FaultTolerantLoader(dict(data), batch, seed=1,
                                  process_index=0, process_count=1,
                                  native=native)
        it2 = iter(ld2)
        next(it2)
        waits = []
        for _ in range(min(overlap_batches, n_batches * epochs - 1)):
            t0 = time.perf_counter()
            next(it2)
            waits.append(time.perf_counter() - t0)
            time.sleep(step_ms / 1e3)  # the "train step"
        results['native' if native else 'python'] = {
            'gather_rows_per_s': rows / raw_s,
            'gather_GBps': rows * bytes_per_row / raw_s / 1e9,
            'overlap_wait_ms_per_batch': 1e3 * float(np.mean(waits)),
        }
    r = results
    print(json.dumps({
        'shape': name, 'batch': batch, 'step_ms': step_ms,
        'python': {k: round(v, 3) for k, v in r['python'].items()},
        'native': {k: round(v, 3) for k, v in r['native'].items()},
        'gather_speedup': round(r['native']['gather_rows_per_s']
                                / r['python']['gather_rows_per_s'], 2),
        'wait_reduction': round(
            r['python']['overlap_wait_ms_per_batch']
            / max(r['native']['overlap_wait_ms_per_batch'], 1e-6), 1),
    }), flush=True)


if __name__ == '__main__':
    # LM1B-class: reference global batch 512, L=128
    # (scripts/train_lm1b.sh); ~100K rows keeps the A/B under a minute.
    bench('lm1b B=512 L=128', n_rows=102400, row_shape=(128,),
          batch=512, step_ms=60)
    # text8-class: B=256, L=256 (README 129.9K tok/s => ~504 ms step)
    bench('text8 B=256 L=256', n_rows=51200, row_shape=(256,),
          batch=256, step_ms=500)
    # Species10-class: B=2, L=32768 (0.297 s step)
    bench('species10 B=2 L=32768', n_rows=2048, row_shape=(32768,),
          batch=2, step_ms=297)
