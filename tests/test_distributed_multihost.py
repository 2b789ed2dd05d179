"""Two-process jax.distributed smoke test for
parallel/distributed.py::maybe_initialize and the process-sharded
FaultTolerantLoader (the reference's slurm+DDP rank wiring,
/root/reference/scripts/train_lm1b.sh:9-10 + Lightning
DistributedSampler semantics).

Spawns two real OS processes on the CPU backend, points them at one
coordinator, and checks: init succeeds on both; process_count/global
device count agree; the two hosts' loader shards are disjoint and
cover the dataset.
"""

import os
import subprocess
import sys



_WORKER = r"""
import json
from ddg_tpu.parallel.distributed import maybe_initialize
ok = maybe_initialize()
import jax
import numpy as np
from ddg_tpu.data.loader import FaultTolerantLoader
assert ok, 'maybe_initialize returned False under coordinator env'
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 4, jax.device_count()
data = {'x': np.arange(64).reshape(32, 2)}
loader = FaultTolerantLoader(data, batch_size=4, seed=7,
                             drop_last=True)
ids = []
it = iter(loader)
for _ in range(4):
    batch = next(it)
    ids.extend(batch['x'][:, 0].tolist())
print(json.dumps({'pid': jax.process_index(), 'ids': sorted(ids)}))
"""


def test_two_process_init_and_loader_sharding():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    port = 12912
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        # A clean CPU environment BEFORE interpreter start: the axon
        # sitecustomize (PYTHONPATH) would otherwise initialize the
        # XLA backend at startup, which forbids
        # jax.distributed.initialize.
        env['PYTHONPATH'] = repo
        env.update({
            'PALLAS_AXON_POOL_IPS': '',
            'JAX_PLATFORMS': 'cpu',
            'XLA_FLAGS': '--xla_force_host_platform_device_count=2',
            'JAX_COORDINATOR_ADDRESS': f'127.0.0.1:{port}',
            'JAX_NUM_PROCESSES': '2',
            'JAX_PROCESS_ID': str(pid),
        })
        procs.append(subprocess.Popen(
            [sys.executable, '-c', _WORKER],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True))
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=220)
        assert p.returncode == 0, f'worker failed:\n{out}\n{err}'
        outs.append(out.strip().splitlines()[-1])

    import json
    recs = [json.loads(o) for o in outs]
    assert {r['pid'] for r in recs} == {0, 1}
    a, b = (set(r['ids']) for r in recs)
    # Disjoint host shards that jointly cover the whole dataset
    assert not (a & b), f'overlapping shards: {a & b}'
    covered = a | b
    assert len(covered) == 32, f'coverage {len(covered)}/32'
