"""Multi-host initialization (the slurm/srun + NCCL-env equivalent).

The reference launches one process per GPU under slurm and lets
Lightning/NCCL wire them (scripts/train_lm1b.sh:9-10). On TPU pods,
one process per host calls `jax.distributed.initialize()` and the
runtime discovers the ICI topology; data loading shards by
`jax.process_index()` (data/loader.py).
"""

from __future__ import annotations

import os

from ddg_tpu.utils import get_logger

LOGGER = get_logger(__name__)


def maybe_initialize(coordinator_address: str = None,
                     num_processes: int = None,
                     process_id: int = None) -> bool:
    """Initialize jax.distributed when running multi-host.

    No-op on single-host (including this repo's 1-chip dev setup).
    Arguments fall back to the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID) or
    TPU-pod auto-detection.
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get(
        'JAX_COORDINATOR_ADDRESS')
    explicit = coordinator_address is not None
    auto_pod = os.environ.get('TPU_WORKER_HOSTNAMES', '') not in ('',
                                                                  'localhost')
    if not explicit and not auto_pod:
        return False
    try:
        if explicit:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=int(num_processes
                                  or os.environ['JAX_NUM_PROCESSES']),
                process_id=int(process_id
                               or os.environ['JAX_PROCESS_ID']))
        else:
            jax.distributed.initialize()
        LOGGER.info(
            f'jax.distributed initialized: process '
            f'{jax.process_index()}/{jax.process_count()}')
        return True
    except Exception as e:  # already initialized / single host
        LOGGER.warning(f'jax.distributed.initialize skipped: {e}')
        return False
