"""Training runtime: state, optimizer, weight averaging, checkpointing."""

from ddg_tpu.runtime import averaging  # noqa: F401
from ddg_tpu.runtime import optim  # noqa: F401
from ddg_tpu.runtime import train_state  # noqa: F401
