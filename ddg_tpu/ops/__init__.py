"""Math substrate: noise schedules, forward process, posteriors, losses,
sampling primitives. Pure jnp functions — the parity-critical layer."""

from ddg_tpu.ops import forward_process  # noqa: F401
from ddg_tpu.ops import losses  # noqa: F401
from ddg_tpu.ops import noise_schedules  # noqa: F401
from ddg_tpu.ops import sampling  # noqa: F401
