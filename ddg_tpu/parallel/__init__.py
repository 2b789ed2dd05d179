"""Mesh + sharding (data parallel / fsdp over ICI)."""

from ddg_tpu.parallel import mesh  # noqa: F401
