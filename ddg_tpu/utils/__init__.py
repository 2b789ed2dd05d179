"""Utilities: logging, metrics sinks."""

from ddg_tpu.utils.logging import MetricsLogger, get_logger  # noqa: F401
