"""Data layer: tokenizers, datasets, fault-tolerant loaders."""

from ddg_tpu.data import datasets  # noqa: F401
from ddg_tpu.data import loader  # noqa: F401
from ddg_tpu.data import tokenizers  # noqa: F401
