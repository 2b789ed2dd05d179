"""ddg_tpu — TPU-native discrete diffusion guidance framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
`discrete-diffusion-guidance` (UDLM, arXiv 2412.10193): AR / MDLM / UDLM
parameterizations, DiT / DiMamba / UNet denoisers, D-CFG / D-CBG / FUDGE /
NOS guided decoding, and the text8 / LM1B / QM9 / Amazon-Polarity /
Species10 / CIFAR10 data+eval stack.

The compute path is functional JAX (`jax.jit` + `lax.scan` + Pallas kernels);
parallelism is expressed with `jax.sharding.Mesh` + NamedSharding over a
`data` (and optional `fsdp`) axis rather than DDP/NCCL.
"""

__version__ = "0.1.0"

from ddg_tpu import ops  # noqa: F401
