"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip hardware isn't available in CI; sharding correctness is
validated on `--xla_force_host_platform_device_count=8` CPU devices.

NOTE: in this environment a sitecustomize registers the `axon` TPU
tunnel backend at interpreter start (and env JAX_PLATFORMS is already
'axon'), so we must both inject the XLA flag *and* switch jax's
platform config to cpu before any backend is used — otherwise every
test compile silently goes through the remote TPU tunnel.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)

assert jax.devices()[0].platform == "cpu", jax.devices()
import re  # noqa: E402

_m = re.search(r"xla_force_host_platform_device_count=(\d+)",
               os.environ["XLA_FLAGS"])
assert len(jax.devices()) == int(_m.group(1)), jax.devices()
