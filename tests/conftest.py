"""Test configuration: force an 8-virtual-device CPU platform so multi-chip
sharding paths are exercised without TPU hardware.

The container's sitecustomize eagerly registers and *initializes* the axon
TPU PJRT backend before any conftest runs, so plain env vars are too late —
tests would silently run over the (slow, single-chip) TPU tunnel. We clear
the initialized backends and re-select the CPU platform in-process.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
import jax._src.xla_bridge as _xb  # noqa: E402

if jax.config.jax_platforms != "cpu":
    _xb._clear_backends()
    jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu" and len(jax.devices()) == 8

jax.config.update("jax_threefry_partitionable", True)
# On TPU the "default" matmul precision uses bf16 inputs; tests compare
# against fp32 torch references, so force full fp32 matmuls.
jax.config.update("jax_default_matmul_precision", "float32")
