"""Test configuration: force the CPU backend with 8 virtual devices so mesh /
sharding tests run without TPU hardware, and keep numerics deterministic.

Must set env vars before jax initializes a backend, hence module scope here.
"""

import os

# Force the CPU backend even when an accelerator plugin (e.g. the axon TPU
# tunnel) is registered by sitecustomize: both the env var and the config
# update are needed, set before any backend is initialized.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
