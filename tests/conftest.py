"""Test harness: force CPU with 8 virtual devices so kernels and sharding are
testable without TPU hardware (SURVEY.md §4 test strategy).

Note: this environment injects a TPU backend via sitecustomize (which imports
jax at interpreter start), so env vars are too late — use jax.config instead.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
