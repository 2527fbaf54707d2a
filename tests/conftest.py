"""Test harness config: force the CPU backend with 8 virtual devices so
multi-chip sharding tests run anywhere (stand-in for a pod slice).

The container's sitecustomize registers the TPU PJRT plugin and pins
`jax_platforms` via jax.config at interpreter start, so env vars alone are
not enough — we must override the config after importing jax and before any
backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
