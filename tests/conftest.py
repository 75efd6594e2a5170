"""Test environment: force the JAX CPU backend with 8 virtual devices so
multi-chip sharding paths are exercised without TPU hardware (see
SURVEY.md section 4 on the rebuilt test strategy).

Note: this machine's sitecustomize force-registers the `axon` TPU-tunnel
platform and overrides JAX_PLATFORMS, so env vars alone are not enough —
jax.config must be updated after import.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
