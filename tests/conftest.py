"""Test config: force CPU with 8 virtual devices so sharding paths run in CI.

Mirrors SURVEY.md §4's implication: the reference has no tests; we verify
multi-device code via XLA host-device simulation instead of hardware.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")
