"""Test config: force CPU with 8 virtual devices so sharding paths run in CI.

Mirrors SURVEY.md §4's implication: the reference has no tests; we verify
multi-device code via XLA host-device simulation instead of hardware.

NOTE: this environment exports ``JAX_PLATFORMS=axon`` (a remote TPU tunnel)
and a sitecustomize imports jax at interpreter startup, so plain
``os.environ`` tweaks are too late — the platform must be forced through
``jax.config``. Running tests against the tunnel is ~100x slower (every
dispatch is a network round trip) and occupies the bench chip.
"""

import os

# Persistent compilation cache: this box has ONE cpu core — recompiling the
# same test programs every pytest invocation dominates wall-clock otherwise.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/distdiff_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (already imported by sitecustomize; config still applies)

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

assert jax.default_backend() == "cpu", (
    "tests must run on CPU, got " + jax.default_backend()
)
assert jax.device_count() == 8, (
    f"expected 8 virtual CPU devices, got {jax.device_count()}"
)
