"""Test configuration: force a virtual 8-device CPU mesh.

Tests run on CPU so they are fast and deterministic; multi-chip sharding
logic is exercised on 8 virtual devices (the driver separately dry-runs the
multi-chip path).  Must run before jax initializes its backends.
"""

import os

# The environment pins JAX_PLATFORMS=axon (the TPU tunnel); tests always run
# on CPU, so override rather than setdefault.  The axon plugin ignores the
# env var, so also force it through jax.config.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
# never spawn the WPCR prewarm thread under tests: background compiles
# skew other measurements and outlive the test that started them
os.environ.setdefault("RR_NO_PREWARM", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
