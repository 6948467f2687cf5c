"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh (no multi-chip TPU hardware in CI);
the environment must be set before the first ``import jax`` anywhere.
"""

import os

# The ambient environment pins JAX_PLATFORMS=axon (the tunneled TPU) and its
# sitecustomize imports jax at interpreter start, so env-var overrides here
# are too late for jax's config snapshot. Force the platform through
# jax.config instead; XLA_FLAGS is still read lazily at first backend init.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
