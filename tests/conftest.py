"""Test configuration: force JAX onto a virtual 8-device CPU mesh so
multi-chip sharding tests run without TPU hardware.

The environment pins JAX_PLATFORMS=axon via sitecustomize, so the env var
alone is not enough — override the config before any backend init."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
