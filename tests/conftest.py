"""Test configuration: force JAX onto a virtual 8-device CPU mesh so sharding
and multi-chip code paths are exercised without TPU hardware (SURVEY.md §4).

NOTE: in the axon environment jax is pre-imported at interpreter startup with
JAX_PLATFORMS=axon (TPU tunnel), so plain env vars are too late — we must
override via jax.config before any backend is initialized.
"""
import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")
