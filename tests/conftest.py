"""Test configuration: force an 8-device virtual CPU platform.

Multi-device sharding tests run on CPU via device-count spoofing (the
strategy SURVEY.md §4 prescribes); the real-TPU benchmark path is bench.py,
which does NOT import this module.

The TPU-tunnel plugin (sitecustomize in /root/.axon_site) registers itself
by *config* (``jax_platforms='axon,cpu'``), which overrides JAX_PLATFORMS
env vars — so the override here must also be config-level.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # for any subprocesses
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# Persistent compilation cache: repeated test runs skip recompiles.
jax.config.update("jax_compilation_cache_dir", "/tmp/osr_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(42)
