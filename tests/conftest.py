"""Test harness: force JAX onto the host CPU backend.

NOTE: this environment's sitecustomize registers a TPU-tunnel ('axon')
backend in every interpreter and forces ``jax_platforms="axon,cpu"`` — the
``JAX_PLATFORMS`` env var alone does NOT stick. Overriding the config after
import (before first backend use) is what actually pins tests to CPU; without
it, concurrent test processes fight over the single TPU chip and deadlock.

Sharding tests that need a virtual 8-device mesh spawn a subprocess with
``XLA_FLAGS=--xla_force_host_platform_device_count=8`` (see test_sharding.py).
"""

import os

import jax

jax.config.update("jax_platforms", "cpu")

# persistent compilation cache: repeat test runs skip XLA compiles entirely
_CACHE_DIR = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import pytest


@pytest.fixture(autouse=True)
def _tmp_workdir(tmp_path, monkeypatch):
    """Run each test in a temp cwd so 'saved/' and 'log/' artifacts are isolated."""
    monkeypatch.chdir(tmp_path)
    yield
