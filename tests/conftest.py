"""Test harness: run JAX on CPU (fast compiles). Sharding tests that need a
virtual 8-device mesh spawn a subprocess with
``XLA_FLAGS=--xla_force_host_platform_device_count=8`` (see test_sharding.py) —
setting that flag globally slows every XLA compile ~4x."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import pytest


@pytest.fixture(autouse=True)
def _tmp_workdir(tmp_path, monkeypatch):
    """Run each test in a temp cwd so 'saved/' and 'log/' artifacts are isolated."""
    monkeypatch.chdir(tmp_path)
    yield
