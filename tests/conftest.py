"""Test configuration: force the JAX CPU backend with 8 virtual devices.

Tests run on CPU (the "fake TPU") so CI needs no hardware; multi-device
sharding tests use the 8-device virtual host platform. This must happen
before jax initializes a backend, hence the env mutation at import time.
"""

import os
import sys

# Force-override: the hosting environment pre-sets JAX_PLATFORMS to the TPU
# platform, and the single TPU tunnel must not be grabbed by unit tests.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Make the repo root importable without installation.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture
def tmp_context(tmp_path):
    """A real Context over tmp_path storage (reference analog:
    tests/conftest.py:62-76)."""
    from waveformanalysis_tpu.context.context import Context

    return Context(
        storage_dir=str(tmp_path / "storage"),
        config={"show_progress": False},
    )
