"""Test configuration: CPU backend with an 8-device virtual mesh.

Multi-chip sharding is validated on a virtual CPU mesh (the driver separately
dry-runs the real multi-chip path); single-chip numerics don't depend on the
backend.
"""

import os

# The sandbox's sitecustomize pins JAX_PLATFORMS=axon (remote TPU tunnel);
# tests must run on local CPU with a virtual 8-device mesh, so override via
# jax.config (which beats the env var) before any backend is initialized.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_platforms", "cpu")

import pathlib

import numpy as np
import pytest

GOLDEN_DIR = pathlib.Path(__file__).parent / "golden"


def golden_envs():
    return sorted(p.stem for p in GOLDEN_DIR.glob("*.npz"))


@pytest.fixture(scope="session")
def golden():
    """name -> npz mapping of reference traces (loaded lazily)."""
    cache = {}

    def load(name):
        if name not in cache:
            cache[name] = np.load(GOLDEN_DIR / f"{name}.npz")
        return cache[name]

    return load
