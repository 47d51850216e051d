"""Test configuration: force an 8-device virtual CPU mesh.

Multi-device sharding tests run on virtual CPU devices per the project's test
strategy (SURVEY.md §4); real-TPU execution is exercised by bench.py and the
driver's compile checks instead.

Note: this environment may pre-register a TPU backend from sitecustomize
before pytest starts, so setting JAX_PLATFORMS in the environment is not
enough — we also override jax's config after import.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the fused train-step graphs take minutes to
# compile on CPU; cache them across test runs.
_cache_dir = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(0)
