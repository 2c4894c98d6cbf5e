"""Test harness config: force an 8-device virtual CPU platform so the
multi-chip sharding paths run without a TPU pod (SURVEY.md §4).

Note: the axon TPU plugin in this image ignores the JAX_PLATFORMS env var,
so the platform is forced through jax.config before any array op runs.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
# CPU compiles are fast — keep tests out of the persistent XLA cache.
# (CLI tests call enable_compilation_cache() in-process; concurrent writes
# to the shared cache dir from a parallel TPU bench process segfaulted
# jax's cache writer mid-suite.)
os.environ["RTFS_COMPILATION_CACHE"] = "0"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
