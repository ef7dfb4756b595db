"""Test harness configuration.

Tests run on the CPU backend with 8 virtual devices so multi-chip sharding
paths execute without TPU hardware, and with x64 enabled so parity tests can
compare against the float64 Python oracle bit-for-bit.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The image's sitecustomize registers the axon TPU backend and pins
# JAX_PLATFORMS=axon; tests must run on the 8-virtual-device CPU backend.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import gc

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True, scope="module")
def _release_compiled_executables():
    """Free compiled executables between test modules.

    jax caches every compiled program for the life of the process; across
    the full suite the accumulated CPU executables' mmap'd code pages
    exceed the kernel's default vm.max_map_count (65530), after which
    mmap fails and the process segfaults inside compile/cache paths
    (observed at ~50% of the suite).  Clearing per module keeps reuse
    within a module (where it matters) and caps the process-wide map
    count; the on-disk compilation cache absorbs most of the recompile
    cost across modules.
    """
    yield
    jax.clear_caches()
    gc.collect()
