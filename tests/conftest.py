"""Test harness configuration.

Tests run on CPU in float64 (Julia-parity mode) with 8 virtual devices so
multi-chip sharding paths are exercised without TPU hardware (SURVEY.md §4,
"TPU-build test implications").

The container's sitecustomize registers the TPU (axon) backend at interpreter
startup, before this conftest runs; backend *initialization* is lazy, so
switching ``jax_platforms`` here (before any array op) still wins, and
``XLA_FLAGS`` is likewise only read when the CPU backend first initializes.
"""

import os
import pathlib

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402

DATA_DIR = pathlib.Path(__file__).parent / "data"


@pytest.fixture
def data_dir() -> pathlib.Path:
    return DATA_DIR


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Free compiled executables between test modules.

    One pytest process accumulates every compiled CPU XLA program (full-MCMC
    compiles are ~hundreds of MB each); without this the suite dies with
    'Fatal Python error: Aborted' (allocator abort) near the end. Clearing
    per module bounds the growth at the cost of cross-module recompiles
    (programs are rarely shared across modules anyway).
    """
    yield
    jax.clear_caches()
