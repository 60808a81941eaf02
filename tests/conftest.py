"""Test bootstrap: force a virtual 8-device CPU mesh before JAX import.

Real TPU hardware is single-chip in this environment; all sharding tests
run against ``--xla_force_host_platform_device_count=8`` on CPU, which
exercises the same GSPMD partitioning paths.
"""

import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

import jax  # noqa: E402

# This image's sitecustomize registers the "axon" TPU tunnel backend at
# interpreter start, which wins over the JAX_PLATFORMS env var — force the
# selection through the config instead (the CPU plugin reads XLA_FLAGS
# lazily, so the 8-device override above still applies).
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache across test runs (VERDICT r4 #7): the
# suite's cost is dominated by XLA:CPU compiles (4-16 s apiece for the
# server/cortex programs); pointing the JAX persistent cache at a
# repo-local dir makes warm `make smoke` reuse every unchanged program
# (measured: cold 7m35 -> warm 3m47). OPT-IN (make smoke sets it):
# deserialized executables for SOME of the slow tier's GSPMD train
# steps ABORT at execution on this jax version (reproduced: the
# family-zoo sharded train step passes cold and SIGABRTs from a warm
# cache entry), so the full suite must run uncached. The per-module
# clear_caches() below still bounds live JIT code.
_CACHE_DIR = os.environ.get("TRACKIE_TEST_COMPILE_CACHE", "0")
if _CACHE_DIR == "1":
    _CACHE_DIR = os.path.join(_REPO_ROOT, ".jax_test_cache")
if _CACHE_DIR and _CACHE_DIR != "0":
    jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

import pytest  # noqa: E402


@pytest.fixture
def rng():
    import jax

    return jax.random.PRNGKey(0)


@pytest.fixture(autouse=True, scope="module")
def _bounded_jit_executable_pool():
    """Release compiled executables between test modules.

    The full suite compiles many hundreds of distinct XLA:CPU programs in
    one process; with all of them held live by the pjit caches, the
    accumulated JIT code eventually segfaults inside LLVM
    (backend_compile_and_load) late in the run — individual files always
    pass.  Dropping the caches per module bounds the live-code footprint;
    jitted functions simply recompile on next use.
    """
    yield
    jax.clear_caches()
