"""Test bootstrap: force a virtual 8-device CPU mesh before JAX import.

Real TPU hardware is single-chip in this environment; all sharding tests
run against ``--xla_force_host_platform_device_count=8`` on CPU, which
exercises the same GSPMD partitioning paths.
"""

import os
import sys

# Must happen before anything imports jax.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

import pytest  # noqa: E402


@pytest.fixture
def rng():
    import jax

    return jax.random.PRNGKey(0)
