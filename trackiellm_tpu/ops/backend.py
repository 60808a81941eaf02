"""Backend dispatch for ops with both Pallas-TPU and XLA paths.

Several hot ops (quantized matmul, flash attention) have a Pallas TPU
kernel and an XLA oracle. The dispatch normally keys on the process
default backend, but hermetic checks that compile for CPU devices in a
process whose *default* backend is TPU (the driver's multichip dryrun)
must never trace the Pallas path — ``TRACKIE_FORCE_XLA_OPS=1`` forces
the XLA path regardless of the default backend.
"""

from __future__ import annotations

import os

import jax


def on_tpu() -> bool:
    """True when ops should lower to Pallas TPU kernels."""
    if os.environ.get("TRACKIE_FORCE_XLA_OPS") == "1":
        return False
    return jax.default_backend() == "tpu"
