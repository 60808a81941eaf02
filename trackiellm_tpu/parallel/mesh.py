"""Device mesh construction."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def _factor(n: int, max_tp: int) -> tuple[int, int, int]:
    """Split n devices into (dp, fsdp, tp): tp gets the largest power of
    two <= max_tp dividing n (tensor-parallel collectives are the most
    latency-sensitive, so tp stays small and contiguous on the ICI);
    fsdp takes the next factor of up to 4; dp absorbs the rest."""
    tp = 1
    while tp * 2 <= max_tp and n % (tp * 2) == 0:
        tp *= 2
    rem = n // tp
    fsdp = 1
    while fsdp * 2 <= 4 and rem % (fsdp * 2) == 0:
        fsdp *= 2
    dp = rem // fsdp
    return dp, fsdp, tp


def build_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    tp: Optional[int] = None,
    max_tp: int = 4,
    axis_names: tuple = ("dp", "fsdp", "tp"),
    ep: Optional[int] = None,
) -> Mesh:
    """Build a (dp, fsdp, tp) mesh over the given (or all) devices.

    ``ep``: insert an expert-parallel axis — the mesh becomes
    (dp, fsdp, ep, tp) and MoE expert banks shard whole-expert over it
    (``parallel.moe``). ep sits between fsdp and tp so the dispatch
    collectives ride an inner (fast) ICI dimension while tp keeps the
    innermost ring.

    Multi-host (DCN) generalization: when ``devices`` is None and the
    process count exceeds one, the device grid comes from
    ``mesh_utils.create_device_mesh`` — topology-aware assignment so
    tp stays on intra-host/ICI rings and dp spans hosts (the
    scaling-book layout); a flat ``jax.devices()`` reshape would
    interleave hosts across the innermost axis. Host-local batches on
    multi-host must go through :func:`shard_host_batch`, not a plain
    ``device_put``."""
    if devices is None and jax.process_count() > 1:
        from jax.experimental import mesh_utils

        n = len(jax.devices())
        if ep is not None:
            assert n % ep == 0, f"{n} devices not divisible by ep={ep}"
            rem = n // ep
            if tp is None:
                _, _, tp = _factor(rem, max_tp)
            assert rem % tp == 0, \
                f"{rem} devices not divisible by tp={tp}"
            dp, fsdp, _ = _factor(rem // tp, 1)
            grid = mesh_utils.create_device_mesh((dp, fsdp, ep, tp))
            return Mesh(grid, ("dp", "fsdp", "ep", "tp"))
        if tp is None:
            dims = _factor(n, max_tp)
        else:
            assert n % tp == 0, f"{n} devices not divisible by tp={tp}"
            _, fsdp, _ = _factor(n // tp, 1)
            dims = (n // tp // fsdp, fsdp, tp)
        grid = mesh_utils.create_device_mesh(dims)
        return Mesh(grid, axis_names)
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if ep is not None:
        assert n % ep == 0, f"{n} devices not divisible by ep={ep}"
        rem = n // ep
        if tp is None:
            _, _, tp = _factor(rem, max_tp)
        assert rem % tp == 0, f"{rem} devices not divisible by tp={tp}"
        dp, fsdp, _ = _factor(rem // tp, 1)
        arr = np.array(devices).reshape(dp, fsdp, ep, tp)
        return Mesh(arr, ("dp", "fsdp", "ep", "tp"))
    if tp is not None:
        assert n % tp == 0, f"{n} devices not divisible by tp={tp}"
        _, fsdp, _ = _factor(n // tp, 1)
        dims = (n // tp // fsdp, fsdp, tp)
    else:
        dims = _factor(n, max_tp)
    arr = np.array(devices).reshape(dims)
    return Mesh(arr, axis_names)


def shard_host_batch(mesh: Mesh, host_batch, sharding=None):
    """Place a HOST-LOCAL batch onto the mesh's data sharding,
    correctly on both single- and multi-host runs.

    Single-host: a plain ``device_put`` (the existing behavior).
    Multi-host: each process holds only its shard of the global batch;
    ``jax.make_array_from_process_local_data`` assembles the global
    array view (a cross-host ``device_put`` of another host's rows is
    impossible — this is THE multi-host data-loading seam, kept in one
    place so train loops stay host-count-agnostic)."""
    if sharding is None:
        from trackiellm_tpu.parallel.sharding import data_sharding

        sharding = data_sharding(mesh)
    if jax.process_count() > 1:
        return jax.make_array_from_process_local_data(sharding,
                                                      host_batch)
    return jax.device_put(host_batch, sharding)
