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
    innermost ring."""
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
