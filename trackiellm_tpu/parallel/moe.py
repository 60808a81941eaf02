"""Expert parallelism (``ep``): MoE expert banks sharded across their
own mesh axis, GShard/Switch-style capacity-based dispatch.

The default MoE layout in this package shards WITHIN each expert over
``tp`` (exact, one psum, no load-balance pathology — see
``param_shardings_moe``); that caps MoE scale at what one chip's share
of EVERY expert fits. True expert parallelism lifts that cap: each
``ep`` shard owns ``E/ep`` whole experts, tokens are routed to the
shard holding their expert, and the per-chip weight bytes scale as
``E/ep`` instead of ``E``. This is the layout every large MoE
deployment (Switch, GShard, Mixtral serving) uses past ~8 experts.

TPU-native formulation (GShard, arXiv:2006.16668): routing becomes two
einsums against static-shaped one-hot dispatch/combine tensors —

    dispatch (T, E, C):  token t -> slot c of expert e  (0/1)
    combine  (T, E, C):  same support, weighted by the router prob

    xd  = einsum('tec,td->ecd', dispatch, x)   # gather per-expert slabs
    y_e = expert_e(xd[e])                      # (E, C, D), E over ep
    out = einsum('tec,ecd->td',  combine, y_e) # scatter-add back

Everything is static-shaped (capacity ``C`` bounds each expert's queue;
over-capacity tokens fall through the residual, the standard Switch
semantics), fully differentiable (the combine weights carry the router
gradient), and XLA places the collectives: with the expert axis of
``xd``/``y_e`` constrained to ``P("ep", ...)`` the dispatch/combine
einsums lower to collectives over ep and the expert matmuls run fully
local. Activations stay replicated over ep outside the expert block
(same trade the tp regions already make), so nothing else in the train
step changes.

The reference has no distributed MoE (or MoE at all — SURVEY.md §2.10);
this module is rebuild-only scaling surface.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from trackiellm_tpu.models import llm as llm_model


def capacity(n_tokens: int, n_experts: int, k: int,
             capacity_factor: float = 2.0) -> int:
    """Static per-expert queue length: ``ceil(k*T/E * factor)``, clamped
    to [1, T]. factor=1.0 only fits a perfectly balanced router; 2.0 is
    a common training default; pass ``factor >= E/k`` (C=T) for a
    provably drop-free queue (the exactness tests use this)."""
    c = -(-k * n_tokens * capacity_factor // n_experts)  # ceil
    return max(1, min(n_tokens, int(c)))


def dispatch_combine(probs: jnp.ndarray, k: int, cap: int,
                     renormalize: bool = True,
                     ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Build GShard dispatch/combine tensors from router probabilities.

    ``probs``: (T, E) f32 softmax output. Returns ``(dispatch (T,E,C),
    combine (T,E,C), weights (T,E))`` — ``weights`` is the kept,
    (optionally top-k-renormalized) per-expert weight matrix, the same
    object the dense formulation feeds the load-balancing aux loss.

    Slot assignment uses GShard priority: ALL first choices claim slots
    before any second choice (cumsum over a (K*T) flattening with k
    major), so a congested expert drops k=1 assignments before k=0 ones.
    """
    t, e = probs.shape
    topv, topi = jax.lax.top_k(probs, k)                    # (T, K)
    if renormalize:
        topv = topv / jnp.sum(topv, axis=-1, keepdims=True)
    oh = jax.nn.one_hot(topi, e, dtype=jnp.float32)         # (T, K, E)
    # Queue position of each (t, k) assignment within its expert,
    # k-major so lower k wins slots under congestion.
    oh_kt = jnp.transpose(oh, (1, 0, 2)).reshape(k * t, e)
    pos_kt = jnp.cumsum(oh_kt, axis=0) - oh_kt              # slots before
    pos = jnp.transpose(pos_kt.reshape(k, t, e), (1, 0, 2))  # (T, K, E)
    keep = oh * (pos < cap)                                 # (T, K, E)
    slot = jnp.sum(pos * oh, axis=-1).astype(jnp.int32)     # (T, K)
    slot_oh = jax.nn.one_hot(slot, cap, dtype=jnp.float32)  # (T, K, C)
    dispatch = jnp.einsum("tke,tkc->tec", keep, slot_oh)
    combine = jnp.einsum("tke,tkc->tec", keep * topv[:, :, None], slot_oh)
    weights = jnp.sum(keep * topv[:, :, None], axis=1)      # (T, E)
    return dispatch, combine, weights


def ep_moe_mlp(h2: jnp.ndarray, layer: Dict[str, Any],
               cfg: llm_model.LLMConfig, cap: int,
               ) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]]:
    """Expert-parallel SwiGLU MoE MLP over flattened tokens.

    ``h2``: (T, D) post-norm hidden states. ``layer['w_gu']`` (E, D, 2H)
    and ``layer['w_down']`` (E, H, D) are sharded ``P("ep", "fsdp",
    "tp")`` / ``P("ep", "tp", "fsdp")`` (see ``ep_param_shardings``) —
    the expert axis of every intermediate is constrained to ``ep`` so
    each shard computes only its own experts. Returns ``(out (T, D)
    f32, (probs, weights))`` — the same aux contract as the dense path.

    Matches the dense all-experts formulation exactly when ``cap``
    admits every assignment (tested); over-capacity assignments
    contribute zero (token rides the residual), the standard Switch
    drop semantics.
    """
    logits = llm_model._linear(h2, layer["moe_gate"]).astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)                 # (T, E)
    dispatch, combine, weights = dispatch_combine(
        probs, cfg.n_experts_used, cap,
        renormalize=cfg.moe_norm_topk)

    xd = jnp.einsum("tec,td->ecd", dispatch,
                    h2.astype(jnp.float32))                 # (E, C, D)
    xd = jax.lax.with_sharding_constraint(
        xd, P("ep", None, None)).astype(h2.dtype)
    gu = jnp.einsum("ecd,edf->ecf", xd,
                    layer["w_gu"]).astype(jnp.float32)      # (E, C, 2H)
    gu = jax.lax.with_sharding_constraint(gu, P("ep", None, "tp"))
    gate, up = jnp.split(gu, 2, axis=-1)
    gated = (jax.nn.silu(gate) if cfg.act == "silu"
             else jax.nn.gelu(gate, approximate=True))
    act = (gated * up).astype(h2.dtype)
    y = jnp.einsum("ecf,efd->ecd", act,
                   layer["w_down"]).astype(jnp.float32)     # (E, C, D)
    y = jax.lax.with_sharding_constraint(y, P("ep", None, None))
    out = jnp.einsum("tec,ecd->td", combine, y)             # (T, D) f32
    # Qwen2-MoE shared expert: dense, always on, replicated over ep
    # (it is one expert, not a bank) — same helper as the serving path.
    out = out + llm_model._moe_shared(h2, layer, cfg)
    return out, (probs, weights)


def ep_param_shardings(mesh, shared: bool = False,
                       cfg=None) -> Dict[str, Any]:
    """MoE param tree with expert banks sharded over ``ep`` (whole
    experts per shard) AND within-expert over fsdp/tp — composes with
    the dense tree from ``param_shardings``. Requires an ``ep`` axis in
    the mesh (``build_mesh(..., ep=N)``). ``shared``: add the
    Qwen2-MoE shared expert (ONE dense SwiGLU, not a bank — replicated
    over ep, Megatron-split over fsdp/tp)."""
    from jax.sharding import NamedSharding

    from trackiellm_tpu.parallel import sharding as shd

    if "ep" not in mesh.axis_names:
        raise ValueError(
            f"mesh {mesh.axis_names} has no 'ep' axis — build it with "
            "build_mesh(devices, ep=N)")
    base = shd.param_shardings(mesh, cfg=cfg)

    def ns(*spec) -> NamedSharding:
        return NamedSharding(mesh, P(*spec))

    base["layers"]["moe_gate"] = ns(None, None, None)
    base["layers"]["w_gu"] = ns(None, "ep", "fsdp", "tp")
    base["layers"]["w_down"] = ns(None, "ep", "tp", "fsdp")
    if shared:
        base["layers"]["shared_gu"] = ns(None, "fsdp", "tp")
        base["layers"]["shared_down"] = ns(None, "tp", "fsdp")
        base["layers"]["shared_gate"] = ns(None, None, None)
    return base
