"""Sharded LM training step (fine-tuning path + multichip dry-run).

The reference ships inference only; this module is the rebuild's
fine-tuning/adaptation path and the harness for validating the multi-chip
sharding design. One jitted ``train_step`` carries the full
forward + backward + AdamW update with GSPMD shardings from
:mod:`trackiellm_tpu.parallel.sharding`; XLA places the collectives
(psum for row-parallel matmuls and gradient reduction, all-gathers for
fsdp parameter shards) on the ICI mesh.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh

from trackiellm_tpu.models import llm as llm_model
from trackiellm_tpu.parallel import sharding as shd


def vocab_parallel_embed(tok_emb: jnp.ndarray, tokens: jnp.ndarray,
                         mesh: Mesh,
                         sequence_parallel: bool = False) -> jnp.ndarray:
    """Embedding lookup with the vocabulary sharded over ``tp``
    (the Megatron-LM VocabParallelEmbedding scheme): each tp shard
    gathers only ids inside its vocab slice (masked local gather) and
    the shards psum — or psum_scatter straight into the Megatron-SP
    sequence layout, halving the collective bytes.

    Without this, the plain ``tok_emb[tokens]`` gather over a
    tp-sharded table cannot be resharded efficiently and GSPMD
    replicates the whole table per step ("Involuntary full
    rematerialization", MULTICHIP_r04 tail — HBM + ICI burned per
    step; VERDICT r4 #3). The backward transpose keeps gradients
    shard-local: each chip scatter-adds only into its own vocab rows.
    Loss-identity with the plain gather is pinned in
    tests/test_parallel.py."""
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    tp = mesh.shape["tp"]
    v_local = tok_emb.shape[0] // tp
    out_spec = (shd.sequence_spec() if sequence_parallel
                else shd.activation_spec())

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P("tp", "fsdp"), P(("dp", "fsdp"), None)),
        out_specs=out_spec, check_rep=False)
    def run(emb_local, toks):
        # fsdp shards the feature axis of the table too: restore the
        # full (V/tp, D) block (same move as vocab_parallel_ce).
        emb_local = jax.lax.all_gather(emb_local, "fsdp", axis=1,
                                       tiled=True)
        shard = jax.lax.axis_index("tp")
        local = toks - shard * v_local
        ok = (local >= 0) & (local < v_local)
        x = emb_local[jnp.clip(local, 0, v_local - 1)]   # (b, S, D)
        x = jnp.where(ok[..., None], x, jnp.zeros((), x.dtype))
        if sequence_parallel:
            return jax.lax.psum_scatter(x, "tp", scatter_dimension=1,
                                        tiled=True)
        return jax.lax.psum(x, "tp")

    return run(tok_emb, tokens)


def lm_forward_batched(params: Dict[str, Any], cfg: llm_model.LLMConfig,
                       tokens: jnp.ndarray,
                       sequence_parallel: bool = False,
                       expert_parallel: bool = False,
                       moe_capacity_factor: float = 2.0,
                       mesh: Mesh = None,
                       return_hidden: bool = False) -> jnp.ndarray:
    """Batched causal LM forward: (B, S) int32 tokens ->
    ``(logits (B, S, V) f32, aux)`` — ``aux`` is the per-layer router
    stats tuple for MoE configs and None for dense ones (a single
    return contract; callers no longer branch on cfg.n_experts).

    Layer-scanned like the inference path through the SHARED
    config-aware layer body (:mod:`trackiellm_tpu.parallel.layers` —
    the full family zoo: QKV biases, Gemma-2 softcaps/sandwich
    norms/alternating windows, query scaling, GeGLU), with explicit
    sharding constraints on activations and attention heads, and
    rematerialization per layer (``jax.checkpoint``) to trade FLOPs
    for HBM during the backward pass. Per-row equality with
    models/llm.py prefill is tested for plain AND zoo configs.

    ``sequence_parallel``: shard the residual stream's SEQUENCE axis
    over tp in the norm/residual regions (:func:`shd.sequence_spec`) —
    Megatron SP. GSPMD then lowers the row-parallel psums as
    reduce-scatter and all-gathers back before each column-parallel
    matmul; same math (loss equality tested on the virtual mesh),
    1/tp the norm compute and residual remat bytes per chip.

    ``expert_parallel``: route MoE layers through the GShard
    capacity-based dispatch (:mod:`trackiellm_tpu.parallel.moe`) so
    expert banks shard whole-expert over an ``ep`` mesh axis;
    ``moe_capacity_factor`` sets the static per-expert queue bound
    (over-capacity tokens ride the residual — Switch drop semantics,
    so the loss is only dense-equal at a drop-free factor >= E/k).
    """
    from trackiellm_tpu.parallel import layers as shared_layers

    b, s = tokens.shape
    if expert_parallel and cfg.n_experts:
        from trackiellm_tpu.parallel import moe as ep_moe
        moe_cap = ep_moe.capacity(b * s, cfg.n_experts,
                                  cfg.n_experts_used, moe_capacity_factor)
    res_spec = (shd.sequence_spec() if sequence_parallel
                else shd.activation_spec())
    freqs = llm_model._freqs(params, cfg, s)
    positions = jnp.arange(s)
    if (mesh is not None and mesh.shape.get("tp", 1) > 1
            and cfg.vocab_size % mesh.shape["tp"] == 0):
        # Megatron vocab-parallel lookup: avoids GSPMD's involuntary
        # full rematerialization of the tp-sharded embedding table.
        x = vocab_parallel_embed(params["tok_emb"], tokens, mesh,
                                 sequence_parallel)
    else:
        x = params["tok_emb"][tokens]  # (B, S, D)
        x = jax.lax.with_sharding_constraint(x, res_spec)

    def res_con(t):
        return jax.lax.with_sharding_constraint(t, res_spec)

    def q_con(t):
        return jax.lax.with_sharding_constraint(t, shd.heads_spec())

    mlp_fn = None
    if cfg.n_experts:
        def mlp_fn(x, layer):
            # Sparse MoE MLP with router-aux collection for the
            # load-balancing loss. Two formulations: the GShard
            # expert-parallel dispatch (whole experts over ep), or the
            # dense all-experts one — every expert computes, weighted
            # by the zero-off-top-k (T, E) matrix. Both differentiable
            # end to end (the kept weights carry the router gradient),
            # static shapes, expert matmuls Megatron-sharded.
            h2 = llm_model._rms_norm(x, layer["mlp_norm"], cfg.norm_eps)
            flat = h2.reshape(b * s, -1)
            if expert_parallel:
                out, aux = ep_moe.ep_moe_mlp(flat, layer, cfg, moe_cap)
            else:
                logits_r = llm_model._linear(
                    flat, layer["moe_gate"]).astype(jnp.float32)
                probs = jax.nn.softmax(logits_r, axis=-1)    # (T, E)
                topv, topi = jax.lax.top_k(probs, cfg.n_experts_used)
                if cfg.moe_norm_topk:
                    topv = topv / jnp.sum(topv, axis=-1, keepdims=True)
                weights = jnp.sum(
                    jax.nn.one_hot(topi, cfg.n_experts, dtype=jnp.float32)
                    * topv[..., None], axis=-2)              # (T, E)
                out = llm_model._moe_shared(flat, layer, cfg)
                for e in range(cfg.n_experts):
                    gu = llm_model._linear(
                        flat, layer["w_gu"][e]).astype(jnp.float32)
                    gate, up = jnp.split(gu, 2, axis=-1)
                    y = llm_model._linear(
                        (jax.nn.silu(gate) * up).astype(x.dtype),
                        layer["w_down"][e])
                    out = out + weights[:, e:e + 1] * y.astype(jnp.float32)
                aux = (probs, weights)
            return x + out.astype(x.dtype).reshape(b, s, -1), aux

    @functools.partial(jax.checkpoint, policy=None)
    def layer_fn(x, inputs):
        layer, li = inputs
        return shared_layers.transformer_layer(
            x, layer, li, cfg, freqs, positions,
            attn_core=lambda q, k, v, li2: shared_layers.dense_attn_core(
                cfg, li2, q, k, v, positions),
            mlp_fn=mlp_fn, q_constrain=q_con, res_constrain=res_con)

    x, aux = jax.lax.scan(layer_fn, x,
                          (params["layers"], jnp.arange(cfg.n_layers)))
    if return_hidden:
        # Final-norm hidden states for the vocab-parallel CE (the
        # (B, S, V) logits never materialize — Megatron's trick).
        return llm_model._norm(x, params["out_norm"], cfg.norm_eps,
                               cfg.norm_type), aux
    logits = llm_model._output_logits(params, cfg, x)
    return logits, aux


def moe_load_balancing_loss(aux, cfg: llm_model.LLMConfig) -> jnp.ndarray:
    """Mixtral/Switch load-balancing auxiliary loss, averaged over
    layers: E * sum_e( frac_tokens_dispatched_e * mean_router_prob_e ).
    1.0 at a perfectly uniform router; grows as experts collapse."""
    probs, weights = aux                 # each (L, T, E)
    dispatch = (weights > 0).astype(jnp.float32)
    # Fraction of (token, k)-assignments landing on each expert —
    # normalized by K so it sums to 1 over experts (the HF Mixtral
    # convention, where uniform routing scores exactly 1.0).
    frac = jnp.mean(dispatch, axis=1) / cfg.n_experts_used   # (L, E)
    imp = jnp.mean(probs, axis=1)        # (L, E) mean router prob
    return jnp.mean(cfg.n_experts * jnp.sum(frac * imp, axis=-1))


def lm_loss(params, cfg, tokens, sequence_parallel: bool = False,
            moe_aux_coef: float = 0.02, expert_parallel: bool = False,
            moe_capacity_factor: float = 2.0,
            mesh: Mesh = None) -> jnp.ndarray:
    """Next-token cross-entropy over (B, S) tokens (shifted). MoE
    configs add ``moe_aux_coef`` x the load-balancing loss (Mixtral's
    router_aux_loss_coef default).

    Under a tp>1 ``mesh`` (and no logit softcap), the loss runs
    VOCAB-PARALLEL end to end: the forward returns final-norm hidden
    states and :func:`vocab_parallel_ce` computes the CE against the
    tp-sharded lm_head without ever materializing (B, S, V) logits —
    peak activation memory per chip stays V/tp wide (round 5; the
    function existed since round 3 but the train step never used it).
    Loss identity with the full-logits path is pinned in
    tests/test_parallel.py."""
    use_vp_ce = (mesh is not None and mesh.shape.get("tp", 1) > 1
                 and cfg.logit_softcap <= 0.0
                 and cfg.vocab_size % mesh.shape["tp"] == 0)
    hidden_or_logits, aux = lm_forward_batched(
        params, cfg, tokens, sequence_parallel,
        expert_parallel=expert_parallel,
        moe_capacity_factor=moe_capacity_factor, mesh=mesh,
        return_hidden=use_vp_ce)
    if use_vp_ce:
        loss = vocab_parallel_ce(hidden_or_logits, params["lm_head"],
                                 tokens, mesh)
    else:
        logits = hidden_or_logits
        targets = tokens[:, 1:]
        logp = jax.nn.log_softmax(logits[:, :-1], axis=-1)
        nll = -jnp.take_along_axis(logp, targets[..., None],
                                   axis=-1)[..., 0]
        loss = jnp.mean(nll)
    if aux is not None and moe_aux_coef:
        loss = loss + moe_aux_coef * moe_load_balancing_loss(aux, cfg)
    return loss


def make_optimizer(lr: float = 1e-4) -> optax.GradientTransformation:
    return optax.adamw(lr, b1=0.9, b2=0.95, weight_decay=0.01)


def _pick_param_shardings(cfg: llm_model.LLMConfig, mesh: Mesh):
    """Dense tree, within-expert MoE tree, or whole-expert ``ep`` tree —
    chosen by the config and whether the mesh carries an ep axis."""
    if not cfg.n_experts:
        return shd.param_shardings(mesh, cfg=cfg)
    shared = bool(cfg.moe_shared_hidden)
    if "ep" in mesh.axis_names:
        from trackiellm_tpu.parallel import moe as ep_moe
        return ep_moe.ep_param_shardings(mesh, shared=shared, cfg=cfg)
    return shd.param_shardings_moe(mesh, shared=shared, cfg=cfg)


def init_train_state(key: jax.Array, cfg: llm_model.LLMConfig, mesh: Mesh,
                     lr: float = 1e-4,
                     dtype=jnp.float32) -> Tuple[Dict, Any, Any]:
    """Sharded param + optimizer state init (params materialize directly
    in their shards via jit out_shardings — no full replica ever exists)."""
    p_shard = _pick_param_shardings(cfg, mesh)
    opt = make_optimizer(lr)

    with mesh:
        params = jax.jit(
            functools.partial(llm_model.init_params, cfg=cfg, dtype=dtype),
            out_shardings=p_shard,
        )(key)
        opt_state = jax.jit(
            opt.init,
            out_shardings=None,  # derived from params' shardings by XLA
        )(params)
    return params, opt_state, opt


def make_train_step(cfg: llm_model.LLMConfig, mesh: Mesh,
                    opt: optax.GradientTransformation,
                    sequence_parallel: bool = True,
                    moe_capacity_factor: float = 2.0):
    """Build the jitted, fully-sharded train step.

    ``sequence_parallel`` defaults on: with tp=1 meshes the constraint
    is a no-op, and with tp>1 it is the strictly better layout (see
    lm_forward_batched). MoE configs on a mesh with an ``ep`` axis
    automatically use the expert-parallel GShard dispatch
    (whole-expert sharding, ``moe_capacity_factor`` queue bound)."""
    p_shard = _pick_param_shardings(cfg, mesh)
    d_shard = shd.data_sharding(mesh)
    expert_parallel = bool(cfg.n_experts) and "ep" in mesh.axis_names

    def train_step(params, opt_state, tokens):
        loss, grads = jax.value_and_grad(lm_loss)(
            params, cfg, tokens, sequence_parallel=sequence_parallel,
            expert_parallel=expert_parallel,
            moe_capacity_factor=moe_capacity_factor, mesh=mesh)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return jax.jit(
        train_step,
        in_shardings=(p_shard, None, d_shard),
        out_shardings=(p_shard, None, None),
        donate_argnums=(0, 1),
    )


def save_train_state(path: str, params, opt_state, step: int = 0) -> None:
    """Persist a (possibly sharded) train state with orbax — each host
    writes its shards; restore re-places them on any compatible mesh.
    The reference's persistence story is single-file model artifacts
    (SURVEY.md section 5.4); this is the distributed-training analogue
    the rebuild adds on top."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, {"params": params, "opt_state": opt_state,
                      "step": jnp.int32(step)})
    ckptr.wait_until_finished()


def restore_train_state(path: str, cfg: llm_model.LLMConfig, mesh: Mesh,
                        lr: float = 1e-4, dtype=jnp.float32):
    """Restore (params, opt_state, opt, step) sharded onto ``mesh``.

    The abstract target (shapes + shardings for every leaf, including
    the optimizer tree) comes from materializing a throwaway fresh
    state via :func:`init_train_state` — simple and always consistent
    with how training would lay the state out; the transient costs one
    extra state's memory during restore."""
    import orbax.checkpoint as ocp

    from jax.sharding import NamedSharding, PartitionSpec

    params0, opt_state0, opt = init_train_state(
        jax.random.PRNGKey(0), cfg, mesh, lr=lr, dtype=dtype)
    # Leaves the init jit left on one device (optimizer scalars) are
    # UNCOMMITTED there, so training jits reshard them freely — but a
    # restored array is committed, so map those to replicated-on-mesh.
    shardings = jax.tree.map(
        lambda a: (a.sharding if isinstance(a.sharding, NamedSharding)
                   else NamedSharding(mesh, PartitionSpec())),
        {"params": params0, "opt_state": opt_state0})
    target = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype,
                                       sharding=a.sharding),
        {"params": params0, "opt_state": opt_state0,
         "step": jnp.int32(0)})
    del params0, opt_state0
    restored = ocp.StandardCheckpointer().restore(path, target)
    # Re-place explicitly: orbax can restore scalar leaves onto a single
    # device even when the abstract target names a mesh sharding, and a
    # mixed device set fails the next jitted step.
    placed = jax.device_put({"params": restored["params"],
                             "opt_state": restored["opt_state"]}, shardings)
    return (placed["params"], placed["opt_state"], opt,
            int(restored["step"]))


def vocab_parallel_ce(x: jnp.ndarray, lm_head, tokens: jnp.ndarray,
                      mesh: Mesh) -> jnp.ndarray:
    """Cross-entropy with the vocabulary sharded over ``tp`` and the
    full (B, S, V) logits never replicated (the Megatron trick).

    ``x``: final-norm hidden states (B, S, D); ``lm_head``: (D, V)
    column-sharded over tp; ``tokens``: (B, S) int32 (targets are the
    shifted tokens, computed inside). Each tp shard computes its local
    (B, S-1, V/tp) logit slab, the softmax statistics reduce with two
    psums (max, sum-exp), and the target logit comes from a masked
    local lookup + psum — so peak memory per chip stays V/tp wide.
    Matches lm_loss's cross-entropy exactly (tested)."""
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    tp = mesh.shape["tp"]
    v_local = lm_head.shape[1] // tp

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(shd.activation_spec(), P("fsdp", "tp"),
                  P(("dp", "fsdp"), None)),
        out_specs=P(), check_rep=False)
    def run(xb, head_local, toks):
        # fsdp shards the head's D axis too: restore the full (D, Vl).
        head_local = jax.lax.all_gather(head_local, "fsdp", axis=0,
                                        tiled=True)
        shard = jax.lax.axis_index("tp")
        logits = jnp.einsum(
            "bsd,dv->bsv", xb[:, :-1].astype(jnp.float32),
            head_local.astype(jnp.float32))           # (B, S-1, Vl)
        # Global max via all_gather + jnp.max rather than lax.pmax:
        # pmax has no differentiation rule (even under stop_gradient
        # the jvp trace hits it), while all_gather is differentiable —
        # and the LSE max's own gradient contribution cancels exactly
        # anyway. This is what makes the CE usable inside
        # value_and_grad (round 5: forward-only until the train step
        # wired it).
        m = jnp.max(jax.lax.all_gather(
            jnp.max(logits, axis=-1), "tp", axis=0), axis=0)
        lse = jnp.log(jax.lax.psum(
            jnp.sum(jnp.exp(logits - m[..., None]), axis=-1), "tp")) + m
        tgt = toks[:, 1:] - shard * v_local            # local id or OOB
        in_shard = (tgt >= 0) & (tgt < v_local)
        tgt_logit = jnp.take_along_axis(
            logits, jnp.clip(tgt, 0, v_local - 1)[..., None],
            axis=-1)[..., 0]
        tgt_logit = jax.lax.psum(jnp.where(in_shard, tgt_logit, 0.0),
                                 "tp")
        # Each (dp, fsdp) batch shard holds distinct rows: mean over the
        # local rows then over the batch axis = the global mean.
        return jax.lax.pmean(jnp.mean(lse - tgt_logit), ("dp", "fsdp"))

    return run(x, lm_head, tokens)
