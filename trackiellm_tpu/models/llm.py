"""Mistral-7B-class decoder-only transformer, TPU-native.

Parity target: the reference's LLM stack — llama.cpp running a GGUF
Mistral-7B with a 4096-token context (reference: src/cortex/
tk_cortex_main.c:911-916, src/ai_models/tk_model_runner.h:38-225). The
architecture implemented here is the Mistral shape: RMSNorm, rotary
embeddings, grouped-query attention (32 q / 8 kv heads), SwiGLU MLP,
optional sliding-window attention, tied decode loop over a KV cache.

TPU design decisions:
  - Layer parameters are *stacked* along a leading layer axis and the
    forward is a single ``lax.scan`` over layers — one compiled block
    regardless of depth (32 separately-traced layers would blow up
    compile time and defeat XLA's scheduling).
  - Weights may be bf16 or group-quantized (Q8/Q4 via
    :mod:`trackiellm_tpu.ops.quant`); the quantized path streams int8 /
    packed-int4 through the Pallas dequant-matmul so full-precision
    weights never exist in HBM.
  - Prefill runs at fixed bucket lengths (pad + causal mask) through the
    Pallas flash-attention kernel; decode is one token against a
    length-masked contiguous KV cache (see ops/attention.py for why).
  - The KV cache is a preallocated (L, 2, S_max, Hk, D) buffer updated
    with ``dynamic_update_slice`` — static shapes, zero reallocation
    (the TPU analogue of llama.cpp's KV cells).
"""

from __future__ import annotations

import functools
import math
import os
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from trackiellm_tpu.ops.attention import decode_attention, prefill_attention
from trackiellm_tpu.ops.quant import (
    QuantizedLinear,
    quantize_q4,
    quantize_q8,
    quantized_matmul,
)


class LLMConfig(NamedTuple):
    vocab_size: int = 32000
    dim: int = 4096
    n_layers: int = 32
    n_heads: int = 32
    n_kv_heads: int = 8
    head_dim: int = 128
    hidden_dim: int = 14336
    norm_eps: float = 1e-5
    rope_theta: float = 10000.0
    max_seq: int = 4096
    sliding_window: int = 4096
    # Llama-family variations (the reference's llama.cpp engine is
    # family-generic; these knobs cover the same GGUF space):
    # Qwen2-style attention projection biases (blk.N.attn_{q,k,v}.bias).
    qkv_bias: bool = False
    # Gemma-2 family. Two of its deltas are FOLDED at conversion and
    # need no runtime knob: RMSNorm's (1+w) convention (weights stored
    # pre-incremented, as GGUF exports already do) and the sqrt(dim)
    # embedding scale (folded into tok_emb; lm_head keeps the unscaled
    # tied copy). The rest:
    act: str = "silu"           # "gelu" = GeGLU (gelu-tanh gate)
    post_norms: bool = False    # post-attn / post-ffw sandwich norms
    # OLMo-2's norm placement: NO pre-norms — the attention/MLP consume
    # the residual stream raw, and the branch outputs are normed before
    # the residual add (pre_norms=False + post_norms=True). Layers then
    # carry only attn_post_norm/mlp_post_norm weights.
    pre_norms: bool = True
    attn_softcap: float = 0.0   # attention logit soft-capping (50.0)
    logit_softcap: float = 0.0  # final logit soft-capping (30.0)
    query_pre_attn_scalar: float = 0.0  # q scale = 1/sqrt(this); 0 = 1/sqrt(head_dim)
    # Granite's runtime multiplier: BOTH branch outputs (attention and
    # MLP/MoE) scale by this before their residual adds
    # (GraniteDecoderLayer.residual_multiplier; llama.cpp
    # f_residual_scale). Granite's other three published multipliers
    # need no knob — they FOLD at conversion: embedding_multiplier
    # into tok_emb (after the tied lm_head takes the unscaled copy),
    # logits_scaling as a divisor into lm_head, attention_multiplier
    # into query_pre_attn_scalar (= attention_multiplier**-2).
    residual_multiplier: float = 1.0
    # GLM-4-style partial rotary: rope rotates only the first
    # factor*head_dim dims of q/k, the rest pass through untouched.
    # GLM's INTERLEAVED pair layout needs no knob — the converters
    # permute the q/k projection columns into this framework's
    # split-half layout (attention scores are invariant to a common
    # head-dim permutation of q and k; V is untouched).
    partial_rotary_factor: float = 1.0
    # Llama-4 attention deltas (Llama4TextAttention):
    # - qk_l2norm: weightless RMS (L2) norm on q/k AFTER rope, on ROPE
    #   layers only (NoPE layers skip it) — unlike Qwen3's weighted
    #   pre-rope per-head norm.
    # - attn_temp_tuning: on NoPE layers the query scales by
    #   log1p(floor((pos+1)/attn_temp_floor)) * attn_temp_scale + 1
    #   (position-dependent temperature, arXiv:2501.19399).
    # - attn_chunk: ROPE layers attend only within aligned chunks of
    #   this many positions (floor(q/C) == floor(k/C), causal); NoPE
    #   layers stay global. 0 = off.
    qk_l2norm: bool = False
    attn_temp_tuning: bool = False
    attn_temp_floor: float = 8192.0
    attn_temp_scale: float = 0.1
    attn_chunk: int = 0
    # Llama-4 MoE: selection on raw router logits, combine weight =
    # sigmoid(selected logit) ("sigmoid_topk" score func), and the
    # weight scales the expert INPUT, not its output (experts have no
    # biases, so unselected contributions are exactly zero).
    moe_scale_input: bool = False
    # Llama-4 Maverick: dense/MoE layer interleave — layer li is MoE
    # iff li % moe_pattern == moe_pattern - 1 (transformers
    # interleave_moe_layer_step; Maverick: 2 -> odd layers MoE). The
    # per-layer choice is a lax.cond inside the scan; hybrid params
    # carry BOTH stacks (expert banks in w_gu/w_down, the dense MLP in
    # w_gu_mlp/w_down_mlp, zeros where a layer doesn't use one). 0 =
    # uniform (all-MoE when n_experts, else all-dense).
    moe_pattern: int = 0
    # ERNIE-4.5-MoE: the first k layers are DENSE regardless of the
    # pattern (moe_layer_start_index; the 21B ships interval 1 +
    # start 1 -> layer 0 dense, the rest MoE). Composes with
    # moe_pattern: layer li is MoE iff li >= moe_first_dense AND
    # (li % pattern == pattern - 1 when pattern > 1).
    moe_first_dense: int = 0
    # Norm family: "rms" (Llama & almost everything) or "layernorm"
    # (mean-subtracting — StarCoder2, Nemotron, Command-R). LayerNorm
    # weights may carry biases: norm params are then {"g","b"} dicts
    # instead of bare arrays (scan-compatible pytrees). Nemotron's
    # LayerNorm1p (1+w convention) folds at conversion.
    norm_type: str = "rms"
    # Command-R (Cohere): PARALLEL residual — attention and MLP both
    # read the SAME input_layernorm output and their branch outputs
    # add to the incoming stream (x + attn(h) + mlp(h)); no second
    # norm. Dense MLP only (Cohere has no MoE).
    parallel_residual: bool = False
    # Falcon 40B/180B ("new decoder architecture", num_ln_in_parallel_
    # attn=2): the parallel MLP branch reads its OWN LayerNorm of the
    # residual stream (ln_mlp) instead of sharing the attention norm.
    # Only meaningful with parallel_residual; the ln_mlp weights live
    # in layers.mlp_norm.
    parallel_mlp_norm: bool = False
    # MLP shape: gated GLU (default) or a plain up->act->down stack
    # (mlp_gated=False — StarCoder2's gelu, Nemotron's relu²; w_gu
    # then holds ONLY the up projection). mlp_bias adds dense-MLP
    # biases (layers.w_gu_b / w_down_b — StarCoder2).
    mlp_gated: bool = True
    mlp_bias: bool = False
    alt_window: bool = False    # sliding window on EVEN layers only
    # Gemma-3 layer-type pattern: every ``window_pattern``-th layer is
    # GLOBAL (li % pattern == pattern-1), the rest slide (transformers
    # Gemma3TextConfig.layer_types; 6 for every published Gemma-3).
    # 0 = off (alt_window covers the 1:1 gpt-oss/Gemma-2 case).
    window_pattern: int = 0
    # Gemma-3 dual rope: sliding layers rotate with this base and NO
    # rope_factors scaling; global layers use rope_theta (+ factors).
    # 0 = single rope for all layers.
    rope_local_theta: float = 0.0
    # SmolLM3/Llama-4-style NoPE interval: every ``nope_pattern``-th
    # layer (li % pattern == pattern-1) applies NO rotary embedding
    # (transformers' no_rope_layer_interval — rope on layer li iff
    # (li+1) % interval != 0). 0 = rope everywhere.
    nope_pattern: int = 0
    # Phi-3 longrope (the 128k variants): params carry
    # rope_factors_short/long divisor sets; the per-dispatch choice is
    # long when the TOTAL sequence length exceeds this (0 = off), and
    # the published attention factor sqrt(1+log(max/orig)/log(orig))
    # folds into the attention scale (it scales cos/sin of BOTH q and
    # k, i.e. scores x factor^2 — exact, since the factor is the same
    # in both regimes).
    rope_original_max_seq: int = 0
    rope_attention_factor: float = 1.0
    # Mixtral-style sparse MoE MLP: n_experts > 0 replaces the dense
    # SwiGLU with per-layer expert banks (layers.w_gu/w_down grow a
    # leading expert axis; layers.moe_gate is the router) and top-k
    # routing. parallel/train.py fine-tunes MoE too (dense-all
    # formulation + load-balancing aux loss).
    n_experts: int = 0
    n_experts_used: int = 2
    moe_norm_topk: bool = True  # renormalize top-k weights (Mixtral
                                # does; Qwen2-MoE ships norm_topk_prob
                                # = False)
    moe_shared_hidden: int = 0  # Qwen2-MoE/DeepSeek SHARED expert MLP
                                # hidden size (0 = none): an
                                # always-active SwiGLU whose output is
                                # scaled by sigmoid(shared_gate(x)) and
                                # added to the routed sum
    # Qwen3 family: per-head RMSNorm on Q and K (over head_dim, after
    # the projection reshape, BEFORE rope — transformers' Qwen3Attention
    # order). Params carry layers.q_norm/k_norm (L, head_dim).
    qk_norm: bool = False
    # OLMo-2 flavor: the Q/K RMSNorm runs over the WHOLE projection
    # (all heads jointly, H*head_dim values per token) instead of
    # per-head; layers.q_norm is (L, H*Dh) and k_norm (L, Hk*Dh).
    qk_norm_full: bool = False
    # DeepSeek MoE deltas (models/mla.py drives these through the same
    # _moe_block): top-k weights multiply routed_scaling_factor, the
    # shared expert adds UNGATED (no sigmoid(shared_gate)), and
    # group-limited routing (n_group/topk_group: experts partition into
    # groups, only the top-scoring groups stay selectable — DeepSeek's
    # device-limited dispatch).
    moe_routed_scale: float = 1.0
    moe_shared_gated: bool = True
    moe_n_groups: int = 1
    moe_topk_groups: int = 1
    # DeepSeek-V3 routing deltas: sigmoid expert scores (vs softmax),
    # group score = sum of each group's top-2 (vs max), and an
    # optional aux-loss-free balancing bias (layers.moe_gate_bias,
    # (L, E)) added to the scores for SELECTION ONLY — the combine
    # weights stay the raw scores at the selected indices.
    # "softmax_topk" = gpt-oss: select on RAW router logits, combine
    # weights = softmax over just the selected logits
    # (transformers GptOssTopKRouter).
    moe_score_func: str = "softmax"      # "softmax" | "sigmoid" |
                                         # "softmax_topk" | "sigmoid_topk"
    moe_group_score: str = "max"         # "max" | "top2sum"
    # gpt-oss family deltas (OpenAI's 2025 open-weight MoE):
    # - attn_sinks: learned per-head sink logits (layers.attn_sink,
    #   (L, H)) join every attention softmax as one always-visible
    #   extra column and are dropped after normalization.
    # - out_bias: biases on the o_proj (layers.wo_bias) — gpt-oss sets
    #   attention_bias on all four attention projections (q/k/v ride
    #   the existing qkv_bias).
    # - moe_bias: router + expert biases (layers.moe_gate_b /
    #   w_gu_b / w_down_b).
    # - act="gptoss": clamped SwiGLU variant — gate clamped at
    #   act_limit, up clamped to ±act_limit, glu = gate *
    #   sigmoid(1.702 * gate), output (up + 1) * glu.
    attn_sinks: bool = False
    out_bias: bool = False
    moe_bias: bool = False
    act_limit: float = 7.0

    @classmethod
    def mistral_7b(cls) -> "LLMConfig":
        return cls()

    @classmethod
    def llama3_8b(cls) -> "LLMConfig":
        """Llama-3-8B: GQA-8, 128k vocab, theta 5e5, no sliding window.
        Llama-3.1 needs no separate preset: its rope scaling rides in
        as params["rope_factors"] (loaded from the GGUF's
        rope_freqs.weight, or computed via llama3_rope_factors)."""
        return cls(vocab_size=128256, dim=4096, n_layers=32, n_heads=32,
                   n_kv_heads=8, head_dim=128, hidden_dim=14336,
                   rope_theta=500000.0, max_seq=8192, sliding_window=8192)

    @classmethod
    def qwen2_7b(cls) -> "LLMConfig":
        """Qwen2-7B: GQA-4, QKV biases, theta 1e6."""
        return cls(vocab_size=152064, dim=3584, n_layers=28, n_heads=28,
                   n_kv_heads=4, head_dim=128, hidden_dim=18944,
                   rope_theta=1e6, max_seq=8192, sliding_window=8192,
                   qkv_bias=True)

    @classmethod
    def phi3_mini(cls) -> "LLMConfig":
        """Phi-3-mini-4k: MHA-32 (no GQA), head_dim 96, SwiGLU,
        sliding window 2047. Its GGUFs ship PRE-FUSED attn_qkv /
        ffn_up(gate|up) tensors — gguf_to_llm_params maps them straight
        into this framework's fused layout. The 128k longrope variants
        ride in via rope_factors_short/long params (loaded from the
        GGUF's rope_factors_{short,long}.weight, or passed to
        convert.phi3_from_hf) + rope_original_max_seq."""
        return cls(vocab_size=32064, dim=3072, n_layers=32, n_heads=32,
                   n_kv_heads=32, head_dim=96, hidden_dim=8192,
                   rope_theta=10000.0, max_seq=4096,
                   sliding_window=2047)

    @classmethod
    def mixtral_8x7b(cls) -> "LLMConfig":
        """Mixtral-8x7B: Mistral attention geometry + 8-expert top-2
        sparse MoE MLP, theta 1e6, no sliding window."""
        return cls(vocab_size=32000, dim=4096, n_layers=32, n_heads=32,
                   n_kv_heads=8, head_dim=128, hidden_dim=14336,
                   rope_theta=1e6, max_seq=8192, sliding_window=8192,
                   n_experts=8, n_experts_used=2)

    @classmethod
    def qwen15_moe_a27b(cls) -> "LLMConfig":
        """Qwen1.5-MoE-A2.7B: the published shared-expert MoE — 60
        experts top-4 (un-renormalized), 1408-wide experts, a
        5632-wide always-active shared expert, Qwen2 attention with
        QKV biases."""
        return cls(vocab_size=151936, dim=2048, n_layers=24, n_heads=16,
                   n_kv_heads=16, head_dim=128, hidden_dim=1408,
                   rope_theta=1e6, max_seq=8192, sliding_window=8192,
                   qkv_bias=True, n_experts=60, n_experts_used=4,
                   moe_norm_topk=False, moe_shared_hidden=5632)

    @classmethod
    def granite3_8b(cls) -> "LLMConfig":
        """IBM Granite-3.x-8B: Llama-shaped with the four scalar
        multipliers (published config: embedding 12.0, residual 0.22,
        attention 0.0078125, logits 16.0). The three foldable ones are
        baked by the converters; only residual_multiplier is runtime.
        attention_multiplier 0.0078125 = 1/128 -> qpas = 128**2."""
        return cls(vocab_size=49155, dim=4096, n_layers=40, n_heads=32,
                   n_kv_heads=8, head_dim=128, hidden_dim=12800,
                   rope_theta=1e7, max_seq=8192, sliding_window=8192,
                   residual_multiplier=0.22,
                   query_pre_attn_scalar=float(128 ** 2))

    @classmethod
    def llama4_scout(cls) -> "LLMConfig":
        """Llama-4-Scout-17B-16E (text tower): uniform MoE (every layer:
        16 routed top-1 + shared expert, input-scaled sigmoid routing),
        NoPE every 4th layer with temperature tuning, post-rope QK
        L2-norm on rope layers, 8192-chunk attention on rope layers.
        The rope is INTERLEAVED in the checkpoint — folded to
        split-half at conversion like GLM-4. Llama-3-style rope-factor
        scaling rides params["rope_factors"]. Maverick's dense/MoE
        interleave (step 2) is NOT yet supported (uniform stacks only)."""
        return cls(vocab_size=202048, dim=5120, n_layers=48, n_heads=40,
                   n_kv_heads=8, head_dim=128, hidden_dim=8192,
                   rope_theta=500000.0, max_seq=8192,
                   sliding_window=8192,
                   n_experts=16, n_experts_used=1,
                   moe_score_func="sigmoid_topk", moe_norm_topk=False,
                   moe_scale_input=True, moe_shared_hidden=8192,
                   moe_shared_gated=False,
                   nope_pattern=4, qk_l2norm=True,
                   attn_temp_tuning=True, attn_chunk=8192)

    @classmethod
    def glm4_9b(cls) -> "LLMConfig":
        """GLM-4-9B (0414 series): QKV biases, Gemma-2-style sandwich
        norms, half-width interleaved rope (the interleave is folded
        into the q/k column order at conversion)."""
        return cls(vocab_size=151552, dim=4096, n_layers=40, n_heads=32,
                   n_kv_heads=2, head_dim=128, hidden_dim=13696,
                   rope_theta=10000.0, max_seq=8192, sliding_window=8192,
                   qkv_bias=True, post_norms=True,
                   partial_rotary_factor=0.5)

    @classmethod
    def gemma2_2b(cls) -> "LLMConfig":
        """Gemma-2-2B: GeGLU, sandwich norms, softcaps, alternating
        local(4096)/global attention, 256k vocab (tied lm_head)."""
        return cls(vocab_size=256000, dim=2304, n_layers=26, n_heads=8,
                   n_kv_heads=4, head_dim=256, hidden_dim=9216,
                   norm_eps=1e-6, rope_theta=10000.0, max_seq=8192,
                   sliding_window=4096, act="gelu", post_norms=True,
                   attn_softcap=50.0, logit_softcap=30.0,
                   query_pre_attn_scalar=256.0, alt_window=True)

    @classmethod
    def gemma2_9b(cls) -> "LLMConfig":
        return cls(vocab_size=256000, dim=3584, n_layers=42, n_heads=16,
                   n_kv_heads=8, head_dim=256, hidden_dim=14336,
                   norm_eps=1e-6, rope_theta=10000.0, max_seq=8192,
                   sliding_window=4096, act="gelu", post_norms=True,
                   attn_softcap=50.0, logit_softcap=30.0,
                   query_pre_attn_scalar=256.0, alt_window=True)

    @classmethod
    def gemma3_1b(cls) -> "LLMConfig":
        """Gemma-3-1B: QK-norm replaces Gemma-2's softcaps, 5:1
        sliding(512)/global layer pattern, dual rope (local theta 10k
        on sliding layers, 1M global — the 1B ships NO linear scaling
        on the global rope; 4B+ do, see :meth:`gemma3_4b`)."""
        return cls(vocab_size=262144, dim=1152, n_layers=26, n_heads=4,
                   n_kv_heads=1, head_dim=256, hidden_dim=6912,
                   norm_eps=1e-6, rope_theta=1e6, max_seq=32768,
                   sliding_window=512, act="gelu", post_norms=True,
                   query_pre_attn_scalar=256.0, qk_norm=True,
                   window_pattern=6, rope_local_theta=10000.0)

    @classmethod
    def gemma3_4b(cls) -> "LLMConfig":
        """Gemma-3-4B (text tower): window 1024, 131k context. Pair
        params with uniform ``rope_factors`` of 8.0 (the published
        linear rope scaling on GLOBAL layers; sliding layers ignore it
        by construction — see ``_layer_freqs``):
        ``params["rope_factors"] = linear_rope_factors(cfg, 8.0)``."""
        return cls(vocab_size=262208, dim=2560, n_layers=34, n_heads=8,
                   n_kv_heads=4, head_dim=256, hidden_dim=10240,
                   norm_eps=1e-6, rope_theta=1e6, max_seq=131072,
                   sliding_window=1024, act="gelu", post_norms=True,
                   query_pre_attn_scalar=256.0, qk_norm=True,
                   window_pattern=6, rope_local_theta=10000.0)

    @classmethod
    def gemma3_12b(cls) -> "LLMConfig":
        return cls.gemma3_4b()._replace(
            dim=3840, n_layers=48, n_heads=16, n_kv_heads=8,
            hidden_dim=15360)

    @classmethod
    def gemma3_27b(cls) -> "LLMConfig":
        """27B drops head_dim to 128 and scales queries by
        dim/n_heads = 168 (the published config's
        query_pre_attn_scalar), like Gemma-2-27B did."""
        return cls.gemma3_4b()._replace(
            dim=5376, n_layers=62, n_heads=32, n_kv_heads=16,
            head_dim=128, hidden_dim=21504,
            query_pre_attn_scalar=168.0)

    @classmethod
    def olmo2_7b(cls) -> "LLMConfig":
        """OLMo-2-7B: Llama-shaped MHA-32 with post-norm-only placement
        (branch outputs normed before the residual adds; no pre-norms)
        and whole-projection Q/K RMSNorm."""
        return cls(vocab_size=100352, dim=4096, n_layers=32, n_heads=32,
                   n_kv_heads=32, head_dim=128, hidden_dim=11008,
                   norm_eps=1e-6, rope_theta=500000.0, max_seq=4096,
                   sliding_window=4096, pre_norms=False, post_norms=True,
                   qk_norm_full=True)

    @classmethod
    def smollm3_3b(cls) -> "LLMConfig":
        """SmolLM3-3B: Llama-shaped GQA-4 with NoPE every 4th layer
        (transformers no_rope_layer_interval=4 — rope on li iff
        (li+1) % 4 != 0) and a 5M rope base for long context."""
        return cls(vocab_size=128256, dim=2048, n_layers=36, n_heads=16,
                   n_kv_heads=4, head_dim=128, hidden_dim=11008,
                   norm_eps=1e-6, rope_theta=5e6, max_seq=65536,
                   sliding_window=65536, nope_pattern=4)

    @classmethod
    def qwen3_8b(cls) -> "LLMConfig":
        """Qwen3-8B: GQA-8, per-head QK-norm (replaces Qwen2's QKV
        biases), theta 1e6, 151k vocab."""
        return cls(vocab_size=151936, dim=4096, n_layers=36, n_heads=32,
                   n_kv_heads=8, head_dim=128, hidden_dim=12288,
                   norm_eps=1e-6, rope_theta=1e6, max_seq=32768,
                   sliding_window=32768, qk_norm=True)

    @classmethod
    def qwen3_moe_30b_a3b(cls) -> "LLMConfig":
        """Qwen3-30B-A3B: 128 experts top-8 (renormalized, NO shared
        expert — unlike Qwen1.5/2-MoE), QK-norm attention, 768-wide
        experts."""
        return cls(vocab_size=151936, dim=2048, n_layers=48, n_heads=32,
                   n_kv_heads=4, head_dim=128, hidden_dim=768,
                   norm_eps=1e-6, rope_theta=1e6, max_seq=32768,
                   sliding_window=32768, qk_norm=True, n_experts=128,
                   n_experts_used=8, moe_norm_topk=True)

    @classmethod
    def gpt_oss_20b(cls) -> "LLMConfig":
        """gpt-oss-20b: 24 layers, 32 experts top-4, 64 q / 8 kv heads
        at head_dim 64, sinks + full attention biases, clamped-SwiGLU
        experts, sliding window 128 on even layers, theta 150k with
        32x non-truncated YaRN from a 4096 original window (pair params
        with ``yarn_rope_factors(cfg, 32.0, 4096, truncate=False)`` and
        the ``yarn_attention_factor(32.0)`` already baked in here)."""
        return cls(vocab_size=201088, dim=2880, n_layers=24, n_heads=64,
                   n_kv_heads=8, head_dim=64, hidden_dim=2880,
                   rope_theta=150000.0, max_seq=131072, sliding_window=128,
                   alt_window=True, n_experts=32, n_experts_used=4,
                   moe_score_func="softmax_topk", moe_norm_topk=False,
                   moe_bias=True, attn_sinks=True, qkv_bias=True,
                   out_bias=True, act="gptoss",
                   rope_attention_factor=yarn_attention_factor(32.0))

    @classmethod
    def gpt_oss_120b(cls) -> "LLMConfig":
        """gpt-oss-120b: same geometry, 36 layers / 128 experts."""
        return cls.gpt_oss_20b()._replace(n_layers=36, n_experts=128)

    @classmethod
    def tiny(cls) -> "LLMConfig":
        """Small config for tests / compile checks."""
        return cls(vocab_size=512, dim=256, n_layers=2, n_heads=4,
                   n_kv_heads=2, head_dim=64, hidden_dim=512, max_seq=256,
                   sliding_window=256)


# ---------------------------------------------------------------------------
# Parameters
# ---------------------------------------------------------------------------

def init_params(key: jax.Array, cfg: LLMConfig,
                dtype: jnp.dtype = jnp.bfloat16) -> Dict[str, Any]:
    """Random-init parameter pytree. Per-layer weights are stacked on a
    leading (n_layers,) axis for the scan-based forward."""
    keys = jax.random.split(key, 10)
    d, l = cfg.dim, cfg.n_layers
    qd = cfg.n_heads * cfg.head_dim
    kvd = cfg.n_kv_heads * cfg.head_dim
    h = cfg.hidden_dim

    def w(k, *shape, scale=None):
        scale = scale or (1.0 / (shape[-2] ** 0.5))
        return (jax.random.normal(k, shape, jnp.float32) * scale).astype(dtype)

    # QKV and gate+up are stored fused: one wide matmul each reads the
    # weight stream once and launches one kernel instead of three/two —
    # decode is launch- and bandwidth-bound (PERF_NOTES.md).
    layers = {
        "attn_norm": jnp.ones((l, d), dtype),
        "wqkv": w(keys[1], l, d, qd + 2 * kvd),
        "wo": w(keys[4], l, qd, d),
        "mlp_norm": jnp.ones((l, d), dtype),
    }
    if cfg.n_experts:
        layers["moe_gate"] = w(keys[8], l, d, cfg.n_experts)
        layers["w_gu"] = w(keys[5], l, cfg.n_experts, d, 2 * h)
        layers["w_down"] = w(keys[7], l, cfg.n_experts, h, d)
        if cfg.moe_bias:
            layers["moe_gate_b"] = (jax.random.normal(
                jax.random.fold_in(keys[8], 1), (l, cfg.n_experts),
                jnp.float32) * 0.02).astype(dtype)
            layers["w_gu_b"] = (jax.random.normal(
                jax.random.fold_in(keys[5], 1), (l, cfg.n_experts, 2 * h),
                jnp.float32) * 0.02).astype(dtype)
            layers["w_down_b"] = (jax.random.normal(
                jax.random.fold_in(keys[7], 1), (l, cfg.n_experts, d),
                jnp.float32) * 0.02).astype(dtype)
        if cfg.moe_shared_hidden:
            hs = cfg.moe_shared_hidden
            layers["shared_gu"] = w(keys[2], l, d, 2 * hs)
            layers["shared_down"] = w(keys[3], l, hs, d)
            layers["shared_gate"] = w(keys[6], l, d, 1)
    else:
        layers["w_gu"] = w(keys[5], l, d, 2 * h)
        layers["w_down"] = w(keys[7], l, h, d)
    if cfg.qkv_bias:
        layers["wqkv_bias"] = (jax.random.normal(
            keys[9], (l, qd + 2 * kvd), jnp.float32) * 0.02).astype(dtype)
    if cfg.out_bias:
        layers["wo_bias"] = (jax.random.normal(
            jax.random.fold_in(keys[4], 1), (l, d),
            jnp.float32) * 0.02).astype(dtype)
    if cfg.attn_sinks:
        layers["attn_sink"] = (jax.random.normal(
            jax.random.fold_in(keys[1], 1), (l, cfg.n_heads),
            jnp.float32) * 0.5).astype(jnp.float32)
    if cfg.post_norms:
        layers["attn_post_norm"] = jnp.ones((l, d), dtype)
        layers["mlp_post_norm"] = jnp.ones((l, d), dtype)
    if cfg.qk_norm:
        layers["q_norm"] = jnp.ones((l, cfg.head_dim), dtype)
        layers["k_norm"] = jnp.ones((l, cfg.head_dim), dtype)
    elif cfg.qk_norm_full:
        layers["q_norm"] = jnp.ones((l, cfg.n_heads * cfg.head_dim), dtype)
        layers["k_norm"] = jnp.ones((l, cfg.n_kv_heads * cfg.head_dim),
                                    dtype)
    return {
        "tok_emb": w(keys[0], cfg.vocab_size, d, scale=0.02),
        "layers": layers,
        "out_norm": jnp.ones((d,), dtype),
        "lm_head": w(keys[8], d, cfg.vocab_size),
    }


_QUANTIZABLE = ("wqkv", "wo", "w_gu", "w_down",
                "shared_gu", "shared_down")


def quantize_params(params: Dict[str, Any], bits: int = 4,
                    group: int = 256) -> Dict[str, Any]:
    """Quantize the big per-layer matrices (Q4/Q8 group quant). Embeddings
    and norms stay bf16 (GGUF keeps those high-precision too)."""
    quantize = quantize_q4 if bits == 4 else quantize_q8
    out = dict(params)
    layers = dict(params["layers"])
    for name in _QUANTIZABLE:
        if name not in layers:  # shared_gu/_down exist only on Qwen2-MoE
            continue
        stacked = layers[name]  # (L, K, N) or MoE (L, E, K, N)
        if stacked.ndim == 4:
            per_l = []
            for i in range(stacked.shape[0]):
                qs = [quantize(stacked[i, e], group)
                      for e in range(stacked.shape[1])]
                per_l.append(QuantizedLinear(
                    values=jnp.stack([q.values for q in qs]),
                    scales=jnp.stack([q.scales for q in qs])))
            layers[name] = QuantizedLinear(
                values=jnp.stack([q.values for q in per_l]),
                scales=jnp.stack([q.scales for q in per_l]))
            continue
        qs = [quantize(stacked[i], group) for i in range(stacked.shape[0])]
        layers[name] = QuantizedLinear(
            values=jnp.stack([q.values for q in qs]),
            scales=jnp.stack([q.scales for q in qs]),
        )
    out["layers"] = layers
    out["lm_head"] = quantize(params["lm_head"], group)
    return out


def init_params_quantized(key: jax.Array, cfg: LLMConfig, bits: int = 4,
                          group: int = 256,
                          dtype: jnp.dtype = jnp.bfloat16) -> Dict[str, Any]:
    """Random-init directly into quantized form, one layer-matrix at a
    time — peak memory is a single (K, N) f32 matrix instead of the whole
    bf16 model (a 7B bf16 tree would not fit next to its quantized copy
    in 16 GB of HBM)."""
    quantize = quantize_q4 if bits == 4 else quantize_q8
    d, l, h = cfg.dim, cfg.n_layers, cfg.hidden_dim
    qd = cfg.n_heads * cfg.head_dim
    kvd = cfg.n_kv_heads * cfg.head_dim
    shapes = {
        "wqkv": (d, qd + 2 * kvd), "wo": (qd, d),
        "w_gu": (d, 2 * h), "w_down": (h, d),
    }
    layers: Dict[str, Any] = {
        "attn_norm": jnp.ones((l, d), dtype),
        "mlp_norm": jnp.ones((l, d), dtype),
    }
    if cfg.qkv_bias:
        layers["wqkv_bias"] = (jax.random.normal(
            jax.random.fold_in(key, 99993), (l, qd + 2 * kvd),
            jnp.float32) * 0.02).astype(dtype)
    if cfg.qk_norm:
        layers["q_norm"] = jnp.ones((l, cfg.head_dim), dtype)
        layers["k_norm"] = jnp.ones((l, cfg.head_dim), dtype)
    elif cfg.qk_norm_full:
        layers["q_norm"] = jnp.ones((l, cfg.n_heads * cfg.head_dim), dtype)
        layers["k_norm"] = jnp.ones((l, cfg.n_kv_heads * cfg.head_dim),
                                    dtype)
    build_one = jax.jit(
        lambda k, kk, nn: quantize(
            jax.random.normal(k, (kk, nn), jnp.float32) / (kk ** 0.5), group),
        static_argnums=(1, 2),
    )
    for idx, (name, (kk, nn)) in enumerate(shapes.items()):
        qs = [build_one(jax.random.fold_in(key, idx * 1000 + i), kk, nn)
              for i in range(l)]
        layers[name] = QuantizedLinear(
            values=jnp.stack([q.values for q in qs]),
            scales=jnp.stack([q.scales for q in qs]),
        )
    emb_key = jax.random.fold_in(key, 99991)
    return {
        "tok_emb": (jax.random.normal(
            emb_key, (cfg.vocab_size, d), jnp.float32) * 0.02).astype(dtype),
        "layers": layers,
        "out_norm": jnp.ones((d,), dtype),
        "lm_head": build_one(jax.random.fold_in(key, 99992), d,
                             cfg.vocab_size),
    }


def _linear(x: jnp.ndarray, w) -> jnp.ndarray:
    """Dense projection for a plain array, a QuantizedLinear, or a
    LoRA-wrapped base (structural check: models.lora.LoraLinear)."""
    if hasattr(w, "base") and hasattr(w, "a"):  # LoraLinear
        y = _linear(x, w.base)
        r = w.a.shape[-1]
        delta = jnp.matmul(
            jnp.matmul(x.astype(jnp.float32), w.a.astype(jnp.float32),
                       preferred_element_type=jnp.float32),
            w.b.astype(jnp.float32), preferred_element_type=jnp.float32)
        return (y.astype(jnp.float32) + delta * (w.alpha / r)).astype(
            x.dtype)
    if isinstance(w, QuantizedLinear):
        return quantized_matmul(x, w).astype(x.dtype)
    return jnp.matmul(x, w, preferred_element_type=jnp.float32).astype(x.dtype)


def _qk_norm(q: jnp.ndarray, k: jnp.ndarray, layer,
             cfg: LLMConfig) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Qwen3 per-head QK RMSNorm: normalize the head_dim axis of the
    reshaped (..., H, head_dim) Q and K, scaled by the per-layer
    (head_dim,) weights — applied BEFORE rope, matching transformers'
    Qwen3Attention. No-op for configs without ``qk_norm``.

    ``qk_norm_full`` (OLMo-2) instead normalizes the WHOLE projection:
    the mean square runs over all heads jointly (equivalent to
    transformers' norm on the flat (H*Dh,) vector before the reshape)
    and the (H*Dh,) weight applies per-head via a reshape."""
    if cfg.qk_norm_full:
        def full(t, w):
            ms = jnp.mean(jnp.square(t.astype(jnp.float32)),
                          axis=(-2, -1), keepdims=True)
            t32 = t.astype(jnp.float32) * jax.lax.rsqrt(ms + cfg.norm_eps)
            return t32.astype(t.dtype) * w.reshape(t.shape[-2],
                                                   t.shape[-1])
        return full(q, layer["q_norm"]), full(k, layer["k_norm"])
    if not cfg.qk_norm:
        return q, k
    if cfg.norm_type == "layernorm":
        # Command-R+ per-head QK LayerNorm (CohereLayerNorm with
        # hidden_size=(H, head_dim)): mean-subtracting over head_dim,
        # PER-HEAD (H, head_dim) weights, no bias.
        def ln(t, w):
            t32 = t.astype(jnp.float32)
            mu = jnp.mean(t32, axis=-1, keepdims=True)
            var = jnp.var(t32, axis=-1, keepdims=True)
            y = (t32 - mu) * jax.lax.rsqrt(var + cfg.norm_eps)
            return y.astype(t.dtype) * w.reshape(t.shape[-2],
                                                 t.shape[-1])
        return ln(q, layer["q_norm"]), ln(k, layer["k_norm"])
    return (_rms_norm(q, layer["q_norm"], cfg.norm_eps),
            _rms_norm(k, layer["k_norm"], cfg.norm_eps))


def _attn_in(x: jnp.ndarray, layer, cfg: LLMConfig) -> jnp.ndarray:
    """The attention branch's input: pre-normed residual stream, or the
    raw stream for OLMo-2's post-norm-only placement."""
    if not cfg.pre_norms:
        return x
    return _norm(x, layer["attn_norm"], cfg.norm_eps, cfg.norm_type)


def _rms_norm(x: jnp.ndarray, scale: jnp.ndarray, eps: float) -> jnp.ndarray:
    ms = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
    return (x.astype(jnp.float32) * jax.lax.rsqrt(ms + eps)).astype(x.dtype) * scale


def _norm(x: jnp.ndarray, p, eps: float, kind: str = "rms") -> jnp.ndarray:
    """Config-dispatched norm: ``p`` is a bare weight array (RMS /
    bias-free LayerNorm) or a {"g","b"} dict (LayerNorm with bias)."""
    if isinstance(p, dict):
        g, b = p["g"], p.get("b")
    else:
        g, b = p, None
    if kind == "rms":
        out = _rms_norm(x, g, eps)
    else:  # mean-subtracting LayerNorm
        x32 = x.astype(jnp.float32)
        mu = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.var(x32, axis=-1, keepdims=True)
        out = ((x32 - mu) * jax.lax.rsqrt(var + eps)).astype(x.dtype) * g
    if b is not None:
        out = out + b
    return out


def _act_combine(gate: jnp.ndarray, up: jnp.ndarray, act: str,
                 limit: float = 7.0) -> jnp.ndarray:
    """Combine the gate/up halves of a GLU projection (f32 in/out).

    - "silu": SwiGLU (Llama/Mistral/Qwen/DeepSeek).
    - "gelu": GeGLU, tanh approximation (Gemma).
    - "gptoss": transformers GptOssExperts — gate clamped from above at
      ``limit``, up clamped to ±limit, glu = gate * sigmoid(1.702 *
      gate), combined as (up + 1) * glu.
    """
    if act == "gptoss":
        gate = jnp.minimum(gate, limit)
        up = jnp.clip(up, -limit, limit)
        return (up + 1.0) * (gate * jax.nn.sigmoid(gate * 1.702))
    gated = (jax.nn.silu(gate) if act == "silu"
             else jax.nn.gelu(gate, approximate=True))
    return gated * up


def _mlp_block(x: jnp.ndarray, norm_scale: jnp.ndarray, w_gu, w_down,
               eps: float, act: str = "silu",
               post_norm=None,
               residual_multiplier: float = 1.0,
               norm_type: str = "rms", gated: bool = True,
               w_gu_b=None, w_down_b=None) -> jnp.ndarray:
    """norm -> gate/up -> act(gate)*up -> down [-> post-norm] -> +residual.

    ``act``: "silu" (Llama/Mistral SwiGLU) or "gelu" (Gemma GeGLU,
    tanh approximation — what the published checkpoints use).
    ``post_norm``: Gemma-2 post-feedforward RMSNorm weights (sandwich
    norm), applied to the branch before the residual add.

    Small-M Q4 weights can take the ONE-LAUNCH fused Pallas kernel
    (ops/fused.py) behind the TRACKIE_FUSED_MLP=1 opt-in — measured
    perf-neutral on the v5e (launch overhead is not the decode
    bottleneck; see ops.fused.use_fused_mlp). LoRA-wrapped / bf16 / Q8
    weights always keep the composable path."""
    from trackiellm_tpu.ops import fused

    if (x.ndim == 2 and act == "silu" and post_norm is None
            and norm_scale is not None and residual_multiplier == 1.0
            and gated and norm_type == "rms"
            and not isinstance(norm_scale, dict)
            and fused.use_fused_mlp() and fused._can_fuse(x, w_gu, w_down)):
        return fused.fused_mlp(x, norm_scale, w_gu, w_down, eps)
    # norm_scale None = OLMo-2 placement: the MLP consumes the residual
    # stream raw (only the post-norm applies).
    h2 = (_norm(x, norm_scale, eps, norm_type)
          if norm_scale is not None else x)
    gu = _linear(h2, w_gu).astype(jnp.float32)
    if w_gu_b is not None:
        gu = gu + w_gu_b.astype(jnp.float32)
    if gated:
        gate, up = jnp.split(gu, 2, axis=-1)
        act_out = _act_combine(gate, up, act)
    elif act == "relu2":
        # Nemotron: squared ReLU, no gate.
        act_out = jnp.square(jax.nn.relu(gu))
    else:
        # StarCoder2: plain tanh-approximated GELU, no gate;
        # "gelu_exact" = erf GELU (Falcon's nn.GELU).
        act_out = jax.nn.gelu(gu, approximate=act != "gelu_exact")
    out = _linear(act_out.astype(x.dtype), w_down)
    if w_down_b is not None:
        out = out + w_down_b
    if post_norm is not None:
        out = _norm(out, post_norm, eps, norm_type)
    if residual_multiplier != 1.0:
        out = out * jnp.asarray(residual_multiplier, out.dtype)
    return x + out


def _expert_slice(w, e: int):
    """Static expert slice of a stacked (E, ...) weight (bf16 array or
    QuantizedLinear whose values/scales carry the expert axis)."""
    if isinstance(w, QuantizedLinear):
        return QuantizedLinear(values=w.values[e], scales=w.scales[e])
    return w[e]


def _moe_use_routed(n_tokens: int, w_gu) -> bool:
    """Pick the sorted grouped-matmul path where it measured faster.

    ``TRACKIE_MOE_ROUTED``: "1" forces it, "0" disables, default
    "auto" keys on the dense-all-experts MLP FLOP volume: per-process
    v5e A/Bs (PERF_NOTES round-3) showed routed 1.29x faster at
    D=2048/H=7168/E=8/T=2048 (1.4e12 dense FLOPs/layer) but ~8% SLOWER
    at D=1024/H=3584/T<=512 (<=9e10) where the sort/gather/scatter and
    ragged-lowering overheads beat the saving — the crossover sits
    between, so auto enables above 5e11. Quantized/LoRA expert banks
    stay on the dense loop (``lax.ragged_dot`` needs a dense (E, K, N)
    rhs; at decode batch sizes the packed-weight read is the bound
    anyway)."""
    if isinstance(w_gu, QuantizedLinear) or (
            hasattr(w_gu, "base") and hasattr(w_gu, "a")):
        # LoraLinear structural check — both attrs, because np.ndarray
        # exposes a .base of its own (review round-3 catch: hasattr
        # "base" alone silently forced numpy banks onto the dense loop).
        return False
    mode = os.environ.get("TRACKIE_MOE_ROUTED", "auto")
    if mode == "0":
        return False
    if mode == "1":
        return True
    n_experts, d, n2 = w_gu.shape
    dense_mlp_flops = 2 * n_tokens * n_experts * d * n2 * 1.5
    return dense_mlp_flops >= 5e11


def _grouped_dot(xs: jnp.ndarray, bank: jnp.ndarray,
                 group_sizes: jnp.ndarray) -> jnp.ndarray:
    """rows [off_g : off_g+size_g] @ bank[g] for each group, f32 out.

    ``lax.ragged_dot`` on every backend. Measured per-process on the
    v5e (PERF_NOTES round-3, D=2048/H=7168/E=8/K=2/L=8, T=2048 bf16
    prefill): dense-all-experts 115.9 ms, ragged_dot-routed 90.0 ms
    (1.29x), MegaBlocks-style Pallas gmm
    (jax.experimental.pallas.ops.tpu.megablox) 399 ms — the shipped
    gmm kernel is 3.4x SLOWER than dense through this stack, so the
    XLA ragged HLO is the winner, not the Pallas path."""
    return jax.lax.ragged_dot(xs, bank, group_sizes.astype(jnp.int32),
                              preferred_element_type=jnp.float32)


def _moe_routed(h2: jnp.ndarray, topv: jnp.ndarray, topi: jnp.ndarray,
                layer, cfg: LLMConfig) -> jnp.ndarray:
    """Dropless routed MoE: stable-sort the (T*K) token-slot list by
    expert, grouped-matmul each contiguous expert run against its bank,
    and scatter-add the weighted outputs back. Exact top-k semantics at
    K/E of the dense-all-experts FLOPs; every shape static."""
    T = h2.shape[0]
    K = cfg.n_experts_used
    flat_expert = topi.reshape(-1)                           # (T*K,)
    order = jnp.argsort(flat_expert, stable=True)
    sorted_expert = jnp.take(flat_expert, order)             # (T*K,)
    src_tok = order // K                                     # (T*K,)
    xs = jnp.take(h2, src_tok, axis=0)                       # (T*K, D)
    group_sizes = jnp.bincount(flat_expert, length=cfg.n_experts)
    gu = _grouped_dot(xs, layer["w_gu"], group_sizes)        # (T*K, 2H)
    if cfg.moe_bias:
        gu = gu + jnp.take(layer["w_gu_b"], sorted_expert,
                           axis=0).astype(jnp.float32)
    gate, up = jnp.split(gu, 2, axis=-1)
    ys = _grouped_dot(
        _act_combine(gate, up, cfg.act, cfg.act_limit).astype(h2.dtype),
        layer["w_down"], group_sizes)                        # (T*K, D)
    if cfg.moe_bias:
        ys = ys + jnp.take(layer["w_down_b"], sorted_expert,
                           axis=0).astype(jnp.float32)
    wts = jnp.take(topv.reshape(-1), order)                  # (T*K,)
    return jnp.zeros((T, h2.shape[1]), jnp.float32).at[src_tok].add(
        ys * wts[:, None])


def _moe_routed_scaled_in(h2, topv, topi, layer, cfg):
    """Llama-4 variant of _moe_routed: the router weight scales the
    expert INPUT (Llama4TextMoe routed_in = x * score); outputs add
    unweighted. Distinct from output scaling because of the SwiGLU
    nonlinearity."""
    T = h2.shape[0]
    K = cfg.n_experts_used
    flat_expert = topi.reshape(-1)
    order = jnp.argsort(flat_expert, stable=True)
    src_tok = order // K
    wts = jnp.take(topv.reshape(-1), order)                  # (T*K,)
    xs = jnp.take(h2, src_tok, axis=0) * wts[:, None].astype(h2.dtype)
    group_sizes = jnp.bincount(flat_expert, length=cfg.n_experts)
    gu = _grouped_dot(xs, layer["w_gu"], group_sizes)
    gate, up = jnp.split(gu, 2, axis=-1)
    ys = _grouped_dot(
        _act_combine(gate, up, cfg.act, cfg.act_limit).astype(h2.dtype),
        layer["w_down"], group_sizes)
    return jnp.zeros((T, h2.shape[1]), jnp.float32).at[src_tok].add(ys)


def _moe_shared(h2: jnp.ndarray, layer, cfg: LLMConfig) -> jnp.ndarray:
    """Qwen2-MoE/DeepSeek shared expert: an always-active SwiGLU scaled
    by sigmoid(shared_gate(h2)), added to the routed mixture. Returns
    zeros((T, D)) f32 when the config has no shared expert (so callers
    can use it as the routed accumulator's initial value)."""
    if not cfg.moe_shared_hidden:
        return jnp.zeros(h2.shape, jnp.float32)
    gu = _linear(h2, layer["shared_gu"]).astype(jnp.float32)
    gate, up = jnp.split(gu, 2, axis=-1)
    y = _linear(_act_combine(gate, up, cfg.act, cfg.act_limit)
                .astype(h2.dtype), layer["shared_down"])
    if not cfg.moe_shared_gated:
        # DeepSeek-style shared experts: always-on, no gate.
        return y.astype(jnp.float32)
    g = jax.nn.sigmoid(_linear(h2, layer["shared_gate"])
                       .astype(jnp.float32))                 # (T, 1)
    return g * y.astype(jnp.float32)


def _moe_block(x: jnp.ndarray, layer, cfg: LLMConfig) -> jnp.ndarray:
    """Mixtral sparse-MoE MLP: softmax router -> top-k -> renormalized
    weights -> weighted expert SwiGLUs -> +residual.

    Two formulations, same math (exactness-tested against each other):

    - **dense-all-experts** (decode / quantized banks): every expert
      computes, weighted by a (T, E) matrix that is zero off the
      top-k. No data-dependent gathers; at decode batch sizes the
      weight read dominates so the extra FLOPs are free.
    - **routed** (prefill-sized T, bf16 banks): sort token-slots by
      expert and grouped-matmul via ``lax.ragged_dot`` — K/E of the
      dense FLOPs (4x at Mixtral's 8/top-2). See _moe_routed.
    """
    h2 = _norm(x, layer["mlp_norm"], cfg.norm_eps, cfg.norm_type)
    logits = _linear(h2, layer["moe_gate"]).astype(jnp.float32)
    if cfg.moe_bias:
        # gpt-oss router bias: a true linear bias on the logits (it
        # shifts selection AND combine weights — unlike DeepSeek-V3's
        # selection-only moe_gate_bias below).
        logits = logits + layer["moe_gate_b"].astype(jnp.float32)
    if cfg.moe_score_func == "sigmoid":
        scores = jax.nn.sigmoid(logits)
    elif cfg.moe_score_func in ("softmax_topk", "sigmoid_topk"):
        # gpt-oss / Llama-4: select on raw logits; the combine
        # transform (softmax over the winners / per-winner sigmoid)
        # happens AFTER top-k (GptOssTopKRouter / Llama4Router).
        scores = logits
    else:
        scores = jax.nn.softmax(logits, axis=-1)             # (T, E)
    # Selection may differ from combination: DeepSeek-V3's
    # aux-loss-free balancing bias shifts WHICH experts win, never the
    # combine weights (transformers DeepseekV3TopkRouter).
    select = scores
    if "moe_gate_bias" in layer:
        select = scores + layer["moe_gate_bias"].astype(jnp.float32)
    if cfg.moe_n_groups > 1:
        # DeepSeek group-limited routing: keep only the topk_groups
        # groups with the best group score — per-group max (V2
        # group_limited_greedy) or sum of the group's top-2 (V3),
        # zeroing the rest before the expert top-k.
        t = select.shape[0]
        gsz = cfg.n_experts // cfg.moe_n_groups
        g = select.reshape(t, cfg.moe_n_groups, gsz)
        gscore = (jnp.sum(jax.lax.top_k(g, 2)[0], -1)
                  if cfg.moe_group_score == "top2sum"
                  else jnp.max(g, -1))
        gtop = jax.lax.top_k(gscore, cfg.moe_topk_groups)[1]  # (T, Gk)
        gmask = jnp.sum(jax.nn.one_hot(gtop, cfg.moe_n_groups,
                                       dtype=select.dtype), axis=-2)
        select = select * jnp.repeat(gmask, gsz, axis=-1)
    topi = jax.lax.top_k(select, cfg.n_experts_used)[1]
    topv = jnp.take_along_axis(scores, topi, axis=-1)
    if cfg.moe_score_func == "softmax_topk":
        topv = jax.nn.softmax(topv, axis=-1)
    elif cfg.moe_score_func == "sigmoid_topk":
        topv = jax.nn.sigmoid(topv)
    if cfg.moe_norm_topk:
        denom = jnp.sum(topv, axis=-1, keepdims=True)
        if cfg.moe_score_func == "sigmoid":
            denom = denom + 1e-20      # V3's guard: sums can be ~0
        topv = topv / denom
    if cfg.moe_routed_scale != 1.0:
        topv = topv * cfg.moe_routed_scale
    if _moe_use_routed(x.shape[0], layer["w_gu"]):
        out = (_moe_routed_scaled_in(h2, topv, topi, layer, cfg)
               if cfg.moe_scale_input else
               _moe_routed(h2, topv, topi, layer, cfg))
        out = (out + _moe_shared(h2, layer, cfg)).astype(x.dtype)
        if cfg.post_norms:
            out = _norm(out, layer["mlp_post_norm"], cfg.norm_eps,
                    cfg.norm_type)
        if cfg.residual_multiplier != 1.0:
            out = out * jnp.asarray(cfg.residual_multiplier, out.dtype)
        return x + out
    weights = jnp.sum(
        jax.nn.one_hot(topi, cfg.n_experts, dtype=jnp.float32)
        * topv[..., None], axis=-2)                          # (T, E)
    out = _moe_shared(h2, layer, cfg)
    for e in range(cfg.n_experts):
        # Llama-4 scales the expert INPUT by the router weight; the
        # off-top-k weights are exactly 0 and the experts have no
        # biases, so unselected experts contribute exactly 0 and the
        # dense-all formulation stays exact.
        h2_e = (h2 * weights[:, e:e + 1].astype(h2.dtype)
                if cfg.moe_scale_input else h2)
        gu = _linear(h2_e, _expert_slice(layer["w_gu"], e)).astype(
            jnp.float32)
        if cfg.moe_bias:
            gu = gu + layer["w_gu_b"][e].astype(jnp.float32)
        gate, up = jnp.split(gu, 2, axis=-1)
        y = _linear(_act_combine(gate, up, cfg.act, cfg.act_limit)
                    .astype(x.dtype), _expert_slice(layer["w_down"], e))
        y = y.astype(jnp.float32)
        if cfg.moe_bias:
            y = y + layer["w_down_b"][e].astype(jnp.float32)
        out = out + (y if cfg.moe_scale_input
                     else weights[:, e:e + 1] * y)
    out = out.astype(x.dtype)
    if cfg.post_norms:
        out = _norm(out, layer["mlp_post_norm"], cfg.norm_eps,
                    cfg.norm_type)
    if cfg.residual_multiplier != 1.0:
        out = out * jnp.asarray(cfg.residual_multiplier, out.dtype)
    return x + out


def _mlp(x: jnp.ndarray, layer, cfg: LLMConfig, li=None) -> jnp.ndarray:
    """Config-aware wrapper every forward body calls. ``li`` (traced
    layer index) is only consulted for interleaved dense/MoE configs
    (cfg.moe_pattern — Llama-4 Maverick)."""
    hybrid = cfg.n_experts and (cfg.moe_pattern > 1
                                or cfg.moe_first_dense > 0)
    if hybrid and li is not None:
        def dense(xx):
            return _mlp_block(
                xx, layer["mlp_norm"] if cfg.pre_norms else None,
                layer["w_gu_mlp"], layer["w_down_mlp"], cfg.norm_eps,
                act=cfg.act, post_norm=layer.get("mlp_post_norm"),
                residual_multiplier=cfg.residual_multiplier,
                norm_type=cfg.norm_type, gated=cfg.mlp_gated)

        is_moe = li >= cfg.moe_first_dense
        if cfg.moe_pattern > 1:
            is_moe &= (li % cfg.moe_pattern) == (cfg.moe_pattern - 1)
        return jax.lax.cond(
            is_moe, lambda xx: _moe_block(xx, layer, cfg), dense, x)
    if hybrid:
        # A caller that can't supply the layer index (train/pipeline/
        # ring bodies) must not silently run every layer as MoE.
        raise NotImplementedError(
            "interleaved dense/MoE (moe_pattern) needs the traced "
            "layer index — this path doesn't thread it yet")
    if cfg.n_experts:
        return _moe_block(x, layer, cfg)
    return _mlp_block(x, layer["mlp_norm"] if cfg.pre_norms else None,
                      layer["w_gu"],
                      layer["w_down"], cfg.norm_eps, act=cfg.act,
                      post_norm=layer.get("mlp_post_norm"),
                      residual_multiplier=cfg.residual_multiplier,
                      norm_type=cfg.norm_type, gated=cfg.mlp_gated,
                      w_gu_b=(layer.get("w_gu_b")
                              if cfg.mlp_bias else None),
                      w_down_b=(layer.get("w_down_b")
                                if cfg.mlp_bias else None))


def _attn_residual(x: jnp.ndarray, attn_out: jnp.ndarray, layer,
                   cfg: LLMConfig) -> jnp.ndarray:
    """wo projection (+ optional gpt-oss bias / Gemma-2 post-attention
    norm) + residual."""
    out = _linear(attn_out.astype(x.dtype), layer["wo"])
    if cfg.out_bias:
        out = out + layer["wo_bias"]
    if cfg.post_norms:
        out = _norm(out, layer["attn_post_norm"], cfg.norm_eps,
                    cfg.norm_type)
    if cfg.residual_multiplier != 1.0:
        out = out * jnp.asarray(cfg.residual_multiplier, out.dtype)
    return x + out


def _mlp_branch(h: jnp.ndarray, layer, cfg: LLMConfig) -> jnp.ndarray:
    """The dense-MLP branch output from an ALREADY-NORMED input (the
    parallel-residual path: no norm, no post-norm, no residual)."""
    gu = _linear(h, layer["w_gu"]).astype(jnp.float32)
    if cfg.mlp_bias and "w_gu_b" in layer:
        gu = gu + layer["w_gu_b"].astype(jnp.float32)
    if cfg.mlp_gated:
        gate, up = jnp.split(gu, 2, axis=-1)
        act_out = _act_combine(gate, up, cfg.act, cfg.act_limit)
    elif cfg.act == "relu2":
        act_out = jnp.square(jax.nn.relu(gu))
    else:
        # "gelu_exact" = erf GELU (Falcon's nn.GELU); default tanh
        # approximation (StarCoder2's gelu_pytorch_tanh).
        act_out = jax.nn.gelu(gu, approximate=cfg.act != "gelu_exact")
    out = _linear(act_out.astype(h.dtype), layer["w_down"])
    if cfg.mlp_bias and "w_down_b" in layer:
        out = out + layer["w_down_b"]
    return out


def _layer_tail(x: jnp.ndarray, h: jnp.ndarray, attn: jnp.ndarray,
                layer, cfg: LLMConfig, li=None) -> jnp.ndarray:
    """Everything after the attention weights: sequential residuals
    (default) or Command-R's parallel residual (CohereDecoderLayer:
    hidden = residual + attn_out + mlp(h) with ONE shared norm)."""
    if cfg.parallel_residual:
        out = _linear(attn.astype(x.dtype), layer["wo"])
        if cfg.out_bias:
            out = out + layer["wo_bias"]
        # Falcon new-arch: the MLP branch norms the residual stream
        # itself (ln_mlp) instead of sharing the attention norm.
        hm = (_norm(x, layer["mlp_norm"], cfg.norm_eps, cfg.norm_type)
              if cfg.parallel_mlp_norm else h)
        return x + out + _mlp_branch(hm, layer, cfg).astype(x.dtype)
    x = _attn_residual(x, attn, layer, cfg)
    return _mlp(x, layer, cfg, li=li)


def _attn_scale(cfg: LLMConfig) -> float:
    """The actual attention score scale: 1/sqrt(query scalar or
    head_dim), times the longrope attention factor squared."""
    base = 1.0 / math.sqrt(cfg.query_pre_attn_scalar
                           or cfg.head_dim)
    return base * cfg.rope_attention_factor ** 2


def _attn_extras(cfg: LLMConfig) -> dict:
    """softcap/scale kwargs shared by every attention call (scale 0.0
    = the kernels' own 1/sqrt(head_dim) default)."""
    scale = _attn_scale(cfg)
    if (not cfg.query_pre_attn_scalar
            and cfg.rope_attention_factor == 1.0):
        scale = 0.0
    return {"softcap": cfg.attn_softcap, "scale": scale}


def _layer_window(cfg: LLMConfig) -> int:
    return (cfg.sliding_window
            if 0 < cfg.sliding_window < cfg.max_seq else 0)


def _per_layer_windows(cfg: LLMConfig) -> bool:
    """True when the window applies to only SOME layers."""
    return cfg.alt_window or cfg.window_pattern > 1


def _is_sliding(cfg: LLMConfig, li) -> jnp.ndarray:
    """Traced bool: layer ``li`` uses the sliding window. Gemma-2 /
    gpt-oss slide the even layers; Gemma-3's pattern makes every
    ``window_pattern``-th layer global and slides the rest."""
    if cfg.window_pattern > 1:
        return (li % cfg.window_pattern) != (cfg.window_pattern - 1)
    return li % 2 == 0


def _decode_attn(cfg: LLMConfig, li, q, k_view, v_view, cur_len,
                 layer=None):
    """decode_attention with the config's window policy: fixed window,
    or Gemma-2 alternating local(even)/global(odd) layers — ``li`` is
    the traced layer index, so both static-window programs compile and
    lax.cond picks per layer. ``layer`` (the scanned per-layer param
    slice) supplies the gpt-oss attention sinks when the config has
    them."""
    kw = _attn_extras(cfg)
    if cfg.attn_sinks:
        kw["sinks"] = layer["attn_sink"]
    if cfg.attn_chunk:
        # Llama-4: rope layers attend within aligned chunks; NoPE
        # layers are global. Both static-chunk programs compile and
        # lax.cond picks per traced layer index.
        return jax.lax.cond(
            _is_nope(cfg, li) if cfg.nope_pattern > 1
            else jnp.bool_(False),
            lambda: decode_attention(q, k_view, v_view, cur_len,
                                     window=0, **kw),
            lambda: decode_attention(q, k_view, v_view, cur_len,
                                     window=0, chunk=cfg.attn_chunk,
                                     **kw))
    win = _layer_window(cfg)
    if _per_layer_windows(cfg) and win > 0:
        return jax.lax.cond(
            _is_sliding(cfg, li),
            lambda: decode_attention(q, k_view, v_view, cur_len,
                                     window=win, **kw),
            lambda: decode_attention(q, k_view, v_view, cur_len,
                                     window=0, **kw))
    return decode_attention(q, k_view, v_view, cur_len, window=win, **kw)


def _bidir_prefill_attn(cfg: LLMConfig, q, k, v,
                        bidir_len: jnp.ndarray) -> jnp.ndarray:
    """Prefix-LM prefill attention ((H, S, D) operands): positions
    before ``bidir_len`` (traced) attend to each other BIDIRECTIONALLY;
    everything else is causal. PaliGemma's inference mask (transformers
    modeling_paligemma._update_causal_mask: the whole input prompt is
    mutually visible; generated tokens are causal). Dense XLA path —
    the prompt pass is one-time, and prefix-LM configs are plain
    attention (no windows/chunks/sinks)."""
    rep = cfg.n_heads // cfg.n_kv_heads
    s = q.shape[1]
    qg = q.reshape(cfg.n_kv_heads, rep, s, cfg.head_dim).astype(k.dtype)
    scores = jnp.einsum("grqd,gsd->grqs", qg, k,
                        preferred_element_type=jnp.float32
                        ) * _attn_scale(cfg)
    if cfg.attn_softcap > 0.0:
        scores = cfg.attn_softcap * jnp.tanh(scores / cfg.attn_softcap)
    idx = jnp.arange(s)
    causal = idx[None, :] <= idx[:, None]               # (q, key)
    bid = (idx[:, None] < bidir_len) & (idx[None, :] < bidir_len)
    scores = jnp.where((causal | bid)[None, None], scores, -1e30)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("grqs,gsd->grqd", probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.reshape(cfg.n_heads, s, cfg.head_dim)


def _prefill_attn(cfg: LLMConfig, li, q, k, v, layer=None):
    """prefill_attention ((H, S, D) operands) with the same window
    policy as :func:`_decode_attn`."""
    kw = _attn_extras(cfg)
    if cfg.attn_sinks:
        kw["sinks"] = layer["attn_sink"]
    if cfg.attn_chunk:
        return jax.lax.cond(
            _is_nope(cfg, li) if cfg.nope_pattern > 1
            else jnp.bool_(False),
            lambda: prefill_attention(q, k, v, causal=True, window=0,
                                      **kw),
            lambda: prefill_attention(q, k, v, causal=True, window=0,
                                      chunk=cfg.attn_chunk, **kw))
    win = _layer_window(cfg)
    if _per_layer_windows(cfg) and win > 0:
        return jax.lax.cond(
            _is_sliding(cfg, li),
            lambda: prefill_attention(q, k, v, causal=True, window=win,
                                      **kw),
            lambda: prefill_attention(q, k, v, causal=True, window=0,
                                      **kw))
    return prefill_attention(q, k, v, causal=True, window=win, **kw)


def _output_logits(params: Dict[str, Any], cfg: LLMConfig,
                   x: jnp.ndarray) -> jnp.ndarray:
    """Final norm -> lm_head (-> Gemma-2 logit soft-cap), f32."""
    logits = _linear(_norm(x, params["out_norm"], cfg.norm_eps,
                           cfg.norm_type),
                     params["lm_head"]).astype(jnp.float32)
    if cfg.logit_softcap > 0.0:
        logits = cfg.logit_softcap * jnp.tanh(logits / cfg.logit_softcap)
    return logits


# ---------------------------------------------------------------------------
# RoPE
# ---------------------------------------------------------------------------

def _rope_freqs(cfg: LLMConfig) -> jnp.ndarray:
    half = int(cfg.head_dim * cfg.partial_rotary_factor) // 2
    return 1.0 / (cfg.rope_theta ** (jnp.arange(half, dtype=jnp.float32) / half))


def _freqs(params: Dict[str, Any], cfg: LLMConfig,
           total_len=None) -> jnp.ndarray:
    """Rope frequencies, divided by the checkpoint's per-frequency
    factors when present:

    - ``params["rope_factors"]`` — Llama-3.1-style static divisors
      (real 3.1+ GGUFs ship them as a ``rope_freqs.weight`` tensor
      that llama.cpp applies the same way);
    - ``params["rope_factors_short"/"rope_factors_long"]`` — Phi-3
      longrope: the long set engages when ``total_len`` (the total
      sequence length this dispatch reaches, traced) exceeds
      cfg.rope_original_max_seq — matching transformers' per-forward
      choice (cached KV keeps the rotation it was written with, the
      reference semantics)."""
    freqs = _rope_freqs(cfg)
    if "rope_factors_short" in params:
        ext = jnp.where(
            jnp.asarray(total_len) > cfg.rope_original_max_seq,
            params["rope_factors_long"], params["rope_factors_short"])
        return freqs / ext
    rf = params.get("rope_factors")
    return freqs / rf if rf is not None else freqs


def _local_rope_freqs(cfg: LLMConfig) -> jnp.ndarray:
    """Gemma-3 sliding-layer rope base (rope_local_base_freq) —
    NEVER scaled by rope_factors (transformers pins the local rotary
    to rope_type=default regardless of rope_scaling)."""
    half = int(cfg.head_dim * cfg.partial_rotary_factor) // 2
    return 1.0 / (cfg.rope_local_theta
                  ** (jnp.arange(half, dtype=jnp.float32) / half))


def _layer_freqs(cfg: LLMConfig, li, freqs: jnp.ndarray) -> jnp.ndarray:
    """Per-layer rope frequency select inside the layer scan: with
    ``rope_local_theta`` set (Gemma-3), sliding layers rotate with the
    local base and global layers with ``freqs`` (the scaled global
    set); with ``nope_pattern`` set (SmolLM3), every pattern-th layer
    rotates by ZERO frequencies — cos=1/sin=0 makes apply_rope the
    identity, so NoPE costs nothing extra. ``li`` is traced, so each
    select is one jnp.where — not a cond."""
    if cfg.rope_local_theta:
        freqs = jnp.where(_is_sliding(cfg, li), _local_rope_freqs(cfg),
                          freqs)
    if cfg.nope_pattern > 1:
        freqs = jnp.where((li % cfg.nope_pattern) == cfg.nope_pattern - 1,
                          jnp.zeros_like(freqs), freqs)
    return freqs


def linear_rope_factors(cfg: LLMConfig, factor: float) -> jnp.ndarray:
    """Uniform linear rope scaling as a divisor vector (transformers'
    rope_type=linear / llama.cpp rope.scaling.type=linear): every
    frequency divides by ``factor``. Gemma-3 4B+ ship factor 8 on the
    GLOBAL rope; store as ``params["rope_factors"]``."""
    return jnp.full((cfg.head_dim // 2,), float(factor), jnp.float32)


def llama3_rope_factors(cfg: LLMConfig, factor: float = 8.0,
                        low_freq_factor: float = 1.0,
                        high_freq_factor: float = 4.0,
                        original_max_seq: int = 8192) -> jnp.ndarray:
    """Compute Llama-3.1's per-frequency rope scaling DIVISORS (the
    published smooth-interpolation recipe; matches transformers'
    llama3 rope init and the rope_freqs tensor convert_hf_to_gguf
    bakes): long wavelengths divide by ``factor``, short ones stay,
    the midband interpolates. Store as ``params["rope_factors"]``."""
    freqs = _rope_freqs(cfg)
    wavelen = 2.0 * jnp.pi / freqs
    low_wl = original_max_seq / low_freq_factor
    high_wl = original_max_seq / high_freq_factor
    smooth = (original_max_seq / wavelen - low_freq_factor) / (
        high_freq_factor - low_freq_factor)
    smooth = jnp.clip(smooth, 0.0, 1.0)
    # scaled_freq = (1-smooth)*freq/factor + smooth*freq
    # expressed as a divisor d with freq/d:
    inv = (1.0 - smooth) / factor + smooth
    d = jnp.where(wavelen > low_wl, factor,
                  jnp.where(wavelen < high_wl, 1.0, 1.0 / inv))
    return d.astype(jnp.float32)


def yarn_rope_factors(cfg: LLMConfig, factor: float,
                      original_max_seq: int,
                      beta_fast: float = 32.0,
                      beta_slow: float = 1.0,
                      truncate: bool = True) -> jnp.ndarray:
    """YaRN per-frequency rope DIVISORS (transformers'
    ``_compute_yarn_parameters`` / llama.cpp's ggml yarn ramp, the
    scheme llama.cpp engages for GGUFs with
    ``rope.scaling.type=yarn`` — the reference's long-context path,
    src/ai_models/tk_model_loader.c loads such models via llama.cpp):
    high-frequency dims (more than ``beta_fast`` rotations over the
    original context) extrapolate unchanged, low-frequency dims (fewer
    than ``beta_slow`` rotations) interpolate — divide by ``factor`` —
    and the band between blends linearly by dim index. Store as
    ``params["rope_factors"]`` and pair with
    ``cfg.rope_attention_factor = yarn_attention_factor(factor)``."""
    half = cfg.head_dim // 2

    def corr_dim(n_rot: float) -> float:
        # Dim index whose frequency completes n_rot rotations over the
        # original context: solve orig * freq_i = 2*pi*n_rot.
        return (cfg.head_dim
                * math.log(original_max_seq / (n_rot * 2.0 * math.pi))
                / (2.0 * math.log(cfg.rope_theta)))

    # ``truncate`` (rope_scaling["truncate"], default True) floors/ceils
    # the correction range to whole dims; gpt-oss ships truncate=False
    # (continuous bounds), matching transformers' find_correction_range.
    low_f, high_f = corr_dim(beta_fast), corr_dim(beta_slow)
    if truncate:
        low_f, high_f = math.floor(low_f), math.ceil(high_f)
    low = max(low_f, 0)
    high = min(high_f, cfg.head_dim - 1)
    if high == low:
        high += 0.001                    # transformers' singularity guard
    ramp = jnp.clip(
        (jnp.arange(half, dtype=jnp.float32) - low) / (high - low),
        0.0, 1.0)
    ext = 1.0 - ramp                     # 1 = extrapolate, 0 = interpolate
    d = 1.0 / (ext + (1.0 - ext) / factor)
    return d.astype(jnp.float32)


def yarn_attention_factor(factor: float) -> float:
    """YaRN mscale ``0.1*ln(s) + 1``: the reference implementations
    multiply cos/sin by it, which equals scaling attention scores by
    its square — this framework's ``cfg.rope_attention_factor`` hook
    (see :func:`_attn_scale`)."""
    return 0.1 * math.log(factor) + 1.0 if factor > 1.0 else 1.0


def apply_rope(x: jnp.ndarray, positions: jnp.ndarray,
               freqs: jnp.ndarray) -> jnp.ndarray:
    """Rotate (..., S, H, D) by per-position angles (split-half layout,
    matching Mistral/Llama reference weights). Partial rotary (GLM-4:
    2*len(freqs) < D) rotates only the leading dims — the static freqs
    length IS the rotary width, so no extra knob reaches this layer."""
    ang = positions[..., :, None].astype(jnp.float32) * freqs  # (S, R/2)
    cos = jnp.cos(ang)[..., :, None, :]
    sin = jnp.sin(ang)[..., :, None, :]
    rot = 2 * freqs.shape[-1]
    xr = x[..., :rot].astype(jnp.float32)
    x1, x2 = jnp.split(xr, 2, axis=-1)
    out = jnp.concatenate([x1 * cos - x2 * sin, x1 * sin + x2 * cos],
                          axis=-1).astype(x.dtype)
    if rot == x.shape[-1]:
        return out
    return jnp.concatenate([out, x[..., rot:]], axis=-1)


def _is_nope(cfg: LLMConfig, li) -> jnp.ndarray:
    """Traced bool: layer ``li`` is a NoPE layer (SmolLM3/Llama-4)."""
    return (li % cfg.nope_pattern) == (cfg.nope_pattern - 1)


def _post_rope_qk(q: jnp.ndarray, k: jnp.ndarray, positions, li,
                  cfg: LLMConfig):
    """Llama-4's post-rope q/k processing (Llama4TextAttention):
    weightless L2 (RMS) norm on ROPE layers; position-dependent query
    temperature tuning on NoPE layers. No-op unless configured.
    ``positions`` broadcasts over q's leading sequence axis (q is
    (..., S, H, D))."""
    if not (cfg.qk_l2norm or cfg.attn_temp_tuning):
        return q, k
    nope = (_is_nope(cfg, li) if cfg.nope_pattern > 1
            else jnp.bool_(False))
    if cfg.qk_l2norm:
        def l2(v):
            v32 = v.astype(jnp.float32)
            return (v32 * jax.lax.rsqrt(
                jnp.mean(v32 * v32, axis=-1, keepdims=True)
                + cfg.norm_eps)).astype(v.dtype)

        q = jnp.where(nope, q, l2(q))
        k = jnp.where(nope, k, l2(k))
    if cfg.attn_temp_tuning:
        sc = (jnp.log1p(jnp.floor(
            (positions.astype(jnp.float32) + 1.0) / cfg.attn_temp_floor))
            * cfg.attn_temp_scale + 1.0)
        q_t = (q.astype(jnp.float32) * sc[..., :, None, None]
               ).astype(q.dtype)
        q = jnp.where(nope, q_t, q)
    return q, k


# ---------------------------------------------------------------------------
# KV cache
# ---------------------------------------------------------------------------

class KVCache(NamedTuple):
    k: jnp.ndarray  # (L, S_max, Hk, D)
    v: jnp.ndarray  # (L, S_max, Hk, D)
    length: jnp.ndarray  # scalar int32 — tokens written so far

    @classmethod
    def create(cls, cfg: LLMConfig, dtype: jnp.dtype = jnp.bfloat16,
               max_seq: Optional[int] = None) -> "KVCache":
        s = max_seq or cfg.max_seq
        shape = (cfg.n_layers, s, cfg.n_kv_heads, cfg.head_dim)
        return cls(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype),
                   length=jnp.int32(0))


@jax.jit
def embed_tokens(params: Dict[str, Any], tokens: jnp.ndarray) -> jnp.ndarray:
    """Token-embedding lookup as its own device program: the multimodal
    splice (llm/vlm.py) embeds a text chunk, overwrites the image rows
    with projected CLIP features, then feeds the result to
    :func:`prefill`/:func:`extend` via their ``embeds`` argument."""
    return params["tok_emb"][tokens.astype(jnp.int32)]


# ---------------------------------------------------------------------------
# Forward: prefill (bucketed length, scan over layers)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("cfg",))
def prefill(params: Dict[str, Any], cfg: LLMConfig, tokens: jnp.ndarray,
            length: jnp.ndarray, cache: KVCache,
            embeds: Optional[jnp.ndarray] = None,
            bidir_len: Optional[jnp.ndarray] = None,
            ) -> Tuple[jnp.ndarray, KVCache]:
    """Run the prompt through the model, filling the KV cache.

    ``tokens`` is a (S_pad,) bucket (padded with anything); ``length`` is
    the true prompt length. Returns logits of the *last real token*
    (what sampling needs) and the filled cache. Padded positions write
    garbage at cache slots >= length, which decode masks via cache.length
    — causality means they never contaminate real positions.

    ``embeds`` ((S_pad, dim), optional) replaces the token-embedding
    lookup — the multimodal injection point (models/clip.py image
    features spliced between text embeddings, llama.cpp's llava-style
    ``embd`` batch input). When None (the default) the traced program
    is identical to before the argument existed.

    ``bidir_len`` (traced scalar, optional): prefix-LM attention —
    positions before it attend bidirectionally (PaliGemma's inference
    mask; see :func:`_bidir_prefill_attn`). Plain-attention configs
    only. Must satisfy bidir_len <= length.
    """
    if bidir_len is not None and (
            _layer_window(cfg) or cfg.attn_chunk or cfg.attn_sinks
            or cfg.nope_pattern > 1 or cfg.window_pattern > 1
            or cfg.alt_window):
        raise NotImplementedError(
            "prefix-LM (bidir_len) supports plain-attention configs "
            "only")
    s_pad = tokens.shape[0]
    freqs = _freqs(params, cfg, length)
    positions = jnp.arange(s_pad)
    if embeds is not None:
        x = embeds.astype(params["tok_emb"].dtype)  # (S, D)
    else:
        x = params["tok_emb"][tokens]  # (S, D)

    qd = cfg.n_heads * cfg.head_dim
    kvd = cfg.n_kv_heads * cfg.head_dim

    def layer_fn(x, inputs):
        layer, li = inputs
        h = _attn_in(x, layer, cfg)
        qkv = _linear(h, layer["wqkv"])
        if cfg.qkv_bias:
            qkv = qkv + layer["wqkv_bias"]
        q = qkv[:, :qd].reshape(s_pad, cfg.n_heads, cfg.head_dim)
        k = qkv[:, qd:qd + kvd].reshape(s_pad, cfg.n_kv_heads, cfg.head_dim)
        v = qkv[:, qd + kvd:].reshape(s_pad, cfg.n_kv_heads, cfg.head_dim)
        q, k = _qk_norm(q, k, layer, cfg)
        freqs_li = _layer_freqs(cfg, li, freqs)
        q = apply_rope(q, positions, freqs_li)
        k = apply_rope(k, positions, freqs_li)
        q, k = _post_rope_qk(q, k, positions, li, cfg)

        if bidir_len is not None:
            attn = _bidir_prefill_attn(
                cfg, q.transpose(1, 0, 2), k.transpose(1, 0, 2),
                v.transpose(1, 0, 2), bidir_len
            ).transpose(1, 0, 2).reshape(s_pad, -1)
        else:
            attn = _prefill_attn(
                cfg, li, q.transpose(1, 0, 2), k.transpose(1, 0, 2),
                v.transpose(1, 0, 2), layer=layer
            ).transpose(1, 0, 2).reshape(s_pad, -1)
        x = _layer_tail(x, h, attn, layer, cfg, li=li)
        return x, (k, v)

    x, (ks, vs) = jax.lax.scan(
        layer_fn, x, (params["layers"], jnp.arange(cfg.n_layers)))

    new_cache = KVCache(
        k=jax.lax.dynamic_update_slice(cache.k, ks.astype(cache.k.dtype),
                                       (0, 0, 0, 0)),
        v=jax.lax.dynamic_update_slice(cache.v, vs.astype(cache.v.dtype),
                                       (0, 0, 0, 0)),
        length=length.astype(jnp.int32),
    )
    x_last = x[jnp.maximum(length - 1, 0)]
    logits = _output_logits(params, cfg, x_last[None])[0]
    return logits, new_cache


@functools.partial(jax.jit, static_argnames=("cfg", "cache_dtype"))
def prefill_batch(params: Dict[str, Any], cfg: LLMConfig,
                  tokens: jnp.ndarray, lengths: jnp.ndarray,
                  cache_dtype=jnp.bfloat16,
                  ) -> Tuple[jnp.ndarray, KVCache]:
    """Bucketed prefill of a whole admission wave: ``tokens`` is
    (B, S_pad), ``lengths`` (B,). Returns ((B, V) last-real-token
    logits, a KVCache pytree with a leading batch axis — k/v are
    (B, L, S_max, Hk, D), length is (B,)).

    Prefill at small M is weight-bandwidth-heavy like decode, so the
    wave's matmuls run FLATTENED to (B*S_pad, D) — each layer streams
    its (quantized) weights ONCE for every prompt admitted together.
    A naive jax.vmap over :func:`prefill` does NOT get this: the Pallas
    dequant-matmul kernels vmap to a batch grid dimension that
    re-streams the weights per row (measured slower than B serial
    prefills once the per-row cache zeros/copies are added). Only
    attention, which has no weights, is vmapped per sequence — rows
    never attend across sequences. Rows past a request's length hold
    garbage exactly like single prefill's padded tail (masked by
    cache.length downstream). Dummy rows (length 0) are legal."""
    b, s_pad = tokens.shape
    freqs = _freqs(params, cfg, jnp.max(lengths))
    positions = jnp.arange(s_pad)
    x = params["tok_emb"][tokens]  # (B, S, D)
    qd = cfg.n_heads * cfg.head_dim
    kvd = cfg.n_kv_heads * cfg.head_dim

    def layer_fn(x, inputs):
        layer, li = inputs
        h = _attn_in(x, layer, cfg)
        qkv = _linear(h.reshape(b * s_pad, -1),
                      layer["wqkv"]).reshape(b, s_pad, -1)
        if cfg.qkv_bias:
            qkv = qkv + layer["wqkv_bias"]
        q = qkv[..., :qd].reshape(b, s_pad, cfg.n_heads, cfg.head_dim)
        k = qkv[..., qd:qd + kvd].reshape(
            b, s_pad, cfg.n_kv_heads, cfg.head_dim)
        v = qkv[..., qd + kvd:].reshape(
            b, s_pad, cfg.n_kv_heads, cfg.head_dim)
        q, k = _qk_norm(q, k, layer, cfg)
        freqs_li = _layer_freqs(cfg, li, freqs)
        q = apply_rope(q, positions, freqs_li)
        k = apply_rope(k, positions, freqs_li)
        q, k = _post_rope_qk(q, k, positions, li, cfg)
        attn = jax.vmap(lambda qq, kk, vv: _prefill_attn(
            cfg, li, qq.transpose(1, 0, 2), kk.transpose(1, 0, 2),
            vv.transpose(1, 0, 2), layer=layer).transpose(1, 0, 2))(q, k, v)
        x = _layer_tail(
            x.reshape(b * s_pad, -1), h.reshape(b * s_pad, -1),
            attn.reshape(b * s_pad, -1), layer, cfg, li=li
        ).reshape(b, s_pad, -1)
        return x, (k, v)

    x, (ks, vs) = jax.lax.scan(
        layer_fn, x, (params["layers"], jnp.arange(cfg.n_layers)))
    # ks/vs: (L, B, S, Hk, D) -> per-row caches (B, L, S_max, Hk, D).
    shape = (b, cfg.n_layers, cfg.max_seq, cfg.n_kv_heads, cfg.head_dim)
    k_full = jax.lax.dynamic_update_slice(
        jnp.zeros(shape, cache_dtype),
        ks.transpose(1, 0, 2, 3, 4).astype(cache_dtype), (0, 0, 0, 0, 0))
    v_full = jax.lax.dynamic_update_slice(
        jnp.zeros(shape, cache_dtype),
        vs.transpose(1, 0, 2, 3, 4).astype(cache_dtype), (0, 0, 0, 0, 0))
    x_last = x[jnp.arange(b), jnp.maximum(lengths - 1, 0)]  # (B, D)
    logits = _output_logits(params, cfg, x_last)
    return logits, KVCache(
        k=k_full, v=v_full, length=lengths.astype(jnp.int32))


# ---------------------------------------------------------------------------
# Forward: single-token decode
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("cfg", "attn_len"))
def decode_step(params: Dict[str, Any], cfg: LLMConfig, token: jnp.ndarray,
                cache: KVCache, attn_len: Optional[int] = None,
                ) -> Tuple[jnp.ndarray, KVCache]:
    """One decode step: token (scalar int32) -> logits (V,), cache+1.

    The whole step is a single compiled program (scan over layers); the
    host loop around it only samples and feeds the next token.

    ``attn_len`` (static) bounds the cache prefix attention reads: at a
    4096 window the full cache costs ~0.5 GB of reads per token even for
    a 100-token conversation; the runner passes a power-of-two bucket
    covering the live prefix instead (each bucket is its own compiled
    variant). Must satisfy attn_len > cache.length.
    """
    pos = cache.length  # position of this new token
    freqs = _freqs(params, cfg, pos + 1)
    x = params["tok_emb"][token][None]  # (1, D)

    def layer_fn(carry, inputs):
        x = carry
        layer, k_cache_l, v_cache_l, li = inputs
        qd = cfg.n_heads * cfg.head_dim
        kvd = cfg.n_kv_heads * cfg.head_dim
        h = _attn_in(x, layer, cfg)
        qkv = _linear(h, layer["wqkv"])
        if cfg.qkv_bias:
            qkv = qkv + layer["wqkv_bias"]
        q = qkv[:, :qd].reshape(1, cfg.n_heads, cfg.head_dim)
        k = qkv[:, qd:qd + kvd].reshape(1, cfg.n_kv_heads, cfg.head_dim)
        v = qkv[:, qd + kvd:].reshape(1, cfg.n_kv_heads, cfg.head_dim)
        q, k = _qk_norm(q, k, layer, cfg)
        freqs_li = _layer_freqs(cfg, li, freqs)
        q = apply_rope(q, pos[None], freqs_li)
        k = apply_rope(k, pos[None], freqs_li)
        q, k = _post_rope_qk(q, k, pos[None], li, cfg)

        k_cache_l = jax.lax.dynamic_update_slice(
            k_cache_l, k.astype(k_cache_l.dtype), (pos, 0, 0))
        v_cache_l = jax.lax.dynamic_update_slice(
            v_cache_l, v.astype(v_cache_l.dtype), (pos, 0, 0))

        k_view = k_cache_l[:attn_len] if attn_len else k_cache_l
        v_view = v_cache_l[:attn_len] if attn_len else v_cache_l
        attn = _decode_attn(cfg, li, q[0], k_view, v_view, pos + 1,
                            layer=layer)
        x = _layer_tail(x, h, attn.reshape(1, -1), layer, cfg, li=li)
        return x, (k_cache_l, v_cache_l)

    x, (new_k, new_v) = jax.lax.scan(
        layer_fn, x, (params["layers"], cache.k, cache.v,
                      jnp.arange(cfg.n_layers)))

    logits = _output_logits(params, cfg, x)[0]
    return logits, KVCache(new_k, new_v, pos + 1)


# ---------------------------------------------------------------------------
# Forward: batched decode (multi-conversation serving)
# ---------------------------------------------------------------------------

class BatchedKVCache(NamedTuple):
    """Per-slot KV caches for a fixed batch of conversations.

    (Beyond the reference: llama.cpp serves one context per process; this
    is the continuous-batching layout that keeps the MXU busy when many
    sessions decode together — tokens/step scale with active slots at
    nearly the same weight-stream cost.)
    """

    k: jnp.ndarray        # (L, B, S_max, Hk, D)
    v: jnp.ndarray        # (L, B, S_max, Hk, D)
    lengths: jnp.ndarray  # (B,) int32

    @classmethod
    def create(cls, cfg: LLMConfig, batch: int,
               dtype: jnp.dtype = jnp.bfloat16,
               max_seq: Optional[int] = None) -> "BatchedKVCache":
        s = max_seq or cfg.max_seq
        shape = (cfg.n_layers, batch, s, cfg.n_kv_heads, cfg.head_dim)
        return cls(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype),
                   lengths=jnp.zeros((batch,), jnp.int32))


@functools.partial(jax.jit, static_argnames=("cfg", "slot"))
def insert_sequence(cache: BatchedKVCache, cfg: LLMConfig, slot: int,
                    seq_cache: KVCache) -> BatchedKVCache:
    """Copy a single-sequence cache (from prefill) into batch slot
    ``slot``; the slot's length follows the sequence's."""
    k = jax.lax.dynamic_update_slice(
        cache.k, seq_cache.k[:, None].astype(cache.k.dtype),
        (0, slot, 0, 0, 0))
    v = jax.lax.dynamic_update_slice(
        cache.v, seq_cache.v[:, None].astype(cache.v.dtype),
        (0, slot, 0, 0, 0))
    lengths = cache.lengths.at[slot].set(seq_cache.length)
    return BatchedKVCache(k, v, lengths)


@functools.partial(jax.jit, static_argnames=("cfg", "attn_len"))
def decode_step_batch(params: Dict[str, Any], cfg: LLMConfig,
                      tokens: jnp.ndarray, active: jnp.ndarray,
                      cache: BatchedKVCache,
                      attn_len: Optional[int] = None,
                      ) -> Tuple[jnp.ndarray, BatchedKVCache]:
    """One decode step for every active slot: tokens (B,) -> logits
    (B, V). Inactive slots (active=False) compute but write nothing and
    do not advance.

    ``attn_len`` (static) bounds every slot's KV attention reads, like
    decode_step's: without it each step streams the full (B, max_seq)
    cache even when every conversation is short. Must satisfy
    attn_len > max(lengths) over active slots."""
    b = tokens.shape[0]
    pos = cache.lengths  # (B,) position of each new token
    freqs = _freqs(params, cfg, jnp.max(pos) + 1)
    x = params["tok_emb"][tokens]  # (B, D)
    qd = cfg.n_heads * cfg.head_dim
    kvd = cfg.n_kv_heads * cfg.head_dim

    def layer_fn(carry, inputs):
        x = carry
        layer, k_cache_l, v_cache_l, li = inputs  # caches: (B, S, Hk, D)
        h = _attn_in(x, layer, cfg)
        qkv = _linear(h, layer["wqkv"])
        if cfg.qkv_bias:
            qkv = qkv + layer["wqkv_bias"]
        q = qkv[:, :qd].reshape(b, cfg.n_heads, cfg.head_dim)
        k = qkv[:, qd:qd + kvd].reshape(b, cfg.n_kv_heads, cfg.head_dim)
        v = qkv[:, qd + kvd:].reshape(b, cfg.n_kv_heads, cfg.head_dim)
        q, k = _qk_norm(q, k, layer, cfg)
        freqs_li = _layer_freqs(cfg, li, freqs)
        def rope_row(qq, kk, p):
            qr = apply_rope(qq[None], p[None], freqs_li)
            kr = apply_rope(kk[None], p[None], freqs_li)
            qr, kr = _post_rope_qk(qr, kr, p[None], li, cfg)
            return qr[0], kr[0]

        q, k = jax.vmap(rope_row)(q, k, pos)

        def write_row(cache_row, val, p, act):
            new = jax.lax.dynamic_update_slice(
                cache_row, val[None].astype(cache_row.dtype), (p, 0, 0))
            return jnp.where(act, new, cache_row)

        k_cache_l = jax.vmap(write_row)(k_cache_l, k, pos, active)
        v_cache_l = jax.vmap(write_row)(v_cache_l, v, pos, active)

        k_view = k_cache_l[:, :attn_len] if attn_len else k_cache_l
        v_view = v_cache_l[:, :attn_len] if attn_len else v_cache_l
        attn = jax.vmap(
            lambda qq, kc, vc, p: _decode_attn(cfg, li, qq, kc, vc, p + 1,
                                               layer=layer)
        )(q, k_view, v_view, pos)
        x = _layer_tail(x, h, attn.reshape(b, -1), layer, cfg, li=li)
        return x, (k_cache_l, v_cache_l)

    x, (new_k, new_v) = jax.lax.scan(
        layer_fn, x, (params["layers"], cache.k, cache.v,
                      jnp.arange(cfg.n_layers)))
    logits = _output_logits(params, cfg, x)
    lengths = jnp.where(active, pos + 1, pos)
    return logits, BatchedKVCache(new_k, new_v, lengths)


@functools.partial(jax.jit, static_argnames=("cfg", "n_steps", "attn_len"))
def decode_steps_batch(params: Dict[str, Any], cfg: LLMConfig,
                       tokens: jnp.ndarray, active: jnp.ndarray,
                       cache: BatchedKVCache, n_steps: int,
                       attn_len: Optional[int] = None,
                       ) -> Tuple[jnp.ndarray, BatchedKVCache]:
    """``n_steps`` greedy batch-decode steps as ONE compiled program.

    lax.scan over :func:`decode_step_batch` with on-device argmax token
    feedback. Returns ``(produced (n_steps, B), cache)`` where
    ``produced[j]`` is the token sampled after step ``j`` (the chain
    t1..t_k given input t0 = ``tokens``).

    This is the server's steady-state fast path: the per-step host
    fetch of sampled tokens in ``LLMServer._serve_loop_inner`` is a
    full relay round trip that does NOT pipeline (same failure mode as
    the old per-token ASR loop, PERF_NOTES.md); chunking k steps pays
    it once per k tokens. Inactive slots compute but never advance.
    """
    def step(carry, _):
        toks, cache = carry
        logits, cache = decode_step_batch(params, cfg, toks, active, cache,
                                          attn_len=attn_len)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return (nxt, cache), nxt

    (_, cache), produced = jax.lax.scan(
        step, (tokens, cache), None, length=n_steps)
    return produced, cache


# ---------------------------------------------------------------------------
# Forward: append a token chunk to an existing cache (tool-response
# re-injection, conversation continuation)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("cfg", "attn_len",
                                              "all_logits"))
def extend(params: Dict[str, Any], cfg: LLMConfig, tokens: jnp.ndarray,
           n_valid: jnp.ndarray, cache: KVCache,
           attn_len: Optional[int] = None, all_logits: bool = False,
           embeds: Optional[jnp.ndarray] = None,
           ) -> Tuple[jnp.ndarray, KVCache]:
    """Append a (bucketed, padded) token chunk after ``cache.length``.

    ``embeds`` ((B, dim), optional) replaces the token-embedding lookup
    (the multimodal injection point — see :func:`prefill`).

    Chunked prefill: the whole chunk runs in ONE parallel pass — each new
    token attends to the existing cache prefix plus causally within the
    chunk — instead of token-by-token decode. A 256-token tool response
    costs one forward, not 256 sequential steps. Padded positions write
    past the final length (length-masked later, overwritten as real
    tokens arrive). Returns the logits at the last *valid* token.

    ``attn_len`` (static) bounds the cache prefix attention reads, like
    decode_step's: without it every chunk pays a dense f32 pass over
    the full S_max cache (0.5 GB of reads at 4096) regardless of the
    live prefix. Must satisfy attn_len >= cache.length + len(tokens).

    Parity: the reference's tool-response re-injection decodes the tool
    output through the existing llama.cpp context
    (src/ai_models/tk_runner_helpers.c:78-126) — sequentially; this is
    the parallel version.
    """
    offset = cache.length
    b = tokens.shape[0]
    freqs = _freqs(params, cfg, offset + n_valid)
    positions = offset + jnp.arange(b)
    if embeds is not None:
        x = embeds.astype(params["tok_emb"].dtype)  # (B, D)
    else:
        x = params["tok_emb"][tokens.astype(jnp.int32)]  # (B, D)
    qd = cfg.n_heads * cfg.head_dim
    kvd = cfg.n_kv_heads * cfg.head_dim
    window = _layer_window(cfg)
    s_max = cache.k.shape[1]
    # _attn_scale, not a local 1/sqrt: the inline formula used to drop
    # rope_attention_factor**2, silently diverging the chunked-prefill
    # path from decode_step on longrope/YaRN-mscale configs (Phi-3
    # 128k, gpt-oss) — caught during the gpt-oss integration.
    scale = _attn_scale(cfg)

    def layer_fn(x, inputs):
        layer, k_cache_l, v_cache_l, li = inputs  # (S_max, Hk, D)
        h = _attn_in(x, layer, cfg)
        qkv = _linear(h, layer["wqkv"])
        if cfg.qkv_bias:
            qkv = qkv + layer["wqkv_bias"]
        q = qkv[:, :qd].reshape(b, cfg.n_heads, cfg.head_dim)
        k = qkv[:, qd:qd + kvd].reshape(b, cfg.n_kv_heads, cfg.head_dim)
        v = qkv[:, qd + kvd:].reshape(b, cfg.n_kv_heads, cfg.head_dim)
        q, k = _qk_norm(q, k, layer, cfg)
        freqs_li = _layer_freqs(cfg, li, freqs)
        q = apply_rope(q, positions, freqs_li)
        k = apply_rope(k, positions, freqs_li)
        q, k = _post_rope_qk(q, k, positions, li, cfg)

        k_cache_l = jax.lax.dynamic_update_slice(
            k_cache_l, k.astype(k_cache_l.dtype), (offset, 0, 0))
        v_cache_l = jax.lax.dynamic_update_slice(
            v_cache_l, v.astype(v_cache_l.dtype), (offset, 0, 0))

        # Each chunk query attends to the prefix + itself (causal),
        # over the attn_len-bounded cache view. Cache operands stay in
        # their storage dtype with f32 MXU accumulation — materializing
        # repeated f32 copies of the (A, Hk, D) views cost ~16 MB of
        # HBM traffic per layer at A=1024 and made a 759-token extend
        # measurably slower than a full Pallas prefill
        # (decode_attention pattern, ops/attention.py).
        k_view = k_cache_l[:attn_len] if attn_len else k_cache_l
        v_view = v_cache_l[:attn_len] if attn_len else v_cache_l
        rep = cfg.n_heads // cfg.n_kv_heads
        qg = q.reshape(b, cfg.n_kv_heads, rep,
                       cfg.head_dim).astype(k_view.dtype)
        scores = jnp.einsum(
            "qgrd,sgd->grqs", qg, k_view,
            preferred_element_type=jnp.float32) * scale
        if cfg.attn_softcap > 0.0:
            scores = cfg.attn_softcap * jnp.tanh(
                scores / cfg.attn_softcap)
        key_idx = jnp.arange(attn_len or s_max)[None, None, None, :]
        q_pos = positions[None, None, :, None]
        mask = key_idx <= q_pos
        if cfg.attn_chunk:
            # Chunk start as DATA: rope layers bound keys to the query
            # position's aligned chunk; NoPE layers see everything.
            start = (q_pos // cfg.attn_chunk) * cfg.attn_chunk
            if cfg.nope_pattern > 1:
                start = jnp.where(_is_nope(cfg, li), 0, start)
            mask &= key_idx >= start
        if window:
            if _per_layer_windows(cfg):
                # Per-layer window as DATA (traced li), not program
                # structure: global layers get an unbounded window.
                win_l = jnp.where(_is_sliding(cfg, li), window, s_max + b)
            else:
                win_l = window
            mask &= key_idx > q_pos - win_l
        scores = jnp.where(mask, scores, -1e30)
        if cfg.attn_sinks:
            col = jnp.broadcast_to(
                layer["attn_sink"].astype(jnp.float32).reshape(
                    cfg.n_kv_heads, rep, 1, 1),
                (*scores.shape[:3], 1))
            probs = jax.nn.softmax(
                jnp.concatenate([scores, col], axis=-1), axis=-1)[..., :-1]
        else:
            probs = jax.nn.softmax(scores, axis=-1)
        attn = jnp.einsum(
            "grqs,sgd->qgrd", probs.astype(v_view.dtype), v_view,
            preferred_element_type=jnp.float32).reshape(b, -1)
        x = _layer_tail(x, h, attn, layer, cfg, li=li)
        return x, (k_cache_l, v_cache_l)

    x, (new_k, new_v) = jax.lax.scan(
        layer_fn, x, (params["layers"], cache.k, cache.v,
                      jnp.arange(cfg.n_layers)))
    final = KVCache(new_k, new_v, (offset + n_valid).astype(jnp.int32))
    if all_logits:
        # (B, V) logits at every chunk position — the speculative
        # verify pass needs argmax at each proposal offset.
        return _output_logits(params, cfg, x), final
    x_last = x[jnp.maximum(n_valid - 1, 0)]
    logits = _output_logits(params, cfg, x_last[None])[0]
    return logits, final


# ---------------------------------------------------------------------------
# Convenience: full greedy generation inside one jit (benchmark path)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit,
                   static_argnames=("cfg", "n_tokens", "attn_len"))
def generate_greedy(params: Dict[str, Any], cfg: LLMConfig,
                    first_token: jnp.ndarray, cache: KVCache,
                    n_tokens: int, attn_len: Optional[int] = None,
                    ) -> Tuple[jnp.ndarray, KVCache]:
    """Greedy-decode ``n_tokens`` tokens entirely on device (no host
    round-trips) — used by the benchmark and by non-interactive batch
    generation. Interactive/grammar-constrained paths use
    :func:`decode_step` from the host runner instead.

    ``attn_len`` (static) bounds cache reads like in decode_step; it
    must cover cache.length + n_tokens."""

    def body(carry, _):
        token, cache = carry
        logits, cache = decode_step(params, cfg, token, cache,
                                    attn_len=attn_len)
        nxt = jnp.argmax(logits).astype(jnp.int32)
        return (nxt, cache), nxt

    (_, cache), tokens = jax.lax.scan(
        body, (first_token.astype(jnp.int32), cache), None, length=n_tokens)
    return tokens, cache


@functools.partial(jax.jit,
                   static_argnames=("cfg", "n_tokens", "attn_len",
                                    "eos_id"))
def decode_chunk_greedy(params: Dict[str, Any], cfg: LLMConfig,
                        logits: jnp.ndarray, cache: KVCache,
                        n_tokens: int, attn_len: Optional[int] = None,
                        eos_id: Optional[int] = None,
                        suppress_until: Optional[jnp.ndarray] = None,
                        ) -> Tuple[jnp.ndarray, jnp.ndarray, KVCache]:
    """``n_tokens`` greedy tokens starting from a logits vector, as ONE
    device program — the interactive runner's k-token lookahead chunk.

    Unlike :func:`generate_greedy` (which takes the first *token*), this
    takes the *logits* the host loop holds between steps, so
    ``tokens[0] == argmax(logits)`` and the emitted chain is exactly the
    serial decode_step path's. Returns ``(tokens (n_tokens,), logits
    after the last token, cache advanced by n_tokens)``; the host
    fetches the token array once per chunk instead of once per token
    (the non-pipelining relay fetch is the measured 35-vs-94 tok/s gap,
    PERF_NOTES.md). Terminal events (EOS/stop/budget) inside the chunk
    are reconciled by the caller rolling ``cache.length`` back — rows
    past ``length`` are stale-masked (llm/runner.py contract).

    ``attn_len`` must cover cache.length + n_tokens.

    ``min_tokens`` support (GenerationConfig.min_tokens): when
    ``eos_id`` is given, the first ``suppress_until`` steps of the
    chunk mask the EOS logit to -inf before the argmax — the device
    picks the runner-up token and the chain conditions on it, exactly
    the HF ``min_new_tokens`` semantics. ``suppress_until`` is a traced
    scalar, so one compiled program serves every boundary position."""

    def body(carry, step):
        lg, cache = carry
        if eos_id is not None:
            ban = (step < suppress_until) & (
                jnp.arange(lg.shape[-1]) == eos_id)
            lg = jnp.where(ban, jnp.float32(-1e30), lg)
        tok = jnp.argmax(lg).astype(jnp.int32)
        lg2, cache = decode_step(params, cfg, tok, cache,
                                 attn_len=attn_len)
        return (lg2, cache), tok

    (lg, cache), tokens = jax.lax.scan(
        body, (logits, cache), jnp.arange(n_tokens))
    return tokens, lg, cache
