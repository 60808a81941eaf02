"""Checkpoint conversion: GGUF (llama.cpp) -> trackiellm_tpu LLM params.

Parity target: the migration path for reference users — the reference
consumes Mistral-7B GGUF via llama.cpp (src/ai_models/tk_model_loader.c:
199); here the same file converts *offline* into the framework's native
parameter pytree (fused QKV / gate+up, stacked layers, optional Q4/Q8
group requantization), after which inference is pure JAX.

llama.cpp tensor naming (converted by this module):
  token_embd.weight                 -> tok_emb
  blk.{i}.attn_norm.weight          -> layers.attn_norm[i]
  blk.{i}.attn_{q,k,v}.weight       -> layers.wqkv[i] (fused, transposed)
  blk.{i}.attn_output.weight        -> layers.wo[i]
  blk.{i}.ffn_norm.weight           -> layers.mlp_norm[i]
  blk.{i}.ffn_{gate,up}.weight      -> layers.w_gu[i] (fused)
  blk.{i}.ffn_down.weight           -> layers.w_down[i]
  output_norm.weight                -> out_norm
  output.weight                     -> lm_head (falls back to tok_emb.T
                                      for tied-embedding models)

GGUF stores weights as (out, in); this framework computes x @ W with
W (in, out), so every matrix is transposed during conversion.
"""

from __future__ import annotations

import os

from typing import Any, Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from trackiellm_tpu.models import llm as llm_model
from trackiellm_tpu.models.loader import (
    GGUFFile,
    load_gguf_tensor,
    read_gguf_header,
)
from trackiellm_tpu.ops.quant import quantize_q4, quantize_q8
from trackiellm_tpu.utils.errors import ErrorCode, TrackieError
from trackiellm_tpu.utils.logging import get_logger

log = get_logger("models.convert")


def _math_key(md: Dict[str, Any], name: str, default,
              heuristic: str = ""):
    """Read a GGUF metadata key whose value CHANGES MATH (gating
    function, QK-norm presence, weight-norm flags) with first-contact
    discipline (advisor r4): absent keys default by heuristic with a
    loud warning, and ``TRACKIE_GGUF_STRICT=1`` turns the guess into a
    hard failure so the first-contact harness surfaces every guessed
    key instead of silently picking wrong math."""
    if name in md:
        return md[name]
    why = f" ({heuristic})" if heuristic else ""
    if os.environ.get("TRACKIE_GGUF_STRICT", "0") == "1":
        raise TrackieError(
            ErrorCode.MODEL_METADATA_INVALID,
            f"GGUF lacks math-bearing key {name}; refusing to default "
            f"to {default!r}{why} under TRACKIE_GGUF_STRICT=1")
    log.warning("GGUF lacks math-bearing key %s; defaulting to %r%s — "
                "verify against the publisher (TRACKIE_GGUF_STRICT=1 "
                "to fail instead)", name, default, why)
    return default


def apply_name_map(state: Dict[str, Any], mapping: Dict[str, str],
                   strict: bool = False) -> Dict[str, Any]:
    """Rename a published checkpoint's tensors onto the layout a
    ``*_from_torch`` converter expects.

    ``mapping``: {published_name: converter_name}. Names absent from
    the mapping pass through unchanged (strict=True raises instead).
    JSON name maps for known published graphs live in
    ``trackiellm_tpu/models/name_maps/`` — see docs/REAL_WEIGHTS.md for
    the verification workflow (the maps there are derived from the
    published model repos' graph structures and marked verified or
    unverified per file).
    """
    out: Dict[str, Any] = {}
    unmapped = []
    for k, v in state.items():
        if k in mapping:
            out[mapping[k]] = v
        else:
            unmapped.append(k)
            out[k] = v
    if strict and unmapped:
        raise TrackieError(
            ErrorCode.MODEL_METADATA_INVALID,
            f"{len(unmapped)} tensors not covered by the name map: "
            f"{unmapped[:8]}...")
    return out


def load_name_map(name_or_path: str) -> Dict[str, str]:
    """Load a name map by file path or by bundled name (e.g.
    'silero_v5', 'piper_vits')."""
    import json
    import os

    path = name_or_path
    if not os.path.exists(path):
        bundled = os.path.join(os.path.dirname(__file__), "name_maps",
                               f"{name_or_path}.json")
        if os.path.exists(bundled):
            path = bundled
        else:
            raise TrackieError(ErrorCode.FILE_NOT_FOUND,
                               f"name map {name_or_path!r} (not a file, "
                               f"and no bundled map of that name)")
    data = json.loads(open(path).read())
    return {k: v for k, v in data.items() if not k.startswith("_")}


def config_from_gguf(gguf: GGUFFile) -> llm_model.LLMConfig:
    """Derive an LLMConfig from GGUF metadata (llama.cpp key names)."""
    md = gguf.metadata
    arch = gguf.architecture or "llama"

    def key(suffix: str, default=None):
        v = md.get(f"{arch}.{suffix}", default)
        if v is None:
            raise TrackieError(ErrorCode.MODEL_METADATA_INVALID,
                               f"missing GGUF key {arch}.{suffix}")
        return v

    n_heads = int(key("attention.head_count"))
    dim = int(key("embedding_length"))
    # head_dim is decoupled from dim//n_heads in some families (the
    # llama.cpp key is {arch}.attention.key_length); Qwen2-style QKV
    # projection biases are detected from tensor presence, exactly how
    # llama.cpp decides (optional-tensor lookup, not metadata).
    head_dim = int(md.get(f"{arch}.attention.key_length",
                          dim // n_heads))
    qkv_bias = "blk.0.attn_q.bias" in gguf.tensors
    # Qwen3 per-head QK RMSNorm: detected from tensor presence like the
    # biases (llama.cpp's build_qwen3 loads attn_{q,k}_norm the same way).
    qk_norm = "blk.0.attn_q_norm.weight" in gguf.tensors
    # Gemma-2: GeGLU, sandwich norms, softcaps, alternating local
    # windows. GGUF stores the softcaps as metadata; the (1+w) norm
    # convention is already folded by the official conversion script
    # (convert_hf_to_gguf adds 1 to every *norm.weight), and the
    # sqrt(dim) embedding scale is folded below in gguf_to_llm_params.
    gemma2 = arch == "gemma2"
    extra = {}
    if arch == "olmo2":
        # OLMo-2 (llama.cpp LLM_ARCH_OLMO2): post-norm-only placement
        # (no attn_norm/ffn_norm tensors; post_attention_norm /
        # post_ffw_norm instead) and Q/K RMSNorm over the WHOLE
        # projection — the attn_{q,k}_norm tensors exist but are
        # (H*Dh,), so the per-head qk_norm detection above must yield
        # to qk_norm_full.
        qk_norm = False
        extra = dict(pre_norms=False, post_norms=True, qk_norm_full=True)
    if arch in ("granite", "granitemoe"):
        # Granite (llama.cpp LLM_ARCH_GRANITE): Llama-shaped + scalar
        # multipliers in metadata. attention.scale IS the score scale
        # -> query_pre_attn_scalar = scale**-2; residual_scale is the
        # runtime knob; embedding/logit scales fold in
        # gguf_to_llm_params.
        extra = dict(residual_multiplier=float(
            md.get(f"{arch}.residual_scale", 1.0)))
        attn_scale = float(md.get(f"{arch}.attention.scale", 0.0) or 0.0)
        if attn_scale:
            extra["query_pre_attn_scalar"] = float(attn_scale ** -2)
    if arch == "nemotron":
        # Nemotron (llama.cpp LLM_ARCH_NEMOTRON): LayerNorm1p (the 1+w
        # fold is baked by convert_hf_to_gguf, biases ship as tensors),
        # ungated squared-ReLU MLP, partial split-half rope.
        rot = int(md.get(f"{arch}.rope.dimension_count", head_dim // 2))
        extra = dict(norm_type="layernorm", mlp_gated=False,
                     act="relu2",
                     partial_rotary_factor=rot / head_dim)
    if arch == "starcoder2":
        # StarCoder2 (llama.cpp LLM_ARCH_STARCODER2): LayerNorm with
        # biases everywhere — attention projections (qkv_bias detected
        # from tensors above), o_proj, and the ungated GELU MLP.
        extra = dict(norm_type="layernorm", mlp_gated=False,
                     act="gelu", mlp_bias=True,
                     out_bias="blk.0.attn_output.bias" in gguf.tensors)
    if arch in ("command-r", "cohere2"):
        # Cohere (llama.cpp LLM_ARCH_COMMAND_R / COHERE2): bias-free
        # LayerNorm + parallel residual + interleaved rope (type NORM,
        # folded below) + logit_scale MULTIPLIER (folded into lm_head).
        # Cohere2's sliding_window_pattern: every pattern-th layer is
        # global AND NoPE (rope only on sliding layers).
        extra = dict(norm_type="layernorm", parallel_residual=True)
        pattern = int(md.get(f"{arch}.attention.sliding_window_pattern",
                             0) or 0)
        if pattern > 1:
            extra.update(window_pattern=pattern, nope_pattern=pattern)
    if arch == "glm4":
        # GLM-4 (llama.cpp LLM_ARCH_GLM4): sandwich norms (Gemma-2
        # tensor names) + half-width INTERLEAVED rope (llama.cpp rope
        # type NORM; rope.dimension_count carries the rotary width).
        # The interleave itself is folded by gguf_to_llm_params via a
        # q/k column permutation.
        rot = int(md.get(f"{arch}.rope.dimension_count", head_dim // 2))
        extra = dict(
            post_norms="blk.0.post_attention_norm.weight" in gguf.tensors,
            partial_rotary_factor=rot / head_dim)
    if arch == "gpt-oss":
        # gpt-oss (llama.cpp LLM_ARCH_GPT_OSS; arch string per the
        # llama.cpp convention of hyphenated HF names): attention
        # sinks + biases everywhere (detected from tensors), clamped
        # SwiGLU ("gptoss" act), softmax-AFTER-top-k router with bias,
        # alternating sliding/full layers. KEY-STRING CAVEAT: staged
        # against llama.cpp conventions but unvalidated offline — a
        # real file has not been seen in a zero-egress round
        # (docs/MODELS.md); geometry cross-checks fail loudly on
        # mismatch.
        extra = dict(alt_window=True, moe_score_func="softmax_topk",
                     act="gptoss",
                     moe_bias="blk.0.ffn_gate_inp.bias" in gguf.tensors,
                     attn_sinks="blk.0.attn_sinks.weight" in gguf.tensors
                     or "blk.0.attn_sinks" in gguf.tensors,
                     out_bias="blk.0.attn_output.bias" in gguf.tensors)
    if arch == "smollm3":
        # SmolLM3 (llama.cpp LLM_ARCH_SMOLLM3): Llama-shaped with NoPE
        # every interval-th layer; llama.cpp hardcodes the published
        # interval of 4 when the key is absent.
        extra = dict(nope_pattern=int(md.get(
            f"{arch}.no_rope_layer_interval", 4)))
    if arch == "gemma3":
        # Gemma-3 (llama.cpp LLM_ARCH_GEMMA3): GeGLU + sandwich norms
        # like Gemma-2, no softcaps (per-head QK norms instead —
        # detected from tensor presence above), a FIXED 5:1
        # sliding/global pattern, and a dual rope: sliding layers at
        # the local base (llama.cpp hardcodes 10k when the key is
        # absent), global layers at rope.freq_base with the generic
        # linear/yarn scaling below. Published query scalars: 256
        # (1B/4B/12B, = head_dim), dim/n_heads = 168 for 27B.
        qpas_default = float(head_dim if dim < 5376 else dim // n_heads)
        extra = dict(
            act="gelu",
            post_norms="blk.0.post_attention_norm.weight" in gguf.tensors,
            query_pre_attn_scalar=float(md.get(
                f"{arch}.attention.query_pre_attention_scalar",
                qpas_default)),
            window_pattern=6,
            rope_local_theta=float(md.get(
                f"{arch}.rope.local_freq_base", 10000.0)),
        )
    if gemma2:
        # query_pre_attn_scalar is not a GGUF key (llama.cpp derives
        # the scale from the model type): published sizes use
        # head_dim (2B/9B: 256) except 27B, which uses
        # dim/n_heads (4608/32 = 144).
        qpas_default = float(head_dim if dim < 4608 else dim // n_heads)
        extra = dict(
            act="gelu",
            post_norms="blk.0.post_attention_norm.weight" in gguf.tensors,
            attn_softcap=float(md.get(f"{arch}.attn_logit_softcapping",
                                      50.0)),
            logit_softcap=float(md.get(f"{arch}.final_logit_softcapping",
                                       30.0)),
            query_pre_attn_scalar=float(md.get(
                f"{arch}.attention.query_pre_attention_scalar",
                qpas_default)),
            alt_window=True,
        )
    # Phi-3 longrope: original context + attention factor (llama.cpp
    # stores the factor sets as rope_factors_{short,long}.weight
    # tensors, loaded by gguf_to_llm_params).
    orig_ctx = int(md.get(f"{arch}.rope.scaling.original_context_length",
                          0))
    if orig_ctx and "rope_factors_long.weight" in gguf.tensors:
        import math as _math

        max_ctx = int(key("context_length", 4096))
        att = float(md.get(
            f"{arch}.rope.scaling.attn_factor",
            _math.sqrt(1.0 + _math.log(max_ctx / orig_ctx)
                       / _math.log(orig_ctx))))
        extra.update(rope_original_max_seq=orig_ctx,
                     rope_attention_factor=att)
    # YaRN context extension (rope.scaling.type=yarn — Qwen/DeepSeek
    # long-context GGUFs): llama.cpp derives freq_scale = 1/factor and
    # an attention mscale from the same keys; here the per-frequency
    # divisors are computed into params["rope_factors"] by
    # gguf_to_llm_params and the mscale rides cfg.rope_attention_factor
    # (attn_factor metadata multiplies it, llama.cpp's convention).
    stype = str(md.get(f"{arch}.rope.scaling.type", "") or "")
    sfactor = float(md.get(f"{arch}.rope.scaling.factor", 0.0) or 0.0)
    if stype == "yarn" and sfactor > 1.0:
        attf = float(md.get(f"{arch}.rope.scaling.attn_factor", 1.0))
        extra.update(
            rope_original_max_seq=orig_ctx,
            rope_attention_factor=attf
            * llm_model.yarn_attention_factor(sfactor))
    return llm_model.LLMConfig(
        vocab_size=int(md.get("tokenizer.ggml.tokens_count",
                              md.get(f"{arch}.vocab_size",
                                     gguf.tensors["token_embd.weight"]
                                     .shape[0]))),
        dim=dim,
        n_layers=int(key("block_count")),
        n_heads=n_heads,
        n_kv_heads=int(key("attention.head_count_kv", n_heads)),
        head_dim=head_dim,
        hidden_dim=int(md.get(f"{arch}.expert_feed_forward_length",
                           key("feed_forward_length"))),
        norm_eps=float(md.get(
            f"{arch}.attention.layer_norm_rms_epsilon",
            md.get(f"{arch}.attention.layer_norm_epsilon", 1e-5))),
        rope_theta=float(key("rope.freq_base", 10000.0)),
        max_seq=int(key("context_length", 4096)),
        sliding_window=int(md.get(f"{arch}.attention.sliding_window",
                                  key("context_length", 4096))),
        qkv_bias=qkv_bias,
        qk_norm=qk_norm,
        n_experts=int(md.get(f"{arch}.expert_count", 0)),
        n_experts_used=int(md.get(f"{arch}.expert_used_count", 2)),
        # Qwen2-MoE (llama.cpp arch "qwen2moe"): the shared expert has
        # its own size key, and top-k weights are NOT renormalized
        # (llama.cpp's build_qwen2moe matches).
        moe_shared_hidden=int(md.get(
            f"{arch}.expert_shared_feed_forward_length", 0)),
        # No top-k renormalization: Qwen2-MoE (raw softmax slices) and
        # gpt-oss (softmax over the kept top-k only — combined with
        # moe_score_func="softmax_topk" above).
        moe_norm_topk=arch not in ("qwen2moe", "gpt-oss"),
        **extra,
    )


def tokenizer_from_pieces(pieces, pad_id: int = 0, scores=None,
                          token_types=None, add_space_prefix: bool = True):
    """Build a VocabTokenizer from raw SentencePiece pieces, preserving
    llama positional ids (0 unk, 1 bos, 2 eos). With ``scores`` (GGUF
    ``tokenizer.ggml.scores``) encoding runs llama.cpp's exact
    score-merge BPE; without them it degrades to greedy longest-match."""
    from trackiellm_tpu.llm.tokenizer import VocabTokenizer

    tok = VocabTokenizer.__new__(VocabTokenizer)
    tok.unk_id, tok.bos_id, tok.eos_id = 0, 1, 2
    tok.pad_id = pad_id
    tok._init_tables([str(t) for t in pieces],
                     list(scores) if scores is not None else None,
                     list(token_types) if token_types is not None else None,
                     add_space_prefix, n_specials=3)
    return tok


def tokenizer_spec_from_gguf(gguf: GGUFFile):
    """JSON-serializable tokenizer description from GGUF metadata —
    persisted into native checkpoints so a converted model rebuilds the
    SAME tokenizer with zero extra files. None when no vocab."""
    md = gguf.metadata
    tokens = md.get("tokenizer.ggml.tokens")
    if not tokens:
        return None
    if md.get("tokenizer.ggml.model") == "gpt2":
        return {"model": "gpt2",
                "tokens": list(tokens),
                "merges": list(md.get("tokenizer.ggml.merges", [])),
                "pre": str(md.get("tokenizer.ggml.pre", "llama-bpe")),
                "token_types": md.get("tokenizer.ggml.token_type"),
                "bos_id": int(md.get("tokenizer.ggml.bos_token_id", 0)),
                "eos_id": int(md.get("tokenizer.ggml.eos_token_id", 0)),
                "pad_id": int(md.get("tokenizer.ggml.padding_token_id",
                                     0))}
    return {"model": "spm",
            "tokens": list(tokens),
            "scores": md.get("tokenizer.ggml.scores"),
            "token_types": md.get("tokenizer.ggml.token_type"),
            "pad_id": int(md.get("tokenizer.ggml.padding_token_id", 0)),
            "add_space_prefix": bool(md.get(
                "tokenizer.ggml.add_space_prefix", True))}


def tokenizer_from_spec(spec):
    """Rebuild a tokenizer from :func:`tokenizer_spec_from_gguf`."""
    if spec.get("model") == "gpt2":
        from trackiellm_tpu.llm.tokenizer import BpeTokenizer

        return BpeTokenizer(
            spec["tokens"], merges=spec.get("merges", []),
            pre=spec.get("pre", "llama-bpe"),
            token_types=spec.get("token_types"),
            bos_id=spec.get("bos_id", 0), eos_id=spec.get("eos_id", 0),
            pad_id=spec.get("pad_id", 0))
    return tokenizer_from_pieces(
        spec["tokens"], pad_id=spec.get("pad_id", 0),
        scores=spec.get("scores"),
        token_types=spec.get("token_types"),
        add_space_prefix=spec.get("add_space_prefix", True))


def tokenizer_from_gguf(gguf: GGUFFile):
    """Build a tokenizer from the GGUF's embedded vocabulary. Handles
    both llama.cpp tokenizer families: SentencePiece score-merge BPE
    ("llama"/spm) and byte-level BPE ("gpt2" — Llama-3/Qwen2). Returns
    None when the file carries no vocab.

    llama.cpp reads the same tables (the reference inherits them); here
    they feed VocabTokenizer / BpeTokenizer so a converted checkpoint
    generates real text with zero extra files.
    """
    spec = tokenizer_spec_from_gguf(gguf)
    return None if spec is None else tokenizer_from_spec(spec)


def gguf_to_llm_params(
    path: str,
    bits: Optional[int] = 4,
    group: int = 256,
    dtype=jnp.bfloat16,
    max_layers: Optional[int] = None,
) -> tuple:
    """Convert a GGUF checkpoint. Returns (params, cfg).

    ``bits``: 4/8 requantizes the big matrices into the Pallas kernel
    layout; None keeps them in ``dtype``. ``max_layers`` truncates (for
    tests / draft models).
    """
    gguf = read_gguf_header(path)
    cfg = config_from_gguf(gguf)
    if max_layers is not None:
        cfg = cfg._replace(n_layers=min(cfg.n_layers, max_layers))
    quantize = (quantize_q4 if bits == 4
                else quantize_q8 if bits == 8 else None)

    def mat(name: str) -> np.ndarray:
        # GGUF (out, in) -> (in, out)
        return np.ascontiguousarray(load_gguf_tensor(gguf, name).T)

    def vec(name: str) -> jnp.ndarray:
        return jnp.asarray(load_gguf_tensor(gguf, name), dtype)

    def maybe_quant(w: np.ndarray):
        if quantize is None:
            return jnp.asarray(w, dtype)
        return quantize(jnp.asarray(w, jnp.float32), group)

    def maybe_quant_experts(w: np.ndarray):
        """(E, K, N) expert bank -> per-expert quantized stack."""
        if quantize is None:
            return jnp.asarray(w, dtype)
        from trackiellm_tpu.ops.quant import QuantizedLinear

        qs = [quantize(jnp.asarray(w[e], jnp.float32), group)
              for e in range(w.shape[0])]
        return QuantizedLinear(
            values=jnp.stack([q.values for q in qs]),
            scales=jnp.stack([q.scales for q in qs]))

    def stack(items):
        if quantize is None:
            return jnp.stack(items)
        from trackiellm_tpu.ops.quant import QuantizedLinear

        return QuantizedLinear(
            values=jnp.stack([q.values for q in items]),
            scales=jnp.stack([q.scales for q in items]))

    # Interleaved-rope (llama.cpp rope type NORM) arches: fold the q/k
    # column order to this framework's split-half layout (exact; see
    # _deinterleave_rope_cols). GLM-4 rotates half the head; Cohere
    # all of it; and the LLAMA-family arches (llama/mistral/mixtral,
    # granite, smollm3 — everything convert_hf_to_gguf exports through
    # LlamaModel with undo_permute) ship q/k PERMUTED into ggml's
    # NORM pair layout, which this fold inverts — a real-file
    # correctness requirement the old unpermuted synthetic fixtures
    # could not catch (round-4 finding; the synthetic writers now
    # produce the permuted layout and the oracle logits pin the fold).
    # TRACKIE_LLAMA_GGUF_ROPE=hf disables the llama-family fold for
    # GGUFs written directly from HF layout without the permute.
    import os as _os

    arch_ = gguf.architecture or ""
    glm_rot = 0
    if arch_ == "glm4":
        glm_rot = int(cfg.head_dim * cfg.partial_rotary_factor)
    elif arch_ in ("command-r", "cohere2"):
        glm_rot = cfg.head_dim
    elif arch_ in ("llama", "granite", "granitemoe", "smollm3"):
        _rope_env = _os.environ.get("TRACKIE_LLAMA_GGUF_ROPE", "norm")
        if _rope_env != "hf":
            glm_rot = cfg.head_dim
        # Always say which layout was assumed so a wrong guess on a
        # non-llama.cpp writer is diagnosable from the log alone
        # (advisor r4): scrambled q/k columns otherwise convert
        # silently. Module logger — it has the framework handler
        # (a bare logging.getLogger name outside the 'trackiellm'
        # hierarchy was dead code, review round-5 finding).
        log.info(
            "gguf arch=%s: assuming %s q/k rope layout "
            "(TRACKIE_LLAMA_GGUF_ROPE=%s; set =hf for GGUFs written "
            "directly from HF layout without llama.cpp's permute)",
            arch_, "permuted-NORM" if glm_rot else "HF split-half",
            _rope_env)

    wqkv, wo, w_gu, w_down = [], [], [], []
    attn_norm, mlp_norm = [], []
    attn_post_norm, mlp_post_norm = [], []
    q_norm, k_norm = [], []
    qkv_bias = []
    # LayerNorm arches (nemotron/starcoder2) ship norm BIASES as
    # tensors; norm params then become {"g","b"} dicts.
    norm_bias = (cfg.norm_type == "layernorm"
                 and "blk.0.attn_norm.bias" in gguf.tensors)
    attn_norm_b, mlp_norm_b = [], []
    w_gu_b, w_down_b, wo_b = [], [], []
    moe_gate = []
    shared_gu, shared_down, shared_gate = [], [], []
    attn_sink, moe_gate_b = [], []
    for i in range(cfg.n_layers):
        p = f"blk.{i}"
        if cfg.pre_norms:
            attn_norm.append(vec(f"{p}.attn_norm.weight"))
            if cfg.parallel_residual:
                # Cohere: ONE shared norm per layer; the sequential
                # helpers never read mlp_norm but the key must exist.
                mlp_norm.append(jnp.ones((cfg.dim,), jnp.float32))
            else:
                mlp_norm.append(vec(f"{p}.ffn_norm.weight"))
            if norm_bias:
                attn_norm_b.append(vec(f"{p}.attn_norm.bias"))
                mlp_norm_b.append(vec(f"{p}.ffn_norm.bias"))
        if cfg.post_norms:
            # Gemma-2 sandwich norms (llama.cpp tensor names); the
            # (1+w) fold is already baked by convert_hf_to_gguf.
            attn_post_norm.append(vec(f"{p}.post_attention_norm.weight"))
            mlp_post_norm.append(vec(f"{p}.post_ffw_norm.weight"))
        if cfg.qk_norm or cfg.qk_norm_full:
            # Qwen3 per-head / OLMo-2 whole-projection QK norms (the
            # same llama.cpp attn_{q,k}_norm names; the shape differs).
            qn = np.asarray(vec(f"{p}.attn_q_norm.weight"))
            kn = np.asarray(vec(f"{p}.attn_k_norm.weight"))
            if glm_rot and qn.size == cfg.n_heads * cfg.head_dim:
                # Cohere per-head norms ride the interleave fold.
                qn = _deinterleave_rope_cols(qn, cfg.n_heads,
                                             cfg.head_dim, glm_rot)
                kn = _deinterleave_rope_cols(kn, cfg.n_kv_heads,
                                             cfg.head_dim, glm_rot)
            q_norm.append(jnp.asarray(qn))
            k_norm.append(jnp.asarray(kn))
        if f"{p}.attn_qkv.weight" in gguf.tensors:
            # Phi-3-style pre-fused QKV ([q; k; v] rows in GGUF ->
            # [q | k | v] columns transposed — exactly this framework's
            # wqkv layout).
            qkv = mat(f"{p}.attn_qkv.weight")
        else:
            q_w, k_w = mat(f"{p}.attn_q.weight"), mat(f"{p}.attn_k.weight")
            if glm_rot:
                # GLM-4: interleaved-rope -> split-half column fold.
                q_w = _deinterleave_rope_cols(np.asarray(q_w), cfg.n_heads,
                                              cfg.head_dim, glm_rot)
                k_w = _deinterleave_rope_cols(np.asarray(k_w),
                                              cfg.n_kv_heads,
                                              cfg.head_dim, glm_rot)
            qkv = np.concatenate([q_w, k_w,
                                  mat(f"{p}.attn_v.weight")], axis=1)
        if cfg.qkv_bias:
            # Qwen2-style projection biases, fused to match wqkv's
            # [q | k | v] column layout; biases stay high-precision
            # (llama.cpp never quantizes 1-D tensors either).
            q_b = np.asarray(vec(f"{p}.attn_q.bias"))
            k_b = np.asarray(vec(f"{p}.attn_k.bias"))
            if glm_rot:
                q_b = _deinterleave_rope_cols(q_b, cfg.n_heads,
                                              cfg.head_dim, glm_rot)
                k_b = _deinterleave_rope_cols(k_b, cfg.n_kv_heads,
                                              cfg.head_dim, glm_rot)
            qkv_bias.append(jnp.concatenate([
                jnp.asarray(q_b), jnp.asarray(k_b),
                vec(f"{p}.attn_v.bias")]))
        wqkv.append(maybe_quant(qkv))
        wo.append(maybe_quant(mat(f"{p}.attn_output.weight")))
        if cfg.out_bias:
            wo_b.append(vec(f"{p}.attn_output.bias"))
        if cfg.attn_sinks:
            # gpt-oss per-head sink logits (llama.cpp attn_sinks;
            # some writers suffix .weight). Kept f32 like the HF route.
            sink = (f"{p}.attn_sinks.weight"
                    if f"{p}.attn_sinks.weight" in gguf.tensors
                    else f"{p}.attn_sinks")
            attn_sink.append(jnp.asarray(
                load_gguf_tensor(gguf, sink), jnp.float32))
        if cfg.n_experts:
            # Mixtral expert banks (llama.cpp 3D tensors, expert-major):
            # ffn_{gate,up}_exps (E, H, D) -> (E, D, 2H) fused;
            # ffn_down_exps (E, D, H) -> (E, H, D); router (E, D) -> (D, E).
            moe_gate.append(jnp.asarray(
                load_gguf_tensor(gguf, f"{p}.ffn_gate_inp.weight").T,
                dtype))
            if cfg.moe_bias:
                # gpt-oss: router bias + per-expert projection biases
                # (gate/up fuse to the [gate | up] column layout).
                moe_gate_b.append(vec(f"{p}.ffn_gate_inp.bias"))
                gb = load_gguf_tensor(gguf, f"{p}.ffn_gate_exps.bias")
                ub = load_gguf_tensor(gguf, f"{p}.ffn_up_exps.bias")
                db = load_gguf_tensor(gguf, f"{p}.ffn_down_exps.bias")
                if gb.shape != (cfg.n_experts, cfg.hidden_dim):
                    raise TrackieError(
                        ErrorCode.MODEL_METADATA_INVALID,
                        f"{p}.ffn_gate_exps.bias shape {gb.shape} != "
                        f"(E={cfg.n_experts}, H={cfg.hidden_dim})")
                w_gu_b.append(jnp.asarray(
                    np.concatenate([gb, ub], axis=1), dtype))
                w_down_b.append(jnp.asarray(db, dtype))
            g = load_gguf_tensor(gguf, f"{p}.ffn_gate_exps.weight")
            u = load_gguf_tensor(gguf, f"{p}.ffn_up_exps.weight")
            dn = load_gguf_tensor(gguf, f"{p}.ffn_down_exps.weight")
            gu = np.concatenate([g.transpose(0, 2, 1),
                                 u.transpose(0, 2, 1)], axis=2)
            w_gu.append(maybe_quant_experts(np.ascontiguousarray(gu)))
            w_down.append(maybe_quant_experts(
                np.ascontiguousarray(dn.transpose(0, 2, 1))))
            if cfg.moe_shared_hidden:
                # Qwen2-MoE shared expert (llama.cpp *_shexp tensors):
                # ffn_{gate,up}_shexp -> fused (D, 2Hs); ffn_down_shexp
                # -> (Hs, D); scalar gate ffn_gate_inp_shexp -> (D, 1).
                sgu = np.concatenate(
                    [mat(f"{p}.ffn_gate_shexp.weight"),
                     mat(f"{p}.ffn_up_shexp.weight")], axis=1)
                shared_gu.append(maybe_quant(sgu))
                shared_down.append(
                    maybe_quant(mat(f"{p}.ffn_down_shexp.weight")))
                shared_gate.append(jnp.asarray(
                    load_gguf_tensor(
                        gguf, f"{p}.ffn_gate_inp_shexp.weight").T, dtype))
        else:
            if f"{p}.ffn_gate.weight" in gguf.tensors:
                gu = np.concatenate([mat(f"{p}.ffn_gate.weight"),
                                     mat(f"{p}.ffn_up.weight")], axis=1)
            else:
                # Phi-3-style pre-fused gate_up ([gate; up] rows).
                gu = mat(f"{p}.ffn_up.weight")
            w_gu.append(maybe_quant(gu))
            w_down.append(maybe_quant(mat(f"{p}.ffn_down.weight")))
            if cfg.mlp_bias:
                w_gu_b.append(vec(f"{p}.ffn_up.bias"))
                w_down_b.append(vec(f"{p}.ffn_down.bias"))
        log.info("converted layer %d/%d", i + 1, cfg.n_layers)

    tok_emb = load_gguf_tensor(gguf, "token_embd.weight")  # (V, D)
    if "output.weight" in gguf.tensors:
        lm_head = mat("output.weight")
    else:  # tied embeddings
        lm_head = np.ascontiguousarray(tok_emb.T)
    if (gguf.architecture or "llama") in ("gemma2", "gemma3"):
        # Gemma scales embeddings by sqrt(dim) at runtime (llama.cpp
        # build_gemma2/3 do the same); fold it into tok_emb AFTER the
        # tied lm_head took the unscaled copy.
        tok_emb = tok_emb * float(np.sqrt(cfg.dim))
    if (gguf.architecture or "llama") in ("command-r", "cohere2"):
        # Cohere MULTIPLIES the logits by logit_scale (llama.cpp
        # build_command_r); fold into lm_head after the tied copy.
        ls = float(gguf.metadata.get(
            f"{gguf.architecture}.logit_scale", 1.0) or 1.0)
        if ls != 1.0:
            lm_head = lm_head * ls
    if (gguf.architecture or "llama") in ("granite", "granitemoe"):
        # Granite's foldable multipliers (llama.cpp applies them at
        # runtime: f_embedding_scale on inpL, f_logit_scale divides
        # the final logits); same unscaled-tied-copy order as Gemma.
        arch0 = gguf.architecture
        emb_scale = float(gguf.metadata.get(
            f"{arch0}.embedding_scale", 1.0) or 1.0)
        logit_scale = float(gguf.metadata.get(
            f"{arch0}.logit_scale", 1.0) or 1.0)
        if emb_scale != 1.0:
            tok_emb = tok_emb * emb_scale
        if logit_scale != 1.0:
            lm_head = lm_head / logit_scale

    layers: Dict[str, Any] = {
        "wqkv": stack(wqkv),
        "wo": stack(wo),
        "w_gu": stack(w_gu),
        "w_down": stack(w_down),
    }
    if cfg.pre_norms:
        if norm_bias:
            layers["attn_norm"] = {"g": jnp.stack(attn_norm),
                                   "b": jnp.stack(attn_norm_b)}
            layers["mlp_norm"] = {"g": jnp.stack(mlp_norm),
                                  "b": jnp.stack(mlp_norm_b)}
        else:
            layers["attn_norm"] = jnp.stack(attn_norm)
            layers["mlp_norm"] = jnp.stack(mlp_norm)
    if cfg.out_bias and wo_b:
        layers["wo_bias"] = jnp.stack(wo_b)
    if cfg.mlp_bias:
        layers["w_gu_b"] = jnp.stack(w_gu_b)
        layers["w_down_b"] = jnp.stack(w_down_b)
    if cfg.qkv_bias:
        layers["wqkv_bias"] = jnp.stack(qkv_bias)
    if cfg.post_norms:
        layers["attn_post_norm"] = jnp.stack(attn_post_norm)
        layers["mlp_post_norm"] = jnp.stack(mlp_post_norm)
    if cfg.qk_norm or cfg.qk_norm_full:
        layers["q_norm"] = jnp.stack(q_norm)
        layers["k_norm"] = jnp.stack(k_norm)
    if cfg.attn_sinks:
        layers["attn_sink"] = jnp.stack(attn_sink)
    if cfg.n_experts:
        layers["moe_gate"] = jnp.stack(moe_gate)
        if cfg.moe_bias and moe_gate_b:
            layers["moe_gate_b"] = jnp.stack(moe_gate_b)
            layers["w_gu_b"] = jnp.stack(w_gu_b)
            layers["w_down_b"] = jnp.stack(w_down_b)
        if cfg.moe_shared_hidden:
            layers["shared_gu"] = stack(shared_gu)
            layers["shared_down"] = stack(shared_down)
            layers["shared_gate"] = jnp.stack(shared_gate)
    params: Dict[str, Any] = {
        "tok_emb": jnp.asarray(tok_emb, dtype),
        "layers": layers,
        "out_norm": ({"g": vec("output_norm.weight"),
                      "b": vec("output_norm.bias")}
                     if norm_bias and "output_norm.bias" in gguf.tensors
                     else vec("output_norm.weight")),
        "lm_head": maybe_quant(lm_head),
    }
    if "rope_freqs.weight" in gguf.tensors:
        # Llama-3.1-style rope scaling: per-frequency divisors baked by
        # convert_hf_to_gguf (llama.cpp applies them identically).
        params["rope_factors"] = jnp.asarray(
            load_gguf_tensor(gguf, "rope_freqs.weight"), jnp.float32)
    if "rope_factors_long.weight" in gguf.tensors:
        # Phi-3 longrope dual factor sets (llama.cpp tensor names).
        params["rope_factors_short"] = jnp.asarray(
            load_gguf_tensor(gguf, "rope_factors_short.weight"),
            jnp.float32)
        params["rope_factors_long"] = jnp.asarray(
            load_gguf_tensor(gguf, "rope_factors_long.weight"),
            jnp.float32)
    if "rope_factors" not in params:
        # Metadata-driven scaling (no baked factor tensor): yarn ramp
        # or uniform linear interpolation — llama.cpp computes both
        # from these keys at rope time; here they become the same
        # static divisor vector the Llama-3.1 path uses.
        md = gguf.metadata
        arch = md["general.architecture"]
        stype = str(md.get(f"{arch}.rope.scaling.type", "") or "")
        sfactor = float(md.get(f"{arch}.rope.scaling.factor", 0.0) or 0.0)
        if stype == "yarn" and sfactor > 1.0:
            orig = int(md.get(
                f"{arch}.rope.scaling.original_context_length",
                cfg.max_seq))
            params["rope_factors"] = llm_model.yarn_rope_factors(
                cfg, sfactor, orig)
        elif stype == "linear" and sfactor > 1.0:
            params["rope_factors"] = jnp.full(
                (cfg.head_dim // 2,), sfactor, jnp.float32)
    return params, cfg


def phi3_from_hf(
    state: Dict[str, Any],
    *,
    max_seq: int = 4096,
    original_max_seq: int = 0,
    rope_factors_short=None,
    rope_factors_long=None,
    sliding_window: int = 2047,
    norm_eps: float = 1e-5,
    rope_theta: float = 10000.0,
    head_dim: int = 0,
    dtype=jnp.bfloat16,
) -> tuple:
    """Convert a transformers Phi-3 state dict (fused qkv_proj /
    gate_up_proj, untied lm_head) to (params, LLMConfig).

    Longrope (the 128k variants): pass the config.json's
    rope_scaling short_factor/long_factor lists plus
    original_max_position_embeddings; the attention factor
    sqrt(1 + log(max/orig)/log(orig)) is computed here and folded into
    the attention scale (exact — see LLMConfig). head_dim defaults to
    dim // n_heads (the published minis); kv head count is inferred
    from the fused qkv width.
    """
    import math as _math

    A = lambda k: np.asarray(state[k], np.float32)  # noqa: E731

    emb = A("model.embed_tokens.weight")
    vocab, dim = emb.shape
    n_layers = len({k.split(".")[2] for k in state
                    if k.startswith("model.layers.")})
    qkv0 = A("model.layers.0.self_attn.qkv_proj.weight")  # (Q+2KV, D)
    o0 = A("model.layers.0.self_attn.o_proj.weight")      # (D, Q)
    hidden = A("model.layers.0.mlp.gate_up_proj.weight").shape[0] // 2
    qd = o0.shape[1]
    # head count is not shape-derivable from fused projections alone;
    # published Phi-3 minis use 32 heads (head_dim 96 at dim 3072).
    hd = head_dim or (96 if dim == 3072 else dim // 32)
    n_heads = qd // hd
    kvd = (qkv0.shape[0] - qd) // 2
    n_kv = kvd // hd

    att = 1.0
    if original_max_seq and max_seq > original_max_seq:
        att = _math.sqrt(1.0 + _math.log(max_seq / original_max_seq)
                         / _math.log(original_max_seq))
    cfg = llm_model.LLMConfig(
        vocab_size=vocab, dim=dim, n_layers=n_layers, n_heads=n_heads,
        n_kv_heads=n_kv, head_dim=hd, hidden_dim=hidden,
        norm_eps=norm_eps, rope_theta=rope_theta, max_seq=max_seq,
        sliding_window=sliding_window,
        rope_original_max_seq=(original_max_seq
                               if rope_factors_long is not None else 0),
        rope_attention_factor=(att if rope_factors_long is not None
                               else 1.0))

    wqkv, wo, w_gu, w_down = [], [], [], []
    attn_norm, mlp_norm = [], []
    for i in range(n_layers):
        pre = f"model.layers.{i}"
        attn_norm.append(jnp.asarray(
            A(f"{pre}.input_layernorm.weight"), dtype))
        mlp_norm.append(jnp.asarray(
            A(f"{pre}.post_attention_layernorm.weight"), dtype))
        wqkv.append(jnp.asarray(
            A(f"{pre}.self_attn.qkv_proj.weight").T, dtype))
        wo.append(jnp.asarray(A(f"{pre}.self_attn.o_proj.weight").T,
                              dtype))
        w_gu.append(jnp.asarray(
            A(f"{pre}.mlp.gate_up_proj.weight").T, dtype))
        w_down.append(jnp.asarray(A(f"{pre}.mlp.down_proj.weight").T,
                                  dtype))

    params = {
        "tok_emb": jnp.asarray(emb, dtype),
        "layers": {
            "attn_norm": jnp.stack(attn_norm),
            "wqkv": jnp.stack(wqkv),
            "wo": jnp.stack(wo),
            "mlp_norm": jnp.stack(mlp_norm),
            "w_gu": jnp.stack(w_gu),
            "w_down": jnp.stack(w_down),
        },
        "out_norm": jnp.asarray(A("model.norm.weight"), dtype),
        "lm_head": jnp.asarray(
            (A("lm_head.weight").T if "lm_head.weight" in state
             else np.ascontiguousarray(emb.T)), dtype),
    }
    if rope_factors_long is not None:
        params["rope_factors_short"] = jnp.asarray(
            rope_factors_short, jnp.float32)
        params["rope_factors_long"] = jnp.asarray(
            rope_factors_long, jnp.float32)
    return params, cfg


def mixtral_from_hf(
    state: Dict[str, Any],
    *,
    max_seq: int = 8192,
    norm_eps: float = 1e-5,
    rope_theta: float = 1e6,
    head_dim: int = 0,
    n_experts_used: int = 2,
    dtype=jnp.bfloat16,
) -> tuple:
    """Convert a transformers Mixtral state dict (block_sparse_moe:
    gate + experts.N.{w1,w2,w3}) to (params, LLMConfig). w1 = gate,
    w3 = up (fused into the expert w_gu bank), w2 = down; the router
    transposes to (D, E)."""
    A = lambda k: np.asarray(state[k], np.float32)  # noqa: E731

    emb = A("model.embed_tokens.weight")
    vocab, dim = emb.shape
    n_layers = len({k.split(".")[2] for k in state
                    if k.startswith("model.layers.")})
    q0 = A("model.layers.0.self_attn.q_proj.weight")
    k0 = A("model.layers.0.self_attn.k_proj.weight")
    hidden = A("model.layers.0.block_sparse_moe.experts.0.w1.weight"
               ).shape[0]
    n_experts = len({k.split(".")[5] for k in state
                     if ".block_sparse_moe.experts." in k})
    # Head count is not shape-derivable from fused widths alone; the
    # published Mixtrals use head_dim 128 — pass head_dim otherwise.
    hd = head_dim or (128 if dim % 128 == 0 else dim // 32)
    n_heads = q0.shape[0] // hd
    n_kv = k0.shape[0] // hd

    cfg = llm_model.LLMConfig(
        vocab_size=vocab, dim=dim, n_layers=n_layers, n_heads=n_heads,
        n_kv_heads=n_kv, head_dim=hd, hidden_dim=hidden,
        norm_eps=norm_eps, rope_theta=rope_theta, max_seq=max_seq,
        sliding_window=max_seq, n_experts=n_experts,
        n_experts_used=n_experts_used)

    wqkv, wo, w_gu, w_down = [], [], [], []
    attn_norm, mlp_norm, moe_gate = [], [], []
    for i in range(n_layers):
        pre = f"model.layers.{i}"
        attn_norm.append(jnp.asarray(
            A(f"{pre}.input_layernorm.weight"), dtype))
        mlp_norm.append(jnp.asarray(
            A(f"{pre}.post_attention_layernorm.weight"), dtype))
        wqkv.append(jnp.asarray(np.concatenate([
            A(f"{pre}.self_attn.q_proj.weight").T,
            A(f"{pre}.self_attn.k_proj.weight").T,
            A(f"{pre}.self_attn.v_proj.weight").T], axis=1), dtype))
        wo.append(jnp.asarray(A(f"{pre}.self_attn.o_proj.weight").T,
                              dtype))
        moe_gate.append(jnp.asarray(
            A(f"{pre}.block_sparse_moe.gate.weight").T, dtype))
        gus, downs = [], []
        for e in range(n_experts):
            ep = f"{pre}.block_sparse_moe.experts.{e}"
            gus.append(np.concatenate([A(f"{ep}.w1.weight").T,
                                       A(f"{ep}.w3.weight").T], axis=1))
            downs.append(A(f"{ep}.w2.weight").T)
        w_gu.append(jnp.asarray(np.stack(gus), dtype))
        w_down.append(jnp.asarray(np.stack(downs), dtype))

    params = {
        "tok_emb": jnp.asarray(emb, dtype),
        "layers": {
            "attn_norm": jnp.stack(attn_norm),
            "wqkv": jnp.stack(wqkv),
            "wo": jnp.stack(wo),
            "mlp_norm": jnp.stack(mlp_norm),
            "moe_gate": jnp.stack(moe_gate),
            "w_gu": jnp.stack(w_gu),
            "w_down": jnp.stack(w_down),
        },
        "out_norm": jnp.asarray(A("model.norm.weight"), dtype),
        "lm_head": jnp.asarray(
            (A("lm_head.weight").T if "lm_head.weight" in state
             else np.ascontiguousarray(emb.T)), dtype),
    }
    return params, cfg


def gemma2_from_hf(
    state: Dict[str, Any],
    *,
    head_dim: int = 0,
    max_seq: int = 8192,
    sliding_window: int = 4096,
    attn_softcap: float = 50.0,
    logit_softcap: float = 30.0,
    query_pre_attn_scalar: float = 0.0,
    norm_eps: float = 1e-6,
    rope_theta: float = 10000.0,
    dtype=jnp.bfloat16,
) -> tuple:
    """Convert a transformers Gemma-2 state dict (``model.layers.N...``
    names) to (params, LLMConfig). Shape-derivable fields are inferred;
    the non-derivable ones (softcaps, window) come from the keyword
    defaults, overridable from the checkpoint's config.json.

    ``head_dim`` / ``query_pre_attn_scalar`` of 0 resolve from the
    published size table by hidden size — 2B (2304) and 9B (3584) use
    head_dim 256 with query scalar 256; 27B (4608) uses head_dim 128
    with query scalar dim/n_heads = 144. Pass both explicitly for a
    non-published architecture (neither is shape-derivable: q_proj is
    (H*Dh, D) and only the product is visible).

    The two convention deltas are folded here so the runtime stays
    branch-free: every RMSNorm weight is stored as (1 + w) (Gemma's
    norm convention), and tok_emb carries the sqrt(dim) embedding scale
    while the tied lm_head keeps the unscaled copy.
    """
    A = lambda k: np.asarray(state[k], np.float32)  # noqa: E731

    emb = A("model.embed_tokens.weight")  # (V, D)
    vocab, dim = emb.shape
    n_layers = len({k.split(".")[2] for k in state
                    if k.startswith("model.layers.")})
    q0 = A("model.layers.0.self_attn.q_proj.weight")
    k0 = A("model.layers.0.self_attn.k_proj.weight")
    hidden = A("model.layers.0.mlp.gate_proj.weight").shape[0]
    # q_proj is (H*Dh, D) / k_proj (Hk*Dh, D): head count is not
    # shape-derivable on its own — resolve from the published size
    # table (see docstring) unless given.
    hd = head_dim or (128 if dim >= 4608 else 256)
    n_heads = q0.shape[0] // hd
    n_kv = k0.shape[0] // hd
    if not query_pre_attn_scalar:
        query_pre_attn_scalar = float(hd if dim < 4608
                                      else dim // n_heads)

    cfg = llm_model.LLMConfig(
        vocab_size=vocab, dim=dim, n_layers=n_layers, n_heads=n_heads,
        n_kv_heads=n_kv, head_dim=hd, hidden_dim=hidden,
        norm_eps=norm_eps, rope_theta=rope_theta, max_seq=max_seq,
        sliding_window=sliding_window, act="gelu", post_norms=True,
        attn_softcap=attn_softcap, logit_softcap=logit_softcap,
        query_pre_attn_scalar=query_pre_attn_scalar, alt_window=True)

    def norm1(k):  # (1 + w) fold
        return jnp.asarray(A(k) + 1.0, dtype)

    wqkv, wo, w_gu, w_down = [], [], [], []
    attn_norm, mlp_norm, attn_post, mlp_post = [], [], [], []
    for i in range(n_layers):
        pre = f"model.layers.{i}"
        attn_norm.append(norm1(f"{pre}.input_layernorm.weight"))
        attn_post.append(norm1(f"{pre}.post_attention_layernorm.weight"))
        mlp_norm.append(norm1(f"{pre}.pre_feedforward_layernorm.weight"))
        mlp_post.append(norm1(f"{pre}.post_feedforward_layernorm.weight"))
        wqkv.append(jnp.asarray(np.concatenate([
            A(f"{pre}.self_attn.q_proj.weight").T,
            A(f"{pre}.self_attn.k_proj.weight").T,
            A(f"{pre}.self_attn.v_proj.weight").T], axis=1), dtype))
        wo.append(jnp.asarray(A(f"{pre}.self_attn.o_proj.weight").T,
                              dtype))
        w_gu.append(jnp.asarray(np.concatenate([
            A(f"{pre}.mlp.gate_proj.weight").T,
            A(f"{pre}.mlp.up_proj.weight").T], axis=1), dtype))
        w_down.append(jnp.asarray(A(f"{pre}.mlp.down_proj.weight").T,
                                  dtype))

    lm_head = (A("lm_head.weight").T if "lm_head.weight" in state
               else np.ascontiguousarray(emb.T))
    params = {
        "tok_emb": jnp.asarray(emb * float(np.sqrt(dim)), dtype),
        "layers": {
            "attn_norm": jnp.stack(attn_norm),
            "wqkv": jnp.stack(wqkv),
            "wo": jnp.stack(wo),
            "mlp_norm": jnp.stack(mlp_norm),
            "w_gu": jnp.stack(w_gu),
            "w_down": jnp.stack(w_down),
            "attn_post_norm": jnp.stack(attn_post),
            "mlp_post_norm": jnp.stack(mlp_post),
        },
        "out_norm": norm1("model.norm.weight"),
        "lm_head": jnp.asarray(lm_head, dtype),
    }
    return params, cfg


def gemma3_from_hf(
    state: Dict[str, Any],
    *,
    head_dim: int = 0,
    max_seq: int = 32768,
    sliding_window: int = 512,
    window_pattern: int = 6,
    query_pre_attn_scalar: float = 256.0,
    norm_eps: float = 1e-6,
    rope_theta: float = 1e6,
    rope_local_theta: float = 10000.0,
    rope_linear_factor: float = 0.0,
    dtype=jnp.bfloat16,
) -> tuple:
    """Convert a transformers Gemma-3 text state dict to
    (params, LLMConfig).

    Gemma-3 vs Gemma-2 (transformers modeling_gemma3.py): the attn /
    final logit softcaps are GONE, replaced by per-head Q/K RMSNorm
    (``self_attn.q_norm/k_norm``, Gemma (1+w) convention — folded here
    like every other Gemma norm); the 1:1 alternating windows become a
    5:1 sliding/global pattern (``window_pattern=6``); and the rope is
    DUAL — sliding layers rotate at ``rope_local_base_freq`` (10k),
    global layers at ``rope_theta`` (1M) with optional linear scaling
    (``rope_linear_factor``; the published 4B/12B/27B ship factor 8,
    the 1B ships none). Everything else (GeGLU, sandwich norms,
    sqrt(dim) embedding scale, tied head) matches Gemma-2 and reuses
    its folds. Reference analogue: llama.cpp's gemma3 arch, loaded by
    the reference via tk_model_loader.c:199.
    """
    A = lambda k: np.asarray(state[k], np.float32)  # noqa: E731

    emb = A("model.embed_tokens.weight")  # (V, D)
    vocab, dim = emb.shape
    n_layers = len({k.split(".")[2] for k in state
                    if k.startswith("model.layers.")})
    q0 = A("model.layers.0.self_attn.q_proj.weight")
    k0 = A("model.layers.0.self_attn.k_proj.weight")
    hidden = A("model.layers.0.mlp.gate_proj.weight").shape[0]
    # Per-head norms make head_dim shape-derivable (q_norm is (Dh,)).
    hd = head_dim or A("model.layers.0.self_attn.q_norm.weight").shape[0]
    n_heads = q0.shape[0] // hd
    n_kv = k0.shape[0] // hd

    cfg = llm_model.LLMConfig(
        vocab_size=vocab, dim=dim, n_layers=n_layers, n_heads=n_heads,
        n_kv_heads=n_kv, head_dim=hd, hidden_dim=hidden,
        norm_eps=norm_eps, rope_theta=rope_theta, max_seq=max_seq,
        sliding_window=sliding_window, act="gelu", post_norms=True,
        query_pre_attn_scalar=query_pre_attn_scalar, qk_norm=True,
        window_pattern=window_pattern,
        rope_local_theta=rope_local_theta)

    def norm1(k):  # (1 + w) fold
        return jnp.asarray(A(k) + 1.0, dtype)

    wqkv, wo, w_gu, w_down = [], [], [], []
    attn_norm, mlp_norm, attn_post, mlp_post = [], [], [], []
    q_norm, k_norm = [], []
    for i in range(n_layers):
        pre = f"model.layers.{i}"
        attn_norm.append(norm1(f"{pre}.input_layernorm.weight"))
        attn_post.append(norm1(f"{pre}.post_attention_layernorm.weight"))
        mlp_norm.append(norm1(f"{pre}.pre_feedforward_layernorm.weight"))
        mlp_post.append(norm1(f"{pre}.post_feedforward_layernorm.weight"))
        q_norm.append(norm1(f"{pre}.self_attn.q_norm.weight"))
        k_norm.append(norm1(f"{pre}.self_attn.k_norm.weight"))
        wqkv.append(jnp.asarray(np.concatenate([
            A(f"{pre}.self_attn.q_proj.weight").T,
            A(f"{pre}.self_attn.k_proj.weight").T,
            A(f"{pre}.self_attn.v_proj.weight").T], axis=1), dtype))
        wo.append(jnp.asarray(A(f"{pre}.self_attn.o_proj.weight").T,
                              dtype))
        w_gu.append(jnp.asarray(np.concatenate([
            A(f"{pre}.mlp.gate_proj.weight").T,
            A(f"{pre}.mlp.up_proj.weight").T], axis=1), dtype))
        w_down.append(jnp.asarray(A(f"{pre}.mlp.down_proj.weight").T,
                                  dtype))

    lm_head = (A("lm_head.weight").T if "lm_head.weight" in state
               else np.ascontiguousarray(emb.T))
    params = {
        "tok_emb": jnp.asarray(emb * float(np.sqrt(dim)), dtype),
        "layers": {
            "attn_norm": jnp.stack(attn_norm),
            "wqkv": jnp.stack(wqkv),
            "wo": jnp.stack(wo),
            "mlp_norm": jnp.stack(mlp_norm),
            "w_gu": jnp.stack(w_gu),
            "w_down": jnp.stack(w_down),
            "attn_post_norm": jnp.stack(attn_post),
            "mlp_post_norm": jnp.stack(mlp_post),
            "q_norm": jnp.stack(q_norm),
            "k_norm": jnp.stack(k_norm),
        },
        "out_norm": norm1("model.norm.weight"),
        "lm_head": jnp.asarray(lm_head, dtype),
    }
    if rope_linear_factor > 1.0:
        params["rope_factors"] = llm_model.linear_rope_factors(
            cfg, rope_linear_factor)
    return params, cfg


# ---------------------------------------------------------------------------
# Whisper: torch-layout checkpoint -> stacked JAX pytree
# ---------------------------------------------------------------------------

def whisper_config_from_torch(state: Dict[str, Any]) -> "Any":
    """Derive a WhisperConfig from checkpoint shapes (standard layout:
    encoder.conv1.weight (d, n_mels, 3), decoder.positional_embedding
    (n_text_ctx, d), head_dim 64 across all published sizes)."""
    from trackiellm_tpu.models.whisper import WhisperConfig

    d, n_mels, _ = state["encoder.conv1.weight"].shape
    n_audio = len({k.split(".")[2] for k in state
                   if k.startswith("encoder.blocks.")})
    n_text = len({k.split(".")[2] for k in state
                  if k.startswith("decoder.blocks.")})
    vocab, _ = state["decoder.token_embedding.weight"].shape
    n_text_ctx, _ = state["decoder.positional_embedding"].shape
    return WhisperConfig(
        n_mels=n_mels, d_model=d, n_heads=max(d // 64, 1),
        n_audio_layers=n_audio, n_text_layers=n_text,
        n_text_ctx=n_text_ctx, vocab_size=vocab)


def _wt(state, name):
    """Torch linear weight (out, in) -> (in, out)."""
    return jnp.asarray(np.asarray(state[name], np.float32).T)


def _wb(state, name):
    return jnp.asarray(np.asarray(state[name], np.float32))


def _whisper_layer_stack_from_torch(state, prefix: str, n: int):
    """Stack n transformer blocks (standard naming: attn_ln, attn.query/
    key/value/out with biased q/v/out, mlp_ln, mlp.0/mlp.2) into the
    scan-ready (n, ...) layout of models/whisper._layer_stack."""
    def S(fmt, conv=_wt):
        return jnp.stack([conv(state, fmt.format(i)) for i in range(n)])

    p = prefix
    return {
        "ln1": S(p + ".{}.attn_ln.weight", _wb),
        "ln1_b": S(p + ".{}.attn_ln.bias", _wb),
        "wq": S(p + ".{}.attn.query.weight"),
        "wk": S(p + ".{}.attn.key.weight"),
        "wv": S(p + ".{}.attn.value.weight"),
        "wo": S(p + ".{}.attn.out.weight"),
        "bq": S(p + ".{}.attn.query.bias", _wb),
        "bv": S(p + ".{}.attn.value.bias", _wb),
        "bo": S(p + ".{}.attn.out.bias", _wb),
        "ln2": S(p + ".{}.mlp_ln.weight", _wb),
        "ln2_b": S(p + ".{}.mlp_ln.bias", _wb),
        "w1": S(p + ".{}.mlp.0.weight"),
        "b1": S(p + ".{}.mlp.0.bias", _wb),
        "w2": S(p + ".{}.mlp.2.weight"),
        "b2": S(p + ".{}.mlp.2.bias", _wb),
    }


def whisper_from_torch(state: Dict[str, Any]):
    """Standard Whisper checkpoint (torch state-dict arrays, e.g. the
    published .pt files or HF "model.{...}" after prefix-stripping) ->
    (params, WhisperConfig) for models/whisper.

    Torch linears are (out, in) -> transposed; conv1ds are (out, in, k)
    -> (k, in, out) ("TIO"). The encoder's sinusoidal positional buffer
    is not copied — models/whisper computes identical sinusoids.
    """
    cfg = whisper_config_from_torch(state)
    n = cfg.n_text_layers

    def conv(name):
        return jnp.asarray(
            np.asarray(state[name], np.float32).transpose(2, 1, 0))

    def S(fmt, c=_wt):
        return jnp.stack([c(state, fmt.format(i)) for i in range(n)])

    cb = "decoder.blocks"
    params = {
        "conv1_w": conv("encoder.conv1.weight"),
        "conv1_b": _wb(state, "encoder.conv1.bias"),
        "conv2_w": conv("encoder.conv2.weight"),
        "conv2_b": _wb(state, "encoder.conv2.bias"),
        "enc": _whisper_layer_stack_from_torch(
            state, "encoder.blocks", cfg.n_audio_layers),
        "enc_ln": _wb(state, "encoder.ln_post.weight"),
        "enc_ln_b": _wb(state, "encoder.ln_post.bias"),
        "tok_emb": _wb(state, "decoder.token_embedding.weight"),
        "pos_emb": _wb(state, "decoder.positional_embedding"),
        "dec": _whisper_layer_stack_from_torch(state, cb, n),
        "cross": {
            "ln": S(cb + ".{}.cross_attn_ln.weight", _wb),
            "ln_b": S(cb + ".{}.cross_attn_ln.bias", _wb),
            "wq": S(cb + ".{}.cross_attn.query.weight"),
            "wk": S(cb + ".{}.cross_attn.key.weight"),
            "wv": S(cb + ".{}.cross_attn.value.weight"),
            "wo": S(cb + ".{}.cross_attn.out.weight"),
            "bq": S(cb + ".{}.cross_attn.query.bias", _wb),
            "bv": S(cb + ".{}.cross_attn.value.bias", _wb),
            "bo": S(cb + ".{}.cross_attn.out.bias", _wb),
        },
        "dec_ln": _wb(state, "decoder.ln.weight"),
        "dec_ln_b": _wb(state, "decoder.ln.bias"),
    }
    return params, cfg


def whisper_from_ggml(path: str):
    """whisper.cpp GGML file (the reference's exact ASR artifact,
    tk_cortex_main.h:70-76 / tk_asr_whisper.c:238) -> (params, cfg,
    tokenizer, mel_filters).

    The GGML container keeps the openai state-dict tensor names, so
    this is the GGML reader feeding :func:`whisper_from_torch`; the
    file's embedded byte vocab becomes a decode-capable tokenizer and
    its mel filterbank is returned for callers that want the original
    filters (ops/mel computes identical slaney-style banks).

    Shape-derived config is cross-checked against the file's hparams —
    a mismatch means a malformed file, not a silently wrong model.
    """
    from trackiellm_tpu.models.ggml_reader import (
        GGMLVocabTokenizer, read_ggml_whisper)

    g = read_ggml_whisper(path)
    params, cfg = whisper_from_torch(g.tensors)
    hp = g.hparams
    derived = {"n_mels": cfg.n_mels, "n_audio_layer": cfg.n_audio_layers,
               "n_text_layer": cfg.n_text_layers,
               "n_audio_state": cfg.d_model, "n_text_state": cfg.d_model,
               "n_vocab": cfg.vocab_size, "n_text_ctx": cfg.n_text_ctx}
    for key, ours in derived.items():
        if hp.get(key, ours) != ours:
            raise TrackieError(
                ErrorCode.MODEL_METADATA_INVALID,
                f"{path}: hparam {key}={hp[key]} disagrees with tensor "
                f"shapes ({ours})")
    # n_heads is NOT shape-derivable (whisper_config_from_torch assumes
    # head_dim 64, true for all published sizes); trust the hparams.
    if hp.get("n_audio_head", cfg.n_heads) != cfg.n_heads:
        cfg = cfg._replace(n_heads=hp["n_audio_head"])
    if hp.get("n_audio_ctx", cfg.n_audio_ctx) != cfg.n_audio_ctx:
        cfg = cfg._replace(n_audio_ctx=hp["n_audio_ctx"])
    return params, cfg, GGMLVocabTokenizer(g.vocab), g.mel_filters


# ---------------------------------------------------------------------------
# YOLOv8 detector (ultralytics checkpoint layout)
# ---------------------------------------------------------------------------

# ultralytics yolov8 module indices (yolov8.yaml): params live at
# "model.<idx>.<...>"; 10/13 are Upsample and 11/14/17/20 are Concat
# (no params), 22 is the Detect head.
_YOLO_IDX = {
    "stem": 0, "down1": 1, "c2f1": 2, "down2": 3, "c2f2": 4,
    "down3": 5, "c2f3": 6, "down4": 7, "c2f4": 8, "sppf": 9,
    "up_c2f1": 12, "up_c2f2": 15, "pan_down1": 16, "pan_c2f1": 18,
    "pan_down2": 19, "pan_c2f2": 21,
}
# YOLOv5(u) module indices (yolov5.yaml; Detect at 24).
_YOLO_V5_IDX = {
    "stem": 0, "down1": 1, "c3_1": 2, "down2": 3, "c3_2": 4,
    "down3": 5, "c3_3": 6, "down4": 7, "c3_4": 8, "sppf": 9,
    "pre_up1": 10, "up_c3_1": 13, "pre_up2": 14, "up_c3_2": 17,
    "pan_down1": 18, "pan_c3_1": 20, "pan_down2": 21, "pan_c3_2": 23,
}
_YOLO_BN_EPS = 1e-3  # ultralytics Conv: BatchNorm2d(c2, eps=0.001)


def _fold_conv_bn(state: Dict[str, Any], prefix: str,
                  eps: float = _YOLO_BN_EPS) -> Dict[str, jnp.ndarray]:
    """torch Conv2d+BatchNorm2d -> fused HWIO conv + bias.

    w' = w * gamma/sqrt(var+eps) (per out-channel), b' = beta - mean *
    gamma/sqrt(var+eps). Matches what exporters (and the reference's
    ONNX checkpoints) bake into inference graphs.
    """
    w = np.asarray(state[f"{prefix}.conv.weight"], np.float32)
    gamma = np.asarray(state[f"{prefix}.bn.weight"], np.float32)
    beta = np.asarray(state[f"{prefix}.bn.bias"], np.float32)
    mean = np.asarray(state[f"{prefix}.bn.running_mean"], np.float32)
    var = np.asarray(state[f"{prefix}.bn.running_var"], np.float32)
    scale = gamma / np.sqrt(var + eps)
    w = w * scale[:, None, None, None]
    b = beta - mean * scale
    return {"w": jnp.asarray(w.transpose(2, 3, 1, 0)),  # OIHW -> HWIO
            "b": jnp.asarray(b)}


def _plain_conv(state: Dict[str, Any], prefix: str) -> Dict[str, jnp.ndarray]:
    """torch Conv2d with bias (no BN) -> HWIO conv + bias."""
    w = np.asarray(state[f"{prefix}.weight"], np.float32)
    b = np.asarray(state[f"{prefix}.bias"], np.float32)
    return {"w": jnp.asarray(w.transpose(2, 3, 1, 0)),
            "b": jnp.asarray(b)}


def _c2f_from_torch(state, prefix: str) -> Dict[str, Any]:
    m = []
    j = 0
    while f"{prefix}.m.{j}.cv1.conv.weight" in state:
        m.append({"cv1": _fold_conv_bn(state, f"{prefix}.m.{j}.cv1"),
                  "cv2": _fold_conv_bn(state, f"{prefix}.m.{j}.cv2")})
        j += 1
    return {"cv1": _fold_conv_bn(state, f"{prefix}.cv1"),
            "m": m,
            "cv2": _fold_conv_bn(state, f"{prefix}.cv2")}


def _c3_from_torch(state, prefix: str) -> Dict[str, Any]:
    """v5 C3: cv1/cv2 laterals, bottleneck chain, cv3 merge."""
    m = []
    j = 0
    while f"{prefix}.m.{j}.cv1.conv.weight" in state:
        m.append({"cv1": _fold_conv_bn(state, f"{prefix}.m.{j}.cv1"),
                  "cv2": _fold_conv_bn(state, f"{prefix}.m.{j}.cv2")})
        j += 1
    return {"cv1": _fold_conv_bn(state, f"{prefix}.cv1"),
            "cv2": _fold_conv_bn(state, f"{prefix}.cv2"),
            "m": m,
            "cv3": _fold_conv_bn(state, f"{prefix}.cv3")}


def detector_config_from_torch(state: Dict[str, Any],
                               prefix: str = "model.") -> "Any":
    """Infer DetectorConfig from an ultralytics-layout state dict.
    The variant is detected from the Detect module's index: v8 puts it
    at model.22, v5(u) at model.24 (and only C3 blocks carry a cv3)."""
    from trackiellm_tpu.models.detector import DetectorConfig

    def cout(name):
        return int(np.asarray(state[f"{prefix}{name}.conv.weight"]).shape[0])

    v5 = f"{prefix}24.cv2.0.2.weight" in state
    det = f"{prefix}24" if v5 else f"{prefix}22"
    channels = (cout("0"), cout("1"), cout("3"), cout("5"), cout("7"))
    depths = []
    for idx in (2, 4, 6, 8):
        j = 0
        while f"{prefix}{idx}.m.{j}.cv1.conv.weight" in state:
            j += 1
        depths.append(j)
    n_box = int(np.asarray(state[f"{det}.cv2.0.2.weight"]).shape[0])
    nc = int(np.asarray(state[f"{det}.cv3.0.2.weight"]).shape[0])
    return DetectorConfig(num_classes=nc, channels=channels,
                          depths=tuple(depths), reg_max=n_box // 4,
                          variant="v5" if v5 else "v8")


def detector_from_torch(state: Dict[str, Any], prefix: str = "model."):
    """ultralytics YOLOv8 or YOLOv5u state dict (torch tensors or numpy
    arrays, names "model.<idx>....") -> (params, DetectorConfig) for
    models/detector. The variant is auto-detected (Detect at model.22
    vs model.24). BN is folded into each conv; layouts transpose
    OIHW -> HWIO. The Detect head's fixed DFL conv (model.{22,24}.dfl)
    is not copied — detector_forward computes the softmax expectation
    directly.

    Parity: replaces the reference's ONNX detector session ingest
    (src/vision/tk_object_detector.c:83; the shipped checkpoint is
    YOLOv5nu, src/workers/src/cortex_worker.rs:110) with a weights-only
    mapping.
    """
    cfg = detector_config_from_torch(state, prefix)
    idx_table = _YOLO_V5_IDX if cfg.variant == "v5" else _YOLO_IDX

    params: Dict[str, Any] = {}
    for name, idx in idx_table.items():
        pfx = f"{prefix}{idx}"
        if name == "sppf":
            params[name] = {"cv1": _fold_conv_bn(state, f"{pfx}.cv1"),
                            "cv2": _fold_conv_bn(state, f"{pfx}.cv2")}
        elif "c2f" in name:
            params[name] = _c2f_from_torch(state, pfx)
        elif "c3" in name:
            params[name] = _c3_from_torch(state, pfx)
        else:
            params[name] = _fold_conv_bn(state, pfx)
    det = f"{prefix}{24 if cfg.variant == 'v5' else 22}"
    for i in range(3):
        params[f"head{i}_box1"] = _fold_conv_bn(state, f"{det}.cv2.{i}.0")
        params[f"head{i}_box2"] = _fold_conv_bn(state, f"{det}.cv2.{i}.1")
        params[f"head{i}_box3"] = _plain_conv(state, f"{det}.cv2.{i}.2")
        params[f"head{i}_cls1"] = _fold_conv_bn(state, f"{det}.cv3.{i}.0")
        params[f"head{i}_cls2"] = _fold_conv_bn(state, f"{det}.cv3.{i}.1")
        params[f"head{i}_cls3"] = _plain_conv(state, f"{det}.cv3.{i}.2")
    return params, cfg


# ---------------------------------------------------------------------------
# MiDaS v2.1 small (MidasNet_small + tf_efficientnet_lite3 checkpoint)
# ---------------------------------------------------------------------------

_TF_BN_EPS = 1e-3  # timm tf_* models: BatchNorm eps 0.001

# MiDaS _make_efficientnet_backbone slices the effnet into 4 sequential
# layers; (layer, position) of each MBConv stage in the state dict:
#   layer1 = [conv_stem, bn1, act, blocks0, blocks1]
#   layer2 = [blocks2]   layer3 = [blocks3, blocks4]
#   layer4 = [blocks5, blocks6]
_MIDAS_STAGE_POS = ((1, 3), (1, 4), (2, 0), (3, 0), (3, 1), (4, 0), (4, 1))
_LITE_STRIDES = (1, 2, 2, 2, 1, 2, 1)


def _fold_bn_into(state: Dict[str, Any], conv_key: str, bn_prefix: str,
                  eps: float = _TF_BN_EPS) -> Dict[str, jnp.ndarray]:
    """Conv2d(bias=False)+BatchNorm2d -> fused HWIO conv + bias."""
    w = np.asarray(state[conv_key], np.float32)
    gamma = np.asarray(state[f"{bn_prefix}.weight"], np.float32)
    beta = np.asarray(state[f"{bn_prefix}.bias"], np.float32)
    mean = np.asarray(state[f"{bn_prefix}.running_mean"], np.float32)
    var = np.asarray(state[f"{bn_prefix}.running_var"], np.float32)
    scale = gamma / np.sqrt(var + eps)
    return {"w": jnp.asarray((w * scale[:, None, None, None])
                             .transpose(2, 3, 1, 0)),
            "b": jnp.asarray(beta - mean * scale)}


def _torch_conv(state: Dict[str, Any], prefix: str,
                bias: bool = True) -> Dict[str, Any]:
    w = np.asarray(state[f"{prefix}.weight"], np.float32)
    out = {"w": jnp.asarray(w.transpose(2, 3, 1, 0))}
    out["b"] = (jnp.asarray(np.asarray(state[f"{prefix}.bias"],
                                       np.float32)) if bias else None)
    return out


def midas_config_from_torch(state: Dict[str, Any], prefix: str = ""):
    """Infer DepthConfig from a MidasNet_small state dict."""
    from trackiellm_tpu.models.depth import DepthConfig, MBStage

    stem_ch = int(np.asarray(
        state[f"{prefix}pretrained.layer1.0.weight"]).shape[0])
    stages = []
    cin = stem_ch
    for si, ((layer, pos), stride) in enumerate(
            zip(_MIDAS_STAGE_POS, _LITE_STRIDES)):
        base = f"{prefix}pretrained.layer{layer}.{pos}"
        ds = f"{base}.0.conv_pwl.weight" not in state
        if ds:
            k = int(np.asarray(state[f"{base}.0.conv_dw.weight"]).shape[2])
            cout = int(np.asarray(state[f"{base}.0.conv_pw.weight"]).shape[0])
            expand = 1
        else:
            k = int(np.asarray(state[f"{base}.0.conv_dw.weight"]).shape[2])
            cout = int(np.asarray(
                state[f"{base}.0.conv_pwl.weight"]).shape[0])
            mid = int(np.asarray(state[f"{base}.0.conv_pw.weight"]).shape[0])
            expand = mid // cin
        n = 0
        while (f"{base}.{n}.conv_dw.weight" in state):
            n += 1
        stages.append(MBStage(k, stride, expand, cout, n))
        cin = cout
    features = int(np.asarray(
        state[f"{prefix}scratch.layer1_rn.weight"]).shape[0])
    return DepthConfig(stem_ch=stem_ch, stages=tuple(stages),
                       features=features)


def midas_small_from_torch(state: Dict[str, Any], prefix: str = ""):
    """MiDaS v2.1 small checkpoint (midas_v21_small state dict:
    "pretrained.layer*" efficientnet-lite3 + "scratch.*" RefineNet) ->
    (params, DepthConfig) for models/depth. Encoder BN folds into each
    conv; layouts transpose OIHW -> HWIO.

    Parity: replaces the reference's MiDaS ONNX session ingest
    (src/vision/tk_depth_midas.c:176) with a weights-only mapping.
    """
    cfg = midas_config_from_torch(state, prefix)

    blocks = []
    for si, ((layer, pos), st) in enumerate(
            zip(_MIDAS_STAGE_POS, cfg.stages)):
        stage = []
        for j in range(st.repeats):
            base = f"{prefix}pretrained.layer{layer}.{pos}.{j}"
            if st.expand == 1:
                stage.append({
                    "dw": _fold_bn_into(state, f"{base}.conv_dw.weight",
                                        f"{base}.bn1"),
                    "pw": _fold_bn_into(state, f"{base}.conv_pw.weight",
                                        f"{base}.bn2"),
                })
            else:
                stage.append({
                    "pw": _fold_bn_into(state, f"{base}.conv_pw.weight",
                                        f"{base}.bn1"),
                    "dw": _fold_bn_into(state, f"{base}.conv_dw.weight",
                                        f"{base}.bn2"),
                    "pwl": _fold_bn_into(state, f"{base}.conv_pwl.weight",
                                         f"{base}.bn3"),
                })
        blocks.append(stage)

    sc = f"{prefix}scratch"

    def rcu(rn, unit):
        base = f"{sc}.refinenet{rn}.resConfUnit{unit}"
        return {"c1": _torch_conv(state, f"{base}.conv1"),
                "c2": _torch_conv(state, f"{base}.conv2")}

    refine = [{"rcu1": rcu(k + 1, 1), "rcu2": rcu(k + 1, 2),
               "out": _torch_conv(state, f"{sc}.refinenet{k + 1}.out_conv")}
              for k in range(4)]

    params = {
        "stem": _fold_bn_into(state,
                              f"{prefix}pretrained.layer1.0.weight",
                              f"{prefix}pretrained.layer1.1"),
        "blocks": blocks,
        "layer_rn": [
            _torch_conv(state, f"{sc}.layer{k + 1}_rn", bias=False)
            for k in range(4)],
        "refine": refine,
        "head1": _torch_conv(state, f"{sc}.output_conv.0"),
        "head2": _torch_conv(state, f"{sc}.output_conv.2"),
        "head3": _torch_conv(state, f"{sc}.output_conv.4"),
    }
    return params, cfg


# ---------------------------------------------------------------------------
# Audio / small-perception converters (torch state-dict layouts)
# ---------------------------------------------------------------------------
# Every model in models/ has a tested *_from_* ingestion path; these map
# the torch-trained layouts (Linear (out,in), Conv1d (out,in,k), Conv2d
# OIHW, GRU/GRUCell weight_ih/weight_hh with r,z,n gate order) into the
# framework's NHWC / (k,in,out) / (in,out) trees.

def _lin(state, prefix):
    """torch nn.Linear -> {"w": (in,out), "b": (out,)}."""
    return {"w": jnp.asarray(np.asarray(state[f"{prefix}.weight"],
                                        np.float32).T),
            "b": jnp.asarray(np.asarray(state[f"{prefix}.bias"],
                                        np.float32))}


def _conv2d(state, prefix):
    """torch nn.Conv2d (with bias) -> {"w": HWIO, "b"}."""
    w = np.asarray(state[f"{prefix}.weight"], np.float32)
    return {"w": jnp.asarray(w.transpose(2, 3, 1, 0)),
            "b": jnp.asarray(np.asarray(state[f"{prefix}.bias"],
                                        np.float32))}


def _conv1d_tio(state, prefix):
    """torch nn.Conv1d (out,in,k) -> {"w": (k,in,out), "b"}."""
    w = np.asarray(state[f"{prefix}.weight"], np.float32)
    return {"w": jnp.asarray(w.transpose(2, 1, 0)),
            "b": jnp.asarray(np.asarray(state[f"{prefix}.bias"],
                                        np.float32))}


def vad_from_torch(state: Dict[str, Any]):
    """Silero-shape VAD checkpoint (torch: two feature Linears, a
    GRUCell carrying the streaming state, a Linear head — names
    "conv1"/"conv2"/"gru"/"out") -> (params, VADConfig) for models/vad.

    torch GRUCell gate order is r,z,n with separate input/hidden biases
    — exactly the layout vad_step computes. Parity: replaces the
    reference's Silero ONNX session ingest (src/sensors/tk_vad_silero.c:25).
    """
    from trackiellm_tpu.models.vad import VADConfig

    wi = np.asarray(state["gru.weight_ih"], np.float32)
    hidden = wi.shape[0] // 3
    n_mels = int(np.asarray(state["conv1.weight"]).shape[1])
    conv_ch = int(np.asarray(state["conv1.weight"]).shape[0])
    cfg = VADConfig(n_mels=n_mels, conv_ch=conv_ch, hidden=hidden)
    params = {
        "conv1": _lin(state, "conv1"),
        "conv2": _lin(state, "conv2"),
        "gru_wi": {"w": jnp.asarray(wi.T),
                   "b": jnp.asarray(np.asarray(state["gru.bias_ih"],
                                               np.float32))},
        "gru_wh": {"w": jnp.asarray(
            np.asarray(state["gru.weight_hh"], np.float32).T),
            "b": jnp.asarray(np.asarray(state["gru.bias_hh"],
                                        np.float32))},
        "out": _lin(state, "out"),
    }
    return params, cfg


def _wn_weight(state: Dict[str, Any], prefix: str) -> np.ndarray:
    """Reconstruct a weight-normed conv weight: w = g * v / ||v||
    (torch weight_norm, dim=0). Falls back to a plain ``.weight``."""
    if f"{prefix}.weight" in state:
        return np.asarray(state[f"{prefix}.weight"], np.float32)
    g = np.asarray(state[f"{prefix}.weight_g"], np.float32)
    v = np.asarray(state[f"{prefix}.weight_v"], np.float32)
    norm = np.sqrt((v.reshape(v.shape[0], -1) ** 2).sum(-1))
    return g.reshape(-1, *([1] * (v.ndim - 1))) * v / norm.reshape(
        -1, *([1] * (v.ndim - 1)))


def vits_from_torch(state: Dict[str, Any], max_phonemes: int = 256,
                    max_frames: int = 768, sample_rate: int = 22050):
    """Published VITS/Piper checkpoint (torch module names: enc_p.*,
    dp.* stochastic duration predictor, flow.flows.*, dec.* HiFiGAN)
    -> (params, VITSConfig) for models/vits.py::vits_infer.

    Weight-normed convs (flow WN layers, HiFiGAN ups/resblocks) are
    reconstructed from weight_g/weight_v. Parity: the reference's Piper
    voice graphs (src/audio/tk_tts_piper.c:237); see docs/REAL_WEIGHTS.md
    for the name table and verification workflow."""
    from trackiellm_tpu.models.vits import VITSConfig

    A = lambda k: jnp.asarray(np.asarray(state[k], np.float32))  # noqa

    def conv(prefix):
        w = jnp.asarray(_wn_weight(state, prefix))
        b = (A(f"{prefix}.bias") if f"{prefix}.bias" in state
             else None)
        return w, b

    emb = np.asarray(state["enc_p.emb.weight"], np.float32)
    d_model = emb.shape[1]
    attn_idx = [int(k.split(".")[3]) for k in state
                if k.startswith("enc_p.encoder.attn_layers.")]
    if not attn_idx:
        raise KeyError("enc_p.encoder.attn_layers.* (not a VITS "
                       "checkpoint, or names need a name map)")
    n_layers = max(attn_idx) + 1
    rel = np.asarray(state["enc_p.encoder.attn_layers.0.emb_rel_k"],
                     np.float32)
    window = (rel.shape[-2] - 1) // 2
    head_dim = rel.shape[-1]
    n_heads = d_model // head_dim
    ffn_ch = np.asarray(
        state["enc_p.encoder.ffn_layers.0.conv_1.weight"]).shape[0]
    ffn_kernel = np.asarray(
        state["enc_p.encoder.ffn_layers.0.conv_1.weight"]).shape[2]

    layers = []
    for i in range(n_layers):
        ap = f"enc_p.encoder.attn_layers.{i}"
        layers.append({
            "attn": {
                "q_w": A(f"{ap}.conv_q.weight"),
                "q_b": A(f"{ap}.conv_q.bias"),
                "k_w": A(f"{ap}.conv_k.weight"),
                "k_b": A(f"{ap}.conv_k.bias"),
                "v_w": A(f"{ap}.conv_v.weight"),
                "v_b": A(f"{ap}.conv_v.bias"),
                "o_w": A(f"{ap}.conv_o.weight"),
                "o_b": A(f"{ap}.conv_o.bias"),
                "emb_k": A(f"{ap}.emb_rel_k"),
                "emb_v": A(f"{ap}.emb_rel_v"),
            },
            "ln1_g": A(f"enc_p.encoder.norm_layers_1.{i}.gamma"),
            "ln1_b": A(f"enc_p.encoder.norm_layers_1.{i}.beta"),
            "ffn_w1": A(f"enc_p.encoder.ffn_layers.{i}.conv_1.weight"),
            "ffn_b1": A(f"enc_p.encoder.ffn_layers.{i}.conv_1.bias"),
            "ffn_w2": A(f"enc_p.encoder.ffn_layers.{i}.conv_2.weight"),
            "ffn_b2": A(f"enc_p.encoder.ffn_layers.{i}.conv_2.bias"),
            "ln2_g": A(f"enc_p.encoder.norm_layers_2.{i}.gamma"),
            "ln2_b": A(f"enc_p.encoder.norm_layers_2.{i}.beta"),
        })
    enc = {"layers": jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *layers)}

    # flow: ResidualCouplingLayer at even indices (odd are Flips)
    flow_idx = sorted({int(k.split(".")[2]) for k in state
                       if k.startswith("flow.flows.")
                       and k.split(".")[3] == "pre"})
    wn_layers = max(int(k.split(".")[5]) for k in state
                    if ".enc.in_layers." in k
                    and k.startswith("flow.flows.")) + 1
    wn_kernel = _wn_weight(
        state, f"flow.flows.{flow_idx[0]}.enc.in_layers.0").shape[2]
    couplings = []
    for fi in flow_idx:
        p = f"flow.flows.{fi}"
        wn = {"in_w": [], "in_b": [], "rs_w": [], "rs_b": []}
        for j in range(wn_layers):
            wn["in_w"].append(jnp.asarray(_wn_weight(
                state, f"{p}.enc.in_layers.{j}")))
            wn["in_b"].append(A(f"{p}.enc.in_layers.{j}.bias"))
            wn["rs_w"].append(jnp.asarray(_wn_weight(
                state, f"{p}.enc.res_skip_layers.{j}")))
            wn["rs_b"].append(A(f"{p}.enc.res_skip_layers.{j}.bias"))
        couplings.append({
            "pre_w": A(f"{p}.pre.weight"), "pre_b": A(f"{p}.pre.bias"),
            "wn": wn,
            "post_w": A(f"{p}.post.weight"),
            "post_b": A(f"{p}.post.bias"),
        })
    flow = {"couplings": jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *couplings)}

    # stochastic duration predictor (training-only submodules ignored)
    def dds(prefix, n=3):
        out = {"sep_w": [], "sep_b": [], "pw_w": [], "pw_b": [],
               "ln1_g": [], "ln1_b": [], "ln2_g": [], "ln2_b": []}
        for i in range(n):
            out["sep_w"].append(A(f"{prefix}.convs_sep.{i}.weight"))
            out["sep_b"].append(A(f"{prefix}.convs_sep.{i}.bias"))
            out["pw_w"].append(A(f"{prefix}.convs_1x1.{i}.weight"))
            out["pw_b"].append(A(f"{prefix}.convs_1x1.{i}.bias"))
            out["ln1_g"].append(A(f"{prefix}.norms_1.{i}.gamma"))
            out["ln1_b"].append(A(f"{prefix}.norms_1.{i}.beta"))
            out["ln2_g"].append(A(f"{prefix}.norms_2.{i}.gamma"))
            out["ln2_b"].append(A(f"{prefix}.norms_2.{i}.beta"))
        # stack lists -> (n, ...) arrays (dds params are uniform)
        return {k: jnp.stack(v) for k, v in out.items()}

    sdp = None
    if "dp.pre.weight" in state:
        cf_idx = sorted({int(k.split(".")[2]) for k in state
                         if k.startswith("dp.flows.")
                         and k.split(".")[3] == "pre"})
        cflows = []
        for fi in cf_idx:
            p = f"dp.flows.{fi}"
            cflows.append({
                "pre_w": A(f"{p}.pre.weight"),
                "pre_b": A(f"{p}.pre.bias"),
                "dds": dds(f"{p}.convs"),
                "proj_w": A(f"{p}.proj.weight"),
                "proj_b": A(f"{p}.proj.bias"),
            })
        sdp_ch = np.asarray(state["dp.pre.weight"]).shape[0]
        sdp_kernel = np.asarray(
            state["dp.convs.convs_sep.0.weight"]).shape[2]
        sdp_bins = (np.asarray(
            state[f"dp.flows.{cf_idx[0]}.proj.weight"]).shape[0] + 1) // 3
        sdp = {
            "pre_w": A("dp.pre.weight"), "pre_b": A("dp.pre.bias"),
            "dds": dds("dp.convs"),
            "proj_w": A("dp.proj.weight"), "proj_b": A("dp.proj.bias"),
            "flows": jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs), *cflows),
            "ea_m": A("dp.flows.0.m") if "dp.flows.0.m" in state
            else jnp.zeros((2,)),
            "ea_logs": (A("dp.flows.0.logs")
                        if "dp.flows.0.logs" in state
                        else jnp.zeros((2,))),
        }
        n_sdp_flows = len(cf_idx)
    else:
        sdp_ch, sdp_kernel, sdp_bins, n_sdp_flows = d_model, 3, 10, 4

    # HiFiGAN decoder
    ups = sorted({int(k.split(".")[2]) for k in state
                  if k.startswith("dec.ups.")})
    up_w = [jnp.asarray(_wn_weight(state, f"dec.ups.{i}")) for i in ups]
    up_b = [A(f"dec.ups.{i}.bias") if f"dec.ups.{i}.bias" in state
            else jnp.zeros((up_w[i].shape[1],)) for i in ups]
    res_flat = sorted({int(k.split(".")[2]) for k in state
                       if k.startswith("dec.resblocks.")})
    n_kernels = len(res_flat) // len(ups)
    resblock_kernels = []
    resblock_dilations = []
    res = []
    for i in ups:
        level = []
        for j in range(n_kernels):
            idx = i * n_kernels + j
            p = f"dec.resblocks.{idx}"
            n_d = len({int(k.split(".")[4]) for k in state
                       if k.startswith(f"{p}.convs1.")})
            c1w = [jnp.asarray(_wn_weight(state, f"{p}.convs1.{d}"))
                   for d in range(n_d)]
            if i == 0:
                resblock_kernels.append(c1w[0].shape[2])
            level.append({
                "c1_w": jnp.stack(c1w),
                "c1_b": jnp.stack([A(f"{p}.convs1.{d}.bias")
                                   for d in range(n_d)]),
                "c2_w": jnp.stack(
                    [jnp.asarray(_wn_weight(state, f"{p}.convs2.{d}"))
                     for d in range(n_d)]),
                "c2_b": jnp.stack([A(f"{p}.convs2.{d}.bias")
                                   for d in range(n_d)]),
            })
        res.append(level)
    up_kernels = tuple(int(w.shape[2]) for w in up_w)
    # upsample rate isn't in the weights; HiFiGAN convention k = 2*rate
    # (or 4*rate for the trailing 4/4 stages) — infer k//2 capped so
    # rates compose to the true hop only if the convention holds; the
    # caller can override via VITSConfig.
    up_rates = tuple(max(k // 2 if k % 2 == 0 else k // 2, 1)
                     for k in up_kernels)

    dilations = tuple(
        tuple(1 + 2 * d for d in range(res[0][j]["c1_w"].shape[0]))
        for j in range(n_kernels))
    # VITS canon dilations are (1, 3, 5); shape can't distinguish, so
    # use the canon when the count is 3.
    dilations = tuple((1, 3, 5) if len(d) == 3 else d for d in dilations)

    cfg = VITSConfig(
        vocab_size=emb.shape[0], d_model=d_model, n_heads=n_heads,
        n_layers=n_layers, ffn_ch=ffn_ch, ffn_kernel=ffn_kernel,
        window=window, n_flows=len(flow_idx), wn_layers=wn_layers,
        wn_kernel=wn_kernel, sdp_ch=sdp_ch, sdp_kernel=sdp_kernel,
        sdp_flows=n_sdp_flows, sdp_bins=sdp_bins,
        up_init_ch=up_w[0].shape[0], upsample_rates=up_rates,
        upsample_kernels=up_kernels,
        resblock_kernels=tuple(resblock_kernels),
        resblock_dilations=dilations,
        max_phonemes=max_phonemes, max_frames=max_frames,
        sample_rate=sample_rate)

    dp = None
    params = {
        "emb": jnp.asarray(emb),
        "enc": enc,
        "proj_w": A("enc_p.proj.weight"),
        "proj_b": A("enc_p.proj.bias"),
        "flow": flow,
        "dec": {"pre_w": jnp.asarray(_wn_weight(state, "dec.conv_pre")),
                "pre_b": A("dec.conv_pre.bias"),
                "up_w": up_w, "up_b": up_b, "res": res,
                "post_w": jnp.asarray(_wn_weight(state, "dec.conv_post")),
                "post_b": (A("dec.conv_post.bias")
                           if "dec.conv_post.bias" in state
                           else jnp.zeros((1,)))},
    }
    if sdp is not None:
        params["sdp"] = sdp
    return params, cfg


def silero_from_onnx(state: Dict[str, Any]):
    """Published Silero VAD v5 ONNX initializers -> (params,
    SileroConfig) for models/vad.py::SileroVAD.

    Consumes the REAL graph's initializer names (with or without the
    ``_model.`` prefix — both exports exist); see docs/REAL_WEIGHTS.md
    for the name/shape table and the flags that still need verification
    against a real file. Parity: replaces the reference's Silero ONNX
    session (src/sensors/tk_vad_silero.c:25)."""
    from trackiellm_tpu.models.vad import SileroConfig

    def get(name):
        for k in (name, f"_model.{name}"):
            if k in state:
                return np.asarray(state[k], np.float32)
        raise KeyError(name)

    basis = get("stft.forward_basis_buffer")
    if basis.ndim == 3:          # (258, 1, 256) conv layout
        basis = basis[:, 0, :]
    enc_ch = []
    enc = []
    for i in range(4):
        w = get(f"encoder.{i}.reparam_conv.weight")
        b = get(f"encoder.{i}.reparam_conv.bias")
        enc_ch.append(w.shape[0])
        enc.append((w, b))
    wi = get("decoder.rnn.weight_ih")
    hidden = wi.shape[0] // 4
    head_w = get("decoder.decoder.2.weight")
    cfg = SileroConfig(n_freqs=enc[0][0].shape[1],
                       enc_ch=tuple(enc_ch), hidden=hidden)
    params: Dict[str, Any] = {"stft_basis": jnp.asarray(basis)}
    for i, (w, b) in enumerate(enc):
        params[f"enc{i}_w"] = jnp.asarray(w)
        params[f"enc{i}_b"] = jnp.asarray(b)
    params["lstm_wi"] = jnp.asarray(wi)
    params["lstm_wh"] = jnp.asarray(get("decoder.rnn.weight_hh"))
    params["lstm_bi"] = jnp.asarray(get("decoder.rnn.bias_ih"))
    params["lstm_bh"] = jnp.asarray(get("decoder.rnn.bias_hh"))
    params["head_w"] = jnp.asarray(head_w.reshape(-1))
    params["head_b"] = jnp.asarray(
        get("decoder.decoder.2.bias").reshape(()))
    return params, cfg


def tts_from_torch(state: Dict[str, Any], upsample=(4, 5, 8)):
    """Piper/VITS-shape TTS checkpoint (torch: phoneme Embedding, Conv1d
    encoder/decoder stacks, Linear duration predictor + mel head,
    Conv1d HiFiGAN-style vocoder — names matching models/tts's tree) ->
    (params, TTSConfig). Parity: replaces the reference's Piper ONNX
    voice ingest (src/audio/tk_tts_piper.c:237).
    """
    from trackiellm_tpu.models.tts import TTSConfig

    emb = np.asarray(state["emb.weight"], np.float32)
    n_mels = int(np.asarray(state["mel_out.weight"]).shape[0])
    voc_ch = int(np.asarray(state["voc_in.weight"]).shape[0])
    cfg = TTSConfig(vocab_size=emb.shape[0], d_model=emb.shape[1],
                    n_mels=n_mels, voc_ch=voc_ch,
                    upsample=tuple(upsample))
    params = {
        "emb": jnp.asarray(emb),
        "enc1": _conv1d_tio(state, "enc1"),
        "enc2": _conv1d_tio(state, "enc2"),
        "dur1": _lin(state, "dur1"),
        "dur2": _lin(state, "dur2"),
        "dec1": _conv1d_tio(state, "dec1"),
        "dec2": _conv1d_tio(state, "dec2"),
        "mel_out": _lin(state, "mel_out"),
        "voc_in": _conv1d_tio(state, "voc_in"),
        "voc_out": _conv1d_tio(state, "voc_out"),
    }
    for i in range(len(cfg.upsample)):
        for part in (f"voc_up{i}", f"voc_res{i}a", f"voc_res{i}b"):
            params[part] = _conv1d_tio(state, part)
    return params, cfg


def ocr_from_torch(state: Dict[str, Any]):
    """CRNN checkpoint (torch: three Conv2d blocks, bidirectional GRU
    as two GRUCell-layout sides "gru_fwd"/"gru_bwd" with fused bias,
    Linear CTC head) -> (params, OCRConfig) for models/ocr."""
    from trackiellm_tpu.models.ocr import OCRConfig

    conv_ch = int(np.asarray(state["conv3.weight"]).shape[0])
    hidden = int(np.asarray(state["gru_fwd.weight_hh"]).shape[1])
    num_classes = int(np.asarray(state["out.weight"]).shape[0])

    def gru(side):
        wi = np.asarray(state[f"{side}.weight_ih"], np.float32)
        wh = np.asarray(state[f"{side}.weight_hh"], np.float32)
        # models/ocr uses one fused bias on the input side; torch keeps
        # two. bias_hh folds into it for the r/z gates; the n gate's
        # hidden bias (scaled by r) cannot fold exactly — checkpoints
        # for this head are expected trained with bias_hh == 0 for n
        # (enforced here).
        bi = np.asarray(state[f"{side}.bias_ih"], np.float32).copy()
        bh = np.asarray(state[f"{side}.bias_hh"], np.float32)
        h = wh.shape[1]
        if np.any(bh[2 * h:] != 0):
            raise TrackieError(
                ErrorCode.MODEL_METADATA_INVALID,
                "CRNN GRU bias_hh[n] must be zero to fold into the "
                "fused-bias layout")
        bi[:2 * h] += bh[:2 * h]
        return {"wi": jnp.asarray(wi.T), "wh": jnp.asarray(wh.T),
                "b": jnp.asarray(bi)}

    params = {
        "conv1": _conv2d(state, "conv1"),
        "conv2": _conv2d(state, "conv2"),
        "conv3": _conv2d(state, "conv3"),
        "gru_fwd": gru("gru_fwd"),
        "gru_bwd": gru("gru_bwd"),
        "out_w": jnp.asarray(np.asarray(state["out.weight"],
                                        np.float32).T),
        "out_b": jnp.asarray(np.asarray(state["out.bias"], np.float32)),
    }
    cfg = OCRConfig(conv_ch=conv_ch, hidden=hidden,
                    num_classes=num_classes)
    return params, cfg


def sound_classifier_from_torch(state: Dict[str, Any], n_mels: int = 64,
                                n_frames: int = 96):
    """Conv+pool classifier checkpoint -> (params, SoundClassifierConfig).
    Parity: the reference's ONNX ambient classifier
    (src/audio/tk_sound_classifier.c:14)."""
    from trackiellm_tpu.models.sound_classifier import SoundClassifierConfig

    ch = int(np.asarray(state["conv2.weight"]).shape[0])
    ncls = int(np.asarray(state["out.weight"]).shape[0])
    params = {
        "conv1": _conv2d(state, "conv1"),
        "conv2": _conv2d(state, "conv2"),
        "conv3": _conv2d(state, "conv3"),
        "out_w": jnp.asarray(np.asarray(state["out.weight"],
                                        np.float32).T),
        "out_b": jnp.asarray(np.asarray(state["out.bias"], np.float32)),
    }
    cfg = SoundClassifierConfig(n_mels=n_mels, n_frames=n_frames, ch=ch,
                                num_classes=ncls)
    return params, cfg


def wake_word_from_torch(state: Dict[str, Any], n_mels: int = 40,
                         n_frames: int = 76, sensitivity: float = 0.5):
    """Conv KWS checkpoint -> (params, WakeWordConfig). Parity: the
    reference's Porcupine keyword blob (src/audio/tk_wake_word_porcupine.c:15),
    replaced by an open conv spotter."""
    from trackiellm_tpu.audio.wake_word import WakeWordConfig

    ch = int(np.asarray(state["conv2.weight"]).shape[0])
    params = {
        "conv1": _conv2d(state, "conv1"),
        "conv2": _conv2d(state, "conv2"),
        "out_w": jnp.asarray(np.asarray(state["out.weight"],
                                        np.float32).T),
        "out_b": jnp.asarray(np.asarray(state["out.bias"], np.float32)),
    }
    return params, WakeWordConfig(n_mels=n_mels, n_frames=n_frames,
                                  ch=ch, sensitivity=sensitivity)


def qwen2_moe_from_hf(
    state: Dict[str, Any],
    *,
    max_seq: int = 8192,
    norm_eps: float = 1e-6,
    rope_theta: float = 1e6,
    head_dim: int = 0,
    n_experts_used: int = 4,
    norm_topk: bool = False,
    dtype=jnp.bfloat16,
) -> tuple:
    """Convert a transformers Qwen2-MoE state dict to (params, cfg).

    The Qwen2-MoE block (also the DeepSeek-MoE shape) = Qwen2 attention
    (QKV biases) + top-k routed experts (``mlp.experts.N``) + an
    always-active SHARED expert scaled by sigmoid of a scalar gate
    (``mlp.shared_expert`` / ``mlp.shared_expert_gate``). Router top-k
    weights are NOT renormalized (norm_topk_prob=False in the published
    configs) — ``norm_topk`` mirrors that flag."""
    A = lambda k: np.asarray(state[k], np.float32)  # noqa: E731

    emb = A("model.embed_tokens.weight")
    vocab, dim = emb.shape
    n_layers = len({k.split(".")[2] for k in state
                    if k.startswith("model.layers.")})
    q0 = A("model.layers.0.self_attn.q_proj.weight")
    k0 = A("model.layers.0.self_attn.k_proj.weight")
    hidden = A("model.layers.0.mlp.experts.0.gate_proj.weight").shape[0]
    shared_hidden = A(
        "model.layers.0.mlp.shared_expert.gate_proj.weight").shape[0]
    n_experts = len({k.split(".")[5] for k in state
                     if ".mlp.experts." in k})
    hd = head_dim or (128 if q0.shape[0] % 128 == 0 else dim // 16)
    n_heads = q0.shape[0] // hd
    n_kv = k0.shape[0] // hd

    cfg = llm_model.LLMConfig(
        vocab_size=vocab, dim=dim, n_layers=n_layers, n_heads=n_heads,
        n_kv_heads=n_kv, head_dim=hd, hidden_dim=hidden,
        norm_eps=norm_eps, rope_theta=rope_theta, max_seq=max_seq,
        sliding_window=max_seq, qkv_bias=True, n_experts=n_experts,
        n_experts_used=n_experts_used, moe_norm_topk=norm_topk,
        moe_shared_hidden=shared_hidden)

    L = {"attn_norm": [], "wqkv": [], "wqkv_bias": [], "wo": [],
         "mlp_norm": [], "moe_gate": [], "w_gu": [], "w_down": [],
         "shared_gu": [], "shared_down": [], "shared_gate": []}
    for i in range(n_layers):
        pre = f"model.layers.{i}"
        L["attn_norm"].append(A(f"{pre}.input_layernorm.weight"))
        L["mlp_norm"].append(A(f"{pre}.post_attention_layernorm.weight"))
        L["wqkv"].append(np.concatenate(
            [A(f"{pre}.self_attn.{p}_proj.weight").T
             for p in ("q", "k", "v")], axis=1))
        L["wqkv_bias"].append(np.concatenate(
            [A(f"{pre}.self_attn.{p}_proj.bias")
             for p in ("q", "k", "v")]))
        L["wo"].append(A(f"{pre}.self_attn.o_proj.weight").T)
        L["moe_gate"].append(A(f"{pre}.mlp.gate.weight").T)
        gus, downs = [], []
        for e in range(n_experts):
            ep = f"{pre}.mlp.experts.{e}"
            gus.append(np.concatenate([A(f"{ep}.gate_proj.weight").T,
                                       A(f"{ep}.up_proj.weight").T],
                                      axis=1))
            downs.append(A(f"{ep}.down_proj.weight").T)
        L["w_gu"].append(np.stack(gus))
        L["w_down"].append(np.stack(downs))
        sp = f"{pre}.mlp.shared_expert"
        L["shared_gu"].append(np.concatenate(
            [A(f"{sp}.gate_proj.weight").T,
             A(f"{sp}.up_proj.weight").T], axis=1))
        L["shared_down"].append(A(f"{sp}.down_proj.weight").T)
        L["shared_gate"].append(
            A(f"{pre}.mlp.shared_expert_gate.weight").T)

    params = {
        "tok_emb": jnp.asarray(emb, dtype),
        "layers": {k: jnp.asarray(np.stack(v), dtype)
                   for k, v in L.items()},
        "out_norm": jnp.asarray(A("model.norm.weight"), dtype),
        "lm_head": jnp.asarray(
            (A("lm_head.weight").T if "lm_head.weight" in state
             else np.ascontiguousarray(emb.T)), dtype),
    }
    return params, cfg


def smollm3_from_hf(
    state: Dict[str, Any],
    *,
    max_seq: int = 65536,
    norm_eps: float = 1e-6,
    rope_theta: float = 5e6,
    nope_pattern: int = 4,
    head_dim: int = 0,
    dtype=jnp.bfloat16,
) -> tuple:
    """Convert a transformers SmolLM3 state dict to (params, cfg).

    SmolLM3 is Llama-shaped (RMSNorm, SwiGLU, GQA, no biases, tied
    embeddings) with ONE delta: NoPE every ``no_rope_layer_interval``-th
    layer — rope applies on layer li iff (li+1) % interval != 0
    (transformers configuration_smollm3.py). That maps to
    ``cfg.nope_pattern``; the rotation is skipped in-scan by zeroing
    that layer's rope frequencies (see llm._layer_freqs). head_dim is
    not shape-derivable (no per-head norms); the published 3B uses the
    Llama default dim//n_heads = 128, overridable via ``head_dim``."""
    A = lambda k: np.asarray(state[k], np.float32)  # noqa: E731

    emb = A("model.embed_tokens.weight")
    vocab, dim = emb.shape
    n_layers = len({k.split(".")[2] for k in state
                    if k.startswith("model.layers.")})
    q0 = A("model.layers.0.self_attn.q_proj.weight")
    k0 = A("model.layers.0.self_attn.k_proj.weight")
    hidden = A("model.layers.0.mlp.gate_proj.weight").shape[0]
    # q_proj is (H*Dh, D) and there are no per-head norms, so head_dim
    # isn't shape-derivable on its own. SmolLM3 keeps the Llama
    # convention head_dim = dim // n_heads with q_proj square
    # (H*Dh == D); the published 3B is 2048/16 = 128.
    hd = head_dim or 128
    n_heads = q0.shape[0] // hd
    n_kv = k0.shape[0] // hd

    cfg = llm_model.LLMConfig(
        vocab_size=vocab, dim=dim, n_layers=n_layers, n_heads=n_heads,
        n_kv_heads=n_kv, head_dim=hd, hidden_dim=hidden,
        norm_eps=norm_eps, rope_theta=rope_theta, max_seq=max_seq,
        sliding_window=max_seq, nope_pattern=nope_pattern)

    L = {"attn_norm": [], "wqkv": [], "wo": [], "mlp_norm": [],
         "w_gu": [], "w_down": []}
    for i in range(n_layers):
        pre = f"model.layers.{i}"
        L["attn_norm"].append(A(f"{pre}.input_layernorm.weight"))
        L["mlp_norm"].append(A(f"{pre}.post_attention_layernorm.weight"))
        L["wqkv"].append(np.concatenate(
            [A(f"{pre}.self_attn.{p}_proj.weight").T
             for p in ("q", "k", "v")], axis=1))
        L["wo"].append(A(f"{pre}.self_attn.o_proj.weight").T)
        L["w_gu"].append(np.concatenate(
            [A(f"{pre}.mlp.gate_proj.weight").T,
             A(f"{pre}.mlp.up_proj.weight").T], axis=1))
        L["w_down"].append(A(f"{pre}.mlp.down_proj.weight").T)

    params = {
        "tok_emb": jnp.asarray(emb, dtype),
        "layers": {k: jnp.asarray(np.stack(v), dtype)
                   for k, v in L.items()},
        "out_norm": jnp.asarray(A("model.norm.weight"), dtype),
        "lm_head": jnp.asarray(
            (A("lm_head.weight").T if "lm_head.weight" in state
             else np.ascontiguousarray(emb.T)), dtype),
    }
    return params, cfg


def olmo2_from_hf(
    state: Dict[str, Any],
    *,
    max_seq: int = 4096,
    norm_eps: float = 1e-6,
    rope_theta: float = 500000.0,
    dtype=jnp.bfloat16,
) -> tuple:
    """Convert a transformers OLMo-2 state dict to (params, cfg).

    OLMo-2's two deltas vs Llama (transformers modeling_olmo2.py):
    post-norm-only placement — attention and MLP consume the residual
    stream RAW, with RMSNorms on the branch outputs before the residual
    adds (``pre_norms=False`` + ``post_norms=True``; the layers carry
    only attn_post_norm/mlp_post_norm) — and Q/K RMSNorm over the WHOLE
    projection (``self_attn.{q,k}_norm`` of size H*Dh, applied before
    the head reshape and before rope; ``qk_norm_full``). head_dim is
    read off q_norm vs q_proj shapes."""
    A = lambda k: np.asarray(state[k], np.float32)  # noqa: E731

    emb = A("model.embed_tokens.weight")
    vocab, dim = emb.shape
    n_layers = len({k.split(".")[2] for k in state
                    if k.startswith("model.layers.")})
    q0 = A("model.layers.0.self_attn.q_proj.weight")
    k0 = A("model.layers.0.self_attn.k_proj.weight")
    hidden = A("model.layers.0.mlp.gate_proj.weight").shape[0]
    # q_norm is (H*Dh,) == q_proj rows; heads resolve from the k/q row
    # ratio at the Llama-default head_dim = dim // n_heads, with
    # n_heads = q_rows // head_dim. OLMo-2 keeps q_proj square
    # (H*Dh == D) so head_dim = dim^2 / (q_rows * ?) — published sizes
    # all use MHA with head_dim 128 (7B: 4096/32) or 40 heads (13B:
    # 5120/40 = 128); derive as dim // 128 heads unless that fails.
    hd = 128 if q0.shape[0] % 128 == 0 else q0.shape[0] // 16
    n_heads = q0.shape[0] // hd
    n_kv = k0.shape[0] // hd

    cfg = llm_model.LLMConfig(
        vocab_size=vocab, dim=dim, n_layers=n_layers, n_heads=n_heads,
        n_kv_heads=n_kv, head_dim=hd, hidden_dim=hidden,
        norm_eps=norm_eps, rope_theta=rope_theta, max_seq=max_seq,
        sliding_window=max_seq, pre_norms=False, post_norms=True,
        qk_norm_full=True)

    L = {"wqkv": [], "wo": [], "w_gu": [], "w_down": [],
         "attn_post_norm": [], "mlp_post_norm": [],
         "q_norm": [], "k_norm": []}
    for i in range(n_layers):
        pre = f"model.layers.{i}"
        L["attn_post_norm"].append(
            A(f"{pre}.post_attention_layernorm.weight"))
        L["mlp_post_norm"].append(
            A(f"{pre}.post_feedforward_layernorm.weight"))
        L["q_norm"].append(A(f"{pre}.self_attn.q_norm.weight"))
        L["k_norm"].append(A(f"{pre}.self_attn.k_norm.weight"))
        L["wqkv"].append(np.concatenate(
            [A(f"{pre}.self_attn.{p}_proj.weight").T
             for p in ("q", "k", "v")], axis=1))
        L["wo"].append(A(f"{pre}.self_attn.o_proj.weight").T)
        L["w_gu"].append(np.concatenate(
            [A(f"{pre}.mlp.gate_proj.weight").T,
             A(f"{pre}.mlp.up_proj.weight").T], axis=1))
        L["w_down"].append(A(f"{pre}.mlp.down_proj.weight").T)

    params = {
        "tok_emb": jnp.asarray(emb, dtype),
        "layers": {k: jnp.asarray(np.stack(v), dtype)
                   for k, v in L.items()},
        "out_norm": jnp.asarray(A("model.norm.weight"), dtype),
        "lm_head": jnp.asarray(
            (A("lm_head.weight").T if "lm_head.weight" in state
             else np.ascontiguousarray(emb.T)), dtype),
    }
    return params, cfg


def qwen3_from_hf(
    state: Dict[str, Any],
    *,
    max_seq: int = 32768,
    norm_eps: float = 1e-6,
    rope_theta: float = 1e6,
    dtype=jnp.bfloat16,
) -> tuple:
    """Convert a transformers Qwen3 (dense) state dict to (params, cfg).

    Qwen3's attention delta vs Qwen2: the QKV biases are gone, replaced
    by per-head RMSNorm on Q and K over head_dim
    (``self_attn.{q,k}_norm.weight``), applied before rope — mapped to
    ``layers.q_norm/k_norm`` and cfg.qk_norm. head_dim is read off the
    q_norm weight (decoupled from dim//n_heads in several sizes)."""
    A = lambda k: np.asarray(state[k], np.float32)  # noqa: E731

    emb = A("model.embed_tokens.weight")
    vocab, dim = emb.shape
    n_layers = len({k.split(".")[2] for k in state
                    if k.startswith("model.layers.")})
    hd = A("model.layers.0.self_attn.q_norm.weight").shape[0]
    n_heads = A("model.layers.0.self_attn.q_proj.weight").shape[0] // hd
    n_kv = A("model.layers.0.self_attn.k_proj.weight").shape[0] // hd
    hidden = A("model.layers.0.mlp.gate_proj.weight").shape[0]

    cfg = llm_model.LLMConfig(
        vocab_size=vocab, dim=dim, n_layers=n_layers, n_heads=n_heads,
        n_kv_heads=n_kv, head_dim=hd, hidden_dim=hidden,
        norm_eps=norm_eps, rope_theta=rope_theta, max_seq=max_seq,
        sliding_window=max_seq, qk_norm=True)

    L = {"attn_norm": [], "wqkv": [], "wo": [], "mlp_norm": [],
         "w_gu": [], "w_down": [], "q_norm": [], "k_norm": []}
    for i in range(n_layers):
        pre = f"model.layers.{i}"
        L["attn_norm"].append(A(f"{pre}.input_layernorm.weight"))
        L["mlp_norm"].append(A(f"{pre}.post_attention_layernorm.weight"))
        L["wqkv"].append(np.concatenate(
            [A(f"{pre}.self_attn.{p}_proj.weight").T
             for p in ("q", "k", "v")], axis=1))
        L["wo"].append(A(f"{pre}.self_attn.o_proj.weight").T)
        L["q_norm"].append(A(f"{pre}.self_attn.q_norm.weight"))
        L["k_norm"].append(A(f"{pre}.self_attn.k_norm.weight"))
        L["w_gu"].append(np.concatenate(
            [A(f"{pre}.mlp.gate_proj.weight").T,
             A(f"{pre}.mlp.up_proj.weight").T], axis=1))
        L["w_down"].append(A(f"{pre}.mlp.down_proj.weight").T)

    params = {
        "tok_emb": jnp.asarray(emb, dtype),
        "layers": {k: jnp.asarray(np.stack(v), dtype)
                   for k, v in L.items()},
        "out_norm": jnp.asarray(A("model.norm.weight"), dtype),
        "lm_head": jnp.asarray(
            (A("lm_head.weight").T if "lm_head.weight" in state
             else np.ascontiguousarray(emb.T)), dtype),
    }
    return params, cfg


def qwen3_moe_from_hf(
    state: Dict[str, Any],
    *,
    max_seq: int = 32768,
    norm_eps: float = 1e-6,
    rope_theta: float = 1e6,
    n_experts_used: int = 8,
    norm_topk: bool = True,
    dtype=jnp.bfloat16,
) -> tuple:
    """Convert a transformers Qwen3-MoE state dict to (params, cfg).

    Qwen3-MoE = Qwen3 attention (QK-norm, no biases) + top-k routed
    experts with RENORMALIZED weights (norm_topk_prob=True) and NO
    shared expert — both reversals of Qwen2-MoE's choices."""
    A = lambda k: np.asarray(state[k], np.float32)  # noqa: E731

    emb = A("model.embed_tokens.weight")
    vocab, dim = emb.shape
    n_layers = len({k.split(".")[2] for k in state
                    if k.startswith("model.layers.")})
    hd = A("model.layers.0.self_attn.q_norm.weight").shape[0]
    n_heads = A("model.layers.0.self_attn.q_proj.weight").shape[0] // hd
    n_kv = A("model.layers.0.self_attn.k_proj.weight").shape[0] // hd
    hidden = A("model.layers.0.mlp.experts.0.gate_proj.weight").shape[0]
    n_experts = len({k.split(".")[5] for k in state
                     if ".mlp.experts." in k})

    cfg = llm_model.LLMConfig(
        vocab_size=vocab, dim=dim, n_layers=n_layers, n_heads=n_heads,
        n_kv_heads=n_kv, head_dim=hd, hidden_dim=hidden,
        norm_eps=norm_eps, rope_theta=rope_theta, max_seq=max_seq,
        sliding_window=max_seq, qk_norm=True, n_experts=n_experts,
        n_experts_used=n_experts_used, moe_norm_topk=norm_topk)

    L = {"attn_norm": [], "wqkv": [], "wo": [], "mlp_norm": [],
         "moe_gate": [], "w_gu": [], "w_down": [],
         "q_norm": [], "k_norm": []}
    for i in range(n_layers):
        pre = f"model.layers.{i}"
        L["attn_norm"].append(A(f"{pre}.input_layernorm.weight"))
        L["mlp_norm"].append(A(f"{pre}.post_attention_layernorm.weight"))
        L["wqkv"].append(np.concatenate(
            [A(f"{pre}.self_attn.{p}_proj.weight").T
             for p in ("q", "k", "v")], axis=1))
        L["wo"].append(A(f"{pre}.self_attn.o_proj.weight").T)
        L["q_norm"].append(A(f"{pre}.self_attn.q_norm.weight"))
        L["k_norm"].append(A(f"{pre}.self_attn.k_norm.weight"))
        L["moe_gate"].append(A(f"{pre}.mlp.gate.weight").T)
        gus, downs = [], []
        for e in range(n_experts):
            ep = f"{pre}.mlp.experts.{e}"
            gus.append(np.concatenate([A(f"{ep}.gate_proj.weight").T,
                                       A(f"{ep}.up_proj.weight").T],
                                      axis=1))
            downs.append(A(f"{ep}.down_proj.weight").T)
        L["w_gu"].append(np.stack(gus))
        L["w_down"].append(np.stack(downs))

    params = {
        "tok_emb": jnp.asarray(emb, dtype),
        "layers": {k: jnp.asarray(np.stack(v), dtype)
                   for k, v in L.items()},
        "out_norm": jnp.asarray(A("model.norm.weight"), dtype),
        "lm_head": jnp.asarray(
            (A("lm_head.weight").T if "lm_head.weight" in state
             else np.ascontiguousarray(emb.T)), dtype),
    }
    return params, cfg


def deepseek_v2_from_hf(
    state: Dict[str, Any],
    *,
    max_seq: int = 8192,
    norm_eps: float = 1e-6,
    rope_theta: float = 10000.0,
    n_experts_used: int = 6,
    norm_topk: bool = False,
    routed_scale: float = 1.0,
    n_groups: int = 1,
    topk_groups: int = 1,
    qk_nope_head_dim: int = 128,
    qk_rope_head_dim: int = 64,
    score_func: str = "softmax",
    group_score: str = "max",
    yarn_factor: float = 0.0,
    yarn_original_max_seq: int = 0,
    dtype=jnp.bfloat16,
) -> tuple:
    """Convert a transformers DeepSeek-V2 state dict to
    (params, MLAConfig) for :mod:`models.mla`.

    Covers both the V2-Lite shape (full ``q_proj``) and the V2 shape
    (``q_a_proj``/``q_b_proj`` LoRA query with its own RMSNorm), dense
    first-k layers, routed + shared experts. No weight permutation is
    needed: models/mla.py uses the same adjacent-pair rope convention
    as transformers' DeepseekV2 (parity ref: llama.cpp's ``deepseek2``
    arch, which the reference loads via tk_model_loader.c:296)."""
    from trackiellm_tpu.models import mla as mla_model

    A = lambda k: np.asarray(state[k], np.float32)  # noqa: E731

    emb = A("model.embed_tokens.weight")
    vocab, dim = emb.shape
    n_layers = len({k.split(".")[2] for k in state
                    if k.startswith("model.layers.")})
    kv_a = A("model.layers.0.self_attn.kv_a_proj_with_mqa.weight")
    r = A("model.layers.0.self_attn.kv_a_layernorm.weight").shape[0]
    rope = kv_a.shape[0] - r
    if rope != qk_rope_head_dim:
        raise TrackieError(
            ErrorCode.MODEL_METADATA_INVALID,
            f"kv_a_proj implies qk_rope_head_dim={rope}, "
            f"got {qk_rope_head_dim}")
    q_lora = ("model.layers.0.self_attn.q_a_proj.weight" in state)
    q_out = A("model.layers.0.self_attn."
              + ("q_b_proj" if q_lora else "q_proj")
              + ".weight").shape[0]
    qk_head = qk_nope_head_dim + qk_rope_head_dim
    n_heads = q_out // qk_head
    kv_b_out = A("model.layers.0.self_attn.kv_b_proj.weight").shape[0]
    v_head = kv_b_out // n_heads - qk_nope_head_dim
    dense_idx = [i for i in range(n_layers)
                 if f"model.layers.{i}.mlp.gate_proj.weight" in state]
    first_k = len(dense_idx)
    if dense_idx != list(range(first_k)):
        raise TrackieError(ErrorCode.MODEL_METADATA_INVALID,
                           f"non-prefix dense layers {dense_idx}")
    n_experts = len({k.split(".")[5] for k in state
                     if ".mlp.experts." in k})
    moe_hidden = (A(f"model.layers.{first_k}.mlp.experts.0."
                    "gate_proj.weight").shape[0] if n_experts else 0)
    shared_key = f"model.layers.{first_k}.mlp.shared_experts.gate_proj.weight"
    shared_hidden = A(shared_key).shape[0] if shared_key in state else 0
    hidden = (A("model.layers.0.mlp.gate_proj.weight").shape[0]
              if first_k else moe_hidden)

    cfg = mla_model.MLAConfig(
        vocab_size=vocab, dim=dim, n_layers=n_layers, n_heads=n_heads,
        hidden_dim=hidden,
        q_lora_rank=(A("model.layers.0.self_attn.q_a_proj.weight")
                     .shape[0] if q_lora else 0),
        kv_lora_rank=r, qk_nope_head_dim=qk_nope_head_dim,
        qk_rope_head_dim=qk_rope_head_dim, v_head_dim=v_head,
        n_experts=n_experts, n_experts_used=n_experts_used,
        moe_hidden_dim=moe_hidden, moe_norm_topk=norm_topk,
        moe_shared_hidden=shared_hidden, moe_routed_scale=routed_scale,
        moe_n_groups=n_groups, moe_topk_groups=topk_groups,
        moe_score_func=score_func, moe_group_score=group_score,
        first_k_dense=first_k if n_experts else n_layers,
        norm_eps=norm_eps, rope_theta=rope_theta, max_seq=max_seq)

    attn = {"attn_norm": [], "mlp_norm": [], "wkv_a": [],
            "kv_a_norm": [], "wkv_b": [], "wo": []}
    if q_lora:
        attn.update(wq_a=[], q_a_norm=[], wq_b=[])
    else:
        attn.update(wq=[])
    dense_mlp = {"w_gu": [], "w_down": []}
    moe_mlp = {"moe_gate": [], "w_gu": [], "w_down": []}
    bias_key = (f"model.layers.{first_k}.mlp.gate."
                "e_score_correction_bias")
    if bias_key in state:
        moe_mlp["moe_gate_bias"] = []
    if shared_hidden:
        moe_mlp.update(shared_gu=[], shared_down=[])
    for i in range(n_layers):
        pre = f"model.layers.{i}"
        sa = f"{pre}.self_attn"
        attn["attn_norm"].append(A(f"{pre}.input_layernorm.weight"))
        attn["mlp_norm"].append(
            A(f"{pre}.post_attention_layernorm.weight"))
        attn["wkv_a"].append(A(f"{sa}.kv_a_proj_with_mqa.weight").T)
        attn["kv_a_norm"].append(A(f"{sa}.kv_a_layernorm.weight"))
        attn["wkv_b"].append(A(f"{sa}.kv_b_proj.weight").T)
        attn["wo"].append(A(f"{sa}.o_proj.weight").T)
        if q_lora:
            attn["wq_a"].append(A(f"{sa}.q_a_proj.weight").T)
            attn["q_a_norm"].append(A(f"{sa}.q_a_layernorm.weight"))
            attn["wq_b"].append(A(f"{sa}.q_b_proj.weight").T)
        else:
            attn["wq"].append(A(f"{sa}.q_proj.weight").T)
        if i < cfg.first_k_dense or not n_experts:
            dense_mlp["w_gu"].append(np.concatenate(
                [A(f"{pre}.mlp.gate_proj.weight").T,
                 A(f"{pre}.mlp.up_proj.weight").T], axis=1))
            dense_mlp["w_down"].append(A(f"{pre}.mlp.down_proj.weight").T)
        else:
            moe_mlp["moe_gate"].append(A(f"{pre}.mlp.gate.weight").T)
            if "moe_gate_bias" in moe_mlp:
                moe_mlp["moe_gate_bias"].append(
                    A(f"{pre}.mlp.gate.e_score_correction_bias"))
            gus, downs = [], []
            for e in range(n_experts):
                ep = f"{pre}.mlp.experts.{e}"
                gus.append(np.concatenate(
                    [A(f"{ep}.gate_proj.weight").T,
                     A(f"{ep}.up_proj.weight").T], axis=1))
                downs.append(A(f"{ep}.down_proj.weight").T)
            moe_mlp["w_gu"].append(np.stack(gus))
            moe_mlp["w_down"].append(np.stack(downs))
            if shared_hidden:
                sp = f"{pre}.mlp.shared_experts"
                moe_mlp["shared_gu"].append(np.concatenate(
                    [A(f"{sp}.gate_proj.weight").T,
                     A(f"{sp}.up_proj.weight").T], axis=1))
                moe_mlp["shared_down"].append(
                    A(f"{sp}.down_proj.weight").T)

    def stack(d):
        return {k: jnp.asarray(np.stack(v), dtype)
                for k, v in d.items() if v}

    params = {
        "tok_emb": jnp.asarray(emb, dtype),
        "attn": stack(attn),
        "dense_mlp": stack(dense_mlp),
        "moe_mlp": stack(moe_mlp),
        "out_norm": jnp.asarray(A("model.norm.weight"), dtype),
        "lm_head": jnp.asarray(
            (A("lm_head.weight").T if "lm_head.weight" in state
             else np.ascontiguousarray(emb.T)), dtype),
    }
    if yarn_factor > 1.0:
        # DeepSeek long-context yarn (published configs carry
        # mscale == mscale_all_dim -> attention factor exactly 1.0,
        # see mla.yarn_rope_factors).
        params["rope_factors"] = mla_model.yarn_rope_factors(
            cfg, yarn_factor, yarn_original_max_seq)
    return params, cfg


def deepseek_v3_from_hf(
    state: Dict[str, Any],
    *,
    n_experts_used: int = 8,
    routed_scale: float = 2.5,
    n_groups: int = 8,
    topk_groups: int = 4,
    **kw,
) -> tuple:
    """Convert a transformers DeepSeek-V3/R1 state dict.

    Attention is V2's MLA unchanged (rope_interleave=True checkpoints:
    HF de-interleaves then split-half-rotates, which is
    score-equivalent to models/mla.py's adjacent-pair rotation — both
    sides of the q.k dot carry the same permutation and V is never
    roped). Routing deltas vs V2: sigmoid scores, top-2-sum group
    scores, renormalized weights, and the aux-loss-free selection bias
    (``mlp.gate.e_score_correction_bias`` -> moe_mlp.moe_gate_bias,
    selection-only)."""
    kw.setdefault("norm_topk", True)
    return deepseek_v2_from_hf(
        state, n_experts_used=n_experts_used, routed_scale=routed_scale,
        n_groups=n_groups, topk_groups=topk_groups,
        score_func="sigmoid", group_score="top2sum", **kw)


def _neox_to_interleaved_cols(w: np.ndarray, start: int,
                              rope: int) -> np.ndarray:
    """Re-order ``rope`` columns of ``w`` (starting at ``start``) from
    neox half-split order [x0..x_{R/2-1} | y0..y_{R/2-1}] to the
    adjacent-pair order [x0,y0,x1,y1,...] models/mla.py rotates."""
    half = rope // 2
    perm = np.empty(rope, np.int64)
    perm[0::2] = np.arange(half)
    perm[1::2] = np.arange(half) + half
    w = w.copy()
    w[..., start:start + rope] = w[..., start:start + rope][..., perm]
    return w


def mla_config_from_gguf(gguf: GGUFFile) -> "Any":
    """MLAConfig from llama.cpp ``deepseek2`` GGUF metadata.

    Shape-derivable fields prefer tensor shapes over metadata (the
    same stance config_from_gguf takes for qkv_bias/qk_norm), so the
    reader stays correct even if a key string drifts between llama.cpp
    versions."""
    from trackiellm_tpu.models import mla as mla_model

    md = gguf.metadata
    arch = "deepseek2"

    def key(suffix: str, default=None):
        v = md.get(f"{arch}.{suffix}", default)
        if v is None:
            raise TrackieError(ErrorCode.MODEL_METADATA_INVALID,
                               f"missing GGUF key {arch}.{suffix}")
        return v

    t = gguf.tensors
    dim = int(key("embedding_length"))
    n_heads = int(key("attention.head_count"))
    n_layers = int(key("block_count"))
    r = t["blk.0.attn_kv_a_norm.weight"].shape[0]
    # GGUF stores (out, in) row-major: kv_a_mqa's out rows = r + rope.
    rope = t["blk.0.attn_kv_a_mqa.weight"].shape[0] - r
    qk_head = int(md.get(f"{arch}.attention.key_length", 0))
    nope = (qk_head - rope) if qk_head else 0
    q_lora = ("blk.0.attn_q_a.weight" in t)
    if not nope:
        q_out = t["blk.0." + ("attn_q_b" if q_lora else "attn_q")
                  + ".weight"].shape[0]
        nope = q_out // n_heads - rope
    v_head = int(md.get(f"{arch}.attention.value_length", 0))
    if not v_head and "blk.0.attn_kv_b.weight" in t:
        v_head = t["blk.0.attn_kv_b.weight"].shape[0] // n_heads - nope
    if not v_head and "blk.0.attn_v_b.weight" in t:
        shp = t["blk.0.attn_v_b.weight"].shape
        v_head = int(np.prod(shp)) // (n_heads * r)
    n_experts = int(md.get(f"{arch}.expert_count", 0))
    first_k = int(md.get(f"{arch}.leading_dense_block_count", -1))
    if first_k < 0:  # derive: dense layers carry plain ffn_gate
        first_k = sum(1 for i in range(n_layers)
                      if f"blk.{i}.ffn_gate.weight" in t)
    shex = "blk.%d.ffn_gate_shexp.weight" % (first_k if n_experts else 0)
    shared_hidden = t[shex].shape[0] if shex in t else 0
    hidden = (t["blk.0.ffn_gate.weight"].shape[0]
              if "blk.0.ffn_gate.weight" in t
              else int(key("feed_forward_length")))
    # V3 routing deltas ride metadata: expert_gating_func (1=softmax,
    # 2=sigmoid — llama.cpp LLAMA_EXPERT_GATING_FUNC_*), weight norm,
    # and group-limited selection counts.
    gating = int(_math_key(
        md, f"{arch}.expert_gating_func", 1,
        "V2 family default: softmax routing"))
    score = "sigmoid" if gating == 2 else "softmax"
    n_groups = int(md.get(f"{arch}.expert_group_count", 1) or 1)
    topk_groups = int(md.get(f"{arch}.expert_group_used_count", 1) or 1)
    return mla_model.MLAConfig(
        vocab_size=int(md.get("tokenizer.ggml.tokens_count",
                              md.get(f"{arch}.vocab_size",
                                     t["token_embd.weight"].shape[0]))),
        dim=dim, n_layers=n_layers, n_heads=n_heads, hidden_dim=hidden,
        q_lora_rank=(t["blk.0.attn_q_a.weight"].shape[0]
                     if q_lora else 0),
        kv_lora_rank=r, qk_nope_head_dim=nope, qk_rope_head_dim=rope,
        v_head_dim=v_head,
        n_experts=n_experts,
        n_experts_used=int(md.get(f"{arch}.expert_used_count", 6)),
        moe_hidden_dim=int(md.get(f"{arch}.expert_feed_forward_length",
                                  0)),
        moe_norm_topk=bool(md.get(f"{arch}.expert_weights_norm", False)),
        moe_shared_hidden=shared_hidden,
        moe_routed_scale=float(md.get(f"{arch}.expert_weights_scale",
                                      1.0)),
        moe_n_groups=n_groups, moe_topk_groups=topk_groups,
        moe_score_func=score,
        moe_group_score="top2sum" if score == "sigmoid" else "max",
        first_k_dense=first_k if n_experts else n_layers,
        norm_eps=float(key("attention.layer_norm_rms_epsilon", 1e-6)),
        rope_theta=float(key("rope.freq_base", 10000.0)),
        max_seq=int(key("context_length", 4096)))


def gguf_to_mla_params(
    path: str,
    bits: Optional[int] = None,
    group: int = 64,
    dtype=jnp.bfloat16,
    max_layers: Optional[int] = None,
    neox_rope: Optional[bool] = None,
) -> tuple:
    """Convert a llama.cpp ``deepseek2`` GGUF to (params, MLAConfig)
    for :mod:`models.mla` (parity ref: the reference loads DeepSeek
    GGUFs through llama.cpp, tk_model_loader.c:199).

    ``neox_rope``: llama.cpp's convert_hf_to_gguf re-orders the rope
    sub-dimensions of ``q(_b)`` and ``kv_a_mqa`` from the HF
    checkpoint's adjacent-pair layout to neox half-split order (ggml
    applies NEOX rope to deepseek2); models/mla.py rotates adjacent
    pairs, so those columns are permuted back on ingest. Default True;
    set False (or TRACKIE_DEEPSEEK2_GGUF_ROPE=interleaved) for GGUFs
    written pair-ordered — this is the one deepseek2 convention that
    cannot be validated without a real GGUF in a zero-egress round, so
    it is a flag, not a constant.

    Handles both kv_b layouts in the wild: a single ``attn_kv_b``
    tensor, or the MLA-split ``attn_k_b``/``attn_v_b`` pair (newer
    llama.cpp), which is re-fused here (orientation disambiguated
    against kv_lora_rank).

    ``bits``: 4/8 quantizes via mla.quantize_params (wkv_b stays
    high-precision for the absorbed decode reshape)."""
    import os

    from trackiellm_tpu.models import mla as mla_model

    if neox_rope is None:
        env = os.environ.get("TRACKIE_DEEPSEEK2_GGUF_ROPE", "neox")
        neox_rope = env != "interleaved"
    gguf = read_gguf_header(path)
    if (gguf.architecture or "") != "deepseek2":
        raise TrackieError(ErrorCode.MODEL_METADATA_INVALID,
                           f"not a deepseek2 GGUF: {gguf.architecture}")
    cfg = mla_config_from_gguf(gguf)
    if max_layers is not None:
        n = min(cfg.n_layers, max_layers)
        cfg = cfg._replace(n_layers=n,
                           first_k_dense=min(cfg.first_k_dense, n))

    def mat(name: str) -> np.ndarray:
        return np.ascontiguousarray(load_gguf_tensor(gguf, name).T)

    def vec(name: str) -> np.ndarray:
        return load_gguf_tensor(gguf, name)

    h, r = cfg.n_heads, cfg.kv_lora_rank
    nope, rope, vd = (cfg.qk_nope_head_dim, cfg.qk_rope_head_dim,
                      cfg.v_head_dim)

    def fix_q_rope(w: np.ndarray) -> np.ndarray:
        """Per-head rope columns of a (in, h*qk_head) q projection."""
        if not neox_rope:
            return w
        for head in range(h):
            w = _neox_to_interleaved_cols(
                w, head * cfg.qk_head_dim + nope, rope)
        return w

    def kv_b_for(i: int) -> np.ndarray:
        name = f"blk.{i}.attn_kv_b.weight"
        if name in gguf.tensors:
            return mat(name)  # (r, h*(nope+vd))
        # MLA-split pair: re-fuse per head as [nope rows; vd rows].
        kb = load_gguf_tensor(gguf, f"blk.{i}.attn_k_b.weight")
        vb = load_gguf_tensor(gguf, f"blk.{i}.attn_v_b.weight")

        def as3(x: np.ndarray, per: int) -> np.ndarray:
            """-> (h, r, per) regardless of stored orientation."""
            x = x.reshape(h, -1) if x.ndim == 1 else x
            if x.ndim == 2:  # (h*per, r) or (r, h*per)
                if x.shape == (h * per, r):
                    return x.reshape(h, per, r).transpose(0, 2, 1)
                if x.shape == (r, h * per):
                    return x.reshape(r, h, per).transpose(1, 0, 2)
            elif x.ndim == 3:  # (h, per, r) or (h, r, per)
                if x.shape == (h, per, r):
                    return x.transpose(0, 2, 1)
                if x.shape == (h, r, per):
                    return x
            raise TrackieError(
                ErrorCode.MODEL_METADATA_INVALID,
                f"cannot orient MLA split tensor of shape {x.shape} "
                f"(h={h}, r={r}, per={per})")

        fused = np.concatenate([as3(kb, nope), as3(vb, vd)], axis=2)
        return np.ascontiguousarray(
            fused.transpose(1, 0, 2).reshape(r, h * (nope + vd)))

    attn = {"attn_norm": [], "mlp_norm": [], "wkv_a": [],
            "kv_a_norm": [], "wkv_b": [], "wo": []}
    if cfg.q_lora_rank:
        attn.update(wq_a=[], q_a_norm=[], wq_b=[])
    else:
        attn.update(wq=[])
    dense_mlp = {"w_gu": [], "w_down": []}
    moe_mlp = {"moe_gate": [], "w_gu": [], "w_down": []}
    if cfg.moe_shared_hidden:
        moe_mlp.update(shared_gu=[], shared_down=[])
    bias_name = f"blk.{cfg.first_k_dense}.exp_probs_b.bias"
    if cfg.n_experts and bias_name in gguf.tensors:
        moe_mlp["moe_gate_bias"] = []
    for i in range(cfg.n_layers):
        p = f"blk.{i}"
        attn["attn_norm"].append(vec(f"{p}.attn_norm.weight"))
        attn["mlp_norm"].append(vec(f"{p}.ffn_norm.weight"))
        kv_a = mat(f"{p}.attn_kv_a_mqa.weight")  # (d, r+rope)
        if neox_rope:
            kv_a = _neox_to_interleaved_cols(kv_a, r, rope)
        attn["wkv_a"].append(kv_a)
        attn["kv_a_norm"].append(vec(f"{p}.attn_kv_a_norm.weight"))
        attn["wkv_b"].append(kv_b_for(i))
        attn["wo"].append(mat(f"{p}.attn_output.weight"))
        if cfg.q_lora_rank:
            attn["wq_a"].append(mat(f"{p}.attn_q_a.weight"))
            attn["q_a_norm"].append(vec(f"{p}.attn_q_a_norm.weight"))
            attn["wq_b"].append(fix_q_rope(mat(f"{p}.attn_q_b.weight")))
        else:
            attn["wq"].append(fix_q_rope(mat(f"{p}.attn_q.weight")))
        if i < cfg.first_k_dense or not cfg.n_experts:
            dense_mlp["w_gu"].append(np.concatenate(
                [mat(f"{p}.ffn_gate.weight"),
                 mat(f"{p}.ffn_up.weight")], axis=1))
            dense_mlp["w_down"].append(mat(f"{p}.ffn_down.weight"))
        else:
            moe_mlp["moe_gate"].append(
                load_gguf_tensor(gguf, f"{p}.ffn_gate_inp.weight").T)
            if "moe_gate_bias" in moe_mlp:
                moe_mlp["moe_gate_bias"].append(
                    vec(f"{p}.exp_probs_b.bias"))
            g = load_gguf_tensor(gguf, f"{p}.ffn_gate_exps.weight")
            u = load_gguf_tensor(gguf, f"{p}.ffn_up_exps.weight")
            dn = load_gguf_tensor(gguf, f"{p}.ffn_down_exps.weight")
            moe_mlp["w_gu"].append(np.concatenate(
                [g.transpose(0, 2, 1), u.transpose(0, 2, 1)], axis=2))
            moe_mlp["w_down"].append(
                np.ascontiguousarray(dn.transpose(0, 2, 1)))
            if cfg.moe_shared_hidden:
                moe_mlp["shared_gu"].append(np.concatenate(
                    [mat(f"{p}.ffn_gate_shexp.weight"),
                     mat(f"{p}.ffn_up_shexp.weight")], axis=1))
                moe_mlp["shared_down"].append(
                    mat(f"{p}.ffn_down_shexp.weight"))
        log.info("converted MLA layer %d/%d", i + 1, cfg.n_layers)

    def stack(d):
        return {k: jnp.asarray(np.stack(v), dtype)
                for k, v in d.items() if v}

    tok_emb = load_gguf_tensor(gguf, "token_embd.weight")
    lm_head = (mat("output.weight") if "output.weight" in gguf.tensors
               else np.ascontiguousarray(tok_emb.T))
    params = {
        "tok_emb": jnp.asarray(tok_emb, dtype),
        "attn": stack(attn),
        "dense_mlp": stack(dense_mlp),
        "moe_mlp": stack(moe_mlp),
        "out_norm": jnp.asarray(vec("output_norm.weight"), dtype),
        "lm_head": jnp.asarray(lm_head, dtype),
    }
    md = gguf.metadata
    stype = str(md.get("deepseek2.rope.scaling.type", "") or "")
    sfactor = float(md.get("deepseek2.rope.scaling.factor", 0.0) or 0.0)
    if stype == "yarn" and sfactor > 1.0:
        orig = int(md.get(
            "deepseek2.rope.scaling.original_context_length", 0))
        params["rope_factors"] = mla_model.yarn_rope_factors(
            cfg, sfactor, orig)
        # llama.cpp GGUFs carry 0.1 * mscale_all_dim as
        # yarn_log_multiplier; every published DeepSeek config has
        # mscale == mscale_all_dim, where the NET attention factor is
        # exactly 1.0 (the transformers-oracle-validated HF path,
        # mla.yarn_rope_factors docstring) — so the key is deliberately
        # NOT applied here, keeping both ingestion paths of the same
        # checkpoint identical. cfg.attn_scale_mult remains the hook
        # should a non-equal-mscale checkpoint ever appear.
    if bits is not None:
        params = mla_model.quantize_params(params, bits=bits, group=group)
    return params, cfg


def gpt_oss_from_hf(
    state: Dict[str, Any],
    *,
    head_dim: int = 64,
    max_seq: int = 131072,
    sliding_window: int = 128,
    norm_eps: float = 1e-5,
    rope_theta: float = 150000.0,
    n_experts_used: int = 4,
    rope_scaling_factor: float = 32.0,
    rope_original_max_seq: int = 4096,
    dtype=jnp.bfloat16,
) -> tuple:
    """Convert a transformers gpt-oss state dict to (params, LLMConfig).

    gpt-oss (OpenAI's 2025 open-weight MoE; the same checkpoint family
    llama.cpp ingests as arch ``gpt-oss`` for the reference's loader,
    src/ai_models/tk_model_loader.c:199) deltas handled here:

    - ``self_attn.sinks`` (H,) -> layers.attn_sink (kept f32);
    - biases on all four attention projections (q/k/v fuse into
      wqkv_bias, o -> wo_bias);
    - expert banks stored as parameters in OUR orientation already —
      ``mlp.experts.gate_up_proj`` is (E, D, 2I) — but with gate/up
      INTERLEAVED (even columns gate, odd up; GptOssExperts); this
      de-interleaves into the framework's [gate | up] halves;
    - router ``mlp.router.{weight,bias}`` -> moe_gate/moe_gate_b with
      softmax-after-top-k combine (cfg.moe_score_func="softmax_topk");
    - non-truncated YaRN (factor 32 from a 4096 window) baked into
      params["rope_factors"] + cfg.rope_attention_factor; pass
      ``rope_scaling_factor=0`` for a no-scaling (test) checkpoint.
    """
    A = lambda k: np.asarray(state[k], np.float32)  # noqa: E731

    emb = A("model.embed_tokens.weight")
    vocab, dim = emb.shape
    n_layers = len({k.split(".")[2] for k in state
                    if k.startswith("model.layers.")})
    q0 = A("model.layers.0.self_attn.q_proj.weight")
    k0 = A("model.layers.0.self_attn.k_proj.weight")
    gup0 = A("model.layers.0.mlp.experts.gate_up_proj")
    n_experts, _, two_h = gup0.shape
    hidden = two_h // 2
    n_heads = q0.shape[0] // head_dim
    n_kv = k0.shape[0] // head_dim

    attn_factor = (llm_model.yarn_attention_factor(rope_scaling_factor)
                   if rope_scaling_factor > 1.0 else 1.0)
    cfg = llm_model.LLMConfig(
        vocab_size=vocab, dim=dim, n_layers=n_layers, n_heads=n_heads,
        n_kv_heads=n_kv, head_dim=head_dim, hidden_dim=hidden,
        norm_eps=norm_eps, rope_theta=rope_theta, max_seq=max_seq,
        sliding_window=sliding_window, alt_window=True,
        n_experts=n_experts, n_experts_used=n_experts_used,
        moe_score_func="softmax_topk", moe_norm_topk=False,
        moe_bias=True, attn_sinks=True, qkv_bias=True, out_bias=True,
        act="gptoss", rope_attention_factor=attn_factor)

    def deinterleave(gu):  # (..., 2I) even=gate / odd=up -> [gate | up]
        return np.concatenate([gu[..., 0::2], gu[..., 1::2]], axis=-1)

    L = {"attn_norm": [], "wqkv": [], "wqkv_bias": [], "wo": [],
         "wo_bias": [], "attn_sink": [], "mlp_norm": [], "moe_gate": [],
         "moe_gate_b": [], "w_gu": [], "w_gu_b": [], "w_down": [],
         "w_down_b": []}
    for i in range(n_layers):
        pre = f"model.layers.{i}"
        L["attn_norm"].append(jnp.asarray(
            A(f"{pre}.input_layernorm.weight"), dtype))
        L["mlp_norm"].append(jnp.asarray(
            A(f"{pre}.post_attention_layernorm.weight"), dtype))
        L["wqkv"].append(jnp.asarray(np.concatenate([
            A(f"{pre}.self_attn.q_proj.weight").T,
            A(f"{pre}.self_attn.k_proj.weight").T,
            A(f"{pre}.self_attn.v_proj.weight").T], axis=1), dtype))
        L["wqkv_bias"].append(jnp.asarray(np.concatenate([
            A(f"{pre}.self_attn.q_proj.bias"),
            A(f"{pre}.self_attn.k_proj.bias"),
            A(f"{pre}.self_attn.v_proj.bias")]), dtype))
        L["wo"].append(jnp.asarray(
            A(f"{pre}.self_attn.o_proj.weight").T, dtype))
        L["wo_bias"].append(jnp.asarray(
            A(f"{pre}.self_attn.o_proj.bias"), dtype))
        L["attn_sink"].append(jnp.asarray(
            A(f"{pre}.self_attn.sinks"), jnp.float32))
        L["moe_gate"].append(jnp.asarray(
            A(f"{pre}.mlp.router.weight").T, dtype))
        L["moe_gate_b"].append(jnp.asarray(
            A(f"{pre}.mlp.router.bias"), dtype))
        L["w_gu"].append(jnp.asarray(deinterleave(
            A(f"{pre}.mlp.experts.gate_up_proj")), dtype))
        L["w_gu_b"].append(jnp.asarray(deinterleave(
            A(f"{pre}.mlp.experts.gate_up_proj_bias")), dtype))
        L["w_down"].append(jnp.asarray(
            A(f"{pre}.mlp.experts.down_proj"), dtype))
        L["w_down_b"].append(jnp.asarray(
            A(f"{pre}.mlp.experts.down_proj_bias"), dtype))

    params = {
        "tok_emb": jnp.asarray(emb, dtype),
        "layers": {k: jnp.stack(v) for k, v in L.items()},
        "out_norm": jnp.asarray(A("model.norm.weight"), dtype),
        "lm_head": jnp.asarray(
            (A("lm_head.weight").T if "lm_head.weight" in state
             else np.ascontiguousarray(emb.T)), dtype),
    }
    if rope_scaling_factor > 1.0:
        params["rope_factors"] = llm_model.yarn_rope_factors(
            cfg, rope_scaling_factor, rope_original_max_seq,
            truncate=False)
    return params, cfg


# --- DPT-SwinV2 depth (transformers DPTForDepthEstimation) -----------------

def _conv2d_nb(state, key):
    """torch nn.Conv2d weight (no bias) -> {"w": HWIO, "b": None}."""
    w = np.asarray(state[key], np.float32)
    return {"w": jnp.asarray(w.transpose(2, 3, 1, 0)), "b": None}


def dpt_swinv2_config_from_torch(state: Dict[str, Any],
                                 image_size: int = 256,
                                 window_size: int = 16):
    """Derive a DPTSwinConfig from an HF DPTForDepthEstimation (swinv2
    backbone) state dict. ``window_size`` cannot be derived from the
    weights (the CPB MLP is size-independent and the coords table is a
    non-persistent buffer) — pass it from the checkpoint config
    (tiny_256: 16; base/large_384: 24)."""
    from trackiellm_tpu.models.dpt import DPTSwinConfig

    embed_dim = int(np.asarray(
        state["backbone.embeddings.patch_embeddings.projection.weight"]
    ).shape[0])
    patch = int(np.asarray(
        state["backbone.embeddings.patch_embeddings.projection.weight"]
    ).shape[2])
    depths, heads = [], []
    i = 0
    while (f"backbone.encoder.layers.{i}.blocks.0."
           "attention.self.logit_scale") in state:
        j = 0
        while (f"backbone.encoder.layers.{i}.blocks.{j}."
               "attention.self.logit_scale") in state:
            j += 1
        depths.append(j)
        heads.append(int(np.asarray(
            state[f"backbone.encoder.layers.{i}.blocks.0."
                  "attention.self.logit_scale"]).shape[0]))
        i += 1
    dim0 = embed_dim
    mid0 = int(np.asarray(
        state["backbone.encoder.layers.0.blocks.0."
              "intermediate.dense.weight"]).shape[0])
    fusion = int(np.asarray(state["neck.convs.0.weight"]).shape[0])
    return DPTSwinConfig(
        image_size=image_size, patch_size=patch, embed_dim=embed_dim,
        depths=tuple(depths), num_heads=tuple(heads),
        window_size=window_size, mlp_ratio=mid0 / dim0,
        fusion_hidden=fusion)


def dpt_swinv2_from_torch(state: Dict[str, Any], image_size: int = 256,
                          window_size: int = 16):
    """HF ``DPTForDepthEstimation`` (Swinv2 backbone — the class that
    loads Intel/dpt-swinv2-tiny-256 = MiDaS 3.1 dpt_swin2_tiny_256;
    reference model set src/cortex/tk_cortex_main.h:70-76) state dict
    -> (params, DPTSwinConfig) for models/dpt.dpt_forward.

    Name map (HF -> tree): backbone.embeddings.* -> patch_embed /
    embed_norm; backbone.encoder.layers.{i}.blocks.{j}.* -> stages[i]
    .blocks[j] (q/k/v/o, CPB MLP, logit_scale, post-norms, MLP);
    .downsample.* -> stages[i].merge; neck.convs.{i} -> neck_convs;
    neck.fusion_stage.layers.{i} -> fusion[i] (layer 0's unused
    residual_layer1 is skipped); head.head.{0,2,4} -> head1..3.
    """
    state = {k: v for k, v in state.items()}
    cfg = dpt_swinv2_config_from_torch(state, image_size, window_size)

    def ln(prefix):
        return {"g": jnp.asarray(np.asarray(state[f"{prefix}.weight"],
                                            np.float32)),
                "b": jnp.asarray(np.asarray(state[f"{prefix}.bias"],
                                            np.float32))}

    stages = []
    for i in range(len(cfg.depths)):
        blocks = []
        for j in range(cfg.depths[i]):
            pre = f"backbone.encoder.layers.{i}.blocks.{j}"
            att = f"{pre}.attention.self"
            q = _lin(state, f"{att}.query")
            v = _lin(state, f"{att}.value")
            kw = jnp.asarray(np.asarray(state[f"{att}.key.weight"],
                                        np.float32).T)
            o = _lin(state, f"{pre}.attention.output.dense")
            wi = _lin(state, f"{pre}.intermediate.dense")
            wp = _lin(state, f"{pre}.output.dense")
            cpb0 = _lin(state, f"{att}.continuous_position_bias_mlp.0")
            cpb1w = jnp.asarray(np.asarray(
                state[f"{att}.continuous_position_bias_mlp.2.weight"],
                np.float32).T)
            blocks.append({
                "wq": q["w"], "bq": q["b"], "wk": kw,
                "wv": v["w"], "bv": v["b"], "wo": o["w"], "bo": o["b"],
                "wi": wi["w"], "bi": wi["b"],
                "wp": wp["w"], "bp": wp["b"],
                "ln1": ln(f"{pre}.layernorm_before"),
                "ln2": ln(f"{pre}.layernorm_after"),
                "logit_scale": jnp.asarray(np.asarray(
                    state[f"{att}.logit_scale"], np.float32)),
                "cpb": {"w0": cpb0["w"], "b0": cpb0["b"], "w1": cpb1w},
            })
        stage: Dict[str, Any] = {"blocks": blocks}
        red = f"backbone.encoder.layers.{i}.downsample.reduction.weight"
        if red in state:
            stage["merge"] = {
                "w": jnp.asarray(np.asarray(state[red], np.float32).T),
                "norm": ln(f"backbone.encoder.layers.{i}"
                           ".downsample.norm"),
            }
        stages.append(stage)

    def rcu(prefix):
        return {"c1": _conv2d(state, f"{prefix}.convolution1"),
                "c2": _conv2d(state, f"{prefix}.convolution2")}

    fusion = []
    for i in range(len(cfg.depths)):
        pre = f"neck.fusion_stage.layers.{i}"
        p = {"rcu2": rcu(f"{pre}.residual_layer2"),
             "out": _conv2d(state, f"{pre}.projection")}
        if i > 0:  # layer 0 never receives a residual (oracle skips it)
            p["rcu1"] = rcu(f"{pre}.residual_layer1")
        fusion.append(p)

    params = {
        "patch_embed": _conv2d(
            state, "backbone.embeddings.patch_embeddings.projection"),
        "embed_norm": ln("backbone.embeddings.norm"),
        "stages": stages,
        "neck_convs": [_conv2d_nb(state, f"neck.convs.{i}.weight")
                       for i in range(len(cfg.depths))],
        "fusion": fusion,
        "head1": _conv2d(state, "head.head.0"),
        "head2": _conv2d(state, "head.head.2"),
        "head3": _conv2d(state, "head.head.4"),
    }
    return params, cfg


# --- BERT-family embedder (HF BertModel / llama.cpp bert GGUF) -------------

def bert_from_hf(state: Dict[str, Any], pooling: str = "mean"):
    """``transformers.BertModel`` state dict (optionally "bert."-
    prefixed, e.g. a BertForMaskedLM dump) -> (params, EmbedderConfig)
    for models/embedder. Covers the sentence-transformers zoo
    (all-MiniLM, BGE, GTE small/base — llama.cpp's `bert` arch,
    the `llama-embedding` model family)."""
    from trackiellm_tpu.models.embedder import EmbedderConfig

    if "bert.embeddings.word_embeddings.weight" in state:
        # BertForSequenceClassification/MaskedLM dump: strip the
        # "bert." prefix but keep the top-level classifier head (the
        # reranker score head).
        state = {(k[len("bert."):] if k.startswith("bert.") else k): v
                 for k, v in state.items()}

    def A(name):
        return np.asarray(state[name], np.float32)

    word = A("embeddings.word_embeddings.weight")
    pos = A("embeddings.position_embeddings.weight")
    typ = A("embeddings.token_type_embeddings.weight")
    n_layers = 0
    while f"encoder.layer.{n_layers}.attention.self.query.weight" in state:
        n_layers += 1
    hidden = word.shape[1]
    inter = int(A("encoder.layer.0.intermediate.dense.weight").shape[0])

    # Head count is not in the weights; every published BERT uses
    # hidden/64 heads (MiniLM 384/12 included) unless overridden.
    n_heads = max(1, hidden // 64)

    L: Dict[str, list] = {k: [] for k in (
        "wq", "bq", "wk", "bk", "wv", "bv", "wo", "bo",
        "attn_norm_g", "attn_norm_b", "wi", "bi", "wd", "bd",
        "out_norm_g", "out_norm_b")}
    for i in range(n_layers):
        pre = f"encoder.layer.{i}"
        for short, name in (("q", "attention.self.query"),
                            ("k", "attention.self.key"),
                            ("v", "attention.self.value")):
            L[f"w{short}"].append(A(f"{pre}.{name}.weight").T)
            L[f"b{short}"].append(A(f"{pre}.{name}.bias"))
        L["wo"].append(A(f"{pre}.attention.output.dense.weight").T)
        L["bo"].append(A(f"{pre}.attention.output.dense.bias"))
        L["attn_norm_g"].append(A(f"{pre}.attention.output.LayerNorm.weight"))
        L["attn_norm_b"].append(A(f"{pre}.attention.output.LayerNorm.bias"))
        L["wi"].append(A(f"{pre}.intermediate.dense.weight").T)
        L["bi"].append(A(f"{pre}.intermediate.dense.bias"))
        L["wd"].append(A(f"{pre}.output.dense.weight").T)
        L["bd"].append(A(f"{pre}.output.dense.bias"))
        L["out_norm_g"].append(A(f"{pre}.output.LayerNorm.weight"))
        L["out_norm_b"].append(A(f"{pre}.output.LayerNorm.bias"))

    cfg = EmbedderConfig(
        vocab_size=word.shape[0], hidden=hidden, n_layers=n_layers,
        n_heads=n_heads, intermediate=inter, max_pos=pos.shape[0],
        type_vocab=typ.shape[0], pooling=pooling)
    params = {
        "word_emb": jnp.asarray(word),
        "pos_emb": jnp.asarray(pos),
        "type_emb": jnp.asarray(typ),
        "emb_norm": {"g": jnp.asarray(A("embeddings.LayerNorm.weight")),
                     "b": jnp.asarray(A("embeddings.LayerNorm.bias"))},
        "layers": {k: jnp.asarray(np.stack(v)) for k, v in L.items()},
        "pooler": ({"w": jnp.asarray(A("pooler.dense.weight").T),
                    "b": jnp.asarray(A("pooler.dense.bias"))}
                   if "pooler.dense.weight" in state else
                   {"w": jnp.eye(hidden, dtype=jnp.float32),
                    "b": jnp.zeros((hidden,), jnp.float32)}),
    }
    if "classifier.weight" in state:
        # Reranker / sequence-classification head: scores come from
        # classifier(pooler(CLS)) — llama.cpp's cls.output.
        params["cls_out"] = {
            "w": jnp.asarray(A("classifier.weight").T),
            "b": jnp.asarray(A("classifier.bias"))}
    return params, cfg


def gguf_to_bert_params(path: str, pooling: Optional[str] = None):
    """llama.cpp ``bert``-architecture GGUF (all-MiniLM/BGE embedding
    checkpoints, `llama-embedding`) -> (params, EmbedderConfig,
    WordPieceTokenizer|None).

    Tensor names (llama.cpp constants): token_embd / token_types /
    position_embd / token_embd_norm, blk.{i}.attn_{q,k,v,output}(+bias),
    attn_output_norm, ffn_{up,down}(+bias), layer_output_norm.
    Pooling comes from ``{arch}.pooling_type`` (1=mean, 2=cls) unless
    overridden."""
    from trackiellm_tpu.models.embedder import EmbedderConfig

    gguf = read_gguf_header(path)
    md = gguf.metadata
    arch = gguf.architecture or "bert"

    def get(key, default=None):
        return md.get(f"{arch}.{key}", default)

    hidden = int(get("embedding_length"))
    n_layers = int(get("block_count"))
    n_heads = int(get("attention.head_count", max(1, hidden // 64)))
    inter = int(get("feed_forward_length"))
    eps = float(get("attention.layer_norm_epsilon", 1e-12))
    max_pos = int(get("context_length", 512))
    if pooling is None:
        pooling = {1: "mean", 2: "cls"}.get(
            int(md.get(f"{arch}.pooling_type", 1) or 1), "mean")

    def T(name):
        return np.asarray(load_gguf_tensor(gguf, name), np.float32)

    def opt(name, shape):
        try:
            return T(name)
        except Exception:
            return np.zeros(shape, np.float32)

    word = T("token_embd.weight")
    L: Dict[str, list] = {k: [] for k in (
        "wq", "bq", "wk", "bk", "wv", "bv", "wo", "bo",
        "attn_norm_g", "attn_norm_b", "wi", "bi", "wd", "bd",
        "out_norm_g", "out_norm_b")}
    for i in range(n_layers):
        pre = f"blk.{i}"
        for short, name in (("q", "attn_q"), ("k", "attn_k"),
                            ("v", "attn_v")):
            L[f"w{short}"].append(T(f"{pre}.{name}.weight").T)
            L[f"b{short}"].append(opt(f"{pre}.{name}.bias", (hidden,)))
        L["wo"].append(T(f"{pre}.attn_output.weight").T)
        L["bo"].append(opt(f"{pre}.attn_output.bias", (hidden,)))
        L["attn_norm_g"].append(T(f"{pre}.attn_output_norm.weight"))
        L["attn_norm_b"].append(T(f"{pre}.attn_output_norm.bias"))
        L["wi"].append(T(f"{pre}.ffn_up.weight").T)
        L["bi"].append(opt(f"{pre}.ffn_up.bias", (inter,)))
        L["wd"].append(T(f"{pre}.ffn_down.weight").T)
        L["bd"].append(opt(f"{pre}.ffn_down.bias", (hidden,)))
        L["out_norm_g"].append(T(f"{pre}.layer_output_norm.weight"))
        L["out_norm_b"].append(T(f"{pre}.layer_output_norm.bias"))

    typ = opt("token_types.weight", (2, hidden))
    cfg = EmbedderConfig(
        vocab_size=word.shape[0], hidden=hidden, n_layers=n_layers,
        n_heads=n_heads, intermediate=inter, max_pos=max_pos,
        type_vocab=typ.shape[0], eps=eps, pooling=pooling)
    params = {
        "word_emb": jnp.asarray(word),
        "pos_emb": jnp.asarray(T("position_embd.weight")),
        "type_emb": jnp.asarray(typ),
        "emb_norm": {"g": jnp.asarray(T("token_embd_norm.weight")),
                     "b": jnp.asarray(T("token_embd_norm.bias"))},
        "layers": {k: jnp.asarray(np.stack(v)) for k, v in L.items()},
        "pooler": {"w": jnp.eye(hidden, dtype=jnp.float32),
                   "b": jnp.zeros((hidden,), jnp.float32)},
    }
    try:  # reranker checkpoints: cls dense (tanh) + cls.output score
        pooler = {"w": jnp.asarray(T("cls.weight").T),
                  "b": jnp.asarray(T("cls.bias"))}
        cls_out = {"w": jnp.asarray(T("cls.output.weight").T),
                   "b": jnp.asarray(T("cls.output.bias"))}
        params["pooler"], params["cls_out"] = pooler, cls_out
    except Exception:
        pass  # plain embedding checkpoint: no rank head
    tokenizer = None
    if md.get("tokenizer.ggml.model") == "bert" and \
            md.get("tokenizer.ggml.tokens"):
        from trackiellm_tpu.llm.tokenizer import WordPieceTokenizer

        def mi(key, alt=None):
            v = md.get(key, md.get(alt) if alt else None)
            return None if v is None else int(v)

        tokenizer = WordPieceTokenizer(
            list(md["tokenizer.ggml.tokens"]),
            unk_id=mi("tokenizer.ggml.unknown_token_id"),
            cls_id=mi("tokenizer.ggml.cls_token_id",
                      "tokenizer.ggml.bos_token_id"),
            sep_id=mi("tokenizer.ggml.seperator_token_id",
                      "tokenizer.ggml.eos_token_id"),
            pad_id=mi("tokenizer.ggml.padding_token_id"))
    return params, cfg, tokenizer


# --- Granite (IBM granite-3.x — llama.cpp arch "granite") ------------------

def granite_from_hf(
    state: Dict[str, Any],
    *,
    embedding_multiplier: float = 12.0,
    residual_multiplier: float = 0.22,
    attention_multiplier: float = 0.0078125,
    logits_scaling: float = 16.0,
    max_seq: int = 8192,
    norm_eps: float = 1e-5,
    rope_theta: float = 1e7,
    head_dim: int = 0,
    dtype=jnp.bfloat16,
) -> tuple:
    """Convert a transformers GraniteForCausalLM state dict to
    (params, cfg).

    Granite is Llama-shaped plus four scalar multipliers (muP-style,
    configuration_granite.py; defaults = the published granite-3.x
    values). Three of them FOLD here, so the runtime stays generic:
    embedding_multiplier scales tok_emb (after the tied lm_head takes
    the unscaled copy), logits_scaling divides lm_head, and
    attention_multiplier becomes query_pre_attn_scalar =
    attention_multiplier**-2 (GraniteAttention uses it AS the score
    scale). Only residual_multiplier runs at inference (both branch
    outputs scale before their residual adds,
    GraniteDecoderLayer:288,294)."""
    A = lambda k: np.asarray(state[k], np.float32)  # noqa: E731

    emb = A("model.embed_tokens.weight")
    vocab, dim = emb.shape
    n_layers = len({k.split(".")[2] for k in state
                    if k.startswith("model.layers.")})
    q0 = A("model.layers.0.self_attn.q_proj.weight")
    k0 = A("model.layers.0.self_attn.k_proj.weight")
    hidden = A("model.layers.0.mlp.gate_proj.weight").shape[0]
    # Granite keeps the Llama convention (q_proj square, head_dim =
    # dim // n_heads), but head_dim isn't shape-derivable alone;
    # published sizes use 128 (8B) / 64 (2B): try those unless given.
    hd = head_dim
    if not hd:
        for hd in (128, 64, 8):
            if q0.shape[0] % hd == 0 and k0.shape[0] % hd == 0 \
                    and dim % hd == 0:
                break
    n_heads = q0.shape[0] // hd
    n_kv = k0.shape[0] // hd

    cfg = llm_model.LLMConfig(
        vocab_size=vocab, dim=dim, n_layers=n_layers, n_heads=n_heads,
        n_kv_heads=n_kv, head_dim=hd, hidden_dim=hidden,
        norm_eps=norm_eps, rope_theta=rope_theta, max_seq=max_seq,
        sliding_window=max_seq,
        residual_multiplier=residual_multiplier,
        query_pre_attn_scalar=float(attention_multiplier ** -2))

    L = {"attn_norm": [], "wqkv": [], "wo": [], "mlp_norm": [],
         "w_gu": [], "w_down": []}
    for i in range(n_layers):
        pre = f"model.layers.{i}"
        L["attn_norm"].append(A(f"{pre}.input_layernorm.weight"))
        L["mlp_norm"].append(A(f"{pre}.post_attention_layernorm.weight"))
        L["wqkv"].append(np.concatenate(
            [A(f"{pre}.self_attn.{p}_proj.weight").T
             for p in ("q", "k", "v")], axis=1))
        L["wo"].append(A(f"{pre}.self_attn.o_proj.weight").T)
        L["w_gu"].append(np.concatenate(
            [A(f"{pre}.mlp.gate_proj.weight").T,
             A(f"{pre}.mlp.up_proj.weight").T], axis=1))
        L["w_down"].append(A(f"{pre}.mlp.down_proj.weight").T)

    lm_head = (A("lm_head.weight").T if "lm_head.weight" in state
               else np.ascontiguousarray(emb.T))
    params = {
        "tok_emb": jnp.asarray(emb * embedding_multiplier, dtype),
        "layers": {k: jnp.asarray(np.stack(v), dtype)
                   for k, v in L.items()},
        "out_norm": jnp.asarray(A("model.norm.weight"), dtype),
        "lm_head": jnp.asarray(lm_head / logits_scaling, dtype),
    }
    return params, cfg


# --- GLM-4 (THUDM — llama.cpp arch "glm4") ----------------------------------

def _deinterleave_rope_cols(w: np.ndarray, n_heads: int, head_dim: int,
                            rotary_dim: int) -> np.ndarray:
    """Permute a q/k projection from GLM's INTERLEAVED rope layout
    (pairs (2i, 2i+1) rotate together) to this framework's split-half
    layout (pairs (i, R/2+i)). Applying the SAME permutation to q and
    k leaves attention scores untouched, so the fold is exact.

    ``w``: (in, H*hd) column-major projection (already transposed) or
    (H*hd,) bias."""
    shape = w.shape
    cols = w.reshape(shape[:-1] + (n_heads, head_dim))
    rot, rest = cols[..., :rotary_dim], cols[..., rotary_dim:]
    rot = np.concatenate([rot[..., 0::2], rot[..., 1::2]], axis=-1)
    return np.concatenate([rot, rest], axis=-1).reshape(shape)


def glm4_from_hf(
    state: Dict[str, Any],
    *,
    max_seq: int = 8192,
    norm_eps: float = 1e-5,
    rope_theta: float = 10000.0,
    partial_rotary_factor: float = 0.5,
    head_dim: int = 0,
    dtype=jnp.bfloat16,
) -> tuple:
    """Convert a transformers Glm4ForCausalLM state dict to
    (params, cfg).

    GLM-4's deltas over Llama: QKV biases, Gemma-2-style sandwich
    norms (post_self_attn_layernorm / post_mlp_layernorm on the branch
    outputs; post_attention_layernorm is the pre-MLP norm), fused
    gate_up, and a half-width INTERLEAVED rope
    (modeling_glm4.py rotate_half: pairs (0,1),(2,3),... on the first
    partial_rotary_factor*head_dim dims). The interleave folds here
    via _deinterleave_rope_cols; partial width rides
    cfg.partial_rotary_factor."""
    A = lambda k: np.asarray(state[k], np.float32)  # noqa: E731

    emb = A("model.embed_tokens.weight")
    vocab, dim = emb.shape
    n_layers = len({k.split(".")[2] for k in state
                    if k.startswith("model.layers.")})
    q0 = A("model.layers.0.self_attn.q_proj.weight")
    k0 = A("model.layers.0.self_attn.k_proj.weight")
    gu0 = A("model.layers.0.mlp.gate_up_proj.weight")
    hidden = gu0.shape[0] // 2
    hd = head_dim or 128
    n_heads = q0.shape[0] // hd
    n_kv = k0.shape[0] // hd
    rotary = int(hd * partial_rotary_factor)
    qkv_bias = "model.layers.0.self_attn.q_proj.bias" in state

    cfg = llm_model.LLMConfig(
        vocab_size=vocab, dim=dim, n_layers=n_layers, n_heads=n_heads,
        n_kv_heads=n_kv, head_dim=hd, hidden_dim=hidden,
        norm_eps=norm_eps, rope_theta=rope_theta, max_seq=max_seq,
        sliding_window=max_seq, qkv_bias=qkv_bias, post_norms=True,
        partial_rotary_factor=partial_rotary_factor)

    def deint(w, heads):
        return _deinterleave_rope_cols(w, heads, hd, rotary)

    L = {"attn_norm": [], "wqkv": [], "wo": [], "mlp_norm": [],
         "w_gu": [], "w_down": [], "attn_post_norm": [],
         "mlp_post_norm": []}
    if qkv_bias:
        L["wqkv_bias"] = []
    for i in range(n_layers):
        pre = f"model.layers.{i}"
        L["attn_norm"].append(A(f"{pre}.input_layernorm.weight"))
        # HF post_attention_layernorm is the PRE-MLP norm; the branch
        # post-norms are post_self_attn / post_mlp.
        L["mlp_norm"].append(
            A(f"{pre}.post_attention_layernorm.weight"))
        L["attn_post_norm"].append(
            A(f"{pre}.post_self_attn_layernorm.weight"))
        L["mlp_post_norm"].append(
            A(f"{pre}.post_mlp_layernorm.weight"))
        L["wqkv"].append(np.concatenate(
            [deint(A(f"{pre}.self_attn.q_proj.weight").T, n_heads),
             deint(A(f"{pre}.self_attn.k_proj.weight").T, n_kv),
             A(f"{pre}.self_attn.v_proj.weight").T], axis=1))
        if qkv_bias:
            L["wqkv_bias"].append(np.concatenate(
                [deint(A(f"{pre}.self_attn.q_proj.bias"), n_heads),
                 deint(A(f"{pre}.self_attn.k_proj.bias"), n_kv),
                 A(f"{pre}.self_attn.v_proj.bias")]))
        L["wo"].append(A(f"{pre}.self_attn.o_proj.weight").T)
        L["w_gu"].append(A(f"{pre}.mlp.gate_up_proj.weight").T)
        L["w_down"].append(A(f"{pre}.mlp.down_proj.weight").T)

    params = {
        "tok_emb": jnp.asarray(emb, dtype),
        "layers": {k: jnp.asarray(np.stack(v), dtype)
                   for k, v in L.items()},
        "out_norm": jnp.asarray(A("model.norm.weight"), dtype),
        "lm_head": jnp.asarray(
            (A("lm_head.weight").T if "lm_head.weight" in state
             else np.ascontiguousarray(emb.T)), dtype),
    }
    return params, cfg


# --- Llama-4 (Meta — Scout-class uniform-MoE text tower) --------------------

def llama4_from_hf(
    state: Dict[str, Any],
    *,
    max_seq: int = 8192,
    norm_eps: float = 1e-5,
    rope_theta: float = 500000.0,
    nope_pattern: int = 4,
    attn_chunk: int = 8192,
    attn_temp_tuning: bool = True,
    attn_temp_floor: float = 8192.0,
    attn_temp_scale: float = 0.1,
    qk_l2norm: bool = True,
    head_dim: int = 0,
    rope_scaling: Optional[Dict[str, Any]] = None,
    dtype=jnp.bfloat16,
) -> tuple:
    """Convert a transformers Llama4ForCausalLM (text) state dict to
    (params, cfg).

    Covers the Scout-class UNIFORM-MoE tower (every layer: sigmoid
    top-1 router scaling the expert INPUT + an ungated shared expert —
    Llama4TextMoe). Maverick's dense/MoE interleave
    (interleave_moe_layer_step=2) is rejected: the layer scan needs
    homogeneous stacks. The checkpoint's INTERLEAVED rope folds to
    split-half via _deinterleave_rope_cols (full head_dim — Llama-4
    rotates every dim; NoPE layers are permutation-invariant so the
    uniform fold is exact). Attention deltas ride cfg: nope_pattern,
    qk_l2norm (post-rope L2 on rope layers), attn_temp_tuning (NoPE
    query temperature), attn_chunk (chunked attention on rope layers).
    ``rope_scaling``: the config's llama3-style dict (rope_type
    "llama3") -> params["rope_factors"].
    """
    A = lambda k: np.asarray(state[k], np.float32)  # noqa: E731

    emb = A("model.embed_tokens.weight")
    vocab, dim = emb.shape
    n_layers = len({k.split(".")[2] for k in state
                    if k.startswith("model.layers.")})
    q0 = A("model.layers.0.self_attn.q_proj.weight")
    k0 = A("model.layers.0.self_attn.k_proj.weight")

    # Maverick interleaves dense and MoE layers
    # (interleave_moe_layer_step=2): detect per layer, derive the
    # pattern, and carry BOTH stacked MLP sets (zeros where a layer
    # doesn't use one) — the per-layer choice is a lax.cond in the
    # scan (cfg.moe_pattern).
    is_moe = [f"model.layers.{i}.feed_forward.experts.gate_up_proj"
              in state for i in range(n_layers)]
    if not any(is_moe):
        raise NotImplementedError(
            "all-dense Llama-4 checkpoints are not a published shape")
    moe_pattern = 0
    if not all(is_moe):
        step = is_moe.index(True) + 1
        want = [(i % step) == (step - 1) for i in range(n_layers)]
        if want != is_moe:
            raise NotImplementedError(
                f"irregular dense/MoE layout {is_moe} — only the "
                f"interleave_moe_layer_step pattern is supported")
        moe_pattern = step
    first_moe = is_moe.index(True)
    experts0 = np.asarray(
        state[f"model.layers.{first_moe}.feed_forward.experts"
              ".gate_up_proj"])
    n_experts, _, two_h = experts0.shape
    hidden = two_h // 2
    shared0 = A(f"model.layers.{first_moe}.feed_forward.shared_expert"
                ".gate_proj.weight")
    hidden_mlp = 0
    if moe_pattern:
        hidden_mlp = int(A("model.layers.0.feed_forward"
                           ".gate_proj.weight").shape[0])
    hd = head_dim or 128
    n_heads = q0.shape[0] // hd
    n_kv = k0.shape[0] // hd

    cfg = llm_model.LLMConfig(
        vocab_size=vocab, dim=dim, n_layers=n_layers, n_heads=n_heads,
        n_kv_heads=n_kv, head_dim=hd, hidden_dim=hidden,
        norm_eps=norm_eps, rope_theta=rope_theta, max_seq=max_seq,
        sliding_window=max_seq,
        n_experts=n_experts, n_experts_used=1,
        moe_score_func="sigmoid_topk", moe_norm_topk=False,
        moe_scale_input=True, moe_shared_hidden=shared0.shape[0],
        moe_shared_gated=False,
        nope_pattern=nope_pattern, qk_l2norm=qk_l2norm,
        attn_temp_tuning=attn_temp_tuning,
        attn_temp_floor=attn_temp_floor,
        attn_temp_scale=attn_temp_scale, attn_chunk=attn_chunk,
        moe_pattern=moe_pattern)

    def deint(w, heads):
        # Full-width interleaved rope -> split-half fold.
        return _deinterleave_rope_cols(w, heads, hd, hd)

    L = {"attn_norm": [], "wqkv": [], "wo": [], "mlp_norm": [],
         "w_gu": [], "w_down": [], "moe_gate": [],
         "shared_gu": [], "shared_down": []}
    if moe_pattern:
        L["w_gu_mlp"], L["w_down_mlp"] = [], []
    for i in range(n_layers):
        pre = f"model.layers.{i}"
        L["attn_norm"].append(A(f"{pre}.input_layernorm.weight"))
        L["mlp_norm"].append(A(f"{pre}.post_attention_layernorm.weight"))
        L["wqkv"].append(np.concatenate(
            [deint(A(f"{pre}.self_attn.q_proj.weight").T, n_heads),
             deint(A(f"{pre}.self_attn.k_proj.weight").T, n_kv),
             A(f"{pre}.self_attn.v_proj.weight").T], axis=1))
        L["wo"].append(A(f"{pre}.self_attn.o_proj.weight").T)
        if is_moe[i]:
            # Experts ship pre-fused in this framework's layout:
            # gate_up_proj (E, D, 2H) with [gate; up] on the last
            # axis, down_proj (E, H, D).
            L["w_gu"].append(np.asarray(
                state[f"{pre}.feed_forward.experts.gate_up_proj"],
                np.float32))
            L["w_down"].append(np.asarray(
                state[f"{pre}.feed_forward.experts.down_proj"],
                np.float32))
            L["moe_gate"].append(
                A(f"{pre}.feed_forward.router.weight").T)
            L["shared_gu"].append(np.concatenate(
                [A(f"{pre}.feed_forward.shared_expert"
                   ".gate_proj.weight").T,
                 A(f"{pre}.feed_forward.shared_expert"
                   ".up_proj.weight").T], axis=1))
            L["shared_down"].append(
                A(f"{pre}.feed_forward.shared_expert"
                  ".down_proj.weight").T)
            if moe_pattern:
                L["w_gu_mlp"].append(
                    np.zeros((dim, 2 * hidden_mlp), np.float32))
                L["w_down_mlp"].append(
                    np.zeros((hidden_mlp, dim), np.float32))
        else:
            # Dense (Maverick) layer: the MoE stacks get inert zeros
            # (the cond never executes them); the dense MLP rides
            # w_gu_mlp/w_down_mlp.
            L["w_gu"].append(
                np.zeros((n_experts, dim, 2 * hidden), np.float32))
            L["w_down"].append(
                np.zeros((n_experts, hidden, dim), np.float32))
            L["moe_gate"].append(np.zeros((dim, n_experts), np.float32))
            L["shared_gu"].append(
                np.zeros((dim, 2 * shared0.shape[0]), np.float32))
            L["shared_down"].append(
                np.zeros((shared0.shape[0], dim), np.float32))
            L["w_gu_mlp"].append(np.concatenate(
                [A(f"{pre}.feed_forward.gate_proj.weight").T,
                 A(f"{pre}.feed_forward.up_proj.weight").T], axis=1))
            L["w_down_mlp"].append(
                A(f"{pre}.feed_forward.down_proj.weight").T)

    params = {
        "tok_emb": jnp.asarray(emb, dtype),
        "layers": {k: jnp.asarray(np.stack(v), dtype)
                   for k, v in L.items()},
        "out_norm": jnp.asarray(A("model.norm.weight"), dtype),
        "lm_head": jnp.asarray(
            (A("lm_head.weight").T if "lm_head.weight" in state
             else np.ascontiguousarray(emb.T)), dtype),
    }
    if rope_scaling and rope_scaling.get("rope_type",
                                         rope_scaling.get("type")) \
            == "llama3":
        params["rope_factors"] = llm_model.llama3_rope_factors(
            cfg,
            factor=float(rope_scaling.get("factor", 8.0)),
            low_freq_factor=float(
                rope_scaling.get("low_freq_factor", 1.0)),
            high_freq_factor=float(
                rope_scaling.get("high_freq_factor", 4.0)),
            original_max_seq=int(rope_scaling.get(
                "original_max_position_embeddings", 8192)))
    return params, cfg


def gguf_to_llama4_params(
    path: str,
    bits: Optional[int] = 4,
    group: int = 256,
    dtype=jnp.bfloat16,
) -> tuple:
    """Convert a llama.cpp ``llama4`` GGUF (Scout/Maverick text tower)
    to (params, cfg) for models/llm.py — the GGUF twin of
    :func:`llama4_from_hf`.

    Staged per the deepseek2/falcon discipline: tensor names follow
    llama.cpp's conventions (``blk.N.ffn_{gate,up,down}_exps`` expert
    banks, ``*_shexp`` shared expert, ``ffn_gate_inp`` router; dense
    interleave layers use the plain ``ffn_{gate,up,down}`` names), and
    geometry is cross-checked against shapes — but the KEY STRINGS are
    unvalidated offline (zero-egress round; docs/MODELS.md). Optional
    metadata read with the PUBLISHED defaults llama.cpp hardcodes:
    ``llama4.interleave_moe_layer_step`` (1 = uniform MoE),
    ``llama4.no_rope_layer_interval`` (4), chunked-attention size
    (8192) and the NoPE query-temperature constants (8192 / 0.1).

    Rope layout: HF Llama-4 rotates INTERLEAVED pairs natively, and
    llama.cpp's converter ships llama4 q/k un-permuted
    (``undo_permute = False`` — unlike the llama arch), so the same
    interleaved->split-half fold as the HF route applies;
    ``TRACKIE_LLAMA4_GGUF_ROPE=none`` disables it on first real-file
    contact if the convention proves otherwise."""
    import os as _os

    gguf = read_gguf_header(path)
    md = gguf.metadata

    def key(suffix: str, default=None):
        v = md.get(f"llama4.{suffix}", default)
        if v is None:
            raise TrackieError(ErrorCode.MODEL_METADATA_INVALID,
                               f"missing GGUF key llama4.{suffix}")
        return v

    dim = int(key("embedding_length"))
    n_layers = int(key("block_count"))
    n_heads = int(key("attention.head_count"))
    n_kv = int(key("attention.head_count_kv", n_heads))
    hd = int(md.get("llama4.attention.key_length", dim // n_heads))
    n_experts = int(key("expert_count"))
    hidden = int(md.get("llama4.expert_feed_forward_length",
                        key("feed_forward_length")))
    step = int(md.get("llama4.interleave_moe_layer_step", 1))
    moe_pattern = 0 if step <= 1 else step
    is_moe = [f"blk.{i}.ffn_gate_exps.weight" in gguf.tensors
              for i in range(n_layers)]
    want = ([True] * n_layers if moe_pattern == 0
            else [(i % step) == (step - 1) for i in range(n_layers)])
    if is_moe != want:
        raise TrackieError(
            ErrorCode.MODEL_METADATA_INVALID,
            f"{path}: MoE layer layout {is_moe} disagrees with "
            f"interleave_moe_layer_step={step}")
    if not any(is_moe):
        raise TrackieError(
            ErrorCode.MODEL_METADATA_INVALID,
            f"{path}: no MoE layers (interleave_moe_layer_step={step} "
            f"exceeds block_count={n_layers}?)")
    first_moe = is_moe.index(True)
    shared_rows = load_gguf_tensor(
        gguf, f"blk.{first_moe}.ffn_gate_shexp.weight").shape[0]
    hidden_mlp = 0
    if moe_pattern:
        hidden_mlp = load_gguf_tensor(
            gguf, "blk.0.ffn_gate.weight").shape[0]
    vocab = int(md.get("llama4.vocab_size",
                       gguf.tensors["token_embd.weight"].shape[0]))
    # Scout ships QK L2-norm, Maverick does not; read the metadata key
    # when present, else default by the interleave signature.
    qk_l2norm = bool(_math_key(
        md, "llama4.attention.use_kq_norm", moe_pattern == 0,
        "interleave signature: Scout(uniform MoE)=True"))

    cfg = llm_model.LLMConfig(
        vocab_size=vocab, dim=dim, n_layers=n_layers, n_heads=n_heads,
        n_kv_heads=n_kv, head_dim=hd, hidden_dim=hidden,
        norm_eps=float(md.get(
            "llama4.attention.layer_norm_rms_epsilon", 1e-5)),
        rope_theta=float(key("rope.freq_base", 500000.0)),
        max_seq=int(key("context_length", 8192)),
        sliding_window=int(key("context_length", 8192)),
        n_experts=n_experts,
        n_experts_used=int(md.get("llama4.expert_used_count", 1)),
        moe_score_func="sigmoid_topk", moe_norm_topk=False,
        moe_scale_input=True, moe_shared_hidden=shared_rows,
        moe_shared_gated=False,
        nope_pattern=int(md.get("llama4.no_rope_layer_interval", 4)),
        qk_l2norm=qk_l2norm,
        attn_temp_tuning=True,
        attn_temp_floor=float(md.get(
            "llama4.attention.temperature_length", 8192.0)),
        attn_temp_scale=0.1,
        attn_chunk=int(md.get("llama4.attention.chunk_size", 8192)),
        moe_pattern=moe_pattern)

    quantize = (quantize_q4 if bits == 4
                else quantize_q8 if bits == 8 else None)

    def mat(name: str) -> np.ndarray:
        return np.ascontiguousarray(load_gguf_tensor(gguf, name).T)

    def maybe_quant(w):
        if quantize is None:
            return jnp.asarray(w, dtype)
        return quantize(jnp.asarray(w, jnp.float32), group)

    fold = _os.environ.get("TRACKIE_LLAMA4_GGUF_ROPE", "fold") != "none"

    def deint(w, heads):
        return (_deinterleave_rope_cols(w, heads, hd, hd) if fold
                else w)

    Ls: Dict[str, list] = {
        "attn_norm": [], "wqkv": [], "wo": [], "mlp_norm": [],
        "w_gu": [], "w_down": [], "moe_gate": [],
        "shared_gu": [], "shared_down": []}
    if moe_pattern:
        Ls["w_gu_mlp"], Ls["w_down_mlp"] = [], []
    for i in range(n_layers):
        p = f"blk.{i}"
        Ls["attn_norm"].append(
            jnp.asarray(load_gguf_tensor(gguf, f"{p}.attn_norm.weight"),
                        dtype))
        Ls["mlp_norm"].append(
            jnp.asarray(load_gguf_tensor(gguf, f"{p}.ffn_norm.weight"),
                        dtype))
        qkv = np.concatenate(
            [deint(mat(f"{p}.attn_q.weight"), n_heads),
             deint(mat(f"{p}.attn_k.weight"), n_kv),
             mat(f"{p}.attn_v.weight")], axis=1)
        Ls["wqkv"].append(maybe_quant(qkv))
        Ls["wo"].append(maybe_quant(mat(f"{p}.attn_output.weight")))
        if is_moe[i]:
            g = load_gguf_tensor(gguf, f"{p}.ffn_gate_exps.weight")
            u = load_gguf_tensor(gguf, f"{p}.ffn_up_exps.weight")
            dn = load_gguf_tensor(gguf, f"{p}.ffn_down_exps.weight")
            if g.shape != (n_experts, hidden, dim):
                raise TrackieError(
                    ErrorCode.MODEL_METADATA_INVALID,
                    f"{p}.ffn_gate_exps.weight shape {g.shape} != "
                    f"(E={n_experts}, H={hidden}, D={dim})")
            gu = np.concatenate([g.transpose(0, 2, 1),
                                 u.transpose(0, 2, 1)], axis=2)
            Ls["w_gu"].append(jnp.asarray(gu, dtype))
            Ls["w_down"].append(jnp.asarray(dn.transpose(0, 2, 1),
                                            dtype))
            Ls["moe_gate"].append(jnp.asarray(
                load_gguf_tensor(gguf, f"{p}.ffn_gate_inp.weight").T,
                dtype))
            Ls["shared_gu"].append(jnp.asarray(np.concatenate(
                [mat(f"{p}.ffn_gate_shexp.weight"),
                 mat(f"{p}.ffn_up_shexp.weight")], axis=1), dtype))
            Ls["shared_down"].append(jnp.asarray(
                mat(f"{p}.ffn_down_shexp.weight"), dtype))
            if moe_pattern:
                Ls["w_gu_mlp"].append(jnp.zeros(
                    (dim, 2 * hidden_mlp), dtype))
                Ls["w_down_mlp"].append(jnp.zeros(
                    (hidden_mlp, dim), dtype))
        else:
            Ls["w_gu"].append(jnp.zeros((n_experts, dim, 2 * hidden),
                                        dtype))
            Ls["w_down"].append(jnp.zeros((n_experts, hidden, dim),
                                          dtype))
            Ls["moe_gate"].append(jnp.zeros((dim, n_experts), dtype))
            Ls["shared_gu"].append(jnp.zeros((dim, 2 * shared_rows),
                                             dtype))
            Ls["shared_down"].append(jnp.zeros((shared_rows, dim),
                                               dtype))
            Ls["w_gu_mlp"].append(jnp.asarray(np.concatenate(
                [mat(f"{p}.ffn_gate.weight"),
                 mat(f"{p}.ffn_up.weight")], axis=1), dtype))
            Ls["w_down_mlp"].append(jnp.asarray(
                mat(f"{p}.ffn_down.weight"), dtype))
        log.info("converted llama4 layer %d/%d", i + 1, n_layers)

    def stack(items):
        from trackiellm_tpu.ops.quant import QuantizedLinear

        if items and isinstance(items[0], QuantizedLinear):
            return QuantizedLinear(
                values=jnp.stack([q.values for q in items]),
                scales=jnp.stack([q.scales for q in items]))
        return jnp.stack(items)

    tok_emb = load_gguf_tensor(gguf, "token_embd.weight")
    lm_head = (mat("output.weight") if "output.weight" in gguf.tensors
               else np.ascontiguousarray(tok_emb.T))
    params = {
        "tok_emb": jnp.asarray(tok_emb, dtype),
        "layers": {k: stack(v) for k, v in Ls.items()},
        "out_norm": jnp.asarray(
            load_gguf_tensor(gguf, "output_norm.weight"), dtype),
        "lm_head": maybe_quant(lm_head),
    }
    if "rope_freqs.weight" in gguf.tensors:
        params["rope_factors"] = jnp.asarray(
            load_gguf_tensor(gguf, "rope_freqs.weight"), jnp.float32)
    return params, cfg


# --- Nemotron / StarCoder2 (LayerNorm families) -----------------------------

def nemotron_from_hf(
    state: Dict[str, Any],
    *,
    max_seq: int = 4096,
    norm_eps: float = 1e-5,
    rope_theta: float = 10000.0,
    partial_rotary_factor: float = 0.5,
    head_dim: int = 0,
    dtype=jnp.bfloat16,
) -> tuple:
    """Convert a transformers NemotronForCausalLM state dict to
    (params, cfg).

    Nemotron's deltas over Llama: LayerNorm1p norms (effective scale =
    1 + w, WITH bias — the +1 folds here so the runtime sees a plain
    LayerNorm), an UNGATED squared-ReLU MLP (up -> relu² -> down), and
    half-width split-half rope (partial_rotary_factor — no interleave
    fold needed, Nemotron rotates like Llama)."""
    A = lambda k: np.asarray(state[k], np.float32)  # noqa: E731

    emb = A("model.embed_tokens.weight")
    vocab, dim = emb.shape
    n_layers = len({k.split(".")[2] for k in state
                    if k.startswith("model.layers.")})
    q0 = A("model.layers.0.self_attn.q_proj.weight")
    k0 = A("model.layers.0.self_attn.k_proj.weight")
    hidden = A("model.layers.0.mlp.up_proj.weight").shape[0]
    # head_dim isn't shape-derivable (q_proj is square); published
    # sizes use 128 — probe the common widths unless given.
    hd = head_dim
    if not hd:
        for hd in (128, 64, 16):
            if q0.shape[0] % hd == 0 and k0.shape[0] % hd == 0:
                break
    n_heads = q0.shape[0] // hd
    n_kv = k0.shape[0] // hd

    cfg = llm_model.LLMConfig(
        vocab_size=vocab, dim=dim, n_layers=n_layers, n_heads=n_heads,
        n_kv_heads=n_kv, head_dim=hd, hidden_dim=hidden,
        norm_eps=norm_eps, rope_theta=rope_theta, max_seq=max_seq,
        sliding_window=max_seq, norm_type="layernorm",
        mlp_gated=False, act="relu2",
        partial_rotary_factor=partial_rotary_factor)

    def ln1p(prefix):  # fold the +1 convention
        return {"g": 1.0 + A(f"{prefix}.weight"),
                "b": A(f"{prefix}.bias")}

    L: Dict[str, list] = {k: [] for k in (
        "wqkv", "wo", "w_gu", "w_down")}
    an, mn = [], []
    for i in range(n_layers):
        pre = f"model.layers.{i}"
        an.append(ln1p(f"{pre}.input_layernorm"))
        mn.append(ln1p(f"{pre}.post_attention_layernorm"))
        L["wqkv"].append(np.concatenate(
            [A(f"{pre}.self_attn.{p}_proj.weight").T
             for p in ("q", "k", "v")], axis=1))
        L["wo"].append(A(f"{pre}.self_attn.o_proj.weight").T)
        L["w_gu"].append(A(f"{pre}.mlp.up_proj.weight").T)
        L["w_down"].append(A(f"{pre}.mlp.down_proj.weight").T)

    layers = {k: jnp.asarray(np.stack(v), dtype) for k, v in L.items()}
    layers["attn_norm"] = {
        "g": jnp.asarray(np.stack([d["g"] for d in an]), jnp.float32),
        "b": jnp.asarray(np.stack([d["b"] for d in an]), jnp.float32)}
    layers["mlp_norm"] = {
        "g": jnp.asarray(np.stack([d["g"] for d in mn]), jnp.float32),
        "b": jnp.asarray(np.stack([d["b"] for d in mn]), jnp.float32)}
    on = ln1p("model.norm")
    params = {
        "tok_emb": jnp.asarray(emb, dtype),
        "layers": layers,
        "out_norm": {"g": jnp.asarray(on["g"]),
                     "b": jnp.asarray(on["b"])},
        "lm_head": jnp.asarray(
            (A("lm_head.weight").T if "lm_head.weight" in state
             else np.ascontiguousarray(emb.T)), dtype),
    }
    return params, cfg


def starcoder2_from_hf(
    state: Dict[str, Any],
    *,
    max_seq: int = 4096,
    norm_eps: float = 1e-5,
    rope_theta: float = 1e5,
    head_dim: int = 0,
    dtype=jnp.bfloat16,
) -> tuple:
    """Convert a transformers Starcoder2ForCausalLM state dict to
    (params, cfg).

    StarCoder2's deltas over Llama: plain LayerNorm norms (weight +
    bias), biases on every attention projection AND the ungated
    tanh-GELU MLP (c_fc -> gelu -> c_proj), full rope, usually tied
    embeddings."""
    A = lambda k: np.asarray(state[k], np.float32)  # noqa: E731

    emb = A("model.embed_tokens.weight")
    vocab, dim = emb.shape
    n_layers = len({k.split(".")[2] for k in state
                    if k.startswith("model.layers.")})
    q0 = A("model.layers.0.self_attn.q_proj.weight")
    k0 = A("model.layers.0.self_attn.k_proj.weight")
    hidden = A("model.layers.0.mlp.c_fc.weight").shape[0]
    hd = head_dim or 128
    n_heads = q0.shape[0] // hd
    n_kv = k0.shape[0] // hd

    cfg = llm_model.LLMConfig(
        vocab_size=vocab, dim=dim, n_layers=n_layers, n_heads=n_heads,
        n_kv_heads=n_kv, head_dim=hd, hidden_dim=hidden,
        norm_eps=norm_eps, rope_theta=rope_theta, max_seq=max_seq,
        sliding_window=max_seq, norm_type="layernorm",
        mlp_gated=False, act="gelu", mlp_bias=True,
        qkv_bias=True, out_bias=True)

    def ln(prefix):
        return {"g": A(f"{prefix}.weight"), "b": A(f"{prefix}.bias")}

    L: Dict[str, list] = {k: [] for k in (
        "wqkv", "wqkv_bias", "wo", "wo_bias",
        "w_gu", "w_gu_b", "w_down", "w_down_b")}
    an, mn = [], []
    for i in range(n_layers):
        pre = f"model.layers.{i}"
        an.append(ln(f"{pre}.input_layernorm"))
        mn.append(ln(f"{pre}.post_attention_layernorm"))
        L["wqkv"].append(np.concatenate(
            [A(f"{pre}.self_attn.{p}_proj.weight").T
             for p in ("q", "k", "v")], axis=1))
        L["wqkv_bias"].append(np.concatenate(
            [A(f"{pre}.self_attn.{p}_proj.bias")
             for p in ("q", "k", "v")]))
        L["wo"].append(A(f"{pre}.self_attn.o_proj.weight").T)
        L["wo_bias"].append(A(f"{pre}.self_attn.o_proj.bias"))
        L["w_gu"].append(A(f"{pre}.mlp.c_fc.weight").T)
        L["w_gu_b"].append(A(f"{pre}.mlp.c_fc.bias"))
        L["w_down"].append(A(f"{pre}.mlp.c_proj.weight").T)
        L["w_down_b"].append(A(f"{pre}.mlp.c_proj.bias"))

    layers = {k: jnp.asarray(np.stack(v), dtype) for k, v in L.items()}
    layers["attn_norm"] = {
        "g": jnp.asarray(np.stack([d["g"] for d in an]), jnp.float32),
        "b": jnp.asarray(np.stack([d["b"] for d in an]), jnp.float32)}
    layers["mlp_norm"] = {
        "g": jnp.asarray(np.stack([d["g"] for d in mn]), jnp.float32),
        "b": jnp.asarray(np.stack([d["b"] for d in mn]), jnp.float32)}
    on = ln("model.norm")
    params = {
        "tok_emb": jnp.asarray(emb, dtype),
        "layers": layers,
        "out_norm": {"g": jnp.asarray(on["g"]),
                     "b": jnp.asarray(on["b"])},
        "lm_head": jnp.asarray(
            (A("lm_head.weight").T if "lm_head.weight" in state
             else np.ascontiguousarray(emb.T)), dtype),
    }
    return params, cfg


# --- Cohere Command-R / Command-R7B (llama.cpp arch "command-r"/"cohere2") --

def cohere_from_hf(
    state: Dict[str, Any],
    *,
    max_seq: int = 8192,
    norm_eps: float = 1e-5,
    rope_theta: float = 10000.0,
    logit_scale: float = 1.0,
    sliding_window: int = 0,
    sliding_window_pattern: int = 0,
    head_dim: int = 0,
    dtype=jnp.bfloat16,
) -> tuple:
    """Convert a transformers CohereForCausalLM / Cohere2ForCausalLM
    state dict to (params, cfg).

    Cohere's deltas over Llama: bias-free mean-subtracting LayerNorm,
    PARALLEL residual (attention and MLP read the same
    input_layernorm; one residual add — CohereDecoderLayer), a
    logit_scale multiplier (folded into lm_head; embeddings are tied),
    INTERLEAVED full-width rope (folded to split-half via the GLM-4
    column permutation), and optionally per-head QK LayerNorms
    (Command-R+ use_qk_norm — their (H, head_dim) weights ride the
    same permutation, exact because mean/var over head_dim are
    permutation-invariant). Cohere2 (Command-R7B) adds
    ``sliding_window_pattern``: every pattern-th layer is GLOBAL and
    rope applies ONLY on sliding layers — mapped to window_pattern +
    nope_pattern at the same phase."""
    A = lambda k: np.asarray(state[k], np.float32)  # noqa: E731

    emb = A("model.embed_tokens.weight")
    vocab, dim = emb.shape
    n_layers = len({k.split(".")[2] for k in state
                    if k.startswith("model.layers.")})
    q0 = A("model.layers.0.self_attn.q_proj.weight")
    k0 = A("model.layers.0.self_attn.k_proj.weight")
    hidden = A("model.layers.0.mlp.gate_proj.weight").shape[0]
    hd = head_dim or 128
    n_heads = q0.shape[0] // hd
    n_kv = k0.shape[0] // hd
    qk_norm = "model.layers.0.self_attn.q_norm.weight" in state

    cfg = llm_model.LLMConfig(
        vocab_size=vocab, dim=dim, n_layers=n_layers, n_heads=n_heads,
        n_kv_heads=n_kv, head_dim=hd, hidden_dim=hidden,
        norm_eps=norm_eps, rope_theta=rope_theta, max_seq=max_seq,
        sliding_window=(sliding_window or max_seq),
        norm_type="layernorm", parallel_residual=True,
        qk_norm=qk_norm,
        window_pattern=sliding_window_pattern,
        nope_pattern=sliding_window_pattern)

    def deint(w, heads):
        return _deinterleave_rope_cols(w, heads, hd, hd)

    L: Dict[str, list] = {k: [] for k in (
        "attn_norm", "wqkv", "wo", "w_gu", "w_down")}
    if qk_norm:
        L["q_norm"], L["k_norm"] = [], []
    for i in range(n_layers):
        pre = f"model.layers.{i}"
        L["attn_norm"].append(A(f"{pre}.input_layernorm.weight"))
        L["wqkv"].append(np.concatenate(
            [deint(A(f"{pre}.self_attn.q_proj.weight").T, n_heads),
             deint(A(f"{pre}.self_attn.k_proj.weight").T, n_kv),
             A(f"{pre}.self_attn.v_proj.weight").T], axis=1))
        L["wo"].append(A(f"{pre}.self_attn.o_proj.weight").T)
        L["w_gu"].append(np.concatenate(
            [A(f"{pre}.mlp.gate_proj.weight").T,
             A(f"{pre}.mlp.up_proj.weight").T], axis=1))
        L["w_down"].append(A(f"{pre}.mlp.down_proj.weight").T)
        if qk_norm:
            # (H, head_dim) per-head weights — permuted like q/k cols.
            L["q_norm"].append(deint(
                A(f"{pre}.self_attn.q_norm.weight").reshape(-1),
                n_heads))
            L["k_norm"].append(deint(
                A(f"{pre}.self_attn.k_norm.weight").reshape(-1), n_kv))

    # The parallel-residual body never reads a pre-MLP norm, but the
    # duck-typed helpers expect the key on pre_norms configs.
    mlp_norm = [np.ones((dim,), np.float32)] * n_layers
    layers = {k: jnp.asarray(np.stack(v), dtype) for k, v in L.items()}
    layers["mlp_norm"] = jnp.asarray(np.stack(mlp_norm), jnp.float32)
    params = {
        "tok_emb": jnp.asarray(emb, dtype),
        "layers": layers,
        "out_norm": jnp.asarray(A("model.norm.weight"), jnp.float32),
        # Cohere multiplies the logits by logit_scale (tied
        # embeddings): fold it into lm_head.
        "lm_head": jnp.asarray(
            (A("lm_head.weight").T if "lm_head.weight" in state
             else np.ascontiguousarray(emb.T)) * logit_scale, dtype),
    }
    return params, cfg


# --- ERNIE 4.5 (Baidu — llama.cpp arches "ernie4_5"/"ernie4_5-moe") ---------

def ernie45_from_hf(
    state: Dict[str, Any],
    *,
    max_seq: int = 8192,
    norm_eps: float = 1e-5,
    rope_theta: float = 500000.0,
    head_dim: int = 0,
    moe_k: int = 6,
    dtype=jnp.bfloat16,
) -> tuple:
    """Convert a transformers Ernie4_5ForCausalLM /
    Ernie4_5_MoeForCausalLM state dict to (params, cfg).

    ERNIE 4.5 is Llama-shaped with an INTERLEAVED full-width rope
    (folded to split-half like GLM-4) and optional projection biases
    (use_bias). The MoE variant routes with softmax scores, SELECTS on
    score + e_score_correction_bias (the same selection-only mechanism
    as DeepSeek-V3's aux-loss-free bias -> layers.moe_gate_bias),
    renormalizes the gathered top-k, adds ungated shared experts
    (moe_num_shared_experts * moe_intermediate_size wide), and keeps
    the first moe_layer_start_index layers DENSE at the full
    intermediate width (cfg.moe_first_dense; a moe_layer_interval > 1
    additionally maps to cfg.moe_pattern)."""
    A = lambda k: np.asarray(state[k], np.float32)  # noqa: E731

    emb = A("model.embed_tokens.weight")
    vocab, dim = emb.shape
    n_layers = len({k.split(".")[2] for k in state
                    if k.startswith("model.layers.")})
    q0 = A("model.layers.0.self_attn.q_proj.weight")
    k0 = A("model.layers.0.self_attn.k_proj.weight")
    hd = head_dim or 128
    n_heads = q0.shape[0] // hd
    n_kv = k0.shape[0] // hd
    qkv_bias = "model.layers.0.self_attn.q_proj.bias" in state

    is_moe = [f"model.layers.{i}.mlp.gate.weight" in state
              for i in range(n_layers)]
    moe = any(is_moe)

    def deint(w, heads):
        return _deinterleave_rope_cols(w, heads, hd, hd)

    if moe:
        first_moe = is_moe.index(True)
        first_dense = first_moe  # moe_layer_start_index
        # moe_layer_interval from the spacing of MoE layers past start.
        moe_idx = [i for i, m in enumerate(is_moe) if m]
        interval = 1
        if len(moe_idx) > 1:
            interval = moe_idx[1] - moe_idx[0]
        want = [i >= first_dense and ((i + 1) % interval == 0)
                for i in range(n_layers)]
        if want != is_moe:
            raise NotImplementedError(
                f"irregular ERNIE MoE layout {is_moe}")
        e0 = f"model.layers.{first_moe}.mlp.experts"
        # keys: model.layers.N.mlp.experts.E.gate_proj.weight
        n_experts = len({k.split(".")[5] for k in state
                         if k.startswith(e0 + ".")})
        moe_hidden = int(A(f"{e0}.0.gate_proj.weight").shape[0])
        shared = f"model.layers.{first_moe}.mlp.shared_experts"
        shared_hidden = (int(A(f"{shared}.gate_proj.weight").shape[0])
                         if f"{shared}.gate_proj.weight" in state else 0)
        dense_idx = [i for i, m in enumerate(is_moe) if not m]
        hidden_dense = (int(A(f"model.layers.{dense_idx[0]}.mlp"
                              ".gate_proj.weight").shape[0])
                        if dense_idx else 0)
    else:
        n_experts = 0
        moe_hidden = shared_hidden = 0
        first_dense, interval = 0, 1
        hidden_dense = int(A("model.layers.0.mlp.gate_proj.weight"
                             ).shape[0])

    cfg = llm_model.LLMConfig(
        vocab_size=vocab, dim=dim, n_layers=n_layers, n_heads=n_heads,
        n_kv_heads=n_kv, head_dim=hd,
        hidden_dim=(moe_hidden if moe else hidden_dense),
        norm_eps=norm_eps, rope_theta=rope_theta, max_seq=max_seq,
        sliding_window=max_seq, qkv_bias=qkv_bias,
        n_experts=n_experts,
        n_experts_used=moe_k if moe else 2,
        moe_norm_topk=True, moe_shared_hidden=shared_hidden,
        moe_shared_gated=False,
        moe_first_dense=first_dense,
        moe_pattern=(interval if interval > 1 else 0))

    L: Dict[str, list] = {k: [] for k in (
        "attn_norm", "wqkv", "wo", "mlp_norm", "w_gu", "w_down")}
    if qkv_bias:
        L["wqkv_bias"] = []
    if moe:
        for k in ("moe_gate", "moe_gate_bias", "shared_gu",
                  "shared_down"):
            L[k] = []
        if first_dense or interval > 1:
            L["w_gu_mlp"], L["w_down_mlp"] = [], []
    for i in range(n_layers):
        pre = f"model.layers.{i}"
        L["attn_norm"].append(A(f"{pre}.input_layernorm.weight"))
        L["mlp_norm"].append(A(f"{pre}.post_attention_layernorm.weight"))
        L["wqkv"].append(np.concatenate(
            [deint(A(f"{pre}.self_attn.q_proj.weight").T, n_heads),
             deint(A(f"{pre}.self_attn.k_proj.weight").T, n_kv),
             A(f"{pre}.self_attn.v_proj.weight").T], axis=1))
        if qkv_bias:
            L["wqkv_bias"].append(np.concatenate(
                [deint(A(f"{pre}.self_attn.q_proj.bias"), n_heads),
                 deint(A(f"{pre}.self_attn.k_proj.bias"), n_kv),
                 A(f"{pre}.self_attn.v_proj.bias")]))
        L["wo"].append(A(f"{pre}.self_attn.o_proj.weight").T)
        if not moe or not is_moe[i]:
            gu = np.concatenate(
                [A(f"{pre}.mlp.gate_proj.weight").T,
                 A(f"{pre}.mlp.up_proj.weight").T], axis=1)
            dn = A(f"{pre}.mlp.down_proj.weight").T
            if moe:
                L["w_gu_mlp"].append(gu)
                L["w_down_mlp"].append(dn)
                L["w_gu"].append(np.zeros(
                    (n_experts, dim, 2 * moe_hidden), np.float32))
                L["w_down"].append(np.zeros(
                    (n_experts, moe_hidden, dim), np.float32))
                L["moe_gate"].append(
                    np.zeros((dim, n_experts), np.float32))
                L["moe_gate_bias"].append(
                    np.zeros((n_experts,), np.float32))
                L["shared_gu"].append(np.zeros(
                    (dim, 2 * shared_hidden), np.float32))
                L["shared_down"].append(np.zeros(
                    (shared_hidden, dim), np.float32))
            else:
                L["w_gu"].append(gu)
                L["w_down"].append(dn)
        else:
            gus, dns = [], []
            for e in range(n_experts):
                ep = f"{pre}.mlp.experts.{e}"
                gus.append(np.concatenate(
                    [A(f"{ep}.gate_proj.weight").T,
                     A(f"{ep}.up_proj.weight").T], axis=1))
                dns.append(A(f"{ep}.down_proj.weight").T)
            L["w_gu"].append(np.stack(gus))
            L["w_down"].append(np.stack(dns))
            L["moe_gate"].append(A(f"{pre}.mlp.gate.weight").T)
            L["moe_gate_bias"].append(A(
                f"{pre}.mlp.moe_statics.e_score_correction_bias"
            ).reshape(-1))
            L["shared_gu"].append(np.concatenate(
                [A(f"{pre}.mlp.shared_experts.gate_proj.weight").T,
                 A(f"{pre}.mlp.shared_experts.up_proj.weight").T],
                axis=1))
            L["shared_down"].append(
                A(f"{pre}.mlp.shared_experts.down_proj.weight").T)
            if first_dense or interval > 1:
                L["w_gu_mlp"].append(np.zeros(
                    (dim, 2 * (hidden_dense or moe_hidden)),
                    np.float32))
                L["w_down_mlp"].append(np.zeros(
                    ((hidden_dense or moe_hidden), dim), np.float32))

    params = {
        "tok_emb": jnp.asarray(emb, dtype),
        "layers": {k: jnp.asarray(np.stack(v), dtype)
                   for k, v in L.items()},
        "out_norm": jnp.asarray(A("model.norm.weight"), dtype),
        "lm_head": jnp.asarray(
            (A("lm_head.weight").T if "lm_head.weight" in state
             else np.ascontiguousarray(emb.T)), dtype),
    }
    return params, cfg


def glm4_moe_from_hf(
    state: Dict[str, Any],
    *,
    max_seq: int = 8192,
    norm_eps: float = 1e-5,
    rope_theta: float = 10000.0,
    partial_rotary_factor: float = 0.5,
    moe_k: int = 8,
    routed_scaling_factor: float = 1.0,
    n_groups: int = 1,
    topk_groups: int = 1,
    norm_topk: bool = True,
    head_dim: int = 0,
    dtype=jnp.bfloat16,
) -> tuple:
    """Convert a transformers Glm4MoeForCausalLM (GLM-4.5/4.5-Air/4.6)
    state dict to (params, cfg).

    GLM-4.5's deltas over Llama assemble entirely from existing
    mechanisms: per-head QK RMSNorm BEFORE rope (Qwen3's cfg.qk_norm —
    detected from tensor presence), a half-width SPLIT-HALF rope
    (plain cfg.partial_rotary_factor; unlike dense GLM-4 there is NO
    interleave to fold — modeling_glm4_moe uses rotate_half), and the
    full DeepSeek-V3 routing stack: sigmoid scores, selection-only
    e_score_correction_bias (layers.moe_gate_bias), top-2-sum
    group-limited greedy (moe_n_groups/moe_topk_groups),
    renormalized top-k scaled by routed_scaling_factor, ungated
    shared experts, first_k_dense_replace dense layers
    (cfg.moe_first_dense). Non-shape-derivable knobs come from the HF
    config as kwargs (GLM-4.5 publishes n_group=topk_group=1,
    num_experts_per_tok=8)."""
    A = lambda k: np.asarray(state[k], np.float32)  # noqa: E731

    emb = A("model.embed_tokens.weight")
    vocab, dim = emb.shape
    n_layers = len({k.split(".")[2] for k in state
                    if k.startswith("model.layers.")})
    qk_norm = "model.layers.0.self_attn.q_norm.weight" in state
    hd = head_dim or (
        int(A("model.layers.0.self_attn.q_norm.weight").shape[0])
        if qk_norm else 128)
    q0 = A("model.layers.0.self_attn.q_proj.weight")
    k0 = A("model.layers.0.self_attn.k_proj.weight")
    n_heads = q0.shape[0] // hd
    n_kv = k0.shape[0] // hd
    qkv_bias = "model.layers.0.self_attn.q_proj.bias" in state

    is_moe = [f"model.layers.{i}.mlp.gate.weight" in state
              for i in range(n_layers)]
    if not any(is_moe):
        raise NotImplementedError(
            "all-dense glm4_moe checkpoints are not a published shape "
            "(dense GLM-4 loads through glm4_from_hf)")
    first_dense = is_moe.index(True)  # first_k_dense_replace
    if is_moe != [i >= first_dense for i in range(n_layers)]:
        raise NotImplementedError(
            f"irregular GLM-4.5 dense/MoE layout {is_moe} — only "
            "first_k_dense_replace is published")
    e0 = f"model.layers.{first_dense}.mlp.experts"
    n_experts = len({k.split(".")[5] for k in state
                     if k.startswith(e0 + ".")})
    moe_hidden = int(A(f"{e0}.0.gate_proj.weight").shape[0])
    shared = f"model.layers.{first_dense}.mlp.shared_experts"
    shared_hidden = int(A(f"{shared}.gate_proj.weight").shape[0])
    hidden_dense = (int(A("model.layers.0.mlp.gate_proj.weight"
                          ).shape[0]) if first_dense else 0)
    if n_experts % max(n_groups, 1):
        raise TrackieError(
            ErrorCode.MODEL_METADATA_INVALID,
            f"n_experts={n_experts} not divisible by n_groups="
            f"{n_groups}")

    cfg = llm_model.LLMConfig(
        vocab_size=vocab, dim=dim, n_layers=n_layers, n_heads=n_heads,
        n_kv_heads=n_kv, head_dim=hd, hidden_dim=moe_hidden,
        norm_eps=norm_eps, rope_theta=rope_theta, max_seq=max_seq,
        sliding_window=max_seq, qkv_bias=qkv_bias, qk_norm=qk_norm,
        partial_rotary_factor=partial_rotary_factor,
        n_experts=n_experts, n_experts_used=moe_k,
        moe_score_func="sigmoid", moe_norm_topk=norm_topk,
        moe_routed_scale=routed_scaling_factor,
        moe_n_groups=n_groups, moe_topk_groups=topk_groups,
        moe_group_score="top2sum",
        moe_shared_hidden=shared_hidden, moe_shared_gated=False,
        moe_first_dense=first_dense)

    L: Dict[str, list] = {k: [] for k in (
        "attn_norm", "wqkv", "wo", "mlp_norm", "w_gu", "w_down",
        "moe_gate", "moe_gate_bias", "shared_gu", "shared_down")}
    if qk_norm:
        L["q_norm"], L["k_norm"] = [], []
    if qkv_bias:
        L["wqkv_bias"] = []
    if first_dense:
        L["w_gu_mlp"], L["w_down_mlp"] = [], []
    for i in range(n_layers):
        pre = f"model.layers.{i}"
        L["attn_norm"].append(A(f"{pre}.input_layernorm.weight"))
        L["mlp_norm"].append(A(f"{pre}.post_attention_layernorm.weight"))
        L["wqkv"].append(np.concatenate(
            [A(f"{pre}.self_attn.q_proj.weight").T,
             A(f"{pre}.self_attn.k_proj.weight").T,
             A(f"{pre}.self_attn.v_proj.weight").T], axis=1))
        if qkv_bias:
            L["wqkv_bias"].append(np.concatenate(
                [A(f"{pre}.self_attn.q_proj.bias"),
                 A(f"{pre}.self_attn.k_proj.bias"),
                 A(f"{pre}.self_attn.v_proj.bias")]))
        L["wo"].append(A(f"{pre}.self_attn.o_proj.weight").T)
        if qk_norm:
            L["q_norm"].append(A(f"{pre}.self_attn.q_norm.weight"))
            L["k_norm"].append(A(f"{pre}.self_attn.k_norm.weight"))
        if is_moe[i]:
            gus, dns = [], []
            for e in range(n_experts):
                ep = f"{pre}.mlp.experts.{e}"
                gus.append(np.concatenate(
                    [A(f"{ep}.gate_proj.weight").T,
                     A(f"{ep}.up_proj.weight").T], axis=1))
                dns.append(A(f"{ep}.down_proj.weight").T)
            L["w_gu"].append(np.stack(gus))
            L["w_down"].append(np.stack(dns))
            L["moe_gate"].append(A(f"{pre}.mlp.gate.weight").T)
            L["moe_gate_bias"].append(
                A(f"{pre}.mlp.gate.e_score_correction_bias")
                .reshape(-1))
            L["shared_gu"].append(np.concatenate(
                [A(f"{pre}.mlp.shared_experts.gate_proj.weight").T,
                 A(f"{pre}.mlp.shared_experts.up_proj.weight").T],
                axis=1))
            L["shared_down"].append(
                A(f"{pre}.mlp.shared_experts.down_proj.weight").T)
            if first_dense:
                L["w_gu_mlp"].append(np.zeros(
                    (dim, 2 * hidden_dense), np.float32))
                L["w_down_mlp"].append(np.zeros(
                    (hidden_dense, dim), np.float32))
        else:
            L["w_gu"].append(np.zeros(
                (n_experts, dim, 2 * moe_hidden), np.float32))
            L["w_down"].append(np.zeros(
                (n_experts, moe_hidden, dim), np.float32))
            L["moe_gate"].append(np.zeros((dim, n_experts), np.float32))
            L["moe_gate_bias"].append(np.zeros((n_experts,), np.float32))
            L["shared_gu"].append(np.zeros(
                (dim, 2 * shared_hidden), np.float32))
            L["shared_down"].append(np.zeros(
                (shared_hidden, dim), np.float32))
            L["w_gu_mlp"].append(np.concatenate(
                [A(f"{pre}.mlp.gate_proj.weight").T,
                 A(f"{pre}.mlp.up_proj.weight").T], axis=1))
            L["w_down_mlp"].append(A(f"{pre}.mlp.down_proj.weight").T)

    params = {
        "tok_emb": jnp.asarray(emb, dtype),
        "layers": {k: jnp.asarray(np.stack(v), dtype)
                   for k, v in L.items()},
        "out_norm": jnp.asarray(A("model.norm.weight"), dtype),
        "lm_head": jnp.asarray(
            (A("lm_head.weight").T if "lm_head.weight" in state
             else np.ascontiguousarray(emb.T)), dtype),
    }
    return params, cfg


def llava_from_hf(
    state: Dict[str, Any],
    *,
    n_heads: int,
    max_seq: int = 4096,
    norm_eps: float = 1e-5,
    rope_theta: float = 1e4,
    vision_n_heads: int = 16,
    vision_act: str = "quick_gelu",
    vision_norm_eps: float = 1e-5,
    feature_layer: int = -2,
    drop_cls: bool = True,
    proj_act: str = "gelu",
    dtype=jnp.bfloat16,
    vision_dtype=jnp.float32,
) -> tuple:
    """Convert a transformers LLaVA state dict to the full VLM bundle.

    Returns ``(llm_params, llm_cfg, clip_params, clip_cfg)``:
    the Llama-family language model in this framework's fused layout
    plus the CLIP vision tower + multi-modal projector
    (models/clip.py). Parity: llama.cpp's llava path splits the same
    checkpoint into a text GGUF + an "mmproj" CLIP file; here both
    halves convert together from the HF state dict (the offline,
    zero-egress-validated route — like llama4/gpt-oss).

    Handles both HF layouts: the ≥4.52 one
    (``model.vision_tower.* / model.language_model.* / lm_head``) and
    the legacy one (``vision_tower.* / language_model.model.* /
    language_model.lm_head``).

    Shape-derived vision geometry: dim/patch from the patch conv,
    image_size from the position table, hidden from fc1. ``n_heads``
    (text) and ``vision_n_heads`` are not shape-derivable — pass them
    from the HF config (text head_dim follows the Llama convention
    dim // n_heads).
    """
    from trackiellm_tpu.models import clip as clip_model

    A = lambda k: np.asarray(state[k], np.float32)  # noqa: E731

    # --- layout detection -------------------------------------------------
    if any(k.startswith("model.vision_tower.") for k in state):
        vt = "model.vision_tower.vision_model."
        lm = "model.language_model."
        proj = "model.multi_modal_projector."
        head_key = "lm_head.weight"
    else:
        vt = "vision_tower.vision_model."
        lm = "language_model.model."
        proj = "multi_modal_projector."
        head_key = "language_model.lm_head.weight"

    # --- language model (Llama template) ----------------------------------
    text_state = {
        "model." + k[len(lm):]: v for k, v in state.items()
        if k.startswith(lm)}
    if head_key in state:
        text_state["lm_head.weight"] = state[head_key]
    emb = A(lm + "embed_tokens.weight")
    dim = emb.shape[1]
    hd = dim // n_heads
    llm_params, llm_cfg = smollm3_from_hf(
        text_state, max_seq=max_seq, norm_eps=norm_eps,
        rope_theta=rope_theta, nope_pattern=0, head_dim=hd, dtype=dtype)

    # --- CLIP vision tower -------------------------------------------------
    pw = A(vt + "embeddings.patch_embedding.weight")  # (D, 3, P, P)
    vdim, _, patch, _ = pw.shape
    pos = A(vt + "embeddings.position_embedding.weight")  # (N+1, D)
    n_patches = pos.shape[0] - 1
    image_size = patch * int(round(n_patches ** 0.5))
    n_vlayers = len({k[len(vt) + len("encoder.layers."):].split(".")[0]
                     for k in state
                     if k.startswith(vt + "encoder.layers.")})
    hidden = A(vt + "encoder.layers.0.mlp.fc1.weight").shape[0]

    clip_cfg = clip_model.CLIPVisionConfig(
        image_size=image_size, patch_size=patch, dim=vdim,
        n_layers=n_vlayers, n_heads=vision_n_heads, hidden_dim=hidden,
        norm_eps=vision_norm_eps, act=vision_act,
        feature_layer=feature_layer, drop_cls=drop_cls,
        proj_dim=dim, proj_act=proj_act)

    L = {k: [] for k in ("ln1_g", "ln1_b", "ln2_g", "ln2_b",
                         "wq", "bq", "wk", "bk", "wv", "bv", "wo", "bo",
                         "w1", "b1", "w2", "b2")}
    for i in range(n_vlayers):
        pre = f"{vt}encoder.layers.{i}"
        L["ln1_g"].append(A(f"{pre}.layer_norm1.weight"))
        L["ln1_b"].append(A(f"{pre}.layer_norm1.bias"))
        L["ln2_g"].append(A(f"{pre}.layer_norm2.weight"))
        L["ln2_b"].append(A(f"{pre}.layer_norm2.bias"))
        for ours, theirs in (("q", "q"), ("k", "k"), ("v", "v")):
            L[f"w{ours}"].append(A(f"{pre}.self_attn.{theirs}_proj.weight").T)
            L[f"b{ours}"].append(A(f"{pre}.self_attn.{theirs}_proj.bias"))
        L["wo"].append(A(f"{pre}.self_attn.out_proj.weight").T)
        L["bo"].append(A(f"{pre}.self_attn.out_proj.bias"))
        L["w1"].append(A(f"{pre}.mlp.fc1.weight").T)
        L["b1"].append(A(f"{pre}.mlp.fc1.bias"))
        L["w2"].append(A(f"{pre}.mlp.fc2.weight").T)
        L["b2"].append(A(f"{pre}.mlp.fc2.bias"))

    clip_params = {
        # (D, 3, P, P) -> (3*P*P, D); flatten order (c, ph, pw) matches
        # encode_image's patch extraction transpose.
        "patch_w": jnp.asarray(pw.reshape(vdim, -1).T, vision_dtype),
        "cls": jnp.asarray(A(vt + "embeddings.class_embedding"),
                           vision_dtype),
        "pos": jnp.asarray(pos, vision_dtype),
        "pre_ln_g": jnp.asarray(A(vt + "pre_layrnorm.weight"), vision_dtype),
        "pre_ln_b": jnp.asarray(A(vt + "pre_layrnorm.bias"), vision_dtype),
        "layers": {k: jnp.asarray(np.stack(v), vision_dtype)
                   for k, v in L.items()},
        "proj": {
            "w1": jnp.asarray(A(proj + "linear_1.weight").T, vision_dtype),
            "b1": jnp.asarray(A(proj + "linear_1.bias"), vision_dtype),
            "w2": jnp.asarray(A(proj + "linear_2.weight").T, vision_dtype),
            "b2": jnp.asarray(A(proj + "linear_2.bias"), vision_dtype),
        },
    }
    return llm_params, llm_cfg, clip_params, clip_cfg


def gguf_to_clip_params(path: str, *, vision_dtype=jnp.float32) -> tuple:
    """llama.cpp "mmproj" CLIP GGUF -> (clip_params, CLIPVisionConfig).

    Parity: the llava path pairs a text GGUF with a vision "mmproj"
    file (llama.cpp clip.cpp); this reads the mmproj half so a
    llama.cpp-packaged LLaVA runs through models/clip + llm/vlm.
    Tensor names follow clip.cpp's constants (``v.patch_embd.weight``,
    ``v.blk.%d.attn_{q,k,v}/attn_out/ln1/ln2/ffn_{up,down}``,
    ``mm.0/mm.2`` projector). Geometry comes from ``clip.vision.*``
    metadata cross-checked against tensor shapes.

    Convention safety: clip.cpp's ffn_up/ffn_down naming has been
    inconsistent across conversion scripts, so the two MLP matrices are
    assigned BY SHAPE ((hidden, dim) = fc1, (dim, hidden) = fc2) —
    immune to the naming either way. mmproj files are usually
    pre-truncated at the LLaVA feature tap (ViT-L ships 23 of 24
    blocks), so the default is to run every stored block
    (``feature_layer = n_layers``); files that carry
    ``clip.vision.feature_layer`` metadata (newer converters shipping
    the full tower) override that — positive k runs k blocks
    (hidden_states[k] convention), negative v runs n_layers+1+v (the
    HF ``vision_feature_layer=-2`` convention).

    Offline-validation caveat (same class as gguf_to_mamba_params):
    key strings are pinned by synthetic-GGUF roundtrips; a real file
    has not been seen in a zero-egress round.
    """
    from trackiellm_tpu.models import clip as clip_model

    gguf = read_gguf_header(path)
    md = gguf.metadata
    if not (md.get("clip.has_vision_encoder", True)
            and ("v.patch_embd.weight" in gguf.tensors)):
        raise TrackieError(ErrorCode.MODEL_METADATA_INVALID,
                           f"{path}: not a clip.cpp vision mmproj file")

    def T(name: str) -> np.ndarray:
        return load_gguf_tensor(gguf, name)

    pw = T("v.patch_embd.weight")          # OIHW like the HF conv
    vdim, _, patch, _ = pw.shape
    pos = T("v.position_embd.weight")      # (N+1, D) with CLS
    n_patches = pos.shape[0] - 1
    image_size = patch * int(round(n_patches ** 0.5))
    n_layers = len({k.split(".")[2] for k in gguf.tensors
                    if k.startswith("v.blk.")})
    n_heads = int(md.get("clip.vision.attention.head_count", 16))

    checks = {"clip.vision.image_size": image_size,
              "clip.vision.patch_size": patch,
              "clip.vision.embedding_length": vdim,
              "clip.vision.block_count": n_layers}
    for key, ours in checks.items():
        if key in md and int(md[key]) != ours:
            raise TrackieError(
                ErrorCode.MODEL_METADATA_INVALID,
                f"{path}: {key}={md[key]} disagrees with tensor shapes "
                f"({ours})")

    def fc_pair(i: int):
        """MLP matrices by SHAPE, not by clip.cpp's unstable naming."""
        a = T(f"v.blk.{i}.ffn_up.weight")
        a_b = T(f"v.blk.{i}.ffn_up.bias")
        b = T(f"v.blk.{i}.ffn_down.weight")
        b_b = T(f"v.blk.{i}.ffn_down.bias")
        if a.shape[1] == vdim and a.shape[0] != vdim:
            return a, a_b, b, b_b      # a: (hidden, dim) = fc1
        if b.shape[1] == vdim and b.shape[0] != vdim:
            return b, b_b, a, a_b
        raise TrackieError(
            ErrorCode.MODEL_METADATA_INVALID,
            f"{path}: blk.{i} MLP shapes {a.shape}/{b.shape} don't "
            f"disambiguate against dim={vdim}")

    hidden = fc_pair(0)[0].shape[0]
    L = {k: [] for k in ("ln1_g", "ln1_b", "ln2_g", "ln2_b",
                         "wq", "bq", "wk", "bk", "wv", "bv", "wo", "bo",
                         "w1", "b1", "w2", "b2")}
    for i in range(n_layers):
        pre = f"v.blk.{i}"
        L["ln1_g"].append(T(f"{pre}.ln1.weight"))
        L["ln1_b"].append(T(f"{pre}.ln1.bias"))
        L["ln2_g"].append(T(f"{pre}.ln2.weight"))
        L["ln2_b"].append(T(f"{pre}.ln2.bias"))
        for ours, theirs in (("q", "attn_q"), ("k", "attn_k"),
                             ("v", "attn_v")):
            L[f"w{ours}"].append(T(f"{pre}.{theirs}.weight").T)
            L[f"b{ours}"].append(T(f"{pre}.{theirs}.bias"))
        L["wo"].append(T(f"{pre}.attn_out.weight").T)
        L["bo"].append(T(f"{pre}.attn_out.bias"))
        w1, b1, w2, b2 = fc_pair(i)
        L["w1"].append(w1.T)
        L["b1"].append(b1)
        L["w2"].append(w2.T)
        L["b2"].append(b2)

    proj_w1 = T("mm.0.weight")
    proj_w2 = T("mm.2.weight")
    proj_dim = proj_w2.shape[0]

    # Feature tap: default = run every stored block (pre-truncated
    # mmproj convention). Honor explicit clip.vision.feature_layer
    # metadata when present — newer converters ship the FULL tower,
    # where silently running the extra block(s) would corrupt the
    # image features.
    feature_layer = n_layers
    if "clip.vision.feature_layer" in md:
        fl = int(md["clip.vision.feature_layer"])
        feature_layer = fl if fl > 0 else n_layers + 1 + fl
        if not (1 <= feature_layer <= n_layers):
            raise TrackieError(
                ErrorCode.MODEL_METADATA_INVALID,
                f"{path}: clip.vision.feature_layer={fl} resolves to "
                f"{feature_layer} of {n_layers} stored blocks")
    elif n_layers in (12, 24, 26, 27, 32):
        # Canonical FULL CLIP/SigLIP tower depths: a truncated LLaVA
        # mmproj ships depth-1 blocks (e.g. 23 of ViT-L's 24). A file
        # with a full-depth block count and no tap metadata is
        # suspicious — flag it rather than silently running the tap
        # one block late.
        log.warning(
            "%s: mmproj stores %d blocks (a full tower depth) with no "
            "clip.vision.feature_layer metadata; running all of them — "
            "if features look wrong, the tap likely belongs at block "
            "%d", path, n_layers, n_layers - 1)

    clip_cfg = clip_model.CLIPVisionConfig(
        image_size=image_size, patch_size=patch, dim=vdim,
        n_layers=n_layers, n_heads=n_heads, hidden_dim=hidden,
        norm_eps=float(md.get("clip.vision.attention.layer_norm_epsilon",
                              1e-5)),
        act=("gelu" if md.get("clip.use_gelu", False) else "quick_gelu"),
        feature_layer=feature_layer,
        drop_cls=True, proj_dim=proj_dim, proj_act="gelu")

    clip_params = {
        "patch_w": jnp.asarray(pw.reshape(vdim, -1).T, vision_dtype),
        "cls": jnp.asarray(T("v.class_embd").reshape(-1), vision_dtype),
        "pos": jnp.asarray(pos, vision_dtype),
        "pre_ln_g": jnp.asarray(T("v.pre_ln.weight"), vision_dtype),
        "pre_ln_b": jnp.asarray(T("v.pre_ln.bias"), vision_dtype),
        "layers": {k: jnp.asarray(np.stack(v), vision_dtype)
                   for k, v in L.items()},
        "proj": {
            "w1": jnp.asarray(proj_w1.T, vision_dtype),
            "b1": jnp.asarray(T("mm.0.bias"), vision_dtype),
            "w2": jnp.asarray(proj_w2.T, vision_dtype),
            "b2": jnp.asarray(T("mm.2.bias"), vision_dtype),
        },
    }
    return clip_params, clip_cfg


def falcon_from_hf(
    state: Dict[str, Any],
    *,
    n_heads: int,
    max_seq: int = 2048,
    norm_eps: float = 1e-5,
    rope_theta: float = 1e4,
    new_arch: Optional[bool] = None,
    dtype=jnp.bfloat16,
) -> tuple:
    """Convert a transformers Falcon state dict to (params, cfg).

    Falcon deltas vs the Llama template (modeling_falcon.py):

    - **LayerNorm with biases** everywhere ({"g","b"} norm params).
    - **Parallel residual** (7B: one shared input_layernorm feeds both
      branches — the Command-R mechanism). The 40B/180B "new decoder
      architecture" adds a SECOND norm: the MLP branch reads its own
      ``ln_mlp`` of the residual stream (cfg.parallel_mlp_norm).
      ``parallel_attn=False`` checkpoints map to sequential residuals.
    - **Fused query_key_value** with three layouts, un-fused here into
      the framework's q|k|v column order: multi-query 7B stores
      [q0..qn, k, v] head rows (already ordered); MHA checkpoints
      interleave (q,k,v) per head; the new arch groups
      [q0..qr, k, v] per kv head (group-major q order — exactly the
      framework's GQA head indexing g*rep+r).
    - **Ungated exact-erf GELU MLP** (nn.GELU -> cfg.act="gelu_exact";
      StarCoder2's tanh approximation would diverge).

    ``new_arch`` auto-detects from ``ln_attn`` / qkv shape; pass it
    explicitly for new-arch checkpoints with num_ln_in_parallel_attn=1
    (Falcon2-11B). Alibi checkpoints (falcon-rw) are not supported —
    the published Falcon-7B/40B/180B line is rotary.
    """
    A = lambda k: np.asarray(state[k], np.float32)  # noqa: E731

    pre0 = "transformer.h.0."
    emb = A("transformer.word_embeddings.weight")
    vocab, dim = emb.shape
    hd = dim // n_heads
    n_layers = len({k.split(".")[2] for k in state
                    if k.startswith("transformer.h.")})
    qkv_out = A(pre0 + "self_attention.query_key_value.weight").shape[0]
    hidden = A(pre0 + "mlp.dense_h_to_4h.weight").shape[0]

    two_norm = (pre0 + "ln_attn.weight") in state
    sequential = (pre0 + "post_attention_layernorm.weight") in state
    if new_arch is None:
        new_arch = two_norm or (qkv_out not in (3 * dim, dim + 2 * hd))
    if new_arch:
        n_kv = (qkv_out // hd - n_heads) // 2
    elif qkv_out == dim + 2 * hd:
        n_kv = 1  # multi-query (Falcon-7B)
    else:
        n_kv = n_heads
    qkv_bias = (pre0 + "self_attention.query_key_value.bias") in state
    out_bias = (pre0 + "self_attention.dense.bias") in state
    mlp_bias = (pre0 + "mlp.dense_h_to_4h.bias") in state

    cfg = llm_model.LLMConfig(
        vocab_size=vocab, dim=dim, n_layers=n_layers, n_heads=n_heads,
        n_kv_heads=n_kv, head_dim=hd, hidden_dim=hidden,
        norm_eps=norm_eps, rope_theta=rope_theta, max_seq=max_seq,
        sliding_window=max_seq, norm_type="layernorm",
        parallel_residual=not sequential,
        parallel_mlp_norm=two_norm, mlp_gated=False, act="gelu_exact",
        qkv_bias=qkv_bias, out_bias=out_bias, mlp_bias=mlp_bias)

    def unfuse(w: np.ndarray) -> np.ndarray:
        """(qkv_out, D) fused rows -> (D, q|k|v) framework columns.
        Works on weights and (reshaped) biases alike."""
        flat = w.reshape(qkv_out, -1)
        if new_arch:
            g = flat.reshape(n_kv, n_heads // n_kv + 2, hd, -1)
            q = g[:, :-2].reshape(n_heads * hd, -1)
            k = g[:, -2].reshape(n_kv * hd, -1)
            v = g[:, -1].reshape(n_kv * hd, -1)
        elif n_kv == 1:
            q, k, v = (flat[: n_heads * hd], flat[n_heads * hd: -hd],
                       flat[-hd:])
        else:
            g = flat.reshape(n_heads, 3, hd, -1)
            q = g[:, 0].reshape(n_heads * hd, -1)
            k = g[:, 1].reshape(n_heads * hd, -1)
            v = g[:, 2].reshape(n_heads * hd, -1)
        return np.concatenate([q, k, v], axis=0)

    L: Dict[str, list] = {"attn_norm": [], "wqkv": [], "wo": [],
                          "w_gu": [], "w_down": []}
    opt = {"mlp_norm": [], "wqkv_bias": [], "wo_bias": [], "w_gu_b": [],
           "w_down_b": []}
    for i in range(n_layers):
        pre = f"transformer.h.{i}."
        if two_norm:
            L["attn_norm"].append({"g": A(pre + "ln_attn.weight"),
                                   "b": A(pre + "ln_attn.bias")})
            opt["mlp_norm"].append({"g": A(pre + "ln_mlp.weight"),
                                    "b": A(pre + "ln_mlp.bias")})
        else:
            L["attn_norm"].append({"g": A(pre + "input_layernorm.weight"),
                                   "b": A(pre + "input_layernorm.bias")})
            if sequential:
                opt["mlp_norm"].append(
                    {"g": A(pre + "post_attention_layernorm.weight"),
                     "b": A(pre + "post_attention_layernorm.bias")})
        L["wqkv"].append(
            unfuse(A(pre + "self_attention.query_key_value.weight")).T)
        L["wo"].append(A(pre + "self_attention.dense.weight").T)
        L["w_gu"].append(A(pre + "mlp.dense_h_to_4h.weight").T)
        L["w_down"].append(A(pre + "mlp.dense_4h_to_h.weight").T)
        if qkv_bias:
            opt["wqkv_bias"].append(unfuse(
                A(pre + "self_attention.query_key_value.bias"))[:, 0])
        if out_bias:
            opt["wo_bias"].append(A(pre + "self_attention.dense.bias"))
        if mlp_bias:
            opt["w_gu_b"].append(A(pre + "mlp.dense_h_to_4h.bias"))
            opt["w_down_b"].append(A(pre + "mlp.dense_4h_to_h.bias"))

    def stack(vals):
        if vals and isinstance(vals[0], dict):
            return {kk: jnp.asarray(np.stack([v[kk] for v in vals]), dtype)
                    for kk in vals[0]}
        return jnp.asarray(np.stack(vals), dtype)

    layers = {k: stack(v) for k, v in L.items()}
    layers.update({k: stack(v) for k, v in opt.items() if v})
    params = {
        "tok_emb": jnp.asarray(emb, dtype),
        "layers": layers,
        "out_norm": {"g": jnp.asarray(A("transformer.ln_f.weight"), dtype),
                     "b": jnp.asarray(A("transformer.ln_f.bias"), dtype)},
        "lm_head": jnp.asarray(
            (A("lm_head.weight").T if "lm_head.weight" in state
             else np.ascontiguousarray(emb.T)), dtype),
    }
    return params, cfg


def gguf_to_falcon_params(path: str, *, bits: Optional[int] = None,
                          group: int = 256,
                          max_seq: Optional[int] = None,
                          dtype=jnp.bfloat16) -> tuple:
    """llama.cpp falcon-arch GGUF -> (params, cfg).

    llama.cpp's converter UN-GROUPS Falcon's fused query_key_value at
    conversion time (convert_hf_to_gguf.py ``FalconModel``: the
    (n_kv, rep+2, hd) view splits to [all q group-major; k; v]) — which
    is exactly this framework's q|k|v column order, so ``attn_qkv``
    transposes straight in with no re-interleaving. Norm naming:
    ``attn_norm`` = the shared/attn LayerNorm; ``attn_norm_2`` present
    = the 40B/180B "new arch" second MLP-branch norm
    (cfg.parallel_mlp_norm). The published Falcon line is
    parallel-residual; sequential (falcon-rw) GGUFs are not expected
    here. Geometry (head counts) comes from ``falcon.attention.*``
    metadata, cross-checked against the qkv row count.

    Offline-validation caveat (same as gguf_to_mamba_params): key
    strings pinned by synthetic-GGUF roundtrips only.
    """
    gguf = read_gguf_header(path)
    arch = gguf.architecture or ""
    if arch != "falcon":
        raise TrackieError(ErrorCode.MODEL_METADATA_INVALID,
                           f"{path}: architecture {arch!r}, want 'falcon'")
    md = gguf.metadata

    def T(name: str) -> np.ndarray:
        return load_gguf_tensor(gguf, name)

    if "falcon.attention.head_count" not in md:
        raise TrackieError(ErrorCode.MODEL_METADATA_INVALID,
                           f"{path}: missing falcon.attention.head_count")
    emb = T("token_embd.weight")
    vocab, dim = emb.shape
    n_heads = int(md["falcon.attention.head_count"])
    n_kv = int(md.get("falcon.attention.head_count_kv", 1))
    hd = dim // n_heads
    n_layers = int(md.get(
        "falcon.block_count",
        len({k.split(".")[1] for k in gguf.tensors
             if k.startswith("blk.")})))
    qkv_rows = gguf.tensors["blk.0.attn_qkv.weight"].shape[0]
    if qkv_rows != (n_heads + 2 * n_kv) * hd:
        raise TrackieError(
            ErrorCode.MODEL_METADATA_INVALID,
            f"{path}: attn_qkv rows {qkv_rows} != (H+2G)*hd = "
            f"{(n_heads + 2 * n_kv) * hd} (H={n_heads}, G={n_kv})")
    two_norm = "blk.0.attn_norm_2.weight" in gguf.tensors
    qkv_bias = "blk.0.attn_qkv.bias" in gguf.tensors
    out_bias = "blk.0.attn_output.bias" in gguf.tensors
    mlp_bias = "blk.0.ffn_up.bias" in gguf.tensors
    ctx = int(md.get("falcon.context_length", 2048))
    eff_seq = max_seq if max_seq is not None else min(ctx, 4096)

    cfg = llm_model.LLMConfig(
        vocab_size=vocab, dim=dim, n_layers=n_layers, n_heads=n_heads,
        n_kv_heads=n_kv, head_dim=hd,
        hidden_dim=gguf.tensors["blk.0.ffn_up.weight"].shape[0],
        norm_eps=float(md.get("falcon.attention.layer_norm_epsilon",
                              1e-5)),
        rope_theta=float(md.get("falcon.rope.freq_base", 1e4)),
        max_seq=eff_seq, sliding_window=eff_seq, norm_type="layernorm",
        parallel_residual=True, parallel_mlp_norm=two_norm,
        mlp_gated=False, act="gelu_exact",
        qkv_bias=qkv_bias, out_bias=out_bias, mlp_bias=mlp_bias)

    L: Dict[str, list] = {"attn_norm": [], "wqkv": [], "wo": [],
                          "w_gu": [], "w_down": []}
    opt: Dict[str, list] = {"mlp_norm": [], "wqkv_bias": [],
                            "wo_bias": [], "w_gu_b": [], "w_down_b": []}
    for i in range(n_layers):
        b = f"blk.{i}."
        L["attn_norm"].append({"g": T(b + "attn_norm.weight"),
                               "b": T(b + "attn_norm.bias")})
        if two_norm:
            opt["mlp_norm"].append({"g": T(b + "attn_norm_2.weight"),
                                    "b": T(b + "attn_norm_2.bias")})
        L["wqkv"].append(T(b + "attn_qkv.weight").T)  # rows already q|k|v
        L["wo"].append(T(b + "attn_output.weight").T)
        L["w_gu"].append(T(b + "ffn_up.weight").T)
        L["w_down"].append(T(b + "ffn_down.weight").T)
        if qkv_bias:
            opt["wqkv_bias"].append(T(b + "attn_qkv.bias"))
        if out_bias:
            opt["wo_bias"].append(T(b + "attn_output.bias"))
        if mlp_bias:
            opt["w_gu_b"].append(T(b + "ffn_up.bias"))
            opt["w_down_b"].append(T(b + "ffn_down.bias"))

    def stack(vals):
        if vals and isinstance(vals[0], dict):
            return {kk: jnp.asarray(np.stack([v[kk] for v in vals]), dtype)
                    for kk in vals[0]}
        return jnp.asarray(np.stack(vals), dtype)

    layers = {k: stack(v) for k, v in L.items()}
    layers.update({k: stack(v) for k, v in opt.items() if v})
    params = {
        "tok_emb": jnp.asarray(emb, dtype),
        "layers": layers,
        "out_norm": {"g": jnp.asarray(T("output_norm.weight"), dtype),
                     "b": jnp.asarray(T("output_norm.bias"), dtype)},
        "lm_head": jnp.asarray(
            (T("output.weight").T if "output.weight" in gguf.tensors
             else np.ascontiguousarray(emb.T)), dtype),
    }
    if bits:
        params = llm_model.quantize_params(params, bits=bits, group=group)
    return params, cfg


def mamba_from_hf(state: Dict[str, Any], *, norm_eps: float = 1e-5,
                  max_seq: int = 4096, dtype=jnp.float32) -> tuple:
    """Convert a transformers Mamba state dict to (params, cfg) for
    models/mamba.py (selective-SSM family — llama.cpp's mamba arch).

    Geometry is fully shape-derived: dim/d_inner from in_proj, K from
    conv1d, dt_rank from dt_proj, d_state from A_log. SSM tensors
    (A_log, D) stay float32 — the recurrence runs in f32 like the
    oracle's slow path (modeling_mamba.py slow_forward)."""
    from trackiellm_tpu.models.mamba import MambaConfig

    A = lambda k: np.asarray(state[k], np.float32)  # noqa: E731

    emb = A("backbone.embeddings.weight")
    vocab, dim = emb.shape
    n_layers = len({k.split(".")[2] for k in state
                    if k.startswith("backbone.layers.")})
    w_in0 = A("backbone.layers.0.mixer.in_proj.weight")     # (2I, D)
    d_inner = w_in0.shape[0] // 2
    k_conv = A("backbone.layers.0.mixer.conv1d.weight").shape[-1]
    dt_rank = A("backbone.layers.0.mixer.dt_proj.weight").shape[1]
    d_state = A("backbone.layers.0.mixer.A_log").shape[1]

    cfg = MambaConfig(vocab_size=vocab, dim=dim, n_layers=n_layers,
                      d_inner=d_inner, d_state=d_state, d_conv=k_conv,
                      dt_rank=dt_rank, norm_eps=norm_eps, max_seq=max_seq)

    L = {k: [] for k in ("norm", "w_in", "conv_w", "conv_b", "w_x",
                         "w_dt", "b_dt", "A_log", "d", "w_out")}
    for i in range(n_layers):
        pre = f"backbone.layers.{i}.mixer"
        L["norm"].append(A(f"backbone.layers.{i}.norm.weight"))
        L["w_in"].append(A(f"{pre}.in_proj.weight").T)
        # conv1d.weight (I, 1, K) -> (K, I)
        L["conv_w"].append(A(f"{pre}.conv1d.weight")[:, 0, :].T)
        L["conv_b"].append(A(f"{pre}.conv1d.bias")
                           if f"{pre}.conv1d.bias" in state
                           else np.zeros(d_inner, np.float32))
        L["w_x"].append(A(f"{pre}.x_proj.weight").T)
        L["w_dt"].append(A(f"{pre}.dt_proj.weight").T)
        L["b_dt"].append(A(f"{pre}.dt_proj.bias"))
        L["A_log"].append(A(f"{pre}.A_log"))
        L["d"].append(A(f"{pre}.D"))
        L["w_out"].append(A(f"{pre}.out_proj.weight").T)

    f32_keys = {"A_log", "d"}
    params = {
        "tok_emb": jnp.asarray(emb, dtype),
        "layers": {k: jnp.asarray(np.stack(v),
                                  jnp.float32 if k in f32_keys else dtype)
                   for k, v in L.items()},
        "out_norm": jnp.asarray(A("backbone.norm_f.weight"), dtype),
        "lm_head": jnp.asarray(
            (A("lm_head.weight").T if "lm_head.weight" in state
             else np.ascontiguousarray(emb.T)), dtype),
    }
    return params, cfg


def gguf_to_mamba_params(path: str, *, bits: Optional[int] = None,
                         group: int = 256,
                         max_seq: Optional[int] = None,
                         dtype=jnp.float32) -> tuple:
    """llama.cpp mamba-arch GGUF -> (params, cfg) for models/mamba.

    llama.cpp's converter (convert_hf_to_gguf.py ``MambaModel``) stores
    the conv weight squeezed to (I, K) and ``ssm_a = -exp(A_log)``;
    this reader rebuilds the transformers layout and rides
    :func:`mamba_from_hf`. Geometry metadata (``mamba.ssm.*``) is
    cross-checked against tensor shapes so a wrong key guess fails
    loudly instead of mis-shaping silently.

    Offline-validation caveat (same as deepseek2's once was): the key
    strings follow llama.cpp's LLM_KV_SSM_* constants and
    LLM_ARCH_MAMBA tensor names, pinned here by synthetic-GGUF
    roundtrips only — zero-egress rounds can't see a real file.
    """
    gguf = read_gguf_header(path)
    arch = gguf.architecture or ""
    if arch != "mamba":
        raise TrackieError(ErrorCode.MODEL_METADATA_INVALID,
                           f"{path}: architecture {arch!r}, want 'mamba'")
    md = gguf.metadata

    def T(name: str) -> np.ndarray:
        return load_gguf_tensor(gguf, name)

    n_layers = int(md.get(
        "mamba.block_count",
        len({k.split(".")[1] for k in gguf.tensors
             if k.startswith("blk.")})))
    state: Dict[str, Any] = {
        "backbone.embeddings.weight": T("token_embd.weight"),
        "backbone.norm_f.weight": T("output_norm.weight"),
    }
    if "output.weight" in gguf.tensors:  # absent when tied to embeddings
        state["lm_head.weight"] = T("output.weight")
    for i in range(n_layers):
        b, p = f"blk.{i}.", f"backbone.layers.{i}.mixer."
        state[f"backbone.layers.{i}.norm.weight"] = T(b + "attn_norm.weight")
        state[p + "in_proj.weight"] = T(b + "ssm_in.weight")
        state[p + "conv1d.weight"] = T(b + "ssm_conv1d.weight")[:, None, :]
        state[p + "conv1d.bias"] = T(b + "ssm_conv1d.bias")
        state[p + "x_proj.weight"] = T(b + "ssm_x.weight")
        state[p + "dt_proj.weight"] = T(b + "ssm_dt.weight")
        state[p + "dt_proj.bias"] = T(b + "ssm_dt.bias")
        a = T(b + "ssm_a")
        if np.any(a >= 0):
            raise TrackieError(
                ErrorCode.MODEL_METADATA_INVALID,
                f"{path}: ssm_a has non-negative entries — llama.cpp "
                "stores -exp(A_log); refusing to mis-decode")
        state[p + "A_log"] = np.log(-a)
        state[p + "D"] = T(b + "ssm_d")
        state[p + "out_proj.weight"] = T(b + "ssm_out.weight")

    norm_eps = float(md.get("mamba.attention.layer_norm_rms_epsilon",
                            1e-5))
    ctx = int(md.get("mamba.context_length", 4096))
    params, cfg = mamba_from_hf(
        state, norm_eps=norm_eps,
        max_seq=max_seq if max_seq is not None else min(ctx, 4096),
        dtype=dtype)

    checks = {"mamba.ssm.conv_kernel": cfg.d_conv,
              "mamba.ssm.inner_size": cfg.d_inner,
              "mamba.ssm.state_size": cfg.d_state,
              "mamba.ssm.time_step_rank": cfg.dt_rank,
              "mamba.embedding_length": cfg.dim,
              "mamba.block_count": cfg.n_layers}
    for key, ours in checks.items():
        if key in md and int(md[key]) != ours:
            raise TrackieError(
                ErrorCode.MODEL_METADATA_INVALID,
                f"{path}: {key}={md[key]} disagrees with tensor shapes "
                f"({ours})")
    if bits:
        from trackiellm_tpu.models.mamba import quantize_params

        params = quantize_params(params, bits=bits, group=group)
    return params, cfg


def mamba2_from_hf(state: Dict[str, Any], *, n_groups: int = 8,
                   norm_eps: float = 1e-5, max_seq: int = 4096,
                   dt_limit: tuple = (0.0, float("inf")),
                   dtype=jnp.float32) -> tuple:
    """Convert a transformers Mamba2 state dict to (params, cfg) for
    models/mamba2.py (SSD family — llama.cpp's mamba2 arch).

    Shape-derived: n_heads from A_log, conv_dim from conv1d,
    d_inner = in_proj_out - conv_dim - n_heads, head_dim = d_inner /
    n_heads, d_state = (conv_dim - d_inner) / (2 * n_groups).
    ``n_groups`` itself is not shape-derivable — pass it from the HF
    config (published default 8)."""
    from trackiellm_tpu.models.mamba2 import Mamba2Config

    A = lambda k: np.asarray(state[k], np.float32)  # noqa: E731

    emb = A("backbone.embeddings.weight")
    vocab, dim = emb.shape
    n_layers = len({k.split(".")[2] for k in state
                    if k.startswith("backbone.layers.")})
    h = A("backbone.layers.0.mixer.A_log").shape[0]
    conv_dim = A("backbone.layers.0.mixer.conv1d.weight").shape[0]
    k_conv = A("backbone.layers.0.mixer.conv1d.weight").shape[-1]
    proj_out = A("backbone.layers.0.mixer.in_proj.weight").shape[0]
    d_inner = proj_out - conv_dim - h
    if d_inner % h or (conv_dim - d_inner) % (2 * n_groups):
        raise TrackieError(
            ErrorCode.MODEL_METADATA_INVALID,
            f"inconsistent mamba2 geometry: proj={proj_out} "
            f"conv_dim={conv_dim} heads={h} n_groups={n_groups}")
    head_dim = d_inner // h
    d_state = (conv_dim - d_inner) // (2 * n_groups)

    cfg = Mamba2Config(vocab_size=vocab, dim=dim, n_layers=n_layers,
                       n_heads=h, head_dim=head_dim, d_state=d_state,
                       n_groups=n_groups, d_conv=k_conv,
                       norm_eps=norm_eps, dt_limit=tuple(dt_limit),
                       max_seq=max_seq)

    L = {k: [] for k in ("norm", "w_in", "conv_w", "conv_b", "dt_bias",
                         "A_log", "d", "gate_norm", "w_out")}
    has_b_in = "backbone.layers.0.mixer.in_proj.bias" in state
    if has_b_in:
        L["b_in"] = []
    for i in range(n_layers):
        pre = f"backbone.layers.{i}.mixer"
        L["norm"].append(A(f"backbone.layers.{i}.norm.weight"))
        L["w_in"].append(A(f"{pre}.in_proj.weight").T)
        if has_b_in:
            L["b_in"].append(A(f"{pre}.in_proj.bias"))
        L["conv_w"].append(A(f"{pre}.conv1d.weight")[:, 0, :].T)
        L["conv_b"].append(A(f"{pre}.conv1d.bias")
                           if f"{pre}.conv1d.bias" in state
                           else np.zeros(conv_dim, np.float32))
        L["dt_bias"].append(A(f"{pre}.dt_bias"))
        L["A_log"].append(A(f"{pre}.A_log"))
        L["d"].append(A(f"{pre}.D"))
        L["gate_norm"].append(A(f"{pre}.norm.weight"))
        L["w_out"].append(A(f"{pre}.out_proj.weight").T)

    f32_keys = {"A_log", "d", "dt_bias", "gate_norm"}
    params = {
        "tok_emb": jnp.asarray(emb, dtype),
        "layers": {k: jnp.asarray(np.stack(v),
                                  jnp.float32 if k in f32_keys else dtype)
                   for k, v in L.items()},
        "out_norm": jnp.asarray(A("backbone.norm_f.weight"), dtype),
        "lm_head": jnp.asarray(
            (A("lm_head.weight").T if "lm_head.weight" in state
             else np.ascontiguousarray(emb.T)), dtype),
    }
    return params, cfg


def gemma_from_hf(
    state: Dict[str, Any],
    *,
    head_dim: int = 256,
    max_seq: int = 8192,
    norm_eps: float = 1e-6,
    rope_theta: float = 10000.0,
    prefix: str = "model.",
    head_key: str = "lm_head.weight",
    dtype=jnp.bfloat16,
) -> tuple:
    """Convert a transformers Gemma-1 state dict to (params, cfg):
    the Llama template with GeGLU (tanh), (1+w) RMSNorm fold, the
    sqrt(dim) embedding-scale fold, explicit head_dim (256 on both
    published sizes), and 1/sqrt(head_dim) attention scaling. Also the
    text half of PaliGemma (``prefix="model.language_model."``)."""
    A = lambda k: np.asarray(state[k], np.float32)  # noqa: E731
    P = prefix

    emb = A(P + "embed_tokens.weight")
    vocab, dim = emb.shape
    n_layers = len({k[len(P) + len("layers."):].split(".")[0]
                    for k in state if k.startswith(P + "layers.")})
    hd = head_dim
    n_heads = A(P + "layers.0.self_attn.q_proj.weight").shape[0] // hd
    n_kv = A(P + "layers.0.self_attn.k_proj.weight").shape[0] // hd
    hidden = A(P + "layers.0.mlp.gate_proj.weight").shape[0]

    cfg = llm_model.LLMConfig(
        vocab_size=vocab, dim=dim, n_layers=n_layers, n_heads=n_heads,
        n_kv_heads=n_kv, head_dim=hd, hidden_dim=hidden,
        norm_eps=norm_eps, rope_theta=rope_theta, max_seq=max_seq,
        sliding_window=max_seq, act="gelu")

    def norm1(k):  # (1 + w) fold
        return jnp.asarray(A(k) + 1.0, dtype)

    L = {"attn_norm": [], "wqkv": [], "wo": [], "mlp_norm": [],
         "w_gu": [], "w_down": []}
    for i in range(n_layers):
        pre = f"{P}layers.{i}"
        L["attn_norm"].append(norm1(f"{pre}.input_layernorm.weight"))
        L["mlp_norm"].append(
            norm1(f"{pre}.post_attention_layernorm.weight"))
        L["wqkv"].append(jnp.asarray(np.concatenate(
            [A(f"{pre}.self_attn.{p}_proj.weight").T
             for p in ("q", "k", "v")], axis=1), dtype))
        L["wo"].append(jnp.asarray(
            A(f"{pre}.self_attn.o_proj.weight").T, dtype))
        L["w_gu"].append(jnp.asarray(np.concatenate(
            [A(f"{pre}.mlp.gate_proj.weight").T,
             A(f"{pre}.mlp.up_proj.weight").T], axis=1), dtype))
        L["w_down"].append(jnp.asarray(
            A(f"{pre}.mlp.down_proj.weight").T, dtype))

    lm_head = (A(head_key).T if head_key in state
               else np.ascontiguousarray(emb.T))
    params = {
        "tok_emb": jnp.asarray(emb * float(np.sqrt(dim)), dtype),
        "layers": {k: jnp.stack(v) for k, v in L.items()},
        "out_norm": norm1(P + "norm.weight"),
        "lm_head": jnp.asarray(lm_head, dtype),
    }
    return params, cfg


def paligemma_from_hf(
    state: Dict[str, Any],
    *,
    head_dim: int = 256,
    max_seq: int = 8192,
    norm_eps: float = 1e-6,
    rope_theta: float = 10000.0,
    vision_n_heads: int = 16,
    vision_norm_eps: float = 1e-6,
    dtype=jnp.bfloat16,
    vision_dtype=jnp.float32,
) -> tuple:
    """Convert a transformers PaliGemma state dict to the VLM bundle
    ``(llm_params, llm_cfg, clip_params, clip_cfg)``.

    The vision tower is SigLIP (models/clip.py dialect switches:
    no CLS, patch-conv bias, no pre-LN, POST-layernorm tap, tanh-GELU),
    the projector a single linear, the text model Gemma-1
    (:func:`gemma_from_hf`). Feature scaling: HF divides projected
    features by sqrt(text_dim) and GemmaModel then multiplies ALL
    input embeddings by sqrt(text_dim) — net identity on image rows —
    so (with the embedding scale folded into tok_emb here) the
    projector output injects UNSCALED.

    PaliGemma is a PREFIX-LM: the whole input prompt attends
    bidirectionally at inference (modeling_paligemma's
    _update_causal_mask) — drive prefill with ``bidir_len`` /
    ``VLMRunner`` in prefix-LM mode.
    """
    from trackiellm_tpu.models import clip as clip_model

    A = lambda k: np.asarray(state[k], np.float32)  # noqa: E731

    if any(k.startswith("model.vision_tower.") for k in state):
        vt = "model.vision_tower.vision_model."
        lm = "model.language_model."
        proj = "model.multi_modal_projector."
        head_key = "lm_head.weight"
    else:
        vt = "vision_tower.vision_model."
        lm = "language_model.model."
        proj = "multi_modal_projector."
        head_key = "language_model.lm_head.weight"

    llm_params, llm_cfg = gemma_from_hf(
        state, head_dim=head_dim, max_seq=max_seq, norm_eps=norm_eps,
        rope_theta=rope_theta, prefix=lm, head_key=head_key, dtype=dtype)

    pw = A(vt + "embeddings.patch_embedding.weight")  # (D, 3, P, P)
    vdim, _, patch, _ = pw.shape
    pos = A(vt + "embeddings.position_embedding.weight")  # (N, D)
    n_patches = pos.shape[0]
    image_size = patch * int(round(n_patches ** 0.5))
    n_vlayers = len({k[len(vt) + len("encoder.layers."):].split(".")[0]
                     for k in state
                     if k.startswith(vt + "encoder.layers.")})
    hidden = A(vt + "encoder.layers.0.mlp.fc1.weight").shape[0]
    proj_dim = A(proj + "linear.weight").shape[0]

    clip_cfg = clip_model.CLIPVisionConfig(
        image_size=image_size, patch_size=patch, dim=vdim,
        n_layers=n_vlayers, n_heads=vision_n_heads, hidden_dim=hidden,
        norm_eps=vision_norm_eps, act="gelu_pytorch_tanh",
        feature_layer=-1, drop_cls=False, use_cls=False,
        patch_bias=True, pre_ln=False, post_ln=True,
        proj_dim=proj_dim, proj_layers=1)

    L = {k: [] for k in ("ln1_g", "ln1_b", "ln2_g", "ln2_b",
                         "wq", "bq", "wk", "bk", "wv", "bv", "wo", "bo",
                         "w1", "b1", "w2", "b2")}
    for i in range(n_vlayers):
        pre = f"{vt}encoder.layers.{i}"
        L["ln1_g"].append(A(f"{pre}.layer_norm1.weight"))
        L["ln1_b"].append(A(f"{pre}.layer_norm1.bias"))
        L["ln2_g"].append(A(f"{pre}.layer_norm2.weight"))
        L["ln2_b"].append(A(f"{pre}.layer_norm2.bias"))
        for p in ("q", "k", "v"):
            L[f"w{p}"].append(A(f"{pre}.self_attn.{p}_proj.weight").T)
            L[f"b{p}"].append(A(f"{pre}.self_attn.{p}_proj.bias"))
        L["wo"].append(A(f"{pre}.self_attn.out_proj.weight").T)
        L["bo"].append(A(f"{pre}.self_attn.out_proj.bias"))
        L["w1"].append(A(f"{pre}.mlp.fc1.weight").T)
        L["b1"].append(A(f"{pre}.mlp.fc1.bias"))
        L["w2"].append(A(f"{pre}.mlp.fc2.weight").T)
        L["b2"].append(A(f"{pre}.mlp.fc2.bias"))

    clip_params = {
        "patch_w": jnp.asarray(pw.reshape(vdim, -1).T, vision_dtype),
        "patch_b": jnp.asarray(
            A(vt + "embeddings.patch_embedding.bias"), vision_dtype),
        "pos": jnp.asarray(pos, vision_dtype),
        "post_ln_g": jnp.asarray(A(vt + "post_layernorm.weight"),
                                 vision_dtype),
        "post_ln_b": jnp.asarray(A(vt + "post_layernorm.bias"),
                                 vision_dtype),
        "layers": {k: jnp.asarray(np.stack(v), vision_dtype)
                   for k, v in L.items()},
        "proj": {
            "w1": jnp.asarray(A(proj + "linear.weight").T, vision_dtype),
            "b1": jnp.asarray(A(proj + "linear.bias"), vision_dtype),
        },
    }
    return llm_params, llm_cfg, clip_params, clip_cfg


def trocr_from_hf(state: Dict[str, Any], config: Optional[Dict[str, Any]]
                  = None, *, enc_heads: Optional[int] = None,
                  dec_heads: Optional[int] = None, max_len: int = 64,
                  dtype=jnp.float32):
    """HF TrOCR (``VisionEncoderDecoderModel``: ViT/DeiT encoder +
    TrOCR decoder — microsoft/trocr-{small,base,large}-{printed,
    handwritten}) state dict -> (params, TrOCRConfig) for
    models/trocr.py.

    Geometry is shape-derived (patch size, dims, layer counts, DeiT
    distillation token); head counts and special ids come from
    ``config`` (the HF config dict) or the explicit arguments. The OCR
    stage's published-checkpoint route — parity target: the reference's
    Tesseract engine (src/vision/tk_text_recognition.cpp:71-104).
    """
    from trackiellm_tpu.models.trocr import TrOCRConfig

    config = config or {}
    enc_cfg = config.get("encoder", {})
    dec_cfg = config.get("decoder", {})

    def A(name: str) -> np.ndarray:
        if name not in state:
            raise KeyError(name)
        return np.asarray(state[name], np.float32)

    # --- encoder geometry from shapes ---
    pw = A("encoder.embeddings.patch_embeddings.projection.weight")
    enc_dim, in_ch, ps, _ = pw.shape
    pos = A("encoder.embeddings.position_embeddings")[0]  # (S, D)
    has_dist = "encoder.embeddings.distillation_token" in state
    n_prefix = 2 if has_dist else 1
    n_patches = pos.shape[0] - n_prefix
    image_size = ps * int(round(n_patches ** 0.5))
    if image_size // ps * (image_size // ps) != n_patches:
        raise TrackieError(
            ErrorCode.MODEL_METADATA_INVALID,
            f"non-square patch grid: {n_patches} patches of {ps}px")
    n_enc = len({k.split(".")[3] for k in state
                 if k.startswith("encoder.encoder.layer.")})
    n_dec = len({k.split(".")[4] for k in state
                 if k.startswith("decoder.model.decoder.layers.")})
    emb = A("decoder.model.decoder.embed_tokens.weight")
    vocab, d_model = emb.shape
    ffn = A("decoder.model.decoder.layers.0.fc1.weight").shape[0]
    dec_pos = A("decoder.model.decoder.embed_positions.weight")
    ln_emb = "decoder.model.decoder.layernorm_embedding.weight" in state

    e_heads = enc_heads or int(enc_cfg.get("num_attention_heads") or
                               {192: 3, 384: 6, 768: 12, 1024: 16}
                               .get(enc_dim, 12))
    d_heads = dec_heads or int(dec_cfg.get("decoder_attention_heads") or
                               {256: 8, 512: 8, 1024: 16}
                               .get(d_model, 16))
    cfg = TrOCRConfig(
        image_size=int(enc_cfg.get("image_size", image_size)),
        patch_size=ps, enc_dim=enc_dim, enc_layers=n_enc,
        enc_heads=e_heads,
        enc_hidden=A("encoder.encoder.layer.0.intermediate.dense"
                     ".weight").shape[0],
        n_prefix=n_prefix,
        enc_eps=float(enc_cfg.get("layer_norm_eps", 1e-12)),
        vocab_size=vocab, d_model=d_model, dec_layers=n_dec,
        dec_heads=d_heads, dec_ffn=ffn,
        max_len=min(max_len, dec_pos.shape[0] - 2),
        scale_embedding=bool(dec_cfg.get("scale_embedding", False)),
        layernorm_embedding=ln_emb,
        dec_eps=float(dec_cfg.get("layer_norm_eps", 1e-5)),
        act=str(dec_cfg.get("activation_function", "gelu")),
        decoder_start_id=int(next(
            v for v in (config.get("decoder_start_token_id"),
                        dec_cfg.get("decoder_start_token_id"),
                        dec_cfg.get("eos_token_id"), 2)
            if v is not None)),
        eos_id=int(dec_cfg.get("eos_token_id", 2)),
        pad_id=int(dec_cfg.get("pad_token_id", 1)),
    )
    if in_ch != 3:
        raise TrackieError(ErrorCode.MODEL_METADATA_INVALID,
                           f"expected 3-channel patch conv, got {in_ch}")

    J = lambda a: jnp.asarray(a, dtype)  # noqa: E731

    prefix = [A("encoder.embeddings.cls_token")[0, 0]]
    if has_dist:
        prefix.append(A("encoder.embeddings.distillation_token")[0, 0])
    EL: Dict[str, list] = {}

    def stack_enc(nm, arrs):
        EL[nm] = jnp.stack([J(a) for a in arrs])

    pre = "encoder.encoder.layer"
    stack_enc("ln1_g", [A(f"{pre}.{i}.layernorm_before.weight")
                        for i in range(n_enc)])
    stack_enc("ln1_b", [A(f"{pre}.{i}.layernorm_before.bias")
                        for i in range(n_enc)])
    stack_enc("ln2_g", [A(f"{pre}.{i}.layernorm_after.weight")
                        for i in range(n_enc)])
    stack_enc("ln2_b", [A(f"{pre}.{i}.layernorm_after.bias")
                        for i in range(n_enc)])
    for ours, theirs in (("q", "attention.attention.query"),
                         ("k", "attention.attention.key"),
                         ("v", "attention.attention.value"),
                         ("o", "attention.output.dense")):
        stack_enc(f"w{ours}", [A(f"{pre}.{i}.{theirs}.weight").T
                               for i in range(n_enc)])
        stack_enc(f"b{ours}", [A(f"{pre}.{i}.{theirs}.bias")
                               for i in range(n_enc)])
    stack_enc("w1", [A(f"{pre}.{i}.intermediate.dense.weight").T
                     for i in range(n_enc)])
    stack_enc("b1", [A(f"{pre}.{i}.intermediate.dense.bias")
                     for i in range(n_enc)])
    stack_enc("w2", [A(f"{pre}.{i}.output.dense.weight").T
                     for i in range(n_enc)])
    stack_enc("b2", [A(f"{pre}.{i}.output.dense.bias")
                     for i in range(n_enc)])

    enc = {
        "patch_w": J(pw.reshape(enc_dim, -1).T),
        "patch_b": J(A("encoder.embeddings.patch_embeddings"
                       ".projection.bias")),
        "prefix": J(np.stack(prefix)),
        "pos": J(pos),
        "ln_g": J(A("encoder.layernorm.weight")),
        "ln_b": J(A("encoder.layernorm.bias")),
        "layers": EL,
    }

    DL: Dict[str, list] = {}
    dpre = "decoder.model.decoder.layers"

    def stack_dec(nm, arrs):
        DL[nm] = jnp.stack([J(a) for a in arrs])

    for ours, theirs in (("wq", "self_attn.q_proj"),
                         ("wk", "self_attn.k_proj"),
                         ("wv", "self_attn.v_proj"),
                         ("wo", "self_attn.out_proj"),
                         ("cq", "encoder_attn.q_proj"),
                         ("ck", "encoder_attn.k_proj"),
                         ("cv", "encoder_attn.v_proj"),
                         ("co", "encoder_attn.out_proj"),
                         ("w1", "fc1"), ("w2", "fc2")):
        stack_dec(ours, [A(f"{dpre}.{i}.{theirs}.weight").T
                         for i in range(n_dec)])
        bias_name = ("b" + ours[1:] if ours[0] == "w" else
                     "cb" + ours[1:])
        stack_dec(bias_name, [A(f"{dpre}.{i}.{theirs}.bias")
                              for i in range(n_dec)])
    for ours, theirs in (("ln_sa", "self_attn_layer_norm"),
                         ("ln_ca", "encoder_attn_layer_norm"),
                         ("ln_f", "final_layer_norm")):
        stack_dec(f"{ours}_g", [A(f"{dpre}.{i}.{theirs}.weight")
                                for i in range(n_dec)])
        stack_dec(f"{ours}_b", [A(f"{dpre}.{i}.{theirs}.bias")
                                for i in range(n_dec)])

    dec = {
        "embed": J(emb),
        "pos": J(dec_pos),
        "out_w": J(A("decoder.output_projection.weight")),
        "layers": DL,
    }
    if ln_emb:
        dec["ln_emb_g"] = J(
            A("decoder.model.decoder.layernorm_embedding.weight"))
        dec["ln_emb_b"] = J(
            A("decoder.model.decoder.layernorm_embedding.bias"))

    return {"enc": enc, "dec": dec}, cfg


def gguf_to_glm4moe_params(
    path: str,
    bits: Optional[int] = 4,
    group: int = 256,
    dtype=jnp.bfloat16,
) -> tuple:
    """Convert a llama.cpp ``glm4moe`` GGUF (GLM-4.5/4.5-Air/4.6) to
    (params, cfg) for models/llm.py — the GGUF twin of
    :func:`glm4_moe_from_hf`.

    Staged per the deepseek2 discipline: the metadata keys follow the
    conventions llama.cpp established for deepseek2's routing stack
    (``expert_gating_func``/``expert_weights_scale``/
    ``expert_weights_norm``/``expert_group_count``/
    ``leading_dense_block_count``; ``exp_probs_b.bias`` carries the
    selection-only e_score_correction_bias) and the tensor names
    mirror the qwen-family layout plus ``*_exps``/``*_shexp`` banks —
    but the REAL key strings are unvalidated offline (zero-egress;
    docs/MODELS.md). Geometry cross-checks fail loudly. Rope is
    split-half at ``rope.dimension_count`` width (Glm4Moe uses
    rotate_half natively — no interleave fold, unlike dense GLM-4)."""
    gguf = read_gguf_header(path)
    md = gguf.metadata
    t = gguf.tensors
    arch = "glm4moe"

    def key(suffix: str, default=None):
        v = md.get(f"{arch}.{suffix}", default)
        if v is None:
            raise TrackieError(ErrorCode.MODEL_METADATA_INVALID,
                               f"missing GGUF key {arch}.{suffix}")
        return v

    dim = int(key("embedding_length"))
    n_layers = int(key("block_count"))
    n_heads = int(key("attention.head_count"))
    n_kv = int(key("attention.head_count_kv", n_heads))
    hd = int(md.get(f"{arch}.attention.key_length", dim // n_heads))
    rot = int(md.get(f"{arch}.rope.dimension_count", hd // 2))
    n_experts = int(md.get(f"{arch}.expert_count", 0))
    first_k = int(md.get(f"{arch}.leading_dense_block_count", -1))
    if first_k < 0:
        first_k = sum(1 for i in range(n_layers)
                      if f"blk.{i}.ffn_gate.weight" in t)
    if not n_experts or first_k >= n_layers:
        raise TrackieError(ErrorCode.MODEL_METADATA_INVALID,
                           f"{path}: no MoE layers (dense GLM-4 loads "
                           "through the glm4 arch)")
    gating = int(_math_key(
        md, f"{arch}.expert_gating_func", 2,
        "GLM-4.5 publishes sigmoid routing"))
    shex = f"blk.{first_k}.ffn_gate_shexp.weight"
    shared_hidden = t[shex].shape[0] if shex in t else 0
    moe_hidden = int(md.get(
        f"{arch}.expert_feed_forward_length",
        t[f"blk.{first_k}.ffn_gate_exps.weight"].shape[1]))
    hidden_dense = (t["blk.0.ffn_gate.weight"].shape[0]
                    if first_k else 0)
    qk_norm = "blk.0.attn_q_norm.weight" in t
    vocab = int(md.get("tokenizer.ggml.tokens_count",
                       md.get(f"{arch}.vocab_size",
                              t["token_embd.weight"].shape[0])))

    cfg = llm_model.LLMConfig(
        vocab_size=vocab, dim=dim, n_layers=n_layers, n_heads=n_heads,
        n_kv_heads=n_kv, head_dim=hd, hidden_dim=moe_hidden,
        norm_eps=float(md.get(
            f"{arch}.attention.layer_norm_rms_epsilon", 1e-5)),
        rope_theta=float(key("rope.freq_base", 10000.0)),
        max_seq=int(key("context_length", 8192)),
        sliding_window=int(key("context_length", 8192)),
        qkv_bias="blk.0.attn_q.bias" in t, qk_norm=qk_norm,
        partial_rotary_factor=rot / hd,
        n_experts=n_experts,
        n_experts_used=int(md.get(f"{arch}.expert_used_count", 8)),
        moe_score_func="sigmoid" if gating == 2 else "softmax",
        moe_norm_topk=bool(md.get(f"{arch}.expert_weights_norm",
                                  True)),
        moe_routed_scale=float(md.get(f"{arch}.expert_weights_scale",
                                      1.0) or 1.0),
        moe_n_groups=int(md.get(f"{arch}.expert_group_count", 1) or 1),
        moe_topk_groups=int(md.get(f"{arch}.expert_group_used_count",
                                   1) or 1),
        moe_group_score="top2sum",
        moe_shared_hidden=shared_hidden, moe_shared_gated=False,
        moe_first_dense=first_k)

    quantize = (quantize_q4 if bits == 4
                else quantize_q8 if bits == 8 else None)

    def mat(name: str) -> np.ndarray:
        return np.ascontiguousarray(load_gguf_tensor(gguf, name).T)

    def vec(name: str) -> jnp.ndarray:
        return jnp.asarray(load_gguf_tensor(gguf, name), dtype)

    def maybe_quant(w):
        if quantize is None:
            return jnp.asarray(w, dtype)
        return quantize(jnp.asarray(w, jnp.float32), group)

    Ls: Dict[str, list] = {k: [] for k in (
        "attn_norm", "wqkv", "wo", "mlp_norm", "w_gu", "w_down",
        "moe_gate", "moe_gate_bias", "shared_gu", "shared_down")}
    if qk_norm:
        Ls["q_norm"], Ls["k_norm"] = [], []
    if cfg.qkv_bias:
        Ls["wqkv_bias"] = []
    if first_k:
        Ls["w_gu_mlp"], Ls["w_down_mlp"] = [], []
    for i in range(n_layers):
        p = f"blk.{i}"
        Ls["attn_norm"].append(vec(f"{p}.attn_norm.weight"))
        Ls["mlp_norm"].append(vec(f"{p}.ffn_norm.weight"))
        qkv = np.concatenate([mat(f"{p}.attn_q.weight"),
                              mat(f"{p}.attn_k.weight"),
                              mat(f"{p}.attn_v.weight")], axis=1)
        Ls["wqkv"].append(maybe_quant(qkv))
        if cfg.qkv_bias:
            Ls["wqkv_bias"].append(jnp.concatenate(
                [vec(f"{p}.attn_q.bias"), vec(f"{p}.attn_k.bias"),
                 vec(f"{p}.attn_v.bias")]))
        Ls["wo"].append(maybe_quant(mat(f"{p}.attn_output.weight")))
        if qk_norm:
            Ls["q_norm"].append(vec(f"{p}.attn_q_norm.weight"))
            Ls["k_norm"].append(vec(f"{p}.attn_k_norm.weight"))
        if i >= first_k:
            g = load_gguf_tensor(gguf, f"{p}.ffn_gate_exps.weight")
            u = load_gguf_tensor(gguf, f"{p}.ffn_up_exps.weight")
            dn = load_gguf_tensor(gguf, f"{p}.ffn_down_exps.weight")
            if g.shape != (n_experts, moe_hidden, dim):
                raise TrackieError(
                    ErrorCode.MODEL_METADATA_INVALID,
                    f"{p}.ffn_gate_exps.weight shape {g.shape} != "
                    f"(E={n_experts}, H={moe_hidden}, D={dim})")
            gu = np.concatenate([g.transpose(0, 2, 1),
                                 u.transpose(0, 2, 1)], axis=2)
            Ls["w_gu"].append(jnp.asarray(gu, dtype))
            Ls["w_down"].append(jnp.asarray(dn.transpose(0, 2, 1),
                                            dtype))
            Ls["moe_gate"].append(jnp.asarray(
                load_gguf_tensor(gguf, f"{p}.ffn_gate_inp.weight").T,
                dtype))
            Ls["moe_gate_bias"].append(jnp.asarray(
                load_gguf_tensor(gguf, f"{p}.exp_probs_b.bias")
                .reshape(-1), jnp.float32))
            Ls["shared_gu"].append(maybe_quant(np.concatenate(
                [mat(f"{p}.ffn_gate_shexp.weight"),
                 mat(f"{p}.ffn_up_shexp.weight")], axis=1)))
            Ls["shared_down"].append(
                maybe_quant(mat(f"{p}.ffn_down_shexp.weight")))
            if first_k:
                Ls["w_gu_mlp"].append(jnp.zeros(
                    (dim, 2 * hidden_dense), dtype))
                Ls["w_down_mlp"].append(jnp.zeros(
                    (hidden_dense, dim), dtype))
        else:
            Ls["w_gu"].append(jnp.zeros(
                (n_experts, dim, 2 * moe_hidden), dtype))
            Ls["w_down"].append(jnp.zeros(
                (n_experts, moe_hidden, dim), dtype))
            Ls["moe_gate"].append(jnp.zeros((dim, n_experts), dtype))
            Ls["moe_gate_bias"].append(jnp.zeros((n_experts,),
                                                 jnp.float32))
            Ls["shared_gu"].append(jnp.zeros(
                (dim, 2 * shared_hidden), dtype))
            Ls["shared_down"].append(jnp.zeros((shared_hidden, dim),
                                               dtype))
            Ls["w_gu_mlp"].append(jnp.asarray(np.concatenate(
                [mat(f"{p}.ffn_gate.weight"),
                 mat(f"{p}.ffn_up.weight")], axis=1), dtype))
            Ls["w_down_mlp"].append(jnp.asarray(
                mat(f"{p}.ffn_down.weight"), dtype))
        log.info("converted glm4moe layer %d/%d", i + 1, n_layers)

    def stack(items):
        from trackiellm_tpu.ops.quant import QuantizedLinear

        if items and isinstance(items[0], QuantizedLinear):
            return QuantizedLinear(
                values=jnp.stack([q.values for q in items]),
                scales=jnp.stack([q.scales for q in items]))
        return jnp.stack(items)

    tok_emb = load_gguf_tensor(gguf, "token_embd.weight")
    lm_head = (mat("output.weight") if "output.weight" in t
               else np.ascontiguousarray(tok_emb.T))
    params = {
        "tok_emb": jnp.asarray(tok_emb, dtype),
        "layers": {k: stack(v) for k, v in Ls.items()},
        "out_norm": vec("output_norm.weight"),
        "lm_head": maybe_quant(lm_head),
    }
    return params, cfg


def ast_from_hf(state: Dict[str, Any],
                config: Optional[Dict[str, Any]] = None,
                *, n_heads: int = 0, dtype=jnp.float32):
    """HF ``ASTForAudioClassification`` (MIT/ast-finetuned-audioset-*)
    state dict -> (params, ASTConfig, labels) for models/ast.py — the
    ambient sound classifier's published-checkpoint route (parity
    target: the reference's ONNX classifier,
    src/audio/tk_sound_classifier.c:14).

    Geometry is shape-derived where possible (dim, patch, layer count,
    label count); the strides and input frame/mel extents come from
    ``config`` (the HF config dict — not derivable from weights alone;
    pos-embedding length cross-checks them loudly). ``labels`` is the
    ordered id2label list (empty when the config carries none)."""
    from trackiellm_tpu.models.ast import ASTConfig

    config = config or {}
    pre = "audio_spectrogram_transformer"

    def A(name: str) -> np.ndarray:
        if name not in state:
            raise KeyError(name)
        return np.asarray(state[name], np.float32)

    pw = A(f"{pre}.embeddings.patch_embeddings.projection.weight")
    dim, in_ch, patch, _ = pw.shape
    if in_ch != 1:
        raise TrackieError(ErrorCode.MODEL_METADATA_INVALID,
                           f"expected 1-channel patch conv, got {in_ch}")
    n_layers = len({k.split(".")[3] for k in state
                    if k.startswith(f"{pre}.encoder.layer.")})
    head_w = A("classifier.dense.weight")
    n_labels = head_w.shape[0]
    pos = A(f"{pre}.embeddings.position_embeddings")[0]

    cfg = ASTConfig(
        n_mels=int(config.get("num_mel_bins", 128)),
        n_frames=int(config.get("max_length", 1024)),
        patch=patch,
        fstride=int(config.get("frequency_stride", 10)),
        tstride=int(config.get("time_stride", 10)),
        dim=dim, n_layers=n_layers,
        n_heads=n_heads or int(config.get("num_attention_heads")
                               or {192: 3, 384: 6, 768: 12}.get(dim,
                                                                12)),
        hidden=A(f"{pre}.encoder.layer.0.intermediate.dense.weight"
                 ).shape[0],
        eps=float(config.get("layer_norm_eps", 1e-12)),
        n_labels=n_labels)
    if pos.shape[0] != cfg.n_patches + 2:
        raise TrackieError(
            ErrorCode.MODEL_METADATA_INVALID,
            f"position embeddings carry {pos.shape[0]} tokens but the "
            f"config geometry gives {cfg.n_patches}+2 — check "
            f"num_mel_bins/max_length/strides")

    J = lambda a: jnp.asarray(a, dtype)  # noqa: E731
    L: Dict[str, list] = {}

    def stack(nm, arrs):
        L[nm] = jnp.stack([J(a) for a in arrs])

    lp = f"{pre}.encoder.layer"
    stack("ln1_g", [A(f"{lp}.{i}.layernorm_before.weight")
                    for i in range(n_layers)])
    stack("ln1_b", [A(f"{lp}.{i}.layernorm_before.bias")
                    for i in range(n_layers)])
    stack("ln2_g", [A(f"{lp}.{i}.layernorm_after.weight")
                    for i in range(n_layers)])
    stack("ln2_b", [A(f"{lp}.{i}.layernorm_after.bias")
                    for i in range(n_layers)])
    for ours, theirs in (("q", "attention.attention.query"),
                         ("k", "attention.attention.key"),
                         ("v", "attention.attention.value"),
                         ("o", "attention.output.dense")):
        stack(f"w{ours}", [A(f"{lp}.{i}.{theirs}.weight").T
                           for i in range(n_layers)])
        stack(f"b{ours}", [A(f"{lp}.{i}.{theirs}.bias")
                           for i in range(n_layers)])
    stack("w1", [A(f"{lp}.{i}.intermediate.dense.weight").T
                 for i in range(n_layers)])
    stack("b1", [A(f"{lp}.{i}.intermediate.dense.bias")
                 for i in range(n_layers)])
    stack("w2", [A(f"{lp}.{i}.output.dense.weight").T
                 for i in range(n_layers)])
    stack("b2", [A(f"{lp}.{i}.output.dense.bias")
                 for i in range(n_layers)])

    params = {
        "patch_w": J(pw),
        "patch_b": J(A(f"{pre}.embeddings.patch_embeddings"
                       ".projection.bias")),
        "prefix": J(np.stack(
            [A(f"{pre}.embeddings.cls_token")[0, 0],
             A(f"{pre}.embeddings.distillation_token")[0, 0]])),
        "pos": J(pos),
        "ln_g": J(A(f"{pre}.layernorm.weight")),
        "ln_b": J(A(f"{pre}.layernorm.bias")),
        "head_ln_g": J(A("classifier.layernorm.weight")),
        "head_ln_b": J(A("classifier.layernorm.bias")),
        "head_w": J(head_w.T),
        "head_b": J(A("classifier.dense.bias")),
        "layers": L,
    }
    id2label = config.get("id2label") or {}
    labels = [str(id2label.get(str(i), id2label.get(i, "")))
              for i in range(n_labels)] if id2label else []
    return params, cfg, labels


def qwen3_next_from_hf(state: Dict[str, Any],
                       config: Optional[Dict[str, Any]] = None,
                       *, max_seq: int = 512, dtype=jnp.float32):
    """HF ``Qwen3NextForCausalLM`` state dict -> (params,
    Qwen3NextConfig) for models/qwen3next.py (the hybrid
    Gated-DeltaNet / gated-attention family).

    The fused projections un-fuse at conversion (exact — linear row
    slices): the attention ``q_proj`` packs per-head [query | gate]
    (kept fused, the runtime splits per head); the DeltaNet
    ``in_proj_qkvz`` groups rows per K-head as [q, k, v, z] and
    ``in_proj_ba`` as [b, a] — both regrouped into separate global
    wq/wk/wv/wz/wb/wa so the runtime needs no reordering. Geometry is
    shape-derived; per-layer type from tensor presence
    (``linear_attn`` vs ``self_attn``); zero-centered RMSNorm weights
    are stored raw (the runtime applies the 1+w convention)."""
    from trackiellm_tpu.models.qwen3next import Qwen3NextConfig

    config = config or {}

    def A(name: str) -> np.ndarray:
        if name not in state:
            raise KeyError(name)
        return np.asarray(state[name], np.float32)

    emb = A("model.embed_tokens.weight")
    vocab, dim = emb.shape
    n_layers = len({k.split(".")[2] for k in state
                    if k.startswith("model.layers.")})
    layer_types = tuple(
        "l" if f"model.layers.{i}.linear_attn.in_proj_qkvz.weight"
        in state else "f" for i in range(n_layers))
    if "l" not in layer_types or "f" not in layer_types:
        log.warning("qwen3_next: homogeneous layer_types %s — "
                    "published checkpoints interleave both",
                    layer_types)

    li_lin = layer_types.index("l")
    li_full = layer_types.index("f") if "f" in layer_types else None
    hv = A(f"model.layers.{li_lin}.linear_attn.dt_bias").shape[0]
    conv_w = A(f"model.layers.{li_lin}.linear_attn.conv1d.weight")
    conv_dim, _, conv_k = conv_w.shape
    hk = int(config.get("linear_num_key_heads", 0))
    dk = int(config.get("linear_key_head_dim", 0))
    dv = int(config.get("linear_value_head_dim", 0))
    if not (hk and dk and dv):
        raise TrackieError(
            ErrorCode.MODEL_METADATA_INVALID,
            "qwen3_next needs linear_num_key_heads / "
            "linear_key_head_dim / linear_value_head_dim from the HF "
            "config (head splits are not shape-derivable)")
    if conv_dim != 2 * hk * dk + hv * dv:
        raise TrackieError(
            ErrorCode.MODEL_METADATA_INVALID,
            f"conv1d carries {conv_dim} channels but the config "
            f"geometry gives {2 * hk * dk + hv * dv}")

    hd = int(config.get("head_dim", 0))
    n_heads = int(config.get("num_attention_heads", 0))
    n_kv = int(config.get("num_key_value_heads", 0))
    if li_full is not None:
        if not hd:
            # q_proj packs [query | gate] per head, so head_dim is not
            # shape-derivable alone — a silent default would load a
            # consistently-WRONG head split. Fail loudly.
            raise TrackieError(
                ErrorCode.MODEL_METADATA_INVALID,
                "qwen3_next needs head_dim from the HF config (the "
                "fused [query|gate] q_proj hides it from shapes)")
        k_w = A(f"model.layers.{li_full}.self_attn.k_proj.weight")
        q_w = A(f"model.layers.{li_full}.self_attn.q_proj.weight")
        if not n_heads:
            n_heads = q_w.shape[0] // (2 * hd)
        if not n_kv:
            n_kv = k_w.shape[0] // hd
    elif not hd:
        hd = 16  # linear-only stacks never touch attention shapes

    n_experts = int(config.get("num_experts", 0))
    moe = f"model.layers.0.mlp.gate.weight" in state or any(
        f"model.layers.{i}.mlp.gate.weight" in state
        for i in range(n_layers))
    moe_hidden = shared_hidden = hidden = 0
    if moe:
        li_moe = next(i for i in range(n_layers)
                      if f"model.layers.{i}.mlp.gate.weight" in state)
        e0 = f"model.layers.{li_moe}.mlp.experts"
        n_experts = len({k.split(".")[5] for k in state
                         if k.startswith(e0 + ".")})
        moe_hidden = A(f"{e0}.0.gate_proj.weight").shape[0]
        shared_hidden = A(f"model.layers.{li_moe}.mlp.shared_expert"
                          ".gate_proj.weight").shape[0]
    else:
        hidden = A("model.layers.0.mlp.gate_proj.weight").shape[0]
        n_experts = 0

    cfg = Qwen3NextConfig(
        vocab_size=vocab, dim=dim, n_layers=n_layers,
        layer_types=layer_types,
        n_heads=n_heads, n_kv_heads=n_kv, head_dim=hd,
        partial_rotary_factor=float(
            config.get("partial_rotary_factor", 0.25)),
        rope_theta=float(config.get("rope_theta", 10000.0)),
        lin_k_heads=hk, lin_v_heads=hv, lin_dk=dk, lin_dv=dv,
        conv_k=conv_k,
        hidden_dim=hidden or moe_hidden,
        n_experts=n_experts,
        n_experts_used=int(config.get("num_experts_per_tok", 2)),
        moe_hidden=moe_hidden, shared_hidden=shared_hidden,
        norm_topk=bool(config.get("norm_topk_prob", True)),
        norm_eps=float(config.get("rms_norm_eps", 1e-6)),
        max_seq=max_seq)

    J = lambda a: jnp.asarray(a, dtype)  # noqa: E731
    layers = []
    rep = hv // hk
    for i in range(n_layers):
        pre = f"model.layers.{i}"
        lp: Dict[str, Any] = {
            "attn_norm": J(A(f"{pre}.input_layernorm.weight")),
            "mlp_norm": J(A(f"{pre}.post_attention_layernorm.weight")),
        }
        if layer_types[i] == "f":
            ap = f"{pre}.self_attn"
            lp["wq"] = J(A(f"{ap}.q_proj.weight").T)  # [q|gate]/head
            lp["wk"] = J(A(f"{ap}.k_proj.weight").T)
            lp["wv"] = J(A(f"{ap}.v_proj.weight").T)
            lp["wo"] = J(A(f"{ap}.o_proj.weight").T)
            lp["q_norm"] = J(A(f"{ap}.q_norm.weight"))
            lp["k_norm"] = J(A(f"{ap}.k_norm.weight"))
        else:
            ap = f"{pre}.linear_attn"
            qkvz = A(f"{ap}.in_proj_qkvz.weight")      # (rows, D)
            ba = A(f"{ap}.in_proj_ba.weight")
            gsz = 2 * dk + 2 * rep * dv
            qs, ks, vs, zs, bs, as_ = [], [], [], [], [], []
            for g in range(hk):
                base = g * gsz
                qs.append(qkvz[base: base + dk])
                ks.append(qkvz[base + dk: base + 2 * dk])
                vs.append(qkvz[base + 2 * dk: base + 2 * dk
                               + rep * dv])
                zs.append(qkvz[base + 2 * dk + rep * dv: base + gsz])
                b2 = g * 2 * rep
                bs.append(ba[b2: b2 + rep])
                as_.append(ba[b2 + rep: b2 + 2 * rep])
            lp["wq"] = J(np.concatenate(qs).T)
            lp["wk"] = J(np.concatenate(ks).T)
            lp["wv"] = J(np.concatenate(vs).T)
            lp["wz"] = J(np.concatenate(zs).T)
            lp["wb"] = J(np.concatenate(bs).T)
            lp["wa"] = J(np.concatenate(as_).T)
            lp["conv_w"] = J(A(f"{ap}.conv1d.weight")[:, 0, :])
            lp["dt_bias"] = J(A(f"{ap}.dt_bias"))
            lp["a_log"] = J(A(f"{ap}.A_log"))
            lp["o_norm"] = J(A(f"{ap}.norm.weight"))
            lp["wo"] = J(A(f"{ap}.out_proj.weight").T)
        if f"{pre}.mlp.gate.weight" in state:
            lp["moe_gate"] = J(A(f"{pre}.mlp.gate.weight").T)
            ne = cfg.n_experts
            lp["w_gu"] = J(np.stack([np.concatenate(
                [A(f"{pre}.mlp.experts.{e}.gate_proj.weight").T,
                 A(f"{pre}.mlp.experts.{e}.up_proj.weight").T],
                axis=1) for e in range(ne)]))
            lp["w_down"] = J(np.stack(
                [A(f"{pre}.mlp.experts.{e}.down_proj.weight").T
                 for e in range(ne)]))
            lp["shared_gu"] = J(np.concatenate(
                [A(f"{pre}.mlp.shared_expert.gate_proj.weight").T,
                 A(f"{pre}.mlp.shared_expert.up_proj.weight").T],
                axis=1))
            lp["shared_down"] = J(
                A(f"{pre}.mlp.shared_expert.down_proj.weight").T)
            lp["shared_gate"] = J(
                A(f"{pre}.mlp.shared_expert_gate.weight").T)
        else:
            lp["w_gu"] = J(np.concatenate(
                [A(f"{pre}.mlp.gate_proj.weight").T,
                 A(f"{pre}.mlp.up_proj.weight").T], axis=1))
            lp["w_down"] = J(A(f"{pre}.mlp.down_proj.weight").T)
        layers.append(lp)

    params = {
        "tok_emb": J(emb),
        "layers": layers,
        "out_norm": J(A("model.norm.weight")),
        "lm_head": J(A("lm_head.weight").T
                     if "lm_head.weight" in state
                     else np.ascontiguousarray(emb.T)),
    }
    return params, cfg


def gguf_to_qwen3next_params(path: str, *, bits: Optional[int] = None,
                             group: int = 256, max_seq: int = 512,
                             dtype=jnp.float32) -> tuple:
    """llama.cpp ``qwen3next`` GGUF -> (params, Qwen3NextConfig) —
    the GGUF twin of :func:`qwen3_next_from_hf` (the reference's
    parity bar: it serves whatever llama.cpp loads,
    src/ai_models/tk_model_loader.c:199).

    Strategy (the gguf_to_mamba_params pattern): rebuild the HF
    ``Qwen3NextForCausalLM`` state-dict names + a config dict from the
    GGUF, then ride the oracle-validated HF converter — all fused
    projection regrouping logic is reused, never duplicated.

    Staged per the glm4moe/llama4 discipline (zero-egress round; key
    strings follow llama.cpp's LLM_ARCH_QWEN3NEXT conventions but are
    unvalidated against a real file — docs/MODELS.md):

    - layer types derive from TENSOR PRESENCE (``blk.N.ssm_in`` =
      Gated-DeltaNet layer, ``blk.N.attn_q`` = gated full attention),
      never from a metadata pattern key;
    - the attention output gate handles BOTH plausible conventions by
      GEOMETRY: a separate ``attn_gate.weight`` (re-interleaved into
      the HF fused per-head [q|gate] ``q_proj``) or an already-fused
      ``attn_q`` with 2*H*hd rows;
    - ``ssm_a`` sign-detected: all-negative entries mean llama.cpp's
      mamba-style ``-exp(A_log)`` fold (inverted here), anything else
      is raw ``A_log`` (HF stores log(A) with A in (1, 16) — strictly
      positive, so the two encodings cannot be confused);
    - linear-attention head geometry: ``hv`` from ``ssm_dt.bias``,
      ``hv*dv`` from (qkvz_rows - conv_dim), ``dk`` from
      ``qwen3next.ssm.state_size`` when present else the published
      dk=dv square heuristic (loud _math_key warning;
      TRACKIE_GGUF_STRICT=1 fails instead) — then ``hk*dk`` closes
      from the conv width and everything cross-checks in the HF
      converter's geometry equation.
    """
    gguf = read_gguf_header(path)
    arch = gguf.architecture or ""
    if arch != "qwen3next":
        raise TrackieError(
            ErrorCode.MODEL_METADATA_INVALID,
            f"{path}: architecture {arch!r}, want 'qwen3next'")
    md = gguf.metadata
    t = gguf.tensors

    def T(name: str) -> np.ndarray:
        return load_gguf_tensor(gguf, name)

    n_layers = int(md.get(
        f"{arch}.block_count",
        len({k.split(".")[1] for k in t if k.startswith("blk.")})))
    dim = int(md.get(f"{arch}.embedding_length",
                     t["token_embd.weight"].shape[1]))
    lin_layers = [i for i in range(n_layers)
                  if f"blk.{i}.ssm_in.weight" in t]
    full_layers = [i for i in range(n_layers)
                   if f"blk.{i}.attn_q.weight" in t]
    if sorted(lin_layers + full_layers) != list(range(n_layers)):
        raise TrackieError(
            ErrorCode.MODEL_METADATA_INVALID,
            f"{path}: layers {sorted(set(range(n_layers)) - set(lin_layers) - set(full_layers))} "
            "carry neither ssm_in nor attn_q")

    # --- linear-attention geometry (see docstring) ---
    li = lin_layers[0] if lin_layers else None
    has_moe = any(f"blk.{i}.ffn_gate_exps.weight" in t
                  for i in range(n_layers))
    config: Dict[str, Any] = {
        "rms_norm_eps": float(md.get(
            f"{arch}.attention.layer_norm_rms_epsilon", 1e-6)),
        # Math-bearing keys ride the strict/warn discipline — the
        # published 80B-A3B uses rope_theta 10,000,000 and top-10
        # routing, so silent llama-ish defaults would be garbage.
        "rope_theta": (float(_math_key(
            md, f"{arch}.rope.freq_base", 10000.0,
            "llama.cpp default; published Qwen3-Next uses 1e7"))
            if full_layers else 10000.0),
        "num_experts_per_tok": (int(_math_key(
            md, f"{arch}.expert_used_count", 2,
            "qwen-MoE default; published Qwen3-Next routes top-10"))
            if has_moe else 2),
        "norm_topk_prob": True,
    }
    if li is not None:
        hv = t[f"blk.{li}.ssm_dt.bias"].shape[0]
        qkvz_rows = t[f"blk.{li}.ssm_in.weight"].shape[0]
        conv_dim = t[f"blk.{li}.ssm_conv1d.weight"].shape[0]
        hv_dv = qkvz_rows - conv_dim
        if hv_dv <= 0 or hv_dv % hv:
            raise TrackieError(
                ErrorCode.MODEL_METADATA_INVALID,
                f"{path}: qkvz rows {qkvz_rows} / conv width "
                f"{conv_dim} / dt heads {hv} are inconsistent")
        dv = hv_dv // hv
        dk = int(_math_key(
            md, f"{arch}.ssm.state_size", dv,
            "published Qwen3-Next uses square dk=dv heads"))
        hk2dk = conv_dim - hv * dv
        if hk2dk <= 0 or hk2dk % (2 * dk):
            raise TrackieError(
                ErrorCode.MODEL_METADATA_INVALID,
                f"{path}: conv width {conv_dim} minus value channels "
                f"{hv * dv} is not a multiple of 2*dk={2 * dk}")
        hk = hk2dk // (2 * dk)
        config.update(linear_num_key_heads=hk, linear_key_head_dim=dk,
                      linear_value_head_dim=dv)
        for key, ours in ((f"{arch}.ssm.group_count", hk),
                          (f"{arch}.ssm.inner_size", hv * dv),
                          (f"{arch}.ssm.conv_kernel",
                           t[f"blk.{li}.ssm_conv1d.weight"].shape[-1])):
            if key in md and int(md[key]) != ours:
                raise TrackieError(
                    ErrorCode.MODEL_METADATA_INVALID,
                    f"{path}: {key}={md[key]} disagrees with tensor "
                    f"shapes ({ours})")

    # --- full-attention geometry ---
    if full_layers:
        fi = full_layers[0]
        n_heads = int(md.get(f"{arch}.attention.head_count", 0))
        n_kv = int(md.get(f"{arch}.attention.head_count_kv", n_heads))
        if not (n_heads and n_kv):
            raise TrackieError(
                ErrorCode.MODEL_METADATA_INVALID,
                f"{path}: missing {arch}.attention.head_count[_kv]")
        hd = t[f"blk.{fi}.attn_k.weight"].shape[0] // n_kv
        if f"{arch}.attention.key_length" in md and int(
                md[f"{arch}.attention.key_length"]) != hd:
            raise TrackieError(
                ErrorCode.MODEL_METADATA_INVALID,
                f"{path}: attention.key_length="
                f"{md[f'{arch}.attention.key_length']} disagrees with "
                f"attn_k rows ({hd} per kv head)")
        config.update(num_attention_heads=n_heads,
                      num_key_value_heads=n_kv, head_dim=hd,
                      partial_rotary_factor=float(_math_key(
                          md, f"{arch}.rope.dimension_count",
                          0.25 * hd,
                          "published Qwen3-Next partial rotary 0.25"
                      )) / hd)

    # --- rebuild the HF state dict ---
    state: Dict[str, Any] = {
        "model.embed_tokens.weight": T("token_embd.weight"),
        "model.norm.weight": T("output_norm.weight"),
    }
    if "output.weight" in t:
        state["lm_head.weight"] = T("output.weight")
    for i in range(n_layers):
        b, p = f"blk.{i}.", f"model.layers.{i}."
        state[p + "input_layernorm.weight"] = T(b + "attn_norm.weight")
        state[p + "post_attention_layernorm.weight"] = T(
            b + "ffn_norm.weight")
        if i in lin_layers:
            la = p + "linear_attn."
            state[la + "in_proj_qkvz.weight"] = T(b + "ssm_in.weight")
            state[la + "in_proj_ba.weight"] = T(
                b + "ssm_beta_alpha.weight")
            state[la + "conv1d.weight"] = T(
                b + "ssm_conv1d.weight")[:, None, :]
            state[la + "dt_bias"] = T(b + "ssm_dt.bias")
            a = T(b + "ssm_a")
            if np.all(a < 0):
                a = np.log(-a)  # llama.cpp mamba-style -exp(A_log)
                log.info("gguf qwen3next: ssm_a decoded as -exp(A_log)"
                         " (all-negative entries)")
            state[la + "A_log"] = a
            state[la + "norm.weight"] = T(b + "ssm_norm.weight")
            state[la + "out_proj.weight"] = T(b + "ssm_out.weight")
        else:
            sa = p + "self_attn."
            q = T(b + "attn_q.weight")
            hd = config["head_dim"]
            n_heads = config["num_attention_heads"]
            if f"blk.{i}.attn_gate.weight" in t:
                # Split convention: re-interleave per head into the HF
                # fused [q|gate] layout the oracle converter expects.
                g = T(b + "attn_gate.weight")
                if q.shape[0] != n_heads * hd or g.shape != q.shape:
                    raise TrackieError(
                        ErrorCode.MODEL_METADATA_INVALID,
                        f"{path}: blk.{i} attn_q {q.shape} / "
                        f"attn_gate {g.shape} vs H={n_heads}, "
                        f"hd={hd}")
                q = np.concatenate(
                    [q.reshape(n_heads, hd, dim),
                     g.reshape(n_heads, hd, dim)],
                    axis=1).reshape(n_heads * 2 * hd, dim)
            elif q.shape[0] != n_heads * 2 * hd:
                raise TrackieError(
                    ErrorCode.MODEL_METADATA_INVALID,
                    f"{path}: blk.{i} attn_q rows {q.shape[0]} match "
                    f"neither the fused 2*H*hd={2 * n_heads * hd} nor "
                    f"the split H*hd={n_heads * hd} (+attn_gate) "
                    "layout")
            state[sa + "q_proj.weight"] = q
            state[sa + "k_proj.weight"] = T(b + "attn_k.weight")
            state[sa + "v_proj.weight"] = T(b + "attn_v.weight")
            state[sa + "o_proj.weight"] = T(b + "attn_output.weight")
            state[sa + "q_norm.weight"] = T(b + "attn_q_norm.weight")
            state[sa + "k_norm.weight"] = T(b + "attn_k_norm.weight")
        if f"blk.{i}.ffn_gate_exps.weight" in t:
            g = T(b + "ffn_gate_exps.weight")
            u = T(b + "ffn_up_exps.weight")
            dn = T(b + "ffn_down_exps.weight")
            n_experts = g.shape[0]
            if f"{arch}.expert_count" in md and int(
                    md[f"{arch}.expert_count"]) != n_experts:
                raise TrackieError(
                    ErrorCode.MODEL_METADATA_INVALID,
                    f"{path}: expert_count="
                    f"{md[f'{arch}.expert_count']} but the banks "
                    f"carry {n_experts} experts")
            state[p + "mlp.gate.weight"] = T(b + "ffn_gate_inp.weight")
            for e in range(n_experts):
                ep = p + f"mlp.experts.{e}."
                state[ep + "gate_proj.weight"] = g[e]
                state[ep + "up_proj.weight"] = u[e]
                state[ep + "down_proj.weight"] = dn[e]
            state[p + "mlp.shared_expert.gate_proj.weight"] = T(
                b + "ffn_gate_shexp.weight")
            state[p + "mlp.shared_expert.up_proj.weight"] = T(
                b + "ffn_up_shexp.weight")
            state[p + "mlp.shared_expert.down_proj.weight"] = T(
                b + "ffn_down_shexp.weight")
            state[p + "mlp.shared_expert_gate.weight"] = T(
                b + "ffn_gate_inp_shexp.weight")
        else:
            state[p + "mlp.gate_proj.weight"] = T(b + "ffn_gate.weight")
            state[p + "mlp.up_proj.weight"] = T(b + "ffn_up.weight")
            state[p + "mlp.down_proj.weight"] = T(b + "ffn_down.weight")

    ctx = int(md.get(f"{arch}.context_length", max_seq))
    params, cfg = qwen3_next_from_hf(state, config,
                                     max_seq=min(ctx, max_seq),
                                     dtype=dtype)
    if bits:
        from trackiellm_tpu.models.qwen3next import quantize_params

        params = quantize_params(params, bits=bits, group=group)
    return params, cfg


def openwakeword_verifier_from_onnx(state: Dict[str, Any]):
    """Published openwakeword per-keyword verifier ONNX initializers ->
    :class:`trackiellm_tpu.audio.wake_word.VerifierHead`.

    The verifier is a plain dense stack (the ROADMAP's "ingestible in
    minutes" half of openwakeword; the speech-embedding tower stays a
    first-contact decision). Keras/tf2onnx exports carry unstable
    initializer names, so the chain is reconstructed by GEOMETRY, not
    names: collect the 2-D matrices and 1-D biases, pair each matrix
    with the bias matching its output width, orient matrices as
    (in, out) (transposing (out, in) exports when only that
    orientation chains), and order the pairs by connectivity — the
    unique sequence where each layer's input width equals the previous
    layer's output width and the final width is 1. Ambiguous or
    non-chaining inventories fail loudly rather than guessing."""
    from trackiellm_tpu.audio.wake_word import VerifierHead

    mats = []
    biases = []
    for k, v in state.items():
        a = np.asarray(v, np.float32)
        if a.ndim == 2:
            mats.append((k, a))
        elif a.ndim == 1 and a.size > 0:
            biases.append((k, a))
    if not mats:
        raise TrackieError(ErrorCode.MODEL_METADATA_INVALID,
                           "verifier ONNX carries no 2-D matrices")

    # Pair each matrix with a bias of matching output width, trying
    # both orientations; prefer the orientation whose output width has
    # a bias (dense layers always carry one in these exports).
    by_width: Dict[int, list] = {}
    for k, b in biases:
        by_width.setdefault(b.shape[0], []).append(b)

    def orient(a: np.ndarray):
        """Yield candidate (in_dim, out_dim, w) orientations."""
        yield a.shape[0], a.shape[1], a
        if a.shape[0] != a.shape[1]:
            yield a.shape[1], a.shape[0], a.T

    # Build the chain ending at width 1 by working backwards.
    remaining = [a for _, a in mats]
    chain = []
    want_out = 1
    while remaining:
        matches = []
        for i, a in enumerate(remaining):
            for din, dout, w in orient(a):
                if dout == want_out:
                    matches.append((i, din, w))
        if not matches:
            raise TrackieError(
                ErrorCode.MODEL_METADATA_INVALID,
                f"no matrix produces width {want_out}; shapes: "
                f"{[a.shape for a in remaining]}")
        dins = {din for _, din, _ in matches}
        if len(matches) > 1 and len(dins) > 1:
            raise TrackieError(
                ErrorCode.MODEL_METADATA_INVALID,
                f"ambiguous chain at width {want_out}: candidate "
                f"input widths {sorted(dins)}")
        i, din, w = matches[0]
        pool = by_width.get(want_out, [])
        if len(pool) > 1:
            # Same-width dense layers: bias PAIRING is ambiguous by
            # geometry alone (pop in reverse-chain order — correct for
            # sequential exports, where initializers appear in layer
            # order; a real file that violates this needs a name map).
            log.warning(
                "openwakeword verifier: %d biases share width %d — "
                "pairing by initializer order; verify against the "
                "real graph on first contact", len(pool), want_out)
        b = pool.pop() if pool else np.zeros(want_out, np.float32)
        chain.append((w, b))
        remaining.pop(i)
        want_out = din
    chain.reverse()
    return VerifierHead(chain)


def gguf_convert_auto(path: str, bits: Optional[int] = None) -> tuple:
    """ONE arch->converter dispatch for GGUF files, shared by the CLI
    (__main__ convert) and the first-contact harness so the probe can
    never validate a different conversion route than the product uses
    (review round-5 finding: the two hand-maintained if/elif chains
    had already diverged once). Returns (params, cfg)."""
    arch = read_gguf_header(path).architecture or ""
    table = {
        "deepseek2": gguf_to_mla_params,
        "mamba": gguf_to_mamba_params,
        "falcon": gguf_to_falcon_params,
        "llama4": gguf_to_llama4_params,
        "glm4moe": gguf_to_glm4moe_params,
        "qwen3next": gguf_to_qwen3next_params,
    }
    fn = table.get(arch, gguf_to_llm_params)
    return fn(path, bits=bits)
