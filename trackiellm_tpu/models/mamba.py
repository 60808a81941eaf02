"""Mamba (selective state-space) family — TPU-native.

The llama.cpp engine family the reference embeds supports the mamba
arch (state-space models: mamba-130m..2.8b, falcon-mamba); this module
is the rebuild's equivalent, validated oracle-exact against
``transformers.MambaForCausalLM`` (modeling_mamba.py slow_forward).

TPU-first design — the recurrence is NOT a Python loop:

- **Prefill/extend run as one `jax.lax.associative_scan`** over the
  diagonal SSM: h_t = dA_t * h_{t-1} + dB_t x_t is associative in
  (a, b) pairs with (aL,bL)⊕(aR,bR) = (aL*aR, bL*aR + bR), so the
  whole prompt costs O(log S) scan depth on the VPU instead of S
  sequential steps (the CUDA world's "parallel scan" kernel, as an
  XLA-native formulation). A chunk's initial state folds into the
  first element (b0 += a0*h0), which makes chunked prefill exact.
- **The depthwise causal conv** (width K) is K shifted elementwise
  multiply-adds over the concatenated [conv_state, x] sequence — XLA
  fuses them into one pass; no conv program.
- **Decode** is a single fused step per token over a scan of stacked
  layer params, with a (conv, ssm) state cache — the recurrent
  analogue of the KV cache, O(1) per token regardless of context
  length (the family's whole point).

State semantics: unlike attention caches, recurrent state cannot be
rolled back by resetting a length counter — the k-token-lookahead /
speculative machinery in llm/runner.py (stale-rows contract) does NOT
apply. ``MambaRunner`` (bottom) is the session API: sequential decode,
greedy or sampled, with the same streaming surface the cortex needs.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from trackiellm_tpu.models.llm import _linear as _mm


class MambaConfig(NamedTuple):
    vocab_size: int = 50280
    dim: int = 768
    n_layers: int = 24
    d_inner: int = 1536          # intermediate_size (2*dim)
    d_state: int = 16            # ssm_state_size
    d_conv: int = 4              # conv_kernel
    dt_rank: int = 48            # time_step_rank (ceil(dim/16))
    norm_eps: float = 1e-5
    max_seq: int = 4096          # unbounded in principle; session cap

    @classmethod
    def mamba_130m(cls) -> "MambaConfig":
        return cls()

    @classmethod
    def mamba_2_8b(cls) -> "MambaConfig":
        return cls(dim=2560, d_inner=5120, dt_rank=160, n_layers=64)

    @classmethod
    def test(cls) -> "MambaConfig":
        return cls(vocab_size=96, dim=32, n_layers=2, d_inner=64,
                   d_state=8, d_conv=4, dt_rank=4, max_seq=64)


class MambaCache(NamedTuple):
    """Recurrent state: per layer the last K-1 pre-conv inputs and the
    (d_inner, d_state) SSM state; ``length`` counts tokens consumed
    (for window bookkeeping only — state size is position-free)."""

    conv: jnp.ndarray   # (L, K-1, I)
    ssm: jnp.ndarray    # (L, I, N) float32
    length: jnp.ndarray  # scalar int32

    @classmethod
    def create(cls, cfg: MambaConfig, dtype=jnp.float32,
               max_seq: Optional[int] = None) -> "MambaCache":
        del max_seq  # recurrent state is O(1) in sequence length
        return cls(
            conv=jnp.zeros((cfg.n_layers, cfg.d_conv - 1, cfg.d_inner),
                           dtype),
            ssm=jnp.zeros((cfg.n_layers, cfg.d_inner, cfg.d_state),
                          jnp.float32),
            length=jnp.int32(0))


def _rms(x, w, eps):
    ms = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1,
                  keepdims=True)
    return (x.astype(jnp.float32) * jax.lax.rsqrt(ms + eps)
            ).astype(x.dtype) * w


def _ssm_assoc(eL, eR):
    aL, bL = eL
    aR, bR = eR
    return aL * aR, bL * aR + bR


def _mixer_seq(layer, cfg: MambaConfig, x_seq: jnp.ndarray,
               conv_init: jnp.ndarray, ssm_init: jnp.ndarray,
               last_idx: jnp.ndarray,
               ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One mixer over a whole (padded) sequence.

    ``x_seq`` (S, D) normed inputs; returns (y (S, D), conv state and
    ssm state captured AT ``last_idx`` — padded tail rows never
    contaminate the carried state)."""
    s = x_seq.shape[0]
    k = cfg.d_conv
    xz = _mm(x_seq, layer["w_in"])                  # (S, 2I)
    x, z = jnp.split(xz, 2, axis=-1)
    # Depthwise causal conv: K shifted slices over [conv_init; x].
    x_cat = jnp.concatenate([conv_init.astype(x.dtype), x], axis=0)
    conv = layer["conv_b"]
    for j in range(k):
        conv = conv + x_cat[j: j + s] * layer["conv_w"][j]
    h = jax.nn.silu(conv)                           # (S, I)

    proj = _mm(h, layer["w_x"])                     # (S, R+2N)
    dt, B, C = jnp.split(
        proj, [cfg.dt_rank, cfg.dt_rank + cfg.d_state], axis=-1)
    delta = jax.nn.softplus(dt @ layer["w_dt"] + layer["b_dt"])  # (S, I)
    A = -jnp.exp(layer["A_log"].astype(jnp.float32))             # (I, N)
    delta32 = delta.astype(jnp.float32)
    dA = jnp.exp(delta32[:, :, None] * A[None])                  # (S,I,N)
    dBx = (delta32[:, :, None] * B.astype(jnp.float32)[:, None, :]
           * h.astype(jnp.float32)[:, :, None])                  # (S,I,N)
    # Fold the chunk's initial state into the first element.
    dBx = dBx.at[0].add(dA[0] * ssm_init)
    _, hs = jax.lax.associative_scan(_ssm_assoc, (dA, dBx))      # (S,I,N)
    y = jnp.einsum("sin,sn->si", hs, C.astype(jnp.float32))
    y = y + h.astype(jnp.float32) * layer["d"]
    y = (y * jax.nn.silu(z.astype(jnp.float32))).astype(x_seq.dtype)
    out = _mm(y, layer["w_out"])                                 # (S, D)

    conv_state = jax.lax.dynamic_slice(
        x_cat, (last_idx + 1, 0), (k - 1, cfg.d_inner))
    ssm_state = hs[last_idx]
    return out, conv_state, ssm_state


def _seq_forward(params, cfg: MambaConfig, tokens, n_valid, cache,
                 ) -> Tuple[jnp.ndarray, MambaCache]:
    """Shared prefill/extend body over a (S_pad,) token bucket."""
    last = jnp.maximum(n_valid.astype(jnp.int32) - 1, 0)
    x = params["tok_emb"][tokens.astype(jnp.int32)]  # (S, D)

    def layer_fn(x, inputs):
        layer, conv_l, ssm_l = inputs
        h = _rms(x, layer["norm"], cfg.norm_eps)
        out, conv_s, ssm_s = _mixer_seq(layer, cfg, h, conv_l, ssm_l,
                                        last)
        return x + out, (conv_s, ssm_s)

    x, (convs, ssms) = jax.lax.scan(
        layer_fn, x, (params["layers"], cache.conv, cache.ssm))
    x_last = x[last]
    logits = _mm(_rms(x_last[None], params["out_norm"], cfg.norm_eps),
                 params["lm_head"]).astype(jnp.float32)[0]
    new_cache = MambaCache(
        conv=convs.astype(cache.conv.dtype), ssm=ssms,
        length=cache.length + n_valid.astype(jnp.int32))
    return logits, new_cache


@functools.partial(jax.jit, static_argnames=("cfg",))
def prefill(params: Dict[str, Any], cfg: MambaConfig, tokens: jnp.ndarray,
            length: jnp.ndarray, cache: MambaCache,
            ) -> Tuple[jnp.ndarray, MambaCache]:
    """Prompt ingestion: (S_pad,) bucket, true ``length``. The cache
    argument supplies buffers only (state starts from zero); returns
    last-valid-token logits + the recurrent state at ``length-1``."""
    zero = MambaCache.create(cfg, dtype=cache.conv.dtype)
    return _seq_forward(params, cfg, tokens, length, zero)


@functools.partial(jax.jit, static_argnames=("cfg", "attn_len",
                                              "all_logits"))
def extend(params: Dict[str, Any], cfg: MambaConfig, tokens: jnp.ndarray,
           n_valid: jnp.ndarray, cache: MambaCache,
           attn_len: Optional[int] = None, all_logits: bool = False,
           ) -> Tuple[jnp.ndarray, MambaCache]:
    """Chunked continuation from live state (tool re-injection /
    chunked prefill): exact — the initial state folds into the scan's
    first element. ``attn_len`` is accepted for the server contract
    and ignored (no attention window exists)."""
    del attn_len
    if all_logits:
        raise NotImplementedError(
            "all_logits is an attention-path (speculative verify) "
            "feature; the recurrent extend returns last-token logits")
    return _seq_forward(params, cfg, tokens, n_valid, cache)


@functools.partial(jax.jit, static_argnames=("cfg",))
def decode_step(params: Dict[str, Any], cfg: MambaConfig,
                token: jnp.ndarray, cache: MambaCache,
                ) -> Tuple[jnp.ndarray, MambaCache]:
    """One token: O(1) state update per layer, one device program."""
    x = params["tok_emb"][token][None]  # (1, D)
    k = cfg.d_conv

    def layer_fn(x, inputs):
        layer, conv_l, ssm_l = inputs   # (K-1, I), (I, N)
        h_in = _rms(x, layer["norm"], cfg.norm_eps)
        xz = _mm(h_in, layer["w_in"])
        xi, z = jnp.split(xz, 2, axis=-1)           # (1, I)
        x_cat = jnp.concatenate([conv_l.astype(xi.dtype), xi], axis=0)
        conv = (x_cat * layer["conv_w"]).sum(0) + layer["conv_b"]
        h = jax.nn.silu(conv)                        # (I,)
        proj = _mm(h[None], layer["w_x"])[0]
        dt, B, C = jnp.split(
            proj, [cfg.dt_rank, cfg.dt_rank + cfg.d_state])
        delta = jax.nn.softplus(dt @ layer["w_dt"] + layer["b_dt"])
        A = -jnp.exp(layer["A_log"].astype(jnp.float32))
        dA = jnp.exp(delta.astype(jnp.float32)[:, None] * A)
        ssm = dA * ssm_l + (delta.astype(jnp.float32)[:, None]
                            * B.astype(jnp.float32)[None, :]
                            * h.astype(jnp.float32)[:, None])
        y = ssm @ C.astype(jnp.float32)
        y = y + h.astype(jnp.float32) * layer["d"]
        y = (y * jax.nn.silu(z[0].astype(jnp.float32))
             ).astype(x.dtype)[None]
        out = _mm(y, layer["w_out"])
        return x + out, (x_cat[1:], ssm)

    x, (convs, ssms) = jax.lax.scan(
        layer_fn, x, (params["layers"], cache.conv, cache.ssm))
    logits = _mm(_rms(x, params["out_norm"], cfg.norm_eps),
                 params["lm_head"]).astype(jnp.float32)[0]
    return logits, MambaCache(conv=convs.astype(cache.conv.dtype),
                              ssm=ssms, length=cache.length + 1)


@functools.partial(jax.jit, static_argnames=("cfg", "n_tokens"))
def decode_chunk_greedy(params: Dict[str, Any], cfg: MambaConfig,
                        logits: jnp.ndarray, cache: MambaCache,
                        n_tokens: int,
                        eos_id: Optional[int] = None,
                        suppress_until: Optional[jnp.ndarray] = None,
                        ) -> Tuple[jnp.ndarray, jnp.ndarray, MambaCache]:
    """k greedy tokens in ONE device program (the relay-fetch
    amortization trick, same contract as models/llm.py's) — but note
    the cache CANNOT be rolled back afterwards (recurrent state);
    callers must only use this when all k tokens are consumed
    unconditionally (MambaRunner stops at chunk granularity)."""

    def body(carry, step):
        lg, cache = carry
        if eos_id is not None and suppress_until is not None:
            ban = (step < suppress_until) & (
                jnp.arange(lg.shape[-1]) == eos_id)
            lg = jnp.where(ban, jnp.float32(-1e30), lg)
        tok = jnp.argmax(lg).astype(jnp.int32)
        lg2, cache = decode_step(params, cfg, tok, cache)
        return (lg2, cache), tok

    (lg, cache), toks = jax.lax.scan(
        body, (logits, cache), jnp.arange(n_tokens))
    return toks, lg, cache


def init_params(cfg: MambaConfig, rng, dtype=jnp.float32
                ) -> Dict[str, Any]:
    """Random params in the converter's layout (tests / benches)."""
    rng = np.random.default_rng(rng) if isinstance(rng, int) else rng
    n, d, i = cfg.n_layers, cfg.dim, cfg.d_inner

    def w(*shape, s=0.02):
        return jnp.asarray(rng.normal(0.0, s, shape), dtype)

    # dt bias init matching HF (softplus-inverse of ~dt range) keeps
    # activations in a sane regime for random-weight tests.
    layers = {
        "norm": jnp.ones((n, d), dtype),
        "w_in": w(n, d, 2 * i),
        "conv_w": w(n, cfg.d_conv, i, s=0.2),
        "conv_b": jnp.zeros((n, i), dtype),
        "w_x": w(n, i, cfg.dt_rank + 2 * cfg.d_state),
        "w_dt": w(n, cfg.dt_rank, i, s=0.1),
        "b_dt": jnp.full((n, i), -2.0, dtype),
        "A_log": jnp.asarray(
            np.tile(np.log(np.arange(1, cfg.d_state + 1,
                                     dtype=np.float32))[None, None],
                    (n, i, 1)), jnp.float32),
        "d": jnp.ones((n, i), jnp.float32),
        "w_out": w(n, i, d),
    }
    emb = w(cfg.vocab_size, d)
    return {"tok_emb": emb, "layers": layers,
            "out_norm": jnp.ones((d,), dtype),
            "lm_head": jnp.asarray(np.asarray(emb).T, dtype)}


class MambaRunner:
    """Minimal streaming session over a Mamba checkpoint: bucketed
    chunked prefill (associative scan), then greedy/sampled decode.

    The attention runner's lookahead/speculative/prefix-reuse tricks
    rely on rolling an attention cache's length back; recurrent state
    has no such rollback, so this runner is strictly sequential —
    which the family compensates for with O(1)-per-token decode at ANY
    context length."""

    CHUNK = 256

    def __init__(self, params, cfg, tokenizer=None, gen_config=None,
                 model=None):
        """``model``: the SSM module (this one, or models.mamba2 —
        same prefill/extend/decode_step surface). Auto-selected from
        the config type when omitted."""
        import sys as _sys

        from trackiellm_tpu.llm.runner import GenerationConfig
        from trackiellm_tpu.llm.tokenizer import ByteTokenizer

        if model is None:
            if type(cfg).__name__ == "Mamba2Config":
                from trackiellm_tpu.models import mamba2 as model
            elif type(cfg).__name__ == "Qwen3NextConfig":
                from trackiellm_tpu.models import qwen3next as model
            else:
                model = _sys.modules[__name__]
        self._m = model
        self._cache_cls = (model.Mamba2Cache
                           if hasattr(model, "Mamba2Cache")
                           else model.MambaCache
                           if hasattr(model, "MambaCache")
                           else model.Cache)
        self.params = params
        self.cfg = cfg
        self.tokenizer = tokenizer or ByteTokenizer(
            n_special_pad_to=cfg.vocab_size)
        self.gen = gen_config or GenerationConfig()
        self.cache = self._cache_cls.create(cfg)
        self._key = jax.random.PRNGKey(self.gen.seed)
        self._generated_ids = []

    def _buckets(self, n):
        from trackiellm_tpu.llm.runner import _bucket_for
        return _bucket_for(n, (16, 64, self.CHUNK))

    # -- cortex session surface (Cortex._run_llm duck-types:
    # build_prompt, generate(tools=, on_token=, should_stop=),
    # add_tool_response, count_tokens, max_prompt_tokens). Sessions
    # are stateless per reply: each generate re-prefills through the
    # associative scan — at the measured 1100+ prompt tok/s a full
    # re-prefill costs less than attention-style prefix bookkeeping.

    def count_tokens(self, text: str) -> int:
        return len(self.tokenizer.encode(text, add_bos=False))

    @property
    def max_prompt_tokens(self) -> int:
        return max(self.cfg.max_seq - self.gen.max_tokens - 1, 16)

    def build_prompt(self, system: str, context: str, user: str,
                     tools=()) -> str:
        parts = [system]
        if tools:
            parts.append(
                "Ferramentas disponíveis (responda com JSON "
                '{"tool_call": {"name": ..., "arguments": {...}}} '
                "para usar):\n"
                + "\n".join(t.render() for t in tools))
        if context:
            parts.append(f"Context:\n{context}")
        body = "\n\n".join(parts)
        return f"[INST] {body}\n\nUser: {user} [/INST]"

    def add_tool_response(self, tool_name: str, response) -> None:
        """Append the tool output to the live recurrent state (the
        follow-up prompt also carries it, so this is belt-and-braces
        like the reference's context re-injection)."""
        import json as _json

        text = f"\nTool {tool_name} returned: {_json.dumps(response)}\n"
        ids = self.tokenizer.encode(text, add_bos=False)
        if not ids:
            return
        padded = np.zeros(self._buckets(len(ids)), np.int32)
        padded[: len(ids)] = ids
        _, self.cache = self._m.extend(
            self.params, self.cfg, jnp.asarray(padded),
            jnp.int32(len(ids)), self.cache)

    def reset(self) -> None:
        self.cache = self._cache_cls.create(self.cfg)
        self._generated_ids = []

    def generate(self, prompt: str, tools=(), max_tokens=None,
                 on_token=None, should_stop=None,
                 force_tool_call: bool = False) -> str:
        if force_tool_call:
            raise NotImplementedError(
                "grammar-constrained decoding needs per-token masks; "
                "use the attention runner for forced tool calls")
        text = ""
        from trackiellm_tpu.llm import sampling

        ids = self.tokenizer.encode(prompt, add_bos=True)
        hard = self.max_prompt_tokens
        if len(ids) > hard:
            head = hard // 4
            ids = ids[:head] + ids[-(hard - head):]
        self.cache = self._cache_cls.create(self.cfg)
        logits = None
        pos = 0
        first = True
        while pos < len(ids):
            chunk = ids[pos: pos + self.CHUNK]
            padded = np.zeros(self._buckets(len(chunk)), np.int32)
            padded[: len(chunk)] = chunk
            fn = self._m.prefill if first else self._m.extend
            logits, self.cache = fn(
                self.params, self.cfg, jnp.asarray(padded),
                jnp.int32(len(chunk)), self.cache)
            pos += len(chunk)
            first = False

        out = []
        n_max = max_tokens or self.gen.max_tokens
        eos = self.tokenizer.eos_id
        for _ in range(n_max):
            if should_stop is not None and should_stop():
                break
            if self.gen.temperature <= 0:
                tid = int(jnp.argmax(logits))
            else:
                self._key, sub = jax.random.split(self._key)
                tid = int(sampling.sample(
                    logits, sub, jnp.float32(self.gen.temperature),
                    top_k=self.gen.top_k, top_p=self.gen.top_p,
                    min_p=self.gen.min_p))
            if tid == eos:
                break
            out.append(tid)
            piece = self.tokenizer.decode([tid])
            text += piece
            if on_token:
                on_token(piece)
            logits, self.cache = self._m.decode_step(
                self.params, self.cfg, jnp.int32(tid), self.cache)
        self._generated_ids = out
        return text




def quantize_params(params: Dict[str, Any], bits: int = 4,
                    group: int = 256) -> Dict[str, Any]:
    """Quantize the big per-layer matrices (w_in / w_x / w_out — ~90%
    of the bytes; llama.cpp's mamba quants keep the SSM tensors and
    conv high-precision the same way). Decode is weight-bandwidth
    bound, so Q4 is a direct tok/s lever."""
    from trackiellm_tpu.ops.quant import (QuantizedLinear, quantize_q4,
                                          quantize_q8)

    quantize = quantize_q4 if bits == 4 else quantize_q8
    out = dict(params)
    layers = dict(params["layers"])
    for name in ("w_in", "w_x", "w_out"):
        stacked = layers[name]  # (L, K, N)
        qs = [quantize(stacked[i], group) for i in range(stacked.shape[0])]
        layers[name] = QuantizedLinear(
            values=jnp.stack([q.values for q in qs]),
            scales=jnp.stack([q.scales for q in qs]))
    out["layers"] = layers
    out["lm_head"] = quantize(params["lm_head"], group)
    return out


# -- continuous-batching surface (llm/server.py model= contract) ----------

class BatchedMambaCache(NamedTuple):
    """Per-slot recurrent states for the batching server — the
    recurrent twin of llm.BatchedKVCache. Note the size: B slots cost
    B * (K-1 + N) * I values TOTAL (no max_seq axis at all) — a 2.8B
    server's whole state for 8 slots is ~21 MB where the attention
    equivalent at 4096 context is ~17 GB. Continuous batching needs no
    paging for this family."""

    conv: jnp.ndarray     # (L, B, K-1, I)
    ssm: jnp.ndarray      # (L, B, I, N) float32
    lengths: jnp.ndarray  # (B,) int32 (bookkeeping only)

    @classmethod
    def create(cls, cfg: MambaConfig, batch: int,
               dtype: jnp.dtype = jnp.bfloat16,
               max_seq: Optional[int] = None) -> "BatchedMambaCache":
        del max_seq
        return cls(
            conv=jnp.zeros((cfg.n_layers, batch, cfg.d_conv - 1,
                            cfg.d_inner), dtype),
            ssm=jnp.zeros((cfg.n_layers, batch, cfg.d_inner,
                           cfg.d_state), jnp.float32),
            lengths=jnp.zeros((batch,), jnp.int32))


@functools.partial(jax.jit, static_argnames=("cfg", "slot"))
def insert_sequence(cache: BatchedMambaCache, cfg: MambaConfig,
                    slot: int, seq_cache: MambaCache
                    ) -> BatchedMambaCache:
    """Copy a single-sequence recurrent state (from prefill) into batch
    slot ``slot`` — same contract as llm.insert_sequence."""
    conv = jax.lax.dynamic_update_slice(
        cache.conv, seq_cache.conv[:, None].astype(cache.conv.dtype),
        (0, slot, 0, 0))
    ssm = jax.lax.dynamic_update_slice(
        cache.ssm, seq_cache.ssm[:, None], (0, slot, 0, 0))
    lengths = cache.lengths.at[slot].set(seq_cache.length)
    return BatchedMambaCache(conv, ssm, lengths)


@functools.partial(jax.jit, static_argnames=("cfg", "attn_len"))
def decode_step_batch(params: Dict[str, Any], cfg: MambaConfig,
                      tokens: jnp.ndarray, active: jnp.ndarray,
                      cache: BatchedMambaCache,
                      attn_len: Optional[int] = None,
                      ) -> Tuple[jnp.ndarray, BatchedMambaCache]:
    """One decode step for every active slot: tokens (B,) -> logits
    (B, V). Inactive slots compute but their state does not advance.
    ``attn_len`` is accepted for contract parity and ignored — there
    is no attention window to bound."""
    del attn_len
    b = tokens.shape[0]
    x = params["tok_emb"][tokens]  # (B, D)

    def layer_fn(x, inputs):
        layer, conv_l, ssm_l = inputs   # (B, K-1, I), (B, I, N)
        h_in = _rms(x, layer["norm"], cfg.norm_eps)
        xz = _mm(h_in, layer["w_in"])                  # (B, 2I)
        xi, z = jnp.split(xz, 2, axis=-1)
        x_cat = jnp.concatenate(
            [conv_l.astype(xi.dtype), xi[:, None, :]], axis=1)  # (B,K,I)
        conv = (x_cat * layer["conv_w"][None]).sum(1) + layer["conv_b"]
        h = jax.nn.silu(conv)                          # (B, I)
        proj = _mm(h, layer["w_x"])                    # (B, R+2N)
        dt, B_, C = jnp.split(
            proj, [cfg.dt_rank, cfg.dt_rank + cfg.d_state], axis=-1)
        delta = jax.nn.softplus(dt @ layer["w_dt"] + layer["b_dt"])
        A = -jnp.exp(layer["A_log"].astype(jnp.float32))
        d32 = delta.astype(jnp.float32)
        dA = jnp.exp(d32[:, :, None] * A[None])        # (B, I, N)
        ssm_new = dA * ssm_l + (d32[:, :, None]
                                * B_.astype(jnp.float32)[:, None, :]
                                * h.astype(jnp.float32)[:, :, None])
        y = jnp.einsum("bin,bn->bi", ssm_new, C.astype(jnp.float32))
        y = y + h.astype(jnp.float32) * layer["d"][None]
        y = (y * jax.nn.silu(z.astype(jnp.float32))).astype(x.dtype)
        out = _mm(y, layer["w_out"])
        act3 = active[:, None, None]
        return x + out, (jnp.where(act3, x_cat[:, 1:], conv_l),
                         jnp.where(act3, ssm_new, ssm_l))

    x, (convs, ssms) = jax.lax.scan(
        layer_fn, x, (params["layers"], cache.conv, cache.ssm))
    logits = _mm(_rms(x, params["out_norm"], cfg.norm_eps),
                 params["lm_head"]).astype(jnp.float32)
    return logits, BatchedMambaCache(
        conv=convs.astype(cache.conv.dtype), ssm=ssms,
        lengths=cache.lengths + active.astype(jnp.int32))


def decode_steps_batch(params: Dict[str, Any], cfg: MambaConfig,
                       tokens: jnp.ndarray, active: jnp.ndarray,
                       cache: BatchedMambaCache, n_steps: int,
                       attn_len: Optional[int] = None,
                       ) -> Tuple[jnp.ndarray, BatchedMambaCache]:
    """``n_steps`` greedy batch-decode steps as ONE compiled program
    (the server's steady-state chunk fast path; contract of
    llm.decode_steps_batch)."""
    del attn_len

    def step(carry, _):
        toks, cache = carry
        logits, cache = decode_step_batch(params, cfg, toks, active,
                                          cache)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return (nxt, cache), nxt

    (_, cache), produced = jax.lax.scan(
        step, (tokens, cache), None, length=n_steps)
    return produced, cache


# llm/server.py's model= contract addresses the cache classes by the
# attention names.
KVCache = MambaCache
BatchedKVCache = BatchedMambaCache
