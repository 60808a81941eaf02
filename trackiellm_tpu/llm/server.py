"""Continuous-batching LLM server: many conversations, one decode loop.

Beyond the reference (llama.cpp runs one context per process); required
by this framework's production-serving mandate. Design:

  - a fixed number of batch slots share one :class:`BatchedKVCache`;
  - new requests prefill as single sequences (the existing bucketed
    prefill) and are inserted into a free slot **between decode steps**
    — continuous batching, no stop-the-world;
  - one jitted ``decode_step_batch`` advances every active slot per
    step; finished slots (EOS / max tokens) free immediately and new
    requests take their place;
  - sampling is greedy or temperature per request, on host, with the
    same device-side masked sampler as the interactive runner.
"""

from __future__ import annotations

import dataclasses
import os
import queue
import threading
import time
from concurrent.futures import Future
from typing import Any, Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from trackiellm_tpu.llm import sampling
from trackiellm_tpu.llm.runner import (EXTEND_BUCKETS, PREFILL_BUCKETS,
                                       _bucket_for)
from trackiellm_tpu.llm.tokenizer import ByteTokenizer, Tokenizer
from trackiellm_tpu.models import llm as llm_model
from trackiellm_tpu.utils.errors import ErrorCode, TrackieError
from trackiellm_tpu.utils.logging import get_logger

log = get_logger("llm.server")


@dataclasses.dataclass
class Request:
    prompt: str
    max_tokens: int = 64
    temperature: float = 0.0
    repetition_penalty: float = 1.1   # llama.cpp default; sampled path only
    repeat_window: int = 64
    future: Future = dataclasses.field(default_factory=Future)
    submitted_at: float = dataclasses.field(default_factory=time.monotonic)
    preemptions: int = 0  # paged mode: restarts after pool pressure
    # Streaming: called from the serve thread with each new text piece
    # as it decodes (chunk granularity on the fast path — the parity
    # surface for tk_llm_runner_generate_next_token's streaming
    # contract at server scale). Exceptions are swallowed after
    # logging; the future still resolves with the full text.
    on_token: Optional[Any] = None
    # UTF-8 incremental decoder (byte-level tokenizers split multibyte
    # characters across tokens; buffering makes streamed pieces
    # concatenate to exactly the final decode).
    _decoder: Optional[Any] = None
    # Structured output: constrain generation to a valid tool-call JSON
    # naming one of these tools (llm/grammar.py ToolCallGrammar — the
    # same GBNF-contract acceptor the interactive runner uses, at
    # server scale). Grammar slots decode on the per-step path (masks
    # are host-applied per token). ``tool_schemas`` optionally types
    # each named tool's arguments (name -> JSON Schema).
    tool_names: Optional[List[str]] = None
    tool_schemas: Optional[Dict[str, Any]] = None
    # JSON response mode (llama.cpp response_format parity): the reply
    # must be valid JSON — conforming to ``response_schema`` when set,
    # else any JSON object when ``json_mode`` is true.
    response_schema: Optional[Dict[str, Any]] = None
    json_mode: bool = False
    # Stop sequences (llama.cpp server "stop" parity): generation ends
    # at the first occurrence of any string; the result is truncated
    # BEFORE the match. Streaming holds back max(len(stop))-1 chars so
    # a match spanning a chunk boundary is never streamed.
    stop: Optional[List[str]] = None
    # Sampling knobs for temperature>0 slots (llama.cpp defaults).
    top_k: int = 40
    top_p: float = 0.95
    min_p: float = 0.0


@dataclasses.dataclass
class _Slot:
    request: Optional[Request] = None
    generated: List[int] = dataclasses.field(default_factory=list)
    n_emitted: int = 0
    next_token: int = 0
    host_len: int = 0  # mirrors cache.lengths[slot] (no device sync)
    seq_id: Optional[int] = None  # paged mode: pool sequence handle
    grammar: Optional[Any] = None  # ToolCallGrammar for constrained slots
    finish_next: bool = False  # grammar closed: emit next_token, then end
    reserved: bool = False  # held by an in-flight chunked-prefill job
    # Stop-sequence state (only maintained when request.stop is set):
    # incrementally decoded text, the char index to truncate at on a
    # match, chars already streamed, and the slot's own UTF-8 decoder.
    text: str = ""
    stop_cut: Optional[int] = None
    streamed: int = 0
    _decoder: Optional[Any] = None

    @property
    def active(self) -> bool:
        return self.request is not None


@dataclasses.dataclass
class _PrefillJob:
    """An admission whose prompt prefills one extend-chunk per serve
    iteration (Sarathi-style chunked prefill), so active slots keep
    decoding between chunks instead of stalling for the whole prompt."""
    slot_idx: int
    slot: _Slot
    req: Request
    ids: List[int]
    cache: Any              # contiguous scratch KVCache
    attn_len: Optional[int]
    plan: List[Any]         # remaining (take, bucket) chunks
    pos: int                # tokens ingested so far
    shared: List[int]       # prefix-cache page refs (paged mode)
    logits: Any = None


class LLMServer:
    """Fixed-slot continuous-batching server over a parameter tree."""

    def __init__(self, params: Dict[str, Any], cfg: llm_model.LLMConfig,
                 batch_slots: int = 4,
                 tokenizer: Optional[Tokenizer] = None,
                 cache_dtype=jnp.bfloat16, seed: int = 0,
                 paged="auto", n_pages: int = 0,
                 page_size: int = 128, chunk_steps: int = 8,
                 kv_memory_budget_bytes: Optional[int] = None,
                 mesh=None, prefix_cache: bool = True,
                 prefill_chunk: int = 0, model=None, device=None):
        """``mesh``: a `jax.sharding.Mesh` with a ``tp`` axis shards the
        whole serve loop tensor-parallel over the chips — params via
        :func:`trackiellm_tpu.parallel.infer_param_shardings`, the slot
        cache via :func:`~trackiellm_tpu.parallel.batched_kv_sharding`;
        the SAME jitted programs then run GSPMD-partitioned (XLA places
        the psums per the matmul shardings — scaling-book recipe).
        Composes with paged KV: the pool shards the same KV-head axis
        (pages unsharded, gathers shard-local — parallel/infer.py
        ``paged_pool_sharding``); ``paged="auto"`` under a mesh keeps
        the measured-faster dense layout, ``paged=True`` opts into the
        elastic pool. int8 KV remains single-device."""
        self.params = params
        self.cfg = cfg
        self.batch = batch_slots
        self.mesh = mesh
        # ``model``: the model module serving these checkpoints — any
        # module exposing the llm.py forward surface (prefill / extend
        # / decode_step_batch / decode_steps_batch / KVCache /
        # BatchedKVCache / insert_sequence). Defaults to models.llm;
        # pass models.mla to serve DeepSeek-V2/V3 over the compressed
        # latent cache (the same ``model=`` contract as LLMRunner).
        # Custom modules are dense-only: the page pool's gather/scatter
        # is written against the (S, Hk, D) KV layout.
        self._m = model or llm_model
        self._is_mla = False
        if model is not None and model is not llm_model:
            if paged is True:
                raise TrackieError(
                    ErrorCode.INVALID_ARGUMENT,
                    "paged KV supports the default models.llm only")
            self._is_mla = type(cfg).__name__ == "MLAConfig"
            if mesh is not None and not self._is_mla:
                raise TrackieError(
                    ErrorCode.INVALID_ARGUMENT,
                    "mesh serving supports models.llm and models.mla "
                    "only")
            paged = False
        if jnp.dtype(cache_dtype) == jnp.int8:
            # Quantized KV (llama.cpp -ctk q8_0 parity) lives in the
            # page pool only; there is no dense int8 slot cache. Under
            # a mesh the QuantPool shards values AND per-(cell, head)
            # scales on the same KV-head axis the float pool splits
            # (parallel/infer.py quant_pool_sharding — round 5).
            if paged is False:
                raise TrackieError(
                    ErrorCode.INVALID_ARGUMENT,
                    "int8 KV requires paged mode")
            paged = True
        if mesh is not None and self._is_mla:
            # Tensor-parallel MLA serving: head-parallel projections
            # (whole heads per shard), the shared latent cache
            # replicated — DeepSeek's own serving layout; the one
            # config a real multi-chip DeepSeek deployment wants
            # (VERDICT r4 #4b). Dense latent slots only (the latent is
            # 576 values/token — 14x smaller than the dense KV the
            # float pool pages, so pool elasticity buys little here).
            from trackiellm_tpu.parallel import (batched_mla_sharding,
                                                 mla_param_shardings)

            self.params = jax.device_put(
                params, mla_param_shardings(mesh, params))
            self._batched_cache_sharding = batched_mla_sharding(mesh)
        elif mesh is not None:
            # Tensor-parallel serving composes with BOTH memory
            # layouts: dense slot caches shard KV heads over tp
            # (batched_kv_sharding); a paged pool shards the SAME head
            # axis with pages unsharded (paged_pool_sharding) so page
            # gathers/scatters stay shard-local. paged="auto" keeps
            # the dense preference (measured faster when it fits) —
            # pass paged=True for an elastic pool under the mesh.
            if paged == "auto":
                paged = False
            from trackiellm_tpu.ops.quant import QuantizedLinear
            from trackiellm_tpu.parallel import (batched_kv_sharding,
                                                 infer_param_shardings,
                                                 paged_pool_sharding)

            quantized = isinstance(params["layers"]["wqkv"],
                                   QuantizedLinear)
            self.params = jax.device_put(
                params, infer_param_shardings(mesh, quantized, params))
            self._batched_cache_sharding = batched_kv_sharding(mesh)
            self._pool_sharding = paged_pool_sharding(mesh)
        if paged == "auto":
            # With pipelined chunks the chunked paths are equal within
            # relay noise (BASELINE.md round-3: paged 432-528 vs dense
            # 434-447 tok/s at B=8 — the attn_pages-bounded gather
            # offsets its own cost), but the per-step fallback (sampled
            # requests, tight budgets) stays measurably faster dense
            # (150-190 vs 100-140): keep dense whenever it fits the KV
            # budget, paged when memory demands it.
            dense_bytes = (2 * cfg.n_layers * batch_slots * cfg.max_seq
                           * cfg.n_kv_heads * cfg.head_dim
                           * jnp.dtype(cache_dtype).itemsize)
            budget = kv_memory_budget_bytes or (8 << 30)  # ~half a v5e
            paged = dense_bytes > budget
        # Steady-state fast path: when every active request is greedy
        # and no work is waiting, run up to this many decode steps as
        # one device program (models/llm.py decode_steps_batch) — the
        # per-step host fetch of sampled tokens is a non-pipelining
        # relay round trip (PERF_NOTES.md). 1 disables chunking.
        self.chunk_steps = max(1, int(chunk_steps))
        self.tokenizer = tokenizer or ByteTokenizer(cfg.vocab_size)
        # Memory layout: dense per-slot caches (default) or one shared
        # paged pool (memory scales with live tokens; llm/paging.py).
        self.paged = paged
        # Prefix caching (paged mode only): FULL prompt pages register
        # in the pool's hash chain; later requests sharing the same
        # prompt prefix reuse those physical pages (refcounted) and
        # only prefill the suffix — a shared system prompt costs its
        # prefill ONCE per pool lifetime, not once per request.
        self.prefix_cache = bool(prefix_cache) and bool(paged)
        # Chunked prefill (Sarathi-style): prompts longer than this
        # admit via a _PrefillJob that runs one extend chunk per serve
        # iteration, interleaved with decode — active streams' inter-
        # token latency is bounded by one chunk instead of one full
        # prompt prefill. 0 = off (whole-prompt admission waves).
        self.prefill_chunk = max(0, int(prefill_chunk))
        self._prefill_job: Optional[_PrefillJob] = None
        if paged:
            from trackiellm_tpu.llm.paging import PagedKVPool

            if n_pages <= 0:
                n_pages = batch_slots * (cfg.max_seq // page_size) // 2 + 1
            self.pool = PagedKVPool(cfg, n_pages=n_pages,
                                    page_size=page_size, dtype=cache_dtype)
            if mesh is not None:
                # Shard the pool on the KV-head axis; subsequent
                # scatter/gather programs keep the layout (inputs are
                # committed sharded arrays). int8 pools shard values
                # AND scales (quant_pool_sharding).
                from trackiellm_tpu.llm.paging import QuantPool

                if isinstance(self.pool.pool_k, QuantPool):
                    from trackiellm_tpu.parallel import (
                        quant_pool_sharding)

                    ps = quant_pool_sharding(mesh)
                else:
                    ps = self._pool_sharding
                self.pool.pool_k = jax.device_put(self.pool.pool_k, ps)
                self.pool.pool_v = jax.device_put(self.pool.pool_v, ps)
            self.cache = None
        else:
            self.pool = None
            self.cache = self._m.BatchedKVCache.create(
                cfg, batch_slots, dtype=cache_dtype)
            if mesh is not None:
                self.cache = jax.device_put(
                    self.cache, self._batched_cache_sharding)
        self._slots = [_Slot() for _ in range(batch_slots)]
        self._queue: "queue.Queue[Request]" = queue.Queue()
        self._backlog: List[Request] = []  # OOM-deferred, retried first
        # Requests popped from the queue but not yet bound to a slot
        # (an admission wave in flight). The serve loop's death path
        # fails these too — without the list their futures would be
        # orphaned and hang (round-3 driver artifact: 9.5 min stall).
        self._inflight: List[Request] = []
        self._fatal: Optional[Exception] = None
        # Device hermeticity for the serve THREAD: jax.default_device /
        # an active Mesh are thread-local contexts on the CALLER —
        # they do not apply to the thread started below, whose eager
        # ops (jnp.asarray/jnp.stack in admission) would otherwise
        # dispatch to the process default backend (round-3 failure: a
        # version-skewed TPU default killed the loop). Pin the thread
        # to an explicit device: the caller's, or the params' own.
        if device is None:
            for leaf in jax.tree.leaves(self.params):
                devs = getattr(leaf, "devices", None)
                if callable(devs):
                    try:
                        device = min(devs(), key=lambda d: d.id)
                    except Exception:  # uncommitted / host leaf
                        device = None
                    if device is not None:
                        break
        self._device = device
        self._key = jax.random.PRNGKey(seed)
        if device is not None:
            self._key = jax.device_put(self._key, device)
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._serve_loop,
                                        daemon=True, name="llm-server")
        self._thread.start()
        self.stats = {"completed": 0, "decode_steps": 0, "tokens": 0}

    # ------------------------------------------------------------------

    def submit(self, prompt: str, max_tokens: int = 64,
               temperature: float = 0.0,
               repetition_penalty: float = 1.1,
               on_token=None, tool_names=None, tool_schemas=None,
               response_schema=None, json_mode: bool = False,
               stop=None, top_k: int = 40, top_p: float = 0.95,
               min_p: float = 0.0) -> Future:
        """Enqueue a generation; the Future resolves to the text.

        ``on_token``: optional callable(text_piece) streamed from the
        serve thread as tokens decode (chunk granularity on the fast
        path). Keep it cheap — it runs inside the serve loop.

        Fails fast (instead of queueing into the void) once the serve
        thread has exited — whether by close() or a fatal loop error."""
        if self._fatal is not None:
            raise RuntimeError(
                f"server serve loop died: {self._fatal}") from self._fatal
        if self._stop.is_set() or not self._thread.is_alive():
            raise RuntimeError("server is closed")
        stop = [s for s in (stop or []) if s]
        req = Request(prompt, max_tokens, temperature,
                      repetition_penalty=repetition_penalty,
                      on_token=on_token, tool_names=tool_names,
                      tool_schemas=tool_schemas,
                      response_schema=response_schema, json_mode=json_mode,
                      stop=stop or None, top_k=top_k, top_p=top_p,
                      min_p=min_p)
        self._queue.put(req)
        return req.future

    def generate(self, prompt: str, max_tokens: int = 64,
                 temperature: float = 0.0, timeout: float = 300.0,
                 repetition_penalty: float = 1.1,
                 tool_names=None, tool_schemas=None,
                 response_schema=None, json_mode: bool = False,
                 stop=None, top_k: int = 40, top_p: float = 0.95,
                 min_p: float = 0.0) -> str:
        return self.submit(prompt, max_tokens, temperature,
                           repetition_penalty,
                           tool_names=tool_names, tool_schemas=tool_schemas,
                           response_schema=response_schema,
                           json_mode=json_mode, stop=stop, top_k=top_k,
                           top_p=top_p, min_p=min_p).result(timeout)

    # ------------------------------------------------------------------

    def _next_request(self) -> Optional[Request]:
        """Pop the next waiting request, registering it as in-flight
        until :meth:`_settle` binds it to a slot (or a failure /
        backlog path un-tracks it) — the serve loop's death path can
        then fail it instead of orphaning its future."""
        if self._backlog:
            req = self._backlog.pop(0)
        else:
            try:
                req = self._queue.get_nowait()
            except queue.Empty:
                return None
        self._inflight.append(req)
        return req

    def _untrack(self, req: Optional[Request]) -> None:
        try:
            self._inflight.remove(req)
        except ValueError:
            pass

    def _admit(self) -> None:
        """Fill free slots from the queue (prefill + slot insert).

        Paged mode admits only while the pool has pages for the whole
        prompt plus one decode page of headroom; requests that do not
        fit wait in a backlog and retry as pages free up (admission
        control, not a loop-killing exception).

        Greedy first tokens are fetched ONCE per admission wave, after
        every prefill has been dispatched: the per-request
        ``int(argmax)`` was a non-pipelining ~30 ms relay round trip
        that serialized each prefill behind the previous request's
        fetch (measured 250 ms/admission; the batch wave pays one)."""
        pending = []  # (slot, greedy logits) awaiting the wave fetch

        def flush():
            if not pending:
                return
            ids = np.asarray(jnp.argmax(
                jnp.stack([lg for _, lg in pending]), axis=-1))
            for (slot, _), tid in zip(pending, ids):
                slot.next_token = int(tid)
            pending.clear()

        buckets = [b for b in PREFILL_BUCKETS if b <= self.cfg.max_seq]
        kv_dtype = (self.pool.compute_dtype if self.paged
                    else jax.tree.leaves(self.cache)[0].dtype)

        # Phase 1 — gather the admission wave (admission control only,
        # no device work yet).
        wave = []  # (slot_idx, slot, req, ids, bucket)
        for slot_idx, slot in enumerate(self._slots):
            if slot.active or slot.reserved:
                continue
            req = self._next_request()
            while req is not None and req.future.cancelled():
                self._untrack(req)  # dropped before admission
                req = self._next_request()
            if req is None:
                break
            ids = self.tokenizer.encode(req.prompt, add_bos=True)
            if self.paged:
                need = (len(ids) + self.pool.page_size - 1
                        ) // self.pool.page_size + 1
                reserved = sum(
                    (len(w[3]) + self.pool.page_size - 1)
                    // self.pool.page_size + 1 for w in wave)
                if self.pool.free_pages - reserved < need:
                    if need > self.pool.n_pages - 1:
                        # Can never fit, even in an empty pool: reject.
                        self._untrack(req)
                        req.future.set_exception(TrackieError(
                            ErrorCode.DEVICE_OOM,
                            f"prompt needs {need} KV pages, pool has "
                            f"{self.pool.n_pages - 1}"))
                        continue
                    self._untrack(req)
                    self._backlog.insert(0, req)
                    break
            limit = min(buckets[-1],
                        self.cfg.max_seq - req.max_tokens - 1)
            if limit < 1:
                # max_tokens >= max_seq - 1 leaves no room for even one
                # prompt token; with limit <= 0 the slicing below would
                # return the FULL prompt (ids[-0:]) or duplicate it,
                # and the oversized bucket lookup would kill the serve
                # loop. Fail the one request, not the server.
                self._untrack(req)
                req.future.set_exception(TrackieError(
                    ErrorCode.CONTEXT_OVERFLOW,
                    f"max_tokens={req.max_tokens} leaves no prompt room "
                    f"in a {self.cfg.max_seq}-token context"))
                continue
            if len(ids) > limit:
                head = limit // 4
                ids = ids[:head] + ids[-(limit - head):]
            # Long prompts take the chunked-prefill job (one at a
            # time; interleaves with decode) when enabled; everything
            # else admits via the whole-prompt wave below.
            if (self.prefill_chunk and self._prefill_job is None
                    and len(ids) > self.prefill_chunk
                    and self._start_prefill_job(slot_idx, slot, req, ids)):
                # The job owns the request now; the death path reaches
                # it through _abort_prefill_job.
                self._untrack(req)
                continue
            wave.append((slot_idx, slot, req, ids,
                         _bucket_for(len(ids), buckets)))

        # Phase 2 — prefill. Same-bucket groups of >= 2 run as ONE
        # vmapped device program (llm_model.prefill_batch): prefill at
        # small M is weight-bandwidth-heavy, so a burst of admissions
        # costs ~one prefill instead of len(group). Group size pads to
        # a power of two (dummy length-0 rows) so the program count
        # stays log(batch), not batch. Singles keep the plain prefill
        # program (shared with the interactive runner's cache).
        def settle(slot_idx, slot, req, ids, logits, seq_cache,
                   shared=()):
            self._settle(slot_idx, slot, req, ids, logits, seq_cache,
                         shared=shared, pending=pending)

        # Prefix-cache hits leave the grouped-prefill path: the shared
        # pages are staged once and only the suffix runs (extend).
        by_bucket: Dict[int, list] = {}
        for item in wave:
            slot_idx, slot, req, ids, bucket = item
            if self.prefix_cache:
                shared, matched = self.pool.acquire_prefix(ids)
                if shared:
                    try:
                        staged = self._prefill_suffix(ids, shared, matched)
                        if staged is not None:
                            logits, seq_cache = staged
                            settle(slot_idx, slot, req, ids, logits,
                                   seq_cache, shared=shared)
                            continue
                        # Padded suffix writes can't fit the context:
                        # give the refs back, take the plain path.
                        self.pool.release_prefix(shared)
                    except TrackieError:
                        self.pool.release_prefix(shared)
                        raise
            by_bucket.setdefault(bucket, []).append(item)

        for bucket, group in by_bucket.items():
            # Modules without a vmapped prefill_batch (e.g. models.mla)
            # admit one prefill per request.
            if len(group) == 1 or not hasattr(self._m, "prefill_batch"):
                for slot_idx, slot, req, ids, _ in group:
                    padded = np.zeros(bucket, np.int32)
                    padded[: len(ids)] = ids
                    logits, seq_cache = self._m.prefill(
                        self.params, self.cfg, jnp.asarray(padded),
                        jnp.int32(len(ids)),
                        self._m.KVCache.create(self.cfg, dtype=kv_dtype))
                    settle(slot_idx, slot, req, ids, logits, seq_cache)
                continue
            b_pad = 1 << (len(group) - 1).bit_length()
            padded = np.zeros((b_pad, bucket), np.int32)
            lengths = np.zeros(b_pad, np.int32)
            for row, (_, _, _, ids, _) in enumerate(group):
                padded[row, : len(ids)] = ids
                lengths[row] = len(ids)
            logits_b, caches_b = self._m.prefill_batch(
                self.params, self.cfg, jnp.asarray(padded),
                jnp.asarray(lengths), cache_dtype=kv_dtype)
            for row, (slot_idx, slot, req, ids, _) in enumerate(group):
                seq_cache = jax.tree.map(lambda x, r=row: x[r], caches_b)
                settle(slot_idx, slot, req, ids, logits_b[row], seq_cache)
        flush()

    def _settle(self, slot_idx, slot, req, ids, logits, seq_cache,
                shared=(), pending=None):
        """Bind a completed prefill to its slot: paged-mode sequence
        creation (scatter + prefix registration) or dense slot insert,
        then bookkeeping + first-token pick. ``pending`` (admission
        waves): greedy logits queue for ONE batched wave fetch instead
        of a ~30 ms per-request round trip; None fetches immediately
        (chunked-prefill job completion — one fetch per job)."""
        if self.paged:
            slot.seq_id = self.pool.create_sequence(
                prefill_cache=seq_cache, length=len(ids),
                shared_pages=list(shared),
                register_ids=ids if self.prefix_cache else None)
        else:
            self.cache = self._m.insert_sequence(
                self.cache, self.cfg, slot_idx, seq_cache)
        slot.request = req
        self._untrack(req)  # the slot owns it now
        slot.generated = []
        slot.n_emitted = 0
        slot.host_len = len(ids)
        slot.grammar = None
        slot.finish_next = False
        slot.text = ""
        slot.stop_cut = None
        slot.streamed = 0
        slot._decoder = None
        if req.tool_names:
            from trackiellm_tpu.llm.grammar import ToolCallGrammar

            slot.grammar = ToolCallGrammar(list(req.tool_names),
                                           req.tool_schemas)
            slot.next_token = self._pick_constrained(slot, logits)
        elif req.response_schema is not None or req.json_mode:
            from trackiellm_tpu.llm.grammar import JsonGrammar

            slot.grammar = JsonGrammar(req.response_schema)
            slot.next_token = self._pick_constrained(slot, logits)
        elif req.temperature <= 0:
            if pending is None:
                slot.next_token = int(jnp.argmax(logits))
            else:
                pending.append((slot, logits))  # fetched by the wave
        else:
            slot.next_token = self._sample_one(logits, req, [])

    def _suffix_chunk_plan(self, matched: int, total: int,
                           cap: int = 0):
        """Exact-fill extend-chunk plan for prefilling ``[matched,
        total)``: each chunk takes the largest EXTEND bucket that fits
        the remainder (so only the FINAL chunk pads), optionally capped
        at ``cap`` tokens per chunk. Returns ``(plan, required)`` where
        plan is [(take, bucket)...] and required is the max padded
        write end — the minimum staged-cache capacity that keeps
        extend()'s dynamic_update_slice from clamping backward into
        the prefix."""
        buckets = ([b for b in EXTEND_BUCKETS if b <= cap] if cap
                   else list(EXTEND_BUCKETS))
        if not buckets:
            buckets = [EXTEND_BUCKETS[0]]
        plan = []
        pos = matched
        while pos < total:
            remaining = total - pos
            take = max((b for b in buckets if b <= remaining),
                       default=remaining)
            plan.append((take, _bucket_for(take, buckets)))
            pos += take
        required = matched
        pos = matched
        for take, bucket in plan:
            required = max(required, pos + bucket)
            pos += take
        return plan, required

    def _prefill_suffix(self, ids, shared, matched_len):
        """Prefix-cache admission: stage the shared pages into a
        contiguous scratch cache (one bandwidth copy — no FLOPs) and
        chunk-prefill only the un-cached suffix over it via
        models/llm.py ``extend``. Returns (last-valid logits, cache)
        with the same contract as ``prefill``, or ``None`` if the
        padded chunk writes cannot fit the context (caller falls back
        to a plain prefill); the cache's suffix region is what
        ``create_sequence`` scatters into fresh pages."""
        plan, required = self._suffix_chunk_plan(matched_len, len(ids))
        if required > self.cfg.max_seq:
            return None
        cache = self.pool.gathered_prefix_cache(shared, matched_len,
                                                required)
        attn_len = cache.k.shape[1]  # page-bucketed capacity
        logits = None
        pos = matched_len
        for take, bucket in plan:
            padded = np.zeros(bucket, np.int32)
            padded[:take] = ids[pos:pos + take]
            logits, cache = self._m.extend(
                self.params, self.cfg, jnp.asarray(padded),
                jnp.int32(take), cache, attn_len=attn_len)
            pos += take
        return logits, cache

    # -- chunked prefill (Sarathi-style admission) -----------------------

    def _start_prefill_job(self, slot_idx: int, slot: _Slot, req: Request,
                           ids: List[int]) -> bool:
        """Reserve ``slot`` and stage a chunked-prefill job for a long
        prompt. Returns False when the padded chunk writes cannot fit
        the context (the caller admits via the whole-prompt wave)."""
        shared: List[int] = []
        matched = 0
        if self.prefix_cache:
            shared, matched = self.pool.acquire_prefix(ids)
        plan, required = self._suffix_chunk_plan(
            matched, len(ids), cap=self.prefill_chunk)
        if required > self.cfg.max_seq:
            if shared:
                self.pool.release_prefix(shared)
            return False
        if self.paged:
            # Stages the shared prefix (or a zeroed length-0 scratch on
            # a miss: the all-trash-page gather) in one copy.
            cache = self.pool.gathered_prefix_cache(shared, matched,
                                                    required)
            attn_len = cache.k.shape[1]
        else:
            cache = self._m.KVCache.create(
                self.cfg, dtype=jax.tree.leaves(self.cache)[0].dtype)
            attn_len = min(1 << (max(required, 1) - 1).bit_length(),
                           self.cfg.max_seq)
        slot.reserved = True
        self._prefill_job = _PrefillJob(slot_idx, slot, req, ids, cache,
                                        attn_len, plan, matched, shared)
        return True

    def _abort_prefill_job(self, exc: Optional[Exception]) -> None:
        """Drop the in-flight job: unreserve its slot, give back prefix
        refs, and fail the future with ``exc`` (None = cancelled)."""
        job = self._prefill_job
        self._prefill_job = None
        if job is None:
            return
        job.slot.reserved = False
        if job.shared and self.paged:
            self.pool.release_prefix(job.shared)
        if exc is not None:
            self._fail(job.req, exc)

    def _advance_prefill(self) -> None:
        """Run ONE extend chunk of the in-flight job (called once per
        serve iteration, between decode work — the chunked-prefill
        interleave). Settles the slot when the plan completes."""
        job = self._prefill_job
        if job.req.future.cancelled():
            self._abort_prefill_job(None)
            return
        take, bucket = job.plan[0]
        padded = np.zeros(bucket, np.int32)
        padded[:take] = job.ids[job.pos:job.pos + take]
        job.logits, job.cache = self._m.extend(
            self.params, self.cfg, jnp.asarray(padded), jnp.int32(take),
            job.cache, attn_len=job.attn_len)
        job.pos += take
        job.plan = job.plan[1:]
        self.stats["prefill_chunks"] = self.stats.get("prefill_chunks",
                                                      0) + 1
        if job.plan:
            return
        self._prefill_job = None
        job.slot.reserved = False
        try:
            self._settle(job.slot_idx, job.slot, job.req, job.ids,
                         job.logits, job.cache, shared=job.shared)
        except TrackieError as exc:
            # Pool pressure at sequence creation (decode grew tables
            # while the job ran): same retry contract as decode
            # preemption — back off to the backlog, fail after 3.
            if job.shared:
                self.pool.release_prefix(job.shared)
            job.req.preemptions += 1
            if job.req.preemptions > 3:
                job.req.future.set_exception(exc)
            else:
                self._backlog.append(job.req)

    def _pick_constrained(self, slot: _Slot, logits: jnp.ndarray) -> int:
        """Choose the next token under the slot's grammar mask (greedy
        or sampled), feed its text into the acceptor, and arm
        finish_next when the grammar closes."""
        mask = jnp.asarray(np.array(
            slot.grammar.token_mask(self.tokenizer), bool))
        req = slot.request
        if req.temperature <= 0:
            tid = int(sampling.greedy(logits, mask))
        else:
            self._key, sub = jax.random.split(self._key)
            tid = int(sampling.sample(
                logits, sub, jnp.float32(req.temperature), mask=mask,
                top_k=req.top_k, top_p=req.top_p, min_p=req.min_p))
        slot.grammar.feed_text(self.tokenizer.decode_token(tid))
        if slot.grammar.done:
            slot.finish_next = True
        return tid

    def _sample_one(self, logits: jnp.ndarray, req: Request,
                    recent: List[int]) -> int:
        if req.temperature <= 0:
            return int(sampling.greedy(logits))
        self._key, sub = jax.random.split(self._key)
        # Per-slot repetition penalty over a fixed-width recent window
        # (static shape -> one compiled sampler for every slot).
        window = np.full(req.repeat_window, -1, np.int32)
        tail = recent[-req.repeat_window:]
        window[: len(tail)] = tail
        return int(sampling.sample(
            logits, sub, jnp.float32(req.temperature),
            top_k=req.top_k, top_p=req.top_p, min_p=req.min_p,
            recent_tokens=jnp.asarray(window),
            repetition_penalty=req.repetition_penalty))

    def _ensure_decode_capacity(self) -> None:
        """Grow each active sequence's page table before the batched
        step; on pool exhaustion preempt ONLY the affected slot — free
        its pages and restart the request from the backlog — instead of
        letting DEVICE_OOM kill the serve loop. A slot that cannot make
        progress even alone (or keeps getting preempted) fails its own
        future."""
        for slot in self._slots:
            if not slot.active:
                continue
            try:
                self.pool.ensure_capacity(slot.seq_id)
            except TrackieError as exc:
                req = slot.request
                slot.request = None
                self.pool.free_sequence(slot.seq_id)
                slot.seq_id = None
                others_active = any(s.active for s in self._slots)
                req.preemptions += 1
                if not others_active or req.preemptions > 3:
                    req.future.set_exception(exc)
                    log.warning("request failed after %d preemptions: %s",
                                req.preemptions, exc)
                else:
                    log.info("preempting slot (pool pressure), retrying "
                             "request (%d preemptions)", req.preemptions)
                    self._backlog.append(req)

    def _finish(self, slot: _Slot) -> None:
        req = slot.request
        if req is not None:
            self._commit_token(slot, req, -1, final=True)  # flush tail
        text = self.tokenizer.decode(slot.generated)
        if slot.stop_cut is not None:
            # Stop sequence: truncate BEFORE the match (llama.cpp
            # server semantics).
            text = text[: slot.stop_cut]
        if slot.grammar is not None and not slot.grammar.done:
            # Budget exhausted mid-structure: emit the grammar's
            # minimal valid closure so the contract (never-invalid
            # JSON) holds — same semantics as the runner's
            # budget-forced closure.
            closure = slot.grammar.closure()
            if closure and slot.grammar.feed_text(closure):
                text += closure
        slot.grammar = None
        slot.finish_next = False
        slot.request = None
        if self.paged and slot.seq_id is not None:
            self.pool.free_sequence(slot.seq_id)  # pages return instantly
            slot.seq_id = None
        self.stats["completed"] += 1
        if req and not req.future.cancelled():
            req.future.set_result(text)

    # NOTE: batched attention buckets (attn_len/attn_pages) were
    # measured and REVERTED: every server config regressed (dense
    # chunk8 207->184, paged chunk8 178->114 tok/s at B=8) — slicing
    # the (B, S) cache / page table inside the per-layer vmap
    # materializes copies that cost more than the masked full-cache
    # reads they avoid. The static args remain on the decode functions
    # (default None) with an exactness test; see PERF_NOTES.md.
    def _can_chunk(self, offset: int = 0) -> bool:
        """True when a full chunk_steps device chunk is safe: every
        active request greedy with >= chunk_steps of both token budget
        and cache room, no ADMITTABLE work waiting (waiting requests
        only block chunking while a slot is free to take them — when
        all slots are busy, a chunk cannot delay admission except in
        the early-EOS case, bounded at k steps; requiring an EMPTY
        backlog instead forced the whole first wave of a 2x-slots burst
        onto the per-step path, measured 3x slower at 31 ms fetch RTT),
        and — in paged mode — enough free pages to pre-grow every
        table. Always exactly chunk_steps or nothing — a variable k
        would compile one program per distinct k.

        ``offset`` > 0 asks about a SPECULATIVE chunk dispatched while
        ``offset`` earlier steps are still in flight (pipelined path):
        token budgets are evaluated as if every active slot survives
        those steps, i.e. with n_emitted/host_len advanced by offset —
        the no-EOS assumption. A wrong assumption only wastes the
        speculative chunk's work on the finished slot (its rows are
        junk past EOS exactly like the intra-chunk case above). The
        paged page check does NOT add the offset: pool lengths advance
        at DISPATCH time (batch_decode_steps), so in-flight chunks are
        already counted."""
        if self.chunk_steps <= 1:
            return False
        if ((not self._queue.empty() or self._backlog)
                and any(not s.active and not s.reserved
                        for s in self._slots)):
            return False
        k = self.chunk_steps
        for slot in self._slots:
            if not slot.active:
                continue
            req = slot.request
            if (req.temperature > 0
                    or slot.grammar is not None
                    or req.max_tokens - (slot.n_emitted + offset) < k
                    or self.cfg.max_seq - 1 - (slot.host_len + offset) < k):
                return False
        if self.paged:
            seq_ids = [s.seq_id if s.active else None for s in self._slots]
            if (self.pool.pages_needed_for(seq_ids, k)
                    > self.pool.free_pages):
                return False  # single-step path owns OOM/preemption
        return True

    def _decode_chunk(self) -> None:
        """chunk_steps greedy steps in one device program + ONE host
        fetch; per-token bookkeeping semantics identical to the
        single-step path (tested against it).

        Chunks PIPELINE in both modes: while chunk N's (k, B) token
        block is being fetched (a non-pipelining ~20-30 ms relay round
        trip), chunk N+1 is already dispatched, consuming chunk N's
        on-device last-token row directly — no host sync between
        chunks. The speculative dispatch assumes no slot finishes
        inside chunk N (checked via _can_chunk(offset=k) budgets); when
        one does (EOS or exact max_tokens), the in-flight chunk's rows
        are junk for that slot only — consumed-and-discarded exactly
        like intra-chunk post-EOS positions: a dense slot re-prefills
        its rows on reuse, a paged slot's junk lands in its OWN pages,
        and any later reuse of freed pages is a prefill dispatched
        AFTER the in-flight chunk (device execution is dispatch-
        ordered). Same trick as the interactive runner's k-token
        lookahead (llm/runner.py)."""
        k = self.chunk_steps
        produced = self._dispatch_chunk(
            [s.next_token if s.active else None for s in self._slots])
        # Exactly ONE chunk (k steps) is in flight at every loop check:
        # consuming chunk N advances n_emitted/host_len by k in the
        # same iteration that dispatched N+1, so the speculative budget
        # offset stays k — it does not accumulate. An in-flight
        # chunked-prefill job disables the pipelined stay-in-loop so
        # the serve iteration comes back around to advance the job
        # (the decode-chunk/prefill-chunk interleave).
        while self._prefill_job is None and self._can_chunk(offset=k):
            in_flight = self._dispatch_chunk(produced[k - 1])
            survived = self._consume_chunk(np.asarray(produced))
            if not survived:
                # A slot finished inside the consumed chunk; the
                # in-flight chunk is junk for it (skipped naturally:
                # _consume_chunk ignores inactive slots) but valid for
                # every survivor. Consume it and fall back to the
                # non-speculative loop.
                self._consume_chunk(np.asarray(in_flight))
                return
            produced = in_flight
        self._consume_chunk(np.asarray(produced))

    def _dispatch_chunk(self, tokens) -> jnp.ndarray:
        """Dispatch one k-step chunk; returns the (k, B) produced
        tokens as a DEVICE array (no fetch). ``tokens`` is a host list
        (first chunk) or a device (B,) row (pipelined follow-up).

        TRACKIE_DENSE_CHUNK_ATTN=1 bounds dense chunks' KV reads with a
        power-of-two ``attn_len`` bucket covering every slot's live
        context + in-flight + this chunk (2k headroom: host_len lags
        the device lengths by one in-flight chunk when pipelined) — the
        dense analogue of the paged attn_pages bound. Measured SLOWER
        at B=8 (393 vs ~440 tok/s unbounded; the per-step slice copies
        inside the scan cost more than masked full reads — same result
        as the round-2 attn-bucket revert), so it stays opt-in; the
        paged path's gather-once-per-chunk is the layout that makes
        bounded reads pay (432-528, >= dense)."""
        if self.paged:
            produced = self.pool.batch_decode_steps(
                self.params, tokens,
                [s.seq_id for s in self._slots], self.chunk_steps)
        else:
            if not isinstance(tokens, jnp.ndarray):
                tokens = jnp.asarray([t if t is not None else 0
                                      for t in tokens], jnp.int32)
            active = jnp.asarray([s.active for s in self._slots])
            attn_len = None
            if int(os.environ.get("TRACKIE_DENSE_CHUNK_ATTN", "0")):
                need = max((s.host_len for s in self._slots if s.active),
                           default=0) + 2 * self.chunk_steps + 1
                attn_len = 1 << (need - 1).bit_length()
                attn_len = min(attn_len, self.cfg.max_seq)
            produced, self.cache = self._m.decode_steps_batch(
                self.params, self.cfg, tokens, active, self.cache,
                self.chunk_steps, attn_len=attn_len)
        self.stats["decode_steps"] += self.chunk_steps
        return produced

    def _stream(self, req: Request, token_id: int,
                final: bool = False) -> None:
        if req.on_token is None:
            return
        try:
            if hasattr(self.tokenizer, "token_bytes"):
                # Byte-level tokenizer: buffer through an incremental
                # UTF-8 decoder so multibyte characters split across
                # tokens stream as whole characters and the pieces
                # concatenate to exactly tokenizer.decode(generated).
                if req._decoder is None:
                    import codecs

                    req._decoder = codecs.getincrementaldecoder(
                        "utf-8")("replace")
                data = (self.tokenizer.token_bytes(token_id)
                        if token_id >= 0 else b"")
                piece = req._decoder.decode(data, final)
            else:
                piece = self.tokenizer.decode_token(token_id)
            if piece:
                req.on_token(piece)
        except Exception as exc:  # noqa: BLE001 — user callback
            log.warning("on_token callback raised: %s", exc)
            req.on_token = None  # stop calling a broken callback

    def _commit_token(self, slot: _Slot, req: Request, token_id: int,
                      final: bool = False) -> bool:
        """Commit one token's text for a slot. Plain requests stream
        straight through; stop-armed requests assemble per-slot text,
        scan the tail window for a match, and stream with a
        max(len(stop))-1 hold-back so no stop fragment escapes.
        Returns True when a stop sequence fired."""
        if not req.stop:
            self._stream(req, token_id, final)
            return False
        if slot._decoder is None and hasattr(self.tokenizer,
                                             "token_bytes"):
            import codecs

            slot._decoder = codecs.getincrementaldecoder(
                "utf-8")("replace")
        if slot._decoder is not None:
            data = (self.tokenizer.token_bytes(token_id)
                    if token_id >= 0 else b"")
            piece = slot._decoder.decode(data, final)
        else:
            piece = (self.tokenizer.decode_token(token_id)
                     if token_id >= 0 else "")
        max_stop = max(len(s) for s in req.stop)
        hit = False
        if piece:
            slot.text += piece
            if slot.stop_cut is None:
                start = max(0, len(slot.text) - len(piece)
                            - max_stop + 1)
                best = None
                for s in req.stop:
                    idx = slot.text.find(s, start)
                    if idx >= 0 and (best is None or idx < best):
                        best = idx
                if best is not None:
                    slot.stop_cut = best
                    hit = True
        if req.on_token is not None:
            if slot.stop_cut is not None:
                limit = slot.stop_cut
            elif final:
                limit = len(slot.text)
            else:
                limit = len(slot.text) - (max_stop - 1)
            if limit > slot.streamed:
                try:
                    req.on_token(slot.text[slot.streamed:limit])
                except Exception as exc:  # noqa: BLE001 — user callback
                    log.warning("on_token callback raised: %s", exc)
                    req.on_token = None
                slot.streamed = limit
        return hit

    def _consume_chunk(self, prod: np.ndarray) -> bool:
        """Host bookkeeping for one fetched (k, B) chunk. Returns False
        if any slot finished (EOS / budget) inside it."""
        k = self.chunk_steps
        survived = True
        for i, slot in enumerate(self._slots):
            if not slot.active:
                continue
            req = slot.request
            if req.future.cancelled():
                # Client gave up: free the slot now instead of decoding
                # to budget (its cache rows re-prefill on reuse).
                self._finish(slot)
                survived = False
                continue
            for j in range(k):
                slot.generated.append(slot.next_token)
                stop_hit = self._commit_token(slot, req, slot.next_token)
                slot.n_emitted += 1
                slot.host_len += 1
                self.stats["tokens"] += 1
                nxt = int(prod[j, i])
                if (stop_hit
                        or nxt == self.tokenizer.eos_id
                        or slot.n_emitted >= req.max_tokens
                        or slot.host_len >= self.cfg.max_seq - 1):
                    # Later chunk positions wrote junk into this slot's
                    # cache rows; the slot is freed and re-prefilled on
                    # reuse, so they are unreachable.
                    self._finish(slot)
                    survived = False
                    break
                slot.next_token = nxt
        return survived

    @staticmethod
    def _fail(req: Optional[Request], exc: Exception) -> None:
        """Settle a future with ``exc`` if it is still pending."""
        if req is not None and not req.future.done():
            req.future.set_exception(exc)

    def _serve_loop(self) -> None:
        try:
            # Re-enter the device context INSIDE the thread: the
            # caller's jax.default_device is thread-local and gone here.
            if self._device is not None:
                with jax.default_device(self._device):
                    self._serve_loop_inner()
            else:
                self._serve_loop_inner()
        except Exception as exc:  # noqa: BLE001 — fail futures, not hang
            log.error("serve loop died: %r", exc)
            self._fatal = exc  # submit() fails fast from here on
            self._abort_prefill_job(exc)
            for slot in self._slots:
                if slot.active:
                    self._fail(slot.request, exc)
                    slot.request = None
            # Admission-wave requests: popped from the queue, not yet
            # bound to a slot — the round-3 orphan class.
            for req in self._inflight:
                self._fail(req, exc)
            self._inflight.clear()
            for req in self._backlog:
                self._fail(req, exc)
            self._backlog.clear()
            while True:
                try:
                    self._fail(self._queue.get_nowait(), exc)
                except queue.Empty:
                    break

    def _serve_loop_inner(self) -> None:
        while not self._stop.is_set():
            self._admit()
            if self._prefill_job is not None:
                # One prompt chunk per iteration, between decode work:
                # active streams' stall is bounded by one chunk, not
                # one whole prompt prefill.
                self._advance_prefill()
            active_mask = [s.active for s in self._slots]
            if not any(active_mask):
                if self._prefill_job is None:
                    time.sleep(0.005)
                continue

            if self.paged:
                self._ensure_decode_capacity()
                active_mask = [s.active for s in self._slots]
                if not any(active_mask):
                    continue
                if self._can_chunk():
                    self._decode_chunk()
                    continue
                logits = self.pool.batch_decode_step(
                    self.params,
                    [s.next_token if s.active else None
                     for s in self._slots],
                    [s.seq_id for s in self._slots])
            else:
                if self._can_chunk():
                    self._decode_chunk()
                    continue
                tokens = jnp.asarray(
                    [s.next_token if s.active else 0 for s in self._slots],
                    jnp.int32)
                active = jnp.asarray(active_mask)
                logits, self.cache = self._m.decode_step_batch(
                    self.params, self.cfg, tokens, active, self.cache)
            self.stats["decode_steps"] += 1

            # One device->host fetch for every greedy slot; sampled slots
            # (temperature > 0) draw individually.
            greedy_all = np.asarray(jnp.argmax(logits, axis=-1))
            for i, slot in enumerate(self._slots):
                if not slot.active:
                    continue
                req = slot.request
                if req.future.cancelled():
                    self._finish(slot)
                    continue
                slot.generated.append(slot.next_token)
                stop_hit = self._commit_token(slot, req, slot.next_token)
                slot.n_emitted += 1
                slot.host_len += 1
                self.stats["tokens"] += 1
                if stop_hit:
                    self._finish(slot)
                    continue
                if slot.finish_next:
                    # The grammar closed on the token just committed.
                    self._finish(slot)
                    continue
                if slot.grammar is not None:
                    # Budget check BEFORE picking: the acceptor feeds
                    # at pick time, so a picked-but-never-committed
                    # token would desync the closure by one character.
                    if (slot.n_emitted >= req.max_tokens
                            or slot.host_len >= self.cfg.max_seq - 1):
                        self._finish(slot)  # budget-forced closure
                    else:
                        slot.next_token = self._pick_constrained(
                            slot, logits[i])
                    continue
                if req.temperature <= 0:
                    nxt = int(greedy_all[i])
                else:
                    nxt = self._sample_one(logits[i], req, slot.generated)
                if (nxt == self.tokenizer.eos_id
                        or slot.n_emitted >= req.max_tokens
                        or slot.host_len >= self.cfg.max_seq - 1):
                    self._finish(slot)
                else:
                    slot.next_token = nxt

    def close(self) -> None:
        self._stop.set()
        # A cold decode compile inside the loop can take >5 s; returning
        # while the thread is in device code risks a crash at exit.
        self._thread.join(timeout=30.0)
        if self._thread.is_alive():
            # The serve thread still owns _inflight/_backlog/_slots;
            # mutating them here would race it (advisor r4). The loop
            # has seen _stop and will fail its own stragglers on the
            # way out; we only drain the queue, which is thread-safe.
            log.warning("serve loop did not stop within 30 s; "
                        "skipping straggler cleanup to avoid racing it")
            closed = RuntimeError("server closed")
            while True:
                try:
                    self._fail(self._queue.get_nowait(), closed)
                except queue.Empty:
                    break
            return
        # Fail any stragglers.
        closed = RuntimeError("server closed")
        self._abort_prefill_job(closed)
        for req in self._inflight:
            self._fail(req, closed)
        self._inflight.clear()
        for req in self._backlog:
            self._fail(req, closed)
        self._backlog.clear()
        while True:
            try:
                self._fail(self._queue.get_nowait(), closed)
            except queue.Empty:
                break
        for slot in self._slots:
            if slot.active:
                self._fail(slot.request, closed)
                slot.request = None
