"""Multimodal (vision-language) session runner: LLaVA-class image input.

``VLMRunner`` extends :class:`trackiellm_tpu.llm.runner.LLMRunner` with
image prompts: ``generate("Describe <image>", images=[frame])`` encodes
each image through the CLIP tower + projector (models/clip.py), splices
the projected features over the image placeholder rows of the prompt
embedding, and ingests the result through ``prefill/extend(embeds=...)``.
Decoding (k-token lookahead, grammars, stop strings, streaming UTF-8)
is inherited untouched — generation is pure text.

Parity: llama.cpp's llava/"mmproj" path (the engine family the
reference embeds, src/ai_models/tk_model_loader.c:199) — a CLIP GGUF
encodes the image and its embedding batch is spliced into the LLM
context exactly this way.

Cross-turn prefix reuse stays exact with images: committed image runs
carry a content digest; a new prompt may reuse the cache only up to the
first position where text tokens or (position, length, digest) of an
image run disagree — a different image at the same spot rolls the cache
back before it (rows past ``length`` are stale-masked, the proven
lookahead-rollback contract).
"""

from __future__ import annotations

import hashlib
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from trackiellm_tpu.models import clip as clip_model
from trackiellm_tpu.models import llm as llm_model
from trackiellm_tpu.llm.runner import (EXTEND_BUCKETS, PREFILL_BUCKETS,
                                       GenerationConfig, LLMRunner,
                                       ToolDefinition, _bucket_for)
from trackiellm_tpu.utils.errors import ErrorCode, TrackieError
from trackiellm_tpu.utils.logging import get_logger

log = get_logger("llm.vlm")

# (start, n_tokens, digest) of an image run committed to the KV cache.
_Run = Tuple[int, int, bytes]


class VLMRunner(LLMRunner):
    """LLMRunner + image prompts (LLaVA-class multimodal)."""

    IMAGE_MARKER = "<image>"
    # Filler id written to the device token buffer at image rows (the
    # spliced embeddings override it; any in-vocab id works).
    IMAGE_FILLER_ID = 0

    def __init__(self, params, cfg, clip_params, clip_cfg,
                 tokenizer=None, gen_config: Optional[GenerationConfig]
                 = None, cache_dtype=jnp.bfloat16, model=None,
                 prefix_lm: bool = False):
        """``prefix_lm``: PaliGemma-style inference — the WHOLE input
        prompt attends bidirectionally (models/llm.py prefill
        ``bidir_len``), so every prompt ingests as ONE prefill bucket
        (no chunking, no cross-turn prefix reuse: a changed suffix
        changes every prefix hidden state). Generated tokens decode
        causally as usual."""
        if model is not None and model is not llm_model:
            raise TrackieError(
                ErrorCode.INVALID_ARGUMENT,
                "VLMRunner supports the models.llm forward surface only "
                "(embeds injection); MLA multimodal is not implemented")
        super().__init__(params, cfg, tokenizer=tokenizer,
                         gen_config=gen_config, cache_dtype=cache_dtype,
                         model=model)
        self.clip_params = clip_params
        self.clip_cfg = clip_cfg
        self.prefix_lm = prefix_lm
        self._image_runs: List[_Run] = []

    # -- image encoding ----------------------------------------------------

    def encode_image(self, image) -> jnp.ndarray:
        """Image -> (n_image_tokens, llm_dim) projected features.

        Accepts an HWC uint8 camera frame (CLIP-normalized + resized on
        device) or pre-normalized (3, S, S) float32 ``pixel_values``.
        """
        image = np.asarray(image)
        if image.ndim != 3:
            raise TrackieError(ErrorCode.INVALID_ARGUMENT,
                               f"expected an image, got shape {image.shape}")
        if image.dtype == np.uint8:
            px = clip_model.preprocess_clip(jnp.asarray(image), self.clip_cfg)
        else:
            if image.shape[0] != 3:
                raise TrackieError(ErrorCode.INVALID_ARGUMENT,
                                   "float image input must be CHW "
                                   "pixel_values")
            px = jnp.asarray(image, jnp.float32)
        return clip_model.encode_and_project(
            self.clip_params, self.clip_cfg, px)

    @staticmethod
    def _digest(image) -> bytes:
        return hashlib.sha1(
            np.ascontiguousarray(np.asarray(image)).tobytes()).digest()

    # -- multimodal prompt ingestion ----------------------------------------

    def prepare_generation(self, prompt: str,
                           tools: Sequence[ToolDefinition] = (),
                           force_tool_call: bool = False,
                           response_schema: Optional[Dict[str, Any]] = None,
                           json_mode: bool = False,
                           images: Sequence[Any] = ()) -> None:
        if not images and not self._image_runs and not self.prefix_lm:
            # Pure text and no image rows in the cache: the base path
            # (incl. priming + prefix reuse) is exact.
            super().prepare_generation(
                prompt, tools, force_tool_call,
                response_schema=response_schema, json_mode=json_mode)
            return
        segs = prompt.split(self.IMAGE_MARKER)
        if len(segs) - 1 != len(images):
            raise TrackieError(
                ErrorCode.INVALID_ARGUMENT,
                f"prompt has {len(segs) - 1} {self.IMAGE_MARKER} markers "
                f"but {len(images)} images were given")
        self._drop_pending_lookahead()
        self._drop_pending_spec()
        self._primed_ids = None  # text priming does not compose w/ images

        n_img = self.clip_cfg.n_image_tokens
        ids: List[int] = self.tokenizer.encode(segs[0], add_bos=True)
        runs: List[Tuple[int, int, bytes, Any]] = []
        for image, seg in zip(images, segs[1:]):
            feats = self.encode_image(image)
            runs.append((len(ids), n_img, self._digest(image), feats))
            ids.extend([self.IMAGE_FILLER_ID] * n_img)
            if seg:
                ids.extend(self.tokenizer.encode(seg, add_bos=False))

        hard_limit = max(self.cfg.max_seq - self.gen.max_tokens - 1, 16)
        if len(ids) > hard_limit:
            # The base runner middle-cuts oversized text prompts; a cut
            # crossing an image run would tear its embedding block, so
            # overflow is an error here (budget prompts upstream).
            raise TrackieError(
                ErrorCode.CONTEXT_OVERFLOW,
                f"multimodal prompt of {len(ids)} tokens exceeds the "
                f"{hard_limit}-token window budget")

        if self.prefix_lm:
            self._ingest_prefix_lm(ids, runs)
        else:
            self._ingest_multimodal(ids, runs)
        self._arm_generation_state(tools, force_tool_call,
                                   response_schema, json_mode)

    def _ingest_prefix_lm(self, ids: List[int], runs) -> None:
        """One bidirectional prefill over the whole prompt (PaliGemma
        inference semantics)."""
        buckets = ([b for b in PREFILL_BUCKETS if b <= self.cfg.max_seq]
                   or [self.cfg.max_seq])
        if len(ids) > buckets[-1]:
            raise TrackieError(
                ErrorCode.CONTEXT_OVERFLOW,
                f"prefix-LM prompt of {len(ids)} tokens exceeds the "
                f"largest prefill bucket {buckets[-1]} (bidirectional "
                f"attention cannot be chunked)")
        bucket = _bucket_for(len(ids), buckets)
        padded = np.zeros(bucket, np.int32)
        padded[: len(ids)] = ids
        self.cache = self.cache._replace(length=jnp.int32(0))
        embeds = self._chunk_embeds(padded, 0, runs)
        logits, self.cache = self._m.prefill(
            self.params, self.cfg, jnp.asarray(padded),
            jnp.int32(len(ids)), self.cache, embeds=embeds,
            bidir_len=jnp.int32(len(ids)))
        self._host_len = len(ids)
        self._committed_ids = list(ids)
        self._pending_spec = []
        self._next_logits = logits
        self._image_runs = [(s, n, d) for (s, n, d, _) in runs]

    def _ingest_multimodal(self, ids: List[int], runs) -> None:
        """Digest-aware prefix reuse + embeds-spliced prefill/extend."""
        committed = self._committed_ids
        lcp = 0
        limit = min(len(committed), len(ids))
        while lcp < limit and committed[lcp] == ids[lcp]:
            lcp += 1
        # Image runs inside the shared prefix must agree on (start, n,
        # digest) pairwise in order; cap the reuse at the first
        # disagreement (conservative caps only shrink reuse — text
        # equality alone can't distinguish filler rows).
        new_runs: List[_Run] = [(s, n, d) for (s, n, d, _) in runs]
        for old, new in zip(self._image_runs, new_runs):
            if old != new:
                lcp = min(lcp, min(old[0], new[0]))
                break
        else:
            longer = (self._image_runs[len(new_runs):]
                      or new_runs[len(self._image_runs):])
            if longer:
                lcp = min(lcp, longer[0][0])
        lcp = min(lcp, len(ids) - 1)

        if lcp >= self.PREFIX_REUSE_MIN:
            self.cache = self.cache._replace(length=jnp.int32(lcp))
            self._host_len = lcp
            del self._committed_ids[lcp:]
            self._pending_spec = []
            start_at = lcp
            log.info("multimodal prefix reuse: %d/%d tokens in cache",
                     lcp, len(ids))
        else:
            # Fresh ingestion: head bucket through prefill, rest chunked.
            buckets = ([b for b in PREFILL_BUCKETS
                        if b <= self.cfg.max_seq] or [self.cfg.max_seq])
            first_n = min(len(ids), buckets[-1])
            bucket = _bucket_for(first_n, buckets)
            padded = np.zeros(bucket, np.int32)
            padded[:first_n] = ids[:first_n]
            self.cache = self.cache._replace(length=jnp.int32(0))
            embeds = self._chunk_embeds(padded, 0, runs)
            logits, self.cache = self._m.prefill(
                self.params, self.cfg, jnp.asarray(padded),
                jnp.int32(first_n), self.cache, embeds=embeds)
            self._host_len = first_n
            self._committed_ids = list(ids[:first_n])
            self._pending_spec = []
            self._next_logits = logits
            start_at = first_n

        pos = start_at
        chunk_cap = EXTEND_BUCKETS[-1]
        logits = self._next_logits
        while pos < len(ids):
            chunk = ids[pos: pos + chunk_cap]
            logits = self._extend_ids_embeds(chunk, pos, runs)
            pos += len(chunk)
        self._next_logits = logits
        self._image_runs = [r for r in new_runs]

    def _chunk_embeds(self, padded: np.ndarray, lo: int, runs
                      ) -> jnp.ndarray:
        """Token embeddings for a padded chunk starting at prompt
        position ``lo``, with every overlapping image run's projected
        features spliced over its rows."""
        x = llm_model.embed_tokens(self.params, jnp.asarray(padded))
        hi = lo + len(padded)
        for (s, n, _d, feats) in runs:
            a, b = max(s, lo), min(s + n, hi)
            if a < b:
                x = jax.lax.dynamic_update_slice(
                    x, feats[a - s: b - s].astype(x.dtype), (a - lo, 0))
        return x

    def _extend_ids_embeds(self, chunk: List[int], lo: int, runs
                           ) -> jnp.ndarray:
        bucket = _bucket_for(len(chunk), EXTEND_BUCKETS)
        padded = np.zeros(bucket, np.int32)
        padded[: len(chunk)] = chunk
        embeds = self._chunk_embeds(padded, lo, runs)
        logits, self.cache = self._m.extend(
            self.params, self.cfg, jnp.asarray(padded),
            jnp.int32(len(chunk)), self.cache,
            attn_len=self._attn_bucket_for(self._host_len + bucket),
            embeds=embeds)
        self._host_len += len(chunk)
        self._committed_ids.extend(int(i) for i in chunk)
        return logits

    def prime(self, prompt_prefix: str) -> None:
        """Mid-utterance priming prefills CAUSALLY — meaningless under
        prefix-LM semantics (the final prompt re-prefills
        bidirectionally anyway), so it is a no-op there."""
        if self.prefix_lm:
            log.debug("prime() ignored in prefix-LM mode")
            return
        super().prime(prompt_prefix)

    # -- public API ----------------------------------------------------------

    def generate(self, prompt: str, tools: Sequence[ToolDefinition] = (),
                 force_tool_call: bool = False,
                 on_token: Optional[Callable[[str], None]] = None,
                 should_stop: Optional[Callable[[], bool]] = None,
                 response_schema: Optional[Dict[str, Any]] = None,
                 json_mode: bool = False,
                 images: Sequence[Any] = ()) -> str:
        """Full multimodal generation (base semantics + ``images``)."""
        self.prepare_generation(prompt, tools, force_tool_call,
                                response_schema=response_schema,
                                json_mode=json_mode, images=images)
        while (piece := self.generate_next_token()) is not None:
            if on_token:
                on_token(piece)
            if should_stop is not None and should_stop():
                self._done = True
                break
        self._drop_pending_spec()
        self._drop_pending_lookahead()
        tail = self._flush_text()
        if tail and on_token:
            on_token(tail)
        return self._generated_text

    def reset(self) -> None:
        super().reset()
        self._image_runs = []
