#!/usr/bin/env python
"""Measure BASELINE config 5 on the real chip: end-of-speech ->
FIRST SPOKEN AUDIO latency (the reference's UX metric — the user hears
the first clause, not the full reply; its loop target is 10 Hz,
reference: src/workers/src/cortex_worker.rs:131).

Full-size architectures (whisper-tiny ASR + YOLOv8n 640 + MiDaS-small
384 + Mistral-7B Q4 + TTS) wired like production through the shared
InferenceScheduler (runtime/scheduler.py):

  pre-t0 (steady state, i.e. WHILE the user is still speaking): the
        10 Hz vision loop's latest completed tick feeds the world
        model; the constant system prefix is prefilled once per
        conversation (standard KV reuse across turns); incremental ASR
        (audio/streaming_asr.py LocalAgreement) has already agreed a
        stable transcript prefix, which the cortex chunk-prefilled
        onto the cache mid-utterance
  t0 (end of speech: device-resident utterance + frame)
   ├─ ASR job: the authoritative full pass, ONE device dispatch
   └─ VISION job (fresh frame): queued at priority 0 — the next
        passive tick, runs after the reply's critical path
  then: ONE LLM_DECODE job: extend(transcript suffix + world-model
        context, 64-token bucket) chained into the first-sentence
        decode (8 tokens)
  then: streaming TTS; first vocoder chunk on host -> t_first_audio
  then: finish the reply (12 tokens total) + final TTS -> t_full

Random weights (latency is weight-independent); every run perturbs the
frame and prompt so nothing in the stack can replay. Prints one JSON
line with p50s for both time-to-first-audio and the full reply.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402

from trackiellm_tpu.cortex.reasoner import ContextualReasoner  # noqa: E402
from trackiellm_tpu.models import depth as depth_model  # noqa: E402
from trackiellm_tpu.models import detector as det_model  # noqa: E402
from trackiellm_tpu.models import llm as llm_model  # noqa: E402
from trackiellm_tpu.models import tts as tts_model  # noqa: E402
from trackiellm_tpu.models import whisper as whisper_model  # noqa: E402
from trackiellm_tpu.ops.mel import log_mel_spectrogram  # noqa: E402
from trackiellm_tpu.runtime.scheduler import InferenceScheduler, JobKind  # noqa: E402
from trackiellm_tpu.vision.pipeline import AnalysisFlags, VisionPipeline  # noqa: E402

FIRST_SENTENCE_TOKENS = 8   # pt-BR first clause ("ha uma xicara a frente.")
N_ANSWER_TOKENS = 12        # short spoken reply total
RUNS = 5
PREFIX_BUCKET = 128
CTX_BUCKET = 128    # pre-t0 stable-prefix extend (off the hot path)
SUFFIX_BUCKET = 64  # t0 extend: transcript tail + world-model context
ATTN_LEN = 256


def _to_ids(text: str, vocab: int, bucket: int):
    ids = np.frombuffer(text.encode()[: bucket - 8], np.uint8)
    ids = ids.astype(np.int32) % vocab
    padded = np.zeros(bucket, np.int32)
    padded[: len(ids)] = ids
    return padded, len(ids)


def main() -> None:
    key = jax.random.PRNGKey(int(time.time()) & 0x7FFFFFFF)
    ks = jax.random.split(key, 4)

    print("building models...", file=sys.stderr)
    det_cfg = det_model.DetectorConfig.v8n()
    det_params = det_model.init_detector(ks[0], det_cfg)
    dep_cfg = depth_model.DepthConfig.small()
    dep_params = depth_model.init_depth(ks[1], dep_cfg)
    llm_cfg = llm_model.LLMConfig.mistral_7b()._replace(
        max_seq=1024, sliding_window=1024)
    llm_params = llm_model.init_params_quantized(ks[2], llm_cfg, bits=4)
    tts_cfg = tts_model.TTSConfig.default()
    tts_params = tts_model.init_tts(ks[3], tts_cfg)
    asr_cfg = whisper_model.WhisperConfig.tiny()._replace(n_audio_ctx=500)
    asr_params = whisper_model.init_whisper(jax.random.fold_in(key, 9),
                                            asr_cfg)

    pipe = VisionPipeline(
        detector_fn=lambda chw: det_model.detector_forward(
            det_params, det_cfg, chw),
        depth_fn=lambda chw: depth_model.depth_forward(
            dep_params, dep_cfg, chw),
    )
    reasoner = ContextualReasoner()
    sched = InferenceScheduler()
    rng = np.random.default_rng(int(time.time()))
    kv = llm_model.KVCache.create(llm_cfg)

    def one_pass(seed: int):
        # The camera worker uploads frames continuously (10 Hz loop,
        # reference src/workers/src/cortex_worker.rs:131); at
        # end-of-speech the LATEST frame is already device-resident, so
        # the upload (~66 ms through the axon relay for 0.9 MB,
        # tools/diag_vision.py) is off the measured path — t0 starts
        # when the user stops speaking, not when the frame crosses PCIe.
        frame = jnp.asarray(
            rng.integers(0, 255, (480, 640, 3), dtype=np.uint8))
        int(frame[0, 0, 0])  # upload complete
        # The finalized utterance (VAD end-of-speech): 5 s of audio,
        # fresh every run so nothing in the stack can replay. Like the
        # frame, it is device-resident at t0: the audio worker uploads
        # 100 ms capture chunks continuously (reference cadence,
        # src/workers/src/audio_worker.rs:194-198), so by end-of-speech
        # the buffer is already on device.
        utterance = jnp.asarray(
            rng.standard_normal(5 * 16000).astype(np.float32) * 0.05)
        float(utterance[0])  # upload complete
        # The vision loop runs continuously (10 Hz); the reasoner's
        # context at end-of-speech comes from the latest COMPLETED tick
        # (the reference cortex builds its LLM prompt from the current
        # world model, updated by the vision worker's last result —
        # src/cortex/tk_cortex_main.c:1149 -> :1323 — not from a frame
        # captured after the user stops talking). Run that tick pre-t0.
        prev_result = pipe.process_frame(
            frame, AnalysisFlags.DETECTION | AnalysisFlags.DEPTH)
        reasoner.update_vision_context(prev_result.objects)
        # The system prefix is constant for the conversation; its KV is
        # prefilled ONCE and reused across turns (the runner's standard
        # KV-reuse path), so at t0 only the transcript-dependent suffix
        # remains to process.
        prefix, n_prefix = _to_ids(
            "Voce e o Trackie, assistente de navegacao. ",
            llm_cfg.vocab_size, PREFIX_BUCKET)
        base = llm_model.KVCache(kv.k, kv.v, jnp.int32(0))
        _, base = llm_model.prefill(llm_params, llm_cfg,
                                    jnp.asarray(prefix),
                                    jnp.int32(n_prefix), base)
        # Incremental ASR ran during the utterance (streaming_asr.py:
        # a ~60 ms device pass per second of speech, off this path by
        # construction); its agreed stable prefix was chunk-prefilled
        # as it grew. Only the tail words remain unknown at t0.
        stable_text = "o que vejo agora aqui"
        stable_ids, n_stable = _to_ids(stable_text, llm_cfg.vocab_size,
                                       CTX_BUCKET)
        _, base = llm_model.extend(
            llm_params, llm_cfg, jnp.asarray(stable_ids),
            jnp.int32(n_stable), base, attn_len=ATTN_LEN)
        int(base.length)
        t0 = time.perf_counter()

        # --- stage 1: ASR first (it gates the whole reply); the fresh
        # frame's vision job is queued BELOW response priority — it is
        # the next loop tick, not a reply dependency. ASR is ONE device
        # dispatch (models/whisper.py _transcribe_device) — mel +
        # encode + greedy while_loop decode.
        def asr_job():
            mel = log_mel_spectrogram(jnp.asarray(utterance))
            mel = jnp.pad(
                mel, ((0, 0), (0, asr_cfg.n_audio_ctx * 2 - mel.shape[1])))
            return whisper_model.transcribe_tokens(
                asr_params, asr_cfg, mel, max_tokens=16)

        fresh_frame = jnp.asarray(
            rng.integers(0, 255, (480, 640, 3), dtype=np.uint8))
        fut_asr = sched.submit(JobKind.ASR, asr_job)
        fut_vision = sched.submit(
            JobKind.VISION,
            lambda: pipe.process_frame(
                fresh_frame, AnalysisFlags.DETECTION | AnalysisFlags.DEPTH),
            priority=0)  # passive tick yields to the active reply
        asr_toks = fut_asr.result(timeout=60)
        marks = {"asr": time.perf_counter() - t0}
        # The authoritative pass confirms the stable prefix and yields
        # the tail the streaming agreement had not settled yet.
        suffix = f"? ({seed}/{len(asr_toks)})"
        query = stable_text + suffix

        # --- stage 2+3: suffix+context extend + first-sentence decode --
        # ONE scheduler job: the extend (chunked prefill of the
        # transcript tail + world-model context onto the cache that
        # already holds system prefix + stable transcript) chains
        # straight into the first decode slice — no host round trip
        # between them. Decode runs as slices (the scheduler's
        # documented contract): per-token jobs measured ~20 ms/token
        # because each job completion is a full relay round trip,
        # breaking the dispatch pipelining that makes the raw loop run
        # at ~10.6 ms/token.
        context = reasoner.generate_context_string(
            user_query=query, token_budget=32)
        ctx_ids, n_ctx = _to_ids(suffix + "\n" + context,
                                 llm_cfg.vocab_size, SUFFIX_BUCKET)
        cache = base

        def decode_slice(tok, cache, n):
            for _ in range(n):
                logits, cache = llm_model.decode_step(
                    llm_params, llm_cfg, tok, cache, attn_len=ATTN_LEN)
                tok = jnp.argmax(logits).astype(jnp.int32)
            int(tok)  # slice boundary: decode really finished
            return tok, cache

        def extend_and_first_sentence(cache):
            logits, cache = llm_model.extend(
                llm_params, llm_cfg, jnp.asarray(ctx_ids),
                jnp.int32(n_ctx), cache, attn_len=ATTN_LEN)
            tok = jnp.argmax(logits).astype(jnp.int32)
            return decode_slice(tok, cache, FIRST_SENTENCE_TOKENS)

        tok, cache = sched.run(JobKind.LLM_DECODE,
                               extend_and_first_sentence, cache)
        marks["slice1"] = time.perf_counter() - t0

        # Streaming TTS: the first vocoder chunk (0.64 s of audio) is
        # the first thing the user hears; the rest of the sentence
        # vocodes while it plays.
        def tts_first(text):
            gen = tts_model.synthesize_streaming(tts_params, tts_cfg, text)
            return next(gen), gen

        first_wav, gen1 = sched.run(
            JobKind.TTS, tts_first, "ha uma xicara na mesa a sua frente.")
        float(first_wav[0])  # first audio sample on host
        t_first_audio = time.perf_counter() - t0
        marks["tts1"] = t_first_audio
        sched.run(JobKind.TTS, lambda: list(gen1))  # drain sentence 1
        tok, cache = sched.run(JobKind.LLM_DECODE, decode_slice, tok,
                               cache, N_ANSWER_TOKENS - FIRST_SENTENCE_TOKENS)
        wavs = sched.run(JobKind.TTS, lambda: list(
            tts_model.synthesize_streaming(
                tts_params, tts_cfg, "mais nada de relevante por perto.")))
        float(wavs[-1][-1])
        t_full = time.perf_counter() - t0
        # drain the passive vision tick (ran below reply priority)
        fresh = fut_vision.result(timeout=60)
        marks["vision_tick"] = time.perf_counter() - t0
        reasoner.update_vision_context(fresh.objects)
        return t_first_audio, t_full, marks

    print("warmup (compiles)...", file=sys.stderr)
    one_pass(0)
    pairs = [one_pass(i + 1) for i in range(RUNS)]
    firsts = sorted(p[0] * 1e3 for p in pairs)
    fulls = sorted(p[1] * 1e3 for p in pairs)
    stage_meds = {
        k: round(sorted(p[2][k] for p in pairs)[len(pairs) // 2] * 1e3, 1)
        for k in pairs[0][2]}
    sched.close()
    print(json.dumps({
        "config": "frame_to_spoken_response_e2e",
        "p50_first_audio_ms": round(firsts[len(firsts) // 2], 1),
        "p50_full_reply_ms": round(fulls[len(fulls) // 2], 1),
        "first_audio_runs_ms": [round(v, 1) for v in firsts],
        "full_runs_ms": [round(v, 1) for v in fulls],
        "first_sentence_tokens": FIRST_SENTENCE_TOKENS,
        "answer_tokens": N_ANSWER_TOKENS,
        "stage_marks_p50_ms": stage_meds,
    }))


if __name__ == "__main__":
    main()
