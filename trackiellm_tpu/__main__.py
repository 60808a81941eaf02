"""CLI entry: ``python -m trackiellm_tpu <command>``.

Commands mirror the reference's operator workflows (README.md's
``trackied --config ...`` invocation plus the model tooling):

  inspect <model>                  — format/metadata of a checkpoint
  convert <gguf> -o DIR [--bits N] — GGUF -> native checkpoint
  generate <ckpt> -p PROMPT        — run a generation from a checkpoint
  bench                            — headline decode benchmark
  demo [seconds]                   — full assistant loop, mock hardware
"""

from __future__ import annotations

import argparse
import json
import sys


def _cmd_inspect(args) -> int:
    from trackiellm_tpu.models.loader import describe

    print(json.dumps(describe(args.model), indent=1))
    return 0


def _cmd_convert(args) -> int:
    import os
    import time

    from trackiellm_tpu.models.checkpoint import save_checkpoint

    t0 = time.time()
    vocab = None
    tok_spec = None
    if args.family in ("llava-hf", "paligemma-hf"):
        # Multimodal: the language model saves at --output, the vision
        # tower + projector at --output/vision (its own checkpoint with
        # a CLIPVisionConfig sidecar). Parity: llama.cpp splits the
        # same checkpoint into a text GGUF + an "mmproj" file.
        from tools.parity_common import load_state_dict

        from trackiellm_tpu.models import convert as _C

        if args.family == "llava-hf":
            params, cfg, clip_params, clip_cfg = _C.llava_from_hf(
                load_state_dict(args.gguf), n_heads=args.n_heads,
                vision_n_heads=args.vision_n_heads)
            kind = "llava"
        else:
            params, cfg, clip_params, clip_cfg = _C.paligemma_from_hf(
                load_state_dict(args.gguf),
                vision_n_heads=args.vision_n_heads)
            kind = "paligemma"  # prefix-LM: VLMRunner(prefix_lm=True)
        if args.bits:
            from trackiellm_tpu.models.llm import quantize_params
            params = quantize_params(params, bits=args.bits)
        save_checkpoint(args.output, params, config=cfg,
                        metadata={"source": args.gguf, "bits": args.bits,
                                  "multimodal": kind})
        save_checkpoint(os.path.join(args.output, "vision"), clip_params,
                        config=clip_cfg, metadata={"source": args.gguf})
        print(f"converted + saved LLM to {args.output}, vision tower to "
              f"{args.output}/vision in {time.time() - t0:.1f}s")
        return 0
    if args.family == "trocr-hf":
        # OCR: HF VisionEncoderDecoderModel (microsoft/trocr-*) ->
        # models/trocr.py checkpoint with its TrOCRConfig sidecar.
        from tools.parity_common import load_state_dict

        from trackiellm_tpu.models import convert as _C

        conf = None
        if getattr(args, "model_config", None):
            conf = json.loads(open(args.model_config).read())
        params, cfg = _C.trocr_from_hf(load_state_dict(args.gguf), conf)
        save_checkpoint(args.output, params, config=cfg,
                        metadata={"source": args.gguf, "ocr": "trocr"})
        print(f"converted + saved TrOCR to {args.output} in "
              f"{time.time() - t0:.1f}s")
        return 0
    if args.family in ("gemma2-hf", "gemma3-hf", "smollm3-hf",
                       "olmo2-hf", "mixtral-hf", "qwen2moe-hf",
                       "qwen3-hf", "qwen3moe-hf", "deepseekv2-hf",
                       "deepseekv3-hf", "granite-hf", "glm4-hf",
                       "llama4-hf", "nemotron-hf", "starcoder2-hf",
                       "cohere-hf", "ernie45-hf", "falcon-hf",
                       "mamba-hf", "mamba2-hf", "glm4moe-hf",
                       "qwen3next-hf"):
        # transformers state dict (.pt/.safetensors/.npz).
        from tools.parity_common import load_state_dict

        from trackiellm_tpu.models import convert as _C

        fn = {"gemma2-hf": _C.gemma2_from_hf,
              "gemma3-hf": _C.gemma3_from_hf,
              "smollm3-hf": _C.smollm3_from_hf,
              "olmo2-hf": _C.olmo2_from_hf,
              "mixtral-hf": _C.mixtral_from_hf,
              "qwen2moe-hf": _C.qwen2_moe_from_hf,
              "qwen3-hf": _C.qwen3_from_hf,
              "qwen3moe-hf": _C.qwen3_moe_from_hf,
              "deepseekv2-hf": _C.deepseek_v2_from_hf,
              "deepseekv3-hf": _C.deepseek_v3_from_hf,
              "granite-hf": _C.granite_from_hf,
              "glm4-hf": _C.glm4_from_hf,
              "llama4-hf": _C.llama4_from_hf,
              "nemotron-hf": _C.nemotron_from_hf,
              "starcoder2-hf": _C.starcoder2_from_hf,
              "cohere-hf": _C.cohere_from_hf,
              "ernie45-hf": _C.ernie45_from_hf,
              "glm4moe-hf": _C.glm4_moe_from_hf,
              "qwen3next-hf": _C.qwen3_next_from_hf,
              "falcon-hf": _C.falcon_from_hf,
              "mamba-hf": _C.mamba_from_hf,
              "mamba2-hf": _C.mamba2_from_hf}[args.family]
        kw = ({"n_heads": args.n_heads} if args.family == "falcon-hf"
              else {})
        if args.family == "qwen3next-hf":
            # Linear-attention head splits are not shape-derivable.
            if not getattr(args, "model_config", None):
                print("qwen3next-hf needs --model-config config.json "
                      "(linear_num_key_heads / head dims)",
                      file=sys.stderr)
                return 1
            kw["config"] = json.loads(open(args.model_config).read())
        params, cfg = fn(load_state_dict(args.gguf), **kw)
        if args.family == "qwen3next-hf" and args.bits:
            from trackiellm_tpu.models.qwen3next import quantize_params

            params = quantize_params(params, bits=args.bits)
        elif args.bits:
            if args.family.startswith("deepseek"):
                from trackiellm_tpu.models.mla import quantize_params
            else:
                from trackiellm_tpu.models.llm import quantize_params

            params = quantize_params(params, bits=args.bits)
    else:
        from trackiellm_tpu.models.convert import (gguf_convert_auto,
                                                   tokenizer_spec_from_gguf)
        from trackiellm_tpu.models.loader import read_gguf_header

        hdr = read_gguf_header(args.gguf)
        # ONE shared arch dispatch (deepseek2 -> MLA, mamba, falcon,
        # llama4, glm4moe, qwen3next, default llama-family) — the same
        # route the first-contact harness probes.
        params, cfg = gguf_convert_auto(args.gguf,
                                        bits=args.bits or None)
        vocab = hdr.metadata.get("tokenizer.ggml.tokens")
        tok_spec = tokenizer_spec_from_gguf(hdr)
    meta = {"source": args.gguf, "bits": args.bits,
            "vocab_pieces": vocab, "tokenizer_spec": tok_spec}
    if getattr(args, "mmproj", None):
        # llama.cpp llava packaging: text GGUF + vision "mmproj" GGUF.
        from trackiellm_tpu.models.convert import gguf_to_clip_params

        clip_params, clip_cfg = gguf_to_clip_params(args.mmproj)
        meta["multimodal"] = "llava"
        save_checkpoint(args.output, params, config=cfg, metadata=meta)
        save_checkpoint(os.path.join(args.output, "vision"), clip_params,
                        config=clip_cfg, metadata={"source": args.mmproj})
        print(f"converted + saved LLM to {args.output}, mmproj vision "
              f"tower to {args.output}/vision in {time.time() - t0:.1f}s")
        return 0
    save_checkpoint(args.output, params, config=cfg, metadata=meta)
    print(f"converted + saved to {args.output} "
          f"in {time.time() - t0:.1f}s; config: {cfg}")
    return 0


def _cmd_generate(args) -> int:
    from trackiellm_tpu.llm.runner import GenerationConfig, LLMRunner
    from trackiellm_tpu.models.checkpoint import load_checkpoint

    params, cfg, meta = load_checkpoint(args.checkpoint)
    if cfg is None:
        print("checkpoint has no LLMConfig sidecar", file=sys.stderr)
        return 1
    tokenizer = None
    if meta.get("tokenizer_spec"):
        from trackiellm_tpu.models.convert import tokenizer_from_spec

        tokenizer = tokenizer_from_spec(meta["tokenizer_spec"])
    elif meta.get("vocab_pieces"):  # pre-round-3 checkpoints
        from trackiellm_tpu.models.convert import tokenizer_from_pieces

        tokenizer = tokenizer_from_pieces(meta["vocab_pieces"])
    model = None
    if type(cfg).__name__ == "MLAConfig":
        from trackiellm_tpu.models import mla as model  # noqa: F811
    gen_config = GenerationConfig(max_tokens=args.max_tokens,
                                  temperature=args.temperature)
    if type(cfg).__name__ in ("MambaConfig", "Mamba2Config",
                              "Qwen3NextConfig"):
        # Recurrent-state families (incl. the Qwen3-Next hybrid):
        # their own sequential session runner (no attention-cache
        # rollback semantics).
        from trackiellm_tpu.models.mamba import MambaRunner

        runner = MambaRunner(params, cfg, tokenizer=tokenizer,
                             gen_config=gen_config)
        runner.generate(args.prompt,
                        on_token=lambda s: print(s, end="", flush=True))
        print()
        return 0
    if getattr(args, "image", None):
        import os

        import numpy as np

        from trackiellm_tpu.llm.vlm import VLMRunner

        vis_dir = os.path.join(args.checkpoint, "vision")
        clip_params, clip_cfg, _ = load_checkpoint(vis_dir)
        if type(clip_cfg).__name__ != "CLIPVisionConfig":
            print(f"{vis_dir} has no CLIPVisionConfig sidecar",
                  file=sys.stderr)
            return 1
        if args.image.endswith(".npz"):
            image = np.load(args.image)["image"]
        else:
            image = np.load(args.image)
        prompt = args.prompt
        if VLMRunner.IMAGE_MARKER not in prompt:
            prompt = VLMRunner.IMAGE_MARKER + "\n" + prompt
        runner = VLMRunner(params, cfg, clip_params, clip_cfg,
                           tokenizer=tokenizer, gen_config=gen_config,
                           prefix_lm=(meta.get("multimodal")
                                      == "paligemma"))
        runner.generate(prompt, images=[image],
                        on_token=lambda s: print(s, end="", flush=True))
        print()
        return 0
    runner = LLMRunner(params, cfg, tokenizer,
                       gen_config=gen_config,
                       model=model)
    runner.generate(args.prompt,
                    on_token=lambda s: print(s, end="", flush=True))
    print()
    return 0


def _cmd_transcribe(args) -> int:
    import wave

    import numpy as np
    import jax

    from trackiellm_tpu.audio.asr import WhisperASR
    from trackiellm_tpu.models import whisper as whisper_model
    from trackiellm_tpu.models.checkpoint import load_checkpoint

    with wave.open(args.wav, "rb") as f:
        sr = f.getframerate()
        raw = f.readframes(f.getnframes())
        audio = np.frombuffer(raw, np.int16).astype(np.float32) / 32768.0
        if f.getnchannels() > 1:
            audio = audio.reshape(-1, f.getnchannels()).mean(1)

    if args.checkpoint:
        params, _, meta = load_checkpoint(args.checkpoint)
        cfg = whisper_model.WhisperConfig(**meta["whisper_config"])
    else:
        print("(no checkpoint given: using random test weights — output "
              "is a smoke test, not a transcription)", file=sys.stderr)
        cfg = whisper_model.WhisperConfig.test()
        params = whisper_model.init_whisper(jax.random.PRNGKey(0), cfg)
    asr = WhisperASR(params, cfg)
    print(asr.transcribe(audio, sample_rate=sr))
    return 0


def _cmd_bench(args) -> int:
    import bench

    bench.main()
    return 0


def _cmd_demo(args) -> int:
    import runpy
    import os

    sys.argv = ["run_assistant.py", str(args.seconds)]
    runpy.run_path(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "examples", "run_assistant.py"),
        run_name="__main__")
    return 0


def _cmd_precompile(args) -> int:
    """Warm every production device program into JAX's persistent
    compile cache, so service restarts are deserialize-only
    (restart-to-ready story; the reference mmaps a GGUF and serves in
    seconds, src/ai_models/tk_model_loader.c:199 — here the analogue
    is paying XLA compiles ONCE per deployment, not per boot).

    Run once after install/upgrade (or after changing model configs);
    it drives each pipeline's jitted entry points at the production
    shapes: LLM bucketed prefill + k-token decode chunks + chunked
    extend/prime, whisper's single-dispatch transcribe, the TTS
    latency buckets + streaming vocoder, and the vision frame pass.
    Latency is weight-independent, so random weights compile the same
    programs real checkpoints execute."""
    import time

    import numpy as np
    import jax

    jax.config.update("jax_compilation_cache_dir", args.cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    t0 = time.time()
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    done = []
    skip = set((args.skip or "").split(","))

    def mark(name):
        done.append((name, round(time.time() - t0, 1)))
        print(f"[{time.time() - t0:7.1f}s] {name} warm", flush=True)

    params = cfg = None
    if "llm" not in skip:
        from trackiellm_tpu.llm.runner import GenerationConfig, LLMRunner
        from trackiellm_tpu.llm.tokenizer import ByteTokenizer
        from trackiellm_tpu.models import llm as llm_model

        cfg = llm_model.LLMConfig.mistral_7b()._replace(
            max_seq=args.max_seq, sliding_window=args.max_seq)
        if args.llm:
            from trackiellm_tpu.models.checkpoint import load_checkpoint
            params, cfg, _ = load_checkpoint(args.llm)
        else:
            params = llm_model.init_params_quantized(ks[0], cfg, bits=4)
        runner = LLMRunner(params, cfg, ByteTokenizer(cfg.vocab_size),
                           GenerationConfig(max_tokens=12, min_tokens=4,
                                            temperature=0.0))
        # Short prompt -> smallest prefill bucket + the decode chunk
        # (ONE program for all min_tokens values since the eos-ban
        # unification); prime() walks the chunked-prefill buckets the
        # streaming-ASR path uses; a long prompt hits the big bucket.
        runner.generate("ola")
        mark("llm: small prefill bucket + decode chunks")
        # Streaming-generate shape (on_token + exact-budget tail): the
        # restart tool's 50 s first-run outlier was THIS program
        # missing from the cache.
        stream_runner = LLMRunner(
            params, cfg, ByteTokenizer(cfg.vocab_size),
            GenerationConfig(max_tokens=8, min_tokens=8,
                             temperature=0.0))
        stream_runner.generate("ola, descreva a cena",
                               on_token=lambda _: None)
        mark("llm: streaming generate (on_token) shape")
        runner.reset()
        runner.prime("por favor descreva " * 40)
        mark("llm: prime/extend chunk buckets")
        runner.reset()
        runner.generate("contexto: " + "objeto perto. " * 60)
        mark("llm: large prefill bucket")
        # Sampled speculative programs (the round-5 "auto" default):
        # the bucket-16 all-logits extend + spec_verify_sampled at the
        # production sampler settings. Without these, the FIRST
        # temperature-0.7 reply with a firing n-gram proposal pays
        # their compiles inside the reply path (measured: a ~9.5 min
        # first-reply outlier on a cold cache).
        spec_runner = LLMRunner(
            params, cfg, ByteTokenizer(cfg.vocab_size),
            GenerationConfig(max_tokens=24, temperature=0.7, seed=0,
                             speculative=True, spec_min_ngram=1))
        spec_runner.generate("descreva descreva descreva descreva "
                             "descreva descreva a cena")
        mark("llm: sampled speculative verify programs")

    if "server" not in skip and params is not None:
        # Continuous-batching admission programs: the vmapped
        # admission-wave prefill (prefill_batch at the burst shape),
        # the batched chunk decode (decode_steps_batch) and the wave
        # argmax — the programs a service restart would otherwise
        # compile on its first burst.
        from trackiellm_tpu.llm.server import LLMServer

        server = LLMServer(params, cfg, batch_slots=4,
                           tokenizer=ByteTokenizer(cfg.vocab_size),
                           chunk_steps=8)
        try:
            futs = [server.submit(f"pergunta {i} sobre a cena",
                                  max_tokens=12) for i in range(5)]
            for f in futs:
                f.result(timeout=1800)
        finally:
            server.close()
        mark("server: admission-wave prefill + batched decode chunks")

    if "asr" not in skip:
        from trackiellm_tpu.audio.asr import WhisperASR
        from trackiellm_tpu.models import whisper as whisper_model

        acfg = whisper_model.WhisperConfig.tiny()._replace(n_audio_ctx=500)
        asr = WhisperASR(whisper_model.init_whisper(ks[1], acfg), acfg,
                         max_tokens=16)
        asr.transcribe(np.zeros(5 * 16000, np.float32))
        mark("asr: single-dispatch transcribe (5 s window)")

    if "tts" not in skip:
        from trackiellm_tpu.models import tts as tts_model

        tcfg = tts_model.TTSConfig.default()
        tparams = tts_model.init_tts(ks[2], tcfg)
        for text in ("ha uma mesa a frente.",
                     "ha uma cadeira e uma pessoa perto da porta da "
                     "sala de estar agora."):
            for _ in tts_model.synthesize_streaming(tparams, tcfg, text):
                pass
        mark("tts: latency buckets + streaming vocoder")

    if "vision" not in skip:
        from trackiellm_tpu.models import depth as depth_model
        from trackiellm_tpu.models import detector as det_model
        from trackiellm_tpu.vision.pipeline import VisionPipeline

        dcfg = det_model.DetectorConfig.v8n()
        dparams = det_model.init_detector(ks[3], dcfg)
        pcfg = depth_model.DepthConfig.small()
        pparams = depth_model.init_depth(ks[4], pcfg)
        pipe = VisionPipeline(
            detector_fn=lambda chw: det_model.detector_forward(
                dparams, dcfg, chw),
            depth_fn=lambda chw: depth_model.depth_forward(
                pparams, pcfg, chw))
        frame = np.zeros((480, 640, 3), np.uint8)
        pipe.process_frame(frame)
        mark("vision: letterbox + detector + NMS + depth + fusion")

    if "dpt" not in skip:
        # The DPT-SwinV2 depth tower: its compile is the single
        # heaviest in the stack (115 s tiny_256 measured through the
        # relay) — exactly what a cold restart must not pay.
        import jax.numpy as jnp

        from trackiellm_tpu.models import dpt as dpt_model

        scfg = dpt_model.DPTSwinConfig.tiny_256()
        sparams = dpt_model.init_dpt(ks[5], scfg)
        np.asarray(dpt_model.dpt_forward(
            sparams, scfg,
            jnp.zeros((3, scfg.image_size, scfg.image_size),
                      jnp.float32))[:1, :1])
        mark("dpt: SwinV2 tiny_256 depth tower")

    if "vlm" not in skip and params is not None:
        # The CLIP ViT-L/14-336 tower + the embeds-spliced prefill
        # bucket (the VLM path's only extra programs vs the text LLM).
        import jax.numpy as jnp

        from trackiellm_tpu.models import clip as clip_model
        from trackiellm_tpu.models import llm as llm_model

        vcfg = clip_model.CLIPVisionConfig(
            image_size=336, patch_size=14, dim=1024, n_layers=24,
            n_heads=16, hidden_dim=4096, proj_dim=cfg.dim)
        vparams = clip_model.init_params(
            vcfg, np.random.default_rng(0), dtype=jnp.bfloat16)
        feats = clip_model.encode_and_project(
            vparams, vcfg, jnp.zeros((3, 336, 336), jnp.float32))
        np.asarray(feats[:1, :1])
        mark("vlm: CLIP ViT-L/14-336 tower + projector")
        bucket = 1024 if args.max_seq >= 1024 else args.max_seq
        toks = jnp.zeros((bucket,), jnp.int32)
        embeds = llm_model.embed_tokens(params, toks)
        n_img = feats.shape[0]
        embeds = jax.lax.dynamic_update_slice(
            embeds, feats.astype(embeds.dtype), (4, 0))
        cache2 = llm_model.KVCache.create(cfg)
        logits, _ = llm_model.prefill(
            params, cfg, toks, jnp.int32(n_img + 16), cache2,
            embeds=embeds)
        np.asarray(logits[:1])
        mark("vlm: embeds-spliced prefill bucket")

    print(f"precompile done in {time.time() - t0:.1f}s; cache at "
          f"{args.cache_dir}; restarts now deserialize instead of "
          f"compiling.")
    return 0


def _cmd_synth(args) -> int:
    """Synthesize speech (the Piper CLI workflow twin): a real Piper
    voice (--voice model.onnx --voice-config voice.json) through the
    VITS graph, written as a 16-bit WAV."""
    import wave

    import numpy as np

    from trackiellm_tpu.models.vits import VITSVoice

    voice = VITSVoice.from_piper(args.voice, args.voice_config)
    wav = voice.synthesize(args.text,
                           length_scale=args.length_scale)
    pcm = (np.clip(wav, -1.0, 1.0) * 32767).astype(np.int16)
    with wave.open(args.output, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(voice.cfg.sample_rate)
        f.writeframes(pcm.tobytes())
    print(f"wrote {args.output}: {len(pcm)} samples @ "
          f"{voice.cfg.sample_rate} Hz")
    return 0


def _cmd_first_contact(args) -> int:
    from trackiellm_tpu import first_contact as FC

    report = FC.run(args.directory, args.report,
                    FC.Options(bits=args.bits,
                               probe_tokens=args.probe_tokens,
                               no_flags=args.no_flags, deep=args.deep,
                               strict=args.strict,
                               quantize=args.quantize))
    for a in report["artifacts"]:
        print(f"{a['status']:4s} {a['kind']:14s} {a['file']}")
    s = report["summary"]
    print(f"# {s['PASS']} PASS / {s['WARN']} WARN / {s['FAIL']} FAIL")
    return 1 if s["FAIL"] else 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="trackiellm_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("inspect", help="inspect a model file")
    p.add_argument("model")
    p.set_defaults(fn=_cmd_inspect)

    p = sub.add_parser("convert", help="GGUF/HF -> native checkpoint")
    p.add_argument("gguf", help="checkpoint file (GGUF, or a "
                   "transformers state dict with --family gemma2-hf)")
    p.add_argument("-o", "--output", required=True)
    p.add_argument("--bits", type=int, default=4, choices=(0, 4, 8))
    p.add_argument("--family", default="gguf",
                   choices=("gguf", "gemma2-hf", "gemma3-hf",
                            "smollm3-hf", "olmo2-hf", "mixtral-hf",
                            "qwen2moe-hf", "qwen3-hf", "qwen3moe-hf",
                            "deepseekv2-hf", "deepseekv3-hf",
                            "granite-hf", "glm4-hf", "llama4-hf",
                            "nemotron-hf", "starcoder2-hf", "cohere-hf",
                            "ernie45-hf", "llava-hf", "falcon-hf",
                            "mamba-hf", "mamba2-hf", "paligemma-hf",
                            "trocr-hf", "glm4moe-hf", "qwen3next-hf"),
                   help="source layout (default: GGUF metadata-driven, "
                   "covers llama/mistral/qwen2/gemma2/granite/glm4/"
                   "mixtral/qwen2moe arches)")
    p.add_argument("--n-heads", type=int, default=32,
                   help="text attention heads (llava-hf only; not "
                        "shape-derivable — LLaVA-1.5-7B uses 32)")
    p.add_argument("--vision-n-heads", type=int, default=16,
                   help="CLIP tower heads (llava-hf only; ViT-L/14 = 16)")
    p.add_argument("--mmproj", default=None,
                   help="llama.cpp llava vision 'mmproj' GGUF to convert "
                        "alongside a text GGUF (saved to OUTPUT/vision)")
    p.add_argument("--model-config", default=None,
                   help="HF config.json (trocr-hf: head counts + "
                        "special ids)")
    p.set_defaults(fn=_cmd_convert)

    p = sub.add_parser("generate", help="generate from a checkpoint")
    p.add_argument("checkpoint")
    p.add_argument("-p", "--prompt", default="Olá!")
    p.add_argument("--max-tokens", type=int, default=64)
    p.add_argument("--temperature", type=float, default=0.7)
    p.add_argument("--image", default=None,
                   help="image (.npy HWC uint8, or .npz with key 'image') "
                        "for multimodal checkpoints; the prompt's "
                        "<image> marker places it")
    p.set_defaults(fn=_cmd_generate)

    p = sub.add_parser("transcribe", help="transcribe a WAV file")
    p.add_argument("wav")
    p.add_argument("--checkpoint", default=None)
    p.set_defaults(fn=_cmd_transcribe)

    p = sub.add_parser("bench", help="headline decode benchmark")
    p.set_defaults(fn=_cmd_bench)

    p = sub.add_parser("demo", help="assistant demo on mock hardware")
    p.add_argument("seconds", nargs="?", type=float, default=5.0)
    p.set_defaults(fn=_cmd_demo)

    p = sub.add_parser("precompile", help="warm all production device "
                       "programs into the persistent compile cache")
    p.add_argument("--llm", default=None,
                   help="LLM checkpoint (default: random 7B Q4 — "
                        "programs are weight-independent)")
    p.add_argument("--max-seq", type=int, default=1024)
    p.add_argument("--cache-dir", default="/root/.cache/jax_comp")
    p.add_argument("--skip", default=None,
                   help="comma-separated stages to skip "
                        "(llm,server,asr,tts,vision,dpt,vlm)")
    p.set_defaults(fn=_cmd_precompile)

    p = sub.add_parser(
        "first_contact",
        help="validate a directory of real checkpoints: sniff -> "
             "convert -> probe -> flag gauntlet -> parity, one JSON "
             "report (docs/REAL_WEIGHTS.md)")
    p.add_argument("directory")
    p.add_argument("--report", default=None)
    p.add_argument("--bits", type=int, default=None, choices=(4, 8))
    p.add_argument("--probe-tokens", type=int, default=32)
    p.add_argument("--no-flags", action="store_true")
    p.add_argument("--deep", action="store_true")
    p.add_argument("--strict", action="store_true")
    p.add_argument("--quantize", type=int, default=4,
                   choices=(0, 4, 8),
                   help="requantization for the parity_llm companion "
                   "runs (4 = the reference's Q4 serving)")
    p.set_defaults(fn=_cmd_first_contact)

    p = sub.add_parser("synth", help="synthesize speech from a Piper "
                       "voice (VITS) to a WAV file")
    p.add_argument("-t", "--text", required=True)
    p.add_argument("--voice", required=True,
                   help="voice weights (.onnx/.npz)")
    p.add_argument("--voice-config", required=True,
                   help="Piper voice .json (phoneme_id_map)")
    p.add_argument("-o", "--output", default="out.wav")
    p.add_argument("--length-scale", type=float, default=1.0)
    p.set_defaults(fn=_cmd_synth)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
