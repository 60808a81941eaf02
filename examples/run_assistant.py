#!/usr/bin/env python
"""Run the full assistant loop with mock hardware and tiny random models.

The complete system — camera/mic/IMU workers, vision pipeline, audio
state machine, cortex, LLM with grammar-constrained tools, TTS — wired
exactly as production, with test-scale weights. Swap in converted
checkpoints (see convert_gguf.py) for real behavior.

Usage: python examples/run_assistant.py [seconds]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax

# The demo's tiny models compile in milliseconds on CPU; remote TPU
# compilation would dominate its runtime.
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from trackiellm_tpu.app import AppSources, TrackieApp
from trackiellm_tpu.audio.asr import WhisperASR
from trackiellm_tpu.audio.tts_engine import TTSEngine
from trackiellm_tpu.audio.wake_word import (PhraseWakeWord,
                                            load_default_wake_word)


def _wake_fn():
    """The bundled pretrained conv spotter (real keyword detection out
    of the box — the reference ships working Porcupine weights,
    tk_wake_word_porcupine.c:15); energy fallback only if the artifact
    is absent from the tree."""
    try:
        return load_default_wake_word()
    except FileNotFoundError:
        print("[wake] bundled artifact missing; using energy fallback")
        return PhraseWakeWord(consecutive=2)
from trackiellm_tpu.llm.runner import GenerationConfig, LLMRunner
from trackiellm_tpu.llm.tokenizer import ByteTokenizer
from trackiellm_tpu.models import (  # noqa: E501
    detector as det_model,
    depth as depth_model,
    llm as llm_model,
    tts as tts_model,
    whisper as whisper_model,
)
from trackiellm_tpu.models.vad import EnergyVAD
from trackiellm_tpu.utils.config import Config


def build_models(key):
    ks = jax.random.split(key, 8)

    det_cfg = det_model.DetectorConfig.tiny()
    det_params = det_model.init_detector(ks[0], det_cfg)

    def detector_fn(chw):
        # Tiny config expects its own input size; crop/pad as demo glue.
        img = chw[:, :det_cfg.img_size, :det_cfg.img_size]
        return det_model.detector_forward(det_params, det_cfg, img)

    dep_cfg = depth_model.DepthConfig.tiny()
    dep_params = depth_model.init_depth(ks[1], dep_cfg)

    def depth_fn(chw):
        img = chw[:, :dep_cfg.img_size, :dep_cfg.img_size]
        return depth_model.depth_forward(dep_params, dep_cfg, img)

    asr_cfg = whisper_model.WhisperConfig.test()
    asr = WhisperASR(whisper_model.init_whisper(ks[2], asr_cfg), asr_cfg,
                     max_tokens=8)

    tts_cfg = tts_model.TTSConfig.tiny()
    tts = TTSEngine(tts_model.init_tts(ks[3], tts_cfg), tts_cfg)

    llm_cfg = llm_model.LLMConfig.tiny()
    runner = LLMRunner(
        llm_model.init_params(ks[4], llm_cfg, dtype=jnp.float32), llm_cfg,
        ByteTokenizer(llm_cfg.vocab_size),
        GenerationConfig(max_tokens=32, temperature=0.8))
    return detector_fn, depth_fn, asr, tts, runner


def main():
    seconds = float(sys.argv[1]) if len(sys.argv) > 1 else 3.0
    detector_fn, depth_fn, asr, tts, runner = build_models(
        jax.random.PRNGKey(0))

    cfg = Config()
    cfg.set("audio.vad_threshold", 0.5)
    app = TrackieApp(
        config=cfg,
        sources=AppSources(),  # all mock hardware
        detector_fn=detector_fn,
        depth_fn=depth_fn,
        vad_fn=EnergyVAD(1e-3),
        asr_fn=asr,
        tts_fn=tts,
        wake_fn=_wake_fn(),
        llm_runner=runner,
        on_spoken_audio=lambda wav, p: print(
            f"[tts] {len(wav)} samples at priority {p}"),
    )
    app.start()
    print(f"assistant running for {seconds:.0f}s "
          f"(workers: {app.tasks.status()})")
    # Simulate a typed user question mid-run.
    time.sleep(seconds / 2)
    app.cortex.inject_user_text("o que você vê?")
    time.sleep(seconds / 2)
    print("cortex stats:", app.cortex.stats)
    print("scheduler stats:", app.scheduler.stats)
    print("context:\n" + app.cortex.reasoner.generate_context_string())
    app.stop()


if __name__ == "__main__":
    main()
