"""Full-loop end-to-end test: the tk_cortex_full equivalent.

Parity target: the reference's whole-app shape — mock camera + mock mic
(src/workers vision_worker.rs:36-80, audio_worker.rs:188-199), real
cortex + pipelines + bus, stub model backends. The scripted scenario:
wake word -> spoken question -> ASR -> cortex -> LLM -> TTS audio out,
while the vision worker keeps feeding frames.
"""

import time

import numpy as np
import pytest
import jax.numpy as jnp

from trackiellm_tpu.app import AppSources, TrackieApp
from trackiellm_tpu.audio.wake_word import PhraseWakeWord
from trackiellm_tpu.models.vad import EnergyVAD
from trackiellm_tpu.runtime.event_bus import EventKind
from trackiellm_tpu.utils.config import Config

SR = 16_000
CHUNK = 1600  # logical 100 ms


def _scripted_mic(script):
    """script: list of ('loud'|'quiet', n_chunks)."""
    chunks = []
    rng = np.random.default_rng(0)
    for kind, n in script:
        for _ in range(n):
            if kind == "loud":
                chunks.append((0.3 * rng.standard_normal(CHUNK))
                              .astype(np.float32))
            else:
                chunks.append(np.zeros(CHUNK, np.float32))
    it = iter(chunks)

    def read():
        return next(it, np.zeros(CHUNK, np.float32))

    return read


def _stub_detector(chw):
    boxes = np.zeros((8, 4), np.float32)
    scores = np.zeros((8, 80), np.float32)
    boxes[0] = [300, 280, 340, 320]
    scores[0, 41] = 0.9  # "cup"
    return jnp.asarray(boxes), jnp.asarray(scores)


class StubLLM:
    def __init__(self):
        self.calls = 0

    def build_prompt(self, system, context, user, tools=()):
        return f"{context}\n{user}"

    def generate(self, prompt, tools=(), force_tool_call=False,
                 on_token=None):
        self.calls += 1
        return "Vejo uma xícara à sua frente."

    def add_tool_response(self, name, result):
        pass


class TestFullLoop:
    def test_voice_command_to_spoken_response(self):
        spoken = []
        llm = StubLLM()
        cfg = Config()
        cfg.set("audio.chunk_ms", 10)  # real-time acceleration
        cfg.set("cortex.loop_hz", 50.0)

        app = TrackieApp(
            config=cfg,
            sources=AppSources(
                microphone=_scripted_mic([
                    ("quiet", 3),
                    ("loud", 3),    # wake burst
                    ("loud", 4),    # command speech
                    ("quiet", 7),   # end of speech (>=500 ms logical)
                ]),
            ),
            detector_fn=_stub_detector,
            vad_fn=EnergyVAD(1e-3),
            asr_fn=lambda audio: "o que você vê?",
            tts_fn=lambda text: np.zeros(320, np.float32),
            wake_fn=PhraseWakeWord(consecutive=2, energy_threshold=0.01),
            llm_runner=llm,
            on_spoken_audio=lambda wav, p: spoken.append((len(wav), p)),
        )
        bus_sub = app.bus.subscribe()
        app.start()
        try:
            deadline = time.monotonic() + 15.0
            while time.monotonic() < deadline and not spoken:
                time.sleep(0.05)
        finally:
            app.stop()

        # The LLM ran on the transcription and its answer was spoken.
        assert llm.calls >= 1
        assert spoken, "no TTS audio reached the output"

        kinds = {e.kind for e in bus_sub.drain()}
        assert EventKind.TRANSCRIPTION_RESULT in kinds
        assert EventKind.SPEAK in kinds
        assert EventKind.VISION_RESULT in kinds
        assert EventKind.SENSOR_FUSION_RESULT in kinds

        # Vision context reached the reasoner prompt.
        prompt = app.cortex.reasoner.generate_context_string()
        assert "cup" in prompt
        # Conversation recorded.
        assert app.cortex.reasoner.get_summary()["turns"] >= 2

    def test_streaming_asr_partials_reach_the_cortex(self):
        """TrackieApp(streaming_asr=True): mid-utterance stable-prefix
        partials flow pipeline -> cortex -> LLMRunner.prime, and the
        final transcription still produces the spoken reply."""
        spoken = []

        class PrimingStubLLM(StubLLM):
            def __init__(self):
                super().__init__()
                self.primed = []

            def prime(self, prefix):
                self.primed.append(prefix)

        llm = PrimingStubLLM()
        cfg = Config()
        cfg.set("audio.chunk_ms", 10)
        cfg.set("audio.wake_word", False)  # straight to listening
        cfg.set("cortex.loop_hz", 50.0)

        calls = {"n": 0}

        def scripted_asr(audio):
            # Growing hypotheses per pass; stable after two agreements.
            calls["n"] += 1
            secs = len(audio) / SR
            return ("o que voce ve agora" if secs >= 0.3
                    else "o que voce")

        from trackiellm_tpu.audio.streaming_asr import StreamingTranscriber

        app = TrackieApp(
            config=cfg,
            sources=AppSources(
                microphone=_scripted_mic([
                    ("loud", 12),   # ~1.2 s logical speech
                    ("quiet", 7),
                ]),
            ),
            vad_fn=EnergyVAD(1e-3),
            asr_fn=scripted_asr,
            streaming_asr=StreamingTranscriber(scripted_asr,
                                               refresh_s=0.2),
            tts_fn=lambda text: np.zeros(320, np.float32),
            llm_runner=llm,
            on_spoken_audio=lambda wav, p: spoken.append(len(wav)),
        )
        app.start()
        try:
            deadline = time.monotonic() + 15.0
            while time.monotonic() < deadline and not spoken:
                time.sleep(0.05)
        finally:
            app.stop()

        assert spoken, "no TTS audio reached the output"
        assert llm.calls >= 1
        assert llm.primed, "no partial reached LLMRunner.prime"
        assert llm.primed[-1].endswith("o que voce ve agora")
        assert app.cortex.stats.get("partial_primes", 0) >= 1
        assert calls["n"] >= 3  # partial passes + the final pass

    def test_clean_shutdown_under_load(self):
        app = TrackieApp(config=Config(),
                         detector_fn=_stub_detector,
                         vad_fn=EnergyVAD(),
                         asr_fn=lambda a: "",
                         tts_fn=lambda t: np.zeros(16, np.float32))
        app.start()
        time.sleep(0.3)
        app.stop(timeout=5.0)
        assert app.tasks.errors() == {}
