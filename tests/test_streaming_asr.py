"""Incremental ASR: LocalAgreement stable-prefix semantics and the
audio-pipeline partial-transcription integration."""

import numpy as np
import pytest

from trackiellm_tpu.audio.pipeline import AudioPipeline, AudioPipelineConfig
from trackiellm_tpu.audio.streaming_asr import StreamingTranscriber

SR = 16000


class ScriptedASR:
    """Transcribes by buffered duration: simulates a growing hypothesis
    whose tail flickers between passes (the real Whisper failure mode
    LocalAgreement exists to suppress)."""

    def __init__(self, script):
        # script: list of (min_seconds, hypothesis string)
        self.script = script
        self.calls = 0

    def __call__(self, audio: np.ndarray) -> str:
        self.calls += 1
        secs = len(audio) / SR
        out = ""
        for min_s, text in self.script:
            if secs >= min_s:
                out = text
        return out


class TestStreamingTranscriber:
    def test_stable_prefix_excludes_flicker(self):
        asr = ScriptedASR([
            (0.0, "ha uma"),
            (2.0, "ha uma xicara azul"),     # tail guess: "azul"
            (3.0, "ha uma xicara na mesa"),  # tail flipped
            (4.0, "ha uma xicara na mesa agora"),
        ])
        partials = []
        st = StreamingTranscriber(asr, refresh_s=1.0,
                                  on_partial=partials.append)
        chunk = np.zeros(SR // 10, np.float32)  # 100 ms
        for _ in range(45):  # 4.5 s of speech
            st.feed(chunk)
        # pass@1s+2s agree on "ha uma"; the flickering tail never
        # becomes stable until two consecutive passes agree on it.
        assert partials[0] == "ha uma"
        assert all("azul" not in p for p in partials)
        assert st.stable_text.startswith("ha uma xicara na mesa")

    def test_stable_prefix_is_monotone(self):
        asr = ScriptedASR([
            (0.0, "um dois tres"),
            (2.0, "um dois"),          # model retracts a word
            (3.0, "um dois tres quatro"),
        ])
        st = StreamingTranscriber(asr, refresh_s=1.0)
        chunk = np.zeros(SR // 10, np.float32)
        seen = []
        for _ in range(40):
            grown = st.feed(chunk)
            if grown:
                seen.append(grown)
        for a, b in zip(seen, seen[1:]):
            assert b.startswith(a), "stable text must never retract"

    def test_finalize_is_authoritative_and_resets(self):
        asr = ScriptedASR([(0.0, "parcial"), (1.5, "texto final completo")])
        st = StreamingTranscriber(asr, refresh_s=1.0)
        chunk = np.zeros(SR // 10, np.float32)
        for _ in range(20):
            st.feed(chunk)
        final = st.finalize(np.zeros(2 * SR, np.float32))
        assert final == "texto final completo"
        assert st.stable_text == ""
        assert st._buf == []

    def test_agreement_floor(self):
        with pytest.raises(ValueError):
            StreamingTranscriber(lambda a: "", agreement=1)


class TestPipelineIntegration:
    def test_partials_then_final(self):
        asr = ScriptedASR([
            (0.0, "o que"),
            (1.5, "o que voce ve"),
            (2.5, "o que voce ve agora"),
        ])
        st = StreamingTranscriber(asr, refresh_s=0.5)
        partials, finals = [], []
        pipe = AudioPipeline(
            config=AudioPipelineConfig(wake_word_enabled=False,
                                       end_of_speech_silence_ms=300),
            vad_fn=lambda c: 1.0 if np.abs(c).max() > 0.01 else 0.0,
            streaming_asr=st,
            on_partial_transcription=partials.append,
            on_transcription=finals.append,
        )
        loud = np.full(SR // 10, 0.1, np.float32)
        quiet = np.zeros(SR // 10, np.float32)
        for _ in range(30):  # 3 s of speech
            pipe.process_chunk(loud)
        for _ in range(4):   # 400 ms silence -> end of speech
            pipe.process_chunk(quiet)
        assert partials and partials[0] == "o que"
        assert finals == ["o que voce ve agora"]
        # next utterance starts clean
        assert st.stable_text == ""

    def test_endpoint_anticipation_replaces_finalize(self):
        """With anticipation on, the authoritative pass runs DURING the
        silence window (on the streaming transcriber's asr_fn) and
        finalize() is never called with the full buffer — yet the next
        utterance starts with clean LocalAgreement state."""
        seen = []

        def asr(audio):
            seen.append(len(audio))
            return f"texto {len(seen)}"

        st = StreamingTranscriber(asr, refresh_s=10.0)  # no refresh passes
        finals = []
        pipe = AudioPipeline(
            config=AudioPipelineConfig(wake_word_enabled=False,
                                       end_of_speech_silence_ms=300,
                                       endpoint_anticipation_ms=100),
            vad_fn=lambda c: 1.0 if np.abs(c).max() > 0.01 else 0.0,
            streaming_asr=st,
            on_transcription=finals.append,
        )
        loud = np.full(SR // 10, 0.1, np.float32)
        quiet = np.zeros(SR // 10, np.float32)
        for utt in range(2):  # two utterances: state resets between
            for _ in range(5):
                pipe.process_chunk(loud)
            for _ in range(4):
                pipe.process_chunk(quiet)
        pipe.close()
        assert finals == ["texto 1", "texto 2"]
        # Exactly one ASR pass per utterance (the tentative one): the
        # tentative audio stops short of the full silence tail.
        assert len(seen) == 2
        assert all(n < 9 * (SR // 10) for n in seen)
        assert st.stable_text == ""

    def test_streaming_failure_degrades_to_final(self):
        calls = {"n": 0}

        def flaky(audio):
            calls["n"] += 1
            if len(audio) < SR:  # partial passes fail
                raise RuntimeError("boom")
            return "resultado"

        st = StreamingTranscriber(flaky, refresh_s=0.3)
        finals = []
        pipe = AudioPipeline(
            config=AudioPipelineConfig(wake_word_enabled=False,
                                       end_of_speech_silence_ms=300),
            vad_fn=lambda c: 1.0 if np.abs(c).max() > 0.01 else 0.0,
            streaming_asr=st,
            on_transcription=finals.append,
        )
        loud = np.full(SR // 10, 0.1, np.float32)
        quiet = np.zeros(SR // 10, np.float32)
        for _ in range(15):
            pipe.process_chunk(loud)
        for _ in range(4):
            pipe.process_chunk(quiet)
        assert finals == ["resultado"]
