"""ASR / TTS engine glue tests: real models (tiny configs) end-to-end
through the engine surfaces, including an integration of both into the
audio pipeline."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from trackiellm_tpu.audio.asr import WhisperASR
from trackiellm_tpu.audio.pipeline import AudioPipeline, AudioPipelineConfig
from trackiellm_tpu.audio.tts_engine import TTSEngine
from trackiellm_tpu.models import tts as tts_model
from trackiellm_tpu.models import whisper as whisper_model
from trackiellm_tpu.models.vad import EnergyVAD

pytestmark = pytest.mark.slow  # model-zoo/parallel tier: excluded from `make smoke`


@pytest.fixture(scope="module")
def asr():
    cfg = whisper_model.WhisperConfig.test()
    params = whisper_model.init_whisper(jax.random.PRNGKey(0), cfg)
    return WhisperASR(params, cfg, max_tokens=6)


@pytest.fixture(scope="module")
def tts():
    cfg = tts_model.TTSConfig.tiny()
    params = tts_model.init_tts(jax.random.PRNGKey(1), cfg)
    return TTSEngine(params, cfg)


class TestWhisperASREngine:
    def test_transcribe_returns_text(self, asr):
        audio = 0.1 * np.sin(2 * np.pi * 300 *
                             np.arange(8000) / 16000).astype(np.float32)
        out = asr.transcribe(audio)
        assert isinstance(out, str)

    def test_resampling_input(self, asr):
        audio48 = np.zeros(48000, np.float32)
        out = asr.transcribe(audio48, sample_rate=48000)
        assert isinstance(out, str)

    def test_language_switch(self, asr):
        asr.set_language(3)
        assert asr.language == 3
        asr.set_language(0)


class TestStreamingOverRealASR:
    def test_partial_passes_and_final(self, asr):
        """StreamingTranscriber over the real (tiny) Whisper engine:
        passes run during feeding and finalize equals the engine's own
        full-segment transcription."""
        from trackiellm_tpu.audio.streaming_asr import StreamingTranscriber

        st = StreamingTranscriber(asr, refresh_s=0.2)
        rng = np.random.default_rng(5)
        audio = 0.1 * rng.standard_normal(8000).astype(np.float32)
        for i in range(0, 8000, 1600):  # 100 ms chunks
            st.feed(audio[i:i + 1600])
        assert st.passes >= 2
        final = st.finalize(audio)
        assert final == asr.transcribe(audio)


class TestTTSEngine:
    def test_synthesize_buffer(self, tts):
        wav = tts.synthesize("hello world.")
        assert wav.dtype == np.float32
        assert len(wav) > 0
        assert np.all(np.abs(wav) <= 1.0)

    def test_long_text_chunked(self, tts):
        text = "one. two. " + "word " * 40 + "."
        wav = tts.synthesize(text)
        assert len(wav) > 0

    def test_streaming_callback(self, tts):
        chunks = []
        total = tts.synthesize_streaming("first one. second one.",
                                         chunks.append)
        assert len(chunks) == 2
        assert total == sum(len(c) for c in chunks)

    def test_rate_clamped(self, tts):
        tts.set_rate(100.0)
        assert tts.rate == 4.0
        tts.set_rate(1.0)

    def test_model_info(self, tts):
        info = tts.model_info()
        assert info["sample_rate"] == 16000


class TestEnginesInPipeline:
    def test_real_models_in_audio_pipeline(self, asr, tts):
        """Whisper + TTS engines wired into the streaming pipeline: a
        spoken 'command' produces a transcription event and queued
        speech synthesizes real audio."""
        transcripts, audio_out = [], []
        pipe = AudioPipeline(
            config=AudioPipelineConfig(wake_word_enabled=False),
            vad_fn=EnergyVAD(1e-4),
            asr_fn=asr,
            tts_fn=tts,
            on_transcription=transcripts.append,
            on_tts_audio=lambda wav, p: audio_out.append(wav),
        )
        rng = np.random.default_rng(0)
        for _ in range(3):
            pipe.process_chunk(0.2 * rng.standard_normal(1600)
                               .astype(np.float32))
        for _ in range(6):
            pipe.process_chunk(np.zeros(1600, np.float32))
        # Byte-tokenizer on random weights may emit empty/garbage text;
        # the contract is that ASR ran and the pipeline returned to idle.
        assert pipe.state.value in ("listening_for_command",)
        pipe.say("ola mundo.")
        assert pipe.wait_idle(timeout=10.0)
        assert audio_out and len(audio_out[0]) > 0
        pipe.close()


class TestWhisper128Mel:
    def test_large_v3_style_mel_count(self):
        """A 128-mel config (large-v3 family) flows end to end: the mel
        front-end takes n_mels from the model config instead of the
        80-mel default."""
        import jax

        from trackiellm_tpu.audio.asr import WhisperASR
        from trackiellm_tpu.models import whisper as whisper_model

        cfg = whisper_model.WhisperConfig.tiny()._replace(n_mels=128)
        params = whisper_model.init_whisper(jax.random.PRNGKey(5), cfg)
        asr = WhisperASR(params, cfg, max_tokens=5)
        text = asr.transcribe(
            np.random.default_rng(6).normal(0, 0.05, 16000)
            .astype(np.float32))
        assert isinstance(text, str)
