"""Audio stack tests: VAD, Whisper ASR, TTS, sound classifier, wake word,
and the streaming pipeline state machine with priority TTS.

Mirrors the reference's tk_audio_pipeline_full_test approach: stub/model
backends, behavioral assertions on state transitions, transcription
callbacks, and speech-priority interruption.
"""

import threading
import time

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from trackiellm_tpu.audio import (
    AudioPipeline,
    AudioPipelineConfig,
    AudioState,
    TTSPriority,
)
from trackiellm_tpu.audio.wake_word import (
    NeuralWakeWord,
    PhraseWakeWord,
    WakeWordConfig,
    init_wake_word,
)
from trackiellm_tpu.models import sound_classifier as sc
from trackiellm_tpu.models import tts as tts_model
from trackiellm_tpu.models import vad as vad_model
from trackiellm_tpu.models import whisper as whisper_model
from trackiellm_tpu.ops.mel import log_mel_spectrogram

SR = 16_000
CHUNK = 1600  # 100 ms


def _loud(n=CHUNK):
    rng = np.random.default_rng(0)
    return (0.3 * rng.standard_normal(n)).astype(np.float32)


def _quiet(n=CHUNK):
    return np.zeros(n, np.float32)


class TestVAD:
    def test_neural_step_runs_and_updates_state(self, rng):
        cfg = vad_model.VADConfig()
        params = vad_model.init_vad(rng, cfg)
        state = vad_model.init_state(cfg)
        chunk = jnp.asarray(_loud(vad_model.CHUNK_SAMPLES))
        prob, new_state = vad_model.vad_step(params, cfg, chunk, state)
        assert 0.0 <= float(prob) <= 1.0
        assert float(jnp.max(jnp.abs(new_state - state))) > 0

    def test_energy_vad(self):
        v = vad_model.EnergyVAD(energy_threshold=1e-3)
        assert v(_loud()) == 1.0
        assert v(_quiet()) == 0.0


class TestWhisper:
    @pytest.fixture(scope="class")
    def setup(self):
        cfg = whisper_model.WhisperConfig.test()
        params = whisper_model.init_whisper(jax.random.PRNGKey(0), cfg)
        return cfg, params

    def test_encode_shape(self, setup):
        cfg, params = setup
        mel = jnp.zeros((cfg.n_mels, 100))
        feats = whisper_model.encode(params, cfg, mel)
        assert feats.shape == (50, cfg.d_model)

    def test_transcribe_terminates(self, setup):
        cfg, params = setup
        audio = jnp.asarray(0.1 * np.sin(
            2 * np.pi * 440 * np.arange(SR) / SR).astype(np.float32))
        mel = log_mel_spectrogram(audio)[:, :100]
        toks = whisper_model.transcribe_tokens(params, cfg, mel,
                                               max_tokens=8)
        assert len(toks) <= 8
        assert all(0 <= t < cfg.vocab_size for t in toks)

    def test_device_loop_matches_host_loop(self, setup):
        """Single-dispatch lax.while_loop transcription must be
        token-identical to the host-loop oracle."""
        cfg, params = setup
        rng = np.random.default_rng(7)
        audio = jnp.asarray(
            0.2 * rng.standard_normal(SR).astype(np.float32))
        mel = log_mel_spectrogram(audio)[:, :2 * cfg.n_audio_ctx]
        mel = jnp.pad(
            mel, ((0, 0), (0, 2 * cfg.n_audio_ctx - mel.shape[1])))
        host = whisper_model.transcribe_tokens_host(
            params, cfg, mel, max_tokens=12, language=3)
        dev = whisper_model.transcribe_tokens(
            params, cfg, mel, max_tokens=12, language=3)
        assert dev == host

    def test_decode_cache_grows(self, setup):
        cfg, params = setup
        mel = jnp.zeros((cfg.n_mels, 100))
        feats = whisper_model.encode(params, cfg, mel)
        cache = whisper_model.make_decoder_cache(params, cfg, feats)
        logits, cache = whisper_model.decode_step(params, cfg,
                                                  jnp.int32(1), cache)
        assert logits.shape == (cfg.vocab_size,)
        assert int(cache.length) == 1


class TestTTS:
    @pytest.fixture(scope="class")
    def setup(self):
        cfg = tts_model.TTSConfig.tiny()
        params = tts_model.init_tts(jax.random.PRNGKey(0), cfg)
        return cfg, params

    def test_synthesize_waveform(self, setup):
        cfg, params = setup
        wav, n = tts_model.synthesize(params, cfg, "hello world")
        assert n == len(wav)
        assert n > 0 and n % cfg.hop == 0
        assert np.all(np.abs(wav) <= 1.0)

    def test_rate_scales_duration(self, setup):
        cfg, params = setup
        _, slow = tts_model.synthesize(params, cfg, "hello", rate=0.5)
        _, fast = tts_model.synthesize(params, cfg, "hello", rate=2.0)
        assert slow > fast

    def test_longer_text_longer_audio(self, setup):
        cfg, params = setup
        _, short = tts_model.synthesize(params, cfg, "hi")
        _, longer = tts_model.synthesize(params, cfg, "hello there friend")
        assert longer > short

    def test_streaming_matches_oneshot(self, setup):
        """Chunked vocoder (overlap >= receptive field) must reproduce
        the one-shot waveform exactly in the interior — streaming is a
        latency optimization, not an approximation."""
        cfg, params = setup
        text = "hello there streaming friend"
        full, n = tts_model.synthesize(params, cfg, text)
        chunks = list(tts_model.synthesize_streaming(
            params, cfg, text, chunk_frames=16, overlap=8))
        assert len(chunks) > 1, "expected multiple chunks at 16 frames"
        wav = np.concatenate(chunks)
        assert len(wav) == n
        np.testing.assert_allclose(wav, full, rtol=1e-5, atol=1e-5)

    def test_streaming_first_chunk_is_prefix(self, setup):
        cfg, params = setup
        full, n = tts_model.synthesize(params, cfg, "hello world")
        first = next(tts_model.synthesize_streaming(
            params, cfg, "hello world", chunk_frames=16, overlap=8))
        np.testing.assert_allclose(first, full[:len(first)],
                                   rtol=1e-5, atol=1e-5)

    def test_latency_bucket_matches_full_config(self):
        """A short clause streamed through the small (32, 256) acoustic
        bucket must reproduce the full-config one-shot waveform — the
        bucket is a compile-size optimization, not a different model
        (padding is masked, so valid positions see identical math)."""
        cfg = tts_model.TTSConfig(d_model=32, voc_ch=32,
                                  max_chars=96, max_frames=384)
        params = tts_model.init_tts(jax.random.PRNGKey(3), cfg)
        text = "uma xicara a frente."
        assert tts_model.bucket_config(cfg, len(text)).max_chars == 32
        full, n = tts_model.synthesize(params, cfg, text)
        chunks = list(tts_model.synthesize_streaming(
            params, cfg, text, chunk_frames=16, overlap=8))
        wav = np.concatenate(chunks)
        assert len(wav) == n
        np.testing.assert_allclose(wav, full, rtol=1e-4, atol=1e-5)


class TestSoundClassifier:
    def test_probabilities(self, rng):
        cfg = sc.SoundClassifierConfig.tiny()
        params = sc.init_sound_classifier(rng, cfg)
        mel = jnp.zeros((cfg.n_mels, cfg.n_frames))
        probs = sc.classify_window(params, cfg, mel)
        assert probs.shape == (cfg.num_classes,)
        assert float(jnp.sum(probs)) == pytest.approx(1.0, abs=1e-5)

    def test_class_names(self):
        assert sc.SoundClass.ALARM.name == "ALARM"
        assert {c.name for c in sc.SoundClass} >= {
            "ALARM", "SIREN", "WATER_RUNNING", "DOG_BARK"}


class TestWakeWord:
    def test_neural_scorer_runs(self, rng):
        cfg = WakeWordConfig()
        params = init_wake_word(rng, cfg)
        ww = NeuralWakeWord(params, cfg)
        out = ww.process(_loud())
        assert out in (True, False)

    def test_phrase_detector_pattern(self):
        ww = PhraseWakeWord(consecutive=3, energy_threshold=0.01)
        assert not ww.process(_loud())
        assert not ww.process(_loud())
        assert ww.process(_loud())       # third consecutive loud chunk
        assert not ww.process(_quiet())  # resets


class TestAudioPipelineStateMachine:
    def _build(self, **overrides):
        events = {"wake": 0, "speech_start": 0, "speech_end": 0,
                  "transcripts": [], "sounds": [], "tts": []}
        vad = vad_model.EnergyVAD(1e-3)
        pipe = AudioPipeline(
            config=AudioPipelineConfig(**overrides),
            vad_fn=vad,
            asr_fn=lambda audio: f"heard {len(audio)} samples",
            tts_fn=lambda text: np.zeros(160, np.float32),
            wake_fn=PhraseWakeWord(consecutive=2, energy_threshold=0.01),
            sound_fn=lambda win: "ALARM" if np.abs(win).mean() > 0.2 else None,
            on_wake=lambda: events.__setitem__("wake", events["wake"] + 1),
            on_speech_start=lambda: events.__setitem__(
                "speech_start", events["speech_start"] + 1),
            on_speech_end=lambda: events.__setitem__(
                "speech_end", events["speech_end"] + 1),
            on_transcription=lambda t: events["transcripts"].append(t),
            on_sound=lambda s: events["sounds"].append(s),
            on_tts_audio=lambda wav, prio: events["tts"].append(prio),
        )
        return pipe, events

    def test_full_voice_command_flow(self):
        pipe, ev = self._build()
        assert pipe.state is AudioState.AWAITING_WAKE_WORD
        # Silence: nothing happens.
        for _ in range(3):
            pipe.process_chunk(_quiet())
        assert ev["wake"] == 0
        # Two loud chunks -> wake.
        pipe.process_chunk(_loud())
        pipe.process_chunk(_loud())
        assert ev["wake"] == 1
        assert pipe.state is AudioState.LISTENING_FOR_COMMAND
        # Speech then 500 ms silence -> transcription, back to awaiting.
        for _ in range(4):
            pipe.process_chunk(_loud())
        assert ev["speech_start"] == 1
        for _ in range(5):
            pipe.process_chunk(_quiet())
        assert ev["speech_end"] == 1
        assert len(ev["transcripts"]) == 1
        assert "samples" in ev["transcripts"][0]
        assert pipe.state is AudioState.AWAITING_WAKE_WORD
        pipe.close()

    def test_endpoint_anticipation_uses_tentative(self):
        """The authoritative ASR starts during the silence window and
        its result IS the final transcript — exactly one model pass."""
        calls, transcripts = [], []

        def asr(audio):
            calls.append(len(audio))
            return f"heard {len(audio)}"

        pipe = AudioPipeline(
            config=AudioPipelineConfig(wake_word_enabled=False,
                                       end_of_speech_silence_ms=300,
                                       endpoint_anticipation_ms=100),
            vad_fn=vad_model.EnergyVAD(1e-3), asr_fn=asr,
            on_transcription=transcripts.append)
        for _ in range(4):
            pipe.process_chunk(_loud())
        n_final = None
        for _ in range(3):
            pipe.process_chunk(_quiet())
        pipe.close()
        assert len(calls) == 1, calls
        assert transcripts == [f"heard {calls[0]}"]
        # The tentative pass saw speech + 1 silence chunk, not the full
        # 3-chunk silence tail.
        assert calls[0] < (4 + 3) * 1600

    def test_endpoint_anticipation_discarded_when_speech_resumes(self):
        calls, transcripts = [], []

        def asr(audio):
            calls.append(len(audio))
            return f"heard {len(audio)}"

        pipe = AudioPipeline(
            config=AudioPipelineConfig(wake_word_enabled=False,
                                       end_of_speech_silence_ms=300,
                                       endpoint_anticipation_ms=100),
            vad_fn=vad_model.EnergyVAD(1e-3), asr_fn=asr,
            on_transcription=transcripts.append)
        for _ in range(4):
            pipe.process_chunk(_loud())
        pipe.process_chunk(_quiet())   # tentative fires here
        for _ in range(2):
            pipe.process_chunk(_loud())  # speech resumes: stale
        for _ in range(3):
            pipe.process_chunk(_quiet())
        pipe.close()
        assert len(calls) >= 2, calls  # tentative + fresh final pass
        assert calls[-1] > calls[0]    # final pass saw the full buffer
        assert transcripts == [f"heard {calls[-1]}"]

    def test_endpoint_anticipation_disabled(self):
        calls = []

        def asr(audio):
            calls.append(len(audio))
            return "ok"

        pipe = AudioPipeline(
            config=AudioPipelineConfig(wake_word_enabled=False,
                                       end_of_speech_silence_ms=300,
                                       endpoint_anticipation_ms=0),
            vad_fn=vad_model.EnergyVAD(1e-3), asr_fn=asr)
        for _ in range(4):
            pipe.process_chunk(_loud())
        for _ in range(3):
            pipe.process_chunk(_quiet())
        pipe.close()
        assert len(calls) == 1
        assert calls[0] == (4 + 3) * len(_quiet())  # the full buffer

    def test_no_wake_word_mode(self):
        pipe, ev = self._build(wake_word_enabled=False)
        assert pipe.state is AudioState.LISTENING_FOR_COMMAND
        for _ in range(3):
            pipe.process_chunk(_loud())
        for _ in range(5):
            pipe.process_chunk(_quiet())
        assert len(ev["transcripts"]) == 1
        pipe.close()

    def test_passive_sound_classification(self):
        pipe, ev = self._build()
        # Loud-ish but below wake threshold streak? Use alternating to
        # avoid wake (PhraseWakeWord needs 2 consecutive).
        for _ in range(12):
            pipe.process_chunk(_loud())
            pipe.process_chunk(_quiet())
        assert pipe.state is AudioState.AWAITING_WAKE_WORD
        pipe.close()

    def test_tts_streaming_chunks_emitted_in_order(self):
        chunks_out = []

        def tts_stream(text):
            for i in range(3):
                yield np.full(8, float(i), np.float32)

        pipe = AudioPipeline(
            config=AudioPipelineConfig(),
            tts_stream_fn=tts_stream,
            on_tts_audio=lambda wav, p: chunks_out.append(float(wav[0])),
        )
        pipe.say("ola mundo")
        assert pipe.wait_idle(timeout=3.0)
        assert chunks_out == [0.0, 1.0, 2.0]
        pipe.close()

    def test_tts_streaming_interrupted_mid_stream(self):
        """CRITICAL speech must cut a lower-priority stream BETWEEN
        chunks — finer interruption than the one-shot path."""
        emitted = []
        release = threading.Event()

        def tts_stream(text):
            if text == "long":
                yield np.zeros(8, np.float32)
                release.wait(timeout=3.0)   # hold mid-stream
                yield np.ones(8, np.float32)
                yield np.ones(8, np.float32)
            else:
                yield np.full(8, 9.0, np.float32)

        pipe = AudioPipeline(
            config=AudioPipelineConfig(),
            tts_stream_fn=tts_stream,
            on_tts_audio=lambda wav, p: emitted.append((float(wav[0]), p)),
        )
        pipe.say("long", TTSPriority.LOW)
        time.sleep(0.15)  # first chunk emitted, generator holding
        pipe.say("OBSTACLE", TTSPriority.CRITICAL)
        release.set()
        assert pipe.wait_idle(timeout=3.0)
        values = [v for v, _ in emitted]
        assert 9.0 in values          # CRITICAL spoke
        assert 1.0 not in values      # LOW's tail chunks were dropped
        pipe.close()

    def test_tts_priority_interruption(self):
        ev_order = []

        def tts(text):
            time.sleep(0.25)
            return np.zeros(16, np.float32)

        pipe = AudioPipeline(
            config=AudioPipelineConfig(),
            tts_fn=tts,
            on_tts_audio=lambda wav, p: ev_order.append(p),
        )
        pipe.say("background info", TTSPriority.LOW)
        time.sleep(0.05)  # LOW starts synthesizing
        pipe.say("OBSTACLE AHEAD", TTSPriority.CRITICAL)
        assert pipe.wait_idle(timeout=3.0)
        # LOW was interrupted pre-emit -> CRITICAL first, then the
        # re-queued LOW still plays (interruption defers, not drops).
        assert ev_order == [TTSPriority.CRITICAL, TTSPriority.LOW]
        pipe.close()

    def test_tts_queue_ordering(self):
        ev_order = []

        def tts(text):
            time.sleep(0.1)
            return np.zeros(16, np.float32)

        pipe = AudioPipeline(config=AudioPipelineConfig(), tts_fn=tts,
                             on_tts_audio=lambda w, p: ev_order.append(p))
        pipe.say("a", TTSPriority.LOW)
        time.sleep(0.03)
        pipe.say("b", TTSPriority.NORMAL)
        pipe.say("c", TTSPriority.HIGH)
        assert pipe.wait_idle(timeout=3.0)
        # 'a' interrupted pre-emit and re-queued: strict priority order.
        assert ev_order == [TTSPriority.HIGH, TTSPriority.NORMAL,
                            TTSPriority.LOW]
        pipe.close()


class TestSoundEngine:
    def test_classifies_or_abstains(self, rng):
        from trackiellm_tpu.audio.sound_engine import SoundClassifierEngine

        cfg = sc.SoundClassifierConfig.tiny()
        params = sc.init_sound_classifier(rng, cfg)
        eng = SoundClassifierEngine(params, cfg, threshold=0.0,
                                    ignore=())
        out = eng(_loud(16000))
        assert out in {c.name for c in sc.SoundClass}
        # High threshold: abstains on a uniformly-random model.
        eng_strict = SoundClassifierEngine(params, cfg, threshold=0.999)
        assert eng_strict(_loud(16000)) is None


class TestNeuralVADStreaming:
    def test_rechunking_and_state(self, rng):
        v = vad_model.NeuralVAD(vad_model.init_vad(rng))
        p1 = v(_loud(1600))   # 3 frames + 64 leftover samples
        assert 0.0 <= p1 <= 1.0
        assert len(v._leftover) == 1600 - 3 * 512
        v(_loud(1600))
        assert len(v._leftover) == (3200 - 6 * 512)
        v.reset()
        assert len(v._leftover) == 0

    def test_usable_in_pipeline(self, rng):
        v = vad_model.NeuralVAD(vad_model.init_vad(rng))
        pipe = AudioPipeline(
            config=AudioPipelineConfig(wake_word_enabled=False,
                                       vad_threshold=2.0),  # never trips
            vad_fn=v,
            asr_fn=lambda a: "x",
        )
        for _ in range(3):
            pipe.process_chunk(_loud())
        assert pipe.state is AudioState.LISTENING_FOR_COMMAND
        pipe.close()


class TestInterruptedSpeechRequeues:
    """A higher-priority interruption must not silently DROP a reply
    the user is waiting for: an item interrupted before ANY audio
    played re-queues and plays after the interrupting speech
    (production-loop finding: replies whose first-chunk synthesis was
    long always lost to routine CRITICAL alerts)."""

    def test_requeue_after_interrupt(self):
        import threading

        from trackiellm_tpu.audio.pipeline import (
            AudioPipeline, AudioPipelineConfig, TTSPriority)

        spoken = []
        gate = threading.Event()

        def tts_stream(text):
            if text == "reply" and not gate.is_set():
                gate.wait(timeout=5.0)  # slow first synthesis
            yield np.ones(10, np.float32)

        p = AudioPipeline(
            config=AudioPipelineConfig(wake_word_enabled=False),
            tts_stream_fn=tts_stream,
            on_tts_audio=lambda wav, pr: spoken.append(
                (pr, len(wav))))
        try:
            p.say("reply", TTSPriority.NORMAL)
            time.sleep(0.2)  # worker enters the slow synthesis
            p.say("ALERTA", TTSPriority.CRITICAL)  # interrupts
            gate.set()
            assert p.wait_idle(timeout=10.0)
            time.sleep(0.2)
            prios = [pr for pr, _ in spoken]
            # Alert played, AND the reply still played after it.
            assert TTSPriority.CRITICAL in prios
            assert TTSPriority.NORMAL in prios
        finally:
            p.close()

    def test_clear_queue_does_not_requeue(self):
        import threading

        from trackiellm_tpu.audio.pipeline import (
            AudioPipeline, AudioPipelineConfig, TTSPriority)

        spoken = []
        started = threading.Event()
        gate = threading.Event()

        def tts_stream(text):
            started.set()
            gate.wait(timeout=5.0)
            yield np.ones(10, np.float32)

        p = AudioPipeline(
            config=AudioPipelineConfig(wake_word_enabled=False),
            tts_stream_fn=tts_stream,
            on_tts_audio=lambda wav, pr: spoken.append(pr))
        try:
            p.say("fala", TTSPriority.NORMAL)
            assert started.wait(timeout=5.0)
            p.clear_speech_queue()  # user said stop
            gate.set()
            assert p.wait_idle(timeout=10.0)
            time.sleep(0.3)
            assert spoken == []  # nothing replayed
        finally:
            p.close()
