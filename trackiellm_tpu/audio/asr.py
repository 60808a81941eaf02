"""ASR engine: audio-in, transcript-out glue over the Whisper model.

Parity target: ``tk_asr_whisper`` (reference: src/audio/tk_asr_whisper.c):
init from file (:238), full-segment transcription with greedy sampling +
segment concat (:142-175), language switch (:386). The engine owns the
mel front-end, padding to Whisper's 30 s window, and tokenizer decode;
the pipeline just calls ``transcribe(audio)``.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np
import jax.numpy as jnp

from trackiellm_tpu.models import whisper as whisper_model
from trackiellm_tpu.llm.tokenizer import ByteTokenizer, Tokenizer
from trackiellm_tpu.ops.mel import (HOP_LENGTH, SAMPLE_RATE,
                                    log_mel_spectrogram)
from trackiellm_tpu.utils.logging import get_logger

log = get_logger("audio.asr")


class WhisperASR:
    """Segment transcriber with fixed mel buckets (static shapes)."""

    def __init__(self, params: Dict[str, Any],
                 cfg: whisper_model.WhisperConfig,
                 tokenizer: Optional[Tokenizer] = None,
                 language: int = 0,
                 max_tokens: int = 96):
        self.params = params
        self.cfg = cfg
        # Real deployments load the Whisper BPE vocab; the byte tokenizer
        # keeps the engine self-contained for tests/draft models.
        self.tokenizer = tokenizer or ByteTokenizer(cfg.vocab_size)
        self.language = language
        self.max_tokens = max_tokens
        # Mel frames per segment bucket: audio ctx is frames/2.
        self._mel_frames = cfg.n_audio_ctx * 2

    def set_language(self, language: int) -> None:
        """Parity: the language-switch API (tk_asr_whisper.c:386)."""
        self.language = language

    def transcribe(self, audio: np.ndarray,
                   sample_rate: int = SAMPLE_RATE) -> str:
        """Mono f32 audio -> transcript text."""
        if sample_rate != SAMPLE_RATE:
            from trackiellm_tpu.ops.resample import resample_poly

            audio = np.asarray(
                resample_poly(jnp.asarray(audio), SAMPLE_RATE, sample_rate))
        # Pad/trim the AUDIO to the fixed window before the mel — one
        # static shape for the whole front-end. Padding the mel instead
        # compiled a fresh log_mel program per distinct segment length
        # (VAD endpoints vary in 100 ms steps), a ~1.2 s stall on the
        # first utterance of each new length (round-3 production-loop
        # run 1). Zero-sample padding is also OpenAI Whisper's real
        # semantics (pad_or_trim on samples, openai/whisper audio.py);
        # the padded frames land on the log-mel silence floor without
        # moving the global dynamic-range max.
        n_samples = self._mel_frames * HOP_LENGTH
        audio = np.asarray(audio, np.float32).ravel()[:n_samples]
        if audio.shape[0] < n_samples:
            audio = np.pad(audio, (0, n_samples - audio.shape[0]))
        # n_mels rides the model config: 80 for tiny..medium, 128 for
        # large-v3-family checkpoints (whisper_config_from_torch reads
        # it from conv1's shape).
        mel = log_mel_spectrogram(jnp.asarray(audio),
                                  n_mels=self.cfg.n_mels)
        tokens = whisper_model.transcribe_tokens(
            self.params, self.cfg, mel, max_tokens=self.max_tokens,
            language=self.language)
        return self.tokenizer.decode(tokens).strip()

    def __call__(self, audio: np.ndarray) -> str:
        return self.transcribe(audio)
