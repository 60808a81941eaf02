"""Audio subsystem: streaming pipeline (wake word -> VAD -> ASR -> TTS
with priority interruption). TPU-native replacement for the reference's
src/audio (C pipeline over whisper.cpp / Piper / Porcupine / Silero)."""

from trackiellm_tpu.audio.pipeline import (  # noqa: F401
    AudioPipeline,
    AudioPipelineConfig,
    AudioState,
    TTSPriority,
)
