#!/usr/bin/env python
"""TTS parity: synthesize text through a real Piper voice (VITS graph,
models/vits.py) and score the audio against a reference waveform
rendered by Piper itself.

One-command contract (VERDICT round-2 item 3): point it at the voice's
.onnx + .json (+ a reference wav) and it emits the metric and a
PARITY-RESULTS.md row; any missing file fails with a clear message.

Usage:
  python tools/parity_tts.py --voice pt_BR-voice-medium.onnx \
      --config pt_BR-voice-medium.onnx.json \
      --text "ola, tudo bem?" --expected piper_render.wav
  # no --expected: writes the synthesized wav to --out for listening /
  # building the reference render (piper --model ... --output_file).

Metric: exact waveform parity across implementations is not meaningful
for a stochastic model (VITS samples its flows; Piper also dithers), so
synthesis runs with noise_scale=0 / noise_scale_w=0 (deterministic
duration + prior mean) and the score is log-mel L1 distance after
length alignment plus the duration ratio — the spectral-envelope
comparison TTS evaluations use. Parity target: the reference's Piper
context (src/audio/tk_tts_piper.c:237).
"""

import argparse
import os
import sys
import wave

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.parity_common import (  # noqa: E402
    die, emit, load_wav, record, require_file,
)


def _write_wav(path, audio, sr):
    pcm = np.clip(audio, -1.0, 1.0)
    data = (pcm * 32767).astype(np.int16).tobytes()
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(data)


def _log_mel(audio, sr):
    """Log-mel at the pipeline's 16 kHz basis (resampling first)."""
    import jax.numpy as jnp

    from trackiellm_tpu.ops.mel import log_mel_spectrogram
    from trackiellm_tpu.ops.resample import resample_poly

    x = jnp.asarray(audio, jnp.float32)
    if sr != 16_000:
        x = resample_poly(x, 16_000, sr)
    return np.asarray(log_mel_spectrogram(x))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--voice", required=True,
                    help="Piper voice weights (.onnx or .npz)")
    ap.add_argument("--config", required=True,
                    help="the voice's .json (phoneme_id_map, sample_rate)")
    ap.add_argument("--text", required=True)
    ap.add_argument("--phonemes", default=None,
                    help="pre-phonemized input (espeak output); when "
                    "given, --text is only recorded, not synthesized")
    ap.add_argument("--expected", default=None,
                    help="reference wav rendered by Piper (omit to just "
                    "write the synthesis to --out)")
    ap.add_argument("--out", default="tts_out.wav")
    ap.add_argument("--name-map", default="piper_vits",
                    help="bundled name-map or JSON path normalizing the "
                    "voice's initializer names onto the converter "
                    "layout (models/name_maps/; 'none' to skip)")
    ap.add_argument("--no-record", action="store_true")
    args = ap.parse_args()

    voice_path = require_file(args.voice, "Piper voice checkpoint")
    config_path = require_file(args.config, "voice .json config")

    from trackiellm_tpu.models.vits import VITSVoice

    nm = args.name_map if args.name_map.lower() != "none" else None
    try:
        voice = VITSVoice.from_piper(voice_path, config_path,
                                     name_map=nm)
    except KeyError as exc:
        die(f"voice checkpoint does not match the published VITS "
            f"layout (missing {exc}); run tools/inspect_checkpoint.py "
            f"and see docs/REAL_WEIGHTS.md's name table")

    text = args.phonemes if args.phonemes else args.text
    wav = voice.synthesize(text, noise_scale=0.0, noise_scale_w=0.0)
    sr = voice.cfg.sample_rate
    if wav.size == 0:
        die("synthesis produced no audio — check the phoneme_id_map "
            "covers the input (pass --phonemes with espeak output)")
    _write_wav(args.out, wav, sr)

    if not args.expected:
        emit({"tool": "parity_tts", "dumped": args.out,
              "seconds": round(len(wav) / sr, 3), "sample_rate": sr})
        return

    ref = load_wav(require_file(args.expected, "reference wav"),
                   target_sr=sr)
    dur_ratio = len(wav) / max(len(ref), 1)
    m_hyp = _log_mel(wav, sr)
    m_ref = _log_mel(ref, sr)
    t = min(m_hyp.shape[-1], m_ref.shape[-1])
    mel_l1 = float(np.mean(np.abs(m_hyp[..., :t] - m_ref[..., :t])))
    result = {"tool": "parity_tts",
              "mel_l1": round(mel_l1, 5),
              "duration_ratio": round(dur_ratio, 4),
              "seconds": round(len(wav) / sr, 3)}
    emit(result)
    if not args.no_record:
        record("parity_tts", voice_path, "mel L1 / duration ratio",
               f"{result['mel_l1']} / {result['duration_ratio']}",
               f"text={args.text!r}, deterministic (noise 0)")


if __name__ == "__main__":
    main()
