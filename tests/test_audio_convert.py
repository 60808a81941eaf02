"""Roundtrip tests for the audio/small-perception weight converters:
torch twins (Linear/Conv1d/Conv2d/GRUCell layouts) random-initialized,
exported as state dicts, converted, and compared numerically against
the JAX forwards. Closes the 'architecture without ingestible trained
weights' gap for VAD / TTS / OCR / sound classifier / wake word
(reference ingest points: tk_vad_silero.c:25, tk_tts_piper.c:237,
tk_text_recognition.cpp, tk_sound_classifier.c:14,
tk_wake_word_porcupine.c:15).
"""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from trackiellm_tpu.models import convert


def _sd(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


class TestVADConverter:
    def test_step_matches_torch(self):
        from trackiellm_tpu.models import vad as vad_model

        cfg = vad_model.VADConfig()
        n_frames = (vad_model.CHUNK_SAMPLES - cfg.n_fft) // cfg.hop + 1

        class TVAD(nn.Module):
            def __init__(self):
                super().__init__()
                self.conv1 = nn.Linear(cfg.n_mels, cfg.conv_ch)
                self.conv2 = nn.Linear(cfg.conv_ch * n_frames, cfg.conv_ch)
                self.gru = nn.GRUCell(cfg.conv_ch, cfg.hidden)
                self.out = nn.Linear(cfg.hidden, 1)

        torch.manual_seed(0)
        twin = TVAD().eval()
        params, inferred = convert.vad_from_torch(_sd(twin))
        assert inferred == cfg

        chunk = np.random.RandomState(0).randn(
            vad_model.CHUNK_SAMPLES).astype(np.float32) * 0.1
        state0 = vad_model.init_state(cfg)
        prob, state1 = vad_model.vad_step(params, cfg,
                                          jnp.asarray(chunk), state0)

        # torch side: identical features (same numpy DFT/mel bases),
        # then the twin's layers.
        cos_b, sin_b = vad_model._dft_power_bases(cfg.n_fft)
        from trackiellm_tpu.ops.mel import mel_filterbank
        idx = (np.arange(n_frames) * cfg.hop)[:, None] + np.arange(cfg.n_fft)
        frames = chunk[idx]
        power = (frames @ cos_b) ** 2 + (frames @ sin_b) ** 2
        feats = np.log10(np.maximum(
            power @ np.asarray(mel_filterbank(cfg.n_mels, cfg.n_fft,
                                              16_000)), 1e-10))
        with torch.no_grad():
            h1 = F.relu(twin.conv1(torch.from_numpy(
                feats.astype(np.float32))))
            h2 = F.relu(twin.conv2(h1.reshape(1, -1)))
            h = twin.gru(h2, torch.zeros(1, cfg.hidden))
            want = torch.sigmoid(twin.out(h))[0, 0].item()
        assert abs(float(prob) - want) < 1e-5
        np.testing.assert_allclose(np.asarray(state1),
                                   h[0].numpy(), rtol=1e-5, atol=1e-5)


class TestOCRConverter:
    def test_forward_matches_torch(self):
        from trackiellm_tpu.models import ocr as ocr_model

        cfg = ocr_model.OCRConfig.tiny()

        class TCRNN(nn.Module):
            def __init__(self):
                super().__init__()
                c = cfg.conv_ch
                self.conv1 = nn.Conv2d(1, c // 2, 3, 1, 1)
                self.conv2 = nn.Conv2d(c // 2, c, 3, 1, 1)
                self.conv3 = nn.Conv2d(c, c, 3, 1, 1)
                feat = c * cfg.height // 8
                self.gru_fwd = nn.GRUCell(feat, cfg.hidden)
                self.gru_bwd = nn.GRUCell(feat, cfg.hidden)
                self.out = nn.Linear(2 * cfg.hidden, cfg.num_classes)

            def forward(self, x):  # (B, 1, H, W)
                for conv in (self.conv1, self.conv2, self.conv3):
                    x = F.max_pool2d(F.relu(conv(x)), 2)
                b, c, h, w = x.shape
                # Matches models/ocr: width-major, features = (h, c)
                # flattened from NHWC -> h*c ordering.
                seq = x.permute(0, 3, 2, 1).reshape(b, w, h * c)
                outs = []
                hf = torch.zeros(b, cfg.hidden)
                fwd = []
                for t in range(w):
                    hf = self.gru_fwd(seq[:, t], hf)
                    fwd.append(hf)
                hb = torch.zeros(b, cfg.hidden)
                bwd = [None] * w
                for t in reversed(range(w)):
                    hb = self.gru_bwd(seq[:, t], hb)
                    bwd[t] = hb
                feats = torch.stack(
                    [torch.cat([f, bk], -1) for f, bk in zip(fwd, bwd)], 1)
                return self.out(feats)

        torch.manual_seed(1)
        twin = TCRNN().eval()
        # The fused-bias layout needs bias_hh[n] == 0.
        with torch.no_grad():
            h = cfg.hidden
            twin.gru_fwd.bias_hh[2 * h:] = 0
            twin.gru_bwd.bias_hh[2 * h:] = 0
        params, inferred = convert.ocr_from_torch(_sd(twin))
        assert inferred == cfg._replace(height=inferred.height,
                                        width=inferred.width)

        crops = np.random.RandomState(1).rand(
            2, cfg.height, cfg.width).astype(np.float32)
        got = np.asarray(ocr_model.ocr_forward(params, cfg,
                                               jnp.asarray(crops)))
        with torch.no_grad():
            want = twin(torch.from_numpy(crops)[:, None]).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_nonzero_bias_hh_n_rejected(self):
        from trackiellm_tpu.models import ocr as ocr_model
        from trackiellm_tpu.utils.errors import TrackieError

        cfg = ocr_model.OCRConfig.tiny()
        feat = cfg.conv_ch * cfg.height // 8
        state = {
            "conv1.weight": np.zeros((cfg.conv_ch // 2, 1, 3, 3),
                                     np.float32),
            "conv1.bias": np.zeros(cfg.conv_ch // 2, np.float32),
            "conv2.weight": np.zeros((cfg.conv_ch, cfg.conv_ch // 2, 3, 3),
                                     np.float32),
            "conv2.bias": np.zeros(cfg.conv_ch, np.float32),
            "conv3.weight": np.zeros((cfg.conv_ch, cfg.conv_ch, 3, 3),
                                     np.float32),
            "conv3.bias": np.zeros(cfg.conv_ch, np.float32),
            "out.weight": np.zeros((cfg.num_classes, 2 * cfg.hidden),
                                   np.float32),
            "out.bias": np.zeros(cfg.num_classes, np.float32),
        }
        for side in ("gru_fwd", "gru_bwd"):
            state[f"{side}.weight_ih"] = np.zeros((3 * cfg.hidden, feat),
                                                  np.float32)
            state[f"{side}.weight_hh"] = np.zeros(
                (3 * cfg.hidden, cfg.hidden), np.float32)
            state[f"{side}.bias_ih"] = np.zeros(3 * cfg.hidden, np.float32)
            bh = np.zeros(3 * cfg.hidden, np.float32)
            bh[2 * cfg.hidden] = 0.5  # non-foldable n-gate bias
            state[f"{side}.bias_hh"] = bh
        with pytest.raises(TrackieError):
            convert.ocr_from_torch(state)


class TestTTSConverter:
    def test_vocoder_matches_torch(self):
        from trackiellm_tpu.models import tts as tts_model

        cfg = tts_model.TTSConfig.tiny()

        class TVoc(nn.Module):
            """The vocoder half as torch Conv1d stacks (padding k//2,
            nearest upsample) — mirrors vocoder_forward."""

            def __init__(self):
                super().__init__()
                c = cfg.voc_ch
                self.voc_in = nn.Conv1d(cfg.n_mels, c, 7, padding=3)
                ch = c
                for i in range(len(cfg.upsample)):
                    setattr(self, f"voc_up{i}",
                            nn.Conv1d(ch, ch // 2, 8, padding=4))
                    setattr(self, f"voc_res{i}a",
                            nn.Conv1d(ch // 2, ch // 2, 3, padding=1))
                    setattr(self, f"voc_res{i}b",
                            nn.Conv1d(ch // 2, ch // 2, 3, padding=1))
                    ch //= 2
                self.voc_out = nn.Conv1d(ch, 1, 7, padding=3)

            def forward(self, mel):  # (T, n_mels)
                x = mel.T[None]
                x = F.leaky_relu(self.voc_in(x), 0.1)
                for i, f in enumerate(cfg.upsample):
                    x = x.repeat_interleave(f, dim=2)
                    up = getattr(self, f"voc_up{i}")(x)
                    # even kernel: torch pad (4,4) gives L+1 outputs with
                    # window starts j-4; XLA SAME pads (3,4) with starts
                    # i-3 — torch's [1:L+1] aligns with XLA's [0:L].
                    up = up[..., 1: x.shape[2] + 1]
                    x = F.leaky_relu(up, 0.1)
                    r = F.leaky_relu(
                        getattr(self, f"voc_res{i}a")(x), 0.1)
                    x = x + getattr(self, f"voc_res{i}b")(r)
                return torch.tanh(self.voc_out(x))[0, 0]

        torch.manual_seed(2)
        twin = TVoc().eval()

        # Assemble a full state dict: vocoder weights from the twin,
        # acoustic weights from a JAX init exported to the torch layout.
        import jax.random as jrandom
        ref = tts_model.init_tts(jrandom.PRNGKey(5), cfg)
        state = {}
        for name in ("enc1", "enc2", "dec1", "dec2"):
            state[f"{name}.weight"] = np.asarray(
                ref[name]["w"]).transpose(2, 1, 0)
            state[f"{name}.bias"] = np.asarray(ref[name]["b"])
        for name in ("dur1", "dur2", "mel_out"):
            state[f"{name}.weight"] = np.asarray(ref[name]["w"]).T
            state[f"{name}.bias"] = np.asarray(ref[name]["b"])
        state["emb.weight"] = np.asarray(ref["emb"])
        state.update(_sd(twin))

        params, inferred = convert.tts_from_torch(state,
                                                  upsample=cfg.upsample)
        cfg2 = inferred._replace(max_chars=cfg.max_chars,
                                 max_frames=cfg.max_frames)
        assert cfg2 == cfg

        # Acoustic params survived the layout roundtrip exactly.
        for name in ("enc1", "dec2"):
            np.testing.assert_array_equal(np.asarray(params[name]["w"]),
                                          np.asarray(ref[name]["w"]))

        mel = np.random.RandomState(3).randn(
            cfg.max_frames, cfg.n_mels).astype(np.float32)
        got = np.asarray(tts_model.vocoder_forward(params, cfg2,
                                                   jnp.asarray(mel)))
        with torch.no_grad():
            want = twin(torch.from_numpy(mel)).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


class TestSmallClassifierConverters:
    def test_sound_classifier_matches_torch(self):
        from trackiellm_tpu.models import sound_classifier as sc_model

        cfg = sc_model.SoundClassifierConfig.tiny()

        class TSC(nn.Module):
            def __init__(self):
                super().__init__()
                c = cfg.ch
                self.conv1 = nn.Conv2d(1, c // 2, 3, 1, 1)
                self.conv2 = nn.Conv2d(c // 2, c, 3, 1, 1)
                self.conv3 = nn.Conv2d(c, 2 * c, 3, 1, 1)
                self.out = nn.Linear(2 * c, cfg.num_classes)

            def forward(self, x):
                for conv in (self.conv1, self.conv2, self.conv3):
                    x = F.max_pool2d(F.relu(conv(x)), 2)
                pooled = x.mean(dim=(2, 3))
                return F.softmax(self.out(pooled), -1)

        torch.manual_seed(3)
        twin = TSC().eval()
        params, inferred = convert.sound_classifier_from_torch(
            _sd(twin), n_mels=cfg.n_mels, n_frames=cfg.n_frames)
        assert inferred == cfg

        mel = np.random.RandomState(4).randn(
            cfg.n_mels, cfg.n_frames).astype(np.float32)
        got = np.asarray(sc_model.classify_window(params, cfg,
                                                  jnp.asarray(mel)))
        with torch.no_grad():
            want = twin(torch.from_numpy(mel)[None, None]).numpy()[0]
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_wake_word_converts(self):
        from trackiellm_tpu.audio import wake_word as ww

        cfg = ww.WakeWordConfig()

        class TWW(nn.Module):
            def __init__(self):
                super().__init__()
                self.conv1 = nn.Conv2d(1, cfg.ch // 2, 3, 1, 1)
                self.conv2 = nn.Conv2d(cfg.ch // 2, cfg.ch, 3, 1, 1)
                self.out = nn.Linear(cfg.ch, 1)

        torch.manual_seed(4)
        twin = TWW().eval()
        params, inferred = convert.wake_word_from_torch(_sd(twin))
        assert inferred == cfg
        mel = np.random.RandomState(5).randn(
            cfg.n_mels, cfg.n_frames).astype(np.float32)
        score = float(ww.wake_word_score(params, cfg, jnp.asarray(mel)))
        assert 0.0 <= score <= 1.0


class TestSileroExactConverter:
    """Silero-v5-exact topology (models/vad.py::SileroVAD): the
    converter must consume the REAL published initializer names, and
    the JAX step must match a torch twin built from torch's own
    Conv1d/LSTMCell conventions (docs/REAL_WEIGHTS.md name table)."""

    def _torch_state(self, seed=0):
        import torch

        g = torch.Generator().manual_seed(seed)
        st = {}
        st["_model.stft.forward_basis_buffer"] = torch.randn(
            (258, 1, 256), generator=g) * 0.1
        cin = 129
        for i, (cout, _s) in enumerate(
                zip((128, 64, 64, 128), (1, 2, 2, 1))):
            st[f"_model.encoder.{i}.reparam_conv.weight"] = torch.randn(
                (cout, cin, 3), generator=g) * (1.0 / (cin * 3) ** 0.5)
            st[f"_model.encoder.{i}.reparam_conv.bias"] = torch.randn(
                (cout,), generator=g) * 0.01
            cin = cout
        st["_model.decoder.rnn.weight_ih"] = torch.randn(
            (512, 128), generator=g) * 0.05
        st["_model.decoder.rnn.weight_hh"] = torch.randn(
            (512, 128), generator=g) * 0.05
        st["_model.decoder.rnn.bias_ih"] = torch.randn(
            (512,), generator=g) * 0.01
        st["_model.decoder.rnn.bias_hh"] = torch.randn(
            (512,), generator=g) * 0.01
        st["_model.decoder.decoder.2.weight"] = torch.randn(
            (1, 128, 1), generator=g) * 0.1
        st["_model.decoder.decoder.2.bias"] = torch.randn(
            (1,), generator=g) * 0.01
        return st

    def test_step_matches_torch_twin(self):
        import torch
        import torch.nn.functional as F
        import jax.numpy as jnp

        from trackiellm_tpu.models.convert import silero_from_onnx
        from trackiellm_tpu.models.vad import (
            SileroVAD, silero_init_state, silero_step)

        st = self._torch_state(seed=4)
        params, cfg = silero_from_onnx(
            {k: v.numpy() for k, v in st.items()})
        assert cfg.hidden == 128 and cfg.enc_ch == (128, 64, 64, 128)

        chunk = torch.randn((512,), generator=torch.Generator()
                            .manual_seed(9)) * 0.1

        # --- torch twin of one step, context zero ----------------------
        with torch.no_grad():
            x = torch.cat([torch.zeros(64), chunk])
            x = F.pad(x[None, None], (64, 64), mode="reflect")[0, 0]
            frames = x.unfold(0, 256, 128)                 # (F, 256)
            basis = st["_model.stft.forward_basis_buffer"][:, 0, :]
            spec = frames @ basis.T                        # (F, 258)
            re, im = spec[:, :129], spec[:, 129:]
            mag = torch.sqrt(re * re + im * im + 1e-12)
            feat = mag.T[None]                             # (1, 129, F)
            for i, s in enumerate((1, 2, 2, 1)):
                feat = F.conv1d(
                    feat, st[f"_model.encoder.{i}.reparam_conv.weight"],
                    st[f"_model.encoder.{i}.reparam_conv.bias"],
                    stride=s, padding=1)
                feat = F.relu(feat)
            feat = feat[0].mean(dim=-1)
            cell = torch.nn.LSTMCell(128, 128)
            cell.weight_ih.data = st["_model.decoder.rnn.weight_ih"]
            cell.weight_hh.data = st["_model.decoder.rnn.weight_hh"]
            cell.bias_ih.data = st["_model.decoder.rnn.bias_ih"]
            cell.bias_hh.data = st["_model.decoder.rnn.bias_hh"]
            h, c = cell(feat[None],
                        (torch.zeros(1, 128), torch.zeros(1, 128)))
            w = st["_model.decoder.decoder.2.weight"].reshape(-1)
            t_prob = torch.sigmoid(
                h[0] @ w + st["_model.decoder.decoder.2.bias"][0])

        j_prob, (jh, jc, jctx) = silero_step(
            params, cfg, jnp.asarray(chunk.numpy()),
            silero_init_state(cfg))
        np.testing.assert_allclose(float(j_prob), float(t_prob),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(jh), h[0].numpy(),
                                   rtol=1e-4, atol=1e-5)
        # Context carry: the next chunk sees this chunk's tail.
        np.testing.assert_allclose(np.asarray(jctx),
                                   chunk[-64:].numpy(), rtol=1e-6)

    def test_prefixless_names_accepted(self):
        from trackiellm_tpu.models.convert import silero_from_onnx

        st = {k.replace("_model.", ""): v.numpy()
              for k, v in self._torch_state(seed=1).items()}
        params, cfg = silero_from_onnx(st)
        assert params["lstm_wi"].shape == (512, 128)

    def test_streaming_wrapper_interface(self):
        import jax

        from trackiellm_tpu.models.vad import (
            SileroConfig, SileroVAD, init_silero)

        cfg = SileroConfig()
        vad = SileroVAD(init_silero(jax.random.PRNGKey(0), cfg), cfg)
        p = vad(np.random.default_rng(0).standard_normal(1600)
                .astype(np.float32))
        assert 0.0 <= p <= 1.0
        vad.reset()
