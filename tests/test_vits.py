"""VITS inference graph (models/vits.py) + Piper-checkpoint converter.

Validation strategy (no real voice exists in this zero-egress env):
  - torch is ground truth for conv/transposed-conv/weight-norm math,
  - inverse modules are checked by the forward-roundtrip property
    (spline, coupling flow),
  - a torch twin pins the windowed relative attention layout,
  - the converter ingests a synthetic checkpoint written with the REAL
    torch VITS module names (docs/REAL_WEIGHTS.md) and the result runs.
"""

import math

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from trackiellm_tpu.models import vits as V

pytestmark = pytest.mark.slow  # model-zoo/parallel tier: excluded from `make smoke`


class TestSplineInverse:
    def _forward_np(self, x, widths, heights, derivs, tail):
        """Forward rational-quadratic spline with linear tails (test
        oracle, numpy)."""
        n_bins = widths.shape[-1]
        min_w = min_h = min_d = 1e-3

        def smax(a):
            e = np.exp(a - a.max(-1, keepdims=True))
            return e / e.sum(-1, keepdims=True)

        w = min_w + (1 - min_w * n_bins) * smax(widths)
        cw = np.concatenate([np.zeros_like(w[..., :1]),
                             np.cumsum(w, -1)], -1) * 2 * tail - tail
        h = min_h + (1 - min_h * n_bins) * smax(heights)
        ch = np.concatenate([np.zeros_like(h[..., :1]),
                             np.cumsum(h, -1)], -1) * 2 * tail - tail
        d = min_d + np.log1p(np.exp(derivs))
        d = np.concatenate([np.ones_like(d[..., :1]), d,
                            np.ones_like(d[..., :1])], -1)

        out = np.empty_like(x)
        for i in range(x.shape[0]):
            xi = x[i]
            if xi < -tail or xi > tail:
                out[i] = xi
                continue
            k = np.searchsorted(cw[i, 1:-1], xi, side="right")
            xk, wk = cw[i, k], (cw[i, k + 1] - cw[i, k])
            yk, hk = ch[i, k], (ch[i, k + 1] - ch[i, k])
            dk, dk1 = d[i, k], d[i, k + 1]
            s = hk / wk
            t_ = (xi - xk) / wk
            num = hk * (s * t_ ** 2 + dk * t_ * (1 - t_))
            den = s + (dk + dk1 - 2 * s) * t_ * (1 - t_)
            out[i] = yk + num / den
        return out

    def test_roundtrip(self):
        rng = np.random.default_rng(0)
        n, k = 64, 10
        widths = rng.standard_normal((n, k)).astype(np.float32)
        heights = rng.standard_normal((n, k)).astype(np.float32)
        derivs = rng.standard_normal((n, k - 1)).astype(np.float32)
        tail = 5.0
        x = rng.uniform(-6, 6, n).astype(np.float32)  # incl. tails
        y = self._forward_np(x, widths, heights, derivs, tail)
        x_back = np.asarray(V._rq_spline_inverse(
            jnp.asarray(y), jnp.asarray(widths), jnp.asarray(heights),
            jnp.asarray(derivs), tail))
        np.testing.assert_allclose(x_back, x, rtol=1e-4, atol=1e-4)


class TestFlowInverse:
    def test_coupling_roundtrip(self):
        cfg = V.VITSConfig.tiny()
        params = V.init_vits(jax.random.PRNGKey(1), cfg)
        # Give the zero-init post convs real values so the flow acts.
        fp = params["flow"]
        fp["couplings"]["post_w"] = jax.random.normal(
            jax.random.PRNGKey(2),
            fp["couplings"]["post_w"].shape) * 0.1

        t = 24
        mask = jnp.ones((t,))
        x = jax.random.normal(jax.random.PRNGKey(3), (cfg.d_model, t))

        # forward: couplings in order, Flip after each
        half = cfg.d_model // 2

        def forward(x):
            for i in range(cfg.n_flows):
                lp = jax.tree_util.tree_map(
                    lambda a: a[i], fp["couplings"])
                x0, x1 = x[:half], x[half:]
                h = V._conv1d(x0, lp["pre_w"], lp["pre_b"])
                h = V._wn(h, lp["wn"], cfg, mask)
                m = V._conv1d(h, lp["post_w"], lp["post_b"])
                x = jnp.concatenate([x0, x1 + m], axis=0)
                x = jnp.flip(x, axis=0)
            return x

        z = forward(x)
        x_back = V._flow_inverse(z, fp, cfg, mask)
        np.testing.assert_allclose(np.asarray(x_back), np.asarray(x),
                                   rtol=1e-4, atol=1e-4)


class TestTorchGroundTruth:
    def test_conv_transpose_matches_torch(self):
        torch.manual_seed(0)
        cin, cout, k, stride, t = 6, 4, 8, 4, 10
        w = torch.randn(cin, cout, k) * 0.2
        b = torch.randn(cout) * 0.1
        x = torch.randn(cin, t)
        pad = (k - stride) // 2
        want = F.conv_transpose1d(x[None], w, b, stride=stride,
                                  padding=pad)[0]
        got = V._conv_transpose1d(jnp.asarray(x.numpy()),
                                  jnp.asarray(w.numpy()),
                                  jnp.asarray(b.numpy()),
                                  stride=stride, padding=pad)
        np.testing.assert_allclose(np.asarray(got), want.numpy(),
                                   rtol=1e-4, atol=1e-5)

    def test_weight_norm_reconstruction(self):
        from trackiellm_tpu.models.convert import _wn_weight

        torch.manual_seed(1)
        conv = torch.nn.utils.weight_norm(torch.nn.Conv1d(8, 16, 5))
        state = {f"c.{k}": v.detach().numpy()
                 for k, v in conv.state_dict().items()}
        got = _wn_weight(state, "c")
        # Materialize torch's effective weight.
        with torch.no_grad():
            x = torch.zeros(1, 8, 7)
            conv(x)  # triggers weight computation
        want = conv.weight.detach().numpy()
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_dilated_grouped_conv_matches_torch(self):
        torch.manual_seed(2)
        ch, k, t, dil = 8, 3, 12, 3
        w = torch.randn(ch, 1, k) * 0.3
        b = torch.randn(ch) * 0.1
        x = torch.randn(ch, t)
        pad = (k * dil - dil) // 2
        want = F.conv1d(x[None], w, b, padding=pad, dilation=dil,
                        groups=ch)[0]
        got = V._conv1d(jnp.asarray(x.numpy()), jnp.asarray(w.numpy()),
                        jnp.asarray(b.numpy()), padding=pad,
                        dilation=dil, groups=ch)
        np.testing.assert_allclose(np.asarray(got), want.numpy(),
                                   rtol=1e-4, atol=1e-5)


class TestRelativeAttention:
    def test_matches_torch_twin(self):
        """Torch twin of VITS's windowed relative attention (manual
        banded implementation) pins the head/transpose/band layout."""
        torch.manual_seed(3)
        c, t, heads, window = 8, 11, 2, 3
        hd = c // heads
        p_t = {n: torch.randn(c, c, 1) * 0.3 for n in
               ("q_w", "k_w", "v_w", "o_w")}
        b_t = {n: torch.randn(c) * 0.1 for n in
               ("q_b", "k_b", "v_b", "o_b")}
        emb_k = torch.randn(2 * window + 1, hd) * 0.2
        emb_v = torch.randn(2 * window + 1, hd) * 0.2
        x = torch.randn(c, t)

        with torch.no_grad():
            q = F.conv1d(x[None], p_t["q_w"], b_t["q_b"])[0]
            k = F.conv1d(x[None], p_t["k_w"], b_t["k_b"])[0]
            v = F.conv1d(x[None], p_t["v_w"], b_t["v_b"])[0]
            q = q.reshape(heads, hd, t).permute(0, 2, 1)
            k = k.reshape(heads, hd, t).permute(0, 2, 1)
            v = v.reshape(heads, hd, t).permute(0, 2, 1)
            scores = q @ k.transpose(1, 2) / math.sqrt(hd)
            for ti in range(t):
                for r in range(2 * window + 1):
                    s = ti + r - window
                    if 0 <= s < t:
                        scores[:, ti, s] += (
                            q[:, ti] @ emb_k[r]) / math.sqrt(hd)
            probs = scores.softmax(-1)
            out = probs @ v
            for ti in range(t):
                for r in range(2 * window + 1):
                    s = ti + r - window
                    if 0 <= s < t:
                        out[:, ti] += probs[:, ti, s, None] * emb_v[r]
            out = out.permute(0, 2, 1).reshape(c, t)
            want = F.conv1d(out[None], p_t["o_w"], b_t["o_b"])[0]

        jp = {k_: jnp.asarray(v_.numpy()) for k_, v_ in
              {**p_t, **b_t}.items()}
        jp["emb_k"] = jnp.asarray(emb_k.numpy())
        jp["emb_v"] = jnp.asarray(emb_v.numpy())
        got = V._rel_attention(jnp.asarray(x.numpy()), jp, heads,
                               window, jnp.ones((t, t), bool))
        np.testing.assert_allclose(np.asarray(got), want.numpy(),
                                   rtol=1e-3, atol=1e-4)


class TestConverter:
    def _torch_vits_state(self, cfg: V.VITSConfig, seed=0):
        """Synthetic checkpoint with the REAL torch VITS names."""
        g = torch.Generator().manual_seed(seed)
        st = {}

        def R(*shape, s=0.2):
            return torch.randn(*shape, generator=g) * s

        c = cfg.d_model
        st["enc_p.emb.weight"] = R(cfg.vocab_size, c)
        for i in range(cfg.n_layers):
            ap = f"enc_p.encoder.attn_layers.{i}"
            for n in ("q", "k", "v", "o"):
                st[f"{ap}.conv_{n}.weight"] = R(c, c, 1)
                st[f"{ap}.conv_{n}.bias"] = R(c, s=0.05)
            hd = c // cfg.n_heads
            st[f"{ap}.emb_rel_k"] = R(1, 2 * cfg.window + 1, hd)
            st[f"{ap}.emb_rel_v"] = R(1, 2 * cfg.window + 1, hd)
            st[f"enc_p.encoder.norm_layers_1.{i}.gamma"] = (
                torch.ones(c))
            st[f"enc_p.encoder.norm_layers_1.{i}.beta"] = (
                torch.zeros(c))
            st[f"enc_p.encoder.ffn_layers.{i}.conv_1.weight"] = R(
                cfg.ffn_ch, c, cfg.ffn_kernel)
            st[f"enc_p.encoder.ffn_layers.{i}.conv_1.bias"] = R(
                cfg.ffn_ch, s=0.05)
            st[f"enc_p.encoder.ffn_layers.{i}.conv_2.weight"] = R(
                c, cfg.ffn_ch, cfg.ffn_kernel)
            st[f"enc_p.encoder.ffn_layers.{i}.conv_2.bias"] = R(
                c, s=0.05)
            st[f"enc_p.encoder.norm_layers_2.{i}.gamma"] = (
                torch.ones(c))
            st[f"enc_p.encoder.norm_layers_2.{i}.beta"] = (
                torch.zeros(c))
        st["enc_p.proj.weight"] = R(2 * c, c, 1)
        st["enc_p.proj.bias"] = R(2 * c, s=0.05)

        half = c // 2
        for fi in range(0, 2 * cfg.n_flows, 2):
            p = f"flow.flows.{fi}"
            st[f"{p}.pre.weight"] = R(c, half, 1)
            st[f"{p}.pre.bias"] = R(c, s=0.05)
            for j in range(cfg.wn_layers):
                w = R(2 * c, c, cfg.wn_kernel)
                st[f"{p}.enc.in_layers.{j}.weight_g"] = (
                    w.norm(dim=(1, 2), keepdim=True))
                st[f"{p}.enc.in_layers.{j}.weight_v"] = w
                st[f"{p}.enc.in_layers.{j}.bias"] = R(2 * c, s=0.05)
                rs = 2 * c if j < cfg.wn_layers - 1 else c
                w2 = R(rs, c, 1)
                st[f"{p}.enc.res_skip_layers.{j}.weight_g"] = (
                    w2.norm(dim=(1, 2), keepdim=True))
                st[f"{p}.enc.res_skip_layers.{j}.weight_v"] = w2
                st[f"{p}.enc.res_skip_layers.{j}.bias"] = R(rs, s=0.05)
            st[f"{p}.post.weight"] = torch.zeros(half, c, 1)
            st[f"{p}.post.bias"] = torch.zeros(half)

        # SDP
        def dds(prefix, ch):
            for i in range(3):
                st[f"{prefix}.convs_sep.{i}.weight"] = R(
                    ch, 1, cfg.sdp_kernel)
                st[f"{prefix}.convs_sep.{i}.bias"] = R(ch, s=0.05)
                st[f"{prefix}.convs_1x1.{i}.weight"] = R(ch, ch, 1)
                st[f"{prefix}.convs_1x1.{i}.bias"] = R(ch, s=0.05)
                st[f"{prefix}.norms_1.{i}.gamma"] = torch.ones(ch)
                st[f"{prefix}.norms_1.{i}.beta"] = torch.zeros(ch)
                st[f"{prefix}.norms_2.{i}.gamma"] = torch.ones(ch)
                st[f"{prefix}.norms_2.{i}.beta"] = torch.zeros(ch)

        st["dp.pre.weight"] = R(cfg.sdp_ch, c, 1)
        st["dp.pre.bias"] = R(cfg.sdp_ch, s=0.05)
        dds("dp.convs", cfg.sdp_ch)
        st["dp.proj.weight"] = R(cfg.sdp_ch, cfg.sdp_ch, 1)
        st["dp.proj.bias"] = R(cfg.sdp_ch, s=0.05)
        st["dp.flows.0.m"] = R(2, s=0.1)
        st["dp.flows.0.logs"] = R(2, s=0.1)
        for fi in range(1, 2 * cfg.sdp_flows, 2):
            p = f"dp.flows.{fi}"
            st[f"{p}.pre.weight"] = R(cfg.sdp_ch, 1, 1)
            st[f"{p}.pre.bias"] = R(cfg.sdp_ch, s=0.05)
            dds(f"{p}.convs", cfg.sdp_ch)
            st[f"{p}.proj.weight"] = torch.zeros(
                3 * cfg.sdp_bins - 1, cfg.sdp_ch, 1)
            st[f"{p}.proj.bias"] = torch.zeros(3 * cfg.sdp_bins - 1)

        # HiFiGAN
        ch = cfg.up_init_ch
        st["dec.conv_pre.weight"] = R(ch, c, 7)
        st["dec.conv_pre.bias"] = R(ch, s=0.05)
        in_ch = ch
        nk = len(cfg.resblock_kernels)
        for i, (rate, kern) in enumerate(zip(cfg.upsample_rates,
                                             cfg.upsample_kernels)):
            out_ch = ch // (2 ** (i + 1))
            w = R(in_ch, out_ch, kern, s=0.05)
            st[f"dec.ups.{i}.weight_g"] = w.norm(dim=(1, 2),
                                                 keepdim=True)
            st[f"dec.ups.{i}.weight_v"] = w
            st[f"dec.ups.{i}.bias"] = R(out_ch, s=0.02)
            for j, (k, dils) in enumerate(zip(cfg.resblock_kernels,
                                              cfg.resblock_dilations)):
                p = f"dec.resblocks.{i * nk + j}"
                for d in range(len(dils)):
                    for cn in ("convs1", "convs2"):
                        w = R(out_ch, out_ch, k, s=0.1)
                        st[f"{p}.{cn}.{d}.weight_g"] = w.norm(
                            dim=(1, 2), keepdim=True)
                        st[f"{p}.{cn}.{d}.weight_v"] = w
                        st[f"{p}.{cn}.{d}.bias"] = R(out_ch, s=0.02)
            in_ch = out_ch
        st["dec.conv_post.weight"] = R(1, in_ch, 7, s=0.05)
        return st

    def test_convert_and_infer(self):
        from trackiellm_tpu.models.convert import vits_from_torch

        cfg0 = V.VITSConfig.tiny()
        st = {k: v.numpy() for k, v in
              self._torch_vits_state(cfg0).items()}
        params, cfg = vits_from_torch(
            st, max_phonemes=cfg0.max_phonemes,
            max_frames=cfg0.max_frames, sample_rate=cfg0.sample_rate)
        assert cfg.d_model == cfg0.d_model
        assert cfg.n_layers == cfg0.n_layers
        assert cfg.n_flows == cfg0.n_flows
        assert cfg.upsample_kernels == cfg0.upsample_kernels
        assert cfg.upsample_rates == cfg0.upsample_rates
        assert cfg.sdp_bins == cfg0.sdp_bins

        ph = np.zeros(cfg.max_phonemes, np.int32)
        ph[:8] = np.arange(1, 9)
        wav, n_frames = V.vits_infer(
            params, cfg, jnp.asarray(ph), jnp.int32(8),
            jax.random.PRNGKey(4))
        assert wav.shape == (cfg.max_frames * cfg.hop,)
        assert int(n_frames) > 0
        assert np.isfinite(np.asarray(wav)).all()

    def test_missing_tensor_raises_keyerror(self):
        from trackiellm_tpu.models.convert import vits_from_torch

        with pytest.raises(KeyError):
            vits_from_torch({"enc_p.emb.weight": np.zeros((4, 8))})


class TestInferBehavior:
    def test_deterministic_given_key(self):
        cfg = V.VITSConfig.tiny()
        params = V.init_vits(jax.random.PRNGKey(7), cfg)
        ph = np.zeros(cfg.max_phonemes, np.int32)
        ph[:6] = 1 + np.arange(6)
        a, _ = V.vits_infer(params, cfg, jnp.asarray(ph), jnp.int32(6),
                            jax.random.PRNGKey(5))
        b, _ = V.vits_infer(params, cfg, jnp.asarray(ph), jnp.int32(6),
                            jax.random.PRNGKey(5))
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_length_scale_stretches(self):
        cfg = V.VITSConfig.tiny()
        params = V.init_vits(jax.random.PRNGKey(7), cfg)
        ph = np.zeros(cfg.max_phonemes, np.int32)
        ph[:6] = 1 + np.arange(6)
        _, n1 = V.vits_infer(params, cfg, jnp.asarray(ph), jnp.int32(6),
                             jax.random.PRNGKey(5), length_scale=1.0)
        _, n2 = V.vits_infer(params, cfg, jnp.asarray(ph), jnp.int32(6),
                             jax.random.PRNGKey(5), length_scale=2.0)
        assert int(n2) >= int(n1)


class TestVITSVoice:
    def test_synthesize_and_piper_loading(self, tmp_path):
        import json

        cfg = V.VITSConfig.tiny()
        params = V.init_vits(jax.random.PRNGKey(9), cfg)
        voice = V.VITSVoice(params, cfg)
        wav = voice.synthesize("ola mundo")
        assert wav.ndim == 1 and len(wav) > 0
        assert np.isfinite(wav).all()

        # from_piper: synthetic checkpoint (npz, torch names) + config.
        from tests.test_vits import TestConverter

        st = {k: v.numpy() for k, v in
              TestConverter()._torch_vits_state(cfg).items()}
        ckpt = str(tmp_path / "voice.npz")
        np.savez(ckpt, **st)
        conf = {"audio": {"sample_rate": 16000},
                "phoneme_id_map": {"^": [1], "$": [2], "_": [0],
                                   "o": [5], "l": [6], "a": [7]}}
        conf_path = str(tmp_path / "voice.json")
        with open(conf_path, "w") as f:
            json.dump(conf, f)
        v2 = V.VITSVoice.from_piper(ckpt, conf_path,
                                    max_frames=cfg.max_frames)
        wav2 = v2.synthesize("ola")
        assert len(wav2) > 0 and np.isfinite(wav2).all()


class TestSynthCLI:
    def test_cli_synth_writes_wav(self, tmp_path):
        import json
        import subprocess
        import sys as _sys
        import wave

        cfg = V.VITSConfig.tiny()
        st = {k: v.numpy() for k, v in
              TestConverter()._torch_vits_state(cfg).items()}
        ckpt = str(tmp_path / "voice.npz")
        np.savez(ckpt, **st)
        conf_path = str(tmp_path / "voice.json")
        with open(conf_path, "w") as f:
            json.dump({"audio": {"sample_rate": 16000}}, f)
        out = str(tmp_path / "fala.wav")

        from trackiellm_tpu.__main__ import main

        rc = main(["synth", "-t", "ola", "--voice", ckpt,
                   "--voice-config", conf_path, "-o", out])
        assert rc == 0
        with wave.open(out, "rb") as w:
            assert w.getframerate() == 16000
            assert w.getnframes() > 0
