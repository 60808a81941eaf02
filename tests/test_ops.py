"""Ops layer tests: quant matmul, attention, NMS, mel, resample,
preprocess, point cloud, image ops.

Pallas kernels run in interpreter mode on the CPU test mesh; numerics are
checked against XLA oracle implementations (the same oracles double as the
CPU dispatch path in production).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from trackiellm_tpu.ops import attention as attn
from trackiellm_tpu.ops import image as im
from trackiellm_tpu.ops import quant
from trackiellm_tpu.ops.mel import log_mel_spectrogram, mel_filterbank
from trackiellm_tpu.ops.nms import (
    Detections,
    boxes_to_original,
    decode_and_nms,
    nms_fixed,
    pairwise_iou,
)
from trackiellm_tpu.ops.pointcloud import (
    depth_to_point_cloud,
    points_to_height_grid,
    rotate_points,
)
from trackiellm_tpu.ops.preprocess import (
    imagenet_normalize_chw,
    letterbox_preprocess,
)
from trackiellm_tpu.ops.resample import resample_poly
from trackiellm_tpu.ops import tensor as T


class TestQuant:
    @pytest.mark.parametrize("group", [128, 256])
    def test_q8_roundtrip_error(self, rng, group):
        w = jax.random.normal(rng, (512, 256))
        qw = quant.quantize_q8(w, group=group)
        w2 = quant.dequantize(qw)
        # int8 symmetric quant: relative error ~ 1/127 of group absmax
        err = jnp.max(jnp.abs(w - w2))
        assert err < jnp.max(jnp.abs(w)) / 100

    def test_q4_roundtrip_error(self, rng):
        w = jax.random.normal(rng, (512, 256))
        qw = quant.quantize_q4(w, group=128)
        w2 = quant.dequantize(qw)
        err = jnp.max(jnp.abs(w - w2))
        assert err < jnp.max(jnp.abs(w)) / 10  # 4-bit: coarser

    def test_q8_pallas_matches_xla(self, rng):
        k1, k2 = jax.random.split(rng)
        x = jax.random.normal(k1, (8, 512))
        w = jax.random.normal(k2, (512, 256))
        qw = quant.quantize_q8(w, group=128)
        ref = quant.quantized_matmul_xla(x, qw)
        out = quant.q8_matmul_pallas(
            x, qw.values, qw.scales, tile_n=128, tile_k=256, interpret=True
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-4)

    def test_q4_pallas_matches_xla(self, rng):
        k1, k2 = jax.random.split(rng)
        x = jax.random.normal(k1, (8, 512))
        w = jax.random.normal(k2, (512, 256))
        qw = quant.quantize_q4(w, group=128)
        ref = quant.quantized_matmul_xla(x, qw)
        out = quant.q4_matmul_pallas(
            x, qw.values, qw.scales, tile_n=128, tile_k=128, interpret=True
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-4)

    def test_dispatch_front_end(self, rng):
        k1, k2 = jax.random.split(rng)
        x = jax.random.normal(k1, (3, 4, 512))  # leading dims collapse
        w = jax.random.normal(k2, (512, 256))
        qw = quant.quantize_q8(w)
        out = quant.quantized_matmul(x, qw)
        assert out.shape == (3, 4, 256)
        ref = x.reshape(-1, 512) @ quant.dequantize(qw)
        np.testing.assert_allclose(
            np.asarray(out.reshape(-1, 256)), np.asarray(ref), atol=1e-3
        )


class TestAttention:
    def test_flash_matches_xla_causal(self, rng):
        kq, kk, kv = jax.random.split(rng, 3)
        h, s, d = 4, 512, 64
        q = jax.random.normal(kq, (h, s, d), jnp.float32)
        k = jax.random.normal(kk, (h, s, d), jnp.float32)
        v = jax.random.normal(kv, (h, s, d), jnp.float32)
        ref = attn.attention_xla(q, k, v, causal=True)
        out = attn.flash_attention(q, k, v, causal=True,
                                   block_q=128, block_k=128, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)

    def test_flash_gqa(self, rng):
        kq, kk, kv = jax.random.split(rng, 3)
        h, hk, s, d = 8, 2, 256, 64
        q = jax.random.normal(kq, (h, s, d), jnp.float32)
        k = jax.random.normal(kk, (hk, s, d), jnp.float32)
        v = jax.random.normal(kv, (hk, s, d), jnp.float32)
        ref = attn.attention_xla(q, k, v, causal=True)
        out = attn.flash_attention(q, k, v, causal=True,
                                   block_q=128, block_k=128, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)

    def test_flash_non_causal(self, rng):
        kq, kk, kv = jax.random.split(rng, 3)
        h, s, d = 2, 256, 64
        q = jax.random.normal(kq, (h, s, d), jnp.float32)
        k = jax.random.normal(kk, (h, s, d), jnp.float32)
        v = jax.random.normal(kv, (h, s, d), jnp.float32)
        ref = attn.attention_xla(q, k, v, causal=False)
        out = attn.flash_attention(q, k, v, causal=False,
                                   block_q=128, block_k=128, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)

    def test_decode_matches_full_attention(self, rng):
        kq, kk, kv = jax.random.split(rng, 3)
        h, hk, d, s_max, cur = 8, 2, 64, 128, 37
        q = jax.random.normal(kq, (h, d))
        k_cache = jax.random.normal(kk, (s_max, hk, d))
        v_cache = jax.random.normal(kv, (s_max, hk, d))
        out = attn.decode_attention(q, k_cache, v_cache, jnp.int32(cur))
        # Oracle: full attention with the query as the last of `cur` tokens.
        ref = attn.attention_xla(
            q[:, None, :],
            k_cache[:cur].transpose(1, 0, 2),
            v_cache[:cur].transpose(1, 0, 2),
            causal=True,
        )[:, 0, :]
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)

    def test_paged_decode_matches_contiguous(self, rng):
        kq, kk, kv = jax.random.split(rng, 3)
        h, hk, d = 4, 2, 32
        n_pages, page_size = 16, 16
        k_pool = jax.random.normal(kk, (n_pages, page_size, hk, d))
        v_pool = jax.random.normal(kv, (n_pages, page_size, hk, d))
        q = jax.random.normal(kq, (h, d))
        table = jnp.array([3, 7, 1, 0], jnp.int32)
        cur = jnp.int32(50)
        out = attn.paged_decode_attention(q, k_pool, v_pool, table, cur)
        k_seq = k_pool[table].reshape(-1, hk, d)
        v_seq = v_pool[table].reshape(-1, hk, d)
        ref = attn.decode_attention(q, k_seq, v_seq, cur)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


class TestNMS:
    def test_pairwise_iou(self):
        a = jnp.array([[0, 0, 10, 10]], jnp.float32)
        b = jnp.array([[0, 0, 10, 10], [5, 5, 15, 15], [20, 20, 30, 30]],
                      jnp.float32)
        iou = pairwise_iou(a, b)
        np.testing.assert_allclose(
            np.asarray(iou[0]), [1.0, 25.0 / 175.0, 0.0], atol=1e-6
        )

    def test_nms_suppresses_overlaps(self):
        boxes = jnp.array(
            [[0, 0, 10, 10], [1, 1, 11, 11], [20, 20, 30, 30], [0, 0, 0, 0]],
            jnp.float32,
        )
        scores = jnp.array([0.9, 0.8, 0.7, 0.0])
        det = nms_fixed(boxes, scores, iou_thresh=0.5, max_out=4)
        assert int(det.valid.sum()) == 2
        np.testing.assert_allclose(np.asarray(det.scores[:2]), [0.9, 0.7])

    def test_decode_and_nms_classes(self):
        # Two same-position boxes of different classes both survive
        # class-aware NMS.
        boxes = jnp.array([[0, 0, 10, 10], [0, 0, 10, 10]], jnp.float32)
        scores = jnp.zeros((2, 3)).at[0, 1].set(0.9).at[1, 2].set(0.8)
        det = decode_and_nms(boxes, scores, score_thresh=0.5,
                             pre_topk=2, max_out=4)
        assert int(det.valid.sum()) == 2
        assert set(np.asarray(det.classes[det.valid]).tolist()) == {1, 2}

    def test_class_agnostic(self):
        boxes = jnp.array([[0, 0, 10, 10], [0, 0, 10, 10]], jnp.float32)
        scores = jnp.zeros((2, 3)).at[0, 1].set(0.9).at[1, 2].set(0.8)
        det = decode_and_nms(boxes, scores, score_thresh=0.5, pre_topk=2,
                             max_out=4, class_aware=False)
        assert int(det.valid.sum()) == 1

    def test_boxes_to_original(self):
        meta = jnp.array([0.5, 10.0, 20.0])  # scale, pad_x, pad_y
        boxes = jnp.array([[10.0, 20.0, 60.0, 70.0]])
        orig = boxes_to_original(boxes, meta)
        np.testing.assert_allclose(np.asarray(orig[0]), [0, 0, 100, 100])


class TestMel:
    def test_shapes_and_range(self):
        sr = 16000
        t = np.arange(sr, dtype=np.float32) / sr
        audio = jnp.asarray(0.5 * np.sin(2 * np.pi * 440.0 * t))
        mel = log_mel_spectrogram(audio)
        assert mel.shape == (80, sr // 160)
        assert jnp.all(jnp.isfinite(mel))

    def test_tone_hits_right_mel_bin(self):
        sr = 16000
        t = np.arange(sr, dtype=np.float32) / sr
        for freq in (300.0, 1000.0, 3000.0):
            audio = jnp.asarray(np.sin(2 * np.pi * freq * t).astype(np.float32))
            mel = np.asarray(log_mel_spectrogram(audio))
            mean_spec = mel.mean(axis=1)
            peak_bin = int(mean_spec.argmax())
            # Find which mel bin the tone frequency falls into.
            fb = mel_filterbank()
            freqs = np.linspace(0, sr / 2, fb.shape[0])
            expected_bin = int(fb[np.argmin(np.abs(freqs - freq))].argmax())
            assert abs(peak_bin - expected_bin) <= 1

    def test_silence(self):
        mel = log_mel_spectrogram(jnp.zeros(16000))
        assert jnp.all(jnp.isfinite(mel))


class TestResample:
    def test_downsample_preserves_tone(self):
        sr_in, sr_out = 48000, 16000
        t = np.arange(sr_in, dtype=np.float64) / sr_in
        audio = jnp.asarray(np.sin(2 * np.pi * 440.0 * t).astype(np.float32))
        out = resample_poly(audio, 1, 3)
        assert out.shape[0] == sr_out
        # Dominant DFT bin should still be 440 Hz.
        spec = np.abs(np.fft.rfft(np.asarray(out[1000:9000]) *
                                  np.hanning(8000)))
        peak_hz = spec.argmax() * sr_out / 8000
        assert abs(peak_hz - 440.0) < 5.0

    def test_upsample_length(self):
        out = resample_poly(jnp.ones(1600), 3, 1)
        assert out.shape[0] == 4800

    def test_identity(self):
        x = jnp.arange(100.0)
        np.testing.assert_array_equal(np.asarray(resample_poly(x, 2, 2)),
                                      np.asarray(x))


class TestPreprocess:
    def test_letterbox_shapes_and_meta(self):
        img = jnp.zeros((480, 640, 3), jnp.uint8)
        chw, meta = letterbox_preprocess(img, 640, 640)
        assert chw.shape == (3, 640, 640)
        scale, pad_x, pad_y = np.asarray(meta)
        assert scale == pytest.approx(1.0)
        assert pad_x == 0 and pad_y == 80

    def test_letterbox_pad_value(self):
        img = jnp.full((100, 200, 3), 255, jnp.uint8)
        chw, meta = letterbox_preprocess(img, 640, 640)
        # Top padding row must be the grey fill.
        assert np.asarray(chw)[0, 0, 0] == pytest.approx(114.0 / 255.0, abs=1e-5)
        # Interior must be the (white) image.
        assert np.asarray(chw)[0, 320, 320] == pytest.approx(1.0, abs=1e-5)

    def test_imagenet_normalize(self):
        img = jnp.full((100, 100, 3), 128, jnp.uint8)
        chw = imagenet_normalize_chw(img, 64, 64)
        assert chw.shape == (3, 64, 64)
        expected = (128 / 255 - 0.485) / 0.229
        assert np.asarray(chw)[0, 32, 32] == pytest.approx(expected, abs=1e-4)


class TestPointCloud:
    def test_unprojection(self):
        depth = jnp.full((4, 4), 2.0)
        pts = depth_to_point_cloud(depth, fx=2.0, fy=2.0, cx=2.0, cy=2.0)
        assert pts.shape == (16, 3)
        # Pixel (0,0): X = (0-2)*2/2 = -2, Y = -2, Z = 2
        np.testing.assert_allclose(np.asarray(pts[0]), [-2, -2, 2])

    def test_invalid_depth_zeroed(self):
        depth = jnp.zeros((2, 2))
        pts = depth_to_point_cloud(depth, 1.0, 1.0, 1.0, 1.0)
        np.testing.assert_array_equal(np.asarray(pts), 0)

    def test_rotate_identity(self, rng):
        pts = jax.random.normal(rng, (10, 3))
        out = rotate_points(pts, jnp.array([1.0, 0, 0, 0]))
        np.testing.assert_allclose(np.asarray(out), np.asarray(pts), atol=1e-6)

    def test_height_grid(self):
        # One point 1 m up (camera Y down => y = -1), 2 m ahead, centered.
        pts = jnp.array([[0.0, -1.0, 2.0]])
        heights, counts = points_to_height_grid(pts, grid_w=8, grid_d=8,
                                                cell_m=1.0)
        assert int(counts.sum()) == 1
        assert heights[2, 4] == pytest.approx(1.0)


class TestImageOps:
    def test_gaussian_blur_preserves_mean(self, rng):
        img = jax.random.uniform(rng, (32, 32))
        out = im.gaussian_blur(img, sigma=1.0)
        assert out.shape == img.shape
        assert float(jnp.abs(out.mean() - img.mean())) < 0.01

    def test_sobel_edge(self):
        img = jnp.zeros((16, 16)).at[:, 8:].set(1.0)
        gx, gy, mag = im.sobel(img)
        assert float(jnp.abs(gx[8, 7])) > 1.0  # strong vertical edge
        assert float(jnp.abs(gy[8, 7])) < 1e-5

    def test_morphology(self):
        img = jnp.zeros((9, 9)).at[4, 4].set(1.0)
        d = im.dilate(img, 3)
        assert float(d.sum()) == 9.0
        e = im.erode(d, 3)
        assert float(e[4, 4]) == 1.0 and float(e.sum()) == 1.0

    def test_histogram_equalization(self, rng):
        img = jax.random.uniform(rng, (64, 64)) * 0.1  # low-contrast
        out = im.equalize_histogram(img)
        assert float(out.max()) > 0.9  # stretched to full range

    def test_rgb_to_gray(self):
        img = jnp.ones((4, 4, 3))
        np.testing.assert_allclose(np.asarray(im.rgb_to_gray(img)), 1.0,
                                   atol=1e-6)

    def test_rgb_to_hsv_red(self):
        img = jnp.zeros((1, 1, 3)).at[0, 0, 0].set(1.0)
        hsv = np.asarray(im.rgb_to_hsv(img))[0, 0]
        assert hsv[0] == pytest.approx(0.0)      # hue red
        assert hsv[1] == pytest.approx(1.0)      # full saturation
        assert hsv[2] == pytest.approx(1.0)      # value

    def test_harris_corner(self):
        img = jnp.zeros((32, 32)).at[8:, 8:].set(1.0)
        resp = im.harris_corners(img)
        # Response at the corner should dominate flat regions.
        assert float(resp[8, 8]) > float(resp[20, 20]) + 1e-4

    def test_bilateral_preserves_edge(self):
        img = jnp.zeros((16, 16)).at[:, 8:].set(1.0)
        out = im.bilateral_filter(img, sigma_space=2.0, sigma_color=0.05,
                                  radius=2)
        assert float(out[8, 4]) < 0.1 and float(out[8, 12]) > 0.9


class TestTensorOps:
    def test_matmul_blocked_matches(self, rng):
        k1, k2 = jax.random.split(rng)
        a = jax.random.normal(k1, (16, 1000))
        b = jax.random.normal(k2, (1000, 32))
        ref = np.asarray(a) @ np.asarray(b)
        out = T.matmul_blocked(a, b, block=256)
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-3)

    def test_norms(self, rng):
        x = jax.random.normal(rng, (4, 64))
        ln = T.layer_norm(x, jnp.ones(64), jnp.zeros(64))
        np.testing.assert_allclose(np.asarray(ln.mean(-1)), 0, atol=1e-5)
        rn = T.rms_norm(x, jnp.ones(64))
        ms = float(jnp.mean(jnp.square(rn), axis=-1).mean())
        assert ms == pytest.approx(1.0, abs=0.05)

    def test_pooling(self):
        x = jnp.arange(16.0).reshape(1, 1, 4, 4)
        mp = T.max_pool2d(x, 2, 2)
        assert mp.shape == (1, 1, 2, 2)
        assert float(mp[0, 0, 0, 0]) == 5.0


class TestSlidingWindow:
    def test_xla_window_masks_old_tokens(self, rng):
        kq, kk, kv = jax.random.split(rng, 3)
        h, s, d, w = 2, 32, 16, 8
        q = jax.random.normal(kq, (h, s, d))
        k = jax.random.normal(kk, (h, s, d))
        v = jax.random.normal(kv, (h, s, d))
        out = attn.attention_xla(q, k, v, causal=True, window=w)
        # Oracle: per-query full attention over its window slice.
        for qi in (10, 31):
            lo = max(qi - w + 1, 0)
            ref = attn.attention_xla(
                q[:, qi:qi + 1], k[:, lo:qi + 1], v[:, lo:qi + 1],
                causal=True)
            np.testing.assert_allclose(np.asarray(out[:, qi]),
                                       np.asarray(ref[:, 0]),
                                       rtol=1e-4, atol=1e-4)

    def test_flash_window_matches_xla(self, rng):
        kq, kk, kv = jax.random.split(rng, 3)
        h, s, d, w = 2, 512, 32, 192
        q = jax.random.normal(kq, (h, s, d), jnp.float32)
        k = jax.random.normal(kk, (h, s, d), jnp.float32)
        v = jax.random.normal(kv, (h, s, d), jnp.float32)
        ref = attn.attention_xla(q, k, v, causal=True, window=w)
        out = attn.flash_attention(q, k, v, causal=True, window=w,
                                   block_q=128, block_k=128, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)

    def test_decode_window(self, rng):
        kq, kk, kv = jax.random.split(rng, 3)
        h, hk, d, s_max, cur, w = 4, 2, 16, 64, 40, 12
        q = jax.random.normal(kq, (h, d))
        kc = jax.random.normal(kk, (s_max, hk, d))
        vc = jax.random.normal(kv, (s_max, hk, d))
        out = attn.decode_attention(q, kc, vc, jnp.int32(cur), window=w)
        # Oracle: contiguous attention over the last w cache entries.
        ref = attn.decode_attention(q, kc[cur - w:cur], vc[cur - w:cur],
                                    jnp.int32(w))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)


class TestQ4StreamKernel:
    def test_v2_matches_oracle(self, rng):
        k1, k2 = jax.random.split(rng)
        x = jax.random.normal(k1, (8, 1024))
        w = jax.random.normal(k2, (1024, 512))
        qw = quant.quantize_q4(w, group=128)
        ref = quant.quantized_matmul_xla(x, qw)
        out = quant.q4_matmul_pallas_v2(x, qw.values, qw.scales,
                                        tile_n=256, tile_k=128,
                                        interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-4)


class TestQ4Int8Kernel:
    def test_i8_matches_oracle_within_a8_error(self, rng):
        """W4A8 adds activation-quantization error on top of the W4
        oracle — bounded, small relative error rather than exactness."""
        k1, k2 = jax.random.split(rng)
        x = jax.random.normal(k1, (8, 1024))
        w = jax.random.normal(k2, (1024, 512))
        qw = quant.quantize_q4(w, group=256)
        ref = np.asarray(quant.quantized_matmul_xla(x, qw))
        out = np.asarray(quant.q4_matmul_pallas_i8(
            x, qw.values, qw.scales, tile_n=256, tile_k=256,
            interpret=True))
        rel = np.linalg.norm(out - ref) / np.linalg.norm(ref)
        assert rel < 0.02, rel

    def test_activation_quantization_identities(self, rng):
        x = jax.random.normal(rng, (4, 512))
        xq, sx, sxsum = quant.quantize_activations_q8(x, group=128)
        assert xq.dtype == jnp.int8 and sx.shape == (4, 4)
        # sxsum is exactly sx * sum(x_i8) per group (the bias-fold term)
        manual = sx * np.asarray(
            xq.astype(jnp.int32).reshape(4, 4, 128).sum(axis=2))
        np.testing.assert_allclose(np.asarray(sxsum), manual, rtol=1e-6)
        # dequantized activations track the originals
        deq = np.asarray(xq, np.float32).reshape(4, 4, 128) \
            * np.asarray(sx)[:, :, None]
        np.testing.assert_allclose(deq.reshape(4, 512), np.asarray(x),
                                   atol=np.abs(x).max() / 100)
