"""Topology-exactness test for the MiDaS-small depth model + converter.

Builds MidasNet_small in torch (exact transcription: tf_efficientnet_lite3
encoder with TF-SAME padding / ReLU6 / no SE, RefineNet decoder with
FeatureFusionBlock_custom and align_corners=True upsampling — the layout
the reference's ONNX checkpoint exports from, src/vision/tk_depth_midas.c:176),
randomizes it INCLUDING BN statistics, exports the state dict under the
published names ("pretrained.layer*", "scratch.*"), converts via
models.convert.midas_small_from_torch, and asserts the JAX forward
matches torch numerically.
"""

import math

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from trackiellm_tpu.models import convert
from trackiellm_tpu.models.depth import DepthConfig, depth_forward

pytestmark = pytest.mark.slow  # model-zoo/parallel tier: excluded from `make smoke`


# --- torch twin (test-side oracle) ----------------------------------------

class ConvSame(nn.Conv2d):
    """TF 'SAME' padding (timm Conv2dSame): asymmetric, extra on the
    bottom/right — identical to XLA SAME."""

    def forward(self, x):
        ih, iw = x.shape[-2:]
        kh, kw = self.kernel_size
        sh, sw = self.stride
        ph = max((math.ceil(ih / sh) - 1) * sh + kh - ih, 0)
        pw = max((math.ceil(iw / sw) - 1) * sw + kw - iw, 0)
        x = F.pad(x, [pw // 2, pw - pw // 2, ph // 2, ph - ph // 2])
        return F.conv2d(x, self.weight, self.bias, self.stride, 0,
                        self.dilation, self.groups)


def _bn(c):
    return nn.BatchNorm2d(c, eps=1e-3)


class TDS(nn.Module):
    """timm DepthwiseSeparableConv (lite: ReLU6, no SE, no pw act)."""

    def __init__(self, cin, cout, k):
        super().__init__()
        self.conv_dw = ConvSame(cin, cin, k, 1, groups=cin, bias=False)
        self.bn1 = _bn(cin)
        self.conv_pw = ConvSame(cin, cout, 1, bias=False)
        self.bn2 = _bn(cout)
        self.res = cin == cout

    def forward(self, x):
        y = F.relu6(self.bn1(self.conv_dw(x)))
        y = self.bn2(self.conv_pw(y))
        return x + y if self.res else y


class TIR(nn.Module):
    """timm InvertedResidual (lite)."""

    def __init__(self, cin, cout, k, s, e):
        super().__init__()
        mid = cin * e
        self.conv_pw = ConvSame(cin, mid, 1, bias=False)
        self.bn1 = _bn(mid)
        self.conv_dw = ConvSame(mid, mid, k, s, groups=mid, bias=False)
        self.bn2 = _bn(mid)
        self.conv_pwl = ConvSame(mid, cout, 1, bias=False)
        self.bn3 = _bn(cout)
        self.res = s == 1 and cin == cout

    def forward(self, x):
        y = F.relu6(self.bn1(self.conv_pw(x)))
        y = F.relu6(self.bn2(self.conv_dw(y)))
        y = self.bn3(self.conv_pwl(y))
        return x + y if self.res else y


class TRCU(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv1 = nn.Conv2d(c, c, 3, 1, 1, bias=True)
        self.conv2 = nn.Conv2d(c, c, 3, 1, 1, bias=True)

    def forward(self, x):
        out = self.conv1(F.relu(x))
        out = self.conv2(F.relu(out))
        return out + x


class TFusion(nn.Module):
    def __init__(self, c, out_c):
        super().__init__()
        self.resConfUnit1 = TRCU(c)
        self.resConfUnit2 = TRCU(c)
        self.out_conv = nn.Conv2d(c, out_c, 1, bias=True)

    def forward(self, x, skip=None):
        out = x
        if skip is not None:
            out = out + self.resConfUnit1(skip)
        out = self.resConfUnit2(out)
        out = F.interpolate(out, scale_factor=2, mode="bilinear",
                            align_corners=True)
        return self.out_conv(out)


class TUp2(nn.Module):
    def forward(self, x):
        return F.interpolate(x, scale_factor=2, mode="bilinear",
                             align_corners=False)


def _stage(cin, st):
    mods = []
    c = cin
    for j in range(st.repeats):
        s = st.stride if j == 0 else 1
        if st.expand == 1:
            mods.append(TDS(c, st.cout, st.kernel))
        else:
            mods.append(TIR(c, st.cout, st.kernel, s, st.expand))
        c = st.cout
    return nn.Sequential(*mods), c


class TMidasSmall(nn.Module):
    def __init__(self, cfg: DepthConfig):
        super().__init__()
        st = cfg.stages
        c = cfg.stem_ch
        stages = []
        for s in st:
            seq, c = _stage(c, s)
            stages.append(seq)

        pre = nn.Module()
        pre.layer1 = nn.Sequential(
            ConvSame(3, cfg.stem_ch, 3, 2, bias=False), _bn(cfg.stem_ch),
            nn.ReLU6(), stages[0], stages[1])
        pre.layer2 = nn.Sequential(stages[2])
        pre.layer3 = nn.Sequential(stages[3], stages[4])
        pre.layer4 = nn.Sequential(stages[5], stages[6])
        self.pretrained = pre

        f = cfg.features
        taps = cfg.tap_channels
        rn_out = (f, f * 2, f * 4, f * 8)
        sc = nn.Module()
        for k in range(4):
            setattr(sc, f"layer{k + 1}_rn",
                    nn.Conv2d(taps[k], rn_out[k], 3, 1, 1, bias=False))
        sc.refinenet4 = TFusion(rn_out[3], rn_out[3] // 2)
        sc.refinenet3 = TFusion(rn_out[2], rn_out[2] // 2)
        sc.refinenet2 = TFusion(rn_out[1], rn_out[1] // 2)
        sc.refinenet1 = TFusion(rn_out[0], f)
        sc.output_conv = nn.Sequential(
            nn.Conv2d(f, f // 2, 3, 1, 1), TUp2(),
            nn.Conv2d(f // 2, 32, 3, 1, 1), nn.ReLU(True),
            nn.Conv2d(32, 1, 1), nn.ReLU(True))
        self.scratch = sc

    def forward(self, x):
        l1 = self.pretrained.layer1(x)
        l2 = self.pretrained.layer2(l1)
        l3 = self.pretrained.layer3(l2)
        l4 = self.pretrained.layer4(l3)
        sc = self.scratch
        rn = [sc.layer1_rn(l1), sc.layer2_rn(l2), sc.layer3_rn(l3),
              sc.layer4_rn(l4)]
        p = sc.refinenet4(rn[3])
        p = sc.refinenet3(p, rn[2])
        p = sc.refinenet2(p, rn[1])
        p = sc.refinenet1(p, rn[0])
        return sc.output_conv(p).squeeze(1)


def _randomize_bn(module, gen):
    for m in module.modules():
        if isinstance(m, nn.BatchNorm2d):
            n = m.num_features
            m.weight.data = torch.rand(n, generator=gen) * 1.5 + 0.25
            m.bias.data = torch.randn(n, generator=gen) * 0.1
            m.running_mean = torch.randn(n, generator=gen) * 0.2
            m.running_var = torch.rand(n, generator=gen) * 1.5 + 0.25


class TestMidasConverter:
    def test_tiny_roundtrip_matches(self):
        cfg = DepthConfig.tiny()
        torch.manual_seed(0)
        gen = torch.Generator().manual_seed(0)
        model = TMidasSmall(cfg).eval()
        _randomize_bn(model, gen)
        state = {k: v.numpy() for k, v in model.state_dict().items()}

        params, inferred = convert.midas_small_from_torch(state)
        assert inferred._replace(img_size=cfg.img_size) == cfg

        img = np.random.RandomState(2).rand(
            3, cfg.img_size, cfg.img_size).astype(np.float32)
        with torch.no_grad():
            want = model(torch.from_numpy(img)[None])[0].numpy()
        got = np.asarray(depth_forward(params, cfg, jnp.asarray(img)))
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)

    def test_full_small_shapes_infer(self):
        """The converter must read the REAL midas_v21_small layout:
        synthesize the full-size state dict and check config inference
        (tap channels 32/48/136/384, features 64 — the published net)."""
        cfg = DepthConfig.small()
        model = TMidasSmall(cfg)
        state = {k: v.detach().numpy()
                 for k, v in model.state_dict().items()}
        inferred = convert.midas_config_from_torch(state)
        assert inferred.stem_ch == 32
        assert inferred.tap_channels == (32, 48, 136, 384)
        assert inferred.features == 64
        assert tuple(s.repeats for s in inferred.stages) == (
            1, 3, 3, 5, 5, 6, 1)
