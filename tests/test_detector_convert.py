"""Topology-exactness test for the YOLOv8 detector + weight converter.

Builds the ultralytics-v8 architecture in torch (an exact transcription
of Conv/Bottleneck/C2f/SPPF/Detect from the published model zoo — the
same layout the reference's ONNX checkpoint exports from,
src/vision/tk_object_detector.c:83), random-initializes it INCLUDING
BN statistics, exports the state dict under ultralytics names
("model.<idx>..."), converts via models.convert.detector_from_torch,
and asserts the JAX forward matches the torch forward numerically.
"""

import math

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from trackiellm_tpu.models import convert
from trackiellm_tpu.models.detector import (
    DetectorConfig,
    detector_forward,
)

pytestmark = pytest.mark.slow  # model-zoo/parallel tier: excluded from `make smoke`


# --- ultralytics transcription (test-side oracle) -------------------------

class TConv(nn.Module):
    def __init__(self, c1, c2, k=1, s=1, p=None):
        super().__init__()
        self.conv = nn.Conv2d(c1, c2, k, s,
                              k // 2 if p is None else p, bias=False)
        self.bn = nn.BatchNorm2d(c2, eps=1e-3, momentum=0.03)
        self.act = nn.SiLU()

    def forward(self, x):
        return self.act(self.bn(self.conv(x)))


class TBottleneck(nn.Module):
    def __init__(self, c, shortcut=True):
        super().__init__()
        self.cv1 = TConv(c, c, 3)
        self.cv2 = TConv(c, c, 3)
        self.add = shortcut

    def forward(self, x):
        y = self.cv2(self.cv1(x))
        return x + y if self.add else y


class TC2f(nn.Module):
    def __init__(self, c1, c2, n=1, shortcut=False):
        super().__init__()
        self.c = c2 // 2
        self.cv1 = TConv(c1, 2 * self.c, 1)
        self.cv2 = TConv((2 + n) * self.c, c2, 1)
        self.m = nn.ModuleList(TBottleneck(self.c, shortcut)
                               for _ in range(n))

    def forward(self, x):
        y = list(self.cv1(x).chunk(2, 1))
        y.extend(m(y[-1]) for m in self.m)
        return self.cv2(torch.cat(y, 1))


class TSPPF(nn.Module):
    def __init__(self, c1, c2, k=5):
        super().__init__()
        c_ = c1 // 2
        self.cv1 = TConv(c1, c_, 1)
        self.cv2 = TConv(c_ * 4, c2, 1)
        self.m = nn.MaxPool2d(kernel_size=k, stride=1, padding=k // 2)

    def forward(self, x):
        y = [self.cv1(x)]
        y.extend(self.m(y[-1]) for _ in range(3))
        return self.cv2(torch.cat(y, 1))


class TV8(nn.Module):
    """Full v8 graph under a `model` ModuleList so the state dict uses
    ultralytics names model.0 ... model.22."""

    def __init__(self, cfg: DetectorConfig):
        super().__init__()
        ch = cfg.channels
        d = cfg.depths
        c2, c3 = cfg.head_box_ch, cfg.head_cls_ch
        self.cfg = cfg

        def detect_branch(c_in, mid, c_out):
            return nn.Sequential(TConv(c_in, mid, 3), TConv(mid, mid, 3),
                                 nn.Conv2d(mid, c_out, 1))

        detect = nn.Module()
        detect.cv2 = nn.ModuleList(
            detect_branch(c, c2, 4 * cfg.reg_max)
            for c in (ch[2], ch[3], ch[4]))
        detect.cv3 = nn.ModuleList(
            detect_branch(c, c3, cfg.num_classes)
            for c in (ch[2], ch[3], ch[4]))

        self.model = nn.ModuleList([
            TConv(3, ch[0], 3, 2),                      # 0
            TConv(ch[0], ch[1], 3, 2),                  # 1
            TC2f(ch[1], ch[1], d[0], True),             # 2
            TConv(ch[1], ch[2], 3, 2),                  # 3
            TC2f(ch[2], ch[2], d[1], True),             # 4
            TConv(ch[2], ch[3], 3, 2),                  # 5
            TC2f(ch[3], ch[3], d[2], True),             # 6
            TConv(ch[3], ch[4], 3, 2),                  # 7
            TC2f(ch[4], ch[4], d[3], True),             # 8
            TSPPF(ch[4], ch[4]),                        # 9
            nn.Upsample(scale_factor=2, mode="nearest"),  # 10
            nn.Identity(),                              # 11 concat
            TC2f(ch[4] + ch[3], ch[3], d[0], False),    # 12
            nn.Upsample(scale_factor=2, mode="nearest"),  # 13
            nn.Identity(),                              # 14 concat
            TC2f(ch[3] + ch[2], ch[2], d[0], False),    # 15
            TConv(ch[2], ch[2], 3, 2),                  # 16
            nn.Identity(),                              # 17 concat
            TC2f(ch[2] + ch[3], ch[3], d[0], False),    # 18
            TConv(ch[3], ch[3], 3, 2),                  # 19
            nn.Identity(),                              # 20 concat
            TC2f(ch[3] + ch[4], ch[4], d[0], False),    # 21
            detect,                                     # 22
        ])

    def forward(self, x):
        m = self.model
        x = m[0](x)
        x = m[2](m[1](x))
        p3 = m[4](m[3](x))
        p4 = m[6](m[5](p3))
        p5 = m[9](m[8](m[7](p4)))
        u4 = m[12](torch.cat([m[10](p5), p4], 1))
        u3 = m[15](torch.cat([m[13](u4), p3], 1))
        d4 = m[18](torch.cat([m[16](u3), u4], 1))
        d5 = m[21](torch.cat([m[19](d4), p5], 1))
        det = m[22]
        outs = []
        for i, feat in enumerate((u3, d4, d5)):
            outs.append((det.cv2[i](feat), det.cv3[i](feat)))
        return outs

    def decode(self, outs):
        """DFL decode, transcribed from ultralytics Detect.inference."""
        cfg = self.cfg
        boxes, cls = [], []
        for (box_raw, cls_raw), stride in zip(outs, (8, 16, 32)):
            _, _, h, w = box_raw.shape
            dist = (box_raw.permute(0, 2, 3, 1)
                    .reshape(h * w, 4, cfg.reg_max))
            bins = torch.arange(cfg.reg_max, dtype=torch.float32)
            ltrb = (dist.softmax(-1) * bins).sum(-1)
            ys, xs = torch.meshgrid(
                torch.arange(h, dtype=torch.float32) + 0.5,
                torch.arange(w, dtype=torch.float32) + 0.5,
                indexing="ij")
            centers = torch.stack([xs.reshape(-1), ys.reshape(-1)], -1)
            xy1 = (centers - ltrb[:, :2]) * stride
            xy2 = (centers + ltrb[:, 2:]) * stride
            boxes.append(torch.cat([xy1, xy2], -1))
            cls.append(cls_raw.permute(0, 2, 3, 1)
                       .reshape(h * w, cfg.num_classes).sigmoid())
        return torch.cat(boxes, 0), torch.cat(cls, 0)


class TBottleneckV5(nn.Module):
    """v5 Bottleneck (inside C3): cv1 is 1x1, cv2 3x3."""

    def __init__(self, c, shortcut=True):
        super().__init__()
        self.cv1 = TConv(c, c, 1)
        self.cv2 = TConv(c, c, 3)
        self.add = shortcut

    def forward(self, x):
        y = self.cv2(self.cv1(x))
        return x + y if self.add else y


class TC3(nn.Module):
    def __init__(self, c1, c2, n=1, shortcut=True):
        super().__init__()
        c_ = c2 // 2
        self.cv1 = TConv(c1, c_, 1)
        self.cv2 = TConv(c1, c_, 1)
        self.cv3 = TConv(2 * c_, c2, 1)
        self.m = nn.Sequential(*(TBottleneckV5(c_, shortcut)
                                 for _ in range(n)))

    def forward(self, x):
        return self.cv3(torch.cat([self.m(self.cv1(x)),
                                   self.cv2(x)], 1))


class TV5(nn.Module):
    """YOLOv5u graph under `model` so the state dict uses the yaml
    module indices model.0 ... model.24 (Detect at 24)."""

    def __init__(self, cfg: DetectorConfig):
        super().__init__()
        ch = cfg.channels
        d = cfg.depths
        c2, c3 = cfg.head_box_ch, cfg.head_cls_ch
        self.cfg = cfg

        def detect_branch(c_in, mid, c_out):
            return nn.Sequential(TConv(c_in, mid, 3), TConv(mid, mid, 3),
                                 nn.Conv2d(mid, c_out, 1))

        detect = nn.Module()
        detect.cv2 = nn.ModuleList(
            detect_branch(c, c2, 4 * cfg.reg_max)
            for c in (ch[2], ch[3], ch[4]))
        detect.cv3 = nn.ModuleList(
            detect_branch(c, c3, cfg.num_classes)
            for c in (ch[2], ch[3], ch[4]))

        self.model = nn.ModuleList([
            TConv(3, ch[0], 6, 2, 2),                   # 0 (6x6, p=2)
            TConv(ch[0], ch[1], 3, 2),                  # 1
            TC3(ch[1], ch[1], d[0]),                    # 2
            TConv(ch[1], ch[2], 3, 2),                  # 3
            TC3(ch[2], ch[2], d[1]),                    # 4
            TConv(ch[2], ch[3], 3, 2),                  # 5
            TC3(ch[3], ch[3], d[2]),                    # 6
            TConv(ch[3], ch[4], 3, 2),                  # 7
            TC3(ch[4], ch[4], d[3]),                    # 8
            TSPPF(ch[4], ch[4]),                        # 9
            TConv(ch[4], ch[3], 1),                     # 10
            nn.Upsample(scale_factor=2, mode="nearest"),  # 11
            nn.Identity(),                              # 12 concat
            TC3(2 * ch[3], ch[3], d[0], False),         # 13
            TConv(ch[3], ch[2], 1),                     # 14
            nn.Upsample(scale_factor=2, mode="nearest"),  # 15
            nn.Identity(),                              # 16 concat
            TC3(2 * ch[2], ch[2], d[0], False),         # 17
            TConv(ch[2], ch[2], 3, 2),                  # 18
            nn.Identity(),                              # 19 concat
            TC3(2 * ch[2], ch[3], d[0], False),         # 20
            TConv(ch[3], ch[3], 3, 2),                  # 21
            nn.Identity(),                              # 22 concat
            TC3(2 * ch[3], ch[4], d[0], False),         # 23
            detect,                                     # 24
        ])

    def forward(self, x):
        m = self.model
        x = m[0](x)
        x = m[2](m[1](x))
        p3 = m[4](m[3](x))
        p4 = m[6](m[5](p3))
        p5 = m[9](m[8](m[7](p4)))
        t5 = m[10](p5)
        u4 = m[13](torch.cat([m[11](t5), p4], 1))
        t4 = m[14](u4)
        u3 = m[17](torch.cat([m[15](t4), p3], 1))
        d4 = m[20](torch.cat([m[18](u3), t4], 1))
        d5 = m[23](torch.cat([m[21](d4), t5], 1))
        det = m[24]
        return [(det.cv2[i](feat), det.cv3[i](feat))
                for i, feat in enumerate((u3, d4, d5))]

    decode = TV8.decode  # same anchor-free u-head decode


def _randomize_bn(module: nn.Module, gen: torch.Generator) -> None:
    """Give every BN layer non-trivial statistics so the folding in the
    converter is actually exercised."""
    for m in module.modules():
        if isinstance(m, nn.BatchNorm2d):
            n = m.num_features
            m.weight.data = torch.rand(n, generator=gen) * 1.5 + 0.25
            m.bias.data = torch.randn(n, generator=gen) * 0.1
            m.running_mean = torch.randn(n, generator=gen) * 0.2
            m.running_var = torch.rand(n, generator=gen) * 1.5 + 0.25


@pytest.fixture(scope="module")
def twin():
    cfg = DetectorConfig.tiny()
    gen = torch.Generator().manual_seed(0)
    torch.manual_seed(0)
    model = TV8(cfg).eval()
    _randomize_bn(model, gen)
    return cfg, model


class TestDetectorConverter:
    def test_state_dict_converts_and_matches(self, twin):
        cfg, model = twin
        state = {k: v.numpy() for k, v in model.state_dict().items()}
        params, inferred = convert.detector_from_torch(state)
        # img_size is not derivable from weights (fully convolutional).
        assert inferred._replace(img_size=cfg.img_size) == cfg

        img = np.random.RandomState(1).rand(
            3, cfg.img_size, cfg.img_size).astype(np.float32)
        with torch.no_grad():
            t_boxes, t_cls = model.decode(
                model(torch.from_numpy(img)[None]))
        j_boxes, j_cls = detector_forward(
            jax.tree.map(lambda a: a.astype(jnp.float32), params),
            cfg, jnp.asarray(img))
        np.testing.assert_allclose(np.asarray(j_boxes), t_boxes.numpy(),
                                   rtol=2e-3, atol=2e-3)
        np.testing.assert_allclose(np.asarray(j_cls), t_cls.numpy(),
                                   rtol=2e-3, atol=2e-3)

    def test_v5nu_state_dict_converts_and_matches(self):
        """The v5 variant (reference's exact YOLOv5nu family): torch
        twin with C3 blocks / 6x6 stem / v5 neck converts and matches
        the JAX forward numerically, variant auto-detected."""
        cfg = DetectorConfig.tiny_v5()
        gen = torch.Generator().manual_seed(3)
        torch.manual_seed(3)
        model = TV5(cfg).eval()
        _randomize_bn(model, gen)
        state = {k: v.numpy() for k, v in model.state_dict().items()}
        params, inferred = convert.detector_from_torch(state)
        assert inferred.variant == "v5"
        assert inferred._replace(img_size=cfg.img_size) == cfg

        img = np.random.RandomState(4).rand(
            3, cfg.img_size, cfg.img_size).astype(np.float32)
        with torch.no_grad():
            t_boxes, t_cls = model.decode(
                model(torch.from_numpy(img)[None]))
        j_boxes, j_cls = detector_forward(
            jax.tree.map(lambda a: a.astype(jnp.float32), params),
            cfg, jnp.asarray(img))
        np.testing.assert_allclose(np.asarray(j_boxes), t_boxes.numpy(),
                                   rtol=2e-3, atol=2e-3)
        np.testing.assert_allclose(np.asarray(j_cls), t_cls.numpy(),
                                   rtol=2e-3, atol=2e-3)

    def test_config_inference_full_v5nu_shapes(self):
        """Synthesize the REAL v5nu layout (full widths/depths) and
        check config inference end-to-end."""
        cfg = DetectorConfig.v5nu()
        model = TV5(cfg)
        state = {k: v.detach().numpy()
                 for k, v in model.state_dict().items()}
        inferred = convert.detector_config_from_torch(state)
        assert inferred.variant == "v5"
        assert inferred.channels == (16, 32, 64, 128, 256)
        assert inferred.depths == (1, 2, 3, 1)
        assert inferred.num_classes == 80
        assert inferred.reg_max == 16

    def test_v5_init_forward_shapes(self):
        """init_detector(v5) forward produces the same anchor layout as
        v8 (A, 4)/(A, nc) — the vision pipeline and NMS are variant-
        agnostic."""
        from trackiellm_tpu.models.detector import init_detector

        cfg = DetectorConfig.tiny_v5()
        params = init_detector(jax.random.PRNGKey(0), cfg)
        img = jnp.zeros((3, cfg.img_size, cfg.img_size), jnp.float32)
        boxes, cls = detector_forward(params, cfg, img)
        s = cfg.img_size
        n_anchors = (s // 8) ** 2 + (s // 16) ** 2 + (s // 32) ** 2
        assert boxes.shape == (n_anchors, 4)
        assert cls.shape == (n_anchors, cfg.num_classes)

    def test_config_inference_full_v8n_shapes(self):
        """The converter must read the REAL v8n layout: synthesize a
        state dict with v8n's exact shapes and check config inference."""
        cfg = DetectorConfig.v8n()
        model = TV8(cfg)
        state = {k: v.detach().numpy()
                 for k, v in model.state_dict().items()}
        inferred = convert.detector_config_from_torch(state)
        assert inferred.channels == (16, 32, 64, 128, 256)
        assert inferred.depths == (1, 2, 2, 1)
        assert inferred.num_classes == 80
        assert inferred.reg_max == 16
        assert inferred.head_box_ch == 64   # max(16, 64//4, 64)
        assert inferred.head_cls_ch == 80   # max(64, min(80, 100))
