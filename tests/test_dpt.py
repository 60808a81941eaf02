"""Oracle-exactness tests for the DPT-SwinV2 depth family.

The oracle is ``transformers.DPTForDepthEstimation`` with a ``Swinv2``
backbone — the exact class that loads the published
Intel/dpt-swinv2-tiny-256 checkpoint (= MiDaS 3.1 dpt_swin2_tiny_256,
the reference's depth model: src/vision/tk_depth_midas.c:176,
src/cortex/tk_cortex_main.h:70-76). A randomized tiny config exercises
clamped windows (stage res < window), shifted and unshifted blocks,
every patch merge, the CPB bias path, the fusion pyramid and the head.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from trackiellm_tpu.models import convert
from trackiellm_tpu.models import dpt as dpt_mod
from trackiellm_tpu.models.dpt import (
    DPTSwinConfig, dpt_forward, init_dpt, swin_features,
)

pytestmark = pytest.mark.slow  # model-zoo/parallel tier: excluded from `make smoke`


def _oracle(seed=0):
    from transformers import DPTConfig, DPTForDepthEstimation, Swinv2Config

    # depths[1]=6 exercises the stacked-pair lax.scan stage (shifted
    # blocks inside the scan: stage2 res 8 > window 4); the others the
    # unrolled path and the res<=window clamp.
    backbone = Swinv2Config(
        image_size=64, patch_size=4, embed_dim=16,
        depths=[2, 6, 2, 2], num_heads=[2, 2, 4, 4], window_size=4,
        mlp_ratio=4.0, drop_path_rate=0.0, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0, use_absolute_embeddings=False,
        out_features=["stage1", "stage2", "stage3", "stage4"],
    )
    cfg = DPTConfig(
        backbone_config=backbone, is_hybrid=False,
        fusion_hidden_size=32, neck_hidden_sizes=[16, 32, 64, 128],
        add_projection=False,
    )
    torch.manual_seed(seed)
    model = DPTForDepthEstimation(cfg).eval()
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn_like(p) * 0.2)
    return model


@pytest.fixture(scope="module")
def oracle_pair():
    model = _oracle()
    state = {k: v.numpy() for k, v in model.state_dict().items()}
    params, cfg = convert.dpt_swinv2_from_torch(
        state, image_size=64, window_size=4)
    return model, params, cfg


class TestDPTSwinV2:
    def test_config_derivation(self, oracle_pair):
        _, _, cfg = oracle_pair
        assert cfg.embed_dim == 16
        assert cfg.depths == (2, 6, 2, 2)
        assert cfg.num_heads == (2, 2, 4, 4)
        assert cfg.stage_dims == (16, 32, 64, 128)
        assert cfg.fusion_hidden == 32
        assert cfg.mlp_ratio == 4.0

    def test_forward_matches_oracle(self, oracle_pair):
        model, params, cfg = oracle_pair
        rng = np.random.default_rng(1)
        img = rng.standard_normal((3, 64, 64), np.float32)
        with torch.no_grad():
            want = model(torch.from_numpy(img)[None]
                         ).predicted_depth[0].numpy()
        got = np.asarray(dpt_forward(params, cfg, jnp.asarray(img)))
        assert got.shape == want.shape == (64, 64)
        scale = max(float(np.abs(want).max()), 1e-3)
        np.testing.assert_allclose(got, want, rtol=2e-3,
                                   atol=2e-3 * scale)

    def test_backbone_features_match_oracle(self, oracle_pair):
        """Per-stage feature maps (before downsampling) match the HF
        backbone — catches converter/window errors at the stage where
        they happen, not after the fusion pyramid mixes them."""
        model, params, cfg = oracle_pair
        rng = np.random.default_rng(2)
        img = rng.standard_normal((3, 64, 64), np.float32)
        with torch.no_grad():
            maps = model.backbone(torch.from_numpy(img)[None]).feature_maps
        feats = swin_features(params, cfg,
                              jnp.transpose(jnp.asarray(img),
                                            (1, 2, 0))[None])
        assert len(feats) == len(maps) == 4
        for got, want in zip(feats, maps):
            want = want[0].numpy().transpose(1, 2, 0)  # CHW -> HWC
            scale = max(float(np.abs(want).max()), 1e-3)
            np.testing.assert_allclose(np.asarray(got[0]), want,
                                       rtol=2e-3, atol=2e-3 * scale)

    def test_shifted_windows_load_bearing(self, oracle_pair,
                                          monkeypatch):
        """Forcing shift=0 everywhere must change the backbone output —
        proves the cyclic-shift + mask path actually runs."""
        model, params, cfg = oracle_pair
        rng = np.random.default_rng(3)
        img = jnp.asarray(rng.standard_normal((3, 64, 64), np.float32))
        x = jnp.transpose(img, (1, 2, 0))[None]
        base = swin_features(params, cfg, x)[-1]
        real_geom = dpt_mod._win_geometry
        monkeypatch.setattr(
            dpt_mod, "_win_geometry",
            lambda res, window, shift: (real_geom(res, window, shift)[0],
                                        0))
        unshifted = swin_features(params, cfg, x)[-1]
        assert not np.allclose(np.asarray(base), np.asarray(unshifted),
                               atol=1e-5)

    def test_init_shapes_match_converted(self, oracle_pair):
        """init_dpt produces the same tree structure/shapes the
        converter emits (so random-weight latency measurements use the
        real topology)."""
        _, params, cfg = oracle_pair
        fresh = init_dpt(jax.random.PRNGKey(0), cfg)
        flat_a = jax.tree_util.tree_leaves_with_path(params)
        flat_b = {jax.tree_util.keystr(k): v.shape for k, v in
                  jax.tree_util.tree_leaves_with_path(fresh)}
        for k, v in flat_a:
            ks = jax.tree_util.keystr(k)
            if v is None:
                continue
            assert ks in flat_b, ks
            assert flat_b[ks] == v.shape, (ks, flat_b[ks], v.shape)

    def test_metric_contract(self, oracle_pair):
        _, params, cfg = oracle_pair
        rng = np.random.default_rng(4)
        img = jnp.asarray(rng.standard_normal((3, 64, 64), np.float32))
        rel = dpt_forward(params, cfg, img)
        assert float(jnp.min(rel)) >= 0.0  # head ends in ReLU
        metric = dpt_mod.relative_to_metric(rel, 0.3, 10.0)
        assert 0.3 - 1e-5 <= float(jnp.min(metric))
        assert float(jnp.max(metric)) <= 10.0 + 1e-5


class TestDPTInPipeline:
    def test_pipeline_depth_path(self, oracle_pair):
        """DPT-SwinV2 drives VisionPipeline's depth analysis end to end
        (depth_preproc='dpt' selects the 0.5/0.5 stats at the config's
        depth_input resolution)."""
        from trackiellm_tpu.vision.pipeline import (
            AnalysisFlags, VisionConfig, VisionPipeline,
        )

        _, params, cfg = oracle_pair

        def detector_fn(chw):
            # Raw (boxes, per-class scores) in letterbox space — the
            # pipeline runs its own NMS (same contract test_vision uses).
            return (jnp.zeros((16, 4), jnp.float32),
                    jnp.zeros((16, 80), jnp.float32))

        pipe = VisionPipeline(
            detector_fn=detector_fn,
            depth_fn=lambda chw: dpt_forward(params, cfg, chw),
            config=VisionConfig(depth_input=cfg.image_size,
                                depth_preproc="dpt"),
        )
        frame = (np.random.default_rng(0)
                 .integers(0, 255, (120, 160, 3)).astype(np.uint8))
        res = pipe.process_frame(
            frame, AnalysisFlags.DETECTION | AnalysisFlags.DEPTH)
        assert res.valid_analyses & AnalysisFlags.DEPTH
        assert res.depth_map_m.shape == (cfg.image_size, cfg.image_size)
        assert float(res.depth_map_m.min()) >= 0.3 - 1e-5
        assert float(res.depth_map_m.max()) <= 10.0 + 1e-5
