"""LLaVA multimodal correctness against the transformers oracle.

A tiny random-weight ``LlavaForConditionalGeneration`` is ground truth:
the CLIP ViT tower's ``vision_feature_layer=-2`` hidden states (CLS
dropped) are projected into LLM space and spliced over the image
placeholder positions of the prompt. The rebuild implements the tower
in models/clip.py (scan over stacked layers, static slice for the
feature tap) and injects the spliced embeddings through
``models.llm.prefill/extend(embeds=...)``. Reference analogue:
llama.cpp's clip/llava "mmproj" path behind the engine family the
reference embeds (src/ai_models/tk_model_loader.c:199).
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from trackiellm_tpu.models import clip as clip_model
from trackiellm_tpu.models import convert as C
from trackiellm_tpu.models import llm as llm_model

IMG_TOKEN = 127
N_IMG_TOKENS = 4  # (16/8)^2 patches, CLS dropped


@pytest.fixture(scope="module")
def oracle():
    from transformers import (CLIPVisionConfig, LlamaConfig, LlavaConfig,
                              LlavaForConditionalGeneration)

    vc = CLIPVisionConfig(
        hidden_size=32, image_size=16, patch_size=8, num_hidden_layers=3,
        num_attention_heads=4, intermediate_size=64,
        hidden_act="quick_gelu", layer_norm_eps=1e-5,
        attention_dropout=0.0)
    tc = LlamaConfig(
        vocab_size=128, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rope_theta=10000.0,
        rms_norm_eps=1e-5, attention_dropout=0.0,
        tie_word_embeddings=False, pad_token_id=0)
    cfg = LlavaConfig(
        vision_config=vc, text_config=tc, image_token_index=IMG_TOKEN,
        vision_feature_layer=-2, vision_feature_select_strategy="default",
        projector_hidden_act="gelu")
    torch.manual_seed(0)
    model = LlavaForConditionalGeneration(cfg).eval()
    model.config._attn_implementation = "eager"
    gen = torch.Generator().manual_seed(1)
    px = torch.randn(1, 3, 16, 16, generator=gen)
    # prompt: text, image run, text tail
    ids = [1, 5, *([IMG_TOKEN] * N_IMG_TOKENS), 9, 17, 33]
    cont = [40, 41, 42]  # decode continuation ground truth
    full = torch.tensor([ids + cont])
    with torch.no_grad():
        feats = model.get_image_features(pixel_values=px)
        ref_logits = model(input_ids=full, pixel_values=px).logits[0]
    state = {k: v.numpy() for k, v in model.state_dict().items()}
    return (state, px[0].numpy(), np.asarray(ids), np.asarray(cont),
            feats[0].numpy(), ref_logits.numpy())


@pytest.fixture(scope="module")
def converted(oracle):
    state = oracle[0]
    return C.llava_from_hf(state, n_heads=4, max_seq=64,
                           rope_theta=10000.0, norm_eps=1e-5,
                           vision_n_heads=4, dtype=jnp.float32)


class TestVisionTower:
    def test_image_features_match_oracle(self, oracle, converted):
        _, px, _, _, ref_feats, _ = oracle
        _, _, clip_params, clip_cfg = converted
        assert clip_cfg.n_image_tokens == N_IMG_TOKENS
        ours = np.asarray(clip_model.encode_and_project(
            clip_params, clip_cfg, jnp.asarray(px)))
        np.testing.assert_allclose(ours, ref_feats, atol=2e-5, rtol=1e-4)

    def test_feature_layer_is_load_bearing(self, oracle):
        """Tapping the LAST layer (-1) must diverge from the oracle's
        -2 tap — proves the static layer slice is real."""
        state, px, *_ , ref_feats, _ = oracle
        _, _, cp, cc = C.llava_from_hf(
            state, n_heads=4, vision_n_heads=4, feature_layer=-1,
            dtype=jnp.float32)
        ours = np.asarray(clip_model.encode_and_project(
            cp, cc, jnp.asarray(px)))
        assert np.abs(ours - ref_feats).max() > 1e-3

    def test_cls_drop_is_load_bearing(self, oracle):
        state, px, *_ = oracle
        _, _, cp, cc = C.llava_from_hf(
            state, n_heads=4, vision_n_heads=4, drop_cls=False,
            dtype=jnp.float32)
        assert cc.n_image_tokens == N_IMG_TOKENS + 1
        ours = np.asarray(clip_model.encode_image(cp, cc, jnp.asarray(px)))
        assert ours.shape[0] == N_IMG_TOKENS + 1


class TestSplicedLM:
    def _spliced_embeds(self, converted, oracle, bucket):
        llm_params, _, clip_params, clip_cfg = converted
        _, px, ids, _, _, _ = oracle
        feats = clip_model.encode_and_project(
            clip_params, clip_cfg, jnp.asarray(px))
        padded = np.zeros(bucket, np.int32)
        padded[: len(ids)] = ids
        x = llm_model.embed_tokens(llm_params, jnp.asarray(padded))
        start = int(np.argmax(ids == IMG_TOKEN))
        import jax
        x = jax.lax.dynamic_update_slice(
            x, feats.astype(x.dtype), (start, 0))
        return x, padded

    def test_prefill_and_decode_match_oracle(self, oracle, converted):
        llm_params, llm_cfg, _, _ = converted
        _, _, ids, cont, _, ref_logits = oracle
        bucket = 16
        embeds, padded = self._spliced_embeds(converted, oracle, bucket)
        cache = llm_model.KVCache.create(llm_cfg, dtype=jnp.float32)
        logits, cache = llm_model.prefill(
            llm_params, llm_cfg, jnp.asarray(padded),
            jnp.int32(len(ids)), cache, embeds=embeds)
        np.testing.assert_allclose(
            np.asarray(logits), ref_logits[len(ids) - 1],
            atol=3e-4, rtol=1e-3)
        # Greedy continuation over ground-truth next tokens: validates
        # rope positions downstream of the image run.
        for j, tid in enumerate(cont):
            logits, cache = llm_model.decode_step(
                llm_params, llm_cfg, jnp.int32(tid), cache)
            np.testing.assert_allclose(
                np.asarray(logits), ref_logits[len(ids) + j],
                atol=3e-4, rtol=1e-3)

    def test_extend_embeds_matches_prefill(self, oracle, converted):
        """Chunked multimodal ingestion (extend path) == one prefill."""
        llm_params, llm_cfg, clip_params, clip_cfg = converted
        _, px, ids, _, _, ref_logits = oracle
        feats = clip_model.encode_and_project(
            clip_params, clip_cfg, jnp.asarray(px))
        import jax
        cache = llm_model.KVCache.create(llm_cfg, dtype=jnp.float32)
        # chunk 1: first 4 tokens (text + half the image run)
        # chunk 2: the rest — the image run straddles the boundary.
        split = 4
        start = int(np.argmax(ids == IMG_TOKEN))
        logits = None
        for lo, hi in ((0, split), (split, len(ids))):
            chunk = np.zeros(8, np.int32)
            chunk[: hi - lo] = ids[lo:hi]
            x = llm_model.embed_tokens(llm_params, jnp.asarray(chunk))
            # overlap of [start, start+N) with [lo, hi)
            a = max(start, lo)
            b = min(start + N_IMG_TOKENS, hi)
            if a < b:
                x = jax.lax.dynamic_update_slice(
                    x, feats[a - start: b - start].astype(x.dtype),
                    (a - lo, 0))
            logits, cache = llm_model.extend(
                llm_params, llm_cfg, jnp.asarray(chunk),
                jnp.int32(hi - lo), cache, embeds=x)
        np.testing.assert_allclose(
            np.asarray(logits), ref_logits[len(ids) - 1],
            atol=3e-4, rtol=1e-3)

    def test_image_content_is_load_bearing(self, oracle, converted):
        """Zeroed image features must change the last-token logits."""
        llm_params, llm_cfg, _, _ = converted
        _, _, ids, _, _, ref_logits = oracle
        bucket = 16
        padded = np.zeros(bucket, np.int32)
        padded[: len(ids)] = ids
        cache = llm_model.KVCache.create(llm_cfg, dtype=jnp.float32)
        logits, _ = llm_model.prefill(
            llm_params, llm_cfg, jnp.asarray(padded),
            jnp.int32(len(ids)), cache)  # no embeds: raw placeholder rows
        assert np.abs(np.asarray(logits) - ref_logits[len(ids) - 1]).max() \
            > 1e-3
