"""PaliGemma (SigLIP + Gemma prefix-LM VLM) correctness against the
transformers oracle.

Three mechanisms under test, each load-bearing:

- the **SigLIP dialect** of the vision tower (no CLS, patch-conv bias,
  no pre-LN, POST-layernorm feature tap, tanh-GELU) — models/clip.py's
  config switches;
- the **feature scaling cancellation**: HF divides projected features
  by sqrt(text_dim) and Gemma's embedding normalizer multiplies them
  straight back — with the sqrt fold in tok_emb, the projector output
  injects UNSCALED;
- the **prefix-LM mask**: at inference the whole input prompt attends
  bidirectionally (modeling_paligemma._update_causal_mask) —
  models/llm.py prefill's ``bidir_len``.

Reference analogue: llama.cpp's gemma/paligemma mmproj path behind the
engine family the reference embeds.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from trackiellm_tpu.models import clip as clip_model
from trackiellm_tpu.models import convert as C
from trackiellm_tpu.models import llm as llm_model

pytestmark = pytest.mark.slow  # model-zoo/parallel tier: excluded from `make smoke`

IMG_TOKEN = 127
N_IMG = 4  # (16/8)^2 patches, no CLS


@pytest.fixture(scope="module")
def oracle():
    from transformers import (GemmaConfig, PaliGemmaConfig,
                              PaliGemmaForConditionalGeneration,
                              SiglipVisionConfig)

    vc = SiglipVisionConfig(
        hidden_size=32, image_size=16, patch_size=8,
        num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64, layer_norm_eps=1e-6,
        attention_dropout=0.0, hidden_act="gelu_pytorch_tanh")
    tc = GemmaConfig(
        vocab_size=128, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, head_dim=12,
        max_position_embeddings=128, rope_theta=10000.0,
        rms_norm_eps=1e-6, attention_dropout=0.0,
        tie_word_embeddings=False, pad_token_id=0)
    cfg = PaliGemmaConfig(vision_config=vc, text_config=tc,
                          image_token_index=IMG_TOKEN, projection_dim=48)
    torch.manual_seed(0)
    model = PaliGemmaForConditionalGeneration(cfg).eval()
    model.config.text_config._attn_implementation = "eager"
    gen = torch.Generator().manual_seed(1)
    px = torch.randn(1, 3, 16, 16, generator=gen)
    # PaliGemma convention: image tokens first, then BOS + text.
    ids = [*([IMG_TOKEN] * N_IMG), 2, 5, 9, 17]
    cont = [40, 41, 42]
    prompt = torch.tensor([ids])
    # IMPORTANT: a single HF forward over ids+cont would make the WHOLE
    # sequence bidirectional (the inference mask unmasks everything in
    # the pass) — the honest reference is prompt-forward + CACHED
    # single-token steps, which is exactly the generation semantics.
    with torch.no_grad():
        feats = model.get_image_features(pixel_values=px)
        out = model(input_ids=prompt, pixel_values=px,
                    attention_mask=torch.ones_like(prompt),
                    use_cache=True)
        refs = [out.logits[0, -1]]
        past = out.past_key_values
        total = len(ids)
        for t in cont:
            total += 1
            out = model(input_ids=torch.tensor([[t]]),
                        attention_mask=torch.ones((1, total),
                                                  dtype=torch.long),
                        past_key_values=past, use_cache=True)
            past = out.past_key_values
            refs.append(out.logits[0, -1])
    ref_logits = torch.stack(refs).numpy()  # (1 + len(cont), V)
    state = {k: v.numpy() for k, v in model.state_dict().items()}
    return (state, px[0].numpy(), np.asarray(ids), np.asarray(cont),
            feats[0].numpy(), ref_logits)


@pytest.fixture(scope="module")
def converted(oracle):
    return C.paligemma_from_hf(oracle[0], head_dim=12, max_seq=128,
                               vision_n_heads=4, dtype=jnp.float32)


class TestSigLIPTower:
    def test_projected_features_match_oracle(self, oracle, converted):
        _, px, _, _, ref_feats, _ = oracle
        _, _, cp, cc = converted
        assert cc.n_image_tokens == N_IMG
        assert not cc.use_cls and cc.patch_bias and cc.post_ln
        ours = np.asarray(clip_model.encode_and_project(
            cp, cc, jnp.asarray(px)))
        # HF divides by sqrt(text_dim); the converter injects unscaled
        # (the Gemma normalizer cancellation) — compare to the
        # re-scaled oracle features.
        np.testing.assert_allclose(
            ours / np.sqrt(48.0), ref_feats, atol=2e-5, rtol=1e-4)

    def test_post_ln_is_load_bearing(self, oracle, converted):
        _, px, *_ , ref_feats, _ = oracle
        _, _, cp, cc = converted
        cc_raw = clip_model.CLIPVisionConfig(
            **{**cc.__dict__, "post_ln": False})
        ours = np.asarray(clip_model.encode_and_project(
            cp, cc_raw, jnp.asarray(px)))
        assert np.abs(ours / np.sqrt(48.0) - ref_feats).max() > 1e-3


class TestPrefixLM:
    def _spliced(self, converted, oracle, bucket=16):
        import jax
        llm_params, _, cp, cc = converted
        _, px, ids, _, _, _ = oracle
        feats = clip_model.encode_and_project(cp, cc, jnp.asarray(px))
        padded = np.zeros(bucket, np.int32)
        padded[: len(ids)] = ids
        x = llm_model.embed_tokens(llm_params, jnp.asarray(padded))
        x = jax.lax.dynamic_update_slice(x, feats.astype(x.dtype),
                                         (0, 0))
        return x, padded

    def test_bidir_prefill_and_decode_match_oracle(self, oracle,
                                                   converted):
        llm_params, llm_cfg, _, _ = converted
        _, _, ids, cont, _, ref = oracle
        embeds, padded = self._spliced(converted, oracle)
        cache = llm_model.KVCache.create(llm_cfg, dtype=jnp.float32)
        logits, cache = llm_model.prefill(
            llm_params, llm_cfg, jnp.asarray(padded),
            jnp.int32(len(ids)), cache, embeds=embeds,
            bidir_len=jnp.int32(len(ids)))
        np.testing.assert_allclose(np.asarray(logits), ref[0],
                                   atol=3e-4, rtol=1e-3)
        for j, tid in enumerate(cont):
            logits, cache = llm_model.decode_step(
                llm_params, llm_cfg, jnp.int32(int(tid)), cache)
            np.testing.assert_allclose(
                np.asarray(logits), ref[1 + j],
                atol=3e-4, rtol=1e-3)

    def test_bidir_mask_is_load_bearing(self, oracle, converted):
        """A causal-only prefill must diverge: early prompt positions
        can no longer see later ones."""
        llm_params, llm_cfg, _, _ = converted
        _, _, ids, _, _, ref = oracle
        embeds, padded = self._spliced(converted, oracle)
        cache = llm_model.KVCache.create(llm_cfg, dtype=jnp.float32)
        logits, _ = llm_model.prefill(
            llm_params, llm_cfg, jnp.asarray(padded),
            jnp.int32(len(ids)), cache, embeds=embeds)
        assert np.abs(np.asarray(logits) - ref[0]).max() > 1e-3


class TestPrefixLMRunner:
    def test_generate_matches_hf_generate(self, oracle, converted):
        from transformers import (GemmaConfig, PaliGemmaConfig,
                                  PaliGemmaForConditionalGeneration,
                                  SiglipVisionConfig)

        from trackiellm_tpu.llm.runner import GenerationConfig
        from trackiellm_tpu.llm.vlm import VLMRunner

        state, px, ids, _, _, _ = oracle
        llm_params, llm_cfg, cp, cc = converted

        vc = SiglipVisionConfig(
            hidden_size=32, image_size=16, patch_size=8,
            num_hidden_layers=2, num_attention_heads=4,
            intermediate_size=64, layer_norm_eps=1e-6,
            hidden_act="gelu_pytorch_tanh")
        tc = GemmaConfig(
            vocab_size=128, hidden_size=48, intermediate_size=96,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, head_dim=12, rms_norm_eps=1e-6,
            tie_word_embeddings=False, pad_token_id=0)
        torch.manual_seed(0)
        model = PaliGemmaForConditionalGeneration(PaliGemmaConfig(
            vision_config=vc, text_config=tc,
            image_token_index=IMG_TOKEN, projection_dim=48)).eval()
        full = torch.tensor([list(map(int, ids))])
        with torch.no_grad():
            out = model.generate(
                input_ids=full, pixel_values=torch.from_numpy(px)[None],
                attention_mask=torch.ones_like(full),
                max_new_tokens=6, do_sample=False)
        ref_cont = out[0, len(ids):].tolist()

        class IdTok:
            eos_id = 1
            def encode(self, text, add_bos=True):
                return ([] if not text.strip()
                        else [int(x) for x in text.split()])
            def decode(self, toks):
                return " ".join(str(i) for i in toks)
            def decode_token(self, tid):
                return f" {tid}"

        runner = VLMRunner(
            llm_params, llm_cfg, cp, cc, tokenizer=IdTok(),
            gen_config=GenerationConfig(max_tokens=6, temperature=0.0,
                                        lookahead=2),
            cache_dtype=jnp.float32, prefix_lm=True)
        text_ids = " ".join(str(int(t)) for t in ids[N_IMG:])
        runner.generate(f"<image>{text_ids}", images=[px])
        got = runner._generated_ids
        if 1 in ref_cont:
            ref_cont = ref_cont[: ref_cont.index(1)]
        assert got == ref_cont
