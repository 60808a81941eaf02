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

pytestmark = pytest.mark.slow  # model-zoo/parallel tier: excluded from `make smoke`

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
    return C.llava_from_hf(state, n_heads=4, max_seq=128,
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


class TestVLMRunner:
    @pytest.fixture(scope="class")
    def runner_parts(self, converted):
        from trackiellm_tpu.llm.runner import GenerationConfig
        from trackiellm_tpu.llm.vlm import VLMRunner
        llm_params, llm_cfg, clip_params, clip_cfg = converted

        def make():
            return VLMRunner(
                llm_params, llm_cfg, clip_params, clip_cfg,
                gen_config=GenerationConfig(
                    max_tokens=8, temperature=0.0, lookahead=2),
                cache_dtype=jnp.float32)
        return make

    def _ref_generate(self, converted, prompt_ids, feats, start, n_new):
        """Hand-rolled greedy loop: prefill(embeds) + decode_step."""
        import jax
        llm_params, llm_cfg, _, _ = converted
        bucket = 64
        padded = np.zeros(bucket, np.int32)
        padded[: len(prompt_ids)] = prompt_ids
        x = llm_model.embed_tokens(llm_params, jnp.asarray(padded))
        x = jax.lax.dynamic_update_slice(
            x, feats.astype(x.dtype), (start, 0))
        cache = llm_model.KVCache.create(llm_cfg, dtype=jnp.float32)
        logits, cache = llm_model.prefill(
            llm_params, llm_cfg, jnp.asarray(padded),
            jnp.int32(len(prompt_ids)), cache, embeds=x)
        out = []
        for _ in range(n_new):
            tid = int(np.argmax(np.asarray(logits)))
            out.append(tid)
            logits, cache = llm_model.decode_step(
                llm_params, llm_cfg, jnp.int32(tid), cache)
        return out

    def test_generate_matches_serial_reference(self, converted,
                                               runner_parts, oracle):
        from trackiellm_tpu.models import clip as clip_model
        _, px, *_ = oracle
        runner = runner_parts()
        img = px  # pre-normalized CHW pixel_values path
        text = runner.generate("hi <image> ok", images=[img])
        # Reconstruct the exact prompt ids the runner built.
        ids = runner.tokenizer.encode("hi ", add_bos=True)
        start = len(ids)
        ids += [VLM_FILLER] * N_IMG_TOKENS
        ids += runner.tokenizer.encode(" ok", add_bos=False)
        llm_params, llm_cfg, clip_params, clip_cfg = converted
        feats = clip_model.encode_and_project(
            clip_params, clip_cfg, jnp.asarray(px))
        ref_ids = self._ref_generate(converted, ids, feats, start, 8)
        eos = getattr(runner.tokenizer, "eos_id", None)
        if eos in ref_ids:
            ref_ids = ref_ids[: ref_ids.index(eos)]
        assert runner._generated_ids == ref_ids[: len(runner._generated_ids)]
        assert text == runner.tokenizer.decode(runner._generated_ids)

    def test_same_image_reuses_prefix(self, runner_parts, oracle):
        _, px, *_ = oracle
        runner = runner_parts()
        out1 = runner.generate("sys preamble " * 8 + "<image> q1",
                               images=[px])
        runs1 = list(runner._image_runs)
        out2 = runner.generate("sys preamble " * 8 + "<image> q1",
                               images=[px])
        assert runner._image_runs == runs1
        assert out1 == out2

    def test_different_image_rolls_back(self, runner_parts, oracle):
        """A different image at the same position must NOT reuse the
        cached image rows: output equals a fresh runner's."""
        _, px, *_ = oracle
        rng = np.random.default_rng(7)
        px2 = rng.normal(size=px.shape).astype(np.float32)
        prompt = "sys preamble " * 8 + "<image> q1"
        warm = runner_parts()
        warm.generate(prompt, images=[px])          # cache holds image A
        out_warm = warm.generate(prompt, images=[px2])
        fresh = runner_parts()
        out_fresh = fresh.generate(prompt, images=[px2])
        assert out_warm == out_fresh

    def test_text_only_after_image_turn(self, runner_parts, oracle):
        """A pure-text turn after a multimodal one must not match the
        filler rows of the committed image run."""
        _, px, *_ = oracle
        runner = runner_parts()
        runner.generate("abc <image> xyz", images=[px])
        out = runner.generate("abc plain text question")
        fresh = runner_parts()
        assert out == fresh.generate("abc plain text question")

    def test_marker_count_mismatch_raises(self, runner_parts, oracle):
        from trackiellm_tpu.utils.errors import TrackieError
        _, px, *_ = oracle
        runner = runner_parts()
        with pytest.raises(TrackieError):
            runner.generate("no marker here", images=[px])


VLM_FILLER = 0


class TestVLMCheckpoint:
    def test_vision_checkpoint_roundtrip(self, converted, tmp_path):
        from trackiellm_tpu.models.checkpoint import (load_checkpoint,
                                                      save_checkpoint)
        _, _, clip_params, clip_cfg = converted
        save_checkpoint(str(tmp_path / "vision"), clip_params,
                        config=clip_cfg, metadata={"source": "test"})
        p2, c2, meta = load_checkpoint(str(tmp_path / "vision"))
        assert c2 == clip_cfg
        rng = np.random.default_rng(3)
        px = jnp.asarray(rng.normal(size=(3, 16, 16)).astype(np.float32))
        a = np.asarray(clip_model.encode_and_project(clip_params,
                                                     clip_cfg, px))
        b = np.asarray(clip_model.encode_and_project(p2, c2, px))
        np.testing.assert_allclose(a, b, atol=0, rtol=0)

    def test_cli_convert_and_generate(self, oracle, tmp_path, capsys,
                                      monkeypatch):
        """`convert --family llava-hf` then `generate --image`."""
        from trackiellm_tpu import __main__ as cli
        state = oracle[0]
        np.savez(tmp_path / "llava_state.npz",
                 **{k: v for k, v in state.items()})
        out = str(tmp_path / "ckpt")
        rc = cli.main(["convert", str(tmp_path / "llava_state.npz"),
                       "-o", out, "--family", "llava-hf",
                       "--n-heads", "4", "--vision-n-heads", "4",
                       "--bits", "0"])
        assert rc == 0
        img = (np.random.default_rng(5)
               .integers(0, 255, (24, 32, 3)).astype(np.uint8))
        np.save(tmp_path / "frame.npy", img)
        rc = cli.main(["generate", out, "-p", "what is this? <image>",
                       "--max-tokens", "4", "--temperature", "0",
                       "--image", str(tmp_path / "frame.npy")])
        assert rc == 0


class TestCortexWithRealVLM:
    def test_cortex_turn_attaches_frame(self, converted):
        """Full integration: a REAL tiny VLMRunner behind the cortex
        with vlm_scene_image — the turn must commit an image run and
        produce a reply."""
        import time

        from trackiellm_tpu.cortex.main import Cortex, CortexConfig
        from trackiellm_tpu.llm.runner import GenerationConfig
        from trackiellm_tpu.llm.vlm import VLMRunner

        llm_params, llm_cfg, clip_params, clip_cfg = converted
        # The cortex prompt (system + tools + context + image) needs a
        # real window; the byte tokenizer is 1 token/char.
        runner = VLMRunner(
            llm_params, llm_cfg._replace(max_seq=2048), clip_params,
            clip_cfg,
            gen_config=GenerationConfig(max_tokens=4, temperature=0.0,
                                        lookahead=1),
            cache_dtype=jnp.float32)
        responses = []
        c = Cortex(llm_runner=runner,
                   config=CortexConfig(
                       vlm_scene_image=True,
                       system_prompt="s"),  # tiny window budget
                   on_response=responses.append)
        c.run()
        frame = (np.random.default_rng(2)
                 .integers(0, 255, (24, 32, 3)).astype(np.uint8))
        c.inject_video_frame(frame)
        c.inject_user_text("oi")
        deadline = time.monotonic() + 30
        while time.monotonic() < deadline and not responses:
            time.sleep(0.05)
        c.stop(timeout=5.0)
        assert responses, "no reply produced"
        assert runner._image_runs, "image run not committed to cache"


class TestMmprojGGUF:
    """llama.cpp "mmproj" vision GGUF ingestion (gguf_to_clip_params).

    The writer reproduces the mmproj packaging independently from the
    oracle's HF state dict: clip.cpp tensor names, blocks truncated at
    the LLaVA -2 feature tap (the surgery script drops the untapped
    tail), clip.vision.* metadata. Converted features must match the
    transformers oracle exactly — and the result must be immune to the
    historically unstable ffn_up/ffn_down naming (assigned by shape)."""

    def _write_mmproj(self, path, state, swap_ffn_names=False,
                      md_override=None, full_tower=False):
        from tests.test_loader import write_gguf
        from trackiellm_tpu.models import loader as L

        F32 = L.GGML_F32
        if any(k.startswith("model.vision_tower.") for k in state):
            vt = "model.vision_tower.vision_model."
            proj = "model.multi_modal_projector."
        else:
            vt = "vision_tower.vision_model."
            proj = "multi_modal_projector."
        A = lambda k: np.asarray(state[k], np.float32)  # noqa: E731

        n_layers = len({k[len(vt) + len("encoder.layers."):].split(".")[0]
                        for k in state
                        if k.startswith(vt + "encoder.layers.")})
        # Truncated packaging (-2 tap: the last block never ships) by
        # default; full_tower ships every block (newer converters).
        keep = n_layers if full_tower else n_layers - 1
        t = {
            "v.patch_embd.weight":
                (A(vt + "embeddings.patch_embedding.weight"), F32),
            "v.class_embd": (A(vt + "embeddings.class_embedding"), F32),
            "v.position_embd.weight":
                (A(vt + "embeddings.position_embedding.weight"), F32),
            "v.pre_ln.weight": (A(vt + "pre_layrnorm.weight"), F32),
            "v.pre_ln.bias": (A(vt + "pre_layrnorm.bias"), F32),
            "mm.0.weight": (A(proj + "linear_1.weight"), F32),
            "mm.0.bias": (A(proj + "linear_1.bias"), F32),
            "mm.2.weight": (A(proj + "linear_2.weight"), F32),
            "mm.2.bias": (A(proj + "linear_2.bias"), F32),
        }
        up, down = ("ffn_down", "ffn_up") if swap_ffn_names \
            else ("ffn_up", "ffn_down")
        for i in range(keep):
            pre = f"{vt}encoder.layers.{i}."
            b = f"v.blk.{i}."
            t[b + "ln1.weight"] = (A(pre + "layer_norm1.weight"), F32)
            t[b + "ln1.bias"] = (A(pre + "layer_norm1.bias"), F32)
            t[b + "ln2.weight"] = (A(pre + "layer_norm2.weight"), F32)
            t[b + "ln2.bias"] = (A(pre + "layer_norm2.bias"), F32)
            for theirs, hf in (("attn_q", "q_proj"), ("attn_k", "k_proj"),
                               ("attn_v", "v_proj"),
                               ("attn_out", "out_proj")):
                t[b + theirs + ".weight"] = (
                    A(pre + f"self_attn.{hf}.weight"), F32)
                t[b + theirs + ".bias"] = (
                    A(pre + f"self_attn.{hf}.bias"), F32)
            t[b + up + ".weight"] = (A(pre + "mlp.fc1.weight"), F32)
            t[b + up + ".bias"] = (A(pre + "mlp.fc1.bias"), F32)
            t[b + down + ".weight"] = (A(pre + "mlp.fc2.weight"), F32)
            t[b + down + ".bias"] = (A(pre + "mlp.fc2.bias"), F32)

        md = {
            "clip.has_vision_encoder": 1,
            "clip.has_llava_projector": 1,
            "clip.projector_type": "mlp",
            "clip.use_gelu": 0,  # quick_gelu
            "clip.vision.image_size": 16,
            "clip.vision.patch_size": 8,
            "clip.vision.embedding_length": 32,
            "clip.vision.feed_forward_length": 64,
            "clip.vision.block_count": keep,
            "clip.vision.attention.head_count": 4,
            "clip.vision.attention.layer_norm_epsilon": 1e-5,
            "clip.vision.projection_dim": 48,
        }
        md.update(md_override or {})
        write_gguf(path, t, md)

    def test_features_match_oracle(self, oracle, tmp_path):
        state, px, _, _, ref_feats, _ = oracle
        path = str(tmp_path / "mmproj.gguf")
        self._write_mmproj(path, state)
        cp, cc = C.gguf_to_clip_params(path)
        assert cc.n_layers == 2 and cc.feature_layer == 2
        assert cc.n_image_tokens == N_IMG_TOKENS
        assert cc.proj_dim == 48 and cc.act == "quick_gelu"
        ours = np.asarray(clip_model.encode_and_project(
            cp, cc, jnp.asarray(px)))
        np.testing.assert_allclose(ours, ref_feats, atol=2e-5, rtol=1e-4)

    def test_ffn_naming_convention_immune(self, oracle, tmp_path):
        state, px, *_ = oracle
        pa = str(tmp_path / "a.gguf")
        pb = str(tmp_path / "b.gguf")
        self._write_mmproj(pa, state, swap_ffn_names=False)
        self._write_mmproj(pb, state, swap_ffn_names=True)
        ca, cca = C.gguf_to_clip_params(pa)
        cb, ccb = C.gguf_to_clip_params(pb)
        fa = np.asarray(clip_model.encode_and_project(
            ca, cca, jnp.asarray(px)))
        fb = np.asarray(clip_model.encode_and_project(
            cb, ccb, jnp.asarray(px)))
        np.testing.assert_array_equal(fa, fb)

    def test_feature_layer_metadata_honored(self, oracle, tmp_path):
        """A full-tower mmproj (every block shipped) carrying
        clip.vision.feature_layer must tap at the SAME block as the
        truncated packaging — not silently run the extra block. Both
        metadata conventions: negative (HF vision_feature_layer=-2)
        and positive (hidden_states index)."""
        state, px, _, _, ref_feats, _ = oracle
        for fl in (-2, 2):
            path = str(tmp_path / f"full_{fl}.gguf")
            self._write_mmproj(path, state, full_tower=True,
                               md_override={
                                   "clip.vision.feature_layer": fl})
            cp, cc = C.gguf_to_clip_params(path)
            assert cc.n_layers == 3 and cc.feature_layer == 2, fl
            ours = np.asarray(clip_model.encode_and_project(
                cp, cc, jnp.asarray(px)))
            np.testing.assert_allclose(ours, ref_feats, atol=2e-5,
                                       rtol=1e-4)

    def test_geometry_mismatch_raises(self, oracle, tmp_path):
        from trackiellm_tpu.utils.errors import TrackieError

        state = oracle[0]
        path = str(tmp_path / "bad.gguf")
        self._write_mmproj(path, state,
                           md_override={"clip.vision.patch_size": 14})
        with pytest.raises(TrackieError, match="patch_size"):
            C.gguf_to_clip_params(path)

    def test_not_a_mmproj_raises(self, tmp_path):
        from tests.test_loader import write_gguf
        from trackiellm_tpu.utils.errors import TrackieError

        path = str(tmp_path / "text.gguf")
        write_gguf(path, {}, {"general.architecture": "llama"})
        with pytest.raises(TrackieError, match="mmproj"):
            C.gguf_to_clip_params(path)
