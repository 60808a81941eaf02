"""The accuracy-parity harness (tools/parity_*.py) must be TURNKEY:
one command against real checkpoint paths produces the metric; a
missing file fails with a clear message (VERDICT round-2 item 3).

Real checkpoints don't exist in this zero-egress environment, so the
turnkey property is proven with synthetic checkpoints: each tool runs
as a subprocess against files written by the test, and self-parity
(comparing a model's output against itself) must score perfectly —
exactly what a correct harness reports the day real files appear.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, expect_ok=True):
    """Missing-file probes run as real subprocesses (they exit before
    jax loads, so they stay fast even under the axon TPU plugin)."""
    env = dict(os.environ)
    proc = subprocess.run(
        [sys.executable, *args], cwd=REPO, env=env,
        capture_output=True, text=True, timeout=600)
    if expect_ok and proc.returncode != 0:
        raise AssertionError(
            f"exit {proc.returncode}\nstdout: {proc.stdout}\n"
            f"stderr: {proc.stderr[-3000:]}")
    return proc


def _run_main(tool_module, args, capsys):
    """Self-parity runs execute the tool's main() in-process so the
    conftest's CPU pin applies (a subprocess would inherit the axon TPU
    platform and pay relay compiles)."""
    import importlib

    mod = importlib.import_module(tool_module)
    old = sys.argv
    sys.argv = [tool_module, *args]
    try:
        mod.main()
    finally:
        sys.argv = old
    out = capsys.readouterr().out
    return json.loads(out.strip().splitlines()[-1])


class TestMissingFilesFailInformatively:
    @pytest.mark.parametrize("tool,args", [
        ("tools/parity_detector.py",
         ["--checkpoint", "/nope/yolo.pt", "--images", "/nope/imgs"]),
        ("tools/parity_asr.py",
         ["--checkpoint", "/nope/whisper.pt", "--audio", "/nope/a",
          "--refs", "/nope/refs.tsv"]),
        ("tools/parity_llm.py",
         ["--gguf", "/nope/model.gguf", "--transcript", "/nope/t.json"]),
    ])
    def test_missing_checkpoint(self, tool, args):
        proc = _run([tool, *args], expect_ok=False)
        assert proc.returncode == 2
        assert "not found" in proc.stderr


class TestDetectorParity:
    def test_self_parity_map_is_1(self, tmp_path, capsys):
        # A tiny synthetic detector in the torch layout the converter
        # ingests, written as npz (the .pt path shares load_state_dict).
        sys.path.insert(0, REPO)
        from tests.test_detector_convert import TV8, _randomize_bn
        import torch

        from trackiellm_tpu.models.detector import DetectorConfig

        cfg = DetectorConfig.tiny()
        torch.manual_seed(3)
        model = TV8(cfg).eval()
        _randomize_bn(model, torch.Generator().manual_seed(3))
        state = {k: v.detach().numpy() for k, v in model.state_dict().items()}
        ckpt = str(tmp_path / "det.npz")
        np.savez(ckpt, **state)

        from PIL import Image

        img = np.random.default_rng(0).integers(
            0, 255, (96, 128, 3), dtype=np.uint8)
        img_path = str(tmp_path / "scene.png")
        Image.fromarray(img).save(img_path)

        # Random weights give arbitrary confidence ranges; probe the
        # model's own max class prob and set the threshold below it so
        # the dump is guaranteed non-empty.
        import jax.numpy as jnp

        from trackiellm_tpu.models.convert import detector_from_torch
        from trackiellm_tpu.models.detector import detector_forward
        from trackiellm_tpu.ops.preprocess import letterbox_preprocess

        params, pcfg = detector_from_torch(state)
        chw, _ = letterbox_preprocess(jnp.asarray(img), cfg.img_size,
                                      cfg.img_size)
        _, cls_probs = detector_forward(params, pcfg, chw)
        conf = float(cls_probs.max()) * 0.8
        assert conf > 0

        # Pass 1: dump detections (no --expected).
        dump = _run_main("tools.parity_detector",
                         ["--checkpoint", ckpt, "--images", img_path,
                          "--conf", str(conf), "--input-size",
                          str(cfg.img_size), "--no-record"], capsys)
        dets = dump["detections"]["scene.png"]
        assert dets, f"no boxes at probed conf {conf}"

        # Pass 2: self-parity — expected == its own detections.
        expected = {"scene.png": [{"box": d["box"], "cls": d["cls"]}
                                  for d in dets]}
        exp_path = str(tmp_path / "expected.json")
        with open(exp_path, "w") as f:
            json.dump(expected, f)
        result = _run_main("tools.parity_detector",
                           ["--checkpoint", ckpt, "--images", img_path,
                            "--conf", str(conf), "--input-size",
                            str(cfg.img_size), "--expected", exp_path,
                            "--no-record"], capsys)
        assert result["mAP@0.50"] == pytest.approx(1.0)


class TestLLMParity:
    def test_self_parity_token_match_is_1(self, tmp_path, capsys):
        sys.path.insert(0, REPO)
        from tests.test_convert import _make_gguf

        import jax.numpy ### noqa — ensures jax configured by conftest
        from trackiellm_tpu.llm.runner import GenerationConfig, LLMRunner
        from trackiellm_tpu.llm.tokenizer import ByteTokenizer
        from trackiellm_tpu.models.convert import gguf_to_llm_params

        gguf_path = str(tmp_path / "tiny.gguf")
        _make_gguf(gguf_path, seed=11)
        params, cfg = gguf_to_llm_params(gguf_path, bits=None)
        runner = LLMRunner(params, cfg, ByteTokenizer(cfg.vocab_size),
                           GenerationConfig(max_tokens=16, temperature=0.0))
        runner.generate("ola mundo")
        transcript = {"prompt": "ola mundo",
                      "tokens": list(runner._generated_ids)}
        tr_path = str(tmp_path / "transcript.json")
        with open(tr_path, "w") as f:
            json.dump(transcript, f)

        result = _run_main("tools.parity_llm",
                           ["--gguf", gguf_path, "--transcript", tr_path,
                            "--quantize", "0", "--no-record"], capsys)
        assert result["match_rate"] == pytest.approx(1.0)
        assert result["exact_prefix"] == len(transcript["tokens"])


class TestASRParity:
    def test_self_parity_wer_is_0(self, tmp_path, capsys):
        sys.path.insert(0, REPO)
        import jax

        from trackiellm_tpu.audio.asr import WhisperASR
        from trackiellm_tpu.models import whisper as whisper_model
        from trackiellm_tpu.models.convert import (
            whisper_config_from_torch, whisper_from_torch)

        # Build a whisper-shape torch state dict via the inverse mapping
        # helper the converter roundtrip test uses.
        from tests.test_convert import TestWhisperFromTorch

        cfg_w = whisper_model.WhisperConfig.test()
        ref = whisper_model.init_whisper(jax.random.PRNGKey(5), cfg_w)
        state = TestWhisperFromTorch()._to_torch_state(ref, cfg_w)
        ckpt = str(tmp_path / "whisper.npz")
        np.savez(ckpt, **state)

        cfg_w = whisper_config_from_torch(state)
        params = whisper_from_torch(state)[0]
        asr = WhisperASR(params, cfg_w, max_tokens=8)
        audio = (0.1 * np.random.default_rng(2).standard_normal(8000)
                 ).astype(np.float32)
        ref = asr.transcribe(audio)

        clip = str(tmp_path / "clip.npy")
        np.save(clip, audio)
        refs = str(tmp_path / "refs.tsv")
        with open(refs, "w") as f:
            f.write(f"clip.npy\t{ref}\n")

        result = _run_main("tools.parity_asr",
                           ["--checkpoint", ckpt, "--audio", clip,
                            "--refs", refs, "--max-tokens", "8",
                            "--no-record"], capsys)
        assert result["mean_wer"] == pytest.approx(0.0)


class TestMissingFilesNewTools:
    @pytest.mark.parametrize("tool,args", [
        ("tools/parity_depth.py",
         ["--checkpoint", "/nope/midas.pt", "--images", "/nope/imgs"]),
        ("tools/parity_vad.py",
         ["--checkpoint", "/nope/silero.onnx", "--audio", "/nope/a.wav"]),
        ("tools/parity_tts.py",
         ["--voice", "/nope/voice.onnx", "--config", "/nope/v.json",
          "--text", "ola"]),
    ])
    def test_missing_checkpoint(self, tool, args):
        proc = _run([tool, *args], expect_ok=False)
        assert proc.returncode == 2
        assert "not found" in proc.stderr


class TestDepthParity:
    def test_self_parity(self, tmp_path, capsys):
        sys.path.insert(0, REPO)
        import torch
        from tests.test_depth_convert import TMidasSmall, _randomize_bn

        from trackiellm_tpu.models.depth import DepthConfig

        cfg = DepthConfig.tiny()
        torch.manual_seed(1)
        model = TMidasSmall(cfg).eval()
        _randomize_bn(model, torch.Generator().manual_seed(1))
        ckpt = str(tmp_path / "midas.npz")
        np.savez(ckpt, **{k: v.numpy()
                          for k, v in model.state_dict().items()})

        from PIL import Image

        img = np.random.default_rng(2).integers(
            0, 255, (80, 100, 3), dtype=np.uint8)
        img_path = str(tmp_path / "scene.png")
        Image.fromarray(img).save(img_path)

        out = str(tmp_path / "maps.npz")
        dump = _run_main("tools.parity_depth",
                         ["--checkpoint", ckpt, "--images", img_path,
                          "--input-size", str(cfg.img_size),
                          "--out", out, "--no-record"], capsys)
        assert dump["images"] == 1 and os.path.exists(out)

        res = _run_main("tools.parity_depth",
                        ["--checkpoint", ckpt, "--images", img_path,
                         "--input-size", str(cfg.img_size),
                         "--expected", out, "--no-record"], capsys)
        assert res["rmse_norm_mean"] < 1e-5
        assert res["pearson_mean"] > 0.9999


class TestVADParity:
    def test_self_parity(self, tmp_path, capsys):
        sys.path.insert(0, REPO)
        from tests.test_audio_convert import TestSileroExactConverter

        st = TestSileroExactConverter()._torch_state(seed=6)
        ckpt = str(tmp_path / "silero.npz")
        np.savez(ckpt, **{k: v.numpy() for k, v in st.items()})
        audio = (np.random.default_rng(7)
                 .normal(0, 0.1, 512 * 5).astype(np.float32))
        wav = str(tmp_path / "a.npy")
        np.save(wav, audio)

        out = str(tmp_path / "probs.json")
        dump = _run_main("tools.parity_vad",
                         ["--checkpoint", ckpt, "--audio", wav,
                          "--out", out, "--no-record"], capsys)
        assert dump["chunks"] == 5 and os.path.exists(out)

        res = _run_main("tools.parity_vad",
                        ["--checkpoint", ckpt, "--audio", wav,
                         "--expected", out, "--no-record"], capsys)
        assert res["max_abs_diff"] < 1e-6
        assert res["decision_agreement"] == 1.0


class TestTTSParity:
    def test_self_parity(self, tmp_path, capsys):
        sys.path.insert(0, REPO)
        from tests.test_vits import TestConverter

        from trackiellm_tpu.models import vits as V

        cfg = V.VITSConfig.tiny()
        st = TestConverter()._torch_vits_state(cfg, seed=5)
        ckpt = str(tmp_path / "voice.npz")
        np.savez(ckpt, **{k: v.numpy() for k, v in st.items()})
        conf = str(tmp_path / "voice.json")
        with open(conf, "w") as f:
            json.dump({"audio": {"sample_rate": 16000},
                       "phoneme_id_map": {
                           "^": [1], "$": [2], "_": [0],
                           "o": [3], "l": [4], "a": [5]}}, f)

        out = str(tmp_path / "synth.wav")
        dump = _run_main("tools.parity_tts",
                         ["--voice", ckpt, "--config", conf,
                          "--text", "ola", "--out", out,
                          "--no-record"], capsys)
        assert dump["seconds"] > 0 and os.path.exists(out)

        res = _run_main("tools.parity_tts",
                        ["--voice", ckpt, "--config", conf,
                         "--text", "ola", "--expected", out,
                         "--out", str(tmp_path / "synth2.wav"),
                         "--no-record"], capsys)
        # 16-bit wav quantization bounds the self-distance.
        assert res["mel_l1"] < 0.02
        assert abs(res["duration_ratio"] - 1.0) < 1e-6


class TestEmbedParity:
    def test_missing_checkpoint(self):
        proc = _run(["tools/parity_embed.py",
                     "--checkpoint", "/nope/minilm.pt",
                     "--texts", "/nope/s.txt"], expect_ok=False)
        assert proc.returncode == 2
        assert "not found" in proc.stderr

    def test_self_parity(self, tmp_path, capsys):
        sys.path.insert(0, REPO)
        from tests.test_embedder import TestWordPiece, _oracle

        model = _oracle(seed=9)
        ckpt = str(tmp_path / "bert.npz")
        np.savez(ckpt, **{k: v.numpy()
                          for k, v in model.state_dict().items()})
        vocab = TestWordPiece.VOCAB + [
            f"w{i}" for i in range(128 - len(TestWordPiece.VOCAB))]
        vpath = str(tmp_path / "vocab.txt")
        open(vpath, "w").write("\n".join(vocab))
        tpath = str(tmp_path / "texts.txt")
        open(tpath, "w").write(
            "the cat sat\nrunning on mats\nunaffable!\nthe 99 cats\n")

        out = str(tmp_path / "emb.npy")
        dump = _run_main("tools.parity_embed",
                         ["--checkpoint", ckpt, "--vocab", vpath,
                          "--texts", tpath, "--out", out,
                          "--no-record"], capsys)
        assert dump["texts"] == 4 and os.path.exists(out)

        # NOTE: the tiny oracle has 4 heads (128/64 rule would give 2);
        # self-parity compares the tool against itself, so the head
        # inference is consistent either way.
        res = _run_main("tools.parity_embed",
                        ["--checkpoint", ckpt, "--vocab", vpath,
                         "--texts", tpath, "--expected", out,
                         "--no-record"], capsys)
        assert res["mean_cosine"] > 0.999999
        assert res["top1_agreement"] == 1.0
        assert res["pass"]


class TestLLMParityNativeCheckpoint:
    def test_native_checkpoint_self_parity(self, tmp_path, capsys):
        """The HF-route families (converted to a native checkpoint dir)
        drive parity_llm too: a transcript produced by the runner
        itself must match exactly."""
        sys.path.insert(0, REPO)
        import jax
        import jax.numpy as jnp

        from trackiellm_tpu.llm.runner import GenerationConfig, LLMRunner
        from trackiellm_tpu.llm.tokenizer import ByteTokenizer
        from trackiellm_tpu.models import llm as llm_model
        from trackiellm_tpu.models.checkpoint import save_checkpoint

        cfg = llm_model.LLMConfig.tiny()
        params = llm_model.init_params(jax.random.PRNGKey(3), cfg,
                                       dtype=jnp.float32)
        ckpt = str(tmp_path / "native_ckpt")
        save_checkpoint(ckpt, params, config=cfg, metadata={})

        tok = ByteTokenizer(cfg.vocab_size)
        runner = LLMRunner(params, cfg, tok,
                           GenerationConfig(max_tokens=10,
                                            temperature=0.0,
                                            min_tokens=6),
                           cache_dtype=jnp.float32)
        runner.generate("ola mundo")
        ref_ids = [int(i) for i in runner._generated_ids]
        assert ref_ids

        tr = str(tmp_path / "transcript.json")
        open(tr, "w").write(json.dumps(
            {"prompt": "ola mundo", "tokens": ref_ids}))

        res = _run_main("tools.parity_llm",
                        ["--gguf", ckpt, "--transcript", tr,
                         "--quantize", "0", "--no-record"], capsys)
        assert res["match_rate"] >= 0.9  # bf16 sidecar roundtrip may
        assert res["exact_prefix"] >= 1  # perturb late near-ties


class TestVLMParity:
    def test_missing_checkpoint(self):
        proc = _run(["tools/parity_vlm.py",
                     "--checkpoint", "/nope/ckpt", "--image", "/nope/i.npy",
                     "--transcript", "/nope/t.json"], expect_ok=False)
        assert proc.returncode == 2
        assert "not found" in proc.stderr

    def test_self_parity(self, tmp_path, capsys):
        sys.path.insert(0, REPO)
        import torch

        from trackiellm_tpu import __main__ as cli
        from trackiellm_tpu.llm.runner import GenerationConfig
        from trackiellm_tpu.llm.vlm import VLMRunner
        from trackiellm_tpu.models.checkpoint import load_checkpoint

        # Tiny LLaVA state dict -> CLI convert -> runner transcript.
        from transformers import (CLIPVisionConfig, LlamaConfig,
                                  LlavaConfig,
                                  LlavaForConditionalGeneration)
        vc = CLIPVisionConfig(
            hidden_size=32, image_size=16, patch_size=8,
            num_hidden_layers=2, num_attention_heads=4,
            intermediate_size=64)
        tc = LlamaConfig(
            vocab_size=128, hidden_size=48, intermediate_size=96,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, max_position_embeddings=128)
        torch.manual_seed(3)
        m = LlavaForConditionalGeneration(LlavaConfig(
            vision_config=vc, text_config=tc,
            image_token_index=127)).eval()
        state = {k: v.numpy() for k, v in m.state_dict().items()}
        np.savez(tmp_path / "llava.npz", **state)
        ckpt = str(tmp_path / "ckpt")
        assert cli.main(["convert", str(tmp_path / "llava.npz"),
                         "-o", ckpt, "--family", "llava-hf",
                         "--n-heads", "4", "--vision-n-heads", "4",
                         "--bits", "0"]) == 0

        img = (np.random.default_rng(9)
               .integers(0, 255, (20, 28, 3)).astype(np.uint8))
        np.save(tmp_path / "frame.npy", img)
        params, cfg, _meta = load_checkpoint(ckpt)
        cp, cc, _m2 = load_checkpoint(os.path.join(ckpt, "vision"))
        runner = VLMRunner(params, cfg, cp, cc,
                           gen_config=GenerationConfig(
                               max_tokens=8, temperature=0.0))
        runner.generate("oi <image> tudo?", images=[img])
        tr = {"prompt": "oi <image> tudo?",
              "tokens": list(runner._generated_ids)}
        tr_path = str(tmp_path / "tr.json")
        with open(tr_path, "w") as f:
            json.dump(tr, f)

        res = _run_main("tools.parity_vlm",
                        ["--checkpoint", ckpt,
                         "--image", str(tmp_path / "frame.npy"),
                         "--transcript", tr_path, "--no-record"], capsys)
        assert res["match_rate"] == pytest.approx(1.0)
        assert res["exact_prefix"] == len(tr["tokens"])


class TestOCRParity:
    def test_missing_checkpoint(self):
        proc = _run(["tools/parity_ocr.py",
                     "--checkpoint", "/nope/trocr.safetensors",
                     "--config", "/nope/config.json",
                     "--images", "/nope/crops"], expect_ok=False)
        assert proc.returncode == 2
        assert "not found" in proc.stderr

    def test_self_parity(self, tmp_path, capsys):
        sys.path.insert(0, REPO)
        from tests.test_trocr import _build_oracle

        _, state, cfgdict = _build_oracle("vit")
        ckpt = str(tmp_path / "trocr.npz")
        np.savez(ckpt, **state)
        confp = str(tmp_path / "config.json")
        with open(confp, "w") as f:
            json.dump(cfgdict, f)
        imgdir = tmp_path / "crops"
        imgdir.mkdir()
        for i in range(2):
            np.save(str(imgdir / f"c{i}.npy"),
                    np.random.RandomState(i).rand(20, 50)
                    .astype(np.float32))

        out = str(tmp_path / "texts.json")
        dump = _run_main("tools.parity_ocr",
                         ["--checkpoint", ckpt, "--config", confp,
                          "--images", str(imgdir), "--out", out,
                          "--no-record"], capsys)
        assert dump["images"] == 2 and os.path.exists(out)

        res = _run_main("tools.parity_ocr",
                        ["--checkpoint", ckpt, "--config", confp,
                         "--images", str(imgdir), "--expected", out,
                         "--no-record"], capsys)
        assert res["cer"] == 0.0
        assert res["exact_match"] == 1.0
