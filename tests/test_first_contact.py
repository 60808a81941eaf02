"""First-contact harness (trackiellm_tpu/first_contact.py): the
one-command real-checkpoint gauntlet, dry-run end-to-end on the
synthetic artifact set (GGUF LLM, whisper GGML, Silero-v5 ONNX,
openai-whisper state dict) exactly as CI must before the real
first-contact day.

Reference parity: the reference loads arbitrary real files in one call
(src/ai_models/tk_model_loader.c:199); this is the rebuild's
equivalent, plus the staged-flag probes the reference never needed.
"""

import json
import os

import numpy as np
import pytest

from trackiellm_tpu import first_contact as FC
from trackiellm_tpu.models.onnx_reader import write_onnx_initializers


def _silero_state(seed=4):
    rng = np.random.default_rng(seed)
    st = {"_model.stft.forward_basis_buffer":
          rng.standard_normal((258, 1, 256)).astype(np.float32) * 0.1}
    cin = 129
    for i, cout in enumerate((128, 64, 64, 128)):
        st[f"_model.encoder.{i}.reparam_conv.weight"] = (
            rng.standard_normal((cout, cin, 3)).astype(np.float32)
            / np.sqrt(cin * 3))
        st[f"_model.encoder.{i}.reparam_conv.bias"] = (
            rng.standard_normal(cout).astype(np.float32) * 0.01)
        cin = cout
    st["_model.decoder.rnn.weight_ih"] = (
        rng.standard_normal((512, 128)).astype(np.float32) * 0.05)
    st["_model.decoder.rnn.weight_hh"] = (
        rng.standard_normal((512, 128)).astype(np.float32) * 0.05)
    st["_model.decoder.rnn.bias_ih"] = (
        rng.standard_normal(512).astype(np.float32) * 0.01)
    st["_model.decoder.rnn.bias_hh"] = (
        rng.standard_normal(512).astype(np.float32) * 0.01)
    st["_model.decoder.decoder.2.weight"] = (
        rng.standard_normal((1, 128, 1)).astype(np.float32) * 0.1)
    st["_model.decoder.decoder.2.bias"] = (
        rng.standard_normal(1).astype(np.float32) * 0.01)
    return st


@pytest.fixture(scope="module")
def artifact_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("artifacts")
    from tests.test_convert import _make_gguf

    _make_gguf(str(d / "tiny-llama.gguf"))

    from tests.test_whisper_ggml import _tiny_file

    path, state, _, _ = _tiny_file(d)
    assert path.endswith(".bin")

    write_onnx_initializers(str(d / "silero_vad.onnx"), _silero_state())

    np.savez(str(d / "whisper-tiny-state.npz"),
             **{k: np.asarray(v) for k, v in state.items()
                if k != "encoder.positional_embedding"})

    (d / "README.md").write_text("not an artifact\n")
    return d


class TestSniff:
    def test_kinds(self, artifact_dir):
        got = {f: FC.sniff(str(artifact_dir / f))["kind"]
               for f in os.listdir(artifact_dir)}
        assert got["tiny-llama.gguf"] == "gguf"
        assert got["ggml-test.bin"] == "ggml-whisper"
        assert got["silero_vad.onnx"] == "onnx-silero"
        assert got["whisper-tiny-state.npz"] == "state-dict"
        assert got["README.md"] == "skip"

    def test_shard_detected(self, tmp_path):
        p = tmp_path / "model-00001-of-00002.safetensors"
        p.write_bytes(b"\x00" * 16)
        assert FC.sniff(str(p))["kind"] == "hf-shard"

    def test_truncated_gguf_fails_one_artifact_not_the_run(self,
                                                           tmp_path):
        """A half-copied checkpoint (valid magic, truncated header)
        must mark THAT file FAIL, never abort the gauntlet (review
        round-5 finding — this crashed the whole harness)."""
        (tmp_path / "broken.gguf").write_bytes(b"GGUF\x03\x00")
        rep = FC.run(str(tmp_path), None, FC.Options())
        assert rep["summary"]["FAIL"] == 1
        e = rep["artifacts"][0]
        assert e["status"] == "FAIL" and e["kind"] == "unreadable"


class TestHarnessEndToEnd:
    @pytest.fixture(scope="class")
    def report(self, artifact_dir, tmp_path_factory):
        out = tmp_path_factory.mktemp("report") / "report.json"
        rep = FC.run(str(artifact_dir), str(out),
                     FC.Options(probe_tokens=12))
        assert out.exists()
        assert json.loads(out.read_text()) == rep
        return rep

    def _entry(self, report, name):
        for a in report["artifacts"]:
            if a["file"] == name:
                return a
        raise AssertionError(f"{name} missing from report")

    def test_no_failures(self, report):
        assert report["summary"]["FAIL"] == 0, report["artifacts"]

    def test_llama_gguf_probed_with_flag_gauntlet(self, report):
        e = self._entry(report, "tiny-llama.gguf")
        assert e["status"] in ("PASS", "WARN")
        assert e["probe"]["mode"] == "nll"
        assert np.isfinite(e["probe"]["nll"])
        fp = e["flag_probe"]
        assert fp["env"] == "TRACKIE_LLAMA_GGUF_ROPE"
        assert "norm" in fp and "hf" in fp
        # Random synthetic weights: both layouts score alike, and the
        # fixture has no vocab -> the probe must NOT claim decisiveness.
        assert fp["decisive"] is False

    def test_whisper_ggml(self, report):
        e = self._entry(report, "ggml-test.bin")
        assert e["status"] in ("PASS", "WARN")
        assert e["probe"]["n_mels"] > 0
        assert e["probe"]["vocab_ok"]

    def test_silero_onnx(self, report):
        e = self._entry(report, "silero_vad.onnx")
        assert e["status"] in ("PASS", "WARN")
        assert 0.0 <= e["probe"]["prob_on_noise"] <= 1.0

    def test_whisper_state_dict(self, report):
        e = self._entry(report, "whisper-tiny-state.npz")
        assert e["status"] in ("PASS", "WARN")
        assert e["arch"] == "whisper-torch"

    def test_parity_suggested_without_companions(self, report):
        e = self._entry(report, "tiny-llama.gguf")
        assert e["parity"]["ran"] is False
        assert "parity_llm" in e["parity"]["suggested"]


@pytest.mark.slow
class TestPiperVoiceRoute:
    def test_piper_onnx_with_config_loads(self, tmp_path):
        """A VITS-named ONNX + its voice .json routes through
        VITSVoice.from_piper (name map + converter) and PASSes."""
        from tests.test_vits import TestConverter
        from trackiellm_tpu.models import vits as V

        cfg0 = V.VITSConfig.tiny()
        st = {k: np.asarray(v) for k, v in
              TestConverter()._torch_vits_state(cfg0).items()}
        p = str(tmp_path / "voice.onnx")
        write_onnx_initializers(p, st)
        (tmp_path / "voice.onnx.json").write_text(json.dumps(
            {"audio": {"sample_rate": cfg0.sample_rate},
             "phoneme_id_map": {"a": [1], "^": [0]}}))
        rep = FC.run(str(tmp_path), None, FC.Options())
        assert rep["summary"]["FAIL"] == 0, rep["artifacts"]
        e = [a for a in rep["artifacts"]
             if a["kind"] == "onnx-piper"][0]
        assert e["status"] in ("PASS", "WARN")
        assert e["probe"]["sample_rate"] == cfg0.sample_rate

    def test_piper_without_config_fails_informatively(self, tmp_path):
        from tests.test_vits import TestConverter
        from trackiellm_tpu.models import vits as V

        st = {k: np.asarray(v) for k, v in TestConverter()
              ._torch_vits_state(V.VITSConfig.tiny()).items()}
        p = str(tmp_path / "lonely.onnx")
        write_onnx_initializers(p, st)
        rep = FC.run(str(tmp_path), None, FC.Options())
        e = rep["artifacts"][0]
        assert e["status"] == "FAIL"
        assert ".json" in e["error"]  # names the expected config path


class TestShardedCheckpointMerging:
    def test_shard_group_merges_and_converts(self, tmp_path):
        """model-XXXXX-of-YYYYY.safetensors groups — the layout real
        HF checkpoints ship in — merge and convert as ONE artifact."""
        from safetensors.numpy import save_file

        from tests.test_whisper_ggml import _tiny_file

        _, state, _, _ = _tiny_file(tmp_path)
        items = sorted((k, np.ascontiguousarray(np.asarray(v)))
                       for k, v in state.items())
        half = len(items) // 2
        save_file(dict(items[:half]),
                  str(tmp_path / "model-00001-of-00002.safetensors"))
        save_file(dict(items[half:]),
                  str(tmp_path / "model-00002-of-00002.safetensors"))
        (tmp_path / "ggml-test.bin").unlink()  # isolate the group
        rep = FC.run(str(tmp_path), None, FC.Options())
        assert rep["summary"]["FAIL"] == 0, rep["artifacts"]
        sharded = [a for a in rep["artifacts"]
                   if a["kind"] == "hf-sharded"]
        assert len(sharded) == 1
        assert sharded[0]["status"] in ("PASS", "WARN")
        assert sharded[0]["arch"] == "whisper-torch"
        assert "2 shards" in sharded[0]["file"]


class TestStateDictClassifier:
    def test_config_json_wins(self, tmp_path):
        (tmp_path / "config.json").write_text(
            json.dumps({"model_type": "qwen3"}))
        fam, how = FC._classify_state_dict(
            ["model.layers.0.self_attn.q_proj.weight"],
            str(tmp_path / "model.safetensors"))
        assert fam == "hf:qwen3" and "config.json" in how

    def test_llm_tree_without_config_is_unclassified(self, tmp_path):
        fam, how = FC._classify_state_dict(
            ["model.layers.0.self_attn.q_proj.weight"],
            str(tmp_path / "model.safetensors"))
        assert fam is None and "config.json" in how

    def test_ultralytics(self, tmp_path):
        fam, _ = FC._classify_state_dict(
            ["model.0.conv.weight", "model.22.dfl.conv.weight"],
            str(tmp_path / "yolo.pt"))
        assert fam == "ultralytics"


@pytest.mark.slow
class TestParityCompanion:
    def test_llm_transcript_companion_runs_parity(self, tmp_path):
        """With a <stem>.transcript.json next to the GGUF, the harness
        must run tools/parity_llm.py and surface its metrics —
        self-transcript means match rate 1.0."""
        from tests.test_convert import _make_gguf

        gguf = str(tmp_path / "m.gguf")
        _make_gguf(gguf)

        import jax.numpy as jnp

        from trackiellm_tpu.llm.runner import GenerationConfig, LLMRunner
        from trackiellm_tpu.llm.tokenizer import ByteTokenizer
        from trackiellm_tpu.models.convert import gguf_to_llm_params

        del jnp  # parity_llm's settings must be mirrored exactly
        params, cfg = gguf_to_llm_params(gguf, bits=None)
        runner = LLMRunner(params, cfg, ByteTokenizer(cfg.vocab_size),
                           GenerationConfig(max_tokens=8,
                                            temperature=0.0))
        prompt = "ola"
        runner.generate(prompt)
        tokens = [int(t) for t in runner._generated_ids]
        (tmp_path / "m.transcript.json").write_text(json.dumps(
            {"prompt": prompt, "tokens": tokens}))
        entry = FC.check_artifact(
            gguf, FC.Options(no_flags=True, probe_tokens=10,
                             quantize=0),
            repo_root=os.path.dirname(os.path.dirname(
                os.path.abspath(FC.__file__))))
        assert entry["parity"]["ran"] is True
        assert entry["parity"]["rc"] == 0, entry["parity"]
        assert entry["parity"]["metrics"]["match_rate"] == 1.0
