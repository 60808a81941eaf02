"""Foundation layer tests (errors, logging, config, paths).

Mirrors the reference's L0 coverage (config parser test existed but was
disabled in tests/CMakeLists.txt:29-56; here it is active).
"""

import pytest

from trackiellm_tpu.utils import (
    Config,
    ErrorCode,
    LogLevel,
    TkPath,
    TrackieError,
    check,
    get_logger,
    set_log_level,
)
from trackiellm_tpu.utils.logging import AuditTrail, JsonEventFormatter


class TestErrors:
    def test_error_carries_code(self):
        err = TrackieError(ErrorCode.MODEL_LOAD_FAILED, "boom")
        assert err.code == ErrorCode.MODEL_LOAD_FAILED
        assert "boom" in str(err)
        assert "4001" in str(err)

    def test_check_raises(self):
        with pytest.raises(TrackieError) as ei:
            check(False, ErrorCode.INVALID_ARGUMENT, "bad arg")
        assert ei.value.code == ErrorCode.INVALID_ARGUMENT

    def test_check_passes(self):
        check(True, ErrorCode.INVALID_ARGUMENT)

    def test_domain_blocks(self):
        # Codes grouped by domain x 1000 (tk_error_handling.h parity).
        assert int(ErrorCode.CONFIG_PARSE_ERROR) // 1000 == 3
        assert int(ErrorCode.VAD_FAILED) // 1000 == 7
        assert int(ErrorCode.NAVIGATION_ERROR) // 1000 == 9


class TestConfig:
    def test_parse_and_typed_getters(self, tmp_path):
        p = tmp_path / "runtime.conf"
        p.write_text(
            "# cortex config\n"
            "main_loop_hz = 10\n"
            "gpu.enable = true\n"
            "llm.temperature = 0.7   # sampling temp\n"
            'model.path = "/models/llm.ckpt"\n'
            "\n"
            "; alt comment style\n"
            "audio.sample_rate = 16000\n"
        )
        cfg = Config.load(p)
        assert cfg.get_int("main_loop_hz") == 10
        assert cfg.get_bool("gpu.enable") is True
        assert cfg.get_float("llm.temperature") == pytest.approx(0.7)
        assert cfg.get_string("model.path") == "/models/llm.ckpt"
        assert cfg.get_int("audio.sample_rate") == 16000

    def test_defaults_and_missing(self):
        cfg = Config()
        assert cfg.get_int("nope", 42) == 42
        assert cfg.get_bool("nope", False) is False
        with pytest.raises(TrackieError) as ei:
            cfg.get_string("nope")
        assert ei.value.code == ErrorCode.CONFIG_KEY_MISSING

    def test_type_mismatch(self, tmp_path):
        p = tmp_path / "bad.conf"
        p.write_text("x = hello\n")
        cfg = Config.load(p)
        with pytest.raises(TrackieError) as ei:
            cfg.get_int("x")
        assert ei.value.code == ErrorCode.CONFIG_TYPE_MISMATCH

    def test_parse_error(self, tmp_path):
        p = tmp_path / "broken.conf"
        p.write_text("this line has no equals\n")
        with pytest.raises(TrackieError) as ei:
            Config.load(p)
        assert ei.value.code == ErrorCode.CONFIG_PARSE_ERROR

    def test_save_roundtrip(self, tmp_path):
        cfg = Config()
        cfg.set("a", 1)
        cfg.set("b", "two")
        out = tmp_path / "out.conf"
        cfg.save(out)
        cfg2 = Config.load(out)
        assert cfg2.get_int("a") == 1
        assert cfg2.get_string("b") == "two"


class TestPaths:
    def test_atomic_write_roundtrip(self, tmp_path):
        p = TkPath(tmp_path / "sub" / "state.json")
        p.write_text_atomic('{"ok": true}')
        assert p.exists() and p.is_file()
        assert p.read_text() == '{"ok": true}'
        assert p.size() == len('{"ok": true}')
        assert p.extension() == "json"

    def test_join_and_missing(self, tmp_path):
        base = TkPath(tmp_path)
        child = base.join("a", "b.txt")
        assert not child.exists()
        with pytest.raises(TrackieError):
            child.size()


class TestLogging:
    def test_logger_and_level_gate(self, caplog):
        log = get_logger("test")
        set_log_level(LogLevel.WARN)
        with caplog.at_level("DEBUG", logger="trackiellm.test"):
            log.info("hidden")
        set_log_level(LogLevel.INFO)

    def test_json_event_formatter(self):
        line = JsonEventFormatter.format_event("vision.frame", {"latency_ms": 12})
        import json

        obj = json.loads(line)
        assert obj["type"] == "vision.frame"
        assert obj["payload"]["latency_ms"] == 12

    def test_audit_trail(self):
        trail = AuditTrail()
        trail.auth_event("user1", "pin_verify", success=True)
        trail.config_change("op", "llm.temperature", 0.5)
