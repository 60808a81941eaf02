"""tk_* compatibility-surface tests: the reference's call sites work
verbatim against the shim."""

import numpy as np
import jax.numpy as jnp

from trackiellm_tpu import compat as tk
from trackiellm_tpu.utils.errors import ErrorCode


class TestCompatSurface:
    def test_cortex_lifecycle_and_injection(self):
        cortex = tk.tk_cortex_create()
        assert tk.tk_cortex_get_state(cortex) == "idle"
        tk.tk_cortex_run(cortex)
        tk.tk_cortex_inject_user_text(cortex, "olá")
        tk.tk_cortex_stop(cortex)
        assert tk.tk_cortex_get_state(cortex) == "shutdown"
        tk.tk_cortex_destroy(cortex)

    def test_reasoner_flow_reference_style(self):
        """The reference full-test shape through tk_* names."""
        r = tk.tk_contextual_reasoner_create()
        tk.tk_contextual_reasoner_update_ambient_sound(
            r, "alarme de incêndio", urgent=True)
        tk.tk_contextual_reasoner_add_conversation_turn(
            r, "user", "o que está acontecendo?")
        prompt = tk.tk_contextual_reasoner_generate_context_string(
            r, user_query="o que está acontecendo?")
        assert "URGENTE" in prompt
        assert tk.tk_contextual_reasoner_get_context_summary(
            r)["urgent_items"] == 1

    def test_decision_engine(self):
        d = tk.tk_decision_engine_create()
        resp = tk.tk_decision_engine_process_llm_response(
            d, '{"tool_call":{"name":"x","arguments":{}}}')
        assert resp.is_tool_call
        done = tk.tk_decision_engine_process_actions(d)
        assert done[0].state.value == "failed"  # unknown tool

    def test_vision_pipeline_and_result_destroy(self):
        def stub(chw):
            return jnp.zeros((4, 4)), jnp.zeros((4, 80))

        p = tk.tk_vision_pipeline_create(detector_fn=stub)
        res = tk.tk_vision_pipeline_process_frame(
            p, np.zeros((64, 64, 3), np.uint8))
        tk.tk_vision_result_destroy(res)  # no-op, must not raise
        tk.tk_vision_pipeline_update_thresholds(p, confidence=0.9)
        assert p.config.confidence_threshold == 0.9

    def test_audio_pipeline(self):
        heard = []
        p = tk.tk_audio_pipeline_create(
            tts_fn=lambda t: np.zeros(16, np.float32),
            on_tts_audio=lambda w, pr: heard.append(pr))
        tk.tk_audio_pipeline_process_chunk(p, np.zeros(1600, np.float32))
        tk.tk_audio_pipeline_say(p, "oi", priority=2)
        assert p.wait_idle(3.0)
        tk.tk_audio_pipeline_destroy(p)
        assert heard == [2]

    def test_sensors_and_navigation(self):
        f = tk.tk_sensors_fusion_create()
        f.ingest_imu([0, 0, 0], [0, 0, 9.81])
        state = tk.tk_sensors_fusion_get_world_state(f)
        assert state.orientation_wxyz is not None

        from tests.test_navigation import _synthetic_depth

        e = tk.tk_navigation_engine_create()
        grid = tk.tk_navigation_engine_update(e, _synthetic_depth())
        sectors = tk.tk_free_space_detector_analyze(grid)
        assert len(sectors) == 7

    def test_tk_call_error_convention(self):
        code, result = tk.tk_call(tk.tk_config_load, "/nonexistent.conf")
        assert code == int(ErrorCode.FILE_NOT_FOUND)
        assert result is None
        code, cfg = tk.tk_call(tk.tk_cortex_create)
        assert code == int(ErrorCode.SUCCESS)

    def test_model_loader_names(self, tmp_path):
        import numpy as np

        p = str(tmp_path / "m.npz")
        np.savez(p, w=np.zeros(4))
        assert tk.tk_model_loader_validate(p)
        m = tk.tk_model_loader_load_model(p)
        assert "w" in m.tensors
