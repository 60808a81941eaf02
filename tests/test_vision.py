"""Vision stack tests: detector/depth/OCR models + pipeline golden test.

Mirrors the reference's test strategy (SURVEY.md section 4): behavioral
pipeline tests with stub model backends + a golden fixture reproducing
tests/fixtures/regression_1 semantics (cup on table -> objects with
attributes + on_top_of scene edge), plus shape/consistency tests for the
real model architectures at tiny configs.
"""

import json
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from trackiellm_tpu.models import depth as depth_model
from trackiellm_tpu.models import detector as det_model
from trackiellm_tpu.models import ocr as ocr_model
from trackiellm_tpu.vision import (
    AnalysisFlags,
    VisionConfig,
    VisionPipeline,
)
from trackiellm_tpu.vision.scene_graph import (
    SceneNode,
    build_scene_graph,
    describe_scene_graph,
)

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "regression_cup_on_table.json")


@pytest.mark.slow  # full-model compile; covered by the slow tier
class TestDetectorModel:
    def test_forward_shapes_and_decode(self):
        cfg = det_model.DetectorConfig.tiny()
        params = det_model.init_detector(jax.random.PRNGKey(0), cfg)
        img = jnp.zeros((3, cfg.img_size, cfg.img_size))
        boxes, cls = det_model.detector_forward(params, cfg, img)
        s = cfg.img_size
        expected_a = (s // 8) ** 2 + (s // 16) ** 2 + (s // 32) ** 2
        assert boxes.shape == (expected_a, 4)
        assert cls.shape == (expected_a, cfg.num_classes)
        assert bool(jnp.all((cls >= 0) & (cls <= 1)))
        # Decoded boxes live in input-pixel space (center +- reg_max
        # bins at the coarsest stride bounds the support).
        assert float(jnp.max(boxes)) < s + cfg.reg_max * 32

    def test_nms_integration(self):
        from trackiellm_tpu.ops.nms import decode_and_nms

        cfg = det_model.DetectorConfig.tiny()
        params = det_model.init_detector(jax.random.PRNGKey(0), cfg)
        img = jnp.ones((3, cfg.img_size, cfg.img_size)) * 0.5
        boxes, cls = det_model.detector_forward(params, cfg, img)
        det = decode_and_nms(boxes, cls, score_thresh=0.0, max_out=8)
        assert det.boxes.shape == (8, 4)


@pytest.mark.slow  # full-model compile; covered by the slow tier
class TestDepthModel:
    def test_forward_shape(self):
        cfg = depth_model.DepthConfig.tiny()
        params = depth_model.init_depth(jax.random.PRNGKey(0), cfg)
        img = jnp.zeros((3, cfg.img_size, cfg.img_size))
        out = depth_model.depth_forward(params, cfg, img)
        assert out.shape == (cfg.img_size, cfg.img_size)
        assert bool(jnp.all(out >= 0))

    def test_relative_to_metric_mapping(self):
        rel = jnp.array([[0.0, 1.0], [2.0, 4.0]])
        metric = depth_model.relative_to_metric(rel, 0.5, 8.0)
        # Largest inverse depth -> nearest (min_depth).
        assert float(metric[1, 1]) == pytest.approx(0.5)
        assert float(metric[0, 0]) == pytest.approx(8.0)


class TestOCRModel:
    def test_forward_shapes(self):
        cfg = ocr_model.OCRConfig.tiny()
        params = ocr_model.init_ocr(jax.random.PRNGKey(0), cfg)
        crops = jnp.zeros((2, cfg.height, cfg.width))
        logits = ocr_model.ocr_forward(params, cfg, crops)
        assert logits.shape == (2, cfg.width // 8, cfg.num_classes)

    def test_ctc_greedy_decode(self):
        # Hand-crafted logits spelling "cab" with repeats + blanks.
        idx = {c: i + 1 for i, c in enumerate(ocr_model.CHARSET)}
        seq = [idx["c"], idx["c"], 0, idx["a"], 0, idx["b"], idx["b"]]
        logits = np.full((1, len(seq), len(ocr_model.CHARSET) + 1), -10.0)
        for t, s in enumerate(seq):
            logits[0, t, s] = 10.0
        out = ocr_model.ctc_greedy_decode(jnp.asarray(logits))
        assert out == ["cab"]


class TestSceneGraph:
    def test_on_top_of_and_next_to(self):
        nodes = [
            SceneNode(0, "cup", [30, 20, 34, 24], 1.0),
            SceneNode(1, "table", [20, 24, 50, 40], 1.2),
            SceneNode(2, "chair", [52, 24, 60, 40], 1.3),
        ]
        g = build_scene_graph(nodes)
        rels = {(e["src"], e["dst"], e["relation"]) for e in g["edges"]}
        assert (0, 1, "on_top_of") in rels
        assert (1, 2, "next_to") in rels
        desc = describe_scene_graph(g)
        assert "cup is on top of table" in desc

    def test_depth_gate(self):
        nodes = [
            SceneNode(0, "cup", [30, 20, 34, 24], 1.0),
            SceneNode(1, "table", [20, 24, 50, 40], 5.0),  # far away
        ]
        g = build_scene_graph(nodes)
        assert g["edges"] == []


def _make_fixture_frame(fx):
    """Synthesize the cup-on-table frame: dark background, brown table,
    red cup."""
    w, h = fx["camera"]["width"], fx["camera"]["height"]
    frame = np.full((h, w, 3), 40, np.uint8)
    tb = fx["objects"][1]["box"]
    frame[tb[1]:tb[3], tb[0]:tb[2]] = (120, 80, 40)  # brownish table
    cb = fx["objects"][0]["box"]
    frame[cb[1]:cb[3], cb[0]:cb[2]] = (220, 30, 30)  # red cup
    return frame


def _stub_detector_for(fx, n_classes=80, input_size=640):
    """Detector stub emitting raw (boxes, scores) in letterbox space for
    the fixture's objects (the reference's tests inject results the same
    way — models are never loaded, tk_cortex_full_test.c)."""
    labels = det_model.COCO_LABELS
    h = fx["camera"]["height"]
    w = fx["camera"]["width"]
    scale = min(input_size / h, input_size / w)
    pad_y = (input_size - round(h * scale)) // 2
    pad_x = (input_size - round(w * scale)) // 2

    rows = []
    for obj in fx["objects"]:
        b = obj["box"]
        cid = labels.index(obj["label"])
        lb = [b[0] * scale + pad_x, b[1] * scale + pad_y,
              b[2] * scale + pad_x, b[3] * scale + pad_y]
        rows.append((lb, cid, 0.9))

    def fn(chw):
        boxes = np.zeros((16, 4), np.float32)
        scores = np.zeros((16, n_classes), np.float32)
        for i, (lb, cid, sc) in enumerate(rows):
            boxes[i] = lb
            scores[i, cid] = sc
        return jnp.asarray(boxes), jnp.asarray(scores)

    return fn


def _stub_depth(depth_input=384):
    """Depth stub: flat inverse depth — every object at the same
    distance (keeps the scene-graph depth gate open for the fixture)."""
    def fn(chw):
        return jnp.full((depth_input, depth_input), 0.5)
    return fn


class TestPipelineGolden:
    @pytest.fixture(scope="class")
    def fixture(self):
        with open(FIXTURE) as f:
            return json.load(f)

    @pytest.fixture(scope="class")
    def result(self, fixture):
        pipe = VisionPipeline(
            detector_fn=_stub_detector_for(fixture),
            depth_fn=_stub_depth(),
            ocr_fn=lambda crops: ["stop"] * len(crops),
        )
        frame = _make_fixture_frame(fixture)
        return pipe.process_frame(frame, AnalysisFlags.ALL)

    def test_objects_detected(self, fixture, result):
        labels = {o.label for o in result.objects}
        for obj in fixture["objects"]:
            assert obj["label"] in labels
        for o in result.objects:
            exp = next(x for x in fixture["objects"] if x["label"] == o.label)
            assert o.confidence >= exp["min_confidence"] - 0.15
            np.testing.assert_allclose(o.box, exp["box"], atol=2.0)

    def test_valid_mask(self, result):
        assert result.valid_analyses & AnalysisFlags.DETECTION
        assert result.valid_analyses & AnalysisFlags.DEPTH
        assert result.valid_analyses & AnalysisFlags.SCENE_GRAPH
        assert result.valid_analyses & AnalysisFlags.ATTRIBUTES

    def test_distances_fused(self, result):
        for o in result.objects:
            assert o.distance_m is not None
            assert 0.3 <= o.distance_m <= 10.0

    def test_cup_attributes(self, fixture, result):
        cup = next(o for o in result.objects if o.label == "cup")
        assert f"color:{fixture['objects'][0]['expected_color']}" \
            in cup.attributes

    def test_scene_graph_edge(self, fixture, result):
        by_id = {n["id"]: n["label"] for n in result.scene_graph["nodes"]}
        rels = {(by_id[e["src"]], by_id[e["dst"]], e["relation"])
                for e in result.scene_graph["edges"]}
        for e in fixture["expected_scene_graph_edges"]:
            assert (e["src_label"], e["dst_label"], e["relation"]) in rels


class TestPipelineBehavior:
    def test_degradation_on_failing_stage(self):
        """A crashing detector must not fail the frame (parity:
        per-analysis degradation, tk_vision_pipeline.c:190-234)."""
        def bad_detector(chw):
            raise RuntimeError("model exploded")

        pipe = VisionPipeline(detector_fn=bad_detector,
                              depth_fn=_stub_depth())
        res = pipe.process_frame(np.zeros((480, 640, 3), np.uint8))
        assert not (res.valid_analyses & AnalysisFlags.DETECTION)
        assert res.valid_analyses & AnalysisFlags.DEPTH
        assert res.objects == []

    def test_flag_gating(self):
        calls = {"det": 0, "depth": 0}

        def det(chw):
            calls["det"] += 1
            return jnp.zeros((4, 4)), jnp.zeros((4, 80))

        def dep(chw):
            calls["depth"] += 1
            return jnp.ones((384, 384))

        pipe = VisionPipeline(detector_fn=det, depth_fn=dep)
        pipe.process_frame(np.zeros((64, 64, 3), np.uint8),
                           AnalysisFlags.DETECTION)
        assert calls == {"det": 1, "depth": 0}

    def test_threshold_update(self, rng):
        with open(FIXTURE) as f:
            fx = json.load(f)
        pipe = VisionPipeline(detector_fn=_stub_detector_for(fx))
        frame = _make_fixture_frame(fx)
        r1 = pipe.process_frame(frame, AnalysisFlags.DETECTION)
        pipe.update_thresholds(confidence=0.95)
        r2 = pipe.process_frame(frame, AnalysisFlags.DETECTION)
        assert len(r2.objects) < len(r1.objects)

    def test_ocr_cache_hit_on_repeat_frame(self):
        fx = {
            "camera": {"width": 640, "height": 480},
            "objects": [{"label": "stop sign", "box": [100, 100, 200, 200],
                         "min_confidence": 0.5, "expected_color": "red"}],
        }
        calls = []

        def ocr(crops):
            calls.append(crops.shape[0])
            return ["stop"] * crops.shape[0]

        pipe = VisionPipeline(detector_fn=_stub_detector_for(fx), ocr_fn=ocr)
        frame = _make_fixture_frame({"camera": fx["camera"],
                                     "objects": [fx["objects"][0]] * 2})
        flags = AnalysisFlags.DETECTION | AnalysisFlags.OCR
        r1 = pipe.process_frame(frame, flags)
        r2 = pipe.process_frame(frame, flags)  # identical frame
        # Only the FIRST frame called the model (the explicit-OCR flag
        # now also stages the full-page grid, so one call covers the
        # detection crop + page strips); the second frame is all cache.
        assert len(calls) == 1
        assert pipe.ocr_cache_hits >= 1
        assert r2.objects[0].text == "stop"

    def test_ocr_auto_trigger(self):
        fx = {
            "camera": {"width": 640, "height": 480},
            "objects": [{"label": "stop sign", "box": [100, 100, 200, 200],
                         "min_confidence": 0.5, "expected_color": "red"}],
        }
        ocr_calls = []

        def ocr(crops):
            ocr_calls.append(crops.shape)
            return ["stop"] * crops.shape[0]

        pipe = VisionPipeline(detector_fn=_stub_detector_for(fx),
                              ocr_fn=ocr)
        frame = _make_fixture_frame({"camera": fx["camera"],
                                     "objects": [fx["objects"][0],
                                                 fx["objects"][0]]})
        res = pipe.process_frame(
            frame, AnalysisFlags.DETECTION | AnalysisFlags.OCR)
        sign = next(o for o in res.objects if o.label == "stop sign")
        assert sign.text == "stop"
        assert len(ocr_calls) == 1


class TestNavigationCuesInPipeline:
    def test_navigation_flag_produces_cues(self):
        """NAVIGATION analysis: depth grid -> hazard strings (parity:
        the Rust analyze_navigation_cues step)."""
        from trackiellm_tpu.navigation import NavigationEngine
        from tests.test_navigation import _synthetic_depth

        depth = _synthetic_depth(obstacle={"z": 1.5})

        def depth_fn(chw):
            # Return relative inverse depth whose metric mapping matches
            # the synthetic scene closely enough for hazard detection:
            # invert the metric depth into [0, 1].
            import jax.numpy as jnp
            d = jnp.asarray(depth)
            inv = jnp.where(d > 0, 1.0 / jnp.maximum(d, 0.1), 0.0)
            return inv

        fx = {"camera": {"width": 160, "height": 120},
              "objects": [{"label": "chair", "box": [10, 10, 30, 30],
                           "min_confidence": 0.5, "expected_color": None}]}
        pipe = VisionPipeline(
            detector_fn=_stub_detector_for(fx),
            depth_fn=lambda chw: depth_fn(chw),
            navigation_engine=NavigationEngine(),
            config=VisionConfig(depth_input=120, min_depth_m=0.3,
                                max_depth_m=10.0),
        )
        frame = np.zeros((120, 160, 3), np.uint8)
        res = pipe.process_frame(
            frame, AnalysisFlags.DEPTH | AnalysisFlags.NAVIGATION)
        assert res.valid_analyses & AnalysisFlags.NAVIGATION
        assert isinstance(res.navigation_cues, list)


class TestFullPageOCR:
    """VERDICT round-2 item 6: explicit OCR must read the WHOLE frame
    (strip grid -> text regions + full_text), not only detection
    crops; regex filters gate the results (parity:
    tk_text_recognition.cpp:73-104)."""

    @staticmethod
    def _bright_ocr(crops):
        # Deterministic stub: "reads" a strip iff its mean intensity is
        # high (the fixture paints "text" as a bright band).
        return ["PARE" if float(c.mean()) > 0.2 else "" for c in crops]

    def _frame_with_band(self):
        frame = np.zeros((96, 128, 3), np.uint8)
        frame[10:20, 70:120] = 255  # bright "sign" top-right
        return frame

    def test_text_outside_any_detection_box(self):
        pipe = VisionPipeline(
            detector_fn=None, ocr_fn=self._bright_ocr)
        # No detector at all -> no boxes; explicit OCR still reads.
        res = pipe.process_frame(self._frame_with_band(),
                                 AnalysisFlags.OCR)
        assert res.valid_analyses & AnalysisFlags.OCR
        assert res.text_regions, "full-page scan found no regions"
        assert "PARE" in res.full_text
        # The region's box must cover the bright band (top-right cell).
        tr = next(t for t in res.text_regions if t.text == "PARE")
        x1, y1, x2, y2 = tr.box
        assert y1 <= 10 and y2 >= 20 and x2 > 70

    def test_reading_order_top_down(self):
        frame = np.zeros((96, 128, 3), np.uint8)
        frame[80:92, 0:60] = 255    # bottom-left band
        frame[4:16, 0:60] = 255     # top-left band

        def ocr(crops):
            return ["B" if float(c.mean()) > 0.2 else "" for c in crops]

        pipe = VisionPipeline(detector_fn=None, ocr_fn=ocr)
        res = pipe.process_frame(frame, AnalysisFlags.OCR)
        assert len(res.text_regions) == 2
        assert res.text_regions[0].box[1] < res.text_regions[1].box[1]

    def test_regex_filter_drops_nonmatching(self):
        pipe = VisionPipeline(detector_fn=None, ocr_fn=self._bright_ocr)
        pipe.set_ocr_filter(r"^\d+$")  # digits only: "PARE" filtered
        res = pipe.process_frame(self._frame_with_band(),
                                 AnalysisFlags.OCR)
        assert res.text_regions == []
        pipe.set_ocr_filter(None)
        res = pipe.process_frame(self._frame_with_band(),
                                 AnalysisFlags.OCR)
        assert res.text_regions

    def test_invalid_regex_rejected(self):
        pipe = VisionPipeline(detector_fn=None, ocr_fn=self._bright_ocr)
        with pytest.raises(Exception):
            pipe.set_ocr_filter("(unclosed")
