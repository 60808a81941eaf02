"""Vision subsystem: pipeline orchestration, depth fusion, scene graph,
attributes. TPU-native replacement for the reference's src/vision
(C pipeline + ONNX sessions + Rust analysis crate)."""

from trackiellm_tpu.vision.pipeline import (  # noqa: F401
    AnalysisFlags,
    VisionConfig,
    VisionPipeline,
    VisionResult,
    DetectedObject,
)
