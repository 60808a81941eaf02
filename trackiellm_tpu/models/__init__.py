"""Model zoo: JAX-native reimplementations of the reference's model set.

Reference model inventory (src/cortex/tk_cortex_main.h:70-76,
src/workers/src/cortex_worker.rs:109-115): Mistral-7B GGUF (llama.cpp),
YOLOv5nu ONNX, MiDaS DPT-SwinV2 ONNX, Whisper-tiny GGML, Piper ONNX,
Silero VAD ONNX, Tesseract OCR, plus an ONNX ambient-sound classifier.

Here every model is a pure-functional JAX program: ``init_params`` builds
a parameter pytree, ``apply``-style functions are jit-compatible with
static shapes, and weights are orbax/npz checkpoints (converted offline
from the original formats by ``trackiellm_tpu.models.loader``), not
runtime-loaded foreign graphs.
"""
