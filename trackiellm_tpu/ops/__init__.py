"""TPU compute ops: the single-backend replacement for the reference's
seven GPU backends (reference: src/gpu/* — CUDA/ROCm/Metal/Vulkan/OpenCL/
GLES/NNAPI, SURVEY.md section 2.6).

Design: every op is a pure, jit-compatible JAX function with static
shapes. Hot ops (dequant-matmul, flash/paged attention) additionally have
Pallas TPU kernels selected at trace time; everything else is expressed so
XLA's fusion produces a single HBM pass (the TPU analogue of the
reference's hand-fused CUDA kernels, e.g. tk_cuda_kernels.cu:102's fused
preprocess_image).
"""

from trackiellm_tpu.ops.preprocess import (  # noqa: F401
    letterbox_preprocess,
    imagenet_normalize_chw,
)
from trackiellm_tpu.ops.nms import decode_and_nms, nms_fixed  # noqa: F401
from trackiellm_tpu.ops.mel import log_mel_spectrogram  # noqa: F401
from trackiellm_tpu.ops.resample import resample_poly  # noqa: F401
from trackiellm_tpu.ops.pointcloud import depth_to_point_cloud  # noqa: F401
