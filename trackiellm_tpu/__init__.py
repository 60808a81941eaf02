"""TrackieLLM-TPU: a TPU-native multimodal assistive-AI runtime.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
TrackieWay-OSS/TrackieLLM (reference: /root/reference): real-time camera +
microphone + IMU perception (object detection, monocular depth, OCR, VAD,
ASR, sound classification), a cortex reasoning loop driving a local
quantized LLM with grammar-constrained tool calling, and priority-scheduled
TTS plus navigation safety alerts.

Architecture (TPU-first, not a port):
  - All per-frame / per-chunk math is jit-compiled JAX; hot spots are
    Pallas TPU kernels (``trackiellm_tpu.ops``).
  - Models are JAX pytrees of parameters (``trackiellm_tpu.models``), not
    runtime-loaded foreign graphs.
  - The event loop / workers / ring buffers live on the host
    (``trackiellm_tpu.runtime``, ``trackiellm_tpu.cortex``) and feed the
    device through double-buffered transfers.
  - Multi-chip sharding of the LLM rides a ``jax.sharding.Mesh``
    (``trackiellm_tpu.parallel``).
"""

__version__ = "0.1.0"

from trackiellm_tpu.utils.errors import ErrorCode, TrackieError  # noqa: F401
