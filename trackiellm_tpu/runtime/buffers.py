"""Double-buffered host->device transfer.

Parity target: the reference's 3-stream CUDA dispatcher overlapping
upload / compute / download (reference: src/gpu/cuda/
tk_cuda_dispatch.cu:51-55, 116-132). On TPU the analogue is async
``jax.device_put``: while the device computes on frame N, frame N+1 is
already in flight — JAX transfers are asynchronous, so the feeder's job
is pipelining the *handoff* and keeping at most ``depth`` frames
resident (bounded staging, like the reference's staging buffers).
"""

from __future__ import annotations

import collections
import threading
from typing import Any, Callable, Optional

import jax


class DoubleBufferedFeeder:
    """Producer/consumer frame feeder with device-side staging.

    Producer thread calls ``put(host_array)`` — the transfer starts
    immediately (async device_put). Consumer calls ``get()`` and
    receives a device array whose transfer overlaps the consumer's
    previous compute. Bounded depth: when full, the oldest staged frame
    is dropped (real-time semantics — the reference's frame ring does
    the same, tk_cortex_main.c:542).
    """

    def __init__(self, depth: int = 2,
                 device: Optional[jax.Device] = None,
                 preprocess: Optional[Callable] = None):
        self.depth = depth
        self.device = device or jax.devices()[0]
        self.preprocess = preprocess
        self._staged: collections.deque = collections.deque(maxlen=depth)
        self._cv = threading.Condition()
        self.dropped = 0
        self.transferred = 0

    def put(self, host_array: Any) -> None:
        dev = jax.device_put(host_array, self.device)  # async start
        if self.preprocess is not None:
            dev = self.preprocess(dev)  # jitted; also async
        with self._cv:
            if len(self._staged) == self._staged.maxlen:
                self.dropped += 1
            self._staged.append(dev)
            self.transferred += 1
            self._cv.notify()

    def get(self, timeout: Optional[float] = None):
        """Newest staged frame (real-time: intermediate frames are
        skipped), or None on timeout."""
        with self._cv:
            if not self._staged:
                self._cv.wait(timeout=timeout)
            if not self._staged:
                return None
            # Take newest, drop older (they're stale for a live loop).
            newest = self._staged.pop()
            self.dropped += len(self._staged)
            self._staged.clear()
            return newest

    def get_in_order(self, timeout: Optional[float] = None):
        """FIFO variant for offline processing."""
        with self._cv:
            if not self._staged:
                self._cv.wait(timeout=timeout)
            return self._staged.popleft() if self._staged else None
