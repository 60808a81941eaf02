"""ctypes bindings for the embeddable C ABI (trackie_ffi.h).

Parity target: the reference's external FFI surface consumed by
bindings and companion apps (reference: src/ffi/c_api/tk_ffi_api.h —
TkContext/TkTensor handles :74-98, tensor math :251-382, media handles
:404-526, async tk_module_execute_command :545-567).

Two directions:
  - Python -> C: NativeTensor / NativeAudioStream / NativeVisionFrame /
    NativeContext wrap the opaque handles for host apps written here.
  - C -> Python: ``register_python_module`` installs a Python callable
    as a module executor through a CFUNCTYPE trampoline, so an external
    C embedder driving tk_module_execute_command reaches framework
    subsystems (the TPU-side analogue of the C cortex registering
    c_module_executor with the Rust registry,
    src/cortex/tk_cortex_main.c:399-448).
"""

from __future__ import annotations

import ctypes
from typing import Callable, Dict, Optional, Sequence, Tuple

import numpy as np

from trackiellm_tpu.ffi.native import _load
from trackiellm_tpu.utils.errors import ErrorCode, TrackieError

# dtype ids (trackie_ffi.h TkDataType)
TK_F32, TK_I32, TK_U8 = 0, 1, 2
_DTYPE_NP = {TK_F32: np.float32, TK_I32: np.int32, TK_U8: np.uint8}
_NP_DTYPE = {np.dtype(np.float32): TK_F32, np.dtype(np.int32): TK_I32,
             np.dtype(np.uint8): TK_U8}

_EXECUTOR = ctypes.CFUNCTYPE(
    ctypes.c_int, ctypes.c_char_p, ctypes.c_void_p,
    ctypes.POINTER(ctypes.c_void_p), ctypes.c_void_p)
_CALLBACK = ctypes.CFUNCTYPE(
    None, ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p)

_declared = False


def _lib():
    lib = _load()
    if lib is None:
        raise TrackieError(ErrorCode.UNSUPPORTED,
                           "native FFI library unavailable")
    global _declared
    if not _declared:
        _declare_ffi(lib)
        _declared = True
    return lib


def _declare_ffi(lib) -> None:
    p = ctypes.c_void_p
    i64p = ctypes.POINTER(ctypes.c_int64)
    szp = ctypes.POINTER(ctypes.c_size_t)
    lib.tk_ffi_last_error.restype = ctypes.c_char_p
    lib.tk_context_create.argtypes = [ctypes.POINTER(p)]
    lib.tk_context_destroy.argtypes = [ctypes.POINTER(p)]
    lib.tk_tensor_create.argtypes = [ctypes.POINTER(p), ctypes.c_int,
                                     i64p, ctypes.c_size_t]
    lib.tk_tensor_destroy.argtypes = [ctypes.POINTER(p)]
    lib.tk_tensor_get_data.argtypes = [p, ctypes.POINTER(p), szp]
    lib.tk_tensor_get_mutable_data.argtypes = [p, ctypes.POINTER(p), szp]
    lib.tk_tensor_get_shape.argtypes = [p, i64p, szp]
    lib.tk_tensor_dtype.argtypes = [p, ctypes.POINTER(ctypes.c_int)]
    lib.tk_tensor_reshape.argtypes = [p, i64p, ctypes.c_size_t]
    lib.tk_tensor_fill.argtypes = [p, ctypes.c_double]
    lib.tk_tensor_add.argtypes = [p, p, p]
    lib.tk_tensor_matmul.argtypes = [p, p, p]
    lib.tk_tensor_matmul_blocked.argtypes = [p, p, p, ctypes.c_size_t]
    lib.tk_audio_stream_create.argtypes = [
        ctypes.POINTER(p), ctypes.c_int, ctypes.c_uint32, ctypes.c_uint32,
        ctypes.c_size_t]
    lib.tk_audio_stream_destroy.argtypes = [ctypes.POINTER(p)]
    lib.tk_audio_stream_write.argtypes = [p, ctypes.c_void_p,
                                          ctypes.c_size_t, szp]
    lib.tk_audio_stream_read.argtypes = [p, ctypes.c_void_p,
                                         ctypes.c_size_t, szp]
    lib.tk_audio_stream_reset.argtypes = [p]
    lib.tk_vision_frame_create.argtypes = [ctypes.POINTER(p), ctypes.c_int,
                                           ctypes.c_uint32, ctypes.c_uint32]
    lib.tk_vision_frame_destroy.argtypes = [ctypes.POINTER(p)]
    lib.tk_vision_frame_get_data.argtypes = [p, ctypes.POINTER(p), szp]
    lib.tk_vision_frame_get_mutable_data.argtypes = [p, ctypes.POINTER(p),
                                                     szp]
    lib.tk_vision_frame_get_info.argtypes = [
        p, ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_uint32),
        ctypes.POINTER(ctypes.c_uint32)]
    lib.tk_context_register_module.argtypes = [p, ctypes.c_int32,
                                               _EXECUTOR, ctypes.c_void_p]
    lib.tk_context_unregister_module.argtypes = [p, ctypes.c_int32]
    lib.tk_module_execute_command.argtypes = [
        p, ctypes.c_int32, ctypes.c_char_p, p, ctypes.POINTER(p),
        _CALLBACK, ctypes.c_void_p]
    lib.tk_context_drain.argtypes = [p]
    lib.tk_version_string.restype = ctypes.c_char_p


def _check(status: int, what: str) -> None:
    if status != 0:
        msg = _lib().tk_ffi_last_error().decode(errors="replace")
        raise TrackieError(ErrorCode.FFI_ERROR, f"{what}: {msg} ({status})")


class NativeTensor:
    """Owned TkTensor handle. ``from_numpy``/``to_numpy`` copy."""

    def __init__(self, dtype_id: int, shape: Sequence[int],
                 _handle: Optional[ctypes.c_void_p] = None):
        lib = _lib()
        if _handle is not None:
            self._h = _handle
            return
        h = ctypes.c_void_p()
        arr = (ctypes.c_int64 * len(shape))(*shape)
        _check(lib.tk_tensor_create(ctypes.byref(h), dtype_id, arr,
                                    len(shape)), "tensor_create")
        self._h = h

    @classmethod
    def from_numpy(cls, a: np.ndarray) -> "NativeTensor":
        a = np.ascontiguousarray(a)
        dt = _NP_DTYPE.get(a.dtype)
        if dt is None:
            raise TrackieError(ErrorCode.INVALID_ARGUMENT,
                               f"unsupported dtype {a.dtype}")
        t = cls(dt, a.shape)
        buf, n = t._mutable()
        ctypes.memmove(buf, a.ctypes.data, min(n, a.nbytes))
        return t

    @classmethod
    def _adopt(cls, handle) -> "NativeTensor":
        if isinstance(handle, ctypes.c_void_p):
            return cls(0, (), _handle=handle)
        return cls(0, (), _handle=ctypes.c_void_p(int(handle)))

    def _mutable(self) -> Tuple[ctypes.c_void_p, int]:
        lib = _lib()
        pdata = ctypes.c_void_p()
        nbytes = ctypes.c_size_t()
        _check(lib.tk_tensor_get_mutable_data(
            self._h, ctypes.byref(pdata), ctypes.byref(nbytes)),
            "tensor_get_mutable_data")
        return pdata, nbytes.value

    @property
    def shape(self) -> Tuple[int, ...]:
        lib = _lib()
        n = ctypes.c_size_t(0)
        _check(lib.tk_tensor_get_shape(self._h, None, ctypes.byref(n)),
               "tensor_get_shape")
        arr = (ctypes.c_int64 * n.value)()
        _check(lib.tk_tensor_get_shape(self._h, arr, ctypes.byref(n)),
               "tensor_get_shape")
        return tuple(arr[: n.value])

    @property
    def dtype_id(self) -> int:
        d = ctypes.c_int()
        _check(_lib().tk_tensor_dtype(self._h, ctypes.byref(d)),
               "tensor_dtype")
        return d.value

    def to_numpy(self) -> np.ndarray:
        buf, n = self._mutable()
        out = np.empty(self.shape, _DTYPE_NP[self.dtype_id])
        ctypes.memmove(out.ctypes.data, buf, min(n, out.nbytes))
        return out

    def reshape(self, shape: Sequence[int]) -> "NativeTensor":
        arr = (ctypes.c_int64 * len(shape))(*shape)
        _check(_lib().tk_tensor_reshape(self._h, arr, len(shape)),
               "tensor_reshape")
        return self

    def fill(self, value: float) -> "NativeTensor":
        _check(_lib().tk_tensor_fill(self._h, value), "tensor_fill")
        return self

    def add(self, other: "NativeTensor") -> "NativeTensor":
        out = NativeTensor(self.dtype_id, self.shape)
        _check(_lib().tk_tensor_add(self._h, other._h, out._h),
               "tensor_add")
        return out

    def matmul(self, other: "NativeTensor",
               blocked: bool = False, block_size: int = 0) -> "NativeTensor":
        m = self.shape[0]
        n = other.shape[1]
        out = NativeTensor(TK_F32, (m, n))
        if blocked:
            _check(_lib().tk_tensor_matmul_blocked(
                self._h, other._h, out._h, block_size), "matmul_blocked")
        else:
            _check(_lib().tk_tensor_matmul(self._h, other._h, out._h),
                   "matmul")
        return out

    def close(self) -> None:
        if self._h:
            _lib().tk_tensor_destroy(ctypes.byref(self._h))

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class NativeAudioStream:
    """TkAudioStream frame FIFO (f32 only from Python)."""

    def __init__(self, sample_rate: int = 16000, channels: int = 1,
                 capacity_frames: int = 48000):
        h = ctypes.c_void_p()
        _check(_lib().tk_audio_stream_create(
            ctypes.byref(h), 2, sample_rate, channels, capacity_frames),
            "audio_stream_create")
        self._h = h
        self.channels = channels

    def write(self, samples: np.ndarray) -> int:
        a = np.ascontiguousarray(samples, np.float32)
        n = a.size // self.channels
        w = ctypes.c_size_t()
        _check(_lib().tk_audio_stream_write(
            self._h, a.ctypes.data_as(ctypes.c_void_p), n,
            ctypes.byref(w)), "audio_stream_write")
        return w.value

    def read(self, max_frames: int) -> np.ndarray:
        out = np.empty(max_frames * self.channels, np.float32)
        r = ctypes.c_size_t()
        _check(_lib().tk_audio_stream_read(
            self._h, out.ctypes.data_as(ctypes.c_void_p), max_frames,
            ctypes.byref(r)), "audio_stream_read")
        return out[: r.value * self.channels]

    def reset(self) -> None:
        _check(_lib().tk_audio_stream_reset(self._h), "audio_stream_reset")

    def close(self) -> None:
        if self._h:
            _lib().tk_audio_stream_destroy(ctypes.byref(self._h))

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class NativeVisionFrame:
    """TkVisionFrame pixel staging buffer."""

    FMT_RGB24, FMT_BGR24, FMT_GRAY8 = 1, 2, 3

    def __init__(self, width: int, height: int, fmt: int = 1):
        h = ctypes.c_void_p()
        _check(_lib().tk_vision_frame_create(ctypes.byref(h), fmt,
                                             width, height),
               "vision_frame_create")
        self._h = h

    @property
    def info(self) -> Tuple[int, int, int]:
        fmt = ctypes.c_int()
        w = ctypes.c_uint32()
        hh = ctypes.c_uint32()
        _check(_lib().tk_vision_frame_get_info(
            self._h, ctypes.byref(fmt), ctypes.byref(w), ctypes.byref(hh)),
            "vision_frame_get_info")
        return fmt.value, w.value, hh.value

    def write(self, pixels: np.ndarray) -> None:
        a = np.ascontiguousarray(pixels, np.uint8)
        pdata = ctypes.c_void_p()
        nbytes = ctypes.c_size_t()
        _check(_lib().tk_vision_frame_get_mutable_data(
            self._h, ctypes.byref(pdata), ctypes.byref(nbytes)),
            "vision_frame_get_mutable_data")
        ctypes.memmove(pdata, a.ctypes.data, min(nbytes.value, a.nbytes))

    def read(self) -> np.ndarray:
        fmt, w, h = self.info
        ch = 1 if fmt == self.FMT_GRAY8 else 3
        pdata = ctypes.c_void_p()
        nbytes = ctypes.c_size_t()
        _check(_lib().tk_vision_frame_get_data(
            self._h, ctypes.byref(pdata), ctypes.byref(nbytes)),
            "vision_frame_get_data")
        out = np.empty((h, w, ch), np.uint8)
        ctypes.memmove(out.ctypes.data, pdata, min(nbytes.value, out.nbytes))
        return out

    def close(self) -> None:
        if self._h:
            _lib().tk_vision_frame_destroy(ctypes.byref(self._h))

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class NativeContext:
    """TkContext: module registry + async command bus.

    Python executors receive (command: str, input: np.ndarray | None)
    and return np.ndarray | None.
    """

    def __init__(self):
        h = ctypes.c_void_p()
        _check(_lib().tk_context_create(ctypes.byref(h)), "context_create")
        self._h = h
        self._trampolines: Dict[int, object] = {}  # keep CFUNCTYPEs alive
        self._callbacks: list = []

    def register_python_module(
            self, module_id: int,
            fn: Callable[[str, Optional[np.ndarray]],
                         Optional[np.ndarray]]) -> None:
        # NativeTensor._adopt closes the handle in __del__ — borrowed
        # inputs are protected by nulling the handle after the copy.
        def tramp_safe(command, input_handle, output_pp, _state):
            try:
                arr = None
                if input_handle:
                    view = NativeTensor._adopt(input_handle)
                    arr = view.to_numpy()
                    view._h = None  # borrowed; caller owns it
                result = fn(command.decode(), arr)
                if result is not None and output_pp:
                    t = NativeTensor.from_numpy(np.asarray(result))
                    output_pp[0] = t._h.value
                    t._h = None
                return 0
            except Exception:
                return -6

        cfn = _EXECUTOR(tramp_safe)
        self._trampolines[module_id] = cfn
        _check(_lib().tk_context_register_module(self._h, module_id, cfn,
                                                 None), "register_module")

    def unregister_module(self, module_id: int) -> None:
        _check(_lib().tk_context_unregister_module(self._h, module_id),
               "unregister_module")
        # A queued worker job may have copied the Module struct before
        # unregistration and could still call the trampoline — drain the
        # pool before dropping the ctypes trampoline reference (ADVICE
        # round 2: narrow use-after-free window).
        _lib().tk_context_drain(self._h)
        self._trampolines.pop(module_id, None)

    def execute(self, module_id: int, command: str,
                input_arr: Optional[np.ndarray] = None
                ) -> Optional[np.ndarray]:
        """Synchronous module command; returns the output array."""
        inp = None
        if input_arr is not None:
            inp = NativeTensor.from_numpy(np.asarray(input_arr))
        out_h = ctypes.c_void_p()
        _check(_lib().tk_module_execute_command(
            self._h, module_id, command.encode(),
            inp._h if inp else None, ctypes.byref(out_h), _CALLBACK(),
            None), "execute_command")
        if not out_h:
            return None
        t = NativeTensor._adopt(out_h)
        try:
            return t.to_numpy()
        finally:
            t.close()

    def execute_async(self, module_id: int, command: str,
                      input_arr: Optional[np.ndarray],
                      callback: Callable[[int, Optional[np.ndarray]], None],
                      ) -> None:
        """Queues on the context worker pool; callback(status, result)."""
        inp = None
        if input_arr is not None:
            inp = NativeTensor.from_numpy(np.asarray(input_arr))

        def cb(status, result_handle, _ud):
            arr = None
            if result_handle:
                t = NativeTensor._adopt(result_handle)
                try:
                    arr = t.to_numpy()
                finally:
                    t.close()
            if inp is not None:
                inp.close()  # input had to stay alive until completion
            # One-shot: release the ctypes ref once fired so _callbacks
            # doesn't grow without bound (ADVICE round 2).
            try:
                self._callbacks.remove(ccb)
            except ValueError:
                pass
            callback(status, arr)

        ccb = _CALLBACK(cb)
        self._callbacks.append(ccb)
        _check(_lib().tk_module_execute_command(
            self._h, module_id, command.encode(),
            inp._h if inp else None, None, ccb, None), "execute_command")

    def drain(self) -> None:
        _check(_lib().tk_context_drain(self._h), "context_drain")

    def close(self) -> None:
        if self._h:
            _lib().tk_context_destroy(ctypes.byref(self._h))

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def version() -> str:
    return _lib().tk_version_string().decode()
