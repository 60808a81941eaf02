"""Embeddable C ABI (trackie_ffi.{h,cpp} via ffi/embed.py).

Parity checks against the reference's external FFI contract
(src/ffi/c_api/tk_ffi_api.h): tensor create/reshape/fill/add/matmul,
media handles, module registration, sync + async command execution.
"""

import threading

import numpy as np
import pytest

from trackiellm_tpu.ffi.native import native_available

if not native_available():
    pytest.skip("native toolchain unavailable", allow_module_level=True)

from trackiellm_tpu.ffi import embed  # noqa: E402


def test_version():
    assert embed.version().startswith("2.")


def test_tensor_roundtrip_and_reshape():
    a = np.arange(12, dtype=np.float32).reshape(3, 4)
    t = embed.NativeTensor.from_numpy(a)
    assert t.shape == (3, 4)
    np.testing.assert_array_equal(t.to_numpy(), a)
    t.reshape((4, 3))
    assert t.shape == (4, 3)
    with pytest.raises(Exception):
        t.reshape((5, 5))  # element count mismatch
    t.close()


def test_tensor_fill_add():
    t = embed.NativeTensor(embed.TK_F32, (2, 3)).fill(2.5)
    u = embed.NativeTensor(embed.TK_F32, (2, 3)).fill(0.5)
    s = t.add(u)
    np.testing.assert_allclose(s.to_numpy(), np.full((2, 3), 3.0))
    i = embed.NativeTensor(embed.TK_I32, (4,)).fill(7)
    np.testing.assert_array_equal(i.to_numpy(), np.full((4,), 7, np.int32))


@pytest.mark.parametrize("blocked", [False, True])
def test_tensor_matmul_matches_numpy(blocked):
    rng = np.random.default_rng(0)
    a = rng.standard_normal((17, 33)).astype(np.float32)
    b = rng.standard_normal((33, 9)).astype(np.float32)
    ta = embed.NativeTensor.from_numpy(a)
    tb = embed.NativeTensor.from_numpy(b)
    c = ta.matmul(tb, blocked=blocked, block_size=8)
    np.testing.assert_allclose(c.to_numpy(), a @ b, rtol=1e-5, atol=1e-5)


def test_matmul_shape_error():
    ta = embed.NativeTensor(embed.TK_F32, (2, 3)).fill(1)
    tb = embed.NativeTensor(embed.TK_F32, (4, 2)).fill(1)
    with pytest.raises(Exception):
        ta.matmul(tb)


def test_audio_stream_fifo():
    s = embed.NativeAudioStream(sample_rate=16000, channels=1,
                                capacity_frames=100)
    x = np.linspace(-1, 1, 80, dtype=np.float32)
    assert s.write(x) == 80
    assert s.write(np.zeros(50, np.float32)) == 20  # capacity clamps
    got = s.read(64)
    np.testing.assert_allclose(got, x[:64])
    s.reset()
    assert s.read(10).size == 0
    s.close()


def test_vision_frame_roundtrip():
    f = embed.NativeVisionFrame(8, 4, fmt=embed.NativeVisionFrame.FMT_RGB24)
    fmt, w, h = f.info
    assert (fmt, w, h) == (1, 8, 4)
    pix = np.arange(8 * 4 * 3, dtype=np.uint8).reshape(4, 8, 3)
    f.write(pix)
    np.testing.assert_array_equal(f.read(), pix)
    f.close()


def test_module_sync_command():
    ctx = embed.NativeContext()

    def double(command, arr):
        assert command == "double"
        return arr * 2.0

    ctx.register_python_module(10, double)  # TK_MODULE_VISION
    out = ctx.execute(10, "double", np.ones((2, 2), np.float32))
    np.testing.assert_allclose(out, np.full((2, 2), 2.0))
    ctx.close()


def test_module_not_registered():
    ctx = embed.NativeContext()
    with pytest.raises(Exception):
        ctx.execute(40, "anything")
    ctx.close()


def test_module_async_callback():
    ctx = embed.NativeContext()
    done = threading.Event()
    results = []

    def negate(command, arr):
        return -arr

    ctx.register_python_module(20, negate)

    def cb(status, arr):
        results.append((status, arr))
        done.set()

    ctx.execute_async(20, "neg", np.arange(4, dtype=np.float32), cb)
    assert done.wait(timeout=10.0)
    status, arr = results[0]
    assert status == 0
    np.testing.assert_allclose(arr, -np.arange(4, dtype=np.float32))
    ctx.drain()
    ctx.close()


def test_module_executor_error_propagates():
    ctx = embed.NativeContext()

    def boom(command, arr):
        raise RuntimeError("nope")

    ctx.register_python_module(30, boom)
    with pytest.raises(Exception):
        ctx.execute(30, "x")
    ctx.close()


def test_commandless_result_none():
    ctx = embed.NativeContext()
    calls = []

    def sink(command, arr):
        calls.append(command)
        return None

    ctx.register_python_module(0, sink)
    assert ctx.execute(0, "ping") is None
    assert calls == ["ping"]
    ctx.close()
