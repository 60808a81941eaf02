"""FFI layer tests: native C++ primitives (ring, queue, arena, AEAD with
RFC 8439 vectors) and the module-command registry."""

import threading
import time

import pytest

from trackiellm_tpu.ffi import (
    ModuleRegistry,
    ModuleType,
    NativeArena,
    NativeEventQueue,
    NativeRingBuffer,
    aead_decrypt,
    aead_encrypt,
    constant_time_compare,
    native_available,
)
from trackiellm_tpu.utils.errors import TrackieError


class TestNativeBuild:
    def test_library_compiles_and_loads(self):
        # The environment ships g++; the native path must be live.
        assert native_available()


class TestRingBuffer:
    def test_write_read_roundtrip(self):
        r = NativeRingBuffer(64)
        assert r.write(b"hello") == 5
        assert len(r) == 5
        assert r.read(5) == b"hello"
        assert len(r) == 0

    def test_wraparound(self):
        r = NativeRingBuffer(8)
        cap = r.capacity
        r.write(b"x" * (cap - 2))
        r.read(cap - 2)
        r.write(b"abcdef")  # wraps the physical end
        assert r.read(6) == b"abcdef"

    def test_full_rejects(self):
        r = NativeRingBuffer(8)
        cap = r.capacity
        assert r.write(b"a" * cap) == cap
        assert r.write(b"more") == 0

    def test_overwrite_mode_keeps_newest(self):
        r = NativeRingBuffer(8)
        cap = r.capacity
        r.write(bytes(range(cap)))
        r.write(b"NEW", overwrite=True)
        data = r.read(cap)
        assert data.endswith(b"NEW")
        assert len(data) == cap

    def test_threaded_spsc(self):
        r = NativeRingBuffer(1 << 12)
        total = 50_000
        received = bytearray()

        def producer():
            sent = 0
            while sent < total:
                chunk = bytes((i % 251 for i in range(sent, min(
                    sent + 997, total))))
                n = r.write(chunk)
                sent += n
                if n == 0:
                    time.sleep(0.0001)

        def consumer():
            while len(received) < total:
                got = r.read(1024)
                received.extend(got)
                if not got:
                    time.sleep(0.0001)

        tp = threading.Thread(target=producer)
        tc = threading.Thread(target=consumer)
        tp.start(); tc.start()
        tp.join(10); tc.join(10)
        assert bytes(received) == bytes(i % 251 for i in range(total))


class TestEventQueue:
    def test_push_pop(self):
        q = NativeEventQueue(capacity=4)
        assert q.push(7, b"payload")
        t, payload = q.pop(timeout_ms=100)
        assert t == 7 and payload == b"payload"

    def test_pop_timeout(self):
        q = NativeEventQueue(capacity=4)
        t0 = time.monotonic()
        assert q.pop(timeout_ms=50) is None
        assert time.monotonic() - t0 >= 0.04

    def test_full_drops_and_counts(self):
        q = NativeEventQueue(capacity=2)
        assert q.push(1) and q.push(2)
        assert not q.push(3)
        assert q.dropped == 1
        assert len(q) == 2

    def test_blocking_pop_wakes_on_push(self):
        q = NativeEventQueue(capacity=4)
        got = []

        def waiter():
            got.append(q.pop(timeout_ms=2000))

        t = threading.Thread(target=waiter)
        t.start()
        time.sleep(0.05)
        q.push(42, b"x")
        t.join(3)
        assert got and got[0][0] == 42


class TestArena:
    def test_aligned_bump(self):
        a = NativeArena(1024)
        o1 = a.alloc(10)
        o2 = a.alloc(10)
        assert o1 % 64 == 0 and o2 % 64 == 0 and o2 > o1
        assert a.used >= 20

    def test_exhaustion_and_reset(self):
        a = NativeArena(128)
        a.alloc(100)
        with pytest.raises(MemoryError):
            a.alloc(100)
        a.reset()
        assert a.alloc(100) == 0


class TestAEAD:
    def test_rfc8439_vector(self):
        """RFC 8439 section 2.8.2 test vector."""
        key = bytes(range(0x80, 0xA0))
        nonce = bytes.fromhex("070000004041424344454647")
        aad = bytes.fromhex("50515253c0c1c2c3c4c5c6c7")
        plaintext = (b"Ladies and Gentlemen of the class of '99: "
                     b"If I could offer you only one tip for the future, "
                     b"sunscreen would be it.")
        expected_ct = bytes.fromhex(
            "d31a8d34648e60db7b86afbc53ef7ec2"
            "a4aded51296e08fea9e2b5a736ee62d6"
            "3dbea45e8ca9671282fafb69da92728b"
            "1a71de0a9e060b2905d6a5b67ecd3b36"
            "92ddbd7f2d778b8c9803aee328091b58"
            "fab324e4fad675945585808b4831d7bc"
            "3ff4def08e4b7a9de576d26586cec64b"
            "6116")
        expected_tag = bytes.fromhex("1ae10b594f09e26a7e902ecbd0600691")
        out = aead_encrypt(key, nonce, plaintext, aad)
        assert out[:-16] == expected_ct
        assert out[-16:] == expected_tag

    def test_roundtrip_and_tamper(self):
        key = bytes(32)
        nonce = bytes(12)
        msg = b"estado de autenticacao"
        ct = aead_encrypt(key, nonce, msg, b"hdr")
        assert aead_decrypt(key, nonce, ct, b"hdr") == msg
        tampered = bytes([ct[0] ^ 1]) + ct[1:]
        with pytest.raises(ValueError):
            aead_decrypt(key, nonce, tampered, b"hdr")
        with pytest.raises(ValueError):
            aead_decrypt(key, nonce, ct, b"wrong-aad")

    def test_empty_plaintext(self):
        key = bytes(32)
        nonce = bytes(12)
        ct = aead_encrypt(key, nonce, b"")
        assert aead_decrypt(key, nonce, ct) == b""

    def test_constant_time_compare(self):
        assert constant_time_compare(b"abc", b"abc")
        assert not constant_time_compare(b"abc", b"abd")
        assert not constant_time_compare(b"abc", b"ab")


class TestModuleRegistry:
    def test_register_execute(self):
        reg = ModuleRegistry()
        reg.register(ModuleType.VISION,
                     lambda cmd, p: {"cmd": cmd, "echo": p.get("x")})
        out = reg.execute(ModuleType.VISION, "analyze", {"x": 1})
        assert out == {"cmd": "analyze", "echo": 1}
        reg.close()

    def test_duplicate_and_missing(self):
        reg = ModuleRegistry()
        reg.register(ModuleType.AUDIO, lambda c, p: None)
        with pytest.raises(TrackieError):
            reg.register(ModuleType.AUDIO, lambda c, p: None)
        with pytest.raises(TrackieError):
            reg.execute(ModuleType.CORTEX, "x")
        reg.unregister(ModuleType.AUDIO)
        assert ModuleType.AUDIO not in reg.registered()
        reg.close()

    def test_async_callback(self):
        reg = ModuleRegistry()
        reg.register(ModuleType.NAVIGATION, lambda c, p: c.upper())
        results = []
        done = threading.Event()

        def cb(result, error):
            results.append((result, error))
            done.set()

        reg.execute_async(ModuleType.NAVIGATION, "scan", callback=cb)
        assert done.wait(2.0)
        assert results == [("SCAN", None)]
        reg.close()

    def test_async_error_callback(self):
        reg = ModuleRegistry()

        def boom(c, p):
            raise RuntimeError("nope")

        reg.register(ModuleType.CUSTOM, boom)
        done = threading.Event()
        errs = []
        reg.execute_async(ModuleType.CUSTOM, "x",
                          callback=lambda r, e: (errs.append(e), done.set()))
        assert done.wait(2.0)
        assert isinstance(errs[0], RuntimeError)
        reg.close()


class TestCppWrappers:
    def test_raii_wrapper_compiles_and_runs(self, tmp_path):
        """Compile the header-only C++ RAII layer against the C ABI and
        run its assertions (parity: tk_ffi_cpp_api)."""
        import os
        import shutil
        import subprocess
        import textwrap

        if shutil.which("g++") is None:
            pytest.skip("no g++")
        native = os.path.join(os.path.dirname(__file__), "..",
                              "trackiellm_tpu", "ffi", "native")
        src = tmp_path / "t.cpp"
        src.write_text(textwrap.dedent("""
            #include <cassert>
            #include "trackie_runtime.hpp"
            int main() {
                trackie::RingBuffer ring(64);
                const uint8_t msg[] = "abc";
                assert(ring.write(msg, 3) == 3);
                assert(ring.read(3).size() == 3);
                trackie::EventQueue q(2);
                assert(q.push(1, msg, 3));
                auto e = q.pop(50);
                assert(e && e->type == 1);
                uint8_t key[32] = {0}, nonce[12] = {0};
                std::vector<uint8_t> pt = {9, 9};
                assert(trackie::aead_decrypt(
                    key, nonce, trackie::aead_encrypt(key, nonce, pt)) == pt);
                return 0;
            }
        """))
        exe = tmp_path / "t"
        subprocess.run(
            ["g++", "-O1", "-std=c++17", f"-I{native}", str(src),
             os.path.join(native, "trackie_runtime.cpp"), "-o", str(exe)],
            check=True, capture_output=True, timeout=120)
        subprocess.run([str(exe)], check=True, timeout=30)
