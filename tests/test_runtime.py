"""Runtime layer tests: event bus broadcast semantics, task manager,
double-buffered feeder, inference scheduler priorities."""

import threading
import time

import numpy as np
import pytest

from trackiellm_tpu.runtime import (
    DoubleBufferedFeeder,
    EventBus,
    InferenceScheduler,
    JobKind,
    TaskManager,
)
from trackiellm_tpu.runtime.event_bus import EventKind


class TestEventBus:
    def test_broadcast_to_all_subscribers(self):
        bus = EventBus()
        a, b = bus.subscribe(), bus.subscribe()
        n = bus.publish(EventKind.SPEAK, "olá")
        assert n == 2
        assert a.recv(0.1).payload == "olá"
        assert b.recv(0.1).payload == "olá"

    def test_lagging_subscriber_drops_oldest(self):
        bus = EventBus(capacity=4)
        sub = bus.subscribe()
        for i in range(10):
            bus.publish(EventKind.VISION_RESULT, i)
        events = sub.drain()
        assert len(events) == 4
        assert [e.payload for e in events] == [6, 7, 8, 9]
        assert sub.lagged == 6

    def test_sync_callbacks(self):
        bus = EventBus()
        got = []
        bus.on(EventKind.SHUTDOWN, lambda e: got.append(e.kind))
        bus.publish(EventKind.SPEAK)      # different kind: ignored
        bus.shutdown()
        assert got == [EventKind.SHUTDOWN]

    def test_unsubscribe(self):
        bus = EventBus()
        sub = bus.subscribe()
        bus.unsubscribe(sub)
        assert bus.publish(EventKind.SPEAK) == 0


class TestTaskManager:
    def test_spawn_and_cooperative_cancel(self):
        tm = TaskManager()
        ran = threading.Event()

        def task(stop):
            ran.set()
            stop.wait(5.0)

        tm.spawn("t", task)
        assert ran.wait(1.0)
        assert tm.status()["t"]
        assert tm.cancel("t")
        assert tm.join_all(timeout=2.0) == []

    def test_crash_captured_at_join(self):
        tm = TaskManager()

        def bad(stop):
            raise RuntimeError("worker panic")

        tm.spawn("bad", bad)
        tm.join_all(timeout=1.0)
        assert "worker panic" in str(tm.errors()["bad"])

    def test_duplicate_name_rejected(self):
        tm = TaskManager()
        tm.spawn("x", lambda stop: stop.wait(2.0))
        with pytest.raises(ValueError):
            tm.spawn("x", lambda stop: None)
        tm.join_all(1.0)


class TestFeeder:
    def test_put_get(self):
        f = DoubleBufferedFeeder(depth=2)
        f.put(np.ones((4, 4), np.float32))
        out = f.get(timeout=1.0)
        assert out is not None and out.shape == (4, 4)

    def test_realtime_get_takes_newest(self):
        f = DoubleBufferedFeeder(depth=2)
        f.put(np.full((2,), 1.0, np.float32))
        f.put(np.full((2,), 2.0, np.float32))
        out = f.get(timeout=1.0)
        assert float(out[0]) == 2.0
        assert f.dropped >= 1

    def test_overflow_drops(self):
        f = DoubleBufferedFeeder(depth=2)
        for i in range(5):
            f.put(np.full((2,), float(i), np.float32))
        assert f.dropped == 3
        assert f.transferred == 5

    def test_fifo_variant(self):
        f = DoubleBufferedFeeder(depth=4)
        f.put(np.full((2,), 1.0, np.float32))
        f.put(np.full((2,), 2.0, np.float32))
        assert float(f.get_in_order(1.0)[0]) == 1.0
        assert float(f.get_in_order(1.0)[0]) == 2.0


class TestScheduler:
    def test_run_returns_result(self):
        s = InferenceScheduler()
        assert s.run(JobKind.OTHER, lambda x: x + 1, 41) == 42
        s.close()

    def test_priority_ordering(self):
        s = InferenceScheduler()
        order = []
        gate = threading.Event()

        def job(tag):
            order.append(tag)
            return tag

        # Block the dispatcher with a slow job, then enqueue mixed
        # priorities — they must drain highest-first.
        f0 = s.submit(JobKind.OTHER, lambda: gate.wait(1.0))
        time.sleep(0.05)
        f_dec = s.submit(JobKind.LLM_DECODE, job, "decode")
        f_vis = s.submit(JobKind.VISION, job, "vision")
        f_vad = s.submit(JobKind.VAD, job, "vad")
        gate.set()
        for f in (f_dec, f_vis, f_vad):
            f.result(timeout=2.0)
        # VAD > LLM_DECODE > VISION (the passive camera tick yields to
        # everything the user is actively waiting on).
        assert order == ["vad", "decode", "vision"]
        s.close()

    def test_stats_recorded(self):
        s = InferenceScheduler()
        s.run(JobKind.VISION, lambda: time.sleep(0.01))
        assert s.stats["vision"]["count"] == 1
        assert s.stats["vision"]["ema_ms"] > 0
        s.close()

    def test_exception_propagates(self):
        s = InferenceScheduler()
        fut = s.submit(JobKind.ASR, lambda: 1 / 0)
        with pytest.raises(ZeroDivisionError):
            fut.result(timeout=2.0)
        s.close()


class TestSchedulerFocus:
    """Conversation focus rejects passive kinds at ADMISSION (run_or_skip
    -> SKIPPED) so the reply path never launches behind a long vision
    pass — and the calling cortex thread never blocks behind the focus
    window (measured: dispatch-time deferral pushed reply p50 from
    977 ms to 2.8 s by pinning the cortex event loop)."""

    def test_focus_skips_vision_at_admission(self):
        from trackiellm_tpu.runtime.scheduler import SKIPPED

        s = InferenceScheduler()
        # A never-completed kind is infinitely stale (bootstrap): prime
        # one pass so the gate applies.
        s.run(JobKind.VISION, lambda: None)
        s.focus(5.0)
        t0 = time.monotonic()
        out = s.run_or_skip(JobKind.VISION, lambda: "ran")
        dt = time.monotonic() - t0
        assert out is SKIPPED
        assert dt < 0.1                    # immediate, no queueing
        # Non-focus kinds are unaffected.
        assert s.run_or_skip(JobKind.TTS, lambda: "tts") == "tts"
        s.close()

    def test_staleness_bound_overrides_focus(self):
        from trackiellm_tpu.runtime.scheduler import SKIPPED

        # Once the last completed pass is >= the stale bound old,
        # safety wins: vision is admitted even while focus is held.
        s = InferenceScheduler(focus_max_stale_s=0.15)
        s.run(JobKind.VISION, lambda: None)   # fresh completion
        s.focus(5.0)
        assert s.run_or_skip(JobKind.VISION, lambda: "ran") is SKIPPED
        time.sleep(0.2)
        assert s.run_or_skip(JobKind.VISION, lambda: "ran") == "ran"
        # ... and that completion re-arms the gate.
        assert s.run_or_skip(JobKind.VISION, lambda: "ran") is SKIPPED
        s.close()

    def test_never_run_kind_is_not_gated(self):
        # Bootstrap: with no completed vision pass at all, focus does
        # not blind the device.
        s = InferenceScheduler()
        s.focus(5.0)
        assert s.run_or_skip(JobKind.VISION, lambda: "ran") == "ran"
        s.close()

    def test_focus_expired_is_noop(self):
        s = InferenceScheduler()
        assert not s.focus_active
        s.focus(0.05)
        assert s.focus_active
        time.sleep(0.1)
        assert not s.focus_active
        s.run(JobKind.VISION, lambda: None)
        assert s.run_or_skip(JobKind.VISION, lambda: 7) == 7
        s.close()


class TestWatchdog:
    def test_restarts_crashed_worker_then_gives_up(self):
        from trackiellm_tpu.runtime.watchdog import Watchdog

        tm = TaskManager()
        crashes = {"n": 0}

        def flaky(stop):
            crashes["n"] += 1
            raise RuntimeError(f"crash {crashes['n']}")

        tm.spawn("flaky", flaky)
        wd = Watchdog(tm, interval_s=0.01, max_restarts=2)
        deadline = time.monotonic() + 5.0
        while time.monotonic() < deadline and "flaky" not in wd.gave_up:
            wd.check_once()
            time.sleep(0.02)
        assert crashes["n"] == 3  # original + 2 restarts
        assert wd.restarts["flaky"] == 2
        assert "flaky" in wd.gave_up
        tm.join_all(1.0)

    def test_healthy_worker_untouched(self):
        from trackiellm_tpu.runtime.watchdog import Watchdog

        tm = TaskManager()
        tm.spawn("ok", lambda stop: stop.wait(5.0))
        wd = Watchdog(tm, interval_s=0.01)
        wd.check_once()
        assert wd.restarts == {}
        tm.join_all(1.0)
