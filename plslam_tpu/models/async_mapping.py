"""Asynchronous local-mapping: the reference's thread architecture at the
host level.

The reference runs LocalMapping on its own pthread consuming a keyframe
queue (/root/reference/src/LocalMapping.cc:72-164, System.cc:91), with
``Map::mMutexMapUpdate`` serializing map edits against Tracking
(Map.h:90, Tracking.cc:291). The TPU engine's tracking path is device-only
between keyframes, so the same split applies cleanly: a python worker
thread drains the keyframe queue and runs the mapping pass (fusion,
culling, BA — its own jit dispatches), while a coarse map lock guards the
host-side map mutations on both sides. Dispatching XLA computations from
two threads is supported by JAX; the device serializes execution.
"""

from __future__ import annotations

import queue
import threading


class AsyncLocalMapper:
    """Wraps a LocalMapper with a worker thread + keyframe queue."""

    def __init__(self, inner):
        self.inner = inner
        self.lock = inner.lock              # the mMutexMapUpdate equivalent
        self._q: queue.Queue = queue.Queue()
        # abort a running BA when another keyframe is waiting
        # (LocalMapping::InterruptBA semantics, LocalMapping.cc:1107)
        inner.should_abort = lambda: not self._q.empty()
        self._stop = False
        self._idle = threading.Event()
        self._idle.set()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    # LocalMapper interface ------------------------------------------------
    @property
    def enable_ba(self):
        return self.inner.enable_ba

    @enable_ba.setter
    def enable_ba(self, v):
        self.inner.enable_ba = v

    @property
    def recent_points(self):
        return self.inner.recent_points

    @property
    def recent_lines(self):
        return self.inner.recent_lines

    def on_new_landmarks(self, kf, pt_ids, ln_ids):
        with self.lock:
            self.inner.on_new_landmarks(kf, pt_ids, ln_ids)

    @property
    def should_abort(self):
        return self.inner.should_abort

    def process_keyframe(self, kf: int):
        self._idle.clear()
        self._q.put(kf)

    def fuse(self, kf: int):
        self.inner.fuse(kf)

    def run_local_ba(self, kf: int, window=None, **kw):
        self.inner.run_local_ba(kf, window, **kw)

    def replace_point(self, loser, winner):
        with self.lock:
            self.inner.replace_point(loser, winner)

    # ----------------------------------------------------------------------
    def _run(self):
        while True:
            try:
                kf = self._q.get(timeout=0.2)
            except queue.Empty:
                if self._stop:
                    return
                self._idle.set()
                continue
            try:
                # the inner mapper takes the map lock per stage; holding it
                # across the whole pass (incl. BA) would stall the tracker
                self.inner.process_keyframe(kf)
            except Exception as e:  # pragma: no cover
                print(f"[async-mapper] error on KF {kf}: {e!r}")
            finally:
                if self._q.empty():
                    self._idle.set()

    def wait_idle(self, timeout: float | None = None):
        self._idle.wait(timeout)

    def shutdown(self):
        self._stop = True
        self._thread.join(timeout=5.0)


class AsyncLoopCloser:
    """LoopClosing on its own worker thread — the reference's LoopClosing
    pthread (LoopClosing.cc:76-116, System.cc:96): keyframes queue up, the
    worker runs detection → Sim3 → correction → GBA while the tracker keeps
    retiring frames. Corrections reach the tracker through the gauge-delta
    protocol (Tracker.apply_gauge_correction) instead of the reference's
    stop-the-world map mutex; GBA interruption rides the mapper's
    ``should_abort`` (a queued keyframe aborts the stepped BA mid-flight —
    mbStopGBA semantics, LoopClosing.cc:641-647)."""

    def __init__(self, inner):
        self.inner = inner
        self.lock = inner.lock
        self._q: queue.Queue = queue.Queue()
        self._stop = False
        self._idle = threading.Event()
        self._idle.set()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    # LoopCloser interface -------------------------------------------------
    @property
    def n_loops_closed(self):
        return self.inner.n_loops_closed

    @property
    def last_loop_kf(self):
        return self.inner.last_loop_kf

    @property
    def last_loop_pair(self):
        return self.inner.last_loop_pair

    @property
    def enable_gba(self):
        return self.inner.enable_gba

    @enable_gba.setter
    def enable_gba(self, v):
        self.inner.enable_gba = v

    @property
    def tracker(self):
        return self.inner.tracker

    @tracker.setter
    def tracker(self, t):
        self.inner.tracker = t

    def process_keyframe(self, kf: int):
        self._idle.clear()
        self._q.put(kf)

    # ----------------------------------------------------------------------
    def _run(self):
        while True:
            try:
                kf = self._q.get(timeout=0.2)
            except queue.Empty:
                if self._stop:
                    return
                self._idle.set()
                continue
            # coalesce: only the newest queued keyframe matters for
            # detection (the reference drains mlpLoopKeyFrameQueue one by
            # one but aborts a running GBA when more arrive)
            try:
                self.inner.process_keyframe(kf)
            except Exception as e:  # pragma: no cover
                print(f"[async-loop] error on KF {kf}: {e!r}")
            finally:
                if self._q.empty():
                    self._idle.set()

    def wait_idle(self, timeout: float | None = None):
        self._idle.wait(timeout)

    def shutdown(self):
        self._stop = True
        self._thread.join(timeout=10.0)
