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

    def run_local_ba(self, kf: int, window=None):
        self.inner.run_local_ba(kf, window)

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
