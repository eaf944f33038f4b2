"""Aggregate per-op device times from a jax.profiler xplane.pb capture.

Usage: PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
       python scripts/xplane_report.py /tmp/xtrace_lsd [top_n] [iters]

``iters`` must match the rep count of the loop that produced the trace
(trace_ops.py uses 10); per-iteration times divide by it.
"""

import collections
import glob
import sys

from tensorflow.tsl.profiler.protobuf import xplane_pb2


def main():
    logdir = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    path = sorted(glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True))[-1]
    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())

    for plane in xs.planes:
        if "TPU" not in plane.name and "/device:" not in plane.name:
            continue
        meta = {m_id: m.name for m_id, m in plane.event_metadata.items()}
        print(f"== plane: {plane.name}")
        for line in plane.lines:
            tot = collections.Counter()
            cnt = collections.Counter()
            for ev in line.events:
                name = meta.get(ev.metadata_id, "?")
                tot[name] += ev.duration_ps
                cnt[name] += 1
            if not tot:
                continue
            total_ps = sum(tot.values())
            print(
                f"-- line: {line.name}  total/iter: {total_ps/1e9/iters:.3f} ms"
            )
            for name, ps in tot.most_common(top_n):
                print(f"{ps/1e9/iters:9.4f} ms  x{cnt[name]:4d}  {name[:100]}")


if __name__ == "__main__":
    main()
