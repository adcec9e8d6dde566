"""Aggregate a jax.profiler trace into a per-op device-time table.

Parses the xplane.pb written by `jax.profiler.trace(dir)` directly (the
tensorboard profile plugin in this image is ABI-incompatible with the
installed TF, so we read the XSpace proto ourselves via TF's tsl pb2).

    python scripts/op_profile.py /tmp/fe_trace [--top 30] [--line "XLA Ops"]

Prints: total device time per op name (summed over occurrences), count,
and share of the plane's busy time.  Use with a trace that wraps timed
reps only, and divide by the rep count yourself.
"""

import argparse
import collections
import glob
import os
import sys

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--line", default=None,
                    help="substring filter on line names (default: all)")
    ap.add_argument("--plane", default="TPU",
                    help="substring filter on plane names")
    args = ap.parse_args()

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(
        os.path.join(args.trace_dir, "**", "*.xplane.pb"), recursive=True))
    if not paths:
        sys.exit(f"no xplane.pb under {args.trace_dir}")
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(paths[-1], "rb").read())

    for plane in xs.planes:
        if args.plane not in plane.name:
            continue
        meta = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            if args.line and args.line not in line.name:
                continue
            agg = collections.defaultdict(lambda: [0.0, 0])
            span = 0.0
            for ev in line.events:
                name = meta.get(ev.metadata_id, str(ev.metadata_id))
                agg[name][0] += ev.duration_ps / 1e9  # ms
                agg[name][1] += 1
                span += ev.duration_ps / 1e9
            if not agg:
                continue
            print(f"\n== plane '{plane.name}' line '{line.name}' "
                  f"({len(line.events)} events, {span:.2f} ms busy) ==")
            rows = sorted(agg.items(), key=lambda kv: -kv[1][0])
            for name, (ms, cnt) in rows[:args.top]:
                print(f"{ms:10.3f} ms {100 * ms / span:5.1f}%  x{cnt:<6d} "
                      f"{name[:110]}")


if __name__ == "__main__":
    main()
