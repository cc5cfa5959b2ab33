#!/usr/bin/env python3
"""Summarize a jax.profiler trace: per-op device time, top-N.

Parses the XPlane protobufs that ``jax.profiler.start_trace`` writes
(``<dir>/plugins/profile/<run>/<host>.xplane.pb``) without needing
TensorBoard. This is the analysis half of the profiler parity story
(SURVEY.md section 5: reference has only stderr counters; we add device
traces + this offline summarizer).

Usage: python tools/trace_summary.py TRACE_DIR [--top 40] [--group]
"""

import argparse
import collections
import glob
import os
import re
import sys
import warnings

warnings.filterwarnings("ignore")


def load_xplanes(trace_dir):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    paths = glob.glob(os.path.join(
        trace_dir, "plugins", "profile", "*", "*.xplane.pb"))
    if not paths:
        paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                          recursive=True)
    spaces = []
    for p in sorted(paths):
        xs = xplane_pb2.XSpace()
        with open(p, "rb") as f:
            xs.ParseFromString(f.read())
        spaces.append((p, xs))
    return spaces


def device_op_times(xspace, line_name="XLA Ops"):
    """{op_name: (total_ps, count)} from one device trace line.

    Lines on the TPU device plane:
      'XLA Ops'       exclusive per-op compute time (sums to module time)
      'Async XLA Ops' DMA/copy activity (OVERLAPS compute; don't add to
                      the ops line)
      'XLA Modules'   whole-executable spans (one per jit dispatch)
    """
    out = collections.defaultdict(lambda: [0, 0])
    for plane in xspace.planes:
        name = plane.name
        if "TPU" not in name and "device" not in name.lower():
            continue
        if "host" in name.lower():
            continue
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            if line.name != line_name:
                continue
            for ev in line.events:
                nm = ev_meta.get(ev.metadata_id, "?")
                rec = out[nm]
                rec[0] += ev.duration_ps
                rec[1] += 1
    return {k: (v[0], v[1]) for k, v in out.items()}


_GROUP_PATTERNS = [
    ("i8i8_matmul(pallas)", r"i8i8_matmul_pallas"),
    ("paged_attn_decode(pallas)", r"decode.*custom-call|_decode_kernel"),
    ("paged_attn(pallas)", r"tpu_custom_call|custom-call"),
    ("matmul/conv", r"^(dot|fusion.*dot)|convolution"),
    ("scatter", r"scatter"),
    ("gather/dynamic-slice", r"gather|dynamic-slice|dynamic_slice"),
    ("copy/transpose", r"copy|transpose|bitcast"),
    ("allreduce/collective", r"all-reduce|all-gather|collective"),
    ("sort/topk", r"sort|top-k|approx"),
    ("fusion(other)", r"^fusion"),
]


def module_timeline(xspace, line_name="XLA Modules"):
    """[(start_ps, dur_ps, name)] sorted by start, from the device plane.

    Used by --timeline to separate device-busy time from device-idle
    gaps (host not keeping the device fed) — per-op exclusive times
    can't show gaps."""
    events = []
    for plane in xspace.planes:
        name = plane.name
        if "TPU" not in name and "device" not in name.lower():
            continue
        if "host" in name.lower():
            continue
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            if line.name != line_name:
                continue
            for ev in line.events:
                events.append((ev.offset_ps, ev.duration_ps,
                               ev_meta.get(ev.metadata_id, "?")))
    events.sort()
    return events


def print_timeline(spaces):
    import collections as C
    for path, xs in spaces:
        evs = module_timeline(xs)
        if not evs:
            continue
        print(f"== {path}")
        span = (evs[-1][0] + evs[-1][1] - evs[0][0]) / 1e9
        busy = sum(d for _, d, _ in evs) / 1e9
        per_mod = C.defaultdict(lambda: [0, 0])
        gaps = []
        prev_end = None
        for s, d, nm in evs:
            per_mod[nm.split(".")[0]][0] += d
            per_mod[nm.split(".")[0]][1] += 1
            if prev_end is not None and s > prev_end:
                gaps.append((s - prev_end) / 1e9)
            prev_end = max(prev_end or 0, s + d)
        print(f"span {span:.1f} ms, device busy {busy:.1f} ms "
              f"({100 * busy / span:.0f}%), idle {span - busy:.1f} ms")
        gaps.sort(reverse=True)
        print("largest gaps (ms):",
              " ".join(f"{g:.1f}" for g in gaps[:10]))
        for nm, (ps, n) in sorted(per_mod.items(), key=lambda kv: -kv[1][0]):
            print(f"  {nm[:70]:<70} {ps / 1e9:>9.2f} ms  n={n}  "
                  f"avg {ps / 1e9 / n:.2f} ms")


def group_name(op):
    for gname, pat in _GROUP_PATTERNS:
        if re.search(pat, op):
            return gname
    return "other"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--group", action="store_true",
                    help="aggregate by op category")
    ap.add_argument("--filter", default="",
                    help="only ops whose name matches this regex")
    ap.add_argument("--wide", action="store_true",
                    help="show 140-char op names")
    ap.add_argument("--line", default="XLA Ops",
                    choices=["XLA Ops", "Async XLA Ops", "XLA Modules"],
                    help="device trace line to aggregate")
    ap.add_argument("--timeline", action="store_true",
                    help="module-level busy/idle timeline (host-gap "
                         "detection)")
    args = ap.parse_args()

    spaces = load_xplanes(args.trace_dir)
    if not spaces:
        print(f"no xplane.pb found under {args.trace_dir}", file=sys.stderr)
        sys.exit(1)
    if args.timeline:
        print_timeline(spaces)
        return

    total = collections.defaultdict(lambda: [0, 0])
    for path, xs in spaces:
        for op, (ps, n) in device_op_times(xs, line_name=args.line).items():
            total[op][0] += ps
            total[op][1] += n

    if args.filter:
        pat = re.compile(args.filter)
        total = {k: v for k, v in total.items() if pat.search(k)}

    if args.group:
        grouped = collections.defaultdict(lambda: [0, 0])
        for op, (ps, n) in total.items():
            g = grouped[group_name(op)]
            g[0] += ps
            g[1] += n
        total = grouped

    width = 140 if args.wide else 64
    rows = sorted(total.items(), key=lambda kv: -kv[1][0])
    all_ms = sum(ps for ps, _ in total.values()) / 1e9
    print(f"{'op':<{width}} {'ms':>10} {'%':>6} {'count':>8}")
    for op, (ps, n) in rows[: args.top]:
        ms = ps / 1e9
        pct = 100 * ms / all_ms if all_ms else 0
        print(f"{op[:width]:<{width}} {ms:>10.3f} {pct:>6.1f} {n:>8}")
    print(f"{'TOTAL(shown scope)':<{width}} {all_ms:>10.3f}")


if __name__ == "__main__":
    main()
