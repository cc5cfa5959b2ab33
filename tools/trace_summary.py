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


def device_op_times(xspace):
    """{op_name: (total_ps, count)} aggregated over device-side lines."""
    out = collections.defaultdict(lambda: [0, 0])
    for plane in xspace.planes:
        name = plane.name
        # TPU device planes: '/device:TPU:0' or 'TPU:0 (pid..)'-style;
        # skip host python/runtime planes
        if "TPU" not in name and "device" not in name.lower():
            continue
        if "host" in name.lower():
            continue
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            lname = line.name.lower()
            # XLA op lines carry the per-op breakdown; step/module lines
            # would double count
            if "step" in lname or "module" in lname:
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
    args = ap.parse_args()

    spaces = load_xplanes(args.trace_dir)
    if not spaces:
        print(f"no xplane.pb found under {args.trace_dir}", file=sys.stderr)
        sys.exit(1)

    total = collections.defaultdict(lambda: [0, 0])
    for path, xs in spaces:
        for op, (ps, n) in device_op_times(xs).items():
            total[op][0] += ps
            total[op][1] += n

    if args.group:
        grouped = collections.defaultdict(lambda: [0, 0])
        for op, (ps, n) in total.items():
            g = grouped[group_name(op)]
            g[0] += ps
            g[1] += n
        total = grouped

    rows = sorted(total.items(), key=lambda kv: -kv[1][0])
    all_ms = sum(ps for ps, _ in total.values()) / 1e9
    print(f"{'op':<64} {'ms':>10} {'%':>6} {'count':>8}")
    for op, (ps, n) in rows[: args.top]:
        ms = ps / 1e9
        pct = 100 * ms / all_ms if all_ms else 0
        print(f"{op[:64]:<64} {ms:>10.3f} {pct:>6.1f} {n:>8}")
    print(f"{'TOTAL(device op time)':<64} {all_ms:>10.3f}")


if __name__ == "__main__":
    main()
