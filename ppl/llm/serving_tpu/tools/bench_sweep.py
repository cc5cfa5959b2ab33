#!/usr/bin/env python3
"""Run the round's hardware measurement plan end-to-end.

Executes bench.py across the config/knob matrix from COMPONENTS.md's
measurement plan (i8i8 re-baseline, bf16, the LLaMA-2-7B-shapes
north-star config, then cheap knob sweeps on the winner), appending one
JSON line per run to ``BENCH_SWEEP.jsonl`` so partial progress survives
a tunnel death. Skips configs already recorded (same key) unless
``--force``. Each run inherits the persistent XLA compilation cache, so
re-runs after a crash are warm.

Usage:
    python tools/bench_sweep.py              # full plan
    python tools/bench_sweep.py i8i8 bf16    # named subset
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "BENCH_SWEEP.jsonl")

# (key, env) in execution order: re-baseline first, then the north-star
# 7B config, then knob sweeps that reuse the warm cache where possible.
PLAN = [
    ("i8i8", {"BENCH_CONFIG": "i8i8"}),
    ("bf16", {"BENCH_CONFIG": "bf16"}),
    ("i8i8_7b", {"BENCH_CONFIG": "i8i8_7b"}),
    ("w4", {"BENCH_CONFIG": "w4"}),
    ("w4_7b", {"BENCH_CONFIG": "w4_7b"}),
    ("i8i8_ms32", {"BENCH_CONFIG": "i8i8", "BENCH_MULTI_STEP": "32"}),
    ("i8i8_spec2", {"BENCH_CONFIG": "i8i8", "BENCH_SPEC_BLOCKS": "2"}),
    ("i8i8_sb4", {"BENCH_CONFIG": "i8i8", "BENCH_SEQ_BLOCK": "4"}),
    ("i8i8_sb16", {"BENCH_CONFIG": "i8i8", "BENCH_SEQ_BLOCK": "16"}),
]


def done_keys():
    keys = set()
    if os.path.exists(OUT):
        with open(OUT) as f:
            for line in f:
                try:
                    rec = json.loads(line)
                except ValueError:
                    continue
                if rec.get("value", 0) > 0 and rec.get("backend") != "cpu":
                    keys.add(rec.get("sweep_key"))
    return keys


def main():
    force = "--force" in sys.argv
    names = [a for a in sys.argv[1:] if not a.startswith("-")]
    plan = [(k, e) for k, e in PLAN if not names or k in names]
    skip = set() if force else done_keys()
    for key, extra in plan:
        if key in skip:
            print(f"[sweep] {key}: already recorded, skipping",
                  file=sys.stderr)
            continue
        env = dict(os.environ, **extra)
        t0 = time.time()
        print(f"[sweep] {key}: starting", file=sys.stderr, flush=True)
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            env=env, capture_output=True, text=True, timeout=3600)
        rec = {"sweep_key": key, "env": extra,
               "wall_s": round(time.time() - t0, 1)}
        for line in proc.stdout.splitlines():
            try:
                rec.update(json.loads(line))
                break
            except ValueError:
                continue
        if "value" not in rec:
            rec["value"] = 0
            rec["error"] = (proc.stderr.strip().splitlines() or ["no output"])[-1][:300]
        with open(OUT, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(f"[sweep] {key}: {rec.get('value')} tokens/s "
              f"({rec['wall_s']}s)", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
