#!/usr/bin/env python3
"""Microbench the fused i8i8/w4a8 matmul kernels at production shapes.

Round-2 trace: at LLaMA-2-7B decode (T=32) the i8i8 matmuls take
~10.5 ms/step against an 8.3 ms weight-stream floor (BASELINE.md wave
anatomy). This tool times each production matmul call shape standalone
across block_n/block_t choices, against its own floor = weight bytes /
HBM bandwidth, to find whether the 2.2 ms gap is block-granularity
overhead (many small grid steps), pipeline bubbles, or inter-kernel gaps
(in which case it will NOT reproduce standalone).

Usage:  python tools/microbench_quant_matmul.py [--config 7b|tiny]
        [--method i8i8|w4a8] [--t 32] [--block-n 0=auto,512,1024] ...
"""

import argparse
import os
import sys
import time


import jax

if os.environ.get("PPL_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["PPL_PLATFORM"])
from ppl.llm.serving_tpu.utils.compile_cache import configure  # noqa: E402

configure(jax, flavor="tpu")

import jax.numpy as jnp
import numpy as np

from ppl.llm.serving_tpu.ops.pallas.quant_matmul import (
    i8i8_matmul_pallas, w4a8_matmul_pallas)

V5E_HBM_GBPS = 819.0


def shapes_7b():
    d, i = 4096, 11008
    # (name, d, c, n) of the fused production calls (models/llama.py)
    return [("wqkv", d, 1, 3 * d), ("wo", d, 1, d),
            ("gate_up", d, 2, i), ("down", i, 1, d),
            ("lm_head", d, 1, 32000)]


def shapes_tiny():
    d, i = 2048, 5632
    return [("wqkv", d, 1, 2048 + 2 * 256), ("wo", d, 1, d),
            ("gate_up", d, 2, i), ("down", i, 1, d),
            ("lm_head", d, 1, 32000)]


def bench_one(method, t, d, c, n, bn, bt, iters=50):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(t, d), jnp.bfloat16)
    if method == "i8i8":
        w = jnp.asarray(rng.randint(-127, 127, (c, d, n)), jnp.int8)
        s = jnp.asarray(rng.rand(c, n), jnp.float32)
        fn = lambda: i8i8_matmul_pallas(
            x, w, s, block_n=bn, block_t=bt, out_dtype=jnp.bfloat16,
            interpret=jax.default_backend() == "cpu")
        wbytes = c * d * n
    else:
        g = d // 128
        w = jnp.asarray(rng.randint(0, 255, (c, d // 2, n)), jnp.int8)
        s = jnp.asarray(rng.rand(c, g, n), jnp.float32)
        fn = lambda: w4a8_matmul_pallas(
            x, w, s, block_n=bn, block_t=bt, out_dtype=jnp.bfloat16,
            interpret=jax.default_backend() == "cpu")
        wbytes = c * d * n // 2
    out = fn()
    out.block_until_ready()  # compile
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    out.block_until_ready()
    us = (time.perf_counter() - t0) / iters * 1e6
    floor_us = wbytes / (V5E_HBM_GBPS * 1e3)
    return us, floor_us


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", default="7b", choices=["7b", "tiny"])
    p.add_argument("--method", default="i8i8", choices=["i8i8", "w4a8"])
    p.add_argument("--t", type=int, default=32)
    p.add_argument("--block-n", default="0,512,1024,2048")
    p.add_argument("--block-t", default="0")
    p.add_argument("--iters", type=int, default=50)
    args = p.parse_args()

    shapes = shapes_7b() if args.config == "7b" else shapes_tiny()
    bns = [int(v) for v in args.block_n.split(",")]
    bts = [int(v) for v in args.block_t.split(",")]
    print(f"backend={jax.default_backend()} t={args.t} "
          f"method={args.method}")
    total_best, total_floor = 0.0, 0.0
    for name, d, c, n in shapes:
        best = None
        for bn in bns:
            for bt in bts:
                try:
                    us, floor = bench_one(args.method, args.t, d, c, n,
                                          bn, bt, args.iters)
                except Exception as e:  # noqa: BLE001 - sweep survives
                    print(f"  {name:<8} bn={bn:<5} bt={bt:<4} FAIL "
                          f"{type(e).__name__}: {str(e)[:80]}")
                    continue
                tag = ""
                if best is None or us < best[0]:
                    best = (us, bn, bt)
                    tag = " *"
                print(f"  {name:<8} bn={bn:<5} bt={bt:<4} {us:8.1f} us "
                      f"(floor {floor:7.1f}, {floor / us:5.1%}){tag}")
        if best is None:
            continue
        total_best += best[0]
        _, floor = bench_one(args.method, args.t, d, c, n,
                             best[1], best[2], 2)
        total_floor += floor
        print(f"  {name:<8} BEST bn={best[1]} bt={best[2]} "
              f"{best[0]:.1f} us")
    # one decode step = these five calls once per layer (lm_head once per
    # step, not per layer) — report the per-layer sum for context
    print(f"[RESULT] sum-of-best {total_best:.1f} us vs "
          f"floor {total_floor:.1f} us ({total_floor / total_best:.1%})")


if __name__ == "__main__":
    main()
