#!/usr/bin/env python3
"""Compile-and-run every Pallas kernel variant standalone on the current
backend with small shapes. Run BEFORE a full bench after any kernel
change: a Mosaic-illegal kernel then fails one cheap compile instead of
crashing the remote compile helper mid-warmup (which has wedged the
tunnel terminal before — see docs/performance.md).

Usage:  python tools/validate_kernels.py          # current backend (TPU)
        PPL_PLATFORM=cpu python tools/validate_kernels.py --interpret
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

from ppl.llm.serving_tpu.ops import kv_cache as kv_ops
from ppl.llm.serving_tpu.ops.kv_cache import CacheSpec
from ppl.llm.serving_tpu.ops.pallas import paged_attention as pk
from ppl.llm.serving_tpu.ops.pallas.quant_matmul import (
    i8i8_matmul_pallas, w4a8_matmul_pallas)


def check(name, fn):
    t0 = time.time()
    try:
        out = fn()
        jax.block_until_ready(out)
        print(f"  ok   {name}  ({time.time() - t0:.1f}s)")
        return True
    except Exception as e:
        print(f"  FAIL {name}: {type(e).__name__}: {str(e)[:300]}")
        return False


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--interpret", action="store_true",
                   help="Pallas interpreter mode (CPU)")
    p.add_argument("--head-dim", type=int, default=64)
    args = p.parse_args()
    interp = args.interpret
    hd = args.head_dim
    shd = -(-hd // 64) * 64
    print(f"backend={jax.default_backend()} devices={jax.devices()}")

    rng = np.random.RandomState(0)
    ok = True
    for quant in (False, True):
        spec = CacheSpec(num_layers=2, num_pages=8, page_size=128,
                         num_kv_heads=4, head_dim=hd,
                         quant_bit=8 if quant else 0,
                         quant_group=8 if quant else 1,
                         dtype=jnp.bfloat16, storage_head_dim=shd)
        cache, scale = kv_ops.init_cache(spec)
        pt = jnp.asarray(rng.randint(0, 8, (8, 2)).astype(np.int32))
        ctx = jnp.asarray(rng.randint(1, 250, 8).astype(np.int32))
        q = jnp.asarray(rng.randn(8, 8, hd), jnp.bfloat16)
        fk = jnp.asarray(rng.randn(8, 4, hd), jnp.bfloat16)
        tag = "int8" if quant else "bf16"

        ok &= check(f"decode/{tag}", lambda: pk.paged_decode_attention(
            q, cache, scale, pt, ctx, spec, layer=1, seq_block=4,
            interpret=interp))
        ok &= check(f"decode/{tag}/deferred", lambda:
                    pk.paged_decode_attention(
                        q, cache, scale, pt, ctx, spec, layer=1,
                        fresh_k=fk, fresh_v=fk, seq_block=4,
                        interpret=interp))
        qp = jnp.asarray(rng.randn(2, 128, 8, hd), jnp.bfloat16)
        ok &= check(f"prefill/{tag}", lambda: pk.paged_prefill_attention(
            qp, cache, scale, pt[:2], jnp.zeros(2, jnp.int32),
            jnp.asarray([100, 60], jnp.int32), spec, layer=1,
            interpret=interp))
        # deferred append: this step's K/V streams from dense fresh
        # inputs (the production prefill path). Covers the dynamic
        # page-offset slice Mosaic rejects without the multiple_of hint,
        # with a page-aligned prefix-hit start AND a full-hit replay
        # start (mid-page; fresh branch unreachable but still compiled).
        kf = jnp.asarray(rng.randn(2, 128, 4, hd), jnp.bfloat16)
        vf = jnp.asarray(rng.randn(2, 128, 4, hd), jnp.bfloat16)
        if quant:
            qk, sk = kv_ops.quantize_kv(kf, spec.quant_group)
            qv, sv = kv_ops.quantize_kv(vf, spec.quant_group)
            fkv = kv_ops.pack_kv_rows(qk, qv, spec).transpose(0, 2, 1, 3)
            fsc = kv_ops._pack_scale_rows(sk, sv, spec)
        else:
            fkv = kv_ops.pack_kv_rows(
                kf.astype(jnp.bfloat16), vf.astype(jnp.bfloat16),
                spec).transpose(0, 2, 1, 3)
            fsc = None
        for sname, starts in (("hit", [128, 0]), ("fullhit", [255, 0])):
            ok &= check(
                f"prefill/{tag}/deferred/{sname}",
                lambda starts=starts: pk.paged_prefill_attention(
                    qp, cache, scale, pt[:2],
                    jnp.asarray(starts, jnp.int32),
                    jnp.asarray([1 if starts[0] % 128 else 100, 60],
                                jnp.int32),
                    spec, layer=1, fresh_kv=fkv, fresh_scale=fsc,
                    interpret=interp))

        # the fused all-layer scatter + per-layer append (XLA side)
        ks = jnp.asarray(rng.randn(2, 8, 4, hd), jnp.bfloat16)
        slots = jnp.arange(8, dtype=jnp.int32)
        ok &= check(f"append_block/{tag}", lambda: jax.jit(
            lambda c, s: kv_ops.append_kv_block(c, s, ks, ks, slots, spec),
            donate_argnums=(0,))(cache, scale))

    x = jnp.asarray(rng.randn(64, 2048), jnp.bfloat16)
    w2 = jnp.asarray(rng.randint(-127, 127, (2048, 512)), jnp.int8)
    s2 = jnp.ones((512,), jnp.float32)
    ok &= check("i8i8/2d", lambda: i8i8_matmul_pallas(
        x, w2, s2, interpret=interp))
    wf = jnp.asarray(rng.randint(-127, 127, (2, 2048, 512)), jnp.int8)
    sf = jnp.ones((2, 512), jnp.float32)
    ok &= check("i8i8/fused-c-leading", lambda: i8i8_matmul_pallas(
        x, wf, sf, interpret=interp))
    xp = jnp.asarray(rng.randn(4096, 2048), jnp.bfloat16)
    ok &= check("i8i8/prefill-tile", lambda: i8i8_matmul_pallas(
        xp, w2, s2, interpret=interp))

    w4 = jnp.asarray(rng.randint(-128, 127, (1024, 512)), jnp.int8)
    s4 = jnp.ones((16, 512), jnp.float32)       # group=128
    ok &= check("w4a8/2d", lambda: w4a8_matmul_pallas(
        x, w4, s4, interpret=interp))
    w4f = jnp.asarray(rng.randint(-128, 127, (2, 1024, 512)), jnp.int8)
    s4f = jnp.ones((2, 16, 512), jnp.float32)
    ok &= check("w4a8/fused-c-leading", lambda: w4a8_matmul_pallas(
        x, w4f, s4f, interpret=interp))
    ok &= check("w4a8/prefill-tile", lambda: w4a8_matmul_pallas(
        xp, w4, s4, interpret=interp))
    # down-proj shape: g=44 is not a multiple of the group chunk
    xd = jnp.asarray(rng.randn(64, 5632), jnp.bfloat16)
    w4d = jnp.asarray(rng.randint(-128, 127, (2816, 512)), jnp.int8)
    s4d = jnp.ones((44, 512), jnp.float32)
    ok &= check("w4a8/down-proj-g44", lambda: w4a8_matmul_pallas(
        xd, w4d, s4d, interpret=interp))

    if not interp:
        # 7B down-proj prefill tile (D=11008, T=4128): the shape whose
        # quantize-pass f32 stack blew the 64 MB scoped-VMEM limit
        # (bench_7b 2026-08-19). Compile-time failure mode, so TPU-only;
        # interpret mode would grind through ~47 GFLOP in numpy.
        x7 = jnp.asarray(rng.randn(4128, 11008), jnp.bfloat16)
        w7 = jnp.asarray(rng.randint(-127, 127, (11008, 512)), jnp.int8)
        s7 = jnp.ones((512,), jnp.float32)
        ok &= check("i8i8/7b-downproj-tile", lambda: i8i8_matmul_pallas(
            x7, w7, s7))
        w47 = jnp.asarray(rng.randint(-128, 127, (5504, 512)), jnp.int8)
        s47 = jnp.ones((86, 512), jnp.float32)
        ok &= check("w4a8/7b-downproj-tile", lambda: w4a8_matmul_pallas(
            x7, w47, s47))

    print("ALL OK" if ok else "FAILURES PRESENT")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
