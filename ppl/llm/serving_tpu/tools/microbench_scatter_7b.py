#!/usr/bin/env python3
"""Scatter microbench at LLaMA-2-7B geometry (MHA: 32 kv heads).

The 7B decode-block trace (2026-08-19) attributes ~10.4 ms PER STEP to
the all-layer KV row scatter — a full read+write sweep of the 4.3 GB
cache (s8[16908288,256] loop fusions), where the identical formulation
measured 38 us at TinyLlama geometry. This probes formulations at the
7B shape so the fix is chosen from data, not XLA guesswork:

  a) production: flat [KVH*L*S, R] row scatter, kvh-major ids, no hints
  b) a + unique_indices + promise_in_bounds (HURT at tiny geometry;
     the lowering may invert at this scale)
  c) a with SORTED row ids (XLA's scatter fast path wants monotonic)
  d) multi-axis .at[:, lslots].set (rejected at tiny geometry for
     relayout copies)
  e) one dynamic_update_slice per KV head row-run (upper bound if all
     updates were contiguous)

Run on TPU: python tools/microbench_scatter_7b.py
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

L, KVH, PS, R = 32, 32, 128, 256   # 7B int8: packed k|v rows, 256 lanes
NPAGES = 128                       # 16k tokens
S = (NPAGES + 1) * PS
T = 32                             # decode batch
STEPS = 16


def timeit(fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    rng = np.random.RandomState(0)
    slots = jnp.asarray(rng.choice(NPAGES * PS, T, replace=False)
                        .astype(np.int32))
    rows_l = jnp.asarray(rng.randint(-127, 127, (L, T, KVH, R), np.int8))

    def ids_kvh_major(slots, sort=False):
        lslots = (jnp.arange(L, dtype=jnp.int32)[:, None] * S
                  + slots[None, :])
        h = jnp.arange(KVH, dtype=jnp.int32)[:, None] * (L * S)
        ids = (h + lslots.reshape(-1)[None, :]).reshape(-1)
        return ids

    @functools.partial(jax.jit, donate_argnums=(0,), static_argnums=(3, 4))
    def flat_scatter(cache, rows_l, slots, hints, sort):
        ids = ids_kvh_major(slots)
        vals = rows_l.transpose(2, 0, 1, 3).reshape(-1, R)
        if sort:
            order = jnp.argsort(ids)
            ids = ids[order]
            vals = vals[order]
        flat = cache.reshape(KVH * L * S, R)
        kw = (dict(unique_indices=True, mode="promise_in_bounds")
              if hints else {})
        flat = flat.at[ids].set(vals, **kw)
        return flat.reshape(cache.shape)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def multiaxis_scatter(cache, rows_l, slots):
        lslots = (jnp.arange(L, dtype=jnp.int32)[:, None] * S
                  + slots[None, :]).reshape(-1)
        return cache.at[:, lslots].set(
            rows_l.transpose(2, 0, 1, 3).reshape(KVH, L * T, R))

    @functools.partial(jax.jit, donate_argnums=(0,))
    def dus_per_head(cache, rows_l, base):
        # contiguity upper bound: T rows land in one run per (head,layer)
        flat = cache.reshape(KVH * L * S, R)
        for h in range(KVH):
            vals = rows_l[:, :, h].reshape(L * T, R)
            flat = jax.lax.dynamic_update_slice(
                flat, vals, (h * L * S + base, 0))
        return flat.reshape(cache.shape)

    gb = KVH * L * S * R / 1e9
    print(f"cache {gb:.2f} GB, {KVH * L * T} rows/step", flush=True)
    cache = jnp.zeros((KVH, L * S, R), jnp.int8)
    t_a = timeit(lambda c: flat_scatter(c, rows_l, slots, False, False),
                 cache)
    print(f"a) flat row scatter, no hints : {t_a*1e3:8.3f} ms/step "
          f"({t_a*STEPS*1e3:7.2f} ms/block)", flush=True)
    cache = jnp.zeros((KVH, L * S, R), jnp.int8)
    t_b = timeit(lambda c: flat_scatter(c, rows_l, slots, True, False),
                 cache)
    print(f"b) + unique/in-bounds hints   : {t_b*1e3:8.3f} ms/step",
          flush=True)
    cache = jnp.zeros((KVH, L * S, R), jnp.int8)
    t_c = timeit(lambda c: flat_scatter(c, rows_l, slots, True, True),
                 cache)
    print(f"c) hints + sorted ids         : {t_c*1e3:8.3f} ms/step",
          flush=True)
    cache = jnp.zeros((KVH, L * S, R), jnp.int8)
    t_d = timeit(lambda c: multiaxis_scatter(c, rows_l, slots), cache)
    print(f"d) multi-axis .at[:, lslots]  : {t_d*1e3:8.3f} ms/step",
          flush=True)
    cache = jnp.zeros((KVH, L * S, R), jnp.int8)
    t_e = timeit(lambda c: dus_per_head(c, rows_l, jnp.int32(4096)), cache)
    print(f"e) dyn-update-slice upper bnd : {t_e*1e3:8.3f} ms/step",
          flush=True)

    # The isolated scatter measured 23 us/step, yet the production block
    # program shows 2.6 ms full-cache sweeps. Reproduce the block
    # structure to find the trigger: chained scatters, and scatters
    # interleaved with a pallas_call reading the cache (the attention
    # kernels take it in ANY memory space — XLA cannot see their
    # aliasing and may copy conservatively).
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def read_kernel(c_ref, o_ref, buf, sem):
        pltpu.make_async_copy(c_ref.at[:, pl.ds(0, PS), :], buf,
                              sem).start()
        pltpu.make_async_copy(c_ref.at[:, pl.ds(0, PS), :], buf,
                              sem).wait()
        o_ref[...] = buf[:, :8, :].astype(jnp.float32)

    def pallas_read(cache):
        return pl.pallas_call(
            read_kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((KVH, 8, R), jnp.float32),
            scratch_shapes=[pltpu.VMEM((KVH, PS, R), jnp.int8),
                            pltpu.SemaphoreType.DMA],
        )(cache)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def chained(cache, rows_l, slots):
        for i in range(STEPS):
            ids = ids_kvh_major(slots + i)
            flat = cache.reshape(KVH * L * S, R)
            flat = flat.at[ids].set(
                rows_l.transpose(2, 0, 1, 3).reshape(-1, R))
            cache = flat.reshape(cache.shape)
        return cache

    @functools.partial(jax.jit, donate_argnums=(0,))
    def chained_with_read(cache, rows_l, slots):
        outs = []
        for i in range(STEPS):
            outs.append(pallas_read(cache))
            ids = ids_kvh_major(slots + i)
            flat = cache.reshape(KVH * L * S, R)
            flat = flat.at[ids].set(
                rows_l.transpose(2, 0, 1, 3).reshape(-1, R))
            cache = flat.reshape(cache.shape)
        return cache, jnp.stack(outs).sum()

    cache = jnp.zeros((KVH, L * S, R), jnp.int8)
    t_f = timeit(lambda c: chained(c, rows_l, slots), cache, n=10)
    print(f"f) 16 chained scatters        : {t_f/STEPS*1e3:8.3f} ms/step",
          flush=True)
    cache = jnp.zeros((KVH, L * S, R), jnp.int8)
    t_g = timeit(lambda c: chained_with_read(c, rows_l, slots), cache,
                 n=10)
    print(f"g) chained + pallas ANY read  : {t_g/STEPS*1e3:8.3f} ms/step",
          flush=True)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def chained_read_after(cache, rows_l, slots):
        # production order: each pallas read depends on the PREVIOUS
        # scatter (true data dependency through the opaque custom call)
        outs = []
        for i in range(STEPS):
            ids = ids_kvh_major(slots + i)
            flat = cache.reshape(KVH * L * S, R)
            flat = flat.at[ids].set(
                rows_l.transpose(2, 0, 1, 3).reshape(-1, R))
            cache = flat.reshape(cache.shape)
            outs.append(pallas_read(cache))
        return cache, jnp.stack(outs).sum()

    cache = jnp.zeros((KVH, L * S, R), jnp.int8)
    t_h = timeit(lambda c: chained_read_after(c, rows_l, slots), cache,
                 n=10)
    print(f"h) scatter -> read -> scatter : {t_h/STEPS*1e3:8.3f} ms/step",
          flush=True)


if __name__ == "__main__":
    main()
