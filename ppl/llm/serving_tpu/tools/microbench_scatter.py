#!/usr/bin/env python3
"""Micro-benchmark: KV-append scatter strategies on the real device.

The decode block spends ~6-8 ms per 16-step block in 704 small row
scatters (22 layers x 16 steps x {values, scales}). This probes which
lowering/layout is fastest before committing to a cache-layout refactor:

  a) per-layer flat-view row scatter (current production shape)
  b) same with unique_indices + promise_in_bounds hints
  c) one fused scatter across all layers (stacked [L, KVH, S, R] cache)
  d) token-major stacked layout [L, S, KVH*R] (rows contiguous per
     (layer, token) -> 4x fewer scatter rows)
  e) dynamic_update_slice per page run (best case: all tokens one page)

Run on TPU: python tools/microbench_scatter.py
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

L, KVH, PS, R = 22, 4, 128, 128   # TinyLlama i8i8: 128-lane int8 rows
NPAGES = 1024
S = (NPAGES + 1) * PS
T = 64                            # decode batch
STEPS = 16                        # steps per block (for reporting)


def timeit(fn, *args, n=30):
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
    rows_t = jnp.asarray(rng.randint(-127, 127, (T, KVH, R), np.int8))

    # a/b: per-layer scatter into [KVH, S, R] flat view
    def per_layer(cache, rows, slots, hints):
        h = jnp.arange(KVH, dtype=jnp.int32)[:, None] * S
        ids = (h + slots[None, :]).reshape(-1)
        flat = cache.reshape(KVH * S, R)
        kw = (dict(unique_indices=True, mode="promise_in_bounds")
              if hints else {})
        flat = flat.at[ids].set(
            rows.transpose(1, 0, 2).reshape(-1, R), **kw)
        return flat.reshape(cache.shape)

    @functools.partial(jax.jit, donate_argnums=(0,), static_argnums=(3,))
    def all_layers_sep(caches, rows, slots, hints):
        return [per_layer(c, rows, slots, hints) for c in caches]

    # c: one scatter over stacked [L, KVH, S, R]
    @functools.partial(jax.jit, donate_argnums=(0,))
    def stacked_one(cache, rows_l, slots):
        lh = (jnp.arange(L * KVH, dtype=jnp.int32)[:, None]) * S
        ids = (lh + slots[None, :]).reshape(-1)
        flat = cache.reshape(L * KVH * S, R)
        flat = flat.at[ids].set(
            rows_l.transpose(0, 2, 1, 3).reshape(-1, R),
            unique_indices=True, mode="promise_in_bounds")
        return flat.reshape(cache.shape)

    # d: token-major stacked [L, S, KVH*R]
    @functools.partial(jax.jit, donate_argnums=(0,))
    def tokmajor_one(cache, rows_l, slots):
        lid = jnp.arange(L, dtype=jnp.int32)[:, None] * S
        ids = (lid + slots[None, :]).reshape(-1)
        flat = cache.reshape(L * S, KVH * R)
        flat = flat.at[ids].set(
            rows_l.reshape(L, T, KVH * R).reshape(-1, KVH * R),
            unique_indices=True, mode="promise_in_bounds")
        return flat.reshape(cache.shape)

    caches = [jnp.zeros((KVH, S, R), jnp.int8) for _ in range(L)]
    t_a = timeit(lambda c: all_layers_sep(c, rows_t, slots, False), caches)
    caches = [jnp.zeros((KVH, S, R), jnp.int8) for _ in range(L)]
    t_b = timeit(lambda c: all_layers_sep(c, rows_t, slots, True), caches)

    rows_l = jnp.asarray(rng.randint(-127, 127, (L, T, KVH, R), np.int8))
    cache_s = jnp.zeros((L, KVH, S, R), jnp.int8)
    t_c = timeit(lambda c: stacked_one(c, rows_l, slots), cache_s)
    cache_t = jnp.zeros((L, S, KVH * R), jnp.int8)
    t_d = timeit(lambda c: tokmajor_one(c, rows_l, slots), cache_t)

    print(f"a) per-layer x{L}, no hints : {t_a*1e6:9.1f} us/step "
          f"({t_a*STEPS*1e3:6.2f} ms/block)")
    print(f"b) per-layer x{L}, hints    : {t_b*1e6:9.1f} us/step "
          f"({t_b*STEPS*1e3:6.2f} ms/block)")
    print(f"c) stacked 1-scatter        : {t_c*1e6:9.1f} us/step "
          f"({t_c*STEPS*1e3:6.2f} ms/block)")
    print(f"d) token-major 1-scatter    : {t_d*1e6:9.1f} us/step "
          f"({t_d*STEPS*1e3:6.2f} ms/block)")
    sys.stdout.flush()


if __name__ == "__main__":
    main()
