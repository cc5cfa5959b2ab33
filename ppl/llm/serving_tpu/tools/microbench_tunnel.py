#!/usr/bin/env python3
"""Tunnel/host-turnaround microbenchmark.

Measures the host-side costs that bound the serving loop's per-block
turnaround (generator [PERF] ``choose token``, round-4: 97 ms avg per
16-token block at b64 — 2x the 13 ms dispatch cost and the admitted
canonical throughput ceiling):

1. blocking ``np.asarray`` of a small result — cold vs after
   ``copy_to_host_async`` (1 array vs 2 arrays vs packed-into-one);
2. ``jax.device_get`` of a tuple (does the runtime batch transfers?);
3. in-flight dispatch depth with donated carries — does the runtime
   block the Nth dispatch while N-1 are queued? (the round-3 verdict
   on ``speculative_blocks=2`` "pathological through the tunnel",
   config.py GeneratorConfig.speculative_blocks).

Run on the real chip: ``python tools/microbench_tunnel.py``.
"""

import os
import time

import numpy as np


def main():
    import jax
    if os.environ.get("PPL_PLATFORM"):   # hardware-free smoke runs
        jax.config.update("jax_platforms", os.environ["PPL_PLATFORM"])
    import jax.numpy as jnp

    from ppl.llm.serving_tpu.utils.compile_cache import configure
    configure(jax, flavor="tpu")

    dev = jax.devices()[0]
    print(f"backend={jax.default_backend()} device={dev.device_kind}")

    # a carrier program shaped like a decode block result: [16, 64]
    # tokens + [16, 64] logprobs, produced from a donated carry
    @jax.jit
    def step(c):
        c = c + 1.0
        toks = (c[:16, :64]).astype(jnp.int32)
        lps = c[16:32, :64]
        return c, toks, lps

    @jax.jit
    def step_packed(c):
        c = c + 1.0
        toks = (c[:16, :64]).astype(jnp.int32)
        lps = jax.lax.bitcast_convert_type(c[16:32, :64], jnp.int32)
        return c, jnp.concatenate([toks, lps], axis=0)

    c = jnp.zeros((64, 128), jnp.float32)
    for _ in range(3):                      # warm compiles
        c, t_, l_ = step(c)
    _ = np.asarray(t_); _ = np.asarray(l_)
    c2 = jnp.zeros((64, 128), jnp.float32)
    c2, p_ = step_packed(c2)
    _ = np.asarray(p_)

    def timeit(label, fn, n=10):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            ts.append((time.perf_counter() - t0) * 1e3)
        ts.sort()
        print(f"{label:42s} p50 {ts[n // 2]:7.2f} ms   "
              f"min {ts[0]:7.2f}   max {ts[-1]:7.2f}")

    # -- 1. fetch variants ---------------------------------------------------
    state = {"c": c, "t": t_, "l": l_}

    def fetch_two_sync():
        state["c"], t, l = step(state["c"])
        state["c"].block_until_ready()      # exclude device time
        np.asarray(t); np.asarray(l)

    def fetch_two_async():
        state["c"], t, l = step(state["c"])
        t.copy_to_host_async(); l.copy_to_host_async()
        state["c"].block_until_ready()
        np.asarray(t); np.asarray(l)

    def fetch_one_async():
        state["c"], t, l = step(state["c"])
        t.copy_to_host_async()
        state["c"].block_until_ready()
        np.asarray(t)

    def fetch_device_get():
        state["c"], t, l = step(state["c"])
        state["c"].block_until_ready()
        jax.device_get((t, l))

    pstate = {"c": c2}

    def fetch_packed_async():
        pstate["c"], p = step_packed(pstate["c"])
        p.copy_to_host_async()
        pstate["c"].block_until_ready()
        np.asarray(p)

    timeit("2 arrays, sync asarray", fetch_two_sync)
    timeit("2 arrays, copy_to_host_async first", fetch_two_async)
    timeit("1 array, copy_to_host_async first", fetch_one_async)
    timeit("device_get((t, l)) tuple", fetch_device_get)
    timeit("packed 1-array, copy_to_host_async", fetch_packed_async)

    # -- 2. dispatch-depth behavior ------------------------------------------
    # a slow-ish donated-carry program (~the cost of a small decode
    # block) so queue depth is observable
    @jax.jit
    def heavy(c, w):
        for _ in range(8):
            c = jnp.tanh(c @ w)
        return c, c[:16, :64].astype(jnp.int32)

    w = jnp.eye(512, dtype=jnp.float32) * 0.5
    h = jnp.ones((512, 512), jnp.float32)
    for _ in range(2):
        h, tt = heavy(h, w)
    np.asarray(tt)
    h.block_until_ready()

    t0 = time.perf_counter()
    h, _ = heavy(h, w)
    h.block_until_ready()
    block_ms = (time.perf_counter() - t0) * 1e3
    print(f"\nheavy block device time ~{block_ms:.1f} ms")

    for depth in (1, 2, 3, 4):
        h.block_until_ready()
        times = []
        t_start = time.perf_counter()
        outs = []
        for i in range(depth):
            t0 = time.perf_counter()
            h, tt = heavy(h, w)
            times.append((time.perf_counter() - t0) * 1e3)
            outs.append(tt)
        for tt in outs:
            np.asarray(tt)
        total = (time.perf_counter() - t_start) * 1e3
        disp = " ".join(f"{t:6.1f}" for t in times)
        print(f"depth {depth}: dispatch ms [{disp}]  "
              f"total(incl fetches) {total:7.1f} ms")


if __name__ == "__main__":
    main()
