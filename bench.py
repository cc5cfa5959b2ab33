#!/usr/bin/env python3
"""Round benchmark: end-to-end continuous-batching decode throughput.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline", ...}.

Measures the full serving stack (generator + engine + fused step) on the
flagship single-chip config — TinyLlama-1.1B shapes, bf16, random weights
(throughput is weight-value independent) — with a decode-heavy continuous
batch. ``vs_baseline`` is the fraction of the single-chip HBM roofline
achieved (decode is bandwidth-bound: roofline tokens/s = HBM_BW /
bytes_touched_per_token); the reference publishes no numbers to compare
against (BASELINE.md).
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _probe_backend(retries=3, delay=45, timeout=240):
    """Probe backend availability in a SUBPROCESS with bounded retries.

    jax caches backend-init failure in-process, so a bare
    ``jax.default_backend()`` that throws once (e.g. the axon TPU tunnel
    is down at capture time — this killed the round-2 driver capture,
    BENCH_r02.json rc=1) cannot be retried in this process. Probe in a
    child; if the backend never comes up, fall back to a CPU smoke run so
    the capture still yields one parseable JSON line.
    """
    last_err = ""
    for attempt in range(retries):
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax; print(jax.default_backend())"],
                capture_output=True, text=True, timeout=timeout)
            if r.returncode == 0 and r.stdout.strip():
                return r.stdout.strip(), ""
            last_err = (r.stderr or "").strip().splitlines()[-1:] or ["rc!=0"]
            last_err = last_err[0][-200:]
        except subprocess.TimeoutExpired:
            last_err = f"backend probe timed out after {timeout}s"
        except Exception as e:  # noqa: BLE001 - must never crash the bench
            last_err = repr(e)[:200]
        print(f"[bench] backend probe attempt {attempt + 1}/{retries} "
              f"failed: {last_err}", file=sys.stderr, flush=True)
        if attempt + 1 < retries:
            time.sleep(delay)
    return None, last_err


_T0 = time.monotonic()

_BACKEND_ERROR = ""
if not os.environ.get("PPL_PLATFORM"):
    _probed, _BACKEND_ERROR = _probe_backend(
        retries=int(os.environ.get("BENCH_PROBE_RETRIES", "2")),
        delay=int(os.environ.get("BENCH_PROBE_DELAY", "30")),
        timeout=int(os.environ.get("BENCH_PROBE_TIMEOUT", "150")))
    if _probed is None:
        # TPU unreachable: degrade to the CPU smoke config instead of
        # crashing, and surface the error in the JSON output.
        os.environ["PPL_PLATFORM"] = "cpu"
        _BACKEND_ERROR = f"backend unavailable: {_BACKEND_ERROR}"

import jax

# Honor PPL_PLATFORM=cpu for hardware-free smoke runs (the environment's
# site hook pins JAX_PLATFORMS=axon before env vars can win).
if os.environ.get("PPL_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["PPL_PLATFORM"])

# Persistent compilation cache: the unrolled multi-step decode programs
# take minutes to compile; cache them across bench runs (repo-local so
# the driver's ~/.cache wipe between rounds can't cold-start us).
from ppl.llm.serving_tpu.utils.compile_cache import configure  # noqa: E402

configure(jax, flavor="tpu")

import numpy as np

from ppl.llm.serving_tpu.config import (GeneratorConfig, ModelConfig,
                                        ResourceConfig)
from ppl.llm.serving_tpu.connection import LocalConnection
from ppl.llm.serving_tpu.generator import LLMGenerator
from ppl.llm.serving_tpu.request import Request
from ppl.llm.serving_tpu.resources import create_engine
from ppl.llm.serving_tpu.tokenizer.factory import ByteTokenizer

V5E_HBM_GBPS = 819.0  # v5e HBM bandwidth, GB/s


def main():
    on_tpu = jax.default_backend() not in ("cpu",)
    # BENCH_CONFIG=i8i8 (default: int8 weights + int8 KV — the measured
    #     winner, 11.9k tok/s vs bf16's 10.2k on v5e) | bf16
    #   | i8i8_w (int8 weights, bf16 KV) | kv8 (bf16 weights, int8 KV)
    #   | w4 (groupwise-int4 weights + int8 KV) | w4_7b (7B shapes)
    #   | i8i8_7b (LLaMA-2-7B shapes, int8 weights + int8 KV — the
    #     BASELINE.json north-star config; ~7.5 GB int8 weights fit a
    #     single v5e chip's 16 GB HBM)
    # Default on TPU: TinyLlama i8i8 — the config that reliably finishes
    # inside a driver capture budget (round-4 lesson: defaulting to the
    # 7B config produced a timed-out, EMPTY artifact — BENCH_r04.json
    # rc=124 — which is strictly worse than a modest config that
    # completes). The 7B north-star numbers are produced by dedicated
    # runs (BENCH_CONFIG=i8i8_7b) and recorded in BASELINE.md.
    variant = os.environ.get("BENCH_CONFIG", "i8i8")
    model_name = "tinyllama1.1b"
    if on_tpu and variant in ("i8i8_7b", "w4_7b"):
        model_name = "llama2-7b"
        model_cfg = ModelConfig(
            hidden_dim=4096, intermediate_dim=11008, num_layers=32,
            num_heads=32, num_kv_heads=32, vocab_size=32000,
            cache_mode=1, page_size=128, dtype="bfloat16")
        # b48 is the measured single-chip sweet spot (BASELINE.md round
        # 3: 1502 tok/s; b64 regresses) and fits the 16k-token pool
        # (48 x 256 = 12288); a single 48x128 prefill step OOMs at
        # compile, so prefill runs in waves of 16
        batch = int(os.environ.get("BENCH_BATCH", "48"))
        prompt_len, gen_len = 128, 128
        os.environ.setdefault("BENCH_MAX_PREFILL_BATCH",
                              str(min(batch, 16)))
        # 32 kv heads -> 16k tokens ~ 5.4 GB int8 incl. scales
        kv_tokens = int(os.environ.get("BENCH_KV_TOKENS", 16 * 1024))
        variant = "i8i8" if variant == "i8i8_7b" else "w4"
    elif on_tpu:
        model_cfg = ModelConfig(
            hidden_dim=2048, intermediate_dim=5632, num_layers=22,
            num_heads=32, num_kv_heads=4, vocab_size=32000,
            cache_mode=1, page_size=128, dtype="bfloat16")
        batch, prompt_len, gen_len = 64, 128, 128
        kv_tokens = 128 * 1024
    else:  # smoke-test fallback so the bench runs anywhere
        model_cfg = ModelConfig(
            hidden_dim=64, intermediate_dim=128, num_layers=2,
            num_heads=4, num_kv_heads=2, vocab_size=256,
            cache_mode=1, page_size=16, dtype="float32")
        batch, prompt_len, gen_len = 8, 16, 16
        kv_tokens = 4096
    if variant in ("i8i8", "kv8", "w4"):
        model_cfg.cache_quant_bit = 8
        model_cfg.cache_quant_group = 8

    resource_cfg = ResourceConfig(
        model_format="random",
        kv_cache_max_tokens=kv_tokens,
        token_buckets=(prompt_len, 2 * prompt_len, 8192),
        batch_buckets=(batch, 4 * batch),
        multi_step=int(os.environ.get("BENCH_MULTI_STEP", "16")),
        quant_method=("online_i8i8" if variant in ("i8i8", "i8i8_w")
                      else "online_w4a8" if variant == "w4"
                      else "none"),
        # default ON: int8 lm_head is the measured winner on both bench
        # configs (tinyllama 12649 vs 11892; BASELINE.md round 2) and the
        # accuracy harness gates it 19x under the KL budget
        quantize_lm_head=bool(int(
            os.environ.get("BENCH_QUANT_LM_HEAD", "1"))),
        quant_matmul_impl=os.environ.get("BENCH_QUANT_IMPL", "auto"),
        attention_seq_block=int(os.environ.get("BENCH_SEQ_BLOCK", "8")),
        block_tail=os.environ.get("BENCH_BLOCK_TAIL", "auto"),
    )
    gen_cfg = GeneratorConfig(
        max_running_batch=4 * batch,
        # large-batch 7B prefill programs can exceed HBM (b48 x 128
        # tokens of per-layer activation temps); splitting the prefill
        # wave bounds the per-step tile
        max_prefill_batch=int(
            os.environ.get("BENCH_MAX_PREFILL_BATCH", batch)),
        max_tokens_per_step=max(8192, batch * prompt_len),
        max_input_tokens_per_request=4096,
        max_output_tokens_per_request=4096,
        max_total_tokens_per_request=8192,
        speculative_blocks=int(os.environ.get("BENCH_SPEC_BLOCKS", "1")),
        enable_profiling=bool(int(os.environ.get("BENCH_PROFILE", "0"))),
        # BENCH_PROFILE=2: per-loop-step [PERF] blocks with timestamps
        # (wave-time attribution)
        profile_step_interval=(
            1 if os.environ.get("BENCH_PROFILE") == "2" else 100),
        # BENCH_TRACE_DIR: capture a jax.profiler trace of mid-run decode
        # steps (analyze with tools/trace_summary.py)
        trace_dir=os.environ.get("BENCH_TRACE_DIR", ""),
        # the measured phase is ~9 loop steps (1 prefill + out/multi_step
        # decode blocks); capture mid-run decode blocks. Wave boundaries
        # sit every ~9 steps: trace step 19-20 to catch a measured-phase
        # prefill + ramp block.
        trace_start_step=int(os.environ.get("BENCH_TRACE_START", "3")),
        trace_num_steps=int(os.environ.get("BENCH_TRACE_STEPS", "4")),
    )
    # Capture discipline: the driver's artifact must parse. A hard wall-
    # clock deadline bounds every phase; if warmup (tunnel compiles) is
    # still running at the deadline, we emit a partial-warmup JSON from
    # the tokens generated so far instead of hanging past the driver's
    # capture timeout (round-4 lesson: BENCH_r04.json rc=124, parsed
    # null). BENCH_DEADLINE=0 disables (dedicated manual runs).
    deadline = float(os.environ.get("BENCH_DEADLINE",
                                    "600" if on_tpu else "0"))

    def remaining(reserve=0.0):
        if deadline <= 0:
            return float("inf")
        return deadline - (time.monotonic() - _T0) - reserve

    t_eng = time.perf_counter()
    engine, kv_max = create_engine(model_cfg, resource_cfg, gen_cfg)
    print(f"[bench] engine created in {time.perf_counter() - t_eng:.1f}s "
          f"(t+{time.monotonic() - _T0:.0f}s)", file=sys.stderr, flush=True)

    # AOT executable store (same mechanism the server's --aot-cache
    # uses, engine.set_aot_dir/prewarm_from_manifest): deserialized
    # executables skip trace+lower+compile entirely. The store and the
    # manifest live inside the repo-local compile cache, so they stay
    # warm across rounds and are wiped together with it.
    if on_tpu and bool(int(os.environ.get("BENCH_AOT", "1"))):
        from ppl.llm.serving_tpu.utils.compile_cache import (
            default_cache_dir)
        cache_root = default_cache_dir("tpu")
        if cache_root:
            engine.set_aot_dir(os.path.join(cache_root, "aot"))
            # align the pinned page-table width with the bench config
            # before prewarm (the generator sets the same value later)
            engine.set_max_kv_pages(
                -(-gen_cfg.max_total_tokens_per_request
                  // model_cfg.page_size))
            manifest = os.path.join(
                cache_root, f"bench_manifest_{model_name}-{variant}.json")
            if os.path.exists(manifest) and remaining(reserve=240) > 0:
                t_pw = time.perf_counter()
                n_pw = engine.prewarm_from_manifest(manifest)
                print(f"[bench] prewarmed {n_pw} programs in "
                      f"{time.perf_counter() - t_pw:.1f}s",
                      file=sys.stderr, flush=True)
            engine.manifest_path = manifest

    conn = LocalConnection()
    if gen_cfg.enable_profiling:
        from ppl.llm.serving_tpu.profiler import print_profiler
        conn.on_profiling = lambda p: print_profiler(p)
    gen = LLMGenerator(model_cfg, gen_cfg, engine, ByteTokenizer(), conn,
                       kv_max)

    rng = np.random.RandomState(0)

    def make_reqs(base, n, out_len=gen_len):
        return [Request(id=base + i,
                        token_ids=rng.randint(
                            3, model_cfg.vocab_size - 1,
                            size=prompt_len).tolist(),
                        generation_length=out_len, top_k=1,
                        early_stopping=False)
                for i in range(n)]

    # warmup with the SAME request count/shapes as the measured run so
    # every (Bd, Bp, Qp, KVP) bucket is compiled before measurement.
    # out_len must cover the full KVP range the measured run reaches.
    t_warm = time.perf_counter()
    warm = make_reqs(10_000, batch, out_len=gen_len)
    conn.set_wanted(len(warm))
    for r in warm:
        gen.process(r)
    # cold-cache warmup compiles several unrolled decode-block programs
    # through the (slow) tunnel compiler. Budget: whatever the deadline
    # leaves after reserving time for one measured wave — if warmup is
    # still straggling at that point, emit a PARTIAL-warmup JSON from
    # the warmup wave's own tokens (a parseable, honestly-labeled
    # number beats a timed-out empty capture).
    warm_budget = min(3300.0, max(90.0, remaining(reserve=150)))
    warm_ok = conn.wait(timeout=warm_budget)
    warm_elapsed = time.perf_counter() - t_warm
    print(f"[bench] warmup {warm_elapsed:.1f}s (completed={warm_ok}, "
          f"budget {warm_budget:.0f}s)", file=sys.stderr, flush=True)
    if not warm_ok and remaining(reserve=90) > 0:
        warm_ok = conn.wait(timeout=min(1200.0, remaining(reserve=90)))
        warm_elapsed = time.perf_counter() - t_warm
    if not warm_ok:
        warm_tokens = sum(len(v) for k, v in conn.tokens.items()
                          if k >= 10_000)
        gen.shutdown()
        tps = warm_tokens / warm_elapsed if warm_elapsed > 0 else 0.0
        print(json.dumps({
            "metric": "output_tokens_per_sec_per_chip",
            "value": round(tps, 2), "unit": "tokens/s",
            "vs_baseline": 0,
            "config": f"{model_name}-{variant}-b{batch}"
                      f"-in{prompt_len}-out{gen_len}",
            "backend": jax.default_backend(),
            "partial_warmup": True,
            "error": (f"warmup incomplete after {warm_elapsed:.0f}s "
                      f"(deadline {deadline:.0f}s); value measured over "
                      "the warmup wave incl. compiles"),
        }))
        return
    time.sleep(0.5)

    # measured run: several waves for timing resolution (one wave is ~1 s
    # at current speeds; per-wave elapsed excludes inter-wave idle)
    n_waves = int(os.environ.get("BENCH_WAVES", "3"))
    first_token_ts = {}
    conn._on_first_token = lambda tid: first_token_ts.setdefault(
        tid, time.perf_counter())
    elapsed = 0.0
    wave_reqs = []
    ok = True
    waves_done = 0
    for w in range(n_waves):
        if w > 0 and remaining(reserve=20) <= 0:
            break  # deadline: report the waves that finished
        reqs = make_reqs(w * batch, batch)
        wave_reqs.append(reqs)
        t_start = time.perf_counter()
        if w == 0:
            t_start0 = t_start
        conn.set_wanted(len(reqs))
        for r in reqs:
            gen.process(r)
        ok = conn.wait(timeout=min(1800.0, max(60.0, remaining())))
        elapsed += time.perf_counter() - t_start
        if not ok:
            break
        waves_done += 1
    print(f"[bench] measured {elapsed:.2f}s over {waves_done}/{n_waves} "
          "waves", file=sys.stderr, flush=True)
    gen.shutdown()
    if not ok and waves_done == 0:
        out_tokens = sum(len(v) for k, v in conn.tokens.items()
                         if k < 10_000)
        tps = out_tokens / elapsed if elapsed > 0 else 0.0
        print(json.dumps({"metric": "output_tokens_per_sec_per_chip",
                          "value": round(tps, 2), "unit": "tokens/s",
                          "vs_baseline": 0,
                          "error": "measured wave timed out; value is "
                                   "the partial wave's tokens"}))
        return

    reqs = wave_reqs[0]
    t_start = t_start0
    out_tokens = sum(len(v) for k, v in conn.tokens.items() if k < 10_000)
    tps = out_tokens / elapsed
    ttfts = sorted(first_token_ts[r.id] - t_start for r in reqs
                   if r.id in first_token_ts)
    p50_ttft_ms = ttfts[len(ttfts) // 2] * 1e3 if ttfts else -1

    # decode roofline: every decode step reads all weights + the batch's KV
    wbytes = (1 if variant in ("i8i8", "i8i8_w")
              else 0.5 if variant == "w4" else 2)       # matmul weights
    kvbytes = (1 + 2 / model_cfg.cache_quant_group
               if model_cfg.cache_quant_bit == 8 else 2)
    # lm_head streams fully every decode step (quantized when
    # --quantize-lm-head); the embedding is a [B]-row gather, not a
    # stream, so it does not count against the decode roofline
    head_wbytes = (wbytes if resource_cfg.quantize_lm_head else 2)
    param_bytes = (
        head_wbytes * model_cfg.vocab_size * model_cfg.hidden_dim
        + wbytes * model_cfg.num_layers * (
            model_cfg.hidden_dim * (model_cfg.num_heads
                                    + 2 * model_cfg.num_kv_heads)
            * model_cfg.head_dim
            + model_cfg.num_heads * model_cfg.head_dim * model_cfg.hidden_dim
            + 3 * model_cfg.hidden_dim * model_cfg.intermediate_dim))
    kv_bytes_per_seq = (model_cfg.num_layers * 2 * model_cfg.num_kv_heads
                        * model_cfg.head_dim * kvbytes
                        * (prompt_len + gen_len / 2))
    step_bytes = param_bytes + batch * kv_bytes_per_seq
    roofline_tps = V5E_HBM_GBPS * 1e9 / step_bytes * batch
    vs = tps / roofline_tps if on_tpu else 0.0

    print(json.dumps({
        "metric": "output_tokens_per_sec_per_chip",
        "value": round(tps, 2),
        "unit": "tokens/s",
        "vs_baseline": round(vs, 4),
        "config": (f"{model_name}-{variant}" if on_tpu else "tiny-smoke")
        + f"-b{batch}-in{prompt_len}-out{gen_len}",
        "p50_ttft_ms": round(p50_ttft_ms, 1),
        "elapsed_s": round(elapsed, 2),
        "roofline_tokens_per_sec": round(roofline_tps, 1),
        "backend": jax.default_backend(),
        **({"partial_last_wave": True} if not ok else {}),
        **({"error": _BACKEND_ERROR} if _BACKEND_ERROR else {}),
    }))


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # noqa: BLE001 - capture must stay parseable
        import traceback
        traceback.print_exc()
        print(json.dumps({"metric": "output_tokens_per_sec_per_chip",
                          "value": 0, "unit": "tokens/s",
                          "vs_baseline": 0,
                          "error": f"{type(e).__name__}: {e}"[:300]}))
