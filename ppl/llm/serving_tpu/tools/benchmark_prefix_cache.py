#!/usr/bin/env python3
"""Prefix-cache benchmark (reference
``tools/benchmark_prefix_cache_offline.cc:429-508``): after warmup, send
the same long-prefix prompt twice — cold then warm — and report TTFT and
total time for each; warm TTFT should be much lower with
``--enable-prefix-cache``."""

import argparse
import sys
import time

from .common import add_generator_args, add_model_args, build_configs, \
    setup_logging

from ppl.llm.serving_tpu.connection import LocalConnection
from ppl.llm.serving_tpu.generator import LLMGenerator
from ppl.llm.serving_tpu.request import Request
from ppl.llm.serving_tpu.resources import create_engine
from ppl.llm.serving_tpu.tokenizer import create_tokenizer

# long table-QA-style shared prefix + distinct questions, mirroring the
# reference's workload shape (a big table document + per-request question)
def make_table_prefix(rows: int, salt: str = "") -> str:
    return ("| id | name | city | amount |\n" +
            "\n".join(f"| {i} | user{salt}{i} | city{i % 17} | {i * 37 % 1000} |"
                      for i in range(rows)) + "\n")


QUESTIONS = [
    "Question: what is the total amount for city3?",
    "Question: which user has the largest amount?",
]


def run_once(generator, conn, rid, prompt, gen_len):
    first = {}
    conn._on_first_token = lambda tid: first.setdefault(
        tid, time.perf_counter())
    conn.set_wanted(1)
    t0 = time.perf_counter()
    generator.process(Request(id=rid, prompt=prompt,
                              generation_length=gen_len, top_k=1,
                              early_stopping=False))
    assert conn.wait(timeout=1800)
    if rid in conn.failures:
        sys.exit(f"request {rid} failed: {conn.failures[rid]}")
    total = time.perf_counter() - t0
    ttft = first.get(rid, t0) - t0
    return ttft * 1e3, total * 1e3


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    add_model_args(parser)
    add_generator_args(parser)
    parser.add_argument("--generation-len", type=int, default=32)
    parser.add_argument("--warmup", type=int, default=3)
    parser.add_argument("--table-rows", type=int, default=100,
                        help="size of the shared table prefix")
    args = parser.parse_args()
    setup_logging(verbose=False)

    model_cfg, resource_cfg, gen_cfg = build_configs(args)
    tokenizer = create_tokenizer(args.model_type, resource_cfg.tokenizer_path,
                                 args.tokenizer_type,
                                 args.tokenizer_config_path or None)
    engine, kv_max = create_engine(model_cfg, resource_cfg, gen_cfg)
    conn = LocalConnection()
    generator = LLMGenerator(model_cfg, gen_cfg, engine, tokenizer, conn,
                             kv_max)

    # warmup x3 (benchmark_prefix_cache_offline.cc:429-440), with a
    # shared-prefix pair so the suffix-prefill shape bucket is compiled
    # before the measured warm run
    # same table SIZE as the measured run (different content) so every
    # shape bucket the measured cold+warm runs need is already compiled
    warm_table = make_table_prefix(args.table_rows, salt="w")
    for i in range(args.warmup):
        run_once(generator, conn, 9000 + 2 * i, warm_table + QUESTIONS[0],
                 args.generation_len)
        run_once(generator, conn, 9001 + 2 * i, warm_table + QUESTIONS[1],
                 args.generation_len)

    table_prefix = make_table_prefix(args.table_rows)
    prompt_a = table_prefix + QUESTIONS[0]
    prompt_b = table_prefix + QUESTIONS[1]
    cold_ttft, cold_total = run_once(generator, conn, 1, prompt_a,
                                     args.generation_len)
    warm_ttft, warm_total = run_once(generator, conn, 2, prompt_b,
                                     args.generation_len)
    print(f"[RESULT] prefix cache: "
          f"{'ON' if gen_cfg.enable_prefix_cache else 'OFF'}")
    print(f"[RESULT] cold: TTFT {cold_ttft:.1f} ms, total {cold_total:.1f} ms")
    print(f"[RESULT] warm: TTFT {warm_ttft:.1f} ms, total {warm_total:.1f} ms")
    print(f"[RESULT] TTFT speedup: {cold_ttft / max(warm_ttft, 1e-9):.2f}x")
    generator.shutdown()


if __name__ == "__main__":
    main()
