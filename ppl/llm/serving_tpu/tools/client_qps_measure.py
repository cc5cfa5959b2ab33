#!/usr/bin/env python3
"""Throughput/latency benchmark client (reference
``tools/client_qps_measure.cc``): replays a ShareGPT-style workload
against the server at a Poisson request rate (or all-at-once with
``--request-rate inf``), records per-request send/first-token/finish
timestamps, and reports the same metric set: benchmark time, avg in/out
len, time-per-token, prefill/decode/e2e latency averages and
min/p1/p10/p25/p50/p75/p80/p90/p95/p99/max distributions, tokens-out/s,
tokens-in+out/s, QPS (``client_qps_measure.cc:318-350``).

``--token-in-out`` sends raw token ids with fixed generation length like
the reference's client_qps_measure_token_in_out
(``client_qps_measure_token_in_out.cc:62-71``).
"""

import argparse
import asyncio
import json
import os
import random
import sys
import time


import grpc
import grpc.aio

from ppl.llm.serving_tpu.serving.proto import llm_pb2

GENERATION = "/ppl.llm.proto.LLMService/Generation"


def load_workload(path, tokenizer, count):
    with open(path) as f:
        samples = json.load(f)
    out = []
    for entry in samples[:count]:
        convs = entry.get("conversations", [])
        prompt = next((c["value"] for c in convs if c.get("from") == "human"),
                      None)
        answer = next((c["value"] for c in convs if c.get("from") == "gpt"),
                      "")
        if not prompt:
            continue
        n_in = len(tokenizer.encode(prompt))
        n_out = max(1, len(tokenizer.encode(answer)))
        out.append((prompt, n_in, n_out))
    return out


class Stats:
    def __init__(self):
        self.send_ts = {}
        self.first_ts = {}
        self.finish_ts = {}
        self.out_tokens = {}
        self.in_tokens = {}
        self.failed_ids = set()   # a failed rid NEVER counts as done,
                                  # even if it streamed tokens first

    @property
    def failed(self):
        return len(self.failed_ids)


async def run_one(channel, stats, rid, prompt, n_in, n_out, token_in_out,
                  early_stopping=False):
    batched = llm_pb2.BatchedRequest()
    req = batched.req.add()
    req.id = rid
    if token_in_out:
        req.tokens.ids.extend([(i * 13 + 5) % 31999 + 1 for i in range(n_in)])
    else:
        req.prompt = prompt
    req.stopping_parameters.max_new_tokens = n_out
    # reference parity: --early_stopping defaults false, i.e. the client
    # normally IGNORES eos (client_qps_measure.cc:32,88); pass
    # --early-stopping to measure the realistic EOS-stopping path
    req.stopping_parameters.ignore_eos_token = not early_stopping
    stub = channel.unary_stream(
        GENERATION,
        request_serializer=llm_pb2.BatchedRequest.SerializeToString,
        response_deserializer=llm_pb2.BatchedResponse.FromString)
    stats.send_ts[rid] = time.perf_counter()
    stats.in_tokens[rid] = n_in
    stats.out_tokens[rid] = 0
    try:
        async for batched_rsp in stub(batched):
            now = time.perf_counter()
            for rsp in batched_rsp.rsp:
                if rsp.status == llm_pb2.FAILED:
                    stats.failed_ids.add(rid)
                    stats.finish_ts[rid] = now
                    return
                stats.first_ts.setdefault(rid, now)
                stats.out_tokens[rid] += max(1, len(rsp.tokens.ids))
                if rsp.status == llm_pb2.FINISHED:
                    stats.finish_ts[rid] = now
    except grpc.RpcError:
        stats.failed_ids.add(rid)
        stats.finish_ts[rid] = time.perf_counter()


def pct(sorted_vals, q):
    if not sorted_vals:
        return 0.0
    idx = min(len(sorted_vals) - 1, int(q / 100 * len(sorted_vals)))
    return sorted_vals[idx]


def report_dist(name, vals_ms):
    vals = sorted(vals_ms)
    line = (f"[RESULT] {name}: min {vals[0]:.1f}, " if vals else
            f"[RESULT] {name}: empty")
    if vals:
        for q in (1, 10, 25, 50, 75, 80, 90, 95, 99):
            line += f"p{q} {pct(vals, q):.1f}, "
        line += f"max {vals[-1]:.1f} (ms)"
    print(line)


async def main_async(args):
    if args.tokenizer_path:
        from ppl.llm.serving_tpu.tokenizer import create_tokenizer
        tok = create_tokenizer("llama", args.tokenizer_path)
    else:
        from ppl.llm.serving_tpu.tokenizer.factory import ByteTokenizer
        tok = ByteTokenizer()
    workload = load_workload(args.dataset, tok, args.num_requests)
    print(f"[INFO] loaded {len(workload)} requests from {args.dataset}")

    rng = random.Random(0)
    stats = Stats()
    async with grpc.aio.insecure_channel(args.target) as channel:
        t0 = time.perf_counter()
        tasks = []
        for rid, (prompt, n_in, n_out) in enumerate(workload):
            tasks.append(asyncio.create_task(run_one(
                channel, stats, rid, prompt, n_in, n_out,
                args.token_in_out, args.early_stopping)))
            if args.request_rate != float("inf"):
                await asyncio.sleep(rng.expovariate(args.request_rate))
        await asyncio.gather(*tasks)
        elapsed = time.perf_counter() - t0

    done = [r for r in stats.finish_ts if r in stats.first_ts
            and stats.out_tokens.get(r, 0) > 0
            and r not in stats.failed_ids]
    total_out = sum(stats.out_tokens[r] for r in done)
    total_in = sum(stats.in_tokens[r] for r in done)
    prefill = [(stats.first_ts[r] - stats.send_ts[r]) * 1e3 for r in done]
    decode = [((stats.finish_ts[r] - stats.first_ts[r])
               / max(stats.out_tokens[r] - 1, 1)) * 1e3 for r in done]
    e2e = [(stats.finish_ts[r] - stats.send_ts[r]) * 1e3 for r in done]

    print(f"[RESULT] benchmark time: {elapsed:.2f} s")
    print(f"[RESULT] finished {len(done)}/{len(workload)} "
          f"(failed {stats.failed})")
    if done:
        print(f"[RESULT] avg input len: {total_in / len(done):.1f}, "
              f"avg output len: {total_out / len(done):.1f}")
        print(f"[RESULT] time per token: "
              f"{elapsed * 1e3 / max(total_out, 1):.2f} ms")
        print(f"[RESULT] avg prefill latency: "
              f"{sum(prefill) / len(prefill):.1f} ms")
        print(f"[RESULT] avg decode latency per token: "
              f"{sum(decode) / len(decode):.2f} ms")
        print(f"[RESULT] avg prompt latency: {sum(e2e) / len(e2e):.1f} ms")
        print(f"[RESULT] tokens out per sec: {total_out / elapsed:.1f}")
        print(f"[RESULT] tokens inout per sec: "
              f"{(total_in + total_out) / elapsed:.1f}")
        print(f"[RESULT] requests per sec: {len(done) / elapsed:.2f}")
        report_dist("prefill latency", prefill)
        report_dist("decode latency", decode)
        report_dist("prompt latency", e2e)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--target", default="127.0.0.1:23333")
    p.add_argument("--dataset", required=True,
                   help="samples_1024.json-format workload")
    p.add_argument("--tokenizer-path", default="")
    p.add_argument("--num-requests", type=int, default=1024)
    p.add_argument("--request-rate", type=lambda s: float(s),
                   default=float("inf"),
                   help="Poisson arrivals per second; inf = all at once")
    p.add_argument("--token-in-out", action="store_true")
    p.add_argument("--early-stopping", action="store_true",
                   help="stop on EOS (reference --early_stopping; "
                        "default ignores EOS like the reference client)")
    args = p.parse_args()
    asyncio.run(main_async(args))


if __name__ == "__main__":
    main()
