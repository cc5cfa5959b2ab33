#!/usr/bin/env python3
"""Stress client (reference ``tools/client_pressure.cc:256-270``): sweeps
fixed prompt lengths and hammers the server with concurrent batches to
shake out admission, cooldown and eviction paths under pressure."""

import argparse
import asyncio
import os
import sys
import time


import grpc
import grpc.aio

from ppl.llm.serving_tpu.serving.proto import llm_pb2

GENERATION = "/ppl.llm.proto.LLMService/Generation"


async def run_one(channel, rid, prompt_len, gen_len, results):
    batched = llm_pb2.BatchedRequest()
    req = batched.req.add()
    req.id = rid
    req.tokens.ids.extend([(rid + i) % 31000 + 3 for i in range(prompt_len)])
    req.stopping_parameters.max_new_tokens = gen_len
    req.stopping_parameters.ignore_eos_token = True
    stub = channel.unary_stream(
        GENERATION,
        request_serializer=llm_pb2.BatchedRequest.SerializeToString,
        response_deserializer=llm_pb2.BatchedResponse.FromString)
    n = 0
    try:
        async for rsp in stub(batched):
            for r in rsp.rsp:
                if r.status == llm_pb2.FAILED:
                    results["failed"] += 1
                    return
                n += len(r.tokens.ids)
        results["ok"] += 1
        results["tokens"] += n
    except grpc.RpcError:
        results["rpc_error"] += 1


async def main_async(args):
    lengths = [int(x) for x in args.prompt_lengths.split(",")]
    results = {"ok": 0, "failed": 0, "rpc_error": 0, "tokens": 0}
    async with grpc.aio.insecure_channel(args.target) as channel:
        t0 = time.perf_counter()
        rid = 0
        for plen in lengths:
            tasks = []
            for _ in range(args.concurrency):
                tasks.append(run_one(channel, rid, plen, args.generation_len,
                                     results))
                rid += 1
            await asyncio.gather(*tasks)
            print(f"[RESULT] len {plen}: cumulative {results}")
        elapsed = time.perf_counter() - t0
    print(f"[RESULT] total: {results} in {elapsed:.1f}s "
          f"({results['tokens'] / elapsed:.1f} tok/s)")


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--target", default="127.0.0.1:23333")
    p.add_argument("--prompt-lengths", default="256,512,1024,2048")
    p.add_argument("--concurrency", type=int, default=32)
    p.add_argument("--generation-len", type=int, default=64)
    args = p.parse_args()
    asyncio.run(main_async(args))


if __name__ == "__main__":
    main()
