#!/usr/bin/env python3
"""Streaming client sample (reference ``tools/client_sample.cc``): send
prompts, print tokens as they stream."""

import argparse
import os
import sys


import grpc

from ppl.llm.serving_tpu.serving.proto import llm_pb2

GENERATION_METHOD = "/ppl.llm.proto.LLMService/Generation"


def make_stub(channel):
    return channel.unary_stream(
        GENERATION_METHOD,
        request_serializer=llm_pb2.BatchedRequest.SerializeToString,
        response_deserializer=llm_pb2.BatchedResponse.FromString)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--target", default="127.0.0.1:23333")
    parser.add_argument("--prompt", action="append", default=None)
    parser.add_argument("--generation-len", type=int, default=64)
    parser.add_argument("--temperature", type=float, default=0.0)
    parser.add_argument("--top-k", type=int, default=0)
    parser.add_argument("--top-p", type=float, default=0.0)
    args = parser.parse_args()
    prompts = args.prompt or [
        "Building a website can be done in 10 simple steps:",
        "I believe the meaning of life is",
    ]

    batched = llm_pb2.BatchedRequest()
    for i, prompt in enumerate(prompts):
        req = batched.req.add()
        req.id = i
        req.prompt = prompt
        cp = req.choosing_parameters
        cp.do_sample = args.top_k != 1 and (args.top_k or args.top_p) > 0
        cp.temperature = args.temperature
        cp.top_k = args.top_k
        cp.top_p = args.top_p
        req.stopping_parameters.max_new_tokens = args.generation_len

    with grpc.insecure_channel(args.target) as channel:
        stub = make_stub(channel)
        texts = {i: [] for i in range(len(prompts))}
        for batched_rsp in stub(batched):
            for rsp in batched_rsp.rsp:
                if rsp.status == llm_pb2.FAILED:
                    print(f"\n[req {rsp.id}] FAILED: {rsp.generated}")
                    continue
                texts[rsp.id].append(rsp.generated)
                print(rsp.generated, end="", flush=True)
        print()
        for i, prompt in enumerate(prompts):
            print(f"\n=== {prompt!r} ===")
            print("".join(texts[i]))


if __name__ == "__main__":
    main()
