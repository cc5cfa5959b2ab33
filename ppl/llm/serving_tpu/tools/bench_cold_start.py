#!/usr/bin/env python3
"""Cold-start benchmark: server launch -> first served token, with and
without the compile-manifest prewarm.

The reference loads immutable pmx model slices and compiles nothing at
runtime, so its cold start is dominated by weight upload
(``resource_manager.cc:278-290``). Here startup cost is jit compilation
of the bucket-shape program grid; the manifest prewarm
(``engine.prewarm_from_manifest``) moves those compiles to startup
(before "listening") where the persistent XLA disk cache makes them
cheap on every restart after the first.

Three phases:
  1. COLD  — no manifest: server accepts immediately, the first request
     eats every compile on its path; manifest is SAVED on shutdown.
  2. WARM  — same config with --warmup-manifest: compiles (disk-cached)
     happen before the port opens; first request runs immediately.
Reports, per phase: time to "listening", first-token latency of one
probe request, total launch->first-token.

Usage:
  python tools/bench_cold_start.py --params /tmp/params.json \
      [--kv-cache-max-tokens N] [--extra "--quant-method online_i8i8"]
"""

import argparse
import json
import os
import shlex
import shutil
import signal
import subprocess
import sys
import tempfile
import time



def wait_listening(proc, logf, timeout):
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < timeout:
        if proc.poll() is not None:
            sys.stderr.write(open(logf).read()[-2000:])
            raise RuntimeError("server died during startup")
        with open(logf) as f:
            if "listening" in f.read():
                return time.perf_counter() - t0
        time.sleep(0.5)
    raise RuntimeError(f"server not listening after {timeout}s")


def first_token_latency(target, timeout):
    import grpc
    from ppl.llm.serving_tpu.serving.proto import llm_pb2, llm_pb2_grpc
    channel = grpc.insecure_channel(target)
    stub = llm_pb2_grpc.LLMServiceStub(channel)
    req = llm_pb2.BatchedRequest(req=[llm_pb2.Request(
        id=1, prompt="cold start probe",
        stopping_parameters=llm_pb2.StoppingCriteriaParameters(
            max_new_tokens=8, ignore_eos_token=True))])
    t0 = time.perf_counter()
    for rsp in stub.Generation(req, timeout=timeout):
        return time.perf_counter() - t0
    raise RuntimeError("stream closed without a token")


def run_phase(name, cmd, logf, probe_timeout, cache_dir):
    print(f"[{name}] {' '.join(cmd)}", file=sys.stderr, flush=True)
    env = dict(os.environ, PPL_COMPILE_CACHE=cache_dir)
    with open(logf, "w") as lf:
        proc = subprocess.Popen(cmd, stdout=lf, stderr=subprocess.STDOUT,
                                start_new_session=True, env=env)
    try:
        t_listen = wait_listening(proc, logf, probe_timeout)
        t_first = first_token_latency("127.0.0.1:23411", probe_timeout)
    finally:
        # exact-PID group kill; never by pattern
        os.killpg(proc.pid, signal.SIGTERM)
        try:
            proc.wait(timeout=60)
        except subprocess.TimeoutExpired:
            os.killpg(proc.pid, signal.SIGKILL)
            proc.wait()
    return {"listen_s": round(t_listen, 2),
            "first_token_s": round(t_first, 2),
            "total_s": round(t_listen + t_first, 2)}


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--params", required=True)
    p.add_argument("--kv-cache-max-tokens", type=int, default=131072)
    p.add_argument("--extra", default="")
    p.add_argument("--manifest", default="/tmp/cold_start_manifest.json")
    p.add_argument("--timeout", type=int, default=3600)
    p.add_argument("--json-out", default="")
    args = p.parse_args()

    base = [sys.executable, "tools/llm_server.py",
            "--model-format", "random",
            "--model-param-path", args.params,
            "--tokenizer-type", "dummy",
            "--kv-cache-max-tokens", str(args.kv_cache_max_tokens),
            "--port", "23411"] + shlex.split(args.extra)

    if os.path.exists(args.manifest):
        os.unlink(args.manifest)
    # first-ever start vs restart: phase 1 gets an EMPTY compile cache
    # (a pre-populated global cache would understate cold); phase 2
    # inherits the cache phase 1 populated plus its manifest.
    cache_dir = tempfile.mkdtemp(prefix="cold_start_cache_")
    try:
        # phase 1: cold (manifest recorded for phase 2)
        cold = run_phase("cold", base + ["--warmup-manifest", args.manifest],
                         "/tmp/cold_start_cold.log", args.timeout, cache_dir)
        # phase 2: prewarmed from the manifest phase 1 left behind
        warm = run_phase("warm", base + ["--warmup-manifest", args.manifest],
                         "/tmp/cold_start_warm.log", args.timeout, cache_dir)
    finally:
        shutil.rmtree(cache_dir, ignore_errors=True)
    out = {"cold": cold, "warm": warm,
           "manifest_keys": (len(json.load(open(args.manifest)))
                             if os.path.exists(args.manifest) else 0)}
    print(json.dumps(out))
    if args.json_out:
        json.dump(out, open(args.json_out, "w"), indent=1)


if __name__ == "__main__":
    main()
