#!/usr/bin/env python3
"""The serving daemon (reference ``tools/llm_server.cc:255-348``): wires
config -> engine -> generator -> gRPC frontend and serves
``LLMService.Generation`` streams, wire-compatible with the reference's
clients."""

import argparse
import faulthandler
import os
import signal

from .common import add_generator_args, add_model_args, build_configs, \
    setup_logging

from ppl.llm.serving_tpu.generator import LLMGenerator
from ppl.llm.serving_tpu.resources import create_engine
from ppl.llm.serving_tpu.serving.grpc_server import (AsyncGRPCServer,
                                                     GRPCConnection,
                                                     GRPCServer)
from ppl.llm.serving_tpu.tokenizer import create_tokenizer


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    add_model_args(parser)
    add_generator_args(parser)
    parser.add_argument("--host", default="0.0.0.0")
    parser.add_argument("--port", type=int, default=23333)
    parser.add_argument("--validate-bucket-grid", type=int, default=1,
                        help="compile the extreme decode-bucket programs "
                             "at startup and clamp max_running_batch to "
                             "what fits device memory (0 = serve "
                             "immediately and risk a mid-serving "
                             "fail-all on the first visit to an "
                             "oversized bucket)")
    parser.add_argument("--grpc-max-workers", type=int, default=1024,
                        help="threads impl only — max CONCURRENT client "
                             "streams: each streaming call holds a pool "
                             "thread for its lifetime")
    parser.add_argument("--aot-cache", default="auto",
                        help="serialized-executable store: restarts load "
                             "compiled step programs directly (no "
                             "re-trace/re-lower/re-compile). 'auto' = "
                             "<compile-cache>/aot; '' disables")
    parser.add_argument("--grpc-impl", default="aio",
                        choices=["aio", "threads"],
                        help="aio: one coroutine per stream (unbounded "
                             "stream concurrency, the reference's "
                             "async-CQ equivalent); threads: one parked "
                             "pool thread per stream")
    # multi-host (north-star): same command on every host; host 0 becomes
    # the controller + frontend, the rest execute plans in lockstep
    parser.add_argument("--coordinator-address", default=None,
                        help="host0:port for jax.distributed; enables "
                             "multi-host serving")
    parser.add_argument("--num-processes", type=int, default=None)
    parser.add_argument("--process-id", type=int, default=None)
    # data parallelism = replica engines behind this frontend (each
    # replica takes tensor-parallel-size devices); NOT a mesh axis —
    # replicas have divergent KV states (parallel/shardings.py)
    parser.add_argument("--data-parallel-size", type=int, default=1)
    parser.add_argument("--warmup-manifest", default="",
                        help="JSON manifest of step-program keys: "
                        "pre-compile them all BEFORE serving traffic "
                        "(multi-minute block compiles otherwise stall "
                        "the decode loop on first hit); newly compiled "
                        "keys are appended as they happen")
    # Working implementation of the reference's dead --monitor-port flag
    # (llm_server.cc:89-90 parses it; nothing serves it there)
    parser.add_argument("--monitor-port", type=int, default=0,
                        help="serve Prometheus metrics on this port "
                             "(0 = off)")
    # accepted for reference-CLI compatibility; the reference parses it
    # but nothing serves it there either (llm_server.cc:89-90)
    parser.add_argument("--control-port", type=int, default=0,
                        help=argparse.SUPPRESS)
    from ppl.llm.serving_tpu import __version__
    parser.add_argument("--version", action="version",
                        version=f"ppl-llm-serving-tpu {__version__}")
    args = parser.parse_args()
    setup_logging()
    # crash backtraces (reference installs a SIGSEGV/FPE/ILL handler,
    # llm_server.cc:240-253)
    faulthandler.enable()
    faulthandler.register(signal.SIGTERM, chain=True)

    model_cfg, resource_cfg, gen_cfg = build_configs(args)

    mesh = None
    plan_channel = None
    multi_proc = args.coordinator_address is not None
    dp = max(1, args.data_parallel_size)
    if dp > 1 and multi_proc:
        raise SystemExit(
            "--data-parallel-size is incompatible with the multi-host "
            "controller mode; run one server process per dp replica set")
    if multi_proc or resource_cfg.tensor_parallel_size > 1:
        from ppl.llm.serving_tpu.parallel import multihost, shardings
        if multi_proc:
            multihost.initialize(args.coordinator_address,
                                 args.num_processes, args.process_id)
        mesh = shardings.make_mesh(resource_cfg.tensor_parallel_size)

    tokenizer = create_tokenizer(args.model_type, resource_cfg.tokenizer_path,
                                 args.tokenizer_type,
                                 args.tokenizer_config_path or None)
    conn = GRPCConnection()

    if dp > 1:
        # replica i owns devices [i*tp, (i+1)*tp); each loads its own
        # weight copy and runs an independent scheduler
        import jax
        from ppl.llm.serving_tpu.parallel import shardings
        from ppl.llm.serving_tpu.serving.dp_router import DataParallelRouter
        tp = resource_cfg.tensor_parallel_size
        devices = jax.devices()
        if len(devices) < dp * tp:
            raise SystemExit(f"dp={dp} x tp={tp} needs {dp * tp} devices, "
                             f"have {len(devices)}")
        gens = []
        for i in range(dp):
            rep_mesh = (shardings.make_mesh(
                tp, devices[i * tp:(i + 1) * tp]) if tp > 1 or dp > 1
                else None)
            eng, kv_max = create_engine(model_cfg, resource_cfg, gen_cfg,
                                        mesh=rep_mesh)
            gens.append(LLMGenerator(model_cfg, gen_cfg, eng, tokenizer,
                                     conn, kv_max))
        generator = DataParallelRouter(gens)
        profiler = gens[0].profiler
    else:
        engine, kv_max = create_engine(model_cfg, resource_cfg, gen_cfg,
                                       mesh=mesh)
        if multi_proc:
            from ppl.llm.serving_tpu.parallel import multihost
            if not multihost.is_controller():
                multihost.worker_serve(engine)
                return
            plan_channel = multihost.controller_plan_channel
        if args.aot_cache:
            from ppl.llm.serving_tpu.utils.compile_cache import (
                default_cache_dir)
            import jax as _jax
            if args.aot_cache == "auto":
                # auto engages on TPU only: the XLA:CPU thunk loader
                # executes deserialized executables unreliably (missing
                # fusion symbols / machine-feature mismatch -> silent
                # garbage or SIGILL). Explicit --aot-cache PATH still
                # opts in anywhere (tests).
                aot = ("" if _jax.default_backend() == "cpu"
                       else os.path.join(default_cache_dir("tpu"), "aot"))
            else:
                aot = args.aot_cache
            if aot:
                engine.set_aot_dir(aot)
        if args.validate_bucket_grid:
            clamped = engine.validate_bucket_grid(
                gen_cfg.max_total_tokens_per_request,
                gen_cfg.max_running_batch,
                gen_cfg.max_tokens_per_step)
            if clamped < gen_cfg.max_running_batch:
                print(f"[WARN] bucket grid clamped: max_running_batch "
                      f"{gen_cfg.max_running_batch} -> {clamped} "
                      f"(largest decode bucket that compiles within "
                      f"device memory)", flush=True)
                gen_cfg.max_running_batch = clamped
        if args.warmup_manifest:
            import time as _time
            # align the pinned page-table width with the served config
            # BEFORE prewarming: with --validate-bucket-grid off nothing
            # else sets it until LLMGenerator construction, so the
            # stale-key kvp filter would run against the engine default
            # and silently drop (or mis-warm) live manifest keys
            engine.set_max_kv_pages(
                -(-gen_cfg.max_total_tokens_per_request
                  // model_cfg.page_size))
            t0 = _time.perf_counter()
            n = engine.prewarm_from_manifest(args.warmup_manifest)
            if n:
                print(f"[INFO] pre-warmed {n} step programs in "
                      f"{_time.perf_counter() - t0:.1f}s", flush=True)
            # eager per-compile saves (engine.manifest_path) — robust
            # against any kill, unlike atexit/SIGTERM hooks
            engine.manifest_path = args.warmup_manifest
        generator = LLMGenerator(model_cfg, gen_cfg, engine, tokenizer,
                                 conn, kv_max, plan_channel=plan_channel)

        def _fatal_exit():
            # the device backend is gone (e.g. TPU worker crash) —
            # every dispatch fails and jax caches the dead client, so
            # only a process restart recovers. Exit loudly; with the
            # AOT store a supervised restart is cheap (seconds of
            # program loads, not minutes of compiles).
            print("[FATAL] device backend lost — exiting for "
                  "supervisor restart", flush=True)
            os._exit(13)

        generator.on_fatal = _fatal_exit
        profiler = generator.profiler
    if args.monitor_port:
        from ppl.llm.serving_tpu.serving.metrics import MetricsServer
        MetricsServer(profiler, args.monitor_port).start()
    server_cls = (AsyncGRPCServer if args.grpc_impl == "aio"
                  else GRPCServer)
    server = server_cls(conn, generator.process, generator.clear_task,
                        max_workers=args.grpc_max_workers)
    server.init(args.host, args.port)
    print(f"[INFO] listening on {args.host}:{args.port}", flush=True)
    server.loop()


if __name__ == "__main__":
    main()
