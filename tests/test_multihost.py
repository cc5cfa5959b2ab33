"""Multi-host plumbing: plan serialization, plan-channel lockstep path,
and full TP e2e through the generator on the virtual CPU mesh."""

import pickle
import time

import numpy as np

from ppl.llm.serving_tpu.config import ResourceConfig
from ppl.llm.serving_tpu.connection import LocalConnection
from ppl.llm.serving_tpu.generator import LLMGenerator
from ppl.llm.serving_tpu.parallel import multihost, shardings
from ppl.llm.serving_tpu.resources import create_engine

from test_generator_e2e import DummyTokenizer, build, make_gen_cfg, \
    make_model_cfg, req, run


def test_two_process_lockstep_worker_serve(tmp_path):
    """REAL multi-process control plane: spawn 2 ``jax.distributed`` CPU
    processes (controller + worker), run the generator with the broadcast
    plan channel + ``worker_serve`` lockstep — including multi-step
    blocks, speculative continuation messages, and a membership change —
    and require tokens identical to the single-process run."""
    import json
    import os
    import socket
    import subprocess
    import sys

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    out_json = str(tmp_path / "controller.json")
    script = os.path.join(os.path.dirname(__file__), "_multihost_proc.py")

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # proc sets its own device count
    env["JAX_PLATFORMS"] = "cpu"
    procs = [subprocess.Popen(
        [sys.executable, script, str(i), coord, out_json],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out.decode(errors="replace"))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    assert all(p.returncode == 0 for p in procs), \
        "\n".join(f"--- proc {i} ---\n{o}" for i, o in enumerate(outs))
    with open(out_json) as f:
        got = json.load(f)["tokens"]

    # single-process twin (same seed/random weights, same knobs)
    gen_cfg = make_gen_cfg()
    gen_cfg.speculative_blocks = 2
    gen, conn = build(gen_cfg=gen_cfg, resource_kw=dict(multi_step=4))
    try:
        run(gen, conn, [req(1, prompt="multi host lockstep", gen_len=24),
                        req(2, prompt="second one", gen_len=16)])
        assert got["1"] == list(conn.tokens[1])
        assert got["2"] == list(conn.tokens[2])
    finally:
        gen.shutdown()


def test_broadcast_single_process_identity():
    plan = {"op": "step", "plan": {"arrays": {"x": np.arange(4)}}}
    out = multihost.broadcast_plan(plan)
    assert out is plan


def test_plan_pickles():
    gen, conn = build()
    try:
        run(gen, conn, [req(1, gen_len=2)])
        from ppl.llm.serving_tpu.engine import TaskState
        t = TaskState(tid=9, next_tokens=[1, 2, 3], rest_iters=4,
                      page_list=[0, 1], total_len=7)
        plan = gen.engine.build_plan([t])
        blob = pickle.dumps(plan)
        plan2 = pickle.loads(blob)
        assert plan2["n_steps"] == plan["n_steps"]
        np.testing.assert_array_equal(plan2["arrays"]["page_table"],
                                      plan["arrays"]["page_table"])
    finally:
        gen.shutdown()


def test_generator_with_plan_channel_roundtrip():
    """A pickle-roundtrip plan channel (what broadcast does) must not
    change results; speculative continuation rides the channel as a tiny
    marker message instead of a full plan."""
    calls = []

    def channel(plan):
        calls.append(("cont" if plan.get("continuation") else "step",
                      plan["n_steps"]))
        return pickle.loads(pickle.dumps(plan))

    model_cfg = make_model_cfg()
    gen_cfg = make_gen_cfg()
    gen_cfg.speculative_blocks = 2
    resource_cfg = ResourceConfig(
        model_format="random", kv_cache_max_tokens=2048,
        token_buckets=(32, 64, 128, 256), batch_buckets=(4, 8, 16))
    engine, kv_max = create_engine(model_cfg, resource_cfg, gen_cfg)
    conn = LocalConnection()
    gen = LLMGenerator(model_cfg, gen_cfg, engine, DummyTokenizer(), conn,
                       kv_max, plan_channel=channel)
    try:
        run(gen, conn, [req(1, prompt="channel test", gen_len=32)])
        assert len(conn.tokens[1]) == 32
        assert len(calls) >= 2  # prefill step + decode block(s)
        assert any(kind == "cont" for kind, _ in calls)
    finally:
        gen.shutdown()

    # compare against the no-channel run
    from test_generator_e2e import build as build2
    cfg2 = make_gen_cfg()
    cfg2.speculative_blocks = 2
    gen2, conn2 = build2(gen_cfg=cfg2)
    try:
        run(gen2, conn2, [req(1, prompt="channel test", gen_len=32)])
        assert conn2.tokens[1] == conn.tokens[1]
    finally:
        gen2.shutdown()


def test_tp_generator_e2e():
    """Full generator stack with a 2-way TP mesh on the CPU device mesh."""
    model_cfg = make_model_cfg()
    gen_cfg = make_gen_cfg()
    resource_cfg = ResourceConfig(
        model_format="random", kv_cache_max_tokens=2048,
        tensor_parallel_size=2,
        token_buckets=(32, 64, 128, 256), batch_buckets=(4, 8, 16))
    mesh = shardings.make_mesh(2)
    engine, kv_max = create_engine(model_cfg, resource_cfg, gen_cfg,
                                   mesh=mesh)
    conn = LocalConnection()
    gen = LLMGenerator(model_cfg, gen_cfg, engine, DummyTokenizer(), conn,
                       kv_max)
    try:
        run(gen, conn, [req(1, prompt="tensor parallel", gen_len=8),
                        req(2, prompt="second request", gen_len=8)])
        assert len(conn.tokens[1]) == 8 and len(conn.tokens[2]) == 8
        assert engine.kv_cache.sharding.spec[0] == "tp"
    finally:
        gen.shutdown()
