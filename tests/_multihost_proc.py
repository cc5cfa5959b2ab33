"""Subprocess entry for the real 2-process multi-host lockstep test.

Run as: python tests/_multihost_proc.py <process_id> <coord_addr> <out_json>

Process 0 is the controller (scheduler + generator, plan channel =
``multihost.controller_plan_channel``); process 1 runs
``multihost.worker_serve`` — the exact code path the production
``tools/llm_server.py --coordinator-address`` wiring uses
(north-star control plane, SURVEY.md section 7.3).
"""

import json
import os
import sys

proc_id = int(sys.argv[1])
coord = sys.argv[2]
out_path = sys.argv[3]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = ("--xla_force_host_platform_device_count=1 "
                           + os.environ.get("XLA_FLAGS", ""))
_here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _here)                       # test helpers
sys.path.insert(0, os.path.dirname(_here))      # repo root (ppl package)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from ppl.llm.serving_tpu.config import ResourceConfig  # noqa: E402
from ppl.llm.serving_tpu.connection import LocalConnection  # noqa: E402
from ppl.llm.serving_tpu.generator import LLMGenerator  # noqa: E402
from ppl.llm.serving_tpu.parallel import multihost, shardings  # noqa: E402
from ppl.llm.serving_tpu.resources import create_engine  # noqa: E402

from test_generator_e2e import (DummyTokenizer, make_gen_cfg,  # noqa: E402
                                make_model_cfg, req, run)


def main():
    multihost.initialize(coord, 2, proc_id)
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 2, jax.device_count()

    model_cfg = make_model_cfg()
    gen_cfg = make_gen_cfg()
    gen_cfg.speculative_blocks = 2
    resource_cfg = ResourceConfig(
        model_format="random", kv_cache_max_tokens=2048,
        tensor_parallel_size=2, multi_step=4,
        token_buckets=(32, 64, 128, 256), batch_buckets=(4, 8, 16))
    mesh = shardings.make_mesh(2)
    engine, kv_max = create_engine(model_cfg, resource_cfg, gen_cfg,
                                   mesh=mesh)

    if not multihost.is_controller():
        multihost.worker_serve(engine)
        return

    conn = LocalConnection()
    gen = LLMGenerator(model_cfg, gen_cfg, engine, DummyTokenizer(), conn,
                       kv_max,
                       plan_channel=multihost.controller_plan_channel)
    try:
        # long enough for prefill + several multi-step blocks + spec
        # continuation messages; staggered second request forces a
        # mid-run membership change (plan rebuild on the channel)
        reqs = [req(1, prompt="multi host lockstep", gen_len=24),
                req(2, prompt="second one", gen_len=16)]
        run(gen, conn, reqs, timeout=600)
        result = {"tokens": {str(k): list(v) for k, v in conn.tokens.items()}}
    finally:
        gen.shutdown()
        multihost.broadcast_stop()
    with open(out_path, "w") as f:
        json.dump(result, f)


if __name__ == "__main__":
    main()
