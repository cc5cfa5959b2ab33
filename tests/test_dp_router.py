"""Data-parallel replica routing: N independent generators behind one
frontend (round-robin admission, sticky cancels)."""

import time

from ppl.llm.serving_tpu.config import ResourceConfig
from ppl.llm.serving_tpu.connection import LocalConnection
from ppl.llm.serving_tpu.generator import LLMGenerator
from ppl.llm.serving_tpu.resources import create_engine
from ppl.llm.serving_tpu.serving.dp_router import DataParallelRouter

from test_generator_e2e import DummyTokenizer, make_gen_cfg, make_model_cfg, \
    req


def build_router(n=2):
    conn = LocalConnection()
    gens = []
    for _ in range(n):
        model_cfg = make_model_cfg()
        gen_cfg = make_gen_cfg()
        resource_cfg = ResourceConfig(
            model_format="random", kv_cache_max_tokens=2048,
            token_buckets=(32, 64, 128, 256), batch_buckets=(4, 8, 16))
        engine, kv_max = create_engine(model_cfg, resource_cfg, gen_cfg)
        gens.append(LLMGenerator(model_cfg, gen_cfg, engine,
                                 DummyTokenizer(), conn, kv_max))
    return DataParallelRouter(gens), conn


def test_round_robin_completion():
    router, conn = build_router(2)
    try:
        n = 4
        conn.set_wanted(n)
        for i in range(n):
            router.process(req(i, prompt=f"dp request {i}", gen_len=6))
        assert conn.wait(timeout=180)
        for i in range(n):
            assert len(conn.tokens[i]) == 6
        # round-robin actually spread the work
        assert router._owner[0] != router._owner[1]
    finally:
        router.shutdown()


def test_sticky_cancel():
    router, conn = build_router(2)
    try:
        conn.set_wanted(1)
        r0 = req(0, prompt="to be canceled", gen_len=200)
        r0.early_stopping = False
        router.process(r0)
        router.process(req(1, prompt="short", gen_len=4))
        time.sleep(0.3)
        router.clear_task(0)          # must route to replica 0 only
        assert conn.wait(timeout=180)
        assert len(conn.tokens[1]) == 4
        # replica 0 reclaimed its pages after the cancel
        g0 = router._gens[0]
        time.sleep(1.0)
        assert g0.page_mgr.get_avail() == g0.page_mgr.num_pages
    finally:
        router.shutdown()
