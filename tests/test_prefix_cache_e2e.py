"""Prefix cache end-to-end through the generator (SURVEY.md section 7.1
item 4): partial hits, full-hit replay, refcount lifecycle, eviction."""

import time

import pytest

from ppl.llm.serving_tpu.config import ResourceConfig
from ppl.llm.serving_tpu.connection import LocalConnection
from ppl.llm.serving_tpu.generator import LLMGenerator
from ppl.llm.serving_tpu.request import Request
from ppl.llm.serving_tpu.resources import create_engine

from test_generator_e2e import DummyTokenizer, make_gen_cfg, make_model_cfg


def build_prefix(kv_tokens=2048):
    model_cfg = make_model_cfg()
    gen_cfg = make_gen_cfg(enable_prefix_cache=True, max_prefill_batch=1)
    resource_cfg = ResourceConfig(
        model_format="random", kv_cache_max_tokens=kv_tokens,
        token_buckets=(32, 64, 128, 256), batch_buckets=(4, 8, 16))
    engine, kv_max = create_engine(model_cfg, resource_cfg, gen_cfg)
    conn = LocalConnection()
    gen = LLMGenerator(model_cfg, gen_cfg, engine, DummyTokenizer(), conn,
                       kv_max)
    return gen, conn


# page_size=16; prompt of 3 chars + BOS -> need >= 16*2 chars for 2 pages
LONG_PROMPT = ("abcdefghijklmnop" * 4)[:47]  # 47 chars + BOS = 48 = 3 pages


def run(gen, conn, reqs, timeout=120):
    conn.set_wanted(len(reqs))
    for r in reqs:
        gen.process(r)
    assert conn.wait(timeout=timeout)


def req(tid, prompt=LONG_PROMPT, gen_len=6, **kw):
    base = dict(id=tid, prompt=prompt, generation_length=gen_len,
                top_k=1, early_stopping=False)
    base.update(kw)
    return Request(**base)


@pytest.fixture()
def stack():
    gen, conn = build_prefix()
    yield gen, conn
    gen.shutdown()


def test_warm_hit_same_tokens(stack):
    gen, conn = stack
    run(gen, conn, [req(1)])
    cold = conn.tokens[1]
    hits_before = gen.profiler.global_.cache_hit_count
    time.sleep(0.05)
    run(gen, conn, [req(2)])
    assert conn.tokens[2] == cold
    # full prompt (48 tokens = 3 full pages) hit on the warm run
    assert gen.profiler.global_.cache_hit_count - hits_before == 48


def test_partial_prefix_hit(stack):
    gen, conn = stack
    run(gen, conn, [req(1)])
    cold = conn.tokens[1]
    time.sleep(0.05)
    # same first 2 pages, different tail -> partial hit of 32 tokens
    other = LONG_PROMPT[:40] + "XYZZY37"
    hits_before = gen.profiler.global_.cache_hit_count
    run(gen, conn, [req(3, prompt=other)])
    assert gen.profiler.global_.cache_hit_count - hits_before == 32
    run(gen, conn, [req(4)])
    assert conn.tokens[4] == cold  # original prefix entries still correct


def test_cached_pages_survive_finish(stack):
    """Pages stay in the prefix cache (refcount 0, evictable) after the
    request finishes — not returned to the page manager."""
    gen, conn = stack
    total = gen.page_mgr.num_pages
    run(gen, conn, [req(1)])
    time.sleep(0.1)
    assert len(gen.prefix_cache) == 3
    assert gen.prefix_cache.evictable_count == 3
    assert gen.page_mgr.get_avail() == total - 3


def test_eviction_under_pressure():
    """When the page pool runs dry, LRU prefix pages are evicted to admit
    new requests (llm_generator.cc:516-527)."""
    gen, conn = build_prefix(kv_tokens=16 * 12)  # only 12 pages
    try:
        # each request: 48-token prompt (3 pages) + gen 6 -> 4 pages total
        for i, base in enumerate(("aaaa", "bbbb", "cccc", "dddd")):
            prompt = (base * 12)[:47]
            run(gen, conn, [req(10 + i, prompt=prompt)])
            time.sleep(0.05)
        # far more distinct prefixes than the pool holds: eviction happened
        # and every request still completed
        for i in range(4):
            assert len(conn.tokens[10 + i]) == 6
        assert len(gen.prefix_cache) <= 12
    finally:
        gen.shutdown()


def test_concurrent_shared_prefix_same_admission():
    """Two identical prompts admitted back-to-back share pages (the
    duplicate-insert path) and both complete correctly."""
    gen, conn = build_prefix()
    try:
        # max_prefill_batch=1 forces separate steps, but both are in the
        # queue together; the second should hit the first's pages
        run(gen, conn, [req(1), req(2)])
        assert conn.tokens[1] == conn.tokens[2]
        time.sleep(0.1)
        # pages: 3 prefix pages cached once (+0 leaked)
        assert len(gen.prefix_cache) == 3
        used = gen.page_mgr.num_pages - gen.page_mgr.get_avail()
        assert used == 3
    finally:
        gen.shutdown()
