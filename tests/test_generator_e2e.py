"""End-to-end continuous-batching tests: generator + engine + tiny random
model on CPU (SURVEY.md section 4's "CPU-backend end-to-end decode-loop
tests with a tiny random-weight model")."""

import time

import numpy as np
import pytest

from ppl.llm.serving_tpu.config import (GeneratorConfig, ModelConfig,
                                        ResourceConfig)
from ppl.llm.serving_tpu.connection import LocalConnection
from ppl.llm.serving_tpu.generator import LLMGenerator
from ppl.llm.serving_tpu.request import FinishFlag, Request
from ppl.llm.serving_tpu.resources import create_engine


class DummyTokenizer:
    """byte-level tokenizer for tests."""

    bos_id = 1
    eos_id = 2
    vocab_size = 256

    def encode(self, text):
        return [self.bos_id] + list(text.encode("utf-8"))

    def decode(self, ids):
        return bytes(i for i in ids if 0 <= i < 256).decode(
            "utf-8", errors="replace")


def make_model_cfg(**kw):
    base = dict(hidden_dim=64, intermediate_dim=128, num_layers=2,
                num_heads=4, num_kv_heads=2, vocab_size=256,
                cache_mode=1, page_size=16, dtype="float32")
    base.update(kw)
    return ModelConfig(**base)


def make_gen_cfg(**kw):
    base = dict(max_running_batch=8, max_prefill_batch=4,
                max_tokens_per_step=256,
                max_input_tokens_per_request=128,
                max_output_tokens_per_request=64,
                max_total_tokens_per_request=192,
                stop_tokens=frozenset({2}))
    base.update(kw)
    return GeneratorConfig(**base)


def build(model_cfg=None, gen_cfg=None, resource_kw=None, conn=None):
    model_cfg = model_cfg or make_model_cfg()
    gen_cfg = gen_cfg or make_gen_cfg()
    rkw = dict(model_format="random", kv_cache_max_tokens=2048,
               token_buckets=(32, 64, 128, 256), batch_buckets=(4, 8, 16))
    if resource_kw:
        rkw.update(resource_kw)
    resource_cfg = ResourceConfig(**rkw)
    gen_cfg.enable_penalty = resource_cfg.enable_penalty
    engine, kv_max = create_engine(model_cfg, resource_cfg, gen_cfg)
    conn = conn or LocalConnection()
    gen = LLMGenerator(model_cfg, gen_cfg, engine, DummyTokenizer(),
                       conn, kv_max)
    return gen, conn


def req(tid, prompt="hello world", gen_len=8, **kw):
    base = dict(id=tid, prompt=prompt, generation_length=gen_len,
                temperature=1.0, top_k=1, early_stopping=False)
    base.update(kw)
    return Request(**base)


@pytest.fixture(scope="module")
def stack():
    gen, conn = build()
    yield gen, conn
    gen.shutdown()


def run(gen, conn, requests, timeout=120):
    conn.set_wanted(len(requests))
    for r in requests:
        gen.process(r)
    assert conn.wait(timeout=timeout), "generation timed out"


def test_single_request_greedy(stack):
    gen, conn = stack
    run(gen, conn, [req(1, gen_len=8)])
    assert len(conn.tokens[1]) == 8
    assert conn.finish_flags[1] == FinishFlag.LENGTH
    assert conn.prompt_tokens[1][0] == 1  # BOS via on_tokenize


def test_greedy_deterministic(stack):
    gen, conn = stack
    run(gen, conn, [req(10, prompt="determinism", gen_len=12)])
    first = conn.tokens[10]
    run(gen, conn, [req(11, prompt="determinism", gen_len=12)])
    assert conn.tokens[11] == first


def test_batch_of_requests(stack):
    gen, conn = stack
    reqs = [req(100 + i, prompt=f"prompt {i}", gen_len=6 + i)
            for i in range(5)]
    run(gen, conn, reqs)
    for i in range(5):
        assert len(conn.tokens[100 + i]) == 6 + i, f"req {i}"


def test_staggered_arrival_continuous_batching(stack):
    """Requests arriving while the loop is running join the batch."""
    gen, conn = stack
    conn.set_wanted(3)
    gen.process(req(200, gen_len=30))
    time.sleep(0.15)
    gen.process(req(201, gen_len=10))
    time.sleep(0.05)
    gen.process(req(202, gen_len=10))
    assert conn.wait(timeout=120)
    for t in (200, 201, 202):
        assert conn.finish_flags[t] == FinishFlag.LENGTH


def test_batch_isolation(stack):
    """A request's output must not depend on what else is in the batch."""
    gen, conn = stack
    run(gen, conn, [req(300, prompt="isolation test", gen_len=10)])
    solo = conn.tokens[300]
    reqs = [req(301, prompt="isolation test", gen_len=10),
            req(302, prompt="other prompt entirely", gen_len=10),
            req(303, prompt="third", gen_len=10)]
    run(gen, conn, reqs)
    assert conn.tokens[301] == solo


def test_token_in_out_mode(stack):
    gen, conn = stack
    r = Request(id=400, token_ids=[1, 5, 9, 13], generation_length=5,
                top_k=1, early_stopping=False)
    run(gen, conn, [r])
    assert len(conn.tokens[400]) == 5
    # token-in-out responses carry no text
    assert conn.text(400) == ""


def test_gen_len_clamped(stack):
    """Over-budget generation_length is clamped. Reference semantics
    (llm_generator.cc:452-477): when both the max_output and max_total
    caps trigger, the total-len clamp is applied last and wins."""
    gen, conn = stack
    run(gen, conn, [req(500, gen_len=1000)])
    # prompt = 12 tokens -> total-len clamp = 192 - 12 = 180
    assert len(conn.tokens[500]) == 180


def test_over_long_prompt_fails(stack):
    gen, conn = stack
    r = req(600, prompt="x" * 500, gen_len=4)  # 501 tokens > 128 max input
    run(gen, conn, [r])
    assert 600 in conn.failures


def test_streaming_text_decodes(stack):
    gen, conn = stack
    run(gen, conn, [req(700, gen_len=12)])
    # byte tokens decode to some string (replacement chars allowed)
    assert isinstance(conn.text(700), str)


def test_early_stop_on_stop_token(stack):
    """If the model emits token 2 (eos) with early_stopping, finish early."""
    gen, conn = stack
    r = req(800, gen_len=64, early_stopping=True)
    r.stop_tokens = set(range(256))  # every token stops: finish after 1
    run(gen, conn, [r])
    assert len(conn.tokens[800]) == 1
    assert conn.finish_flags[800] == FinishFlag.EOS_TOKEN


def test_cancel_request():
    gen, conn = build()
    try:
        conn.set_wanted(1)
        gen.process(req(900, gen_len=64))
        time.sleep(0.3)
        gen.clear_task(900)
        # the other request drains normally afterwards
        conn.set_wanted(2)  # 900 (never finishes) + 901
        gen.process(req(901, gen_len=4))
        deadline = time.time() + 120
        while 901 not in conn.finish_flags and time.time() < deadline:
            time.sleep(0.05)
        assert conn.finish_flags.get(901) == FinishFlag.LENGTH
        # canceled request stopped producing and resources were freed
        assert gen.page_mgr.get_avail() == gen.page_mgr.num_pages
    finally:
        gen.shutdown()


def test_kv_resources_released(stack):
    gen, conn = stack
    run(gen, conn, [req(1000 + i, gen_len=4) for i in range(4)])
    time.sleep(0.1)
    assert gen.page_mgr.get_avail() == gen.page_mgr.num_pages
    assert gen.batch_slots_mgr.get_available_block_num() == \
        gen.gen_cfg.max_running_batch


def test_linear_cache_mode():
    gen, conn = build(model_cfg=make_model_cfg(cache_mode=0))
    try:
        run(gen, conn, [req(1, gen_len=6), req(2, gen_len=6)])
        assert len(conn.tokens[1]) == 6 and len(conn.tokens[2]) == 6
        time.sleep(0.1)
        assert gen.idx_mgr.get_available_block_num() == gen.idx_mgr.capacity
    finally:
        gen.shutdown()


def test_penalty_mode_smoke():
    gen, conn = build(resource_kw=dict(enable_penalty=True))
    try:
        r = req(1, gen_len=12, repetition_penalty=1.3,
                presence_penalty=0.2, frequency_penalty=0.1)
        run(gen, conn, [r])
        assert len(conn.tokens[1]) == 12
        time.sleep(0.1)
        assert gen.batch_slots_mgr.get_available_block_num() == \
            gen.gen_cfg.max_running_batch
    finally:
        gen.shutdown()


def test_sampling_mode_runs():
    gen, conn = build()
    try:
        r = req(1, gen_len=16, top_k=50, top_p=0.9, temperature=0.8)
        run(gen, conn, [r])
        assert len(conn.tokens[1]) == 16
    finally:
        gen.shutdown()
