"""Chunked prefill (TPU extension): long prompts stream in chunks of at
most prefill_chunk_tokens per step; generated tokens must be identical
to the unchunked run (the chunk steps use the exact prefix-hit prefill
path)."""

import jax.numpy as jnp
import pytest

from ppl.llm.serving_tpu.config import (ConfigError, GeneratorConfig,
                                        ModelConfig, ResourceConfig)
from ppl.llm.serving_tpu.connection import LocalConnection
from ppl.llm.serving_tpu.generator import LLMGenerator
from ppl.llm.serving_tpu.request import Request
from ppl.llm.serving_tpu.resources import create_engine

from test_generator_e2e import DummyTokenizer, make_gen_cfg

MODEL = ModelConfig(
    hidden_dim=64, intermediate_dim=128, num_layers=2, num_heads=4,
    num_kv_heads=2, vocab_size=256, cache_mode=1, page_size=16,
    dtype="float32")


def run(chunk, prompts, gen_len=8, multi_step=1, spec_blocks=1):
    gen_cfg = make_gen_cfg()
    gen_cfg.prefill_chunk_tokens = chunk
    gen_cfg.speculative_blocks = spec_blocks
    resource_cfg = ResourceConfig(
        model_format="random", kv_cache_max_tokens=2048,
        token_buckets=(32, 64, 128, 256), batch_buckets=(4, 8, 16),
        multi_step=multi_step)
    engine, kv_max = create_engine(MODEL, resource_cfg, gen_cfg)
    conn = LocalConnection()
    gen = LLMGenerator(MODEL, gen_cfg, engine, DummyTokenizer(), conn,
                       kv_max)
    try:
        conn.set_wanted(len(prompts))
        for i, ptoks in enumerate(prompts):
            gen.process(Request(id=i, token_ids=ptoks,
                                generation_length=gen_len, top_k=1,
                                early_stopping=False))
        assert conn.wait(timeout=120)
        return {i: list(conn.tokens[i]) for i in range(len(prompts))}
    finally:
        gen.shutdown()


PROMPTS = [
    [(7 * i + 3) % 250 for i in range(20)],
    [(11 * i + 5) % 250 for i in range(33)],
    [1, 2, 3],                      # shorter than any chunk
]


def test_chunked_matches_unchunked():
    ref = run(0, PROMPTS)
    for chunk in (8, 16):
        out = run(chunk, PROMPTS)
        assert out == ref, (chunk, out, ref)


def test_chunked_with_multi_step_blocks():
    ref = run(0, PROMPTS, multi_step=4)
    out = run(8, PROMPTS, multi_step=4)
    assert out == ref


def test_chunk_allows_prompt_longer_than_step_budget():
    # prompt longer than max_tokens_per_step is only admissible chunked
    gen_cfg = make_gen_cfg()
    gen_cfg.prefill_chunk_tokens = 16
    gen_cfg.max_tokens_per_step = 32
    gen_cfg.max_input_tokens_per_request = 120
    gen_cfg.validate()
    resource_cfg = ResourceConfig(
        model_format="random", kv_cache_max_tokens=2048,
        token_buckets=(32, 64, 128, 256), batch_buckets=(4, 8, 16))
    engine, kv_max = create_engine(MODEL, resource_cfg, gen_cfg)
    conn = LocalConnection()
    gen = LLMGenerator(MODEL, gen_cfg, engine, DummyTokenizer(), conn,
                       kv_max)
    try:
        conn.set_wanted(1)
        long_prompt = [(3 * i + 1) % 250 for i in range(100)]
        gen.process(Request(id=0, token_ids=long_prompt,
                            generation_length=4, top_k=1,
                            early_stopping=False))
        assert conn.wait(timeout=120)
        assert len(conn.tokens[0]) == 4
    finally:
        gen.shutdown()


def test_chunk_incompatible_with_prefix_cache():
    cfg = GeneratorConfig(prefill_chunk_tokens=8, enable_prefix_cache=True)
    with pytest.raises(ConfigError):
        cfg.validate()
