"""Model-family variations: ALiBi position encoding (Baichuan-13B) and
qkv/o attention bias (InternLM) through the one parameterized
llama-family graph (SURVEY.md C11's model zoo: llama/llama3/internlm/
baichuan tokenizer wrappers + this graph)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ppl.llm.serving_tpu.config import ModelConfig
from ppl.llm.serving_tpu.models import llama
from ppl.llm.serving_tpu.ops import attention as attn_ops
from ppl.llm.serving_tpu.ops import kv_cache as kv_ops
from ppl.llm.serving_tpu.ops import sampling as S
from ppl.llm.serving_tpu.ops.kv_cache import CacheSpec

CFG = ModelConfig(
    hidden_dim=64, intermediate_dim=128, num_layers=2, num_heads=4,
    num_kv_heads=2, vocab_size=256, cache_mode=1, page_size=16,
    dtype="float32")
SPEC = CacheSpec(num_layers=2, num_pages=16, page_size=16, num_kv_heads=2,
                 head_dim=16, dtype=jnp.float32)


def greedy_params(b):
    return S.SamplingParams(
        temperature=jnp.ones(b), top_k=jnp.ones(b, jnp.int32),
        top_p=jnp.zeros(b), do_sample=jnp.zeros(b, bool),
        repetition_penalty=jnp.ones(b), presence_penalty=jnp.zeros(b),
        frequency_penalty=jnp.zeros(b))


def prefill_input(tokens, qp=32, kvp=4, start=0, pages=(0, 1)):
    n = len(tokens)
    pt = np.full((1, kvp), SPEC.trash_page, np.int32)
    pt[0, :len(pages)] = pages
    padded = np.zeros((1, qp), np.int32)
    padded[0, :n] = tokens
    return llama.StepInput(
        decode_tokens=jnp.zeros((0,), jnp.int32),
        decode_pos=jnp.zeros((0,), jnp.int32),
        prefill_tokens=jnp.asarray(padded),
        prefill_start=jnp.array([start], jnp.int32),
        prefill_len=jnp.array([n], jnp.int32),
        page_table=jnp.asarray(pt),
        context_len=jnp.array([start + n], jnp.int32),
        batch_slots=jnp.zeros(1, jnp.int32),
        sampling=greedy_params(1))


def decode_input(token, pos, kvp=4, pages=(0, 1)):
    pt = np.full((1, kvp), SPEC.trash_page, np.int32)
    pt[0, :len(pages)] = pages
    return llama.StepInput(
        decode_tokens=jnp.array([token], jnp.int32),
        decode_pos=jnp.array([pos], jnp.int32),
        prefill_tokens=jnp.zeros((0, 8), jnp.int32),
        prefill_start=jnp.zeros((0,), jnp.int32),
        prefill_len=jnp.zeros((0,), jnp.int32),
        page_table=jnp.asarray(pt),
        context_len=jnp.array([pos + 1], jnp.int32),
        batch_slots=jnp.zeros(1, jnp.int32),
        sampling=greedy_params(1))


class TestAlibiSlopes:
    def test_power_of_two(self):
        s = np.asarray(attn_ops.alibi_slopes(8))
        np.testing.assert_allclose(s, [2.0 ** -(i + 1) for i in range(8)],
                                   rtol=1e-6)

    def test_non_power_of_two(self):
        # published recipe: closest pow2 slopes (n=4: start=2^-2, ratio
        # 2^-2) + the even-index terms of the 2n sequence
        s = np.asarray(attn_ops.alibi_slopes(6))
        base = [2.0 ** (-2 * (i + 1)) for i in range(4)]
        extra = [2.0 ** -1, 2.0 ** -3]
        np.testing.assert_allclose(s, base + extra, rtol=1e-6)


def dense_alibi_attention(q, k, v, slopes):
    """Canonical ALiBi reference: penalty -m*(q_pos - k_pos), causal."""
    L, H, hd = q.shape
    scores = np.einsum("qhd,khd->hqk", q, k) / np.sqrt(hd)
    qpos = np.arange(L)[:, None]
    kpos = np.arange(L)[None, :]
    bias = -np.asarray(slopes)[:, None, None] * (qpos - kpos)[None]
    scores = scores + bias
    scores = np.where((kpos <= qpos)[None], scores, -1e30)
    p = np.exp(scores - scores.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    return np.einsum("hqk,khd->qhd", p, v)


class TestAlibiAttention:
    """The shift-invariant slope*k_pos form must equal the canonical
    -m*(q_pos-k_pos) penalty."""

    def _setup(self, L=20):
        rng = np.random.RandomState(0)
        H, KVH, hd = 4, 2, 16
        q = rng.randn(L, H, hd).astype(np.float32)
        k = rng.randn(L, KVH, hd).astype(np.float32)
        v = rng.randn(L, KVH, hd).astype(np.float32)
        cache, _ = kv_ops.init_cache(SPEC)
        slots = jnp.arange(L, dtype=jnp.int32)  # pages 0,1 contiguous
        cache, _ = kv_ops.append_kv(cache, None, jnp.asarray(k),
                                    jnp.asarray(v), slots, SPEC)
        pt = jnp.asarray(np.array([[0, 1, SPEC.trash_page,
                                    SPEC.trash_page]], np.int32))
        slopes = attn_ops.alibi_slopes(H)
        k_dense = np.repeat(k, 2, axis=1)
        v_dense = np.repeat(v, 2, axis=1)
        ref = dense_alibi_attention(q, k_dense, v_dense, slopes)
        return q, cache, pt, slopes, ref, L

    def test_prefill_ref_impl(self):
        q, cache, pt, slopes, ref, L = self._setup()
        out = attn_ops.prefill_attention_ref(
            jnp.asarray(q)[None], cache, None, pt,
            jnp.zeros(1, jnp.int32), jnp.array([L], jnp.int32), SPEC,
            alibi=slopes)[0]
        np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)

    def test_decode_ref_impl(self):
        q, cache, pt, slopes, ref, L = self._setup()
        # last position as a decode query
        out = attn_ops.decode_attention_ref(
            jnp.asarray(q)[-1:][0][None], cache, None, pt,
            jnp.array([L], jnp.int32), SPEC, alibi=slopes)
        np.testing.assert_allclose(np.asarray(out)[0], ref[-1], atol=2e-5)

    def test_pallas_prefill_matches_ref(self):
        from ppl.llm.serving_tpu.ops.pallas import paged_attention as pa
        q, cache, pt, slopes, ref, L = self._setup()
        qp = 32
        qpad = np.zeros((1, qp, 4, 16), np.float32)
        qpad[0, :L] = q
        out = pa.paged_prefill_attention(
            jnp.asarray(qpad), cache, None, pt,
            jnp.zeros(1, jnp.int32), jnp.array([L], jnp.int32), SPEC,
            interpret=True, alibi=slopes)
        np.testing.assert_allclose(np.asarray(out)[0, :L], ref, atol=2e-4)

    def test_pallas_decode_matches_ref(self):
        from ppl.llm.serving_tpu.ops.pallas import paged_attention as pa
        q, cache, pt, slopes, ref, L = self._setup()
        out = pa.paged_decode_attention(
            jnp.asarray(q[-1:]), cache, None, pt,
            jnp.array([L], jnp.int32), SPEC, interpret=True, alibi=slopes)
        np.testing.assert_allclose(np.asarray(out)[0], ref[-1], atol=2e-4)


class TestAlibiModel:
    def test_prefill_then_decode_consistent(self):
        """Decoding token L given prefill of [0,L) must equal prefilling
        [0,L+1) — position handling is consistent across modes."""
        cfg = dataclasses.replace(CFG, position_encoding="alibi")
        params = llama.init_params(cfg, jax.random.PRNGKey(0),
                                   dtype=jnp.float32)
        step = llama.make_step_fn(cfg, SPEC, return_logits=True)
        rng = np.random.RandomState(1)
        seq = rng.randint(0, 250, size=21)

        cache, _ = kv_ops.init_cache(SPEC)
        scale = jnp.zeros((1,), jnp.float32)
        cm = jnp.zeros((1, 1), jnp.int32)
        out_full = step(params, cache, scale, cm,
                        prefill_input(seq), jax.random.PRNGKey(0))

        cache2, _ = kv_ops.init_cache(SPEC)
        out_pre = step(params, cache2, scale, cm,
                       prefill_input(seq[:-1]), jax.random.PRNGKey(0))
        out_dec = step(params, out_pre.kv_cache, out_pre.kv_scale, cm,
                       decode_input(seq[-1], len(seq) - 1),
                       jax.random.PRNGKey(0))
        np.testing.assert_allclose(np.asarray(out_dec.logits[0]),
                                   np.asarray(out_full.logits[0]),
                                   atol=1e-4)

    def test_alibi_differs_from_rope(self):
        params = llama.init_params(CFG, jax.random.PRNGKey(0),
                                   dtype=jnp.float32)
        seq = (np.arange(12) * 11 + 5) % 250
        outs = {}
        for pe in ("rope", "alibi"):
            cfg = dataclasses.replace(CFG, position_encoding=pe)
            step = llama.make_step_fn(cfg, SPEC, return_logits=True)
            cache, _ = kv_ops.init_cache(SPEC)
            scale = jnp.zeros((1,), jnp.float32)
            out = step(params, cache, scale,
                       jnp.zeros((1, 1), jnp.int32),
                       prefill_input(seq), jax.random.PRNGKey(0))
            outs[pe] = np.asarray(out.logits[0])
        assert np.abs(outs["rope"] - outs["alibi"]).max() > 1e-3


class TestAttnBias:
    def test_bias_changes_output(self):
        cfg = dataclasses.replace(CFG, attn_bias=True)
        params = llama.init_params(cfg, jax.random.PRNGKey(0),
                                   dtype=jnp.float32)
        assert "bqkv" in params["layers"][0]
        step = llama.make_step_fn(cfg, SPEC, return_logits=True)
        seq = (np.arange(10) * 13 + 1) % 250
        cache, _ = kv_ops.init_cache(SPEC)
        scale = jnp.zeros((1,), jnp.float32)
        out = step(params, cache, scale,
                   jnp.zeros((1, 1), jnp.int32), prefill_input(seq),
                   jax.random.PRNGKey(0))
        # zero the biases -> different logits
        params0 = jax.tree.map(lambda x: x, params)
        for lp in params0["layers"]:
            lp["bqkv"] = jnp.zeros_like(lp["bqkv"])
            lp["bo"] = jnp.zeros_like(lp["bo"])
        cache2, _ = kv_ops.init_cache(SPEC)
        out0 = step(params0, cache2, scale,
                    jnp.zeros((1, 1), jnp.int32), prefill_input(seq),
                    jax.random.PRNGKey(0))
        assert np.abs(np.asarray(out.logits)
                      - np.asarray(out0.logits)).max() > 1e-4

    def test_bias_quantized_params_carry_through(self):
        cfg = dataclasses.replace(CFG, attn_bias=True)
        params = llama.quantize_model_params(
            llama.init_params(cfg, jax.random.PRNGKey(0),
                              dtype=jnp.float32))
        assert "bqkv" in params["layers"][0]
        step = llama.make_step_fn(cfg, SPEC, return_logits=True,
                                  quant_method="online_i8i8")
        seq = (np.arange(10) * 13 + 1) % 250
        cache, _ = kv_ops.init_cache(SPEC)
        scale = jnp.zeros((1,), jnp.float32)
        out = step(params, cache, scale,
                   jnp.zeros((1, 1), jnp.int32), prefill_input(seq),
                   jax.random.PRNGKey(0))
        assert np.isfinite(np.asarray(out.logits)).all()


class TestHFConfigMapping:
    def test_internlm_bias(self, tmp_path):
        doc = {"num_attention_heads": 32, "num_hidden_layers": 32,
               "hidden_size": 4096, "intermediate_size": 11008,
               "vocab_size": 103168, "model_type": "internlm",
               "bias": True}
        p = tmp_path / "config.json"
        p.write_text(__import__("json").dumps(doc))
        cfg = ModelConfig.from_hf_config(str(p))
        assert cfg.attn_bias and cfg.position_encoding == "rope"

    def test_baichuan_13b_alibi(self, tmp_path):
        doc = {"num_attention_heads": 40, "num_hidden_layers": 40,
               "hidden_size": 5120, "intermediate_size": 13696,
               "vocab_size": 64000, "model_type": "baichuan"}
        p = tmp_path / "config.json"
        p.write_text(__import__("json").dumps(doc))
        cfg = ModelConfig.from_hf_config(str(p))
        assert cfg.position_encoding == "alibi" and not cfg.attn_bias

    def test_baichuan_7b_rope(self, tmp_path):
        doc = {"num_attention_heads": 32, "num_hidden_layers": 32,
               "hidden_size": 4096, "intermediate_size": 11008,
               "vocab_size": 64000, "model_type": "baichuan"}
        p = tmp_path / "config.json"
        p.write_text(__import__("json").dumps(doc))
        cfg = ModelConfig.from_hf_config(str(p))
        assert cfg.position_encoding == "rope"


def test_alibi_e2e_generator():
    """Full continuous-batching e2e with an ALiBi model."""
    from test_generator_e2e import DummyTokenizer, make_gen_cfg
    from ppl.llm.serving_tpu.config import ResourceConfig
    from ppl.llm.serving_tpu.connection import LocalConnection
    from ppl.llm.serving_tpu.generator import LLMGenerator
    from ppl.llm.serving_tpu.request import Request
    from ppl.llm.serving_tpu.resources import create_engine

    model_cfg = dataclasses.replace(CFG, position_encoding="alibi")
    gen_cfg = make_gen_cfg()
    resource_cfg = ResourceConfig(
        model_format="random", kv_cache_max_tokens=2048,
        token_buckets=(32, 64, 128, 256), batch_buckets=(4, 8, 16))
    engine, kv_max = create_engine(model_cfg, resource_cfg, gen_cfg)
    conn = LocalConnection()
    gen = LLMGenerator(model_cfg, gen_cfg, engine, DummyTokenizer(), conn,
                       kv_max)
    try:
        conn.set_wanted(2)
        for i in range(2):
            gen.process(Request(id=i, prompt=f"alibi {i}",
                                generation_length=8, top_k=1,
                                early_stopping=False))
        assert conn.wait(timeout=120)
        assert len(conn.tokens[0]) == 8 and len(conn.tokens[1]) == 8
    finally:
        gen.shutdown()
