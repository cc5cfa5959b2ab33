"""i8i8 quantization: op-level numerics, model-level accuracy vs float,
e2e decode, int8 KV cache accuracy (SURVEY.md section 7.1 item 5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ppl.llm.serving_tpu.config import ModelConfig
from ppl.llm.serving_tpu.models import llama
from ppl.llm.serving_tpu.ops import kv_cache as kv_ops
from ppl.llm.serving_tpu.ops import quant as Q
from ppl.llm.serving_tpu.ops import sampling as S
from ppl.llm.serving_tpu.ops.kv_cache import CacheSpec


class TestQuantOps:
    def test_weight_roundtrip(self):
        w = jax.random.normal(jax.random.PRNGKey(0), (64, 32))
        q, s = Q.quantize_weight(w, contract_axis=0)
        assert q.dtype == jnp.int8 and s.shape == (32,)
        w2 = q.astype(jnp.float32) * s[None, :]
        assert jnp.abs(w2 - w).max() / jnp.abs(w).max() < 0.01

    def test_weight_multidim(self):
        w = jax.random.normal(jax.random.PRNGKey(1), (3, 64, 4, 8))
        q, s = Q.quantize_weight(w, contract_axis=1)
        assert s.shape == (3, 4, 8)

    def test_activation_per_token(self):
        x = jnp.stack([jnp.ones(64) * 100.0, jnp.ones(64) * 0.01])
        q, s = Q.quantize_activation(x)
        # each token row quantized against its own absmax
        np.testing.assert_array_equal(q, jnp.full((2, 64), 127, jnp.int8))
        np.testing.assert_allclose(s, [100 / 127, 0.01 / 127], rtol=1e-6)

    def test_zero_row(self):
        q, s = Q.quantize_activation(jnp.zeros((2, 16)))
        assert not jnp.any(jnp.isnan(s))
        np.testing.assert_array_equal(q, 0)

    def test_i8i8_matmul_vs_fp(self):
        key = jax.random.PRNGKey(2)
        x = jax.random.normal(key, (16, 128))
        w = jax.random.normal(jax.random.PRNGKey(3), (128, 64)) * 0.1
        wq, ws = Q.quantize_weight(w)
        out = Q.i8i8_matmul(x, wq, ws)
        ref = x @ w
        rel = jnp.abs(out - ref).max() / jnp.abs(ref).max()
        assert rel < 0.02

    def test_i8i8_matmul_fused_3d(self):
        # fused contract: w stored C-leading [C, D, N] -> out [C, T, N]
        x = jax.random.normal(jax.random.PRNGKey(4), (8, 32))
        w = jax.random.normal(jax.random.PRNGKey(5), (32, 2, 16)) * 0.1
        wq, ws = Q.quantize_weight(w, contract_axis=0)
        out = Q.i8i8_matmul(x, wq.transpose(1, 0, 2), ws)
        ref = jnp.einsum("td,dci->cti", x, w)
        assert out.shape == (2, 8, 16)
        rel = jnp.abs(out - ref).max() / jnp.abs(ref).max()
        assert rel < 0.02

    def test_i8i8_matmul_4d_out(self):
        x = jax.random.normal(jax.random.PRNGKey(4), (8, 32))
        w = jax.random.normal(jax.random.PRNGKey(5), (32, 2, 3, 16)) * 0.1
        wq, ws = Q.quantize_weight(w, contract_axis=0)
        out = Q.i8i8_matmul(x, wq, ws)
        ref = jnp.einsum("td,dcgi->tcgi", x, w)
        assert out.shape == (8, 2, 3, 16)
        rel = jnp.abs(out - ref).max() / jnp.abs(ref).max()
        assert rel < 0.02


class TestPallasI8I8Matmul:
    """Fused weight-streaming kernel (ops/pallas/quant_matmul.py) must
    match the XLA composition bit-for-bit up to f32 epilogue round-off."""

    def _check(self, t, d, out_shape, block_n=0):
        from ppl.llm.serving_tpu.ops.pallas.quant_matmul import (
            i8i8_matmul_pallas)
        x = jax.random.normal(jax.random.PRNGKey(0), (t, d), jnp.bfloat16)
        w = jax.random.normal(jax.random.PRNGKey(1), (d,) + out_shape,
                              jnp.float32) * 0.1
        wq, ws = Q.quantize_weight(w, contract_axis=0)
        ref = Q.i8i8_matmul(x, wq, ws)
        out = i8i8_matmul_pallas(x, wq, ws, interpret=True, block_n=block_n)
        assert out.shape == ref.shape
        denom = float(jnp.abs(ref).max()) or 1.0
        assert float(jnp.abs(out - ref).max()) / denom < 1e-5

    def test_2d(self):
        self._check(16, 256, (256,))

    def test_multidim_out(self):
        self._check(8, 256, (2, 3, 64))

    def test_fused_3d_c_leading(self):
        from ppl.llm.serving_tpu.ops.pallas.quant_matmul import (
            i8i8_matmul_pallas)
        x = jax.random.normal(jax.random.PRNGKey(0), (8, 256), jnp.bfloat16)
        w = jax.random.normal(jax.random.PRNGKey(1), (256, 2, 192),
                              jnp.float32) * 0.1
        wq, ws = Q.quantize_weight(w, contract_axis=0)
        wq_c = wq.transpose(1, 0, 2)          # stored [C, D, N]
        ref = Q.i8i8_matmul(x, wq_c, ws)      # [C, T, N]
        out = i8i8_matmul_pallas(x, wq_c, ws, interpret=True, block_n=128)
        assert out.shape == (2, 8, 192)
        denom = float(jnp.abs(ref).max()) or 1.0
        assert float(jnp.abs(out - ref).max()) / denom < 1e-5

    def test_nondivisible_n(self):
        self._check(16, 256, (300,), block_n=128)

    def test_bf16_out_dtype(self):
        """out_dtype=bf16 (the production layer-matmul setting: skips the
        f32 HBM round-trip) must equal the f32 result rounded to bf16."""
        from ppl.llm.serving_tpu.ops.pallas.quant_matmul import (
            i8i8_matmul_pallas)
        x = jax.random.normal(jax.random.PRNGKey(0), (16, 256),
                              jnp.bfloat16)
        w = jax.random.normal(jax.random.PRNGKey(1), (256, 256),
                              jnp.float32) * 0.1
        wq, ws = Q.quantize_weight(w, contract_axis=0)
        ref = i8i8_matmul_pallas(x, wq, ws, interpret=True)
        out = i8i8_matmul_pallas(x, wq, ws, interpret=True,
                                 out_dtype=jnp.bfloat16)
        assert out.dtype == jnp.bfloat16
        assert jnp.array_equal(out, ref.astype(jnp.bfloat16))

    def test_zero_rows(self):
        self._check(8, 256, (128,))

    def test_model_step_pallas_quant_matches_xla(self):
        """Whole fused step with quant_impl=pallas_interpret equals the
        XLA i8i8 step."""
        params = llama.quantize_model_params(
            llama.init_params(CFG, jax.random.PRNGKey(0),
                              dtype=jnp.float32))
        cache, _ = kv_ops.init_cache(SPEC)
        scale = jnp.zeros((1,), jnp.float32)
        cm = jnp.zeros((1, 1), jnp.int32)
        seq = (np.arange(20) * 7 + 3) % 250
        outs = []
        for qimpl in ("xla", "pallas_interpret"):
            step = llama.make_step_fn(CFG, SPEC, return_logits=True,
                                      quant_method="online_i8i8",
                                      quant_impl=qimpl)
            out = step(params, cache, scale, cm,
                       prefill_input(seq, SPEC), jax.random.PRNGKey(0))
            outs.append(np.asarray(out.logits[0]))
        rel = np.abs(outs[0] - outs[1]).max() / (np.abs(outs[0]).max() or 1)
        assert rel < 1e-4, rel


CFG = ModelConfig(
    hidden_dim=64, intermediate_dim=128, num_layers=2, num_heads=4,
    num_kv_heads=2, vocab_size=256, cache_mode=1, page_size=16,
    dtype="float32",
)
SPEC = CacheSpec(num_layers=2, num_pages=16, page_size=16, num_kv_heads=2,
                 head_dim=16, dtype=jnp.float32)
QSPEC = CacheSpec(num_layers=2, num_pages=16, page_size=16, num_kv_heads=2,
                  head_dim=16, quant_bit=8, quant_group=8,
                  dtype=jnp.float32)


def greedy(b):
    return S.SamplingParams(
        temperature=jnp.ones(b), top_k=jnp.ones(b, jnp.int32),
        top_p=jnp.zeros(b), do_sample=jnp.zeros(b, bool),
        repetition_penalty=jnp.ones(b), presence_penalty=jnp.zeros(b),
        frequency_penalty=jnp.zeros(b))


def prefill_input(seq, spec, qp=32, kvp=4):
    pt = np.full((1, kvp), spec.trash_page, np.int32)
    pt[0, :2] = [0, 1]
    padded = np.zeros((1, qp), np.int32)
    padded[0, :len(seq)] = seq
    return llama.StepInput(
        decode_tokens=jnp.zeros((0,), jnp.int32),
        decode_pos=jnp.zeros((0,), jnp.int32),
        prefill_tokens=jnp.asarray(padded),
        prefill_start=jnp.zeros(1, jnp.int32),
        prefill_len=jnp.array([len(seq)], jnp.int32),
        page_table=jnp.asarray(pt),
        context_len=jnp.array([len(seq)], jnp.int32),
        batch_slots=jnp.zeros(1, jnp.int32),
        sampling=greedy(1),
    )


def run_model(spec, quant_method):
    params = llama.init_params(CFG, jax.random.PRNGKey(0),
                               dtype=jnp.float32)
    if quant_method == "online_i8i8":
        params = llama.quantize_model_params(params)
    step = llama.make_step_fn(CFG, spec, return_logits=True,
                              quant_method=quant_method)
    cache, scale = kv_ops.init_cache(spec)
    if scale is None:
        scale = jnp.zeros((1,), jnp.float32)
    cm = jnp.zeros((1, 1), jnp.int32)
    seq = (np.arange(20) * 7 + 3) % 250
    out = step(params, cache, scale, cm, prefill_input(seq, spec),
               jax.random.PRNGKey(0))
    return np.asarray(out.logits[0])


def test_i8i8_model_close_to_float():
    """Accuracy target: i8i8 must track the float model closely — the
    stand-in for the <=0.1 perplexity-delta budget at tiny scale."""
    ref = run_model(SPEC, "none")
    quant = run_model(SPEC, "online_i8i8")
    # top-1 prediction preserved and logits close in relative terms
    assert ref.argmax() == quant.argmax()
    rel = np.abs(quant - ref).max() / np.abs(ref).max()
    assert rel < 0.05, rel


def test_int8_kv_cache_close_to_float():
    ref = run_model(SPEC, "none")
    qkv = run_model(QSPEC, "none")
    assert ref.argmax() == qkv.argmax()
    rel = np.abs(qkv - ref).max() / np.abs(ref).max()
    assert rel < 0.05, rel


def test_i8i8_plus_int8_kv_e2e_decode():
    """Full generator e2e with both quantizations on."""
    from test_generator_e2e import DummyTokenizer, make_gen_cfg
    from ppl.llm.serving_tpu.config import ResourceConfig
    from ppl.llm.serving_tpu.connection import LocalConnection
    from ppl.llm.serving_tpu.generator import LLMGenerator
    from ppl.llm.serving_tpu.request import Request
    from ppl.llm.serving_tpu.resources import create_engine

    model_cfg = ModelConfig(
        hidden_dim=64, intermediate_dim=128, num_layers=2, num_heads=4,
        num_kv_heads=2, vocab_size=256, cache_mode=1, page_size=16,
        dtype="float32", cache_quant_bit=8, cache_quant_group=8)
    gen_cfg = make_gen_cfg()
    resource_cfg = ResourceConfig(
        model_format="random", kv_cache_max_tokens=2048,
        quant_method="online_i8i8",
        token_buckets=(32, 64, 128, 256), batch_buckets=(4, 8, 16))
    engine, kv_max = create_engine(model_cfg, resource_cfg, gen_cfg)
    assert engine.kv_cache.dtype == jnp.int8
    conn = LocalConnection()
    gen = LLMGenerator(model_cfg, gen_cfg, engine, DummyTokenizer(), conn,
                       kv_max)
    try:
        conn.set_wanted(2)
        for i in range(2):
            gen.process(Request(id=i, prompt=f"quantized {i}",
                                generation_length=8, top_k=1,
                                early_stopping=False))
        assert conn.wait(timeout=120)
        assert len(conn.tokens[0]) == 8 and len(conn.tokens[1]) == 8
    finally:
        gen.shutdown()


def test_quantized_tp_sharding():
    """i8i8 params shard onto the tp mesh without error."""
    from ppl.llm.serving_tpu.parallel import shardings
    cfg = ModelConfig(
        hidden_dim=64, intermediate_dim=128, num_layers=2, num_heads=8,
        num_kv_heads=4, vocab_size=256, cache_mode=1, page_size=16,
        dtype="float32")
    spec = CacheSpec(num_layers=2, num_pages=16, page_size=16,
                     num_kv_heads=4, head_dim=8, dtype=jnp.float32)
    params = llama.quantize_model_params(
        llama.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32))
    mesh = shardings.make_mesh(4)
    cache, _ = kv_ops.init_cache(spec)
    p, c, s, cm = shardings.shard_engine_state(
        mesh, cfg, spec, params, cache,
        jnp.zeros((1,), jnp.float32),
        jnp.zeros((1, 1), jnp.int32))
    assert p["layers"][0]["wqkv_q"].sharding.spec[1] == "tp"
    assert p["layers"][0]["wqkv_s"].sharding.spec[0] == "tp"
