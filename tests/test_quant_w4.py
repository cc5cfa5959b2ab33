"""w4a8 (groupwise int4 weights x per-token int8 activations): packing
roundtrip, XLA-composition numerics, Pallas-kernel equivalence, and the
model-level step (TPU extension beyond the reference's i8i8,
resource_manager.cc:43-67)."""

import jax
import jax.numpy as jnp
import numpy as np

from ppl.llm.serving_tpu.config import ModelConfig
from ppl.llm.serving_tpu.models import llama
from ppl.llm.serving_tpu.ops import kv_cache as kv_ops
from ppl.llm.serving_tpu.ops import quant as Q

from test_quant import CFG, SPEC, prefill_input


class TestInt4Pack:
    def test_pack_unpack_roundtrip(self):
        w = jax.random.normal(jax.random.PRNGKey(0), (256, 64))
        # search_steps=0 = pure absmax RTN: max error bounded by the
        # grid step (the MSE scale search trades bounded outlier
        # clipping for lower mean error — tested separately below)
        packed, scale = Q.quantize_weight_int4(w, group=128,
                                               search_steps=0)
        assert packed.shape == (128, 64) and packed.dtype == jnp.int8
        assert scale.shape == (2, 64)
        unpacked = Q.unpack_int4(packed)
        assert unpacked.shape == (256, 64)
        assert int(unpacked.max()) <= 7 and int(unpacked.min()) >= -7
        # dequantized weight approximates the original per group
        deq = (unpacked.astype(jnp.float32).reshape(2, 128, 64)
               * scale[:, None, :]).reshape(256, 64)
        rel = jnp.abs(deq - w).max() / jnp.abs(w).max()
        assert rel < 0.1, rel

    def test_scale_search_reduces_mse(self):
        """The per-group MSE scale search must never lose to plain RTN
        (k=1.0 is always a candidate), and on gaussian weights it wins."""
        w = jax.random.normal(jax.random.PRNGKey(0), (256, 64))

        def mse(steps):
            packed, scale = Q.quantize_weight_int4(w, group=64,
                                                   search_steps=steps)
            deq = (Q.unpack_int4(packed).astype(jnp.float32)
                   .reshape(4, 64, 64) * scale[:, None, :]).reshape(256, 64)
            return float(jnp.mean((deq - w) ** 2))

        rtn, searched = mse(0), mse(12)
        assert searched < rtn * 0.95, (searched, rtn)

    def test_group_autoshrink(self):
        # D=64 cannot hold a 128-group; shrinks until it divides D//2
        w = jax.random.normal(jax.random.PRNGKey(1), (64, 16))
        packed, scale = Q.quantize_weight_int4(w, group=128)
        assert packed.shape == (32, 16)
        assert scale.shape == (2, 16)          # group=32

    def test_nibble_order(self):
        # byte i = (w[i + D/2] << 4) | w[i]: verify against a hand value
        w = jnp.zeros((4, 1), jnp.float32).at[0, 0].set(7.0).at[2, 0].set(-7.0)
        packed, scale = Q.quantize_weight_int4(w, group=2)
        unpacked = Q.unpack_int4(packed)
        np.testing.assert_array_equal(
            np.asarray(unpacked[:, 0]), [7, 0, -7, 0])


class TestW4A8Matmul:
    def test_vs_fp(self):
        x = jax.random.normal(jax.random.PRNGKey(2), (16, 256))
        w = jax.random.normal(jax.random.PRNGKey(3), (256, 64)) * 0.1
        wp, ws = Q.quantize_weight_int4(w)
        out = Q.w4a8_matmul(x, wp, ws)
        ref = x @ w
        # int4 RTN on random-normal weights: ~2 bits less precision than
        # i8i8's 0.02 budget; exactness is covered by
        # test_vs_explicit_dequant
        rel = jnp.abs(out - ref).max() / jnp.abs(ref).max()
        assert rel < 0.2, rel

    def test_vs_explicit_dequant(self):
        """Exact contract: int8 acts x unpacked int4, per-group rescale."""
        x = jax.random.normal(jax.random.PRNGKey(4), (8, 256))
        w = jax.random.normal(jax.random.PRNGKey(5), (256, 32)) * 0.1
        wp, ws = Q.quantize_weight_int4(w, group=128)
        xq, xs = Q.quantize_activation(x)
        wi = Q.unpack_int4(wp).astype(jnp.int32)
        # per-group einsum reference
        accg = jnp.einsum("tgd,gdn->tgn", xq.astype(jnp.int32).reshape(8, 2, 128),
                          wi.reshape(2, 128, 32))
        ref = (accg.astype(jnp.float32) * ws[None]).sum(1) * xs[:, None]
        out = Q.w4a8_matmul(x, wp, ws)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_multidim_out(self):
        x = jax.random.normal(jax.random.PRNGKey(6), (8, 256))
        w = jax.random.normal(jax.random.PRNGKey(7), (256, 2, 3, 16)) * 0.1
        wp, ws = Q.quantize_weight_int4(w)
        out = Q.w4a8_matmul(x, wp, ws)
        ref = jnp.einsum("td,dcgi->tcgi", x, w)
        assert out.shape == (8, 2, 3, 16)
        rel = jnp.abs(out - ref).max() / jnp.abs(ref).max()
        assert rel < 0.2

    def test_fused_3d_c_leading(self):
        x = jax.random.normal(jax.random.PRNGKey(8), (8, 256))
        w = jax.random.normal(jax.random.PRNGKey(9), (256, 2, 192)) * 0.1
        wp, ws = Q.quantize_weight_int4(w)        # [128, 2, 192], [2, 2, 192]
        wp_c = wp.transpose(1, 0, 2)
        ws_c = ws.transpose(1, 0, 2)
        out = Q.w4a8_matmul(x, wp_c, ws_c)
        ref = jnp.einsum("td,dci->cti", x, w)
        assert out.shape == (2, 8, 192)
        rel = jnp.abs(out - ref).max() / jnp.abs(ref).max()
        assert rel < 0.2


class TestPallasW4A8Matmul:
    """Kernel must match the XLA composition up to f32 round-off."""

    def _check(self, t, d, out_shape, block_n=0, block_t=0):
        from ppl.llm.serving_tpu.ops.pallas.quant_matmul import (
            w4a8_matmul_pallas)
        x = jax.random.normal(jax.random.PRNGKey(0), (t, d), jnp.bfloat16)
        w = jax.random.normal(jax.random.PRNGKey(1), (d,) + out_shape,
                              jnp.float32) * 0.1
        wp, ws = Q.quantize_weight_int4(w)
        ref = Q.w4a8_matmul(x, wp, ws)
        out = w4a8_matmul_pallas(x, wp, ws, interpret=True,
                                 block_n=block_n, block_t=block_t)
        assert out.shape == ref.shape
        denom = float(jnp.abs(ref).max()) or 1.0
        assert float(jnp.abs(out - ref).max()) / denom < 1e-5

    def test_2d(self):
        self._check(16, 256, (256,))

    def test_multi_group(self):
        self._check(16, 512, (128,))           # g=4

    def test_multidim_out(self):
        self._check(8, 256, (2, 3, 64))

    def test_nondivisible_n(self):
        self._check(16, 256, (300,), block_n=128)

    def test_t_tiling(self):
        self._check(48, 256, (128,), block_t=16)

    def test_fused_3d_c_leading(self):
        from ppl.llm.serving_tpu.ops.pallas.quant_matmul import (
            w4a8_matmul_pallas)
        x = jax.random.normal(jax.random.PRNGKey(0), (8, 256), jnp.bfloat16)
        w = jax.random.normal(jax.random.PRNGKey(1), (256, 2, 192),
                              jnp.float32) * 0.1
        wp, ws = Q.quantize_weight_int4(w)
        wp_c = wp.transpose(1, 0, 2)
        ws_c = ws.transpose(1, 0, 2)
        ref = Q.w4a8_matmul(x, wp_c, ws_c)
        out = w4a8_matmul_pallas(x, wp_c, ws_c, interpret=True, block_n=128)
        assert out.shape == (2, 8, 192)
        denom = float(jnp.abs(ref).max()) or 1.0
        assert float(jnp.abs(out - ref).max()) / denom < 1e-5


def run_model(spec, quant_method, quant_impl="xla"):
    params = llama.init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)
    if quant_method != "none":
        params = llama.quantize_model_params(params, quant_method)
    step = llama.make_step_fn(CFG, spec, return_logits=True,
                              quant_method=quant_method,
                              quant_impl=quant_impl)
    cache, scale = kv_ops.init_cache(spec)
    if scale is None:
        scale = jnp.zeros((1,), jnp.float32)
    cm = jnp.zeros((1, 1), jnp.int32)
    seq = (np.arange(20) * 7 + 3) % 250
    out = step(params, cache, scale, cm, prefill_input(seq, spec),
               jax.random.PRNGKey(0))
    return np.asarray(out.logits[0])


def test_w4a8_model_close_to_float():
    ref = run_model(SPEC, "none")
    quant = run_model(SPEC, "online_w4a8")
    assert ref.argmax() == quant.argmax()
    rel = np.abs(quant - ref).max() / np.abs(ref).max()
    # int4 groupwise on RANDOM weights is coarser than i8i8 (real
    # checkpoints quantize better — weight distributions are peaked);
    # top-1 preservation above is the functional gate
    assert rel < 0.25, rel


def test_w4a8_model_step_pallas_matches_xla():
    xla = run_model(SPEC, "online_w4a8", "xla")
    pallas = run_model(SPEC, "online_w4a8", "pallas_interpret")
    rel = np.abs(xla - pallas).max() / (np.abs(xla).max() or 1)
    assert rel < 1e-4, rel


def test_w4a8_e2e_decode():
    """Full generator e2e on the w4a8 path."""
    from test_generator_e2e import DummyTokenizer, make_gen_cfg
    from ppl.llm.serving_tpu.config import ResourceConfig
    from ppl.llm.serving_tpu.connection import LocalConnection
    from ppl.llm.serving_tpu.generator import LLMGenerator
    from ppl.llm.serving_tpu.request import Request
    from ppl.llm.serving_tpu.resources import create_engine

    model_cfg = ModelConfig(
        hidden_dim=64, intermediate_dim=128, num_layers=2, num_heads=4,
        num_kv_heads=2, vocab_size=256, cache_mode=1, page_size=16,
        dtype="float32")
    gen_cfg = make_gen_cfg()
    resource_cfg = ResourceConfig(
        model_format="random", kv_cache_max_tokens=2048,
        quant_method="online_w4a8",
        token_buckets=(32, 64, 128, 256), batch_buckets=(4, 8, 16))
    engine, kv_max = create_engine(model_cfg, resource_cfg, gen_cfg)
    conn = LocalConnection()
    gen = LLMGenerator(model_cfg, gen_cfg, engine, DummyTokenizer(), conn,
                       kv_max)
    try:
        conn.set_wanted(2)
        for i in range(2):
            gen.process(Request(id=i, prompt=f"int4 {i}",
                                generation_length=8, top_k=1))
        assert conn.wait(timeout=120)
        for i in range(2):
            assert len(conn.tokens[i]) == 8
    finally:
        gen.shutdown()


def test_quantized_lm_head_close_to_float():
    """Optional lm_head quantization (extension): logits track the float
    head; the step fn dispatches on the lm_head_q key."""
    ref = run_model(SPEC, "none")
    for method in ("online_i8i8", "online_w4a8"):
        params = llama.quantize_model_params(
            llama.init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32),
            method, quantize_lm_head=True)
        assert "lm_head" not in params and "lm_head_q" in params
        step = llama.make_step_fn(CFG, SPEC, return_logits=True,
                                  quant_method=method)
        cache, _ = kv_ops.init_cache(SPEC)
        out = step(params, cache, jnp.zeros((1,), jnp.float32),
                   jnp.zeros((1, 1), jnp.int32),
                   prefill_input((np.arange(20) * 7 + 3) % 250, SPEC),
                   jax.random.PRNGKey(0))
        logits = np.asarray(out.logits[0])
        assert logits.argmax() == ref.argmax(), method
        rel = np.abs(logits - ref).max() / np.abs(ref).max()
        assert rel < 0.3, (method, rel)


def test_quantized_lm_head_tp_sharding_specs():
    from ppl.llm.serving_tpu.parallel import shardings
    params = llama.quantize_model_params(
        llama.init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32),
        "online_i8i8", quantize_lm_head=True)
    specs = shardings.param_partition_specs(CFG, params)
    assert "lm_head" not in specs
    assert specs["lm_head_q"] == shardings.P(None, "tp")
    assert specs["lm_head_s"] == shardings.P("tp")
