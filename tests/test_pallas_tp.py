"""shard_map islands for the Pallas kernels under tensor parallelism
(parallel/pallas_tp.py), validated in interpret mode on the virtual CPU
mesh: sharded kernel == unsharded kernel (exact for attention and
column-parallel matmuls; act-quant-noise tolerance for row-parallel,
whose per-shard activation absmax is finer-grained than the global one).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ppl.llm.serving_tpu.ops import kv_cache as kv_ops
from ppl.llm.serving_tpu.ops.kv_cache import CacheSpec
from ppl.llm.serving_tpu.ops.pallas import paged_attention as pk
from ppl.llm.serving_tpu.ops.pallas import quant_matmul as qm
from ppl.llm.serving_tpu.ops import quant as quant_ops
from ppl.llm.serving_tpu.parallel import pallas_tp, shardings

from test_pallas_attention import fill_cache

# int8-KV geometry whose scale rows shard cleanly at tp=2:
# head_dim 128 / group 8 -> 16 groups -> 32 lanes per head;
# 8 kv heads / 2 shards * 32 = 128 lanes per shard.
QSPEC = CacheSpec(num_layers=2, num_pages=8, page_size=16, num_kv_heads=8,
                  head_dim=128, quant_bit=8, quant_group=8,
                  dtype=jnp.float32)
# float geometry (no scale): any head count divisible by tp
FSPEC = CacheSpec(num_layers=1, num_pages=8, page_size=16, num_kv_heads=4,
                  head_dim=32, dtype=jnp.float32)


def test_local_cache_spec_divides_heads():
    mesh = shardings.make_mesh(2)
    loc = pallas_tp.local_cache_spec(QSPEC, mesh)
    assert loc.num_kv_heads == 4
    assert loc.page_size == QSPEC.page_size
    with pytest.raises(ValueError):
        pallas_tp.local_cache_spec(
            CacheSpec(num_layers=1, num_pages=4, page_size=16,
                      num_kv_heads=3, head_dim=32), mesh)


def test_scale_shard_check_rejects_misaligned():
    # 2 kv heads * 8 lanes per head per shard is not a 128 multiple
    bad = CacheSpec(num_layers=1, num_pages=4, page_size=16,
                    num_kv_heads=4, head_dim=32, quant_bit=8,
                    quant_group=8, dtype=jnp.float32)
    mesh = shardings.make_mesh(2)
    with pytest.raises(ValueError, match="scale rows"):
        pallas_tp.sharded_decode_attention(
            mesh, jnp.zeros((1, 8, 32)), jnp.zeros((4, 80, 64)),
            jnp.zeros((80, 128)), jnp.zeros((1, 4), jnp.int32),
            jnp.ones((1,), jnp.int32), bad, layer=0,
            fresh_k=jnp.zeros((1, 4, 32)), fresh_v=jnp.zeros((1, 4, 32)),
            interpret=True)


def _decode_case(spec, n_q, tp, seed=3):
    rows = [([0, 1], 25), ([2], 7), ([3, 4], 32)]
    cache, scale, pt, ctx = fill_cache(spec, rows, seed=seed)
    b = len(rows)
    key = jax.random.PRNGKey(seed + 1)
    kq, kk, kv = jax.random.split(key, 3)
    dt = jnp.float32 if spec.dtype == jnp.float32 else jnp.bfloat16
    q = jax.random.normal(kq, (b, n_q, spec.head_dim)).astype(dt)
    fk = jax.random.normal(kk, (b, spec.num_kv_heads, spec.head_dim)
                           ).astype(dt)
    fv = jax.random.normal(kv, (b, spec.num_kv_heads, spec.head_dim)
                           ).astype(dt)
    ref = pk.paged_decode_attention(
        q, cache, scale if spec.quantized else None, pt, ctx, spec,
        layer=1 if spec.num_layers > 1 else 0, fresh_k=fk, fresh_v=fv,
        interpret=True)
    mesh = shardings.make_mesh(tp)
    out = pallas_tp.sharded_decode_attention(
        mesh, q, cache, scale if spec.quantized else None, pt, ctx, spec,
        layer=1 if spec.num_layers > 1 else 0, fresh_k=fk, fresh_v=fv,
        interpret=True)
    return np.asarray(ref), np.asarray(out)


def test_sharded_decode_matches_unsharded_int8():
    ref, out = _decode_case(QSPEC, n_q=16, tp=2)
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)


def test_sharded_decode_matches_unsharded_float():
    ref, out = _decode_case(FSPEC, n_q=8, tp=4)
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)


def _prefill_case(spec, n_q, tp, seed=5):
    # row 0: suffix after a 16-token prefix hit; row 1: fresh prompt
    rows = [([0, 1, 2], 16), ([3, 4], 0)]
    cache, scale, pt, ctx = fill_cache(spec, [(p, c) for p, c in rows],
                                       seed=seed)
    bp, qp = len(rows), spec.page_size
    start = jnp.asarray([c for _, c in rows], jnp.int32)
    new_len = jnp.asarray([qp, qp - 3], jnp.int32)
    key = jax.random.PRNGKey(seed + 1)
    kq, kk, kv = jax.random.split(key, 3)
    dt = jnp.float32 if spec.dtype == jnp.float32 else jnp.bfloat16
    q = jax.random.normal(kq, (bp, qp, n_q, spec.head_dim)).astype(dt)
    k = jax.random.normal(kk, (bp, qp, spec.num_kv_heads, spec.head_dim))
    v = jax.random.normal(kv, (bp, qp, spec.num_kv_heads, spec.head_dim))
    if spec.quantized:
        qk, sk = kv_ops.quantize_kv(k, spec.quant_group)
        qv, sv = kv_ops.quantize_kv(v, spec.quant_group)
        slab = kv_ops.pack_kv_rows(qk, qv, spec).transpose(0, 2, 1, 3)
        fscale = kv_ops._pack_scale_rows(sk, sv, spec)
    else:
        slab = kv_ops.pack_kv_rows(
            k.astype(dt), v.astype(dt), spec).transpose(0, 2, 1, 3)
        fscale = None
    ref = pk.paged_prefill_attention(
        q, cache, scale if spec.quantized else None, pt, start, new_len,
        spec, layer=0, fresh_kv=slab, fresh_scale=fscale, interpret=True)
    mesh = shardings.make_mesh(tp)
    out = pallas_tp.sharded_prefill_attention(
        mesh, q, cache, scale if spec.quantized else None, pt, start,
        new_len, spec, layer=0, fresh_kv=slab, fresh_scale=fscale,
        interpret=True)
    return np.asarray(ref), np.asarray(out)


def test_sharded_prefill_matches_unsharded_int8():
    ref, out = _prefill_case(QSPEC, n_q=16, tp=2)
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)


def test_sharded_prefill_matches_unsharded_float():
    ref, out = _prefill_case(FSPEC, n_q=8, tp=4)
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)


# ---- quantized matmuls ------------------------------------------------------

D, I, V = 64, 96, 128
KVH, G, HD = 4, 2, 16
NQ = KVH * G


def _quant_params(seed=7):
    """Float weights for every transformer matmul, then i8i8-quantized
    (per-out-channel) into the fused param dict layout."""
    key = jax.random.PRNGKey(seed)
    shapes = {
        "wqkv": (D, KVH, G + 2, HD),
        "wo": (NQ * HD, D),
        "w_gate_up": (2, D, I),   # C-leading fused gate|up
        "w_down": (I, D),
        "lm_head": (D, V),
    }
    p = {}
    for name, shp in shapes.items():
        key, sub = jax.random.split(key)
        w = jax.random.normal(sub, shp, jnp.float32) / np.sqrt(shp[0])
        if name == "w_gate_up":
            # contraction axis is axis 1 (C-leading): quantize per (c, n)
            s = jnp.max(jnp.abs(w), axis=1) / 127.0          # [2, I]
            q = jnp.round(w / s[:, None, :]).astype(jnp.int8)
        else:
            s = jnp.max(jnp.abs(w), axis=0) / 127.0          # out dims
            q = jnp.round(w / s[None]).astype(jnp.int8)
        p[name] = w
        p[name + "_q"] = q
        p[name + "_s"] = s.astype(jnp.float32)
    return p


@pytest.mark.parametrize("name,tp", [
    ("wqkv", 2), ("wqkv", 4), ("wo", 2), ("w_gate_up", 2),
    ("w_down", 4), ("lm_head", 2),
])
def test_sharded_i8i8_matmul(name, tp):
    p = _quant_params()
    h_dim = NQ * HD if name == "wo" else I if name == "w_down" else D
    h = jax.random.normal(jax.random.PRNGKey(11), (8, h_dim), jnp.float32)
    ref = qm.i8i8_matmul_pallas(h, p[name + "_q"], p[name + "_s"],
                                interpret=True)
    mesh = shardings.make_mesh(tp)
    matmul = pallas_tp.make_sharded_quant_matmul(
        mesh, "online_i8i8", interpret=True)
    out = matmul(h, p, name)
    assert out.shape == ref.shape
    row_parallel = name in ("wo", "w_down")
    if row_parallel:
        # per-shard act quant: compare against the FLOAT matmul within
        # int8 act-quant noise, and require the sharded path to be at
        # least as accurate as the unsharded quantized one
        exact = np.asarray(jnp.dot(h, p[name]))
        scale = np.abs(exact).max()
        err_sharded = np.abs(np.asarray(out) - exact).max() / scale
        err_ref = np.abs(np.asarray(ref) - exact).max() / scale
        assert err_sharded <= max(err_ref * 1.5, 0.02), (
            err_sharded, err_ref)
    else:
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)


def test_sharded_matmul_rejects_w4a8():
    mesh = shardings.make_mesh(2)
    with pytest.raises(ValueError, match="w4a8"):
        pallas_tp.make_sharded_quant_matmul(mesh, "online_w4a8")


# ---- full fused step with the Pallas path on a mesh -------------------------

from ppl.llm.serving_tpu.config import ModelConfig  # noqa: E402
from ppl.llm.serving_tpu.models import llama  # noqa: E402
from test_sharding import CFG, SPEC, greedy, make_inputs  # noqa: E402


def _run_pallas_step(mesh, quant):
    params = llama.init_params(CFG, jax.random.PRNGKey(0),
                               dtype=jnp.float32)
    if quant:
        params = llama.quantize_model_params(params, "online_i8i8")
    cache, _ = kv_ops.init_cache(SPEC)
    scale = jnp.zeros((1,), jnp.float32)
    cm = jnp.zeros((1, 1), jnp.int32)
    if mesh is not None:
        params, cache, scale, cm = shardings.shard_engine_state(
            mesh, CFG, SPEC, params, cache, scale, cm)
    step = jax.jit(llama.make_step_fn(
        CFG, SPEC, return_logits=True,
        quant_method="online_i8i8" if quant else "none",
        attn_impl="pallas_interpret",
        quant_impl="pallas_interpret" if quant else "xla",
        mesh=mesh), donate_argnums=(1, 2, 3))
    out = step(params, cache, scale, cm, make_inputs(),
               jax.random.PRNGKey(0))
    # follow with one decode step (exercises sharded_decode_attention)
    dec = llama.StepInput(
        decode_tokens=out.tokens, decode_pos=jnp.array([20], jnp.int32),
        prefill_tokens=jnp.zeros((0, 32), jnp.int32),
        prefill_start=jnp.zeros(0, jnp.int32),
        prefill_len=jnp.zeros(0, jnp.int32),
        page_table=make_inputs().page_table,
        context_len=jnp.array([21], jnp.int32),
        batch_slots=jnp.zeros(1, jnp.int32), sampling=greedy(1))
    out2 = step(params, out.kv_cache, out.kv_scale, out.count_map, dec,
                jax.random.PRNGKey(0))
    return (np.asarray(out.logits), np.asarray(out.tokens),
            np.asarray(out2.logits), np.asarray(out2.tokens))


@pytest.mark.parametrize("quant", [False, True])
def test_step_pallas_tp_matches_single_device(quant):
    ref = _run_pallas_step(None, quant)
    for tp in (2, 4):
        got = _run_pallas_step(shardings.make_mesh(tp), quant)
        # row-parallel act-quant is per-shard under TP: tolerance covers
        # the resulting act-quant noise on the i8i8 path
        tol = 5e-2 if quant else 1e-3
        np.testing.assert_allclose(got[0], ref[0], atol=tol, rtol=tol,
                                   err_msg=f"tp={tp} prefill")
        np.testing.assert_allclose(got[2], ref[2], atol=tol, rtol=tol,
                                   err_msg=f"tp={tp} decode")
        assert got[1] == pytest.approx(ref[1])
        assert got[3] == pytest.approx(ref[3])
