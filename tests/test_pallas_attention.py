"""Pallas paged attention kernels vs XLA reference (interpret mode on CPU;
the same code compiles with Mosaic on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ppl.llm.serving_tpu.ops import attention as attn_ref
from ppl.llm.serving_tpu.ops import kv_cache as kv_ops
from ppl.llm.serving_tpu.ops.kv_cache import CacheSpec
from ppl.llm.serving_tpu.ops.pallas import paged_attention as pk


def fill_cache(spec, rows, seed=0):
    """rows: list of (pages, ctx_len). Returns (cache_layer, scale_layer,
    page_table, context_len) with random KV content."""
    cache, scale = kv_ops.init_cache(spec)
    kvp = max(len(p) for p, _ in rows)
    pt = np.full((len(rows), kvp), spec.trash_page, np.int32)
    ctx = np.zeros(len(rows), np.int32)
    key = jax.random.PRNGKey(seed)
    for r, (pages, n) in enumerate(rows):
        pt[r, :len(pages)] = pages
        ctx[r] = n
        if n == 0:
            continue
        key, k1, k2 = jax.random.split(key, 3)
        k = jax.random.normal(k1, (n, spec.num_kv_heads, spec.head_dim))
        v = jax.random.normal(k2, (n, spec.num_kv_heads, spec.head_dim))
        slots = kv_ops.token_slots(
            jnp.asarray(pt[r:r + 1]), jnp.arange(n),
            jnp.zeros(n, jnp.int32), spec.page_size)
        cache, scale = kv_ops.append_kv(cache, scale, k, v, slots, spec)
    return cache, scale, jnp.asarray(pt), jnp.asarray(ctx)


def run_both(spec, rows, num_q_heads, seed=1):
    cache, scale, pt, ctx = fill_cache(spec, rows)
    q = jax.random.normal(
        jax.random.PRNGKey(seed),
        (len(rows), num_q_heads, spec.head_dim)).astype(
            jnp.float32 if spec.dtype == jnp.float32 else jnp.bfloat16)
    ref = attn_ref.decode_attention_ref(q, cache, scale, pt, ctx, spec)
    out = pk.paged_decode_attention(q, cache, scale, pt, ctx,
                                    spec, interpret=True)
    return np.asarray(ref), np.asarray(out)


SPEC = CacheSpec(num_layers=1, num_pages=16, page_size=16, num_kv_heads=2,
                 head_dim=32, dtype=jnp.float32)
QSPEC = CacheSpec(num_layers=1, num_pages=16, page_size=16, num_kv_heads=2,
                  head_dim=32, quant_bit=8, quant_group=8,
                  dtype=jnp.float32)


def test_decode_matches_ref_single_row():
    ref, out = run_both(SPEC, [([3, 5], 20)], num_q_heads=4)
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)


def test_decode_matches_ref_batch_varied_lens():
    rows = [([0, 1, 2], 40), ([4], 3), ([6, 7], 17), ([8], 16)]
    ref, out = run_both(SPEC, rows, num_q_heads=4)
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)


def test_decode_mha_g1():
    """MHA (G=1) — llama2-7B shape class."""
    spec = CacheSpec(num_layers=1, num_pages=8, page_size=16,
                     num_kv_heads=4, head_dim=32, dtype=jnp.float32)
    cache, scale, pt, ctx = fill_cache(
        spec, [([0, 1], 30), ([2], 5)])
    q = jax.random.normal(jax.random.PRNGKey(2), (2, 4, 32))
    ref = attn_ref.decode_attention_ref(q, cache, None, pt, ctx, spec)
    out = pk.paged_decode_attention(q, cache, None, pt, ctx, spec,
                                    interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_decode_padding_row_zero_ctx():
    rows = [([0], 10), ([SPEC.trash_page], 0)]
    ref, out = run_both(SPEC, rows, num_q_heads=4)
    np.testing.assert_array_equal(out[1], 0.0)
    np.testing.assert_allclose(out[0], ref[0], atol=2e-5, rtol=2e-5)


def test_decode_quantized_kv():
    ref, out = run_both(QSPEC, [([3, 5], 25), ([7], 9)], num_q_heads=4)
    np.testing.assert_allclose(out, ref, atol=1e-3, rtol=1e-2)


def test_decode_long_context_many_pages():
    spec = CacheSpec(num_layers=1, num_pages=40, page_size=16,
                     num_kv_heads=2, head_dim=32, dtype=jnp.float32)
    pages = list(range(1, 33))
    ref_out = run_both(spec, [(pages, 16 * 32)], num_q_heads=4)
    np.testing.assert_allclose(ref_out[1], ref_out[0], atol=2e-5, rtol=2e-5)


def fill_cache_with_kv(spec, rows, seed=0):
    """Like fill_cache but also returns the raw K/V per row for q building."""
    cache, scale = kv_ops.init_cache(spec)
    kvp = max(len(p) for p, _ in rows)
    pt = np.full((len(rows), kvp), spec.trash_page, np.int32)
    key = jax.random.PRNGKey(seed)
    for r, (pages, n) in enumerate(rows):
        pt[r, :len(pages)] = pages
        if n == 0:
            continue
        key, k1, k2 = jax.random.split(key, 3)
        k = jax.random.normal(k1, (n, spec.num_kv_heads, spec.head_dim))
        v = jax.random.normal(k2, (n, spec.num_kv_heads, spec.head_dim))
        slots = kv_ops.token_slots(
            jnp.asarray(pt[r:r + 1]), jnp.arange(n),
            jnp.zeros(n, jnp.int32), spec.page_size)
        cache, scale = kv_ops.append_kv(cache, scale, k, v, slots, spec)
    return cache, scale, jnp.asarray(pt)


def run_prefill_both(spec, rows, starts, new_lens, qp, num_q_heads,
                     q_block=16, seed=3):
    """rows give total ctx per row (start + new)."""
    cache, scale, pt = fill_cache_with_kv(spec, rows)
    bp = len(rows)
    q = jax.random.normal(jax.random.PRNGKey(seed),
                          (bp, qp, num_q_heads, spec.head_dim))
    starts = jnp.asarray(starts, jnp.int32)
    new_lens = jnp.asarray(new_lens, jnp.int32)
    ref = attn_ref.prefill_attention_ref(q, cache, scale, pt,
                                         starts, new_lens, spec)
    out = pk.paged_prefill_attention(q, cache, scale, pt,
                                     starts, new_lens, spec,
                                     q_block=q_block, interpret=True)
    ref = np.asarray(ref)
    out = np.asarray(out)
    # compare only valid q rows (padding rows are unspecified in the ref)
    for r in range(bp):
        n = int(new_lens[r])
        np.testing.assert_allclose(out[r, :n], ref[r, :n], atol=3e-5,
                                   rtol=3e-5, err_msg=f"row {r}")
    return ref, out


def test_prefill_matches_ref_basic():
    run_prefill_both(SPEC, [([0, 1, 2], 40)], starts=[0], new_lens=[40],
                     qp=48, num_q_heads=4)


def test_prefill_prefix_hit_start():
    # 32 cached + 16 new = ctx 48
    run_prefill_both(SPEC, [([0, 1, 2], 48)], starts=[32], new_lens=[16],
                     qp=16, num_q_heads=4)


def test_prefill_batch_mixed_lens():
    run_prefill_both(
        SPEC, [([0, 1], 20), ([4, 5, 6], 33), ([8], 7)],
        starts=[0, 0, 0], new_lens=[20, 33, 7], qp=48, num_q_heads=4)


def test_prefill_quantized_kv():
    spec = QSPEC
    cache, scale, pt = fill_cache_with_kv(
        spec, [([0, 1], 30)])
    q = jax.random.normal(jax.random.PRNGKey(5), (1, 32, 4, spec.head_dim))
    starts = jnp.array([0], jnp.int32)
    new_lens = jnp.array([30], jnp.int32)
    ref = attn_ref.prefill_attention_ref(q, cache, scale, pt,
                                         starts, new_lens, spec)
    out = pk.paged_prefill_attention(q, cache, scale, pt,
                                     starts, new_lens, spec, q_block=16,
                                     interpret=True)
    np.testing.assert_allclose(np.asarray(out)[0, :30],
                               np.asarray(ref)[0, :30], atol=1e-3,
                               rtol=1e-2)


def test_prefill_gqa_g1_mha():
    spec = CacheSpec(num_layers=1, num_pages=8, page_size=16,
                     num_kv_heads=4, head_dim=32, dtype=jnp.float32)
    run_prefill_both(spec, [([0, 1], 25)], starts=[0], new_lens=[25],
                     qp=32, num_q_heads=4)


def test_full_model_step_with_pallas_interpret():
    """The fused step with Pallas kernels (interpret) must match the XLA
    attention path bit-for-bit at the logits level."""
    from ppl.llm.serving_tpu.config import ModelConfig
    from ppl.llm.serving_tpu.models import llama

    cfg = ModelConfig(hidden_dim=64, intermediate_dim=128, num_layers=2,
                      num_heads=4, num_kv_heads=2, vocab_size=256,
                      cache_mode=1, page_size=16, dtype="float32")
    spec = CacheSpec(num_layers=2, num_pages=16, page_size=16,
                     num_kv_heads=2, head_dim=16, dtype=jnp.float32)
    params = llama.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    from ppl.llm.serving_tpu.ops import sampling as S

    def greedy(b):
        return S.SamplingParams(
            temperature=jnp.ones(b), top_k=jnp.ones(b, jnp.int32),
            top_p=jnp.zeros(b), do_sample=jnp.zeros(b, bool),
            repetition_penalty=jnp.ones(b), presence_penalty=jnp.zeros(b),
            frequency_penalty=jnp.zeros(b))

    seq = (np.arange(20) * 3 + 5) % 250
    pt = np.full((2, 4), spec.trash_page, np.int32)
    pt[0, 0] = 3          # decode row: ctx 5 on page 3
    pt[1, :2] = [0, 1]    # prefill row
    padded = np.zeros((1, 32), np.int32)
    padded[0, :20] = seq
    inp = llama.StepInput(
        decode_tokens=jnp.array([9], jnp.int32),
        decode_pos=jnp.array([4], jnp.int32),
        prefill_tokens=jnp.asarray(padded),
        prefill_start=jnp.zeros(1, jnp.int32),
        prefill_len=jnp.array([20], jnp.int32),
        page_table=jnp.asarray(pt),
        context_len=jnp.array([5, 20], jnp.int32),
        batch_slots=jnp.zeros(2, jnp.int32),
        sampling=greedy(2),
    )
    outs = {}
    for impl in ("xla", "pallas_interpret"):
        cache, _ = kv_ops.init_cache(spec)
        # pre-fill decode row's history (positions 0..3 on page 3)
        hist = jax.random.normal(jax.random.PRNGKey(7), (4, 2, 16))
        for layer in range(2):
            slots = kv_ops.token_slots(jnp.asarray(pt[:1]), jnp.arange(4),
                                       jnp.zeros(4, jnp.int32), 16)
            cache, _ = kv_ops.append_kv(cache, None, hist, hist, slots,
                                        spec, layer=layer)
        step = llama.make_step_fn(cfg, spec, return_logits=True,
                                  attn_impl=impl)
        out = step(params, cache, jnp.zeros((1,), jnp.float32),
                   jnp.zeros((1, 1), jnp.int32), inp, jax.random.PRNGKey(0))
        outs[impl] = np.asarray(out.logits)
    np.testing.assert_allclose(outs["pallas_interpret"], outs["xla"],
                               atol=1e-4, rtol=1e-4)


def test_decode_deferred_self_term():
    """Deferred-append mode: the cache holds ctx-1 tokens; fresh k/v enter
    as a self-term. Must equal the appended-first computation."""
    for spec in (SPEC, QSPEC):
        rows = [([0, 1, 2], 40), ([4], 3), ([6, 7], 17)]
        cache, scale, pt, ctx = fill_cache(spec, rows)
        b = len(rows)
        key = jax.random.PRNGKey(11)
        kf = jax.random.normal(key, (b, spec.num_kv_heads, spec.head_dim))
        vf = jax.random.normal(jax.random.PRNGKey(12),
                               (b, spec.num_kv_heads, spec.head_dim))
        q = jax.random.normal(jax.random.PRNGKey(13),
                              (b, 4, spec.head_dim))
        ctx_t = ctx + 1   # incl. the (not yet appended) current token
        ref = attn_ref.decode_attention_ref(
            q, cache, scale, pt, ctx_t, spec, fresh_k=kf, fresh_v=vf)
        out = pk.paged_decode_attention(
            q, cache, scale, pt, ctx_t, spec, fresh_k=kf, fresh_v=vf,
            interpret=True)
        tol = dict(atol=2e-5, rtol=2e-5) if spec is SPEC else dict(
            atol=1e-3, rtol=1e-2)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), **tol)


def test_decode_deferred_first_token():
    """A decode row whose ONLY context is the fresh token (cache empty):
    output must be exactly v_fresh (softmax over one key)."""
    cache, scale = kv_ops.init_cache(SPEC)
    pt = jnp.full((1, 2), SPEC.trash_page, jnp.int32)
    ctx_t = jnp.array([1], jnp.int32)
    kf = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 32))
    vf = jax.random.normal(jax.random.PRNGKey(2), (1, 2, 32))
    q = jax.random.normal(jax.random.PRNGKey(3), (1, 4, 32))
    out = pk.paged_decode_attention(
        q, cache, scale, pt, ctx_t, SPEC, fresh_k=kf, fresh_v=vf,
        interpret=True)
    expect = jnp.repeat(vf, 2, axis=1)   # GQA expand of v_fresh
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                               atol=2e-5, rtol=2e-5)


def test_multi_layer_kernel_indexing():
    """The layer scalar-prefetch must address the right slab of the
    stacked cache (distinct KV per layer -> distinct outputs)."""
    spec = CacheSpec(num_layers=3, num_pages=8, page_size=16,
                     num_kv_heads=2, head_dim=32, dtype=jnp.float32)
    cache, scale = kv_ops.init_cache(spec)
    pt = jnp.array([[0, 1]], jnp.int32)
    n = 20
    for li in range(3):
        k = jax.random.normal(jax.random.PRNGKey(li), (n, 2, 32))
        slots = kv_ops.token_slots(pt, jnp.arange(n), jnp.zeros(n, jnp.int32),
                                   spec.page_size)
        cache, scale = kv_ops.append_kv(cache, scale, k, -k, slots, spec,
                                        layer=li)
    q = jax.random.normal(jax.random.PRNGKey(9), (1, 4, 32))
    ctx = jnp.array([n], jnp.int32)
    outs = []
    for li in range(3):
        ref = attn_ref.decode_attention_ref(q, cache, scale, pt, ctx, spec,
                                            layer=li)
        out = pk.paged_decode_attention(q, cache, scale, pt, ctx, spec,
                                        layer=li, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5, err_msg=f"l{li}")
        outs.append(np.asarray(out))
    assert not np.allclose(outs[0], outs[1])
    assert not np.allclose(outs[1], outs[2])


def test_prefill_deferred_fresh_inputs():
    """Deferred-append prefill: fresh K/V streams from dense inputs and
    must equal the appended-first computation exactly — including the
    prefix-hit split (cached pages below start, fresh above)."""
    for spec in (SPEC, QSPEC):
        ps = spec.page_size
        start_tok, new = 2 * ps, 24            # page-aligned prefix hit
        total = start_tok + new
        qp = 2 * ps                            # % page_size == 0
        # cache with ONLY the prefix [0, start) present
        cache, scale, pt = fill_cache_with_kv(
            spec, [(list(range(4)), start_tok)])
        rngk = jax.random.PRNGKey(21)
        kp = jax.random.normal(rngk, (1, qp, spec.num_kv_heads,
                                      spec.head_dim))
        vp = jax.random.normal(jax.random.PRNGKey(22),
                               (1, qp, spec.num_kv_heads, spec.head_dim))
        q = jax.random.normal(jax.random.PRNGKey(23),
                              (1, qp, 4, spec.head_dim))
        starts = jnp.array([start_tok], jnp.int32)
        new_lens = jnp.array([new], jnp.int32)

        # reference computation: append first, then attend from cache
        slots = kv_ops.token_slots(pt, start_tok + jnp.arange(new),
                                   jnp.zeros(new, jnp.int32), ps)
        c2, s2 = kv_ops.append_kv(cache, scale, kp[0, :new], vp[0, :new],
                                  slots, spec)
        ref = attn_ref.prefill_attention_ref(q, c2, s2, pt, starts,
                                             new_lens, spec)

        # deferred: fresh dense inputs, cache untouched
        if spec.quantized:
            qk, sk = kv_ops.quantize_kv(kp, spec.quant_group)
            qv, sv = kv_ops.quantize_kv(vp, spec.quant_group)
            rows = kv_ops.pack_kv_rows(qk, qv, spec)
            fscale = kv_ops._pack_scale_rows(sk, sv, spec)
            kp_ref = kv_ops.dequantize_kv(qk, sk, spec.quant_group,
                                          jnp.float32)
            vp_ref = kv_ops.dequantize_kv(qv, sv, spec.quant_group,
                                          jnp.float32)
        else:
            rows = kv_ops.pack_kv_rows(kp.astype(jnp.float32),
                                       vp.astype(jnp.float32), spec)
            fscale, kp_ref, vp_ref = None, kp, vp
        out_ref = attn_ref.prefill_attention_ref(
            q, cache, scale, pt, starts, new_lens, spec,
            fresh_k=kp_ref, fresh_v=vp_ref)
        out_pk = pk.paged_prefill_attention(
            q, cache, scale, pt, starts, new_lens, spec,
            fresh_kv=rows.transpose(0, 2, 1, 3), fresh_scale=fscale,
            q_block=16, interpret=True)
        tol = dict(atol=3e-5, rtol=3e-5) if spec is SPEC else dict(
            atol=2e-3, rtol=1e-2)
        np.testing.assert_allclose(np.asarray(out_ref)[0, :new],
                                   np.asarray(ref)[0, :new], **tol)
        np.testing.assert_allclose(np.asarray(out_pk)[0, :new],
                                   np.asarray(ref)[0, :new], **tol)
