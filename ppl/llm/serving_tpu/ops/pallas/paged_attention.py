"""Pallas TPU paged-attention kernels.

The TPU replacement for the reference's CUDA decoding-attention kernel
family (``ppl.llm.kernel.cuda`` decode MHA/GQA with split-K, SURVEY.md
E2): attention reads KV pages DIRECTLY from HBM with double-buffered
DMAs — no gather materialization (the XLA reference path in
ops/attention.py copies every gathered page into a dense [B, KV, H, hd]
intermediate, doubling HBM traffic; decode is bandwidth-bound so that
factor-2 is the whole ballgame).

Cache layout: PACKED k|v rows ``[KVH, L*num_slots, 2*shd]`` (layer
inner; see
ops/kv_cache.py). Each page slab DMA ``[KVH, page_size, 2*shd]`` fetches
both K and V in one transfer; for head_dim 64 the 128-lane row is fully
dense (the previous separate-K/V layout padded each to 128 lanes, which
DOUBLED attention DMA bytes with zeros — decode attention is pure DMA).
Q and the attention output stay at the true head_dim (no lane-pad
copies; the pad of q to 128 lanes was traced at ~20% of decode-block
device time). The k/v halves are read out of the packed rows with VMEM
lane slices, which Mosaic supports at arbitrary offsets.

Kernel shape:
- grid over the batch; each decode program handles ``seq_block``
  sequences — every page phase fires the whole block's slab DMAs before
  waiting, so the copies overlap (TPU grids run sequentially on the
  core; a one-sequence-per-program grid is DMA-latency-bound),
- online-softmax (flash) accumulation across pages,
- GQA: scores computed batched over KV heads: [KVH, G, hd] x
  [KVH, ps, hd] -> [KVH, G, ps] on the MXU,
- int8 KV (group-8 scales) dequantized in VMEM right after the DMA —
  int8 pages also HALVE the DMA bytes, which is the real win. Scales
  live in packed rows [num_slots, scale_lanes] (lane order (head, k|v,
  group), 128-padded) so one extra row-slab DMA per page fetches every
  head's scales AND the host-side scale write is a dense row scatter.
  The per-element expansion is a one-hot matmul (s @ E), since Mosaic
  cannot shape-cast the 128-lane axis into (groups, group).

Hardware constraints honored here (probed on v5e):
- HBM DMA slices need a >=128, 128-aligned minor dim -> the packed row
  is 2*shd lanes with shd = head_dim rounded up to 64.
- VMEM operand blocks (q, output) have no such restriction — Mosaic
  tiles partial minor dims transparently, so q rides in at true hd.

The page loop runs to the page-table width with ``@pl.when`` masking, so
KV length is data, not shape — no recompiles as context grows
(SURVEY.md section 7.3 risk #1).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..kv_cache import CacheSpec

_NEG_INF = -1e30


def _expand_matrix(spec: CacheSpec, dt=jnp.float32):
    """[2G, 2*shd] one-hot for packed-row dequant: row i < G covers the
    K half's group i lanes, row G+i the V half's group i lanes. Padding
    lanes (>= head_dim within a half) match no group and dequantize
    to 0. ``dt`` doubles as the kernel's compute dtype (_dequant_row)."""
    ng, group = spec.scale_groups, spec.quant_group
    shd, lanes = spec.shd, spec.row_lanes
    iota_i = jax.lax.broadcasted_iota(jnp.int32, (2 * ng, lanes), 0)
    iota_j = jax.lax.broadcasted_iota(jnp.int32, (2 * ng, lanes), 1)
    in_v = iota_j >= shd
    j_half = jnp.where(in_v, iota_j - shd, iota_j)
    target = jnp.where(in_v, ng + j_half // group, j_half // group)
    valid = j_half < spec.head_dim
    return ((target == iota_i) & valid).astype(dt)


def _dequant_row(vals, s_slab, h: int, spec: CacheSpec, expand):
    """One head's packed page slab: int8 vals [ps, 2*shd] x its slice of
    the packed scale rows s_slab [ps, scale_lanes] -> f32 [ps, 2*shd].

    Lane order of the scale rows is (head, k|v, group) — head h's k AND
    v group scales are the contiguous ``2*scale_groups`` lanes starting
    at ``h * scale_lane_stride``, so one slice + one one-hot matmul
    dequantizes the whole packed row.

    ``dt`` is bf16 on the production path: the f32 form made dequant the
    decode bottleneck at MHA geometry (LLaMA-7B, 32 kv heads: ~33 MB of
    f32 intermediates per page phase; decode attention traced at 6.7 ms
    of the 21 ms step, 2026-08-19). bf16 halves the VPU bytes and the
    scores ride the MXU's native bf16 path; int8-quantization error
    dominates the bf16 rounding by an order of magnitude."""
    off = h * spec.scale_lane_stride
    s = s_slab[:, off: off + 2 * spec.scale_groups].astype(expand.dtype)
    s_full = jax.lax.dot_general(
        s, expand, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                 # [ps, 2*shd]
    dt = expand.dtype
    return vals.astype(dt) * s_full.astype(dt)


def _decode_kernel(spec: CacheSpec, num_q_heads: int, seq_blk: int,
                   has_alibi: bool, deferred: bool, tail: bool,
                   layer_ref, pt_ref, ctx_ref, tlen_ref,  # scalar prefetch
                   q_ref, cache_ref, scale_ref,
                   slopes_ref, fk_ref, fv_ref,
                   tkv_ref, ts_ref,                  # inputs
                   o_ref,                            # output
                   kv_buf, s_buf, sem, t_buf, ts_buf, t_sem):
    """Each program handles ``seq_blk`` sequences: every page phase fires
    the whole block's slab DMAs before waiting, so seq_blk copies overlap
    (a one-sequence-per-program grid is DMA-latency-bound: TPU grids run
    sequentially on the core).

    ``deferred``: the current token's K/V is NOT in the cache yet (the
    decode fast path batches the cache scatter across all layers after
    the forward); ``fk/fv`` carry it and enter the online softmax as an
    explicit self-term. ``ctx_ref`` still counts the kv length INCLUDING
    the current token — the cache holds ctx-1.

    ``tail``: block-tail mode — the cache is ``tlen_ref[0]`` MORE tokens
    behind (a multi-step decode block scatters once per block, not per
    step; the block's earlier tokens live in ``tkv_ref``
    [L, B, KVH, J, 2*shd] packed rows + ``ts_ref`` [L, B, J, scale_lanes]
    scale rows). They join the online softmax as one extra J-wide phase
    read from a dense side buffer. Motivation: at 7B geometry the
    per-step scatter lowered as a full 4.3 GB cache sweep (2.6 ms/step,
    traced 2026-08-19); once per block amortizes it 16x regardless of
    XLA's scatter lowering.
    """
    kvh, hd, shd = spec.num_kv_heads, spec.head_dim, spec.shd
    g = num_q_heads // kvh
    ps = spec.page_size
    base = pl.program_id(0) * seq_blk
    quant = spec.quantized
    # compute dtype follows spec.dtype: f32 specs (CPU tests, exactness
    # vs the XLA reference) keep f32 math; production bf16 specs run the
    # data path in bf16 (see _dequant_row — the f32 path was the decode
    # bottleneck at MHA geometry)
    dt = (jnp.float32 if spec.dtype == jnp.float32 else jnp.bfloat16)
    expand = _expand_matrix(spec, dt) if quant else None
    li = layer_ref[0]
    tlen = tlen_ref[0] if tail else 0

    ctxs_t = [ctx_ref[base + j] for j in range(seq_blk)]   # incl. current
    # cached-token counts (what the page loop walks)
    ctxs = ([jnp.maximum(c - 1 - tlen, 0) for c in ctxs_t] if deferred
            else ctxs_t)
    max_ctx = functools.reduce(jnp.maximum, ctxs)
    max_ctx_t = functools.reduce(jnp.maximum, ctxs_t)

    lbase = li * spec.num_slots   # this layer's slot-row offset

    def start_dma(slot, p_idx):
        for j in range(seq_blk):
            @pl.when(p_idx * ps < ctxs[j])
            def _():
                page = pt_ref[base + j, p_idx]
                o = lbase + page * ps
                pltpu.make_async_copy(
                    cache_ref.at[:, pl.ds(o, ps), :],
                    kv_buf.at[slot, j], sem.at[slot, j, 0]).start()
                if quant:
                    pltpu.make_async_copy(
                        scale_ref.at[pl.ds(o, ps), :],
                        s_buf.at[slot, j], sem.at[slot, j, 1]).start()

    def wait_dma(slot, p_idx):
        for j in range(seq_blk):
            @pl.when(p_idx * ps < ctxs[j])
            def _():
                pltpu.make_async_copy(
                    cache_ref.at[:, pl.ds(0, ps), :],
                    kv_buf.at[slot, j], sem.at[slot, j, 0]).wait()
                if quant:
                    pltpu.make_async_copy(
                        scale_ref.at[pl.ds(0, ps), :],
                        s_buf.at[slot, j], sem.at[slot, j, 1]).wait()

    @pl.when(max_ctx_t > 0)
    def _():
        # [seq_blk, Hq, hd] -> [seq_blk*KVH, G, hd] (true head_dim; no
        # lane padding — the packed-row k half is sliced to match)
        q32 = q_ref[...].astype(jnp.float32).reshape(seq_blk * kvh, g, hd)
        q32 = q32 * (hd ** -0.5)
        q = q32.astype(dt)

        if tail:
            # the block-tail slab rides one DMA per program, fired early
            # so it lands behind the page walk. Unconditional: at
            # tlen == 0 (block step 0) the buffer holds finite zeros and
            # the all-false tail mask makes the phase a no-op.
            pltpu.make_async_copy(
                tkv_ref.at[li, pl.ds(base, seq_blk)], t_buf,
                t_sem.at[0]).start()
            if quant:
                pltpu.make_async_copy(
                    ts_ref.at[li, pl.ds(base, seq_blk)], ts_buf,
                    t_sem.at[1]).start()

        @pl.when(max_ctx > 0)
        def _():
            start_dma(0, 0)

        # per-(seq, head) row context lengths, built via scalar selects
        # (Mosaic cannot reshape/broadcast tiny sub-lane vectors)
        row_ids = jax.lax.broadcasted_iota(
            jnp.int32, (seq_blk * kvh, 1, 1), 0)
        ctx_b = jnp.zeros((seq_blk * kvh, 1, 1), jnp.int32)
        for j, c in enumerate(ctxs):
            ctx_b = jnp.where(row_ids // kvh == j, c, ctx_b)
        ctx_b_t = ctx_b
        if deferred:
            ctx_b_t = jnp.zeros((seq_blk * kvh, 1, 1), jnp.int32)
            for j, c in enumerate(ctxs_t):
                ctx_b_t = jnp.where(row_ids // kvh == j, c, ctx_b_t)

        def body(p_idx, carry):
            acc, m, l = carry
            slot = p_idx % 2

            @pl.when((p_idx + 1) * ps < max_ctx)
            def _():
                start_dma((p_idx + 1) % 2, p_idx + 1)

            wait_dma(slot, p_idx)
            if quant:
                rows = jnp.concatenate([
                    _dequant_row(kv_buf[slot, j, h], s_buf[slot, j],
                                 h, spec, expand)[None]
                    for j in range(seq_blk) for h in range(kvh)])
            else:
                rows = kv_buf[slot].astype(dt).reshape(
                    seq_blk * kvh, ps, 2 * shd)
            k = rows[..., :hd]
            v = rows[..., shd:shd + hd]

            # rows whose sequence has no page at this phase read buffers
            # that were never DMA'd (uninitialized VMEM; may hold NaN/inf
            # which would poison the masked dot products): zero them
            active = (p_idx * ps) < ctx_b                # [sb*KVH, 1, 1]
            k = jnp.where(active, k, 0.0)
            v = jnp.where(active, v, 0.0)

            # scores [sb*KVH, G, ps]
            s = jax.lax.dot_general(
                q, k, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            k_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, ps), 2)
            if has_alibi:
                # softmax-shift-invariant ALiBi form: bias = slope * k_pos
                slopes = jnp.concatenate(
                    [slopes_ref[:]] * seq_blk, axis=0)   # [sb*KVH, G]
                k_pos = (p_idx * ps + k_iota).astype(jnp.float32)
                s = s + slopes[..., None] * k_pos
            valid = (p_idx * ps + k_iota) < ctx_b
            s = jnp.where(valid, s, _NEG_INF)

            m_new = jnp.maximum(m, jnp.max(s, axis=-1))
            alpha = jnp.exp(m - m_new)
            p_exp = jnp.exp(s - m_new[..., None])
            p_exp = jnp.where(valid, p_exp, 0.0)
            l_new = l * alpha + jnp.sum(p_exp, axis=-1)
            # p rides in the compute dtype for the MXU dot; the
            # accumulator stays f32 (standard flash-attention practice)
            pv = jax.lax.dot_general(
                p_exp.astype(dt), v, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            return acc * alpha[..., None] + pv, m_new, l_new

        acc0 = jnp.zeros((seq_blk * kvh, g, hd), jnp.float32)
        m0 = jnp.full((seq_blk * kvh, g), _NEG_INF, jnp.float32)
        l0 = jnp.zeros((seq_blk * kvh, g), jnp.float32)
        n_pages = pl.cdiv(max_ctx, ps)
        acc, m, l = jax.lax.fori_loop(0, n_pages, body, (acc0, m0, l0),
                                      unroll=False)

        if tail:
            jt = t_buf.shape[2]
            pltpu.make_async_copy(
                tkv_ref.at[li, pl.ds(0, seq_blk)], t_buf,
                t_sem.at[0]).wait()
            if quant:
                pltpu.make_async_copy(
                    ts_ref.at[li, pl.ds(0, seq_blk)], ts_buf,
                    t_sem.at[1]).wait()
                trows = jnp.concatenate([
                    _dequant_row(t_buf[j_, h], ts_buf[j_],
                                 h, spec, expand)[None]
                    for j_ in range(seq_blk) for h in range(kvh)])
            else:
                trows = t_buf[...].astype(dt).reshape(
                    seq_blk * kvh, jt, 2 * shd)
            tk = trows[..., :hd]
            tv = trows[..., shd:shd + hd]
            s_t = jax.lax.dot_general(
                q, tk, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)      # [sb*KVH, G, J]
            j_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, jt), 2)
            if has_alibi:
                slopes_t = jnp.concatenate(
                    [slopes_ref[:]] * seq_blk, axis=0)
                k_pos = (ctx_b + j_iota).astype(jnp.float32)
                s_t = s_t + slopes_t[..., None] * k_pos
            # every live row in a decode block has advanced exactly tlen
            # steps, so its valid tail count IS tlen; padding rows read
            # finite garbage whose output the host discards (same
            # contract as the self-term)
            valid = j_iota < tlen
            s_t = jnp.where(valid, s_t, _NEG_INF)
            m_new = jnp.maximum(m, jnp.max(s_t, axis=-1))
            alpha = jnp.exp(m - m_new)
            p_t = jnp.exp(s_t - m_new[..., None])
            p_t = jnp.where(valid, p_t, 0.0)
            l = l * alpha + jnp.sum(p_t, axis=-1)
            pv = jax.lax.dot_general(
                p_t.astype(dt), tv, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            acc = acc * alpha[..., None] + pv
            m = m_new

        if deferred:
            # self-term: the current token's K/V (not yet in the cache)
            # joins the online softmax as one extra key. Its position is
            # each row's cached count (= ctx_t - 1).
            fk = fk_ref[...].astype(jnp.float32).reshape(
                seq_blk * kvh, 1, hd)
            fv = fv_ref[...].astype(jnp.float32).reshape(
                seq_blk * kvh, 1, hd)
            s_self = jnp.sum(q32 * fk, axis=-1)          # [sb*KVH, G]
            if has_alibi:
                slopes = jnp.concatenate(
                    [slopes_ref[:]] * seq_blk, axis=0)   # [sb*KVH, G]
                # current position = cached + tail length (ctx_t - 1)
                s_self = s_self + slopes * (
                    ctx_b[:, :, 0] + tlen).astype(jnp.float32)
            m_new = jnp.maximum(m, s_self)
            alpha = jnp.exp(m - m_new)
            p_self = jnp.exp(s_self - m_new)
            l = l * alpha + p_self
            acc = acc * alpha[..., None] + p_self[..., None] * fv
            m = m_new

        out = acc / jnp.maximum(l, 1e-30)[..., None]
        # zero rows whose ctx == 0 (padding sequences inside the block)
        out = jnp.where(ctx_b_t > 0, out, 0.0)
        o_ref[...] = out.reshape(seq_blk, num_q_heads, hd).astype(
            o_ref.dtype)

    @pl.when(max_ctx_t <= 0)
    def _():
        o_ref[...] = jnp.zeros((seq_blk, num_q_heads, hd), o_ref.dtype)


def _prefill_kernel(spec: CacheSpec, num_q_heads: int, q_blk: int,
                    has_alibi: bool, deferred: bool,
                    layer_ref, pt_ref, start_ref, newlen_ref,  # prefetch
                    q_ref, cache_ref, scale_ref,
                    slopes_ref, fkv_ref, fs_ref,      # inputs
                    o_ref,                            # output
                    kv_buf, s_buf, sem):
    """``deferred``: this step's own K/V is NOT in the cache yet — pages
    at positions >= start stream from the dense fresh inputs instead
    (``fkv_ref`` [Bp, KVH, Qp, 2*shd] packed rows in the same head-major
    slab layout as a cache page, ``fs_ref`` [Bp, Qp, scale_lanes]).
    ``start`` is page-aligned by construction (prefix-cache hits are
    page-granular), so every page comes WHOLLY from one source. The one
    mid-page start the generator produces — the full-hit replay row
    (start = hit-1, new_len = 1, generator.py) — never reaches the
    fresh branch: kv_hi = start+1 bounds the page walk at the straddling
    page, whose p_idx*ps < start, and the cache already holds the
    replayed position (that's what a full hit means)."""
    b = pl.program_id(0)
    qb = pl.program_id(1)
    kvh, hd, shd = spec.num_kv_heads, spec.head_dim, spec.shd
    g = num_q_heads // kvh
    ps = spec.page_size
    quant = spec.quantized
    # compute dtype follows spec.dtype (see _decode_kernel)
    dt = (jnp.float32 if spec.dtype == jnp.float32 else jnp.bfloat16)
    expand = _expand_matrix(spec, dt) if quant else None
    li = layer_ref[0]
    start = start_ref[b]
    new_len = newlen_ref[b]
    ctx = start + new_len

    q0 = start + qb * q_blk                      # abs pos of block row 0
    kv_hi = jnp.minimum(ctx, q0 + q_blk)         # causal upper bound
    n_pages = pl.cdiv(kv_hi, ps)
    block_active = (qb * q_blk) < new_len

    lbase = li * spec.num_slots   # this layer's slot-row offset

    def start_dma(slot, p_idx):
        if deferred:
            fresh = p_idx * ps >= start

            @pl.when(fresh)
            def _():
                # start is page-aligned by construction; Mosaic cannot
                # prove that for the runtime scalar, and rejects the
                # sublane-tiled slice without the hint (seen on v5e:
                # "tile index in dimension 2 is divisible by the tiling")
                fo = pl.multiple_of(p_idx * ps - start, ps)
                pltpu.make_async_copy(
                    fkv_ref.at[b, :, pl.ds(fo, ps), :], kv_buf.at[slot],
                    sem.at[slot, 0]).start()
                if quant:
                    pltpu.make_async_copy(
                        fs_ref.at[b, pl.ds(fo, ps), :], s_buf.at[slot],
                        sem.at[slot, 1]).start()

            @pl.when(jnp.logical_not(fresh))
            def _():
                o = lbase + pt_ref[b, p_idx] * ps
                pltpu.make_async_copy(
                    cache_ref.at[:, pl.ds(o, ps), :], kv_buf.at[slot],
                    sem.at[slot, 0]).start()
                if quant:
                    pltpu.make_async_copy(
                        scale_ref.at[pl.ds(o, ps), :], s_buf.at[slot],
                        sem.at[slot, 1]).start()
        else:
            o = lbase + pt_ref[b, p_idx] * ps
            pltpu.make_async_copy(
                cache_ref.at[:, pl.ds(o, ps), :], kv_buf.at[slot],
                sem.at[slot, 0]).start()
            if quant:
                pltpu.make_async_copy(
                    scale_ref.at[pl.ds(o, ps), :], s_buf.at[slot],
                    sem.at[slot, 1]).start()

    def wait_dma(slot):
        pltpu.make_async_copy(
            cache_ref.at[:, pl.ds(0, ps), :], kv_buf.at[slot],
            sem.at[slot, 0]).wait()
        if quant:
            pltpu.make_async_copy(
                scale_ref.at[pl.ds(0, ps), :], s_buf.at[slot],
                sem.at[slot, 1]).wait()

    @pl.when(block_active)
    def _():
        # q block [q_blk, Hq, hd] -> [KVH, G*q_blk, hd] (head-major)
        q = q_ref[0].astype(jnp.float32)
        q = q.reshape(q_blk, kvh, g, hd).transpose(1, 2, 0, 3).reshape(
            kvh, g * q_blk, hd)
        q = (q * (hd ** -0.5)).astype(dt)
        # row j of the [G*q_blk] flattened block is (g=j//q_blk,
        # i=j%q_blk); its absolute position is q0 + i
        i_in_blk = jax.lax.broadcasted_iota(
            jnp.int32, (1, g * q_blk, 1), 1) % q_blk
        row_pos = q0 + i_in_blk
        row_valid = (i_in_blk + qb * q_blk) < new_len

        start_dma(0, 0)

        def body(p_idx, carry):
            acc, m, l = carry
            slot = p_idx % 2

            @pl.when((p_idx + 1) * ps < kv_hi)
            def _():
                start_dma((p_idx + 1) % 2, p_idx + 1)

            wait_dma(slot)
            if quant:
                rows = jnp.concatenate([
                    _dequant_row(kv_buf[slot, h], s_buf[slot],
                                 h, spec, expand)[None]
                    for h in range(kvh)])            # [KVH, ps, 2*shd]
            else:
                rows = kv_buf[slot].astype(dt)
            k = rows[..., :hd]
            v = rows[..., shd:shd + hd]

            s = jax.lax.dot_general(
                q, k, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)   # [KVH, G*qblk, ps]
            k_pos = (p_idx * ps + jax.lax.broadcasted_iota(
                jnp.int32, (1, 1, ps), 2))
            if has_alibi:
                # slopes pre-expanded to [KVH, G*q_blk] by the wrapper
                s = s + (slopes_ref[:][..., None]
                         * k_pos.astype(jnp.float32))
            mask = (k_pos <= row_pos) & row_valid & (k_pos < ctx)
            s = jnp.where(mask, s, _NEG_INF)

            m_new = jnp.maximum(m, jnp.max(s, axis=-1))
            alpha = jnp.exp(m - m_new)
            p_exp = jnp.exp(s - m_new[..., None])
            p_exp = jnp.where(mask, p_exp, 0.0)
            l_new = l * alpha + jnp.sum(p_exp, axis=-1)
            # p in the compute dtype for the MXU dot; accumulator f32
            pv = jax.lax.dot_general(
                p_exp.astype(dt), v, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            return acc * alpha[..., None] + pv, m_new, l_new

        acc0 = jnp.zeros((kvh, g * q_blk, hd), jnp.float32)
        m0 = jnp.full((kvh, g * q_blk), _NEG_INF, jnp.float32)
        l0 = jnp.zeros((kvh, g * q_blk), jnp.float32)
        acc, m, l = jax.lax.fori_loop(0, n_pages, body, (acc0, m0, l0),
                                      unroll=False)
        out = acc / jnp.maximum(l, 1e-30)[..., None]
        out = out.reshape(kvh, g, q_blk, hd).transpose(2, 0, 1, 3).reshape(
            q_blk, num_q_heads, hd)
        o_ref[0] = out.astype(o_ref.dtype)

    @pl.when(jnp.logical_not(block_active))
    def _():
        o_ref[0] = jnp.zeros((q_blk, num_q_heads, hd), o_ref.dtype)


def _scale_placeholder(spec: CacheSpec):
    # unused when the cache is unquantized; shape only has to be DMA-legal
    return jnp.zeros((spec.page_size, 128), jnp.bfloat16)


def paged_decode_attention(
    q: jax.Array,                 # [B, Hq, hd]
    cache: jax.Array,             # [KVH, L*S, 2*shd] packed (int8/float)
    scale: Optional[jax.Array],   # [L*S, scale_lanes] when quantized
    page_table: jax.Array,        # i32[B, P]
    context_len: jax.Array,       # i32[B] kv length incl. current token
    spec: CacheSpec,
    *,
    layer: int = 0,
    fresh_k: Optional[jax.Array] = None,  # [B, KVH, hd] deferred-append
    fresh_v: Optional[jax.Array] = None,
    seq_block: int = 4,
    interpret: bool = False,
    alibi: Optional[jax.Array] = None,   # f32[num_q_heads] slopes
    tail_kv: Optional[jax.Array] = None,  # [L, B, KVH, J, 2*shd] packed
    tail_scale: Optional[jax.Array] = None,  # [L, B, J, scale_lanes]
    tail_len: Optional[jax.Array] = None,    # i32[1]
) -> jax.Array:
    """Decode attention over the paged cache; one new token per row.

    ``fresh_k/v`` given = deferred-append mode: the cache holds
    ``context_len - 1`` tokens and the current token's K/V enters as a
    self-term (see ops.kv_cache.append_kv_block). The layer index rides
    scalar prefetch so all layers share one compiled kernel.

    ``tail_kv/tail_scale/tail_len`` given = block-tail mode (requires
    deferred): the cache is ``tail_len`` further tokens behind; the
    block's own earlier tokens stream from the dense side buffer (one
    cache scatter per multi-step block instead of per step).
    """
    b, num_q_heads, hd = q.shape
    if scale is None or scale.ndim != 2:
        scale = _scale_placeholder(spec)
    while seq_block > 1 and b % seq_block:
        seq_block //= 2

    kvh, ps = spec.num_kv_heads, spec.page_size
    g = num_q_heads // kvh
    has_alibi = alibi is not None
    deferred = fresh_k is not None
    tail = tail_kv is not None
    assert not tail or deferred, "block-tail mode requires deferred"
    slopes = (alibi.astype(jnp.float32).reshape(kvh, g) if has_alibi
              else jnp.zeros((kvh, g), jnp.float32))
    if not deferred:
        fresh_k = jnp.zeros((b, kvh, hd), q.dtype)
        fresh_v = jnp.zeros((b, kvh, hd), q.dtype)
    if tail:
        jt = tail_kv.shape[3]
        if tail_scale is None:
            tail_scale = jnp.zeros(
                (tail_kv.shape[0], b, jt, 128), jnp.bfloat16)
    else:
        jt = 1
        tail_kv = jnp.zeros((1, seq_block, kvh, 1, spec.row_lanes),
                            cache.dtype)
        tail_scale = jnp.zeros((1, seq_block, 1, 128), jnp.bfloat16)
        tail_len = jnp.zeros((1,), jnp.int32)
    kernel = functools.partial(_decode_kernel, spec, num_q_heads, seq_block,
                               has_alibi, deferred, tail)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(b // seq_block,),
        in_specs=[
            pl.BlockSpec((seq_block, num_q_heads, hd),
                         lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),   # cache stays in HBM
            pl.BlockSpec(memory_space=pltpu.ANY),   # scales stay in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),  # alibi slopes [KVH, G]
            pl.BlockSpec((seq_block, kvh, hd),      # fresh k (self-term)
                         lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((seq_block, kvh, hd),      # fresh v
                         lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),   # block tail rows
            pl.BlockSpec(memory_space=pltpu.ANY),   # block tail scales
        ],
        out_specs=pl.BlockSpec((seq_block, num_q_heads, hd),
                               lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, seq_block, kvh, ps, spec.row_lanes),
                       cache.dtype),
            pltpu.VMEM((2, seq_block, ps,
                        spec.scale_lanes if spec.quantized else 128),
                       jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2, seq_block, 2)),
            pltpu.VMEM((seq_block, kvh, jt, spec.row_lanes) if tail
                       else (1, 1, 1, 128), cache.dtype),
            pltpu.VMEM((seq_block, jt,
                        spec.scale_lanes if spec.quantized else 128)
                       if tail else (1, 1, 128), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, num_q_heads, hd), q.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(jnp.asarray([layer], jnp.int32), page_table, context_len,
      jnp.asarray(tail_len, jnp.int32).reshape(1),
      q, cache, scale, slopes, fresh_k, fresh_v, tail_kv, tail_scale)


def paged_prefill_attention(
    q: jax.Array,                 # [Bp, Qp, Hq, hd]
    cache: jax.Array,             # [KVH, L*S, 2*shd] packed
    scale: Optional[jax.Array],   # [L*S, scale_lanes] when quantized
    page_table: jax.Array,        # i32[Bp, P]
    start: jax.Array,             # i32[Bp]
    new_len: jax.Array,           # i32[Bp]
    spec: CacheSpec,
    *,
    layer: int = 0,
    fresh_kv: Optional[jax.Array] = None,   # [Bp, KVH, Qp, 2*shd] packed
    fresh_scale: Optional[jax.Array] = None,  # [Bp, Qp, scale_lanes]
    q_block: int = 128,
    interpret: bool = False,
    alibi: Optional[jax.Array] = None,   # f32[num_q_heads] slopes
) -> jax.Array:
    """Chunked-causal prefill attention over the paged cache; supports
    start > 0 (prefix-cache-hit continuation).

    Two append modes: with ``fresh_kv`` given (deferred append), this
    step's K/V streams from the dense fresh input — same packed-row page
    slabs as the cache, in the cache dtype (pre-quantized when int8) —
    and the cache write batches into the fused end-of-step scatter.
    Without it, this step's K/V must already be in the cache."""
    bp, qp, num_q_heads, hd = q.shape
    q_blk = min(q_block, qp)
    assert qp % q_blk == 0, (qp, q_blk)
    if scale is None or scale.ndim != 2:
        scale = _scale_placeholder(spec)
    deferred = fresh_kv is not None
    if deferred:
        assert qp % spec.page_size == 0, (qp, spec.page_size)
        assert fresh_kv.dtype == cache.dtype, (fresh_kv.dtype, cache.dtype)
        if fresh_scale is None:
            fresh_scale = jnp.zeros((bp, qp, 128), jnp.bfloat16)
    else:
        fresh_kv = jnp.zeros((1, spec.num_kv_heads, spec.page_size,
                              spec.row_lanes), cache.dtype)
        fresh_scale = jnp.zeros((1, spec.page_size, 128), jnp.bfloat16)

    kvh, ps = spec.num_kv_heads, spec.page_size
    g = num_q_heads // kvh
    has_alibi = alibi is not None
    # expanded to the kernel's [KVH, G*q_blk] flattened-q layout (col j
    # holds the slope of q head (kv_head, j // q_blk))
    slopes = (jnp.repeat(alibi.astype(jnp.float32).reshape(kvh, g),
                         q_blk, axis=1) if has_alibi
              else jnp.zeros((kvh, g * q_blk), jnp.float32))
    kernel = functools.partial(_prefill_kernel, spec, num_q_heads, q_blk,
                               has_alibi, deferred)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(bp, qp // q_blk),
        in_specs=[
            pl.BlockSpec((1, q_blk, num_q_heads, hd),
                         lambda b, qb, *_: (b, qb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # alibi slopes
            pl.BlockSpec(memory_space=pltpu.ANY),   # fresh kv (HBM)
            pl.BlockSpec(memory_space=pltpu.ANY),   # fresh scales (HBM)
        ],
        out_specs=pl.BlockSpec((1, q_blk, num_q_heads, hd),
                               lambda b, qb, *_: (b, qb, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, kvh, ps, spec.row_lanes), cache.dtype),
            pltpu.VMEM((2, ps,
                        spec.scale_lanes if spec.quantized else 128),
                       jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bp, qp, num_q_heads, hd), q.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(jnp.asarray([layer], jnp.int32), page_table, start, new_len,
      q, cache, scale, slopes, fresh_kv, fresh_scale)
