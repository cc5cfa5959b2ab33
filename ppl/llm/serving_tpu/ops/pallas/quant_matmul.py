"""Fused dynamic-quant i8i8 matmul Pallas kernel.

TPU-native replacement for the reference's ``QUANT_METHOD_ONLINE_I8I8``
matmul path (``resource_manager.cc:43-67``, SURVEY.md E2), where the CUDA
engine fuses per-token activation quantization into an int8 cublas GEMM.

Why a kernel instead of the XLA composition in ``ops/quant.py``: measured
end-to-end, the XLA int8 path (separate absmax pass over x, quantize,
int8 dot_general, f32 rescale) runs SLOWER than bf16 — the extra
activation passes and the int8 dot's lowering cost more than the halved
weight bytes save (docs/performance.md). This kernel quantizes each
activation tile once in VMEM, contracts on the MXU's native int8 path,
and applies the (act_scale x weight_scale) epilogue in VMEM before the
result leaves the core.

Grid layout: ``(T tiles, N tiles)`` with the N sweep innermost. The x
tile block index only depends on the T-tile coordinate, so Pallas keeps
it resident in VMEM across the whole N sweep; quantization happens once
per tile (at n==0, into scratch that persists across grid steps — TPU
grids run sequentially). Decode-sized calls (T <= tile) therefore stream
the int8 weights exactly once at half the bf16 byte count, which is the
whole win in the weight-bandwidth-bound decode regime; prefill-sized
calls re-stream weights once per x tile but are MXU-bound there.

Numerics match ``ops.quant.i8i8_matmul`` (same symmetric per-token /
per-out-channel scheme) up to f32 round-off in the epilogue.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_block_n(d: int, n: int, target_bytes: int = 1 << 20) -> int:
    """Weight block columns: keep each [D, block_n] int8 block near
    ``target_bytes`` so double buffering stays well inside VMEM."""
    bn = max(128, min(1024, (target_bytes // max(d, 1)) // 128 * 128))
    return min(bn, max(128, ((n + 127) // 128) * 128))


def _pick_block_t(d: int, t: int, target_bytes: int = 1 << 20) -> int:
    """Activation tile rows: bound the resident [block_t, D] bf16 tile.

    The weight streams once per t-tile, so prefill-sized calls must keep
    the tile count low: at TinyLlama prefill (T=8192, D=2048) the old
    512-row cap meant 32 weight re-streams — 34 GB of pure HBM traffic,
    measured as a ~40% prefill-step overhead. Grow the tile (up to 1024
    rows, ~6 MB x-tile VMEM at D=2048) until the weights re-stream at
    most 8 times."""
    bt = max(128, min(512, (target_bytes // max(2 * d, 1)) // 128 * 128))
    # guard on the POST-double footprint: ~5 bytes/elem resident
    # (bf16 x-tile double-buffered + int8 quantized scratch). At 7B's
    # down-proj (D=11008) the old pre-double guard let bt reach 1024,
    # whose quantize-pass f32 stack alone blew the 64 MB scoped VMEM
    # limit (measured: 101.78M requested, bench_7b OOM 2026-08-19).
    while bt < 1024 and -(-t // bt) > 8 and (2 * bt) * 5 * d < 32 * (1 << 20):
        bt *= 2
    return min(bt, max(8, ((t + 7) // 8) * 8))


def _quant_chunk(d: int, bt: int, budget_bytes: int = 8 << 20) -> int:
    """Row sub-block for the in-kernel quantize pass: the f32 upcast of
    the x tile lives on the VMEM *stack*, so a [bt, D] tile at 7B shapes
    (bt=512, D=11008 -> 22.5 MB f32) must be processed in chunks. Halve
    while the f32 chunk exceeds the budget, keeping rows 16-aligned so
    the dynamic-sliced int8 scratch writes stay sublane-aligned."""
    qc = bt
    while qc % 16 == 0 and qc > 16 and qc * d * 4 > budget_bytes:
        qc //= 2
    return qc


def _kernel(qc, x_ref, w_ref, s_ref, out_ref, xq_ref, xs_ref):
    @pl.when((pl.program_id(1) == 0) & (pl.program_id(2) == 0))
    def _():
        # static Python chunk loop: bounds the f32 stack intermediate
        # to [qc, D] regardless of tile height (see _quant_chunk)
        for i in range(0, x_ref.shape[0], qc):
            x32 = x_ref[pl.ds(i, qc)].astype(jnp.float32)
            absmax = jnp.max(jnp.abs(x32), axis=1, keepdims=True)  # [qc,1]
            scale = absmax * (1.0 / 127.0)
            inv = jnp.where(scale > 0,
                            1.0 / jnp.maximum(scale, 1e-10), 0.0)
            xq_ref[pl.ds(i, qc)] = jnp.clip(
                jnp.round(x32 * inv), -127, 127).astype(jnp.int8)
            xs_ref[pl.ds(i, qc)] = scale

    acc = jax.lax.dot_general(
        xq_ref[:], w_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )                                                            # [bt, bn]
    out = acc.astype(jnp.float32) * xs_ref[:] * s_ref[0]
    out_ref[0] = out.astype(out_ref.dtype)


def _w4_kernel(group, gc, qc, x_ref, w_ref, s_ref, out_ref, xq_ref,
               xs_ref):
    """w4a8: groupwise-int4 weights x per-token-int8 activations.

    The activation tile is quantized ONCE per t-tile (same persistence
    trick as ``_kernel``) but stored group-major ``[G, bt, group]`` so
    the per-group contraction is a batched int8 dot with no per-step
    transpose. Weights unpack with two arithmetic-shift ops per output
    element (the nibble pairing in ``ops.quant.quantize_weight_int4``
    makes unpack a concat, never an element interleave). Groups are
    contracted in chunks of ``gc`` batched MXU dots, accumulating the
    scale-applied f32 epilogue — bounding the int32 intermediate to
    ``gc x bt x bn`` regardless of how many groups D has."""
    bt = x_ref.shape[0]
    d2, bn = w_ref.shape[1], w_ref.shape[2]
    d = 2 * d2
    g = d // group

    @pl.when((pl.program_id(1) == 0) & (pl.program_id(2) == 0))
    def _():
        # chunked like _kernel: bounds the f32 stack intermediate
        for i in range(0, bt, qc):
            x32 = x_ref[pl.ds(i, qc)].astype(jnp.float32)
            absmax = jnp.max(jnp.abs(x32), axis=1, keepdims=True)  # [qc,1]
            scale = absmax * (1.0 / 127.0)
            inv = jnp.where(scale > 0,
                            1.0 / jnp.maximum(scale, 1e-10), 0.0)
            xq = jnp.clip(jnp.round(x32 * inv), -127, 127).astype(jnp.int8)
            xq_ref[:, pl.ds(i, qc)] = (
                xq.reshape(qc, g, group).transpose(1, 0, 2))
            xs_ref[pl.ds(i, qc)] = scale

    b32 = w_ref[0].astype(jnp.int32)
    lo = (b32 << 28) >> 28
    hi = (b32 << 24) >> 28
    w = jnp.concatenate([lo, hi], axis=0).astype(jnp.int8)      # [d, bn]
    wg = w.reshape(g, group, bn)
    sg = s_ref[0]                                               # [g, bn]

    # static Python unroll: Mosaic has no dynamic_slice lowering for VMEM
    # values, and the chunk count is a small static number (g/gc <= ~32,
    # typically 4), so constant-index slices are both required and cheap
    acc = jnp.zeros((bt, bn), jnp.float32)
    for i in range(g // gc):
        xi = xq_ref[pl.ds(i * gc, gc)]                          # [gc,bt,gr]
        wi = jax.lax.slice_in_dim(wg, i * gc, (i + 1) * gc, axis=0)
        si = jax.lax.slice_in_dim(sg, i * gc, (i + 1) * gc, axis=0)
        part = jax.lax.dot_general(
            xi, wi,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32,
        )                                                       # [gc,bt,bn]
        acc = acc + (part.astype(jnp.float32)
                     * si[:, None, :]).sum(axis=0)
    out_ref[0] = (acc * xs_ref[:]).astype(out_ref.dtype)


def _pick_gc(g: int, bt: int, bn: int,
             budget_bytes: int = 4 << 20) -> int:
    """Group-chunk size: the largest divisor of ``g`` (capped at 8)
    whose int32 dot intermediate ``gc x bt x bn`` stays in budget."""
    gc = 1
    for cand in range(2, 9):
        if g % cand == 0 and cand * bt * bn * 4 <= budget_bytes:
            gc = cand
    return gc


@functools.partial(jax.jit, static_argnames=("interpret", "block_n",
                                             "block_t", "out_dtype"))
def w4a8_matmul_pallas(x: jax.Array, w_p: jax.Array, w_scale: jax.Array,
                       *, interpret: bool = False,
                       block_n: int = 0, block_t: int = 0,
                       out_dtype=jnp.float32) -> jax.Array:
    """Drop-in for ``ops.quant.w4a8_matmul`` (same two weight contracts):

    - plain: x [T, D] x packed int4 [D//2, ...out], scales [G, ...out]
      -> f32 [T, ...out]
    - fused 3-axis: packed [C, D//2, N] (C leading), scales [C, G, N]
      -> f32 [C, T, N]

    Versus ``i8i8_matmul_pallas`` this halves the streamed weight bytes
    again — decode throughput is weight-bandwidth-bound, so int4 moves
    the decode roofline itself. The cost is a VPU unpack (2 ops/element)
    overlapped with the halved DMA, and groupwise scale granularity
    (RTN g=128) instead of per-channel.
    """
    t, d = x.shape
    g = w_scale.shape[1] if w_p.ndim == 3 else w_scale.shape[0]
    group = d // g
    if w_p.ndim == 3:
        fused = True
        c, d2, n = w_p.shape
        assert d2 * 2 == d, (w_p.shape, x.shape)
        w3 = w_p
        s3 = w_scale
        out_shape = None
    else:
        fused = False
        out_shape = w_p.shape[1:]
        c, n = 1, 1
        for s in out_shape:
            n *= s
        w3 = w_p.reshape(1, d // 2, n)
        s3 = w_scale.reshape(1, g, n)
    s3 = s3.astype(jnp.float32)
    bn = block_n or _pick_block_n(d // 2, n)
    bt = block_t or _pick_block_t(d, t)
    gc = _pick_gc(g, bt, bn)
    qc = _quant_chunk(d, bt)
    grid = (pl.cdiv(t, bt), c, pl.cdiv(n, bn))

    out = pl.pallas_call(
        functools.partial(_w4_kernel, group, gc, qc),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bt, d), lambda i, ci, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d // 2, bn), lambda i, ci, j: (ci, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g, bn), lambda i, ci, j: (ci, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bt, bn), lambda i, ci, j: (ci, i, j),
                               memory_space=pltpu.VMEM),
        # the epilogue runs in f32 in VMEM; writing the consumer's dtype
        # directly avoids an f32 HBM round-trip + convert pass (at 7B
        # prefill tiles that pass alone was ~50 GB of traffic per step)
        out_shape=jax.ShapeDtypeStruct((c, t, n), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((g, bt, group), jnp.int8),
            pltpu.VMEM((bt, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * t * d * c * n,
            bytes_accessed=d * c * n // 2 + t * d * x.dtype.itemsize
            + t * c * n * jnp.dtype(out_dtype).itemsize,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x, w3, s3)
    if fused:
        return out
    return out[0].reshape((t,) + out_shape)


@functools.partial(jax.jit, static_argnames=("interpret", "block_n",
                                             "block_t", "out_dtype"))
def i8i8_matmul_pallas(x: jax.Array, w_q: jax.Array, w_scale: jax.Array,
                       *, interpret: bool = False,
                       block_n: int = 0, block_t: int = 0,
                       out_dtype=jnp.float32) -> jax.Array:
    """Drop-in for ``ops.quant.i8i8_matmul`` (same two weight contracts):

    - plain: x [T, D] x w_q int8 [D, ...out] -> f32 [T, ...out]
    - fused 3-axis: w_q [C, D, N] (C leading), w_scale [C, N]
      -> f32 [C, T, N]

    Fused weights (gate|up) ride in C-leading so the kernel blocks them
    as [1, D, bn] slabs of the row-major array (Mosaic only constrains
    the LAST two block dims; a [D, 1, bn] block of a [D, C, N] array is
    rejected, and reshaping the operand to [D, C*N] invites XLA to pick
    a non-default parameter layout and relayout-copy the int8 weight
    every call — traced ~3 ms per decode block on v5e). The C-leading
    OUTPUT keeps gate/up slices layout-free for the consumer.
    """
    t, d = x.shape
    if w_q.ndim == 3:
        fused = True
        c, d2, n = w_q.shape
        assert d2 == d, (w_q.shape, x.shape)
        w3 = w_q
        out_shape = None
    else:
        fused = False
        out_shape = w_q.shape[1:]
        c, n = 1, 1
        for s in out_shape:
            n *= s
        w3 = w_q.reshape(1, d, n)
    s3 = w_scale.reshape(c, 1, n).astype(jnp.float32)
    bn = block_n or _pick_block_n(d, n)
    bt = block_t or _pick_block_t(d, t)
    qc = _quant_chunk(d, bt)
    grid = (pl.cdiv(t, bt), c, pl.cdiv(n, bn))

    out = pl.pallas_call(
        functools.partial(_kernel, qc),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bt, d), lambda i, ci, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, bn), lambda i, ci, j: (ci, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bn), lambda i, ci, j: (ci, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bt, bn), lambda i, ci, j: (ci, i, j),
                               memory_space=pltpu.VMEM),
        # see w4a8: write the consumer's dtype, skip the f32 round-trip
        out_shape=jax.ShapeDtypeStruct((c, t, n), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((bt, d), jnp.int8),
            pltpu.VMEM((bt, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * t * d * c * n,
            bytes_accessed=d * c * n + t * d * x.dtype.itemsize
            + t * c * n * jnp.dtype(out_dtype).itemsize,
            transcendentals=0,
        ),
        # prefill-sized activation tiles (1024 rows, see _pick_block_t)
        # need ~20 MB of double-buffered VMEM — above the 16 MB default
        # scoped limit, comfortably under the 128 MB physical VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x, w3, s3)
    if fused:
        return out
    return out[0].reshape((t,) + out_shape)
