"""Dynamic per-token INT8 activation x per-channel INT8 weight matmuls.

TPU-native implementation of the reference's ``QUANT_METHOD_ONLINE_I8I8``
(``resource_manager.cc:43-67``, SURVEY.md E2): weights are quantized once
at load time with symmetric per-output-channel absmax scales; activations
are quantized on the fly with symmetric per-token absmax scales; the
int8 x int8 matmul accumulates in int32 on the MXU and the epilogue
rescales by (act_scale x weight_scale).

These XLA implementations already fuse well (the quant/dequant elementwise
stages melt into surrounding ops); the Pallas kernel variant exists to
fuse the absmax+quantize into the matmul's data movement for the largest
shapes (ops/pallas/).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def quantize_weight(w: jax.Array, contract_axis: int = 0
                    ) -> Tuple[jax.Array, jax.Array]:
    """Per-output-channel symmetric int8 quantization.

    ``contract_axis`` is the axis that the matmul contracts over (the
    scale is per remaining-channel). Returns (int8 weights, f32 scales
    shaped like w without the contraction axis).
    """
    w32 = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(w32), axis=contract_axis)
    scale = absmax / 127.0
    inv = jnp.where(scale > 0, 1.0 / jnp.maximum(scale, 1e-10), 0.0)
    q = jnp.clip(jnp.round(w32 * jnp.expand_dims(inv, contract_axis)),
                 -127, 127).astype(jnp.int8)
    return q, scale


def quantize_activation(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Dynamic per-token (last-axis) symmetric int8 quantization.

    x: [T, D] -> (int8 [T, D], f32 scales [T]).
    """
    x32 = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(x32), axis=-1)
    scale = absmax / 127.0
    inv = jnp.where(scale > 0, 1.0 / jnp.maximum(scale, 1e-10), 0.0)
    q = jnp.clip(jnp.round(x32 * inv[:, None]), -127, 127).astype(jnp.int8)
    return q, scale


def quantize_weight_int4(w: jax.Array, group: int = 64,
                         search_steps: int = 12
                         ) -> Tuple[jax.Array, jax.Array]:
    """Groupwise symmetric int4 weight quantization (AWQ-style group
    size along the contraction axis, with a per-group scale search).

    Extends the reference's online weight-quant design
    (``QUANT_METHOD_ONLINE_I8I8``, ``resource_manager.cc:43-67``) to
    4-bit: per-(group, out-channel) scales over ``group`` consecutive
    rows of the contraction axis (axis 0), values clipped to the
    symmetric range [-7, 7].

    ``search_steps > 0`` replaces plain absmax RTN with a per-group MSE
    scale search: candidate scales ``absmax/7 * k`` for ``k`` in
    [1.0 .. 0.55] are scored by round-trip squared error and the best
    is kept, per (group, out-channel). Shrinking the scale below absmax
    trades clipping error on the one outlier row against rounding error
    on the other ``group-1`` rows — for int4's 8-level grid that is the
    single cheapest accuracy lever (round-3 measured the absmax-RTN
    g=128 config at 2.2x the int8 KL budget; g=64 + search brings it
    under its own int4 budget, see BASELINE.md round 4). Only best
    scale/err maps (shaped [G, ...out]) persist across candidates, so
    peak memory stays ~2 weight copies. ``search_steps=0`` = pure RTN.

    Packing is TPU-sublane-friendly: byte ``i`` of the packed array
    holds ``w[i]`` in the low nibble and ``w[i + D//2]`` in the high
    nibble, so the kernel unpack is two full-block shifts and one
    concat along axis 0 — NO element interleave (an adjacent-pair
    packing would need a sublane shuffle, which Mosaic lowers poorly).

    w: [D, ...out] float -> (packed int8 [D//2, ...out],
                             scales f32 [D//group, ...out]).

    ``group`` halves automatically until it divides D//2 (tiny test
    models have D < 256); consumers infer the group size from the
    packed/scale shape ratio, so no side-channel is needed.
    """
    d = w.shape[0]
    while group > 1 and d % (2 * group):
        group //= 2
    assert d % (2 * group) == 0, (w.shape, group)
    w32 = w.astype(jnp.float32)
    grouped = w32.reshape((d // group, group) + w.shape[1:])
    absmax = jnp.max(jnp.abs(grouped), axis=1)           # [G, ...out]
    scale0 = absmax / 7.0

    def _quantize(scale):
        inv = jnp.where(scale > 0, 1.0 / jnp.maximum(scale, 1e-10), 0.0)
        return jnp.clip(jnp.round(grouped * jnp.expand_dims(inv, 1)),
                        -7, 7)

    scale = scale0
    if search_steps > 1:
        best_err = None
        for k in jnp.linspace(1.0, 0.55, search_steps):
            cand = scale0 * k
            q = _quantize(cand)
            err = jnp.sum(
                (q * jnp.expand_dims(cand, 1) - grouped) ** 2, axis=1)
            if best_err is None:
                best_err, scale = err, cand
            else:
                better = err < best_err
                best_err = jnp.where(better, err, best_err)
                scale = jnp.where(better, cand, scale)
    q = _quantize(scale)
    q = q.astype(jnp.int32).reshape(w.shape)             # [D, ...out]
    lo, hi = q[: d // 2], q[d // 2:]
    packed = ((hi & 0xF) << 4) | (lo & 0xF)
    return packed.astype(jnp.int8), scale


def unpack_int4(packed: jax.Array) -> jax.Array:
    """Inverse of the nibble packing above: int8 [D//2, ...] ->
    int8 [D, ...] in natural row order (lo rows then hi rows).

    Sign extension rides the arithmetic shifts: ``(b << 28) >> 28``
    for the low nibble, ``(b << 24) >> 28`` for the high — two VPU ops
    per output element, the cheapest unpack Mosaic can lower."""
    b = packed.astype(jnp.int32)
    lo = (b << 28) >> 28
    hi = (b << 24) >> 28
    return jnp.concatenate([lo, hi], axis=0).astype(jnp.int8)


def w4a8_matmul(x: jax.Array, w_p: jax.Array, w_scale: jax.Array
                ) -> jax.Array:
    """Dynamic per-token int8 activation x groupwise-int4 weight matmul
    (XLA composition; the Pallas kernel in ops/pallas/quant_matmul.py is
    the production path on TPU).

    Same two weight contracts as :func:`i8i8_matmul`:
    - plain: x [T, D] x packed [D//2, ...out], scales [G, ...out]
      -> f32 [T, ...out]
    - fused 3-axis: packed [C, D//2, N] (C leading), scales [C, G, N]
      -> f32 [C, T, N]

    The contraction is split per scale group: int8 x int8 -> int32
    partials per group on the MXU, then a (act_scale x group_scale)
    rescale and a sum over groups. Group-128 int4 [-7,7] x int8
    [-127,127] partial sums max out at 128*7*127 < 2^17 — no int32
    overflow risk.
    """
    x_q, x_scale = quantize_activation(x)
    t, d = x.shape
    g = w_scale.shape[1] if w_p.ndim == 3 else w_scale.shape[0]
    group = d // g
    xg = x_q.reshape(t, g, group)
    if w_p.ndim == 3:
        c, d2, n = w_p.shape
        assert d2 * 2 == d, (w_p.shape, x.shape)
        w = unpack_int4(w_p.reshape(c * d2, n)).reshape(2, c, d2, n)
        w = jnp.concatenate([w[0], w[1]], axis=1)        # [C, D, N]
        acc = jnp.einsum("tgd,cgdn->ctgn", xg,
                         w.reshape(c, g, group, n),
                         preferred_element_type=jnp.int32)
        scaled = acc.astype(jnp.float32) * w_scale[:, None, :, :]
        return scaled.sum(axis=2) * x_scale[None, :, None]
    out_shape = w_p.shape[1:]
    n = 1
    for s in out_shape:
        n *= s
    w = unpack_int4(w_p.reshape(w_p.shape[0], n))        # [D, N]
    acc = jnp.einsum("tgd,gdn->tgn", xg, w.reshape(g, group, n),
                     preferred_element_type=jnp.int32)
    scaled = acc.astype(jnp.float32) * w_scale.reshape(g, n)
    out = scaled.sum(axis=1) * x_scale[:, None]
    return out.reshape((t,) + out_shape)


def i8i8_matmul(x: jax.Array, w_q: jax.Array, w_scale: jax.Array
                ) -> jax.Array:
    """Fused dynamic-quant int8 matmul.

    Two weight contracts:
    - plain: x [T, D] x w_q [D, ...out] -> f32 [T, ...out]
    - fused 3-axis (exactly ndim == 3, e.g. gate|up): w_q [C, D, N]
      (C leading so device kernels can block it), w_scale [C, N]
      -> f32 [C, T, N]. The C-leading OUTPUT layout is deliberate:
      [T, C, N] would make XLA relayout the activation per layer
      (see models/llama._make_gate_up_act).

    The int8 x int8 -> int32 contraction maps onto the MXU's native int8
    path; the rescale epilogue is elementwise and fuses.
    """
    x_q, x_scale = quantize_activation(x)
    if w_q.ndim == 3:
        acc = jnp.einsum("td,cdn->ctn", x_q, w_q,
                         preferred_element_type=jnp.int32)
        scale = x_scale[None, :, None] * w_scale[:, None, :]
        return acc.astype(jnp.float32) * scale
    out_nd = w_q.ndim - 1
    acc = jax.lax.dot_general(
        x_q, w_q,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )                                            # [T, ...out] int32
    scale = x_scale.reshape(x_scale.shape + (1,) * out_nd) * w_scale
    return acc.astype(jnp.float32) * scale
