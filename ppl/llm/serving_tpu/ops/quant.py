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
