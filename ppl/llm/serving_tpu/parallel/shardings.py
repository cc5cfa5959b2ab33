"""Tensor-parallel meshes and sharding rules.

TPU-native replacement for the reference's NCCL tensor parallelism
(``resource_manager.cc:373-428``, SURVEY.md E5): instead of per-rank
threads each binding a GPU, pre-sliced weight files and explicit NCCL
comms, ONE jitted step runs SPMD over a ``jax.sharding.Mesh`` and XLA
inserts the ICI collectives implied by the sharding annotations
(all-reduce after the row-parallel wo/w_down matmuls, all-gather of
sharded logits before sampling), overlapping them with compute via the
latency-hiding scheduler.

Sharding scheme (Megatron-style, matching the reference's head split —
KV heads shard across TP, ``llm_engine.cc:122-162``):

    embedding   [V, D]              P('tp', None)   row (vocab) parallel
    wqkv        [D, KVH, G+2, hd]   P(None, 'tp', None, None)  per layer
    wo          [H*hd, D]           P('tp', None)   row parallel
    w_gate_up   [D, 2, I]           P(None, None, 'tp')
    w_down      [I, D]              P('tp', None)   row parallel
    norms                           replicated
    lm_head     [D, V]              P(None, 'tp')   column parallel
    kv cache    [KVH, L*S, 2*shd]   P('tp', None, None)  stacked, layer inner
    kv scale    [L*S, scale_lanes]  P(None, 'tp') when per-shard lanes
                                    are 128-aligned, else replicated
    count map   [slots, V]          replicated

Constraints: ``num_kv_heads % tp == 0`` and ``intermediate_dim % tp == 0``
(same kv-head divisibility the reference requires).

Data parallelism is NOT an in-program axis for serving: dp replicas have
divergent KV caches and schedules, so dp = multiple engine instances
behind the frontend, not a mesh dimension.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import ModelConfig
from ..ops.kv_cache import CacheSpec


def make_mesh(tp_size: int, devices=None) -> Mesh:
    """1-D tensor-parallel mesh over the first ``tp_size`` devices.

    On a multi-host pod slice, ``jax.devices()`` spans all hosts and the
    same mesh expresses cross-host TP over ICI/DCN (jax.distributed must
    be initialized first — see parallel.multihost).
    """
    devices = devices if devices is not None else jax.devices()
    if len(devices) < tp_size:
        raise ValueError(
            f"need {tp_size} devices, have {len(devices)}")
    arr = np.asarray(devices[:tp_size])
    return Mesh(arr, ("tp",))


_LAYER_SPECS = {
    "attn_norm": P(None),
    "ffn_norm": P(None),
    # float weights (per-layer, no leading layer axis)
    "wqkv": P(None, "tp", None, None),
    "wo": P("tp", None),
    "w_gate_up": P(None, None, "tp"),
    "w_down": P("tp", None),
    # online-i8i8 weights + per-out-channel scales (contraction axis gone)
    "wqkv_q": P(None, "tp", None, None),
    "wqkv_s": P("tp", None, None),
    "wo_q": P("tp", None),
    "wo_s": P(None),
    "w_gate_up_q": P(None, None, "tp"),
    "w_gate_up_s": P(None, "tp"),
    "w_down_q": P("tp", None),
    "w_down_s": P(None),
    # qkv/o biases (InternLM): bqkv follows the kv-head split of wqkv's
    # output; bo is added after the row-parallel wo all-reduce, replicated
    "bqkv": P("tp", None, None),
    "bo": P(None),
}


def _rank_adjust(spec: P, arr: Any) -> P:
    """Fit a scale spec to the actual array rank: online_w4a8 scales
    carry one extra LEADING group axis vs the i8i8 per-out-channel
    shapes the ``_s`` specs describe ([G, ...out] vs [...out], see
    ops/quant.py:quantize_weight_int4), so prepend a replicated axis —
    otherwise the spec would shard the group axis instead of the
    out-channel one."""
    if arr is None or not hasattr(arr, "ndim"):
        return spec
    extra = arr.ndim - len(spec)
    if extra <= 0:
        return spec
    return P(*((None,) * extra + tuple(spec)))


def param_partition_specs(cfg: ModelConfig,
                          params: Optional[Dict[str, Any]] = None
                          ) -> Dict[str, Any]:
    if params is not None:
        n_layers = len(params["layers"])
        layer_keys = params["layers"][0].keys()
    else:
        n_layers = cfg.num_layers
        layer_keys = ("attn_norm", "ffn_norm", "wqkv", "wo",
                      "w_gate_up", "w_down")
    if params is not None:
        layers = [{k: _rank_adjust(_LAYER_SPECS[k], lp.get(k))
                   for k in layer_keys}
                  for lp in params["layers"]]
    else:
        layer_spec = {k: _LAYER_SPECS[k] for k in layer_keys}
        layers = [dict(layer_spec) for _ in range(n_layers)]
    top = {
        "embedding": P("tp", None),
        "layers": layers,
        "final_norm": P(None),
        "lm_head": P(None, "tp"),
        # quantized lm_head (column parallel like the float one; the
        # per-out-channel scale follows the vocab split)
        "lm_head_q": P(None, "tp"),
        "lm_head_s": P("tp"),
    }
    if params is not None:
        top = {k: (_rank_adjust(v, params[k]) if k.endswith("_s") else v)
               for k, v in top.items() if k in params}
    else:
        top.pop("lm_head_q")
        top.pop("lm_head_s")
    return top


def cache_partition_spec() -> P:
    # stacked cache [KVH, L*S, 2*shd] (packed k|v rows, layer inner):
    # shard kv heads — head-major keeps the sharded axis GSPMD-visible
    # through the flat-view scatters (ops/kv_cache.py)
    return P("tp", None, None)


def scale_partition_spec(cfg: Optional[ModelConfig] = None,
                         spec: Optional[CacheSpec] = None,
                         tp_size: int = 1) -> P:
    """Stacked packed scale rows [L*S, scale_lanes] (layer inner).

    Lane order is (head, k|v, group), so sharding the lane axis by tp
    splits whole heads — but only when each shard's lane count is a
    128-lane multiple (Mosaic DMA needs a 128-aligned local minor dim).
    Otherwise replicate: the array is tiny next to the int8 cache and
    the redundant scatter work is per-token trivial (XLA inserts a small
    all-gather of the per-token scales)."""
    if spec is not None and tp_size > 1:
        lanes_per_shard = (spec.num_kv_heads // tp_size
                           ) * spec.scale_lane_stride
        if lanes_per_shard % 128 == 0 and (
                spec.num_kv_heads * spec.scale_lane_stride
                == spec.scale_lanes):
            return P(None, "tp")
    return P(None, None)


def validate_tp(cfg: ModelConfig, tp_size: int) -> None:
    if cfg.num_kv_heads % tp_size:
        raise ValueError(
            f"num_kv_heads ({cfg.num_kv_heads}) must be divisible by "
            f"tensor_parallel_size ({tp_size})")
    if cfg.intermediate_dim % tp_size:
        raise ValueError(
            f"intermediate_dim ({cfg.intermediate_dim}) must be divisible "
            f"by tensor_parallel_size ({tp_size})")
    if cfg.vocab_size % tp_size:
        raise ValueError(
            f"vocab_size ({cfg.vocab_size}) must be divisible by "
            f"tensor_parallel_size ({tp_size})")


def shard_engine_state(mesh: Mesh, cfg: ModelConfig, spec: CacheSpec,
                       params, kv_cache, kv_scale, count_map
                       ) -> Tuple[Any, Any, Any, Any]:
    """Place engine state onto the mesh (device_put reshards on transfer,
    replacing the exporter's per-rank model_slice files, SURVEY.md E6)."""
    validate_tp(cfg, mesh.devices.size)

    def put(x, pspec):
        return jax.device_put(x, NamedSharding(mesh, pspec))

    params = jax.tree.map(put, params, param_partition_specs(cfg, params))
    kv_cache = put(kv_cache, cache_partition_spec())
    if kv_scale is not None and kv_scale.ndim == 2:
        kv_scale = put(kv_scale,
                       scale_partition_spec(cfg, spec, mesh.devices.size))
    elif kv_scale is not None:  # dummy placeholder when unquantized
        kv_scale = put(kv_scale, P(None))
    count_map = put(count_map, P(None, None))
    return params, kv_cache, kv_scale, count_map
