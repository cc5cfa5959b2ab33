"""Resource wiring: weights -> device, KV pool sizing, engine creation.

The TPU analog of ``CudaResourceManager::Init``
(``resource_manager.cc:373-428``) minus everything NCCL/stream/per-rank:
one process creates the (optionally sharded) engine state and XLA manages
devices. The init order mirrors the reference: load weights first, measure
free memory, then size the KV pool from what is left
(``resource_manager.cc:329-362``).
"""

from __future__ import annotations

import logging
from typing import Optional, Tuple

import jax

from .config import GeneratorConfig, ModelConfig, ResourceConfig
from .engine import LLMEngine, compute_kv_cache_max_tokens
from .models import loader
from .ops.kv_cache import CacheSpec

logger = logging.getLogger("ppl.llm.serving_tpu.resources")


def create_engine(model_cfg: ModelConfig, resource_cfg: ResourceConfig,
                  gen_cfg: GeneratorConfig,
                  mesh: Optional[jax.sharding.Mesh] = None,
                  rng_seed: int = 0) -> Tuple[LLMEngine, int]:
    """Build the engine; returns (engine, kv_cache_max_tokens)."""
    model_cfg.validate()
    resource_cfg.validate()

    params = loader.load_params(model_cfg, resource_cfg.model_format,
                                resource_cfg.model_dir, seed=rng_seed)
    if resource_cfg.quant_method in ("online_i8i8", "online_w4a8"):
        from .models.llama import quantize_model_params
        params = quantize_model_params(params, resource_cfg.quant_method,
                                       resource_cfg.quantize_lm_head,
                                       free_originals=True)
    # force weights onto device before measuring free memory
    params = jax.tree.map(lambda x: x.block_until_ready()
                          if hasattr(x, "block_until_ready") else x, params)

    free = 0
    try:
        stats = jax.local_devices()[0].memory_stats()
        if stats and "bytes_limit" in stats:
            free = stats["bytes_limit"] - stats.get("bytes_in_use", 0)
    except Exception:
        pass
    kv_cache_max_tokens = compute_kv_cache_max_tokens(
        model_cfg, resource_cfg, free)
    # round down to whole pages
    page = model_cfg.page_size if model_cfg.cache_mode == 1 else 1
    kv_cache_max_tokens = max(page, kv_cache_max_tokens // page * page)
    logger.info("kv_cache_max_tokens = %d (free bytes %d)",
                kv_cache_max_tokens, free)

    # resolve the attention impl here so the cache layout matches it:
    # the Pallas kernels need the packed k|v row (2*shd lanes) to be a
    # 128-lane multiple for page DMAs -> round each half up to 64 lanes
    attn_impl = resource_cfg.attention_impl
    if attn_impl == "auto":
        attn_impl = ("pallas" if jax.default_backend() not in ("cpu",)
                     else "xla")
    resource_cfg.attention_impl = attn_impl
    storage_hd = None
    if (attn_impl in ("pallas", "pallas_interpret")
            and model_cfg.head_dim % 64):
        storage_hd = -(-model_cfg.head_dim // 64) * 64

    spec = CacheSpec(
        num_layers=model_cfg.num_layers,
        num_pages=kv_cache_max_tokens // page if model_cfg.cache_mode == 1
        else -(-kv_cache_max_tokens // model_cfg.page_size),
        page_size=model_cfg.page_size,
        num_kv_heads=model_cfg.num_kv_heads,
        head_dim=model_cfg.head_dim,
        quant_bit=model_cfg.cache_quant_bit,
        quant_group=model_cfg.cache_quant_group,
        dtype={"bfloat16": jax.numpy.bfloat16,
               "float32": jax.numpy.float32}[model_cfg.dtype],
        storage_head_dim=storage_hd,
    )
    engine = LLMEngine(
        model_cfg, resource_cfg, params, spec,
        enable_penalty=resource_cfg.enable_penalty,
        max_batch_slots=gen_cfg.max_running_batch,
        mesh=mesh, rng_seed=rng_seed,
    )
    return engine, kv_cache_max_tokens
