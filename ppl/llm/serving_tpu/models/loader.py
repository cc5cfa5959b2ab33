"""Checkpoint loading: HF safetensors -> stacked fused param pytree.

TPU-native replacement for the ppl.pmx exporter + model_slice loading
(``resource_manager.cc:278-290``, ``docs/llama_guide.md:14-36``): instead
of pre-slicing weights per TP rank on disk, weights load once into the
stacked layout of :mod:`.llama` and ``jax.device_put`` with a NamedSharding
performs the TP slicing (XLA shards on transfer; no per-rank files).
"""

from __future__ import annotations

import glob
import logging
import os
from typing import Any, Dict

import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig

logger = logging.getLogger("ppl.llm.serving_tpu.loader")


def _np_dtype(dtype: str):
    return {"bfloat16": jnp.bfloat16, "float32": np.float32,
            "float16": np.float16}[dtype]


def load_hf_safetensors(model_dir: str, cfg: ModelConfig) -> Dict[str, Any]:
    """Load a HuggingFace llama-family safetensors checkpoint directory."""
    from safetensors import safe_open

    files = sorted(glob.glob(os.path.join(model_dir, "*.safetensors")))
    if not files:
        raise FileNotFoundError(f"no safetensors files in {model_dir}")
    tensors: Dict[str, np.ndarray] = {}
    for path in files:
        with safe_open(path, framework="np") as f:
            for name in f.keys():
                tensors[name] = f.get_tensor(name)

    dtype = _np_dtype(cfg.dtype)
    L = cfg.num_layers

    def get(name, transpose=False):
        t = tensors[name]
        if t.dtype == np.uint16:  # safetensors numpy view of bf16
            t = t.view(jnp.bfloat16)
        t = np.asarray(t)
        return jnp.asarray(t.T if transpose else t, dtype=dtype)

    d, hd = cfg.hidden_dim, cfg.head_dim
    n_q, n_kv = cfg.num_heads, cfg.num_kv_heads
    g = n_q // n_kv

    def make_layer(i):
        pre = f"model.layers.{i}"
        if f"{pre}.self_attn.W_pack.weight" in tensors:
            # Baichuan fused qkv: rows are [q | k | v] stacked
            wpack = get(f"{pre}.self_attn.W_pack.weight", transpose=True)
            wq = wpack[:, :n_q * hd].reshape(d, n_kv, g, hd)
            wk = wpack[:, n_q * hd:(n_q + n_kv) * hd].reshape(d, n_kv, 1, hd)
            wv = wpack[:, (n_q + n_kv) * hd:].reshape(d, n_kv, 1, hd)
        else:
            # [D, H*hd] -> [D, KVH, G, hd]: HF q head h = kv*G + g_idx uses
            # kv head h // G, so a plain reshape lands each GQA group
            # together
            wq = get(f"{pre}.self_attn.q_proj.weight",
                     transpose=True).reshape(d, n_kv, g, hd)
            wk = get(f"{pre}.self_attn.k_proj.weight",
                     transpose=True).reshape(d, n_kv, 1, hd)
            wv = get(f"{pre}.self_attn.v_proj.weight",
                     transpose=True).reshape(d, n_kv, 1, hd)
        layer = {
            "attn_norm": get(f"{pre}.input_layernorm.weight"),
            "ffn_norm": get(
                f"{pre}.post_attention_layernorm.weight"),
            "wqkv": jnp.concatenate([wq, wk, wv], axis=2),
            "wo": get(f"{pre}.self_attn.o_proj.weight",
                      transpose=True),
            "w_gate_up": jnp.stack(
                [get(f"{pre}.mlp.gate_proj.weight",
                     transpose=True),
                 get(f"{pre}.mlp.up_proj.weight",
                     transpose=True)], axis=1),
            "w_down": get(f"{pre}.mlp.down_proj.weight",
                          transpose=True),
        }
        if cfg.attn_bias:
            # InternLM-7B qkv/o biases, repacked to the fused layout
            bq = get(f"{pre}.self_attn.q_proj.bias").reshape(n_kv, g, hd)
            bk = get(f"{pre}.self_attn.k_proj.bias").reshape(n_kv, 1, hd)
            bv = get(f"{pre}.self_attn.v_proj.bias").reshape(n_kv, 1, hd)
            layer["bqkv"] = jnp.concatenate([bq, bk, bv], axis=1)
            layer["bo"] = get(f"{pre}.self_attn.o_proj.bias")
        return layer

    embed = get("model.embed_tokens.weight")
    if cfg.tie_word_embeddings or "lm_head.weight" not in tensors:
        lm_head = embed.T
    else:
        lm_head = get("lm_head.weight", transpose=True)
    params = {
        "embedding": embed,
        "layers": [make_layer(i) for i in range(L)],
        "final_norm": get("model.norm.weight"),
        "lm_head": lm_head,
    }
    logger.info("loaded %d tensors from %s", len(tensors), model_dir)
    return params


def load_params(cfg: ModelConfig, model_format: str, model_dir: str,
                seed: int = 0) -> Dict[str, Any]:
    """Dispatch on ``model_format``: "hf" safetensors or "random" weights
    (tests/benchmarks — serving throughput is weight-value independent)."""
    if model_format == "hf":
        return load_hf_safetensors(model_dir, cfg)
    if model_format == "random":
        import jax
        from . import llama
        dtype = _np_dtype(cfg.dtype)
        return llama.init_params(cfg, jax.random.PRNGKey(seed), dtype=dtype)
    raise ValueError(f"unknown model_format {model_format}")
