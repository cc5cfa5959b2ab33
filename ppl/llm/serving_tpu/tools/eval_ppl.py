#!/usr/bin/env python3
"""Perplexity evaluation through the serving forward path.

The accuracy harness for the <=0.1 perplexity-delta budget (BASELINE.md):
teacher-forced NLL over a text corpus using the SAME paged-cache forward,
kernels and quantization paths the server runs. Compare runs with
--quant-method none vs online_i8i8 (and --cache-quant-bit 0 vs 8) on the
same checkpoint.
"""

import argparse
import math
import sys

import numpy as np

from .common import add_model_args, build_configs, setup_logging, \
    add_generator_args

import jax
import jax.numpy as jnp

from ppl.llm.serving_tpu.models import llama, loader
from ppl.llm.serving_tpu.ops import kv_cache as kv_ops
from ppl.llm.serving_tpu.ops.kv_cache import CacheSpec
from ppl.llm.serving_tpu.tokenizer import create_tokenizer


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    add_model_args(parser)
    add_generator_args(parser)
    parser.add_argument("--text-file", required=True,
                        help="plain-text corpus to score")
    parser.add_argument("--seq-len", type=int, default=1024)
    parser.add_argument("--max-chunks", type=int, default=64)
    args = parser.parse_args()
    setup_logging(verbose=False)

    model_cfg, resource_cfg, gen_cfg = build_configs(args)
    tokenizer = create_tokenizer(args.model_type, resource_cfg.tokenizer_path,
                                 args.tokenizer_type)
    params = loader.load_params(model_cfg, resource_cfg.model_format,
                                resource_cfg.model_dir)
    if resource_cfg.quant_method in ("online_i8i8", "online_w4a8"):
        params = llama.quantize_model_params(
            params, resource_cfg.quant_method,
            resource_cfg.quantize_lm_head, free_originals=True)

    L = args.seq_len
    pages_per_chunk = -(-L // model_cfg.page_size)
    spec = CacheSpec(
        num_layers=model_cfg.num_layers, num_pages=pages_per_chunk,
        page_size=model_cfg.page_size, num_kv_heads=model_cfg.num_kv_heads,
        head_dim=model_cfg.head_dim, quant_bit=model_cfg.cache_quant_bit,
        quant_group=model_cfg.cache_quant_group,
        dtype=jnp.bfloat16 if model_cfg.dtype == "bfloat16"
        else jnp.float32,
        storage_head_dim=(-(-model_cfg.head_dim // 128) * 128
                          if model_cfg.head_dim % 128 and
                          resource_cfg.attention_impl in
                          ("auto", "pallas", "pallas_interpret")
                          and jax.default_backend() != "cpu" else None))
    attn = resource_cfg.attention_impl
    if attn == "auto":
        attn = "pallas" if jax.default_backend() != "cpu" else "xla"
    qimpl = resource_cfg.quant_matmul_impl
    if qimpl == "auto":
        qimpl = "pallas" if jax.default_backend() != "cpu" else "xla"
    nll_fn = jax.jit(llama.make_nll_fn(
        model_cfg, spec, quant_method=resource_cfg.quant_method,
        attn_impl=attn, quant_impl=qimpl))

    text = open(args.text_file).read()
    ids = tokenizer.encode(text)
    print(f"[INFO] {len(ids)} tokens from {args.text_file}", file=sys.stderr)

    page_table = jnp.asarray(
        np.arange(pages_per_chunk, dtype=np.int32)[None, :])
    total_nll, total_tok = 0.0, 0
    for start in range(0, max(len(ids) - 1, 1), L):
        if start // L >= args.max_chunks:
            break
        chunk = ids[start:start + L]
        if len(chunk) < 2:
            break
        padded = np.zeros(L, np.int32)
        padded[:len(chunk)] = chunk
        cache, scale = kv_ops.init_cache(spec)
        if scale is None:
            scale = jnp.zeros((1,), jnp.float32)
        nll, mask = nll_fn(params, cache, scale, jnp.asarray(padded),
                           jnp.asarray(len(chunk), jnp.int32), page_table)
        nll = np.asarray(nll)
        mask = np.asarray(mask)
        total_nll += float(nll[mask].sum())
        total_tok += int(mask.sum())

    ppl = math.exp(total_nll / max(total_tok, 1))
    print(f"[RESULT] tokens: {total_tok}  mean NLL: "
          f"{total_nll / max(total_tok, 1):.4f}  perplexity: {ppl:.4f}")


if __name__ == "__main__":
    main()
