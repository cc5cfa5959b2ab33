#!/usr/bin/env python3
"""Quantization accuracy-delta harness (runs anywhere, CPU included).

The <=0.1 perplexity-delta budget (BASELINE.md) is defined against real
checkpoints, which this environment cannot download. This harness is the
sanctioned stopgap: it TRAINS a small byte-level LLaMA on a text corpus
(so weights and activations develop the outlier structure that actually
stresses int8/int4 quantization — random-init logits are near-uniform
and would understate the error), then scores held-out text through the
SAME serving forward (``models.llama.make_nll_fn``: paged cache, fused
matmul paths, identical quantization code) under each quant config, and
reports the perplexity delta vs the float baseline.

The reference has no accuracy harness at all; its guidance is "i8i8 is
production-blessed" (``docs/llama_guide.md``). Here the budget is
measured, per config, on every run.

Usage:
    PPL_PLATFORM=cpu python tools/eval_accuracy_delta.py \
        --train-steps 300 --json-out /tmp/acc.json
"""

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("PPL_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["PPL_PLATFORM"])

import jax.numpy as jnp
import numpy as np

from ppl.llm.serving_tpu.config import ModelConfig
from ppl.llm.serving_tpu.models import llama
from ppl.llm.serving_tpu.ops import kv_cache as kv_ops
from ppl.llm.serving_tpu.ops.kv_cache import CacheSpec

DEFAULT_TEXTS = ("README.md", "docs/performance.md", "SURVEY.md",
                 "COMPONENTS.md")


def load_corpus(paths):
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    text = ""
    for p in paths:
        fp = p if os.path.isabs(p) else os.path.join(root, p)
        if os.path.exists(fp):
            text += open(fp, encoding="utf-8").read() + "\n\n"
    return text.encode("utf-8")  # byte-level tokens, vocab 256


def train_tiny_llama(cfg: ModelConfig, data: bytes, steps: int,
                     seq_len: int, batch: int, seed: int = 0):
    """Train a byte-level HF Llama on CPU just long enough for realistic
    weight/activation distributions. Returns the torch model."""
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM
    hf_cfg = LlamaConfig(
        hidden_size=cfg.hidden_dim, intermediate_size=cfg.intermediate_dim,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        num_key_value_heads=cfg.num_kv_heads, vocab_size=cfg.vocab_size,
        rms_norm_eps=cfg.norm_eps, rope_theta=cfg.rope_theta,
        max_position_embeddings=4 * seq_len, attention_bias=False,
        tie_word_embeddings=False)
    torch.manual_seed(seed)
    model = LlamaForCausalLM(hf_cfg)
    ids = torch.tensor(np.frombuffer(data, np.uint8).astype(np.int64))
    opt = torch.optim.AdamW(model.parameters(), lr=3e-4)
    gen = torch.Generator().manual_seed(seed)
    t0 = time.time()
    for step in range(steps):
        starts = torch.randint(0, len(ids) - seq_len - 1, (batch,),
                               generator=gen)
        x = torch.stack([ids[s:s + seq_len] for s in starts])
        y = torch.stack([ids[s + 1:s + seq_len + 1] for s in starts])
        out = model(input_ids=x, labels=y)
        opt.zero_grad()
        out.loss.backward()
        opt.step()
        if step % 50 == 0 or step == steps - 1:
            print(f"[train] step {step}  loss {out.loss.item():.3f}  "
                  f"({time.time() - t0:.0f}s)", file=sys.stderr)
    model.eval()
    return model


def hf_to_params(model, cfg: ModelConfig):
    """HF torch state dict -> the serving fused pytree (same mapping the
    production loader uses for HF checkpoints, models/loader.py)."""
    sd = {k: np.asarray(v.detach(), dtype=np.float32)
          for k, v in model.state_dict().items()}
    d, hd = cfg.hidden_dim, cfg.head_dim
    n_kv, g = cfg.num_kv_heads, cfg.num_heads // cfg.num_kv_heads

    def get(name, transpose=True):
        w = sd[name]
        return jnp.asarray(w.T if transpose else w)

    def make_layer(i):
        wq = get(f"model.layers.{i}.self_attn.q_proj.weight").reshape(
            d, n_kv, g, hd)
        wk = get(f"model.layers.{i}.self_attn.k_proj.weight").reshape(
            d, n_kv, 1, hd)
        wv = get(f"model.layers.{i}.self_attn.v_proj.weight").reshape(
            d, n_kv, 1, hd)
        return {
            "attn_norm": get(f"model.layers.{i}.input_layernorm.weight",
                             transpose=False),
            "ffn_norm": get(
                f"model.layers.{i}.post_attention_layernorm.weight",
                transpose=False),
            "wqkv": jnp.concatenate([wq, wk, wv], axis=2),
            "wo": get(f"model.layers.{i}.self_attn.o_proj.weight"),
            "w_gate_up": jnp.stack(
                [get(f"model.layers.{i}.mlp.gate_proj.weight"),
                 get(f"model.layers.{i}.mlp.up_proj.weight")], axis=1),
            "w_down": get(f"model.layers.{i}.mlp.down_proj.weight"),
        }

    return {
        "embedding": jnp.asarray(sd["model.embed_tokens.weight"]),
        "layers": [make_layer(i) for i in range(cfg.num_layers)],
        "final_norm": jnp.asarray(sd["model.norm.weight"]),
        "lm_head": jnp.asarray(sd["lm_head.weight"].T),
    }


def eval_nll(cfg: ModelConfig, params, data: bytes, seq_len: int,
             max_chunks: int, quant_method: str, cache_quant: int,
             quantize_lm_head: bool, dtype: str):
    cfg = ModelConfig(**{**cfg.__dict__, "dtype": dtype,
                         "cache_quant_bit": cache_quant,
                         "cache_quant_group": 8 if cache_quant else 1})
    if quant_method != "none":
        params = llama.quantize_model_params(
            params, quant_method, quantize_lm_head, free_originals=False)
    pages = -(-seq_len // cfg.page_size)
    spec = CacheSpec(
        num_layers=cfg.num_layers, num_pages=pages,
        page_size=cfg.page_size, num_kv_heads=cfg.num_kv_heads,
        head_dim=cfg.head_dim, quant_bit=cache_quant,
        quant_group=8 if cache_quant else 1,
        dtype=jnp.bfloat16 if dtype == "bfloat16" else jnp.float32)
    nll_fn = jax.jit(llama.make_nll_fn(cfg, spec, quant_method=quant_method,
                                       attn_impl="xla", quant_impl="xla"))
    ids = np.frombuffer(data, np.uint8).astype(np.int32)
    page_table = jnp.asarray(np.arange(pages, dtype=np.int32)[None, :])
    total_nll, total_tok = 0.0, 0
    for ci in range(max_chunks):
        chunk = ids[ci * seq_len:(ci + 1) * seq_len]
        if len(chunk) < 2:
            break
        padded = np.zeros(seq_len, np.int32)
        padded[:len(chunk)] = chunk
        cache, scale = kv_ops.init_cache(spec)
        if scale is None:
            scale = jnp.zeros((1,), jnp.float32)
        nll, mask = nll_fn(params, cache, scale, jnp.asarray(padded),
                           jnp.asarray(len(chunk), jnp.int32), page_table)
        nll, mask = np.asarray(nll), np.asarray(mask)
        total_nll += float(nll[mask].sum())
        total_tok += int(mask.sum())
    mean = total_nll / max(total_tok, 1)
    return mean, math.exp(mean), total_tok


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--hidden", type=int, default=256)
    p.add_argument("--layers", type=int, default=4)
    p.add_argument("--heads", type=int, default=8)
    p.add_argument("--kv-heads", type=int, default=4)
    p.add_argument("--intermediate", type=int, default=512)
    p.add_argument("--train-steps", type=int, default=300)
    p.add_argument("--seq-len", type=int, default=256)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--eval-chunks", type=int, default=32)
    p.add_argument("--text-files", nargs="*", default=list(DEFAULT_TEXTS))
    p.add_argument("--json-out", default="")
    args = p.parse_args()

    cfg = ModelConfig(
        hidden_dim=args.hidden, intermediate_dim=args.intermediate,
        num_layers=args.layers, num_heads=args.heads,
        num_kv_heads=args.kv_heads, vocab_size=256, norm_eps=1e-5,
        rope_theta=10000.0, cache_mode=1, page_size=16, dtype="float32")

    data = load_corpus(args.text_files)
    split = int(len(data) * 0.9)
    train, heldout = data[:split], data[split:]
    print(f"[INFO] corpus {len(data)} bytes ({split} train / "
          f"{len(heldout)} heldout)", file=sys.stderr)
    model = train_tiny_llama(cfg, train, args.train_steps, args.seq_len,
                             args.batch)
    params = hf_to_params(model, cfg)

    configs = [
        ("fp32", dict(quant_method="none", cache_quant=0,
                      quantize_lm_head=False, dtype="float32")),
        ("bf16", dict(quant_method="none", cache_quant=0,
                      quantize_lm_head=False, dtype="bfloat16")),
        ("bf16+kv8", dict(quant_method="none", cache_quant=8,
                          quantize_lm_head=False, dtype="bfloat16")),
        ("i8i8+kv8", dict(quant_method="online_i8i8", cache_quant=8,
                          quantize_lm_head=False, dtype="bfloat16")),
        ("i8i8+kv8+qhead", dict(quant_method="online_i8i8", cache_quant=8,
                                quantize_lm_head=True, dtype="bfloat16")),
        ("w4a8+kv8", dict(quant_method="online_w4a8", cache_quant=8,
                          quantize_lm_head=False, dtype="bfloat16")),
    ]
    results = {}
    base_ppl = None
    print(f"\n{'config':<16} {'mean NLL':>9} {'ppl':>8} {'dppl':>7}")
    for name, kw in configs:
        mean, ppl, ntok = eval_nll(cfg, params, heldout, args.seq_len,
                                   args.eval_chunks, **kw)
        if base_ppl is None:
            base_ppl = ppl
        results[name] = {"mean_nll": mean, "ppl": ppl,
                         "delta_ppl": ppl - base_ppl, "tokens": ntok}
        print(f"{name:<16} {mean:>9.4f} {ppl:>8.4f} "
              f"{ppl - base_ppl:>+7.4f}")

    budget = 0.1
    worst = max(r["delta_ppl"] for r in results.values())
    verdict = "PASS" if worst <= budget else "FAIL"
    print(f"\n[RESULT] worst delta_ppl {worst:+.4f} vs budget "
          f"{budget} -> {verdict}")
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump({"results": results, "worst_delta_ppl": worst,
                       "budget": budget, "verdict": verdict,
                       "model": cfg.__dict__,
                       "train_steps": args.train_steps}, f, indent=1)
    sys.exit(0 if verdict == "PASS" else 1)


if __name__ == "__main__":
    main()
