"""Shared CLI wiring for the serving tools (flag surface mirrors
``tools/llm_server.cc:43-94`` where meaningful on TPU)."""

from __future__ import annotations

import argparse
import logging
import os
import sys


from ppl.llm.serving_tpu.config import (GeneratorConfig, ModelConfig,
                                        ResourceConfig)


def parse_tokens_list(text: str):
    """Comma-separated token-id list (``utils.cc:66-75``)."""
    if not text:
        return frozenset()
    return frozenset(int(t) for t in text.split(",") if t.strip())


def add_model_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--model-dir", default="",
                   help="HF safetensors checkpoint dir")
    p.add_argument("--model-param-path", default="",
                   help="exporter params.json (reference-compatible); "
                        "defaults to <model-dir>/config.json as HF config")
    p.add_argument("--model-format", default="hf",
                   choices=["hf", "random"])
    p.add_argument("--model-type", default="llama")
    p.add_argument("--tokenizer-path", default="")
    p.add_argument("--tokenizer-type", default=None,
                   choices=[None, "hf", "sentencepiece", "dummy"])
    p.add_argument("--dtype", default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--quant-method", default="none",
                   choices=["none", "online_i8i8", "online_w4a8"],
                   help="online_i8i8: reference-parity int8 w+a; "
                        "online_w4a8: groupwise int4 weights (g=128) x "
                        "int8 acts, halves decode weight bandwidth")
    p.add_argument("--quantize-lm-head", action="store_true",
                   help="also quantize the lm_head matmul (extension; "
                        "the reference quantizes only transformer matmuls)")
    p.add_argument("--quant-matmul-impl", default="auto",
                   choices=["auto", "xla", "pallas", "pallas_interpret"],
                   help="quantized matmul path: XLA composition or the "
                        "fused Pallas weight-streaming kernel")
    p.add_argument("--cache-quant-bit", type=int, default=None,
                   help="override KV quant (0 or 8)")
    p.add_argument("--page-size", type=int, default=128)
    p.add_argument("--cache-mode", type=int, default=1, choices=[0, 1])
    p.add_argument("--tensor-parallel-size", type=int, default=1)
    p.add_argument("--max-tokens-scale", type=float, default=0.94)
    p.add_argument("--kv-cache-max-tokens", type=int, default=0,
                   help="override auto KV pool sizing")
    p.add_argument("--multi-step", type=int, default=8,
                   help="decode-block size: N on-device steps per host "
                        "round trip (1 = per-step loop)")
    p.add_argument("--tokenizer-config-path", default="",
                   help="tokenizer_config.json for bos/eos overrides "
                        "(reference --tokenizer-config-path)")
    # TPU analogs of the reference's CUDA decoding-attention kernel
    # knobs (--configure-decoding-attn-split-k / --disable-decoding-*,
    # resource_manager.cc:74-112): kernel-variant selection flags.
    p.add_argument("--attention-impl", default="auto",
                   choices=["auto", "xla", "pallas", "pallas_interpret"],
                   help="attention path: Pallas paged kernels or XLA "
                        "reference")
    p.add_argument("--attention-seq-block", type=int, default=8,
                   help="decode-attention sequences per kernel program "
                        "(DMA overlap width)")
    p.add_argument("--sampling-top-k-cap", type=int, default=256,
                   help="candidate cap for top-k/top-p sampling (0 = "
                        "full vocab sort)")
    p.add_argument("--max-program-mb", type=int, default=768,
                   help="refuse step programs whose generated code "
                        "exceeds this (bucket-grid validation; 0 = no "
                        "limit — oversize programs have crashed the "
                        "TPU worker)")
    p.add_argument("--block-tail", default="auto",
                   choices=["auto", "on", "off"],
                   help="one fused KV scatter per multi-step block "
                        "(pallas attention only); off = per-step "
                        "scatters for A/B measurement")
    p.add_argument("--token-buckets", default="",
                   help="comma-separated prefill token-count buckets "
                        "(bounds the compiled-shape grid; default "
                        "256,512,...,8192)")
    p.add_argument("--batch-buckets", default="",
                   help="comma-separated decode batch buckets")


def add_generator_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--top-p", type=float, default=0.0)
    p.add_argument("--top-k", type=int, default=1)
    p.add_argument("--max-running-batch", type=int, default=1024)
    p.add_argument("--max-prefill-batch", type=int, default=64)
    p.add_argument("--max-tokens-per-step", type=int, default=8192)
    p.add_argument("--max-input-tokens-per-request", type=int, default=4096)
    p.add_argument("--max-output-tokens-per-request", type=int, default=4096)
    p.add_argument("--max-total-tokens-per-request", type=int, default=8192)
    p.add_argument("--max-cooldown-request", type=int, default=2)
    p.add_argument("--stop-tokens", default="",
                   help="comma-separated global stop token ids")
    p.add_argument("--special-tokens", default="",
                   help="comma-separated special token ids")
    p.add_argument("--enable-prefix-cache", action="store_true")
    p.add_argument("--enable-penalty", action="store_true")
    p.add_argument("--enable-profiling", action="store_true")
    p.add_argument("--prefill-chunk-tokens", type=int, default=0,
                   help="feed long prompts in chunks of at most N tokens "
                        "per step (0 = whole prompt in one step); bounds "
                        "per-step prefill work for flat decode latency")
    p.add_argument("--profile-step-interval", type=int, default=100,
                   help="[PERF] print cadence in loop steps (reference "
                        "prints step 1, every 100, and at drain)")
    p.add_argument("--prefill-admission-cadence", type=int, default=1,
                   help="N (default 1): after a prefill-carrying step, run "
                        "N pure-decode blocks before admitting more "
                        "prefills (keeps the block path engaged under "
                        "saturating arrivals); 0: admit every step "
                        "(reference behavior)")
    p.add_argument("--speculative-blocks", type=int, default=1,
                   help="decode-block pipeline depth (0 disables "
                        "speculative block dispatch)")
    p.add_argument("--jax-trace-dir", default="",
                   help="capture a jax.profiler device trace of generator steps 10..20 (run must reach step 20)")
    p.add_argument("--disable-log-req", action="store_true")


def apply_platform_env() -> None:
    """Honor PPL_PLATFORM=cpu|axon|tpu even though the environment's site
    hook pins JAX_PLATFORMS before our code runs.

    Also turns on the persistent XLA compilation cache for every serving
    tool: the server compiles a whole bucket grid at startup (the
    reference uploads pre-compiled pmx slices instead,
    ``resource_manager.cc:278-290``) and a tunnel-remote compile of one
    large decode block runs minutes — disk-cached, a restart replays it
    in seconds. Default dir is repo-local (survives driver cache wipes,
    see utils/compile_cache.py); PPL_COMPILE_CACHE= (empty) disables."""
    plat = os.environ.get("PPL_PLATFORM")
    import jax

    from ppl.llm.serving_tpu.utils.compile_cache import configure
    if plat:
        jax.config.update("jax_platforms", plat)
    # min-compile-time threshold lowered (1.0s -> 0.5s) so the many
    # medium bucket-grid programs are cached, not just the giant ones
    configure(jax, flavor="tpu")


def build_configs(args):
    """flags -> (ModelConfig, ResourceConfig, GeneratorConfig), with the
    reference's cross-flag rules (prefix-cache => max_prefill_batch=1,
    ``llm_server.cc:102-104``)."""
    apply_platform_env()
    if args.model_param_path:
        model_cfg = ModelConfig.from_params_json(args.model_param_path)
        model_cfg.dtype = args.dtype
    else:
        cfg_json = os.path.join(args.model_dir, "config.json")
        if args.model_format == "hf" and os.path.exists(cfg_json):
            model_cfg = ModelConfig.from_hf_config(
                cfg_json, dtype=args.dtype, cache_mode=args.cache_mode,
                page_size=args.page_size)
        else:
            raise SystemExit("need --model-param-path or a HF --model-dir")
    if args.cache_quant_bit is not None:
        model_cfg.cache_quant_bit = args.cache_quant_bit
        model_cfg.cache_quant_group = 8 if args.cache_quant_bit == 8 else 1

    resource_cfg = ResourceConfig(
        model_type=args.model_type,
        model_format=args.model_format,
        model_dir=args.model_dir,
        tokenizer_path=args.tokenizer_path or args.model_dir,
        tensor_parallel_size=args.tensor_parallel_size,
        max_tokens_scale=args.max_tokens_scale,
        kv_cache_max_tokens=args.kv_cache_max_tokens,
        max_running_batch=args.max_running_batch,
        enable_penalty=args.enable_penalty,
        quant_method=args.quant_method,
        quantize_lm_head=args.quantize_lm_head,
        quant_matmul_impl=args.quant_matmul_impl,
        multi_step=args.multi_step,
        attention_impl=args.attention_impl,
        attention_seq_block=args.attention_seq_block,
        sampling_top_k_cap=args.sampling_top_k_cap,
        max_program_bytes=args.max_program_mb << 20,
        block_tail=args.block_tail,
    )
    if getattr(args, "token_buckets", ""):
        resource_cfg.token_buckets = tuple(
            int(t) for t in args.token_buckets.split(",") if t.strip())
    if getattr(args, "batch_buckets", ""):
        resource_cfg.batch_buckets = tuple(
            int(t) for t in args.batch_buckets.split(",") if t.strip())
    max_prefill = 1 if args.enable_prefix_cache else args.max_prefill_batch
    gen_cfg = GeneratorConfig(
        top_p=args.top_p,
        profile_step_interval=args.profile_step_interval,
        top_k=args.top_k,
        enable_penalty=args.enable_penalty,
        max_running_batch=args.max_running_batch,
        max_prefill_batch=max_prefill,
        max_tokens_per_step=args.max_tokens_per_step,
        max_input_tokens_per_request=args.max_input_tokens_per_request,
        max_output_tokens_per_request=args.max_output_tokens_per_request,
        max_total_tokens_per_request=args.max_total_tokens_per_request,
        max_cooldown_request=args.max_cooldown_request,
        stop_tokens=parse_tokens_list(args.stop_tokens),
        special_tokens=parse_tokens_list(args.special_tokens),
        enable_prefix_cache=args.enable_prefix_cache,
        enable_profiling=args.enable_profiling,
        speculative_blocks=args.speculative_blocks,
        prefill_admission_cadence=args.prefill_admission_cadence,
        prefill_chunk_tokens=args.prefill_chunk_tokens,
        trace_dir=args.jax_trace_dir,
    )
    return model_cfg, resource_cfg, gen_cfg


def setup_logging(verbose: bool = True) -> None:
    logging.basicConfig(
        level=logging.INFO if verbose else logging.WARNING,
        format="%(asctime)s %(name)s %(levelname)s %(message)s")
