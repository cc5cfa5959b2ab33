"""Configuration objects.

Mirrors the reference's three-layer config design
(``src/common/config.h:27-85``, ``src/common/config.cc:31-148``):

- :class:`ModelConfig` is parsed from the exporter's ``params.json`` with the
  same mandatory/optional key behavior as ``ParseModelConfig``
  (``config.cc:31-148``), or converted from a HuggingFace ``config.json``.
- :class:`GeneratorConfig` carries scheduler budgets and sampling defaults
  (``config.h:49-64``).
- :class:`ResourceConfig` carries model paths and device-level knobs
  (``config.h:27-47``); CUDA engine toggles are replaced by TPU-native
  equivalents (bucket tables, kernel-variant selection, mesh shape).
"""

from __future__ import annotations

import dataclasses
import json
from typing import Sequence


class ConfigError(ValueError):
    pass


@dataclasses.dataclass
class ModelConfig:
    """Model architecture + KV cache format.

    Field names follow the reference ``ModelConfig`` (``config.h:66-85``) so
    the exporter's ``params.json`` round-trips. TPU-only fields (head_dim,
    rope_theta, ...) extend it for the pure-JAX model graph.
    """

    hidden_dim: int = 0
    intermediate_dim: int = 0
    num_layers: int = 0
    num_heads: int = 0
    num_kv_heads: int = 0
    vocab_size: int = 0

    norm_eps: float = 1e-5
    rope_theta: float = 10000.0
    max_position_embeddings: int = 4096

    # KV cache quantization: (8, 8) = int8 with one scale per group of 8
    # elements along head_dim; (0, 1) = unquantized (config.h:75-76,
    # llm_generator.cc:131-137 accepts exactly these two combinations).
    cache_quant_bit: int = 0
    cache_quant_group: int = 1

    # cache_layout is accepted for params.json compat but the TPU engine uses
    # a single canonical paged layout chosen for the Pallas attention kernel
    # (SURVEY.md section 7.3: "pick one, don't port all four").
    cache_layout: int = 0
    cache_mode: int = 1  # 0 = linear slots, 1 = paged
    page_size: int = 128

    dynamic_batching: bool = True
    auto_causal: bool = True

    # TPU additions
    model_type: str = "llama"
    dtype: str = "bfloat16"
    tie_word_embeddings: bool = False
    # Model-family variations (one parameterized llama-family graph covers
    # the reference's model zoo — llama/llama3/internlm/baichuan — instead
    # of per-model ONNX exports):
    #   attn_bias: qkv/o projection biases (InternLM-7B).
    #   position_encoding: "rope" | "alibi" (Baichuan-13B uses ALiBi).
    attn_bias: bool = False
    position_encoding: str = "rope"

    @property
    def head_dim(self) -> int:
        return self.hidden_dim // self.num_heads

    def validate(self) -> None:
        """Engine-level invariants checked at generator init
        (``llm_generator.cc:114-144``)."""
        if not self.auto_causal:
            raise ConfigError("only auto_causal=True is supported")
        if self.cache_mode not in (0, 1):
            raise ConfigError(f"invalid cache_mode {self.cache_mode}")
        if (self.cache_quant_bit, self.cache_quant_group) not in ((8, 8), (0, 1)):
            raise ConfigError(
                "(cache_quant_bit, cache_quant_group) must be (8, 8) or (0, 1), "
                f"got ({self.cache_quant_bit}, {self.cache_quant_group})"
            )
        if not self.dynamic_batching:
            raise ConfigError("only dynamic_batching=True is supported")
        if self.num_heads % max(self.num_kv_heads, 1) != 0:
            raise ConfigError("num_heads must be a multiple of num_kv_heads")
        if self.hidden_dim % max(self.num_heads, 1) != 0:
            raise ConfigError("hidden_dim must be divisible by num_heads")
        if self.position_encoding not in ("rope", "alibi"):
            raise ConfigError(
                f"unknown position_encoding {self.position_encoding}")

    @classmethod
    def from_params_json(cls, path: str) -> "ModelConfig":
        """Parse an exporter ``params.json``.

        Key-by-key compatible with ``ParseModelConfig`` (``config.cc:31-148``):
        all keys mandatory except ``num_kv_heads`` (defaults to ``num_heads``)
        and ``page_size`` (mandatory only when ``cache_mode == 1``).
        """
        with open(path) as f:
            doc = json.load(f)
        required = [
            "num_heads", "num_layers", "hidden_dim", "intermediate_dim",
            "vocab_size", "cache_quant_bit", "cache_quant_group",
            "cache_layout", "cache_mode", "dynamic_batching", "auto_causal",
        ]
        for key in required:
            if key not in doc:
                raise ConfigError(f"find key [{key}] failed")
        cfg = cls(
            num_heads=int(doc["num_heads"]),
            num_kv_heads=int(doc.get("num_kv_heads", doc["num_heads"])),
            num_layers=int(doc["num_layers"]),
            hidden_dim=int(doc["hidden_dim"]),
            intermediate_dim=int(doc["intermediate_dim"]),
            vocab_size=int(doc["vocab_size"]),
            cache_quant_bit=int(doc["cache_quant_bit"]),
            cache_quant_group=int(doc["cache_quant_group"]),
            cache_layout=int(doc["cache_layout"]),
            cache_mode=int(doc["cache_mode"]),
            dynamic_batching=bool(doc["dynamic_batching"]),
            auto_causal=bool(doc["auto_causal"]),
        )
        if cfg.cache_mode == 1:
            if "page_size" not in doc:
                raise ConfigError("find key [page_size] failed")
            cfg.page_size = int(doc["page_size"])
        # optional TPU extensions if present
        for key in ("norm_eps", "rope_theta", "max_position_embeddings",
                    "model_type", "dtype", "tie_word_embeddings",
                    "attn_bias", "position_encoding"):
            if key in doc:
                setattr(cfg, key, doc[key])
        return cfg

    @classmethod
    def from_hf_config(cls, path: str, **overrides) -> "ModelConfig":
        """Build from a HuggingFace ``config.json`` (llama-family)."""
        with open(path) as f:
            doc = json.load(f)
        cfg = cls(
            num_heads=int(doc["num_attention_heads"]),
            num_kv_heads=int(doc.get("num_key_value_heads",
                                     doc["num_attention_heads"])),
            num_layers=int(doc["num_hidden_layers"]),
            hidden_dim=int(doc["hidden_size"]),
            intermediate_dim=int(doc["intermediate_size"]),
            vocab_size=int(doc["vocab_size"]),
            norm_eps=float(doc.get("rms_norm_eps", 1e-5)),
            rope_theta=float(doc.get("rope_theta", 10000.0)),
            max_position_embeddings=int(doc.get("max_position_embeddings", 4096)),
            model_type=str(doc.get("model_type", "llama")),
            tie_word_embeddings=bool(doc.get("tie_word_embeddings", False)),
        )
        # family-specific mappings
        if cfg.model_type == "internlm":
            cfg.attn_bias = bool(doc.get("bias", False))
        if cfg.model_type == "baichuan":
            # Baichuan-7B uses RoPE; Baichuan-13B uses ALiBi. The HF
            # config carries no explicit flag, so follow the family
            # convention (13B = 40 layers) unless the config says
            # otherwise via "position_embedding".
            pe = str(doc.get("position_embedding", "")).lower()
            if pe in ("alibi", "rope"):
                cfg.position_encoding = pe
            elif cfg.num_layers >= 40:
                cfg.position_encoding = "alibi"
        for key, val in overrides.items():
            setattr(cfg, key, val)
        return cfg

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)


@dataclasses.dataclass
class GeneratorConfig:
    """Scheduler budgets + sampling defaults (``config.h:49-64``)."""

    top_p: float = 0.0
    top_k: int = 1
    enable_penalty: bool = False
    max_running_batch: int = 1024
    max_input_tokens_per_request: int = 4096
    max_output_tokens_per_request: int = 4096
    max_total_tokens_per_request: int = 8192
    max_tokens_per_step: int = 8192
    stop_tokens: frozenset = frozenset()
    special_tokens: frozenset = frozenset()
    max_cooldown_request: int = 2
    enable_prefix_cache: bool = False
    max_prefill_batch: int = 64
    # Decode-block pipeline depth: how many further decode blocks may be
    # speculatively dispatched (device-fed tokens) beyond the one in
    # flight. Depth d trades up to d*multi_step steps of post-finish
    # waste for keeping the device fed when per-block host work exceeds
    # device block time. 0 disables speculation. Depth 2 is correct
    # (CPU-verified token-identical) but measured pathological through
    # the tunneled single-chip runtime, which appears to block the third
    # in-flight dispatch on pending donated buffers; revisit on directly
    # attached chips.
    speculative_blocks: int = 1
    # Prefill admission cadence (TPU scheduling; active when decode
    # blocks are on): after a step that carried prefill rows, run N
    # full pure-decode blocks before admitting more prefills (0 = off).
    # Under saturating arrivals (the canonical rate=inf benchmark) a
    # pending prefill otherwise exists at EVERY step, so the engine
    # degrades to single-step mixed programs — one host/tunnel round
    # trip per token (measured: 476 tok/s vs the block path's
    # thousands; decode per-token p75 186 ms vs ~6 ms). The reference
    # admits every step (its CUDA loop is per-token anyway,
    # llm_generator.cc:596-604); on TPU the block path IS the
    # throughput, so admission alternates with it. TTFT cost: bounded
    # by max(N, speculative_blocks) blocks (~N x multi_step x step).
    prefill_admission_cadence: int = 1
    enable_profiling: bool = False
    # profiler print cadence (loop steps); the reference prints on step 1,
    # every 100 steps, and at drain (llm_generator.cc:768-780). Set to 1
    # for per-step stage attribution when chasing wave-time structure.
    profile_step_interval: int = 100
    # device tracing: capture a jax.profiler trace of steps
    # [trace_start_step, trace_start_step + trace_num_steps) into trace_dir
    trace_dir: str = ""
    trace_start_step: int = 10
    trace_num_steps: int = 10
    # Chunked prefill (TPU extension; 0 = off): feed long prompts in
    # chunks of at most N tokens per step, bounding per-step prefill work
    # so decode latency stays flat while long prompts stream in. The
    # sampled token of a non-final chunk is discarded (the engine's
    # prefix-hit prefill path makes chunk steps exact). Incompatible with
    # the prefix cache: pages are published to the cache at admission but
    # chunked KV fills over several steps, so a concurrent hit could read
    # unwritten pages.
    prefill_chunk_tokens: int = 0

    def validate(self) -> None:
        if self.max_running_batch <= 0:
            raise ConfigError("max_running_batch must be > 0")
        if self.prefill_chunk_tokens < 0:
            raise ConfigError("prefill_chunk_tokens must be >= 0")
        if self.prefill_chunk_tokens == 1:
            # A 1-token chunk is indistinguishable from a decode row in
            # the engine's build_plan split; require >= 2.
            raise ConfigError("prefill_chunk_tokens must be 0 or >= 2")
        if (self.prefill_chunk_tokens
                and self.prefill_chunk_tokens > self.max_tokens_per_step):
            # Otherwise a prompt longer than the step budget has admission
            # cost min(first_fill, chunk) > max_tokens_per_step and waits
            # in the pending queue forever.
            raise ConfigError(
                "prefill_chunk_tokens must be <= max_tokens_per_step")
        if self.prefill_chunk_tokens and self.enable_prefix_cache:
            raise ConfigError(
                "prefill_chunk_tokens is incompatible with the prefix "
                "cache (chunked KV fills over several steps)")
        if (self.max_tokens_per_step < self.max_input_tokens_per_request
                and not self.prefill_chunk_tokens):
            raise ConfigError(
                "max_tokens_per_step must be >= max_input_tokens_per_request"
            )


@dataclasses.dataclass
class ResourceConfig:
    """Model location + device resources (``config.h:27-47``).

    The CUDA engine knobs (cublas layout, decoding-attention variants,
    NCCL) are replaced with TPU equivalents: mesh shape, bucket tables,
    quantization method, and KV pool sizing.
    """

    model_type: str = "llama"
    model_format: str = "hf"  # "hf" safetensors dir | "random" (tests/bench)
    model_dir: str = ""
    model_param_path: str = ""
    tokenizer_path: str = ""

    tensor_parallel_size: int = 1
    data_parallel_size: int = 1

    # Fraction of post-weights device memory given to the KV pool
    # (max_tokens_scale, resource_manager.cc:334-341).
    max_tokens_scale: float = 0.94
    # Explicit override for total KV tokens; 0 = auto-size from device memory.
    kv_cache_max_tokens: int = 0

    max_running_batch: int = 1024
    enable_penalty: bool = False

    quant_method: str = "none"  # "none" | "online_i8i8" | "online_w4a8" (int4 weights, g=128)
    # Also quantize the lm_head (per-out-channel int8 / group int4).
    # Off by default: the reference quantizes only transformer matmuls;
    # at b64 decode the bf16 lm_head is ~24% of w4-config weight bytes.
    quantize_lm_head: bool = False
    # i8i8 matmul implementation: "xla" composes quant + int8 dot_general
    # in XLA; "pallas" uses the fused weight-streaming kernel
    # (ops/pallas/quant_matmul.py). "auto" follows the backend like
    # attention_impl.
    quant_matmul_impl: str = "auto"  # "auto"|"xla"|"pallas"|"pallas_interpret"

    # Step-shape bucketing (TPU replacement for dynamic ragged shapes):
    # token counts and batch sizes are padded up to these bucket boundaries so
    # each (token_bucket, batch_bucket) pair compiles exactly once.
    token_buckets: Sequence[int] = (256, 512, 1024, 2048, 4096, 8192)
    batch_buckets: Sequence[int] = (8, 16, 32, 64, 128, 256)

    # Attention kernel-variant selection (TPU analog of the reference's
    # decoding-attention engine knobs, resource_manager.cc:74-112).
    attention_impl: str = "auto"  # "auto" | "xla" | "pallas" | "pallas_interpret"
    # Sequences per decode-kernel program: each page phase fires the
    # whole block's DMAs before waiting, hiding DMA latency (TPU grids
    # run sequentially). The analog of the reference's decoding-attn
    # thread-per-block knob (ENGINE_CONF_DECODING_ATTN_TPB).
    # Swept on v5e at b64/TinyLlama: 4 -> 9504, 8 -> 10047 tok/s,
    # 16 -> collapse (VMEM spill); 8 is the default.
    attention_seq_block: int = 8

    # Sampling candidate-set cap: top-k/top-p sample from the EXACT
    # top-cap logits (approx_max_k at recall_target=1.0) instead of a
    # full-vocab sort (exact for top_k <= cap; standard truncation for
    # top_p). 0 = exact full sort.
    sampling_top_k_cap: int = 256

    # Bucket-grid validation refuses any step program whose generated
    # code exceeds this many bytes (0 = no limit). The python-unrolled
    # decode block makes program size scale with steps x layers (x
    # batch tiling): at bd=128 a ~981 MB TinyLlama block executable
    # crashed the TPU worker process on three round-4 runs ("TPU worker
    # process crashed or restarted") — a size the device demonstrably
    # cannot run must fail the BUCKET at startup, not the serving loop.
    max_program_bytes: int = 768 * 1024 * 1024

    # Decode-only phases run blocks of up to N on-device steps with
    # sampled tokens feeding back inside one jitted program (lax.scan),
    # so the host fetches tokens once per block instead of per step.
    # Trade-off: stop-token finishes lag up to N-1 steps (wasted decode)
    # and new requests join at block boundaries (TTFT += block time).
    # 1 = reference-style per-step loop.
    multi_step: int = 8

    # Block-tail decode attention (pallas only): the multi-step block's
    # own K/V rides a dense side buffer the decode kernel reads as an
    # extra phase, and the paged cache takes ONE fused scatter per block
    # instead of per step. Hardware A/B (BASELINE.md round 3): LOSES
    # 5.3% at 7B b32 and ~3% at TinyLlama b64 — the per-step fused
    # scatter is 0.02-0.09 ms/step at 7B geometry, cheaper than the
    # extra kernel phase + side-buffer maintenance. "auto" (default) =
    # per-step scatters; "on" keeps the mode for experiments.
    block_tail: str = "auto"  # "auto"(=off) | "on" | "off"

    def validate(self) -> None:
        if self.tensor_parallel_size < 1 or (
            self.tensor_parallel_size & (self.tensor_parallel_size - 1)
        ):
            raise ConfigError("tensor_parallel_size must be a power of 2")
        if self.quant_method not in ("none", "online_i8i8",
                                     "online_w4a8"):
            raise ConfigError(f"unknown quant_method {self.quant_method}")
        if (self.quant_method == "online_w4a8"
                and self.tensor_parallel_size > 1):
            # the int4 nibble pairing strides D/2 across the FULL
            # contraction axis; row-parallel tp shards would unpack to
            # non-contiguous row sets. Repack-per-shard is future work.
            raise ConfigError("online_w4a8 currently requires "
                              "tensor_parallel_size == 1")
        if self.quant_matmul_impl not in ("auto", "xla", "pallas",
                                          "pallas_interpret"):
            raise ConfigError(
                f"unknown quant_matmul_impl {self.quant_matmul_impl}")
        if self.block_tail not in ("auto", "on", "off"):
            raise ConfigError(f"unknown block_tail {self.block_tail}")
        if self.quantize_lm_head and self.quant_method == "none":
            # otherwise the flag is silently ignored (the quantize branch
            # only runs for online_i8i8 / online_w4a8)
            raise ConfigError(
                "quantize_lm_head requires quant_method online_i8i8 "
                "or online_w4a8")
