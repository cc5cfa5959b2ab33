"""TPU-native quantized LLM serving engine.

A brand-new JAX/XLA/Pallas/pjit serving framework with the capabilities of
OpenPPL's ``ppl.llm.serving`` (continuous batching, paged + linear KV cache,
refcounted LRU prefix cache, i8i8 quantized matmuls, group-quantized INT8 KV
attention, streaming gRPC generation) designed TPU-first:

- all compute is jitted with static bucketed shapes (no per-step recompiles),
- the KV cache is a device-resident paged pool updated in-place via donation,
- tensor parallelism is expressed with ``jax.sharding`` meshes and XLA
  collectives over ICI/DCN rather than NCCL,
- hot kernels (quantized matmul, paged attention) are Pallas TPU kernels.

Layer map (mirrors the reference layer map in SURVEY.md section 1):

    tools/                 CLI: llm_server, offline_inference, benchmarks
    serving/               gRPC frontend (wire-compatible llm.proto)
    generator.py           continuous-batching decode loop (scheduler brain)
    engine.py              jitted step dispatch, bucketing, device I/O
    models/                pure-JAX decoder graphs (LLaMA family)
    ops/                   Pallas kernels + XLA reference ops
    parallel/              device meshes, shardings, multi-host init
    utils/                 host-side data structures (allocators, caches)
    tokenizer/             HF/sentencepiece tokenizers + model BOS policies
"""

__version__ = "0.1.0"
