#!/usr/bin/env python3
"""Library-embedding example (reference ``samples/integration-cuda``):
drive the serving engine programmatically, no gRPC involved."""

import os
import sys

# checkout convenience only — with `pip install -e .` the package
# imports resolve without this
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ppl.llm.serving_tpu.config import (GeneratorConfig, ModelConfig,
                                        ResourceConfig)
from ppl.llm.serving_tpu.connection import Connection, LocalConnection
from ppl.llm.serving_tpu.generator import LLMGenerator
from ppl.llm.serving_tpu.request import Request
from ppl.llm.serving_tpu.resources import create_engine
from ppl.llm.serving_tpu.tokenizer import create_tokenizer


def main():
    model_dir = sys.argv[1] if len(sys.argv) > 1 else None
    if model_dir:
        model_cfg = ModelConfig.from_hf_config(
            os.path.join(model_dir, "config.json"))
        resource_cfg = ResourceConfig(model_dir=model_dir,
                                      tokenizer_path=model_dir)
        tokenizer = create_tokenizer("llama", model_dir)
    else:  # tiny random demo model
        from ppl.llm.serving_tpu.tokenizer.factory import ByteTokenizer
        model_cfg = ModelConfig(
            hidden_dim=64, intermediate_dim=128, num_layers=2, num_heads=4,
            num_kv_heads=2, vocab_size=256, cache_mode=1, page_size=16,
            dtype="float32")
        resource_cfg = ResourceConfig(model_format="random",
                                      kv_cache_max_tokens=4096)
        tokenizer = ByteTokenizer()

    gen_cfg = GeneratorConfig(max_running_batch=32)
    engine, kv_max = create_engine(model_cfg, resource_cfg, gen_cfg)
    conn = LocalConnection()
    generator = LLMGenerator(model_cfg, gen_cfg, engine, tokenizer, conn,
                             kv_max)

    conn.set_wanted(1)
    generator.process(Request(id=1, prompt="Hello, TPU serving!",
                              generation_length=16, top_k=1))
    conn.wait(timeout=600)
    print("generated:", conn.text(1) or conn.tokens.get(1))
    generator.shutdown()


if __name__ == "__main__":
    main()
