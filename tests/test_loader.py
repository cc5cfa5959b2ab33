"""Checkpoint loader: HF safetensors directory -> fused pytree, verified
against the in-test torch conversion used by the numerics tests."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ppl.llm.serving_tpu.config import ModelConfig
from ppl.llm.serving_tpu.models import loader


@pytest.fixture(scope="module")
def hf_checkpoint(tmp_path_factory):
    torch = pytest.importorskip("torch")
    from safetensors.torch import save_file
    from transformers import LlamaConfig, LlamaForCausalLM

    d = tmp_path_factory.mktemp("ckpt")
    hf_cfg = LlamaConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, vocab_size=96,
        rms_norm_eps=1e-5, tie_word_embeddings=False, attention_bias=False)
    torch.manual_seed(1)
    model = LlamaForCausalLM(hf_cfg).eval()
    sd = {k: v.contiguous() for k, v in model.state_dict().items()}
    save_file(sd, str(d / "model.safetensors"))
    (d / "config.json").write_text(json.dumps({
        "hidden_size": 64, "intermediate_size": 128, "num_hidden_layers": 2,
        "num_attention_heads": 4, "num_key_value_heads": 2, "vocab_size": 96,
        "rms_norm_eps": 1e-5, "rope_theta": 10000.0,
        "max_position_embeddings": 128, "model_type": "llama",
        "tie_word_embeddings": False,
    }))
    return d, model


def test_load_hf_safetensors(hf_checkpoint):
    d, model = hf_checkpoint
    cfg = ModelConfig.from_hf_config(str(d / "config.json"), dtype="float32")
    params = loader.load_hf_safetensors(str(d), cfg)
    assert params["embedding"].shape == (96, 64)
    assert len(params["layers"]) == 2
    assert params["layers"][0]["wqkv"].shape == (64, 2, 4, 16)
    assert params["layers"][0]["w_gate_up"].shape == (64, 2, 128)
    # spot-check numerical equality against the torch weights
    q0 = np.asarray(model.model.layers[0].self_attn.q_proj.weight.detach())
    got = np.asarray(params["layers"][0]["wqkv"][:, :, :2, :])  # G=2 q cols
    np.testing.assert_allclose(got.reshape(64, 4 * 16), q0.T, atol=1e-6)
    k0 = np.asarray(model.model.layers[0].self_attn.k_proj.weight.detach())
    gotk = np.asarray(params["layers"][0]["wqkv"][:, :, 2, :])
    np.testing.assert_allclose(gotk.reshape(64, 2 * 16), k0.T, atol=1e-6)


def test_loaded_model_matches_hf_forward(hf_checkpoint):
    """Full path: load from disk, run the step, compare logits with HF."""
    import torch
    from ppl.llm.serving_tpu.models import llama
    from ppl.llm.serving_tpu.ops import kv_cache as kv_ops
    from ppl.llm.serving_tpu.ops.kv_cache import CacheSpec
    from ppl.llm.serving_tpu.ops import sampling as S

    d, model = hf_checkpoint
    cfg = ModelConfig.from_hf_config(str(d / "config.json"), dtype="float32",
                                     cache_mode=1, page_size=16)
    params = loader.load_hf_safetensors(str(d), cfg)
    spec = CacheSpec(num_layers=2, num_pages=8, page_size=16,
                     num_kv_heads=2, head_dim=16, dtype=jnp.float32)
    step = llama.make_step_fn(cfg, spec, return_logits=True)
    cache, _ = kv_ops.init_cache(spec)

    seq = np.array([5, 17, 31, 44, 2, 9, 80, 13])
    pt = np.full((1, 2), spec.trash_page, np.int32)
    pt[0, 0] = 0
    padded = np.zeros((1, 16), np.int32)
    padded[0, :8] = seq
    inp = llama.StepInput(
        decode_tokens=jnp.zeros((0,), jnp.int32),
        decode_pos=jnp.zeros((0,), jnp.int32),
        prefill_tokens=jnp.asarray(padded),
        prefill_start=jnp.zeros(1, jnp.int32),
        prefill_len=jnp.array([8], jnp.int32),
        page_table=jnp.asarray(pt),
        context_len=jnp.array([8], jnp.int32),
        batch_slots=jnp.zeros(1, jnp.int32),
        sampling=S.SamplingParams(
            temperature=jnp.ones(1), top_k=jnp.ones(1, jnp.int32),
            top_p=jnp.zeros(1), do_sample=jnp.zeros(1, bool),
            repetition_penalty=jnp.ones(1), presence_penalty=jnp.zeros(1),
            frequency_penalty=jnp.zeros(1)),
    )
    out = step(params, cache, [jnp.zeros((1,), jnp.float32) for _ in range(2)],
               jnp.zeros((1, 1), jnp.int32), inp, jax.random.PRNGKey(0))
    with torch.no_grad():
        hf_logits = model(torch.tensor(seq[None])).logits[0, -1].numpy()
    np.testing.assert_allclose(np.asarray(out.logits[0]), hf_logits,
                               atol=2e-4, rtol=1e-4)
