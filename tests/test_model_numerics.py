"""End-to-end numerics: the fused step function vs HuggingFace transformers
LlamaForCausalLM (torch CPU) on a tiny random model.

Replaces the reference's eyeball-the-answers integration test
(``offline_inference.cc:304-309``) with exact logit comparison.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ppl.llm.serving_tpu.config import ModelConfig
from ppl.llm.serving_tpu.models import llama
from ppl.llm.serving_tpu.ops import kv_cache as kv_ops
from ppl.llm.serving_tpu.ops import sampling as S
from ppl.llm.serving_tpu.ops.kv_cache import CacheSpec

CFG = ModelConfig(
    hidden_dim=64, intermediate_dim=128, num_layers=2, num_heads=4,
    num_kv_heads=2, vocab_size=96, norm_eps=1e-5, rope_theta=10000.0,
    cache_mode=1, page_size=16, dtype="float32",
)
SPEC = CacheSpec(num_layers=2, num_pages=16, page_size=16, num_kv_heads=2,
                 head_dim=16, dtype=jnp.float32)


@pytest.fixture(scope="module")
def hf_model():
    torch = pytest.importorskip("torch")
    from transformers import LlamaConfig, LlamaForCausalLM
    hf_cfg = LlamaConfig(
        hidden_size=CFG.hidden_dim, intermediate_size=CFG.intermediate_dim,
        num_hidden_layers=CFG.num_layers, num_attention_heads=CFG.num_heads,
        num_key_value_heads=CFG.num_kv_heads, vocab_size=CFG.vocab_size,
        rms_norm_eps=CFG.norm_eps, rope_theta=CFG.rope_theta,
        max_position_embeddings=256, attention_bias=False, tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    model = LlamaForCausalLM(hf_cfg).eval()
    return model


def hf_to_params(model):
    """Convert HF torch weights to the per-layer fused pytree."""
    sd = {k: np.asarray(v.detach(), dtype=np.float32)
          for k, v in model.state_dict().items()}
    d, hd = CFG.hidden_dim, CFG.head_dim
    n_kv, g = CFG.num_kv_heads, CFG.num_heads // CFG.num_kv_heads

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
        "layers": [make_layer(i) for i in range(CFG.num_layers)],
        "final_norm": jnp.asarray(sd["model.norm.weight"]),
        "lm_head": jnp.asarray(sd["lm_head.weight"].T),
    }


def greedy_params(b):
    return S.SamplingParams(
        temperature=jnp.ones(b), top_k=jnp.ones(b, jnp.int32),
        top_p=jnp.zeros(b), do_sample=jnp.zeros(b, bool),
        repetition_penalty=jnp.ones(b), presence_penalty=jnp.zeros(b),
        frequency_penalty=jnp.zeros(b))


def make_prefill_input(tokens, pages, qp, kvp, start=0):
    """One prefill row, no decode rows."""
    n = len(tokens)
    pt = np.full((1, kvp), SPEC.trash_page, np.int32)
    pt[0, :len(pages)] = pages
    padded = np.zeros((1, qp), np.int32)
    padded[0, :n] = tokens
    return llama.StepInput(
        decode_tokens=jnp.zeros((0,), jnp.int32),
        decode_pos=jnp.zeros((0,), jnp.int32),
        prefill_tokens=jnp.asarray(padded),
        prefill_start=jnp.array([start], jnp.int32),
        prefill_len=jnp.array([n], jnp.int32),
        page_table=jnp.asarray(pt),
        context_len=jnp.array([start + n], jnp.int32),
        batch_slots=jnp.zeros(1, jnp.int32),
        sampling=greedy_params(1),
    )


def make_decode_input(token, pos, pages, kvp):
    pt = np.full((1, kvp), SPEC.trash_page, np.int32)
    pt[0, :len(pages)] = pages
    return llama.StepInput(
        decode_tokens=jnp.array([token], jnp.int32),
        decode_pos=jnp.array([pos], jnp.int32),
        prefill_tokens=jnp.zeros((0, 8), jnp.int32),
        prefill_start=jnp.zeros((0,), jnp.int32),
        prefill_len=jnp.zeros((0,), jnp.int32),
        page_table=jnp.asarray(pt),
        context_len=jnp.array([pos + 1], jnp.int32),
        batch_slots=jnp.zeros(1, jnp.int32),
        sampling=greedy_params(1),
    )


@pytest.fixture(scope="module")
def ref_logits(hf_model):
    """HF logits for a fixed 20-token sequence: [S, V]."""
    import torch
    rng = np.random.RandomState(42)
    seq = rng.randint(0, CFG.vocab_size, size=20)
    with torch.no_grad():
        out = hf_model(torch.tensor(seq[None])).logits[0].numpy()
    return seq, out


def test_prefill_matches_hf(hf_model, ref_logits):
    seq, hf_out = ref_logits
    params = hf_to_params(hf_model)
    step = llama.make_step_fn(CFG, SPEC, return_logits=True)
    cache, _ = kv_ops.init_cache(SPEC)
    scale = [jnp.zeros((1,), jnp.float32) for _ in range(SPEC.num_layers)]
    cm = jnp.zeros((1, 1), jnp.int32)
    inp = make_prefill_input(seq, pages=[0, 1], qp=32, kvp=4)
    out = step(params, cache, scale, cm, inp, jax.random.PRNGKey(0))
    np.testing.assert_allclose(out.logits[0], hf_out[-1], atol=2e-4,
                               rtol=1e-4)
    # greedy token matches
    assert int(out.tokens[0]) == int(hf_out[-1].argmax())


def test_prefill_then_decode_matches_hf(hf_model, ref_logits):
    seq, hf_out = ref_logits
    params = hf_to_params(hf_model)
    step = llama.make_step_fn(CFG, SPEC, return_logits=True)
    cache, _ = kv_ops.init_cache(SPEC)
    scale = [jnp.zeros((1,), jnp.float32) for _ in range(SPEC.num_layers)]
    cm = jnp.zeros((1, 1), jnp.int32)

    # prefill the first 10 tokens, then decode tokens 10..19 one by one,
    # comparing each step's logits to HF's full-sequence teacher forcing
    n0 = 10
    inp = make_prefill_input(seq[:n0], pages=[0, 1], qp=16, kvp=4)
    out = step(params, cache, scale, cm, inp, jax.random.PRNGKey(0))
    cache = out.kv_cache
    np.testing.assert_allclose(out.logits[0], hf_out[n0 - 1], atol=2e-4,
                               rtol=1e-4)
    for t in range(n0, 20):
        inp = make_decode_input(seq[t], pos=t, pages=[0, 1], kvp=4)
        out = step(params, cache, out.kv_scale, cm, inp,
                   jax.random.PRNGKey(t))
        cache = out.kv_cache
        np.testing.assert_allclose(out.logits[0], hf_out[t], atol=3e-4,
                                   rtol=1e-4)


def test_prefix_hit_prefill_matches(hf_model, ref_logits):
    """start > 0 prefill (prefix-cache continuation) must equal a full
    prefill — the CACHE_PREFILL-equivalent path (llm_engine.cc:114)."""
    seq, hf_out = ref_logits
    params = hf_to_params(hf_model)
    step = llama.make_step_fn(CFG, SPEC, return_logits=True)
    cache, _ = kv_ops.init_cache(SPEC)
    scale = [jnp.zeros((1,), jnp.float32) for _ in range(SPEC.num_layers)]
    cm = jnp.zeros((1, 1), jnp.int32)
    # first 16 tokens = one full page "cached" via a normal prefill
    inp = make_prefill_input(seq[:16], pages=[0, 1], qp=16, kvp=4)
    out = step(params, cache, scale, cm, inp, jax.random.PRNGKey(0))
    # suffix prefill of tokens 16..19 at start=16
    inp2 = make_prefill_input(seq[16:20], pages=[0, 1], qp=8, kvp=4, start=16)
    out2 = step(params, out.kv_cache, out.kv_scale, cm, inp2,
                jax.random.PRNGKey(1))
    np.testing.assert_allclose(out2.logits[0], hf_out[19], atol=3e-4,
                               rtol=1e-4)


def test_mixed_batch_decode_and_prefill(hf_model, ref_logits):
    """One decode row + one prefill row in the same step, independent
    sequences, must both match single-sequence behavior."""
    seq, hf_out = ref_logits
    params = hf_to_params(hf_model)
    step = llama.make_step_fn(CFG, SPEC, return_logits=True)
    cache, _ = kv_ops.init_cache(SPEC)
    scale = [jnp.zeros((1,), jnp.float32) for _ in range(SPEC.num_layers)]
    cm = jnp.zeros((1, 1), jnp.int32)

    # seq A = seq[:10] on pages [0,1]; prefill it alone first
    inp = make_prefill_input(seq[:10], pages=[0, 1], qp=16, kvp=4)
    out = step(params, cache, scale, cm, inp, jax.random.PRNGKey(0))
    cache = out.kv_cache

    # now a mixed step: decode row for A (token seq[10] at pos 10) +
    # prefill row for B = seq[5:17] on pages [4,5]
    ptab = np.full((2, 4), SPEC.trash_page, np.int32)
    ptab[0, :2] = [0, 1]
    ptab[1, :2] = [4, 5]
    bseq = seq[5:17]
    padded = np.zeros((1, 16), np.int32)
    padded[0, :len(bseq)] = bseq
    inp = llama.StepInput(
        decode_tokens=jnp.array([seq[10]], jnp.int32),
        decode_pos=jnp.array([10], jnp.int32),
        prefill_tokens=jnp.asarray(padded),
        prefill_start=jnp.zeros(1, jnp.int32),
        prefill_len=jnp.array([len(bseq)], jnp.int32),
        page_table=jnp.asarray(ptab),
        context_len=jnp.array([11, len(bseq)], jnp.int32),
        batch_slots=jnp.zeros(2, jnp.int32),
        sampling=greedy_params(2),
    )
    out = step(params, cache, scale, cm, inp, jax.random.PRNGKey(1))
    # row 0 (decode of A) matches HF teacher forcing at position 10
    np.testing.assert_allclose(out.logits[0], hf_out[10], atol=3e-4,
                               rtol=1e-4)
    # row 1 (prefill of B): compare against HF run on B
    import torch
    with torch.no_grad():
        hf_b = hf_model(torch.tensor(bseq[None])).logits[0, -1].numpy()
    np.testing.assert_allclose(out.logits[1], hf_b, atol=3e-4, rtol=1e-4)
