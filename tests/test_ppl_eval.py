"""Perplexity forward (make_nll_fn): teacher-forced NLL must match HF
transformers exactly, and the i8i8 delta must be small."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ppl.llm.serving_tpu.models import llama
from ppl.llm.serving_tpu.ops import kv_cache as kv_ops

from test_model_numerics import CFG, SPEC, hf_model, hf_to_params


def run_nll(params, seq, quant="none"):
    nll_fn = llama.make_nll_fn(CFG, SPEC, quant_method=quant)
    cache, _ = kv_ops.init_cache(SPEC)
    scale = [jnp.zeros((1,), jnp.float32) for _ in range(SPEC.num_layers)]
    L = 32
    padded = np.zeros(L, np.int32)
    padded[:len(seq)] = seq
    pt = jnp.asarray(np.arange(2, dtype=np.int32)[None, :])
    nll, mask = nll_fn(params, cache, scale, jnp.asarray(padded),
                       jnp.asarray(len(seq), jnp.int32), pt)
    return np.asarray(nll), np.asarray(mask)


def test_nll_matches_hf(hf_model):
    import torch
    params = hf_to_params(hf_model)
    rng = np.random.RandomState(3)
    seq = rng.randint(0, CFG.vocab_size, size=24)
    nll, mask = run_nll(params, seq)
    assert mask.sum() == 23
    with torch.no_grad():
        logits = hf_model(torch.tensor(seq[None])).logits[0]
        lp = torch.log_softmax(logits, -1)
        hf_nll = -lp[torch.arange(23), torch.tensor(seq[1:])].numpy()
    np.testing.assert_allclose(nll[:23], hf_nll, atol=3e-4, rtol=1e-3)


def test_i8i8_ppl_delta_small(hf_model):
    params = hf_to_params(hf_model)
    rng = np.random.RandomState(4)
    seq = rng.randint(0, CFG.vocab_size, size=24)
    nll_f, mask = run_nll(params, seq)
    qparams = llama.quantize_model_params(params)
    nll_q, _ = run_nll(qparams, seq, quant="online_i8i8")
    ppl_f = np.exp(nll_f[mask].mean())
    ppl_q = np.exp(nll_q[mask].mean())
    # random tiny model: generous bound; real-checkpoint budget is 0.1
    assert abs(ppl_q - ppl_f) / ppl_f < 0.05, (ppl_f, ppl_q)
