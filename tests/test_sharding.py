"""Tensor-parallel sharding tests on the virtual 8-device CPU mesh
(SURVEY.md section 4: multi-host logic via xla_force_host_platform_
device_count)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ppl.llm.serving_tpu.config import ModelConfig
from ppl.llm.serving_tpu.models import llama
from ppl.llm.serving_tpu.ops import kv_cache as kv_ops
from ppl.llm.serving_tpu.ops import sampling as S
from ppl.llm.serving_tpu.ops.kv_cache import CacheSpec
from ppl.llm.serving_tpu.parallel import shardings

CFG = ModelConfig(
    hidden_dim=64, intermediate_dim=128, num_layers=2, num_heads=8,
    num_kv_heads=4, vocab_size=256, cache_mode=1, page_size=16,
    dtype="float32",
)
SPEC = CacheSpec(num_layers=2, num_pages=16, page_size=16, num_kv_heads=4,
                 head_dim=8, dtype=jnp.float32)


def greedy(b):
    return S.SamplingParams(
        temperature=jnp.ones(b), top_k=jnp.ones(b, jnp.int32),
        top_p=jnp.zeros(b), do_sample=jnp.zeros(b, bool),
        repetition_penalty=jnp.ones(b), presence_penalty=jnp.zeros(b),
        frequency_penalty=jnp.zeros(b))


def make_inputs():
    seq = np.arange(3, 23) % 250
    pt = np.full((1, 4), SPEC.trash_page, np.int32)
    pt[0, :2] = [0, 1]
    padded = np.zeros((1, 32), np.int32)
    padded[0, :20] = seq
    return llama.StepInput(
        decode_tokens=jnp.zeros((0,), jnp.int32),
        decode_pos=jnp.zeros((0,), jnp.int32),
        prefill_tokens=jnp.asarray(padded),
        prefill_start=jnp.zeros(1, jnp.int32),
        prefill_len=jnp.array([20], jnp.int32),
        page_table=jnp.asarray(pt),
        context_len=jnp.array([20], jnp.int32),
        batch_slots=jnp.zeros(1, jnp.int32),
        sampling=greedy(1),
    )


def run_step(mesh=None):
    params = llama.init_params(CFG, jax.random.PRNGKey(0),
                               dtype=jnp.float32)
    cache, _ = kv_ops.init_cache(SPEC)
    scale = jnp.zeros((1,), jnp.float32)
    cm = jnp.zeros((1, 1), jnp.int32)
    if mesh is not None:
        params, cache, scale, cm = shardings.shard_engine_state(
            mesh, CFG, SPEC, params, cache, scale, cm)
    step = jax.jit(llama.make_step_fn(CFG, SPEC, return_logits=True),
                   donate_argnums=(1, 2, 3))
    out = step(params, cache, scale, cm, make_inputs(),
               jax.random.PRNGKey(0))
    return np.asarray(out.logits), np.asarray(out.tokens), out


def test_tp_matches_single_device():
    ref_logits, ref_tokens, _ = run_step(mesh=None)
    for tp in (2, 4):
        mesh = shardings.make_mesh(tp)
        logits, tokens, _ = run_step(mesh=mesh)
        np.testing.assert_allclose(logits, ref_logits, atol=1e-3,
                                   rtol=1e-3, err_msg=f"tp={tp}")


def test_tp_cache_sharded_and_updated():
    mesh = shardings.make_mesh(4)
    _, _, out = run_step(mesh=mesh)
    # cache stays sharded on the kv-head axis after the step
    spec_set = out.kv_cache.sharding.spec
    assert spec_set[0] == "tp"
    # and the prefill actually wrote into layer 0's pages 0/1
    assert np.abs(np.asarray(out.kv_cache[:, :20, :])).sum() > 0


def test_validate_tp_rejects_indivisible():
    with pytest.raises(ValueError, match="num_kv_heads"):
        shardings.validate_tp(CFG, 8)  # 4 kv heads % 8 != 0


def test_mesh_too_many_devices():
    with pytest.raises(ValueError, match="need"):
        shardings.make_mesh(64)
