"""Compile-manifest pre-warm: cold-start taming (the unrolled block
programs take minutes to compile on TPU; a server must be able to
pre-compile yesterday's (bucket x variant) set before taking traffic)."""

import numpy as np

from test_generator_e2e import build, make_gen_cfg, req, run


def test_manifest_roundtrip_and_prewarm(tmp_path):
    path = str(tmp_path / "warmup.json")

    gen_cfg = make_gen_cfg()
    gen_cfg.speculative_blocks = 2
    gen, conn = build(gen_cfg=gen_cfg, resource_kw=dict(multi_step=4))
    try:
        run(gen, conn, [req(1, prompt="prewarm manifest", gen_len=24)])
        tokens_first = list(conn.tokens[1])
        keys = gen.engine.compiled_keys()
        assert keys, "no programs compiled?"
        gen.engine.save_compile_manifest(path)
    finally:
        gen.shutdown()

    # fresh engine: prewarm everything the first run compiled, then the
    # same workload must still produce identical tokens
    gen_cfg = make_gen_cfg()
    gen_cfg.speculative_blocks = 2
    gen2, conn2 = build(gen_cfg=gen_cfg, resource_kw=dict(multi_step=4))
    try:
        n = gen2.engine.prewarm_from_manifest(path)
        assert n == len(keys), (n, keys)
        run(gen2, conn2, [req(1, prompt="prewarm manifest", gen_len=24)])
        assert list(conn2.tokens[1]) == tokens_first
    finally:
        gen2.shutdown()

    # saving again merges rather than overwrites
    import json
    gen3, conn3 = build(gen_cfg=make_gen_cfg())
    try:
        run(gen3, conn3, [req(2, prompt="x", gen_len=2)])
        gen3.engine.save_compile_manifest(path)
        saved = {tuple(k) for k in json.load(open(path))["keys"]}
        assert {tuple(k) for k in keys} <= saved
    finally:
        gen3.shutdown()


def test_prewarm_packed_length_matches_pack_arrays():
    """The aval the prewarm path lowers with must have exactly the
    length _pack_arrays produces, or the compile is for a phantom
    signature."""
    gen, conn = build()
    try:
        from ppl.llm.serving_tpu.engine import TaskState
        t = TaskState(tid=1, next_tokens=[5, 6, 7], rest_iters=8,
                      page_list=[0, 1], total_len=11)
        plan = gen.engine.build_plan([t])
        a = plan["arrays"]
        bd = plan["bd"]
        bp, qp = a["prefill_tokens"].shape
        kvp = a["page_table"].shape[1]
        b = bd + bp
        formula = 2 * bd + bp * qp + 2 * bp + b * kvp + 9 * b
        assert gen.engine._pack_arrays(a).size == formula
    finally:
        gen.shutdown()


def test_prewarm_skips_stale_keys(tmp_path):
    gen, conn = build()
    try:
        n = gen.engine.prewarm([["bogus"], [1, 0, 4, 0, 32, 4, 0, 0]])
        # the malformed key is skipped; the well-formed one compiles
        assert n == 1
    finally:
        gen.shutdown()


def test_aot_store_disabled_unsharded_multidevice(tmp_path):
    """The one combination that stays disabled: unsharded 1-device
    programs on a multi-device backend. Even loaded with explicit
    execution_devices, the XLA:CPU thunk loader can fail at DISPATCH
    ('Function negate_power_fusion not found') — after donated buffers
    are consumed, which is unrecoverable. Mesh programs round-trip
    (test_aot_store_roundtrip_with_mesh); single-device backends
    round-trip (test_aot_executable_store_roundtrip)."""
    gen, conn = build()
    try:
        gen.engine.set_aot_dir(str(tmp_path / "aot"))
        assert gen.engine._aot_dir == ""
    finally:
        gen.shutdown()


def test_aot_store_roundtrip_with_mesh(tmp_path):
    """TP-mesh step programs AOT-roundtrip: avals carry NamedSharding,
    and _aot_load passes the mesh's device list as execution_devices —
    so multi-chip (and future multi-host) starts skip re-compiles."""
    from ppl.llm.serving_tpu.config import ResourceConfig
    from ppl.llm.serving_tpu.connection import LocalConnection
    from ppl.llm.serving_tpu.generator import LLMGenerator
    from ppl.llm.serving_tpu.parallel import shardings
    from ppl.llm.serving_tpu.resources import create_engine
    from test_generator_e2e import DummyTokenizer, make_model_cfg

    aot = str(tmp_path / "aot")

    def build_tp():
        model_cfg = make_model_cfg()
        gen_cfg = make_gen_cfg()
        resource_cfg = ResourceConfig(
            model_format="random", kv_cache_max_tokens=2048,
            tensor_parallel_size=2,
            token_buckets=(32, 64, 128, 256), batch_buckets=(4, 8, 16))
        mesh = shardings.make_mesh(2)
        engine, kv_max = create_engine(model_cfg, resource_cfg, gen_cfg,
                                       mesh=mesh)
        engine.set_aot_dir(aot)
        conn = LocalConnection()
        gen = LLMGenerator(model_cfg, gen_cfg, engine, DummyTokenizer(),
                           conn, kv_max)
        return gen, conn

    gen, conn = build_tp()
    try:
        assert gen.engine._aot_dir == aot
        run(gen, conn, [req(1, prompt="aot mesh", gen_len=12)])
        tokens_first = list(conn.tokens[1])
        keys = gen.engine.compiled_keys()
        assert gen.engine.prewarm(keys) == len(keys)
    finally:
        gen.shutdown()

    gen2, conn2 = build_tp()
    try:
        assert gen2.engine.prewarm(keys) == len(keys)
        loaded = [k for k in keys
                  if not hasattr(gen2.engine._packed_cache[tuple(k)],
                                 "lower")]
        assert loaded, "no mesh program came back through the AOT store"
        # the load path (explicit execution_devices) is what this test
        # pins: a wrong device assignment fails here with
        # 'Expected args ... to have N shards'. Execution of
        # deserialized executables is additionally subject to a FLAKY
        # XLA:CPU thunk-loader bug ('Function ..._fusion not found
        # (type id: 1)') that TPU does not have — skip only that.
        conn2.set_wanted(1)
        gen2.process(req(1, prompt="aot mesh", gen_len=12))
        assert conn2.wait(timeout=120)
        failure = conn2.failures.get(1, "")
        if "not found (type id" in failure:
            import pytest
            pytest.skip(f"XLA:CPU AOT thunk-loader bug: {failure[:120]}")
        assert not failure, failure
        assert list(conn2.tokens[1]) == tokens_first
    finally:
        gen2.shutdown()


_AOT_SUBPROC = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("XLA_FLAGS", None)          # single CPU device
sys.path.insert(0, {repo!r}); sys.path.insert(0, {testdir!r})
import jax
jax.config.update("jax_platforms", "cpu")
from test_generator_e2e import build, req, run

aot, manifest = {aot!r}, {manifest!r}
gen, conn = build()
gen.engine.set_aot_dir(aot)
assert gen.engine._aot_dir == aot, "store must engage on 1 device"
run(gen, conn, [req(1, prompt="aot roundtrip", gen_len=12)])
tokens_first = list(conn.tokens[1])
keys = gen.engine.compiled_keys()
gen.engine.save_compile_manifest(manifest)
n = gen.engine.prewarm(keys)
assert n == len(keys)
gen.shutdown()
saved = [f for f in os.listdir(aot) if f.endswith(".aotx")]
assert len(saved) == len(keys), (saved, keys)

gen2, conn2 = build()
gen2.engine.set_aot_dir(aot)
n = gen2.engine.prewarm_from_manifest(manifest)
assert n == len(keys)
for k in keys:
    fn = gen2.engine._packed_cache[tuple(k)]
    assert not hasattr(fn, "lower"), ("jit wrapper, not AOT", k)
run(gen2, conn2, [req(1, prompt="aot roundtrip", gen_len=12)])
assert list(conn2.tokens[1]) == tokens_first, (
    conn2.tokens[1], tokens_first)
print("AOT-ROUNDTRIP-OK")
"""


def test_aot_executable_store_roundtrip(tmp_path):
    """prewarm serializes compiled step programs; a fresh engine loads
    them WITHOUT tracing/lowering/compiling (the jit path is never
    built) and produces identical tokens. Runs in a single-device
    subprocess — the store is single-device by design."""
    import os
    import subprocess
    import sys
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = _AOT_SUBPROC.format(
        repo=repo, testdir=os.path.join(repo, "tests"),
        aot=str(tmp_path / "aot"), manifest=str(tmp_path / "w.json"))
    r = subprocess.run([sys.executable, "-c", script],
                       capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert "AOT-ROUNDTRIP-OK" in r.stdout


def test_validate_bucket_grid_clamps_on_failure(monkeypatch):
    """A decode bucket whose program cannot compile (e.g. HBM OOM) is
    dropped at STARTUP and max_running_batch clamps to the largest
    surviving bucket — instead of a mid-serving engine failure that
    fail-alls every running request (round-3 canonical run 3)."""
    from ppl.llm.serving_tpu.config import (GeneratorConfig, ModelConfig,
                                            ResourceConfig)
    from ppl.llm.serving_tpu.resources import create_engine
    model_cfg = ModelConfig(
        hidden_dim=64, intermediate_dim=128, num_layers=2, num_heads=4,
        num_kv_heads=2, vocab_size=256, cache_mode=1, page_size=16,
        dtype="float32")
    resource_cfg = ResourceConfig(
        model_format="random", kv_cache_max_tokens=2048,
        token_buckets=(32, 64), batch_buckets=(4, 8, 16))
    gen_cfg = GeneratorConfig(max_running_batch=16, max_prefill_batch=4,
                              max_tokens_per_step=256,
                              max_total_tokens_per_request=64)
    engine, _ = create_engine(model_cfg, resource_cfg, gen_cfg)

    real_prewarm = engine.prewarm

    def fake_prewarm(keys):
        # simulate: buckets >= 16 exceed device memory
        if any(int(k[2]) >= 16 for k in keys):
            return 0
        return real_prewarm(keys)

    monkeypatch.setattr(engine, "prewarm", fake_prewarm)
    clamped = engine.validate_bucket_grid(64, 16)
    assert clamped == 8
    assert 16 not in engine.batch_buckets
    assert engine.batch_buckets == (4, 8)

    # all-fit case: nothing clamped
    engine2, _ = create_engine(model_cfg, resource_cfg, gen_cfg)
    assert engine2.validate_bucket_grid(64, 16) == 16
    assert engine2.batch_buckets == (4, 8, 16)

    # buckets beyond the first one covering max_running_batch are
    # unreachable AND unvalidated — they must be dropped, never kept:
    # a later restart with a raised max_running_batch would otherwise
    # trust a "validated" grid containing an uncompiled shape (the
    # exact mid-serving compile-OOM class this function kills)
    engine3, _ = create_engine(model_cfg, resource_cfg, gen_cfg)
    compiled = []
    real3 = engine3.prewarm
    monkeypatch.setattr(
        engine3, "prewarm",
        lambda keys: (compiled.extend(int(k[2]) for k in keys),
                      real3(keys))[1])
    assert engine3.validate_bucket_grid(64, 8) == 8
    assert engine3.batch_buckets == (4, 8)
    assert 16 not in compiled  # dropped WITHOUT wasting a compile

    # max_running_batch between buckets: the first covering bucket is
    # reachable (batch 9..12 -> bucket 16) so it IS validated and kept
    engine4, _ = create_engine(model_cfg, resource_cfg, gen_cfg)
    assert engine4.validate_bucket_grid(64, 12) == 12
    assert engine4.batch_buckets == (4, 8, 16)


def test_validate_bucket_grid_caps_mixed_prefill_rows(monkeypatch):
    """With max_tokens_per_step given, validation also compiles the
    widest admissible mixed (prefill+decode) program per token bucket;
    a width that fails steps down to a compilable row cap, and a bucket
    failing even at one row is marked unservable (cap 0)."""
    from ppl.llm.serving_tpu.config import (GeneratorConfig, ModelConfig,
                                            ResourceConfig)
    from ppl.llm.serving_tpu.resources import create_engine
    model_cfg = ModelConfig(
        hidden_dim=64, intermediate_dim=128, num_layers=2, num_heads=4,
        num_kv_heads=2, vocab_size=256, cache_mode=1, page_size=16,
        dtype="float32")
    resource_cfg = ResourceConfig(
        model_format="random", kv_cache_max_tokens=2048,
        token_buckets=(32, 64), batch_buckets=(4, 8))
    gen_cfg = GeneratorConfig(max_running_batch=8, max_prefill_batch=4,
                              max_tokens_per_step=128,
                              max_total_tokens_per_request=64)
    engine, _ = create_engine(model_cfg, resource_cfg, gen_cfg)

    real_prewarm = engine.prewarm

    def fake_prewarm(keys):
        # simulate: qp=64 programs fit only at bp<=1; qp=32 fits wide
        if any(int(k[4]) == 64 and int(k[3]) > 1 for k in keys):
            return 0
        return real_prewarm(keys)

    monkeypatch.setattr(engine, "prewarm", fake_prewarm)
    assert engine.validate_bucket_grid(64, 8, 128) == 8
    assert engine.max_prefill_rows.get(64) == 1
    assert 32 not in engine.max_prefill_rows       # widest width passed
    # admission sees the cap through the padded-footprint sentinel
    assert engine.padded_prefill_tokens(2, 40) > 10 ** 12
    assert engine.padded_prefill_tokens(1, 40) == 64

    # a bucket failing even at one row -> unservable (cap 0)
    engine2, _ = create_engine(model_cfg, resource_cfg, gen_cfg)
    real2 = engine2.prewarm
    monkeypatch.setattr(
        engine2, "prewarm",
        lambda keys: 0 if any(int(k[4]) == 64 for k in keys)
        else real2(keys))
    engine2.validate_bucket_grid(64, 8, 128)
    assert engine2.max_prefill_rows.get(64) == 0
    assert engine2.prompt_row_cap(40) == 0


def test_program_size_guard_refuses_oversize(monkeypatch):
    """A compiled step program whose generated code exceeds
    max_program_bytes must fail prewarm (so bucket-grid validation
    drops that bucket at startup) — a ~981 MB unrolled-block executable
    crashed the TPU worker outright in round 4."""
    gen, conn = build()
    try:
        eng = gen.engine
        key = list(eng.compiled_keys() or [(1, False, 4, 0, 32, 4,
                                            False, False)])[0]
        eng._packed_cache.clear()
        monkeypatch.setattr(type(eng), "_program_code_size",
                            lambda self, c: 900 << 20)
        eng.resource_cfg.max_program_bytes = 768 << 20
        assert eng.prewarm([key]) == 0
        eng.resource_cfg.max_program_bytes = 0      # 0 = no limit
        eng._packed_cache.clear()
        assert eng.prewarm([key]) == 1
    finally:
        gen.shutdown()
