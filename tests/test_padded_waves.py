"""Padded prefill-wave budgeting: admission bounds the COMPILED wave
footprint (row bucket x token bucket), not just real token counts.

Round-4 canonical run 1: one 1500-token ShareGPT prompt joined a
64-request wave, dragging every row to the 4096 token bucket — a 262k
padded-row (17.33 GB) tinyllama step program that compile-OOM'd
mid-serving and fail-all'ed the batch. These tests pin the fix:
``generator`` refuses wave growth past ``engine.padded_prefill_tokens``
and startup validation (``validate_bucket_grid`` with
``max_tokens_per_step``) caps or rejects buckets that cannot compile.
"""

import numpy as np

from test_generator_e2e import (DummyTokenizer, build, make_gen_cfg,
                                make_model_cfg, req, run)

from ppl.llm.serving_tpu.request import FinishFlag


def test_wave_padding_is_bounded():
    """8 short prompts + 1 long: every request finishes, and no compiled
    mixed program exceeds the padded budget (the long prompt must lead
    its own narrow wave, not widen the short prompts' wave)."""
    gen_cfg = make_gen_cfg(max_tokens_per_step=256, max_prefill_batch=8,
                           max_running_batch=16)
    gen, conn = build(gen_cfg=gen_cfg,
                      resource_kw=dict(token_buckets=(32, 256),
                                       batch_buckets=(4, 16),
                                       kv_cache_max_tokens=4096))
    try:
        reqs = [req(i, prompt="x" * 20, gen_len=4) for i in range(8)]
        reqs.append(req(99, prompt="y" * 120, gen_len=4))
        run(gen, conn, reqs)
        for r in reqs:
            assert len(conn.tokens[r.id]) == 4, r.id
        for key in gen.engine.compiled_keys():
            _, _, _, bp, qp, _, _, _ = key
            assert bp * qp <= 256 or bp == 0, key
    finally:
        gen.shutdown()


def test_page_table_width_is_pinned():
    """kvp is the config maximum, independent of traffic: page walks
    are data-dependent, so one table width = one compiled shape per
    (bd, bp, qp) instead of 4x first-visit kvp variants mid-serving."""
    from ppl.llm.serving_tpu.engine import TaskState
    gen, conn = build()
    try:
        eng = gen.engine
        short = TaskState(tid=1, next_tokens=[5], rest_iters=4,
                          page_list=[0], total_len=6)
        plan = eng.build_plan([short])
        expect = eng._kvp_bucket(eng.max_kv_pages)
        assert plan["arrays"]["page_table"].shape[1] == expect
        assert expect >= 12  # max_total 192 / page 16
    finally:
        gen.shutdown()


def test_padded_prefill_tokens_formula():
    gen, conn = build(resource_kw=dict(token_buckets=(32, 256),
                                       batch_buckets=(4, 16)))
    try:
        eng = gen.engine
        assert eng.padded_prefill_tokens(0, 100) == 0
        assert eng.padded_prefill_tokens(1, 20) == 32       # 1 x 32
        assert eng.padded_prefill_tokens(3, 20) == 4 * 32   # row bucket 4
        assert eng.padded_prefill_tokens(3, 40) == 4 * 256  # token bucket up
        # row cap from grid validation forces wave shrink via sentinel
        eng.max_prefill_rows[256] = 1
        assert eng.padded_prefill_tokens(1, 40) == 256
        assert eng.padded_prefill_tokens(2, 40) > 10 ** 12
        assert eng.prompt_row_cap(40) == 1
        assert eng.prompt_row_cap(20) is None
    finally:
        gen.shutdown()


def test_row_cap_shrinks_wave_but_serves_everyone():
    """With a validation-imposed one-row cap on the big token bucket,
    long prompts run one per wave — slower, but every request is
    served."""
    gen_cfg = make_gen_cfg(max_tokens_per_step=512, max_prefill_batch=4,
                           max_running_batch=8)
    gen, conn = build(gen_cfg=gen_cfg,
                      resource_kw=dict(token_buckets=(32, 256),
                                       batch_buckets=(4, 8),
                                       kv_cache_max_tokens=4096))
    try:
        gen.engine.max_prefill_rows[256] = 1
        reqs = [req(i, prompt="z" * 100, gen_len=3) for i in range(3)]
        run(gen, conn, reqs)
        for r in reqs:
            assert len(conn.tokens[r.id]) == 3, r.id
        for key in gen.engine.compiled_keys():
            _, _, _, bp, qp, _, _, _ = key
            if qp >= 256:
                assert bp <= 1, key
    finally:
        gen.shutdown()


def test_unservable_bucket_fails_fast():
    """Row cap 0 = the bucket's program cannot compile at all: prompts
    landing there are admitted-to-fail (FAILED upcall), never stashed —
    and short prompts keep being served."""
    gen, conn = build()
    try:
        gen.engine.max_prefill_rows[128] = 0  # "w"*120 -> 121 tok -> 128
        conn.set_wanted(2)
        gen.process(req(1, prompt="w" * 120, gen_len=4))
        gen.process(req(2, prompt="ok", gen_len=4))
        assert conn.wait(timeout=120)
        assert 1 in conn.failures and "token bucket" in conn.failures[1]
        assert len(conn.tokens[2]) == 4
        assert 1 not in conn.tokens or not conn.tokens[1]
    finally:
        gen.shutdown()


def test_prefill_admission_cadence_engages_blocks_under_load():
    """With a saturated queue and an established batch, the engine must
    still dispatch multi-step decode blocks (not only 1-step mixed
    programs), and every request still finishes."""
    gen_cfg = make_gen_cfg(max_running_batch=8, max_prefill_batch=2,
                           max_tokens_per_step=256)
    gen, conn = build(gen_cfg=gen_cfg, resource_kw=dict(multi_step=4))
    try:
        reqs = [req(i, prompt=f"load {i}", gen_len=12) for i in range(12)]
        run(gen, conn, reqs, timeout=600)
        for r in reqs:
            assert len(conn.tokens[r.id]) == 12, r.id
        blocks = [k for k in gen.engine.compiled_keys() if k[0] > 1]
        assert blocks, "no decode-block program ever dispatched under load"
    finally:
        gen.shutdown()


def test_on_fatal_after_consecutive_engine_failures():
    """Dead-backend detection: repeated engine failures with no
    successful step in between invoke on_fatal (the server exits for a
    supervised restart; default None keeps library semantics)."""
    gen, conn = build()
    calls = []
    try:
        run(gen, conn, [req(900, prompt="healthy first", gen_len=4)])
        gen.on_fatal = lambda: calls.append(1)

        def boom(plan, profiler=None):
            raise RuntimeError("UNAVAILABLE: worker crashed (test)")

        gen.engine.dispatch_plan = boom
        for i in range(3):
            conn.set_wanted(1)
            gen.process(req(901 + i, prompt="x", gen_len=4))
            assert conn.wait(timeout=60)
            assert 901 + i in conn.failures
        assert calls, "on_fatal never invoked after 3 failures"
    finally:
        gen.on_fatal = None
        gen.shutdown()
