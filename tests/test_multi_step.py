"""Multi-step decode blocks: equivalence with the per-step loop."""

import numpy as np

from ppl.llm.serving_tpu.config import ResourceConfig
from ppl.llm.serving_tpu.request import FinishFlag

from test_generator_e2e import DummyTokenizer, build, make_model_cfg, req, run


def build_with_multi(multi_step):
    return build(resource_kw=dict(multi_step=multi_step))


def test_multi_matches_single_greedy():
    gen1, conn1 = build_with_multi(1)
    gen8, conn8 = build_with_multi(8)
    try:
        run(gen1, conn1, [req(1, prompt="block equivalence", gen_len=20)])
        run(gen8, conn8, [req(1, prompt="block equivalence", gen_len=20)])
        assert conn1.tokens[1] == conn8.tokens[1]
    finally:
        gen1.shutdown()
        gen8.shutdown()


def test_multi_batch_greedy_equivalence():
    gen1, conn1 = build_with_multi(1)
    gen8, conn8 = build_with_multi(8)
    try:
        reqs = [req(i, prompt=f"prompt number {i}", gen_len=16)
                for i in range(3)]
        run(gen1, conn1, list(reqs))
        reqs = [req(i, prompt=f"prompt number {i}", gen_len=16)
                for i in range(3)]
        run(gen8, conn8, list(reqs))
        for i in range(3):
            assert conn1.tokens[i] == conn8.tokens[i], i
    finally:
        gen1.shutdown()
        gen8.shutdown()


def test_multi_step_exact_length():
    """gen_len not a multiple of the block size still yields exactly
    gen_len tokens (block size shrinks to the remaining budget)."""
    gen, conn = build_with_multi(8)
    try:
        run(gen, conn, [req(1, gen_len=13)])
        assert len(conn.tokens[1]) == 13
        assert conn.finish_flags[1] == FinishFlag.LENGTH
    finally:
        gen.shutdown()


def test_multi_step_stop_token_truncates_block():
    """A stop token inside a block finishes the request; later block
    tokens are discarded."""
    gen, conn = build_with_multi(8)
    try:
        r = req(1, gen_len=64, early_stopping=True)
        r.stop_tokens = set(range(256))  # first token stops
        run(gen, conn, [r])
        assert len(conn.tokens[1]) == 1
        assert conn.finish_flags[1] == FinishFlag.EOS_TOKEN
        # resources reclaimed
        import time
        time.sleep(0.1)
        assert gen.page_mgr.get_avail() == gen.page_mgr.num_pages
    finally:
        gen.shutdown()


def test_multi_step_resources_exact():
    """KV pages must cover the whole block's growth (ctx + N)."""
    gen, conn = build_with_multi(8)
    try:
        # prompt 12 tokens + 20 gen = 32 > 1 page (16); blocks cross the
        # page boundary mid-block
        run(gen, conn, [req(1, prompt="abcdefghijk", gen_len=20)])
        assert len(conn.tokens[1]) == 20
    finally:
        gen.shutdown()


def test_speculative_pipeline_equivalence():
    """ignore_eos decode (the speculation-eligible shape) must produce
    identical tokens with pipelining active vs multi_step=1."""
    gen1, conn1 = build_with_multi(1)
    gen8, conn8 = build_with_multi(8)
    try:
        # early_stopping=False + long gen => speculation triggers
        reqs = [req(i, prompt=f"pipeline {i}", gen_len=40) for i in range(3)]
        run(gen1, conn1, list(reqs))
        reqs = [req(i, prompt=f"pipeline {i}", gen_len=40) for i in range(3)]
        run(gen8, conn8, list(reqs))
        for i in range(3):
            assert conn1.tokens[i] == conn8.tokens[i], i
    finally:
        gen1.shutdown()
        gen8.shutdown()


def test_speculation_depth_equivalence():
    """The N-deep speculative block queue must be token-identical to no
    speculation at every depth (depth >1 is CPU-verified here; on the
    tunneled single-chip runtime it is disabled by default)."""
    from test_generator_e2e import build, make_gen_cfg
    results = {}
    for depth in (0, 2):
        gen_cfg = make_gen_cfg()
        gen_cfg.speculative_blocks = depth
        gen, conn = build(gen_cfg=gen_cfg,
                          resource_kw=dict(multi_step=8))
        try:
            reqs = [req(i, prompt=f"depth {i}", gen_len=32)
                    for i in range(2)]
            run(gen, conn, reqs)
            results[depth] = {i: list(conn.tokens[i]) for i in range(2)}
        finally:
            gen.shutdown()
    assert results[0] == results[2]


def test_continuation_fast_path_fires():
    """Deep speculation uses the device-resident continuation dispatch
    (no host plan re-assembly) whenever the page bucket doesn't grow."""
    from test_generator_e2e import build, make_gen_cfg
    gen_cfg = make_gen_cfg()
    gen_cfg.speculative_blocks = 2
    gen, conn = build(gen_cfg=gen_cfg, resource_kw=dict(multi_step=4))
    calls = {"cont": 0}
    orig = gen.engine.dispatch_continuation

    def counting(handle, profiler=None):
        calls["cont"] += 1
        return orig(handle, profiler=profiler)

    gen.engine.dispatch_continuation = counting
    try:
        reqs = [req(i, prompt=f"cont {i}", gen_len=32) for i in range(2)]
        run(gen, conn, reqs)
        assert calls["cont"] > 0
        assert all(len(conn.tokens[i]) == 32 for i in range(2))
    finally:
        gen.shutdown()


def test_speculation_with_early_stopping_equivalence():
    """EOS-stopping traffic speculates (the realistic-workload path): a
    stop token hit mid-block with further speculative blocks in flight
    must yield exactly the same truncated stream as the unpipelined run,
    and all resources must be reclaimed."""
    import time
    from test_generator_e2e import build, make_gen_cfg

    # pass 1: discover what greedy generates (deterministic random model)
    gen, conn = build_with_multi(1)
    try:
        run(gen, conn, [req(1, prompt="eos spec probe", gen_len=40)])
        baseline = list(conn.tokens[1])
    finally:
        gen.shutdown()
    assert len(baseline) == 40
    # stop on a token generated mid-stream (inside some block)
    stop_tok = baseline[13]
    stop_at = baseline.index(stop_tok)  # first occurrence finishes it
    expect = baseline[:stop_at + 1]

    results = {}
    for depth in (0, 2):
        gen_cfg = make_gen_cfg()
        gen_cfg.speculative_blocks = depth
        gen, conn = build(gen_cfg=gen_cfg, resource_kw=dict(multi_step=4))
        spec_fired = {"n": 0}
        orig = gen.engine.dispatch_plan

        def spying(plan, profiler=None, _orig=orig, _s=spec_fired):
            if plan.get("feed_device_tokens"):
                _s["n"] += 1
            return _orig(plan, profiler=profiler)

        gen.engine.dispatch_plan = spying
        try:
            r = req(1, prompt="eos spec probe", gen_len=40,
                    early_stopping=True)
            r.stop_tokens = {stop_tok}
            run(gen, conn, [r])
            results[depth] = list(conn.tokens[1])
            assert conn.finish_flags[1] == FinishFlag.EOS_TOKEN
            if depth:
                assert spec_fired["n"] > 0, \
                    "speculation never fired under EOS traffic"
            time.sleep(0.3)
            assert gen.page_mgr.get_avail() == gen.page_mgr.num_pages
        finally:
            gen.shutdown()
    assert results[0] == expect
    assert results[2] == expect


def test_speculation_eos_batch_mixed_finish_order():
    """Several EOS-stopping requests finishing at different steps while
    the pipeline runs: every stream matches its unpipelined twin."""
    from test_generator_e2e import build, make_gen_cfg

    gen, conn = build_with_multi(1)
    try:
        reqs = [req(i, prompt=f"mixed finish {i}", gen_len=32)
                for i in range(3)]
        run(gen, conn, reqs)
        base = {i: list(conn.tokens[i]) for i in range(3)}
    finally:
        gen.shutdown()
    stops = {0: base[0][5], 1: base[1][18], 2: base[2][29]}
    expect = {}
    for i in range(3):
        cut = base[i].index(stops[i])
        expect[i] = base[i][:cut + 1]

    results = {}
    for depth in (0, 2):
        gen_cfg = make_gen_cfg()
        gen_cfg.speculative_blocks = depth
        gen, conn = build(gen_cfg=gen_cfg, resource_kw=dict(multi_step=4))
        try:
            reqs = []
            for i in range(3):
                r = req(i, prompt=f"mixed finish {i}", gen_len=32,
                        early_stopping=True)
                r.stop_tokens = {stops[i]}
                reqs.append(r)
            run(gen, conn, reqs)
            results[depth] = {i: list(conn.tokens[i]) for i in range(3)}
        finally:
            gen.shutdown()
    assert results[0] == expect
    assert results[2] == expect


def test_cancel_with_penalty_during_speculation():
    """Cancel mid-speculation with penalties on: the penalty slot's
    count-map clear must wait for the spec queue to drain (an in-flight
    block still scatter-adds to that slot on device), and every slot is
    reclaimed by the end."""
    import time
    from test_generator_e2e import build, make_gen_cfg
    gen_cfg = make_gen_cfg()
    gen_cfg.speculative_blocks = 2
    gen_cfg.enable_penalty = True
    gen, conn = build(gen_cfg=gen_cfg,
                      resource_kw=dict(multi_step=4, enable_penalty=True))
    try:
        reqs = [req(i, prompt=f"pen {i}", gen_len=48) for i in range(3)]
        for r in reqs:
            r.repetition_penalty = 1.1
        conn.set_wanted(2)  # two finish; one will be canceled
        for r in reqs:
            gen.process(r)
        time.sleep(0.3)
        gen.clear_task(1)
        assert conn.wait(timeout=180)
        time.sleep(0.5)
        assert not gen._pending_slot_clears
        assert (gen.batch_slots_mgr.get_available_block_num()
                == gen.gen_cfg.max_running_batch)
    finally:
        gen.shutdown()


def test_prefill_seeded_speculation_equivalence():
    """The first decode block after a prefill is dispatched speculatively
    with device-fed, row-permuted prefill tokens — results must match the
    unpipelined run exactly, and the perm path must actually fire."""
    from test_generator_e2e import build, make_gen_cfg
    results = {}
    for depth in (0, 2):
        gen_cfg = make_gen_cfg()
        gen_cfg.speculative_blocks = depth
        gen, conn = build(gen_cfg=gen_cfg, resource_kw=dict(multi_step=4))
        perms = []
        orig = gen.engine.dispatch_plan

        def spying(plan, profiler=None, _orig=orig, _p=perms):
            if plan.get("feed_perm") is not None:
                _p.append(plan["feed_perm"])
            return _orig(plan, profiler=profiler)

        gen.engine.dispatch_plan = spying
        try:
            reqs = [req(i, prompt=f"seed {i} padding words", gen_len=24)
                    for i in range(3)]
            run(gen, conn, reqs)
            results[depth] = {i: list(conn.tokens[i]) for i in range(3)}
            if depth:
                assert perms, "prefill-seeded speculation never fired"
        finally:
            gen.shutdown()
    assert results[0] == results[2]


def test_cancel_last_task_with_spec_in_flight_then_new_request():
    """Canceling the only running request while speculative blocks are in
    flight must not wedge the generator: stale blocks are drained and the
    next request is admitted normally (regression: the admission gate
    blocked forever on the stale spec queue and the wakeup loop spun)."""
    import time
    from test_generator_e2e import build, make_gen_cfg
    gen_cfg = make_gen_cfg()
    gen_cfg.speculative_blocks = 2
    gen, conn = build(gen_cfg=gen_cfg, resource_kw=dict(multi_step=4))
    try:
        r = req(1, prompt="cancel me please", gen_len=64)
        conn.set_wanted(1)
        gen.process(r)
        time.sleep(0.4)  # prefill done, speculation in flight
        gen.clear_task(1)
        time.sleep(0.5)
        # a fresh request must be admitted and complete
        conn.set_wanted(1)
        gen.process(req(2, prompt="after cancel", gen_len=6))
        assert conn.wait(timeout=120), "generator wedged after cancel"
        assert len(conn.tokens[2]) == 6
        # speculation may run past a LENGTH finish now (capacity
        # horizon); the loop drains stale entries on its next
        # iteration after the batch empties — wait for it
        for _ in range(200):
            if not gen._spec_queue:
                break
            time.sleep(0.05)
        assert not gen._spec_queue
    finally:
        gen.shutdown()


def test_reactive_continuation_with_early_stopping():
    """Early-stopping requests can't speculate, but unchanged-membership
    decode blocks still reuse the device-resident plan reactively — and
    tokens must match the non-continuation run exactly."""
    from test_generator_e2e import build, make_gen_cfg
    results = {}
    for depth in (0, 1):
        gen_cfg = make_gen_cfg()
        gen_cfg.speculative_blocks = depth
        gen, conn = build(gen_cfg=gen_cfg, resource_kw=dict(multi_step=4))
        conts = {"n": 0}
        orig = gen.engine.dispatch_continuation

        def counting(handle=None, profiler=None):
            conts["n"] += 1
            return orig(handle, profiler=profiler)

        gen.engine.dispatch_continuation = counting
        try:
            # early_stopping=True with an unreachable stop token: blocks
            # run to LENGTH, membership never changes mid-run
            reqs = []
            for i in range(2):
                r = req(i, prompt=f"reactive {i}", gen_len=24,
                        early_stopping=True)
                r.stop_tokens = {300000}
                reqs.append(r)
            run(gen, conn, reqs)
            results[depth] = {i: list(conn.tokens[i]) for i in range(2)}
            assert conts["n"] > 0, "reactive continuation never fired"
        finally:
            gen.shutdown()
    assert results[0] == results[1]


def _build_pallas(multi_step, quant_kv=False, block_tail="auto"):
    mkw = (dict(cache_quant_bit=8, cache_quant_group=8) if quant_kv
           else {})
    if multi_step > 1 and block_tail == "auto":
        # these tests exercise the block-tail path explicitly (the
        # production default is per-step scatters, BASELINE.md round 3)
        block_tail = "on"
    return build(
        model_cfg=make_model_cfg(**mkw),
        resource_kw=dict(multi_step=multi_step,
                         attention_impl="pallas_interpret",
                         attention_seq_block=2, block_tail=block_tail))


def test_block_tail_pallas_matches_single():
    """Block-tail mode (pallas: one cache scatter per block, the block's
    own K/V streaming from the dense side buffer) must produce the same
    greedy tokens as the per-step loop."""
    gen1, conn1 = _build_pallas(1)
    gen8, conn8 = _build_pallas(8)
    try:
        reqs = [req(i, prompt=f"tail equivalence {i}", gen_len=20)
                for i in range(3)]
        run(gen1, conn1, list(reqs), timeout=600)
        reqs = [req(i, prompt=f"tail equivalence {i}", gen_len=20)
                for i in range(3)]
        run(gen8, conn8, list(reqs), timeout=600)
        for i in range(3):
            assert conn1.tokens[i] == conn8.tokens[i], i
    finally:
        gen1.shutdown()
        gen8.shutdown()


def test_block_tail_pallas_matches_single_int8_kv():
    """Same with the int8-quantized cache: tail rows carry packed int8 +
    scale rows, bit-identical to what the block-end scatter writes."""
    gen1, conn1 = _build_pallas(1, quant_kv=True)
    gen8, conn8 = _build_pallas(8, quant_kv=True)
    try:
        run(gen1, conn1, [req(1, prompt="quantized tail", gen_len=20)],
            timeout=600)
        run(gen8, conn8, [req(1, prompt="quantized tail", gen_len=20)],
            timeout=600)
        assert conn1.tokens[1] == conn8.tokens[1]
    finally:
        gen1.shutdown()
        gen8.shutdown()


def test_block_tail_off_knob_matches_on():
    """block_tail='off' (per-step scatters, reference behavior) and the
    default block-tail mode must produce identical greedy tokens — the
    knob exists for A/B perf measurement (config.ResourceConfig
    .block_tail), not different semantics."""
    gen_on, conn_on = _build_pallas(8, block_tail="on")
    gen_off, conn_off = build(
        model_cfg=make_model_cfg(),
        resource_kw=dict(multi_step=8,
                         attention_impl="pallas_interpret",
                         attention_seq_block=2, block_tail="off"))
    try:
        run(gen_on, conn_on, [req(5, prompt="knob parity", gen_len=20)],
            timeout=600)
        run(gen_off, conn_off, [req(5, prompt="knob parity", gen_len=20)],
            timeout=600)
        assert conn_on.tokens[5] == conn_off.tokens[5]
    finally:
        gen_on.shutdown()
        gen_off.shutdown()
