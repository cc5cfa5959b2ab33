import io

from ppl.llm.serving_tpu.profiler import (
    StepCounter, WorkerProfiler, print_profiler,
)


def test_accumulate_step():
    p = WorkerProfiler()
    p.current.prepare_cost = 100
    p.current.model_forward_cost = 900
    p.current.total_cost = 1000
    p.accumulate_step()
    p.accumulate_step()
    assert p.global_.step_cnt == 2
    assert p.global_.total_cost == 2000
    assert p.global_.model_forward_cost == 1800


def test_print_profiler_format():
    p = WorkerProfiler()
    p.kv_max_blk = 1000
    p.kv_rest_blk = 250
    p.finished_task_cnt = 10
    p.global_.step_cnt = 5
    p.global_.total_cost = 1_000_000
    p.global_.model_forward_cost = 800_000
    p.global_.output_token_cnt = 500
    p.global_.input_token_cnt = 100
    p.global_.cache_hit_count = 50
    buf = io.StringIO()
    print_profiler(p, file=buf)
    text = buf.getvalue()
    assert "[PERF]" in text
    assert "kv cache usage: 75.00 %" in text
    assert "QPS: 10.00" in text
    assert "TPS: 500.00" in text
    assert "prefix cache hit rate: 50.00 %" in text
    assert "schedule cost: 20.00 %" in text


def test_print_profiler_no_div_by_zero():
    buf = io.StringIO()
    print_profiler(WorkerProfiler(), file=buf)
    assert "[PERF]" in buf.getvalue()
