"""Prometheus metrics endpoint (working version of the reference's dead
--monitor-port, SURVEY.md section 2 note on prometheus-cpp)."""

import urllib.request

from ppl.llm.serving_tpu.profiler import WorkerProfiler
from ppl.llm.serving_tpu.serving.metrics import MetricsServer, render_metrics


def make_profiler():
    p = WorkerProfiler()
    p.global_.step_cnt = 10
    p.global_.output_token_cnt = 640
    p.global_.input_token_cnt = 1280
    p.global_.cache_hit_count = 256
    p.global_.total_cost = 2_000_000  # us
    p.global_.model_forward_cost = 1_500_000
    p.finished_task_cnt = 5
    p.running_task = 3
    p.pending_task_size = 2
    p.kv_max_blk = 1000
    p.kv_rest_blk = 250
    return p


def test_render_format():
    text = render_metrics(make_profiler())
    assert "# TYPE ppl_llm_output_tokens_total counter" in text
    assert "ppl_llm_output_tokens_total 640" in text
    assert "ppl_llm_kv_cache_utilization 0.750000" in text
    assert "ppl_llm_prefix_cache_hit_rate 0.200000" in text
    assert 'ppl_llm_stage_cost_us_total{stage="forward"} 1500000' in text
    # tps = 640 / 2s
    assert "ppl_llm_tps 320.000000" in text


def test_http_scrape():
    p = make_profiler()
    srv = MetricsServer(p, port=0, host="127.0.0.1")
    srv.start()
    try:
        url = f"http://127.0.0.1:{srv.port}/metrics"
        with urllib.request.urlopen(url, timeout=10) as r:
            assert r.status == 200
            assert "version=0.0.4" in r.headers["Content-Type"]
            body = r.read().decode()
        assert "ppl_llm_running_batch 3" in body
        # counters update live
        p.global_.output_token_cnt += 10
        with urllib.request.urlopen(url, timeout=10) as r:
            assert "ppl_llm_output_tokens_total 650" in r.read().decode()
        # unknown path -> 404
        try:
            urllib.request.urlopen(
                f"http://127.0.0.1:{srv.port}/nope", timeout=10)
            assert False, "expected 404"
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        srv.stop()
