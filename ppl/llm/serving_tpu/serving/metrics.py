"""Prometheus-format metrics endpoint.

The reference declares the machinery for this but never wires it:
``prometheus-cpp`` is fetched (``cmake/deps.cmake:147-157``) and
``--monitor-port`` is parsed (``tools/llm_server.cc:89-90``) yet nothing
in-tree uses either — the only observability is the ``[PERF]`` stderr
block (SURVEY.md section 2 note). Here the flag is real: a tiny HTTP
server exports the same counters the ``[PERF]`` block prints, in the
Prometheus text exposition format, so standard scrapers work against
``http://host:monitor_port/metrics``.

Stdlib-only (http.server in a daemon thread); reads the live
``WorkerProfiler`` the generator mutates — single-writer, and scrapes
tolerate torn reads of independent gauges.
"""

from __future__ import annotations

import http.server
import logging
import threading
from typing import Optional

from ..profiler import WorkerProfiler

logger = logging.getLogger("ppl.llm.serving_tpu.metrics")

_PREFIX = "ppl_llm"


def render_metrics(p: WorkerProfiler) -> str:
    """Prometheus text format (type hints + one sample per line)."""
    g = p.global_
    total_us = max(g.total_cost, 1)
    kv_used = (1.0 - p.kv_rest_blk / p.kv_max_blk) if p.kv_max_blk else 0.0
    hit = g.cache_hit_count / max(g.input_token_cnt, 1)
    lines = []

    def metric(name, mtype, help_, value):
        lines.append(f"# HELP {_PREFIX}_{name} {help_}")
        lines.append(f"# TYPE {_PREFIX}_{name} {mtype}")
        lines.append(f"{_PREFIX}_{name} {value}")

    metric("steps_total", "counter", "Decode-loop steps executed",
           g.step_cnt)
    metric("output_tokens_total", "counter", "Generated tokens",
           g.output_token_cnt)
    metric("input_tokens_total", "counter", "Prefill tokens consumed",
           g.input_token_cnt)
    metric("finished_requests_total", "counter", "Finished requests",
           p.finished_task_cnt)
    metric("running_batch", "gauge", "Currently running requests",
           p.running_task)
    metric("pending_requests", "gauge", "Queued, not yet admitted",
           p.pending_task_size)
    metric("prefill_batch", "gauge", "Prefill rows in the current step",
           p.prefill_batch)
    metric("kv_cache_utilization", "gauge", "KV pool fraction in use",
           f"{kv_used:.6f}")
    metric("prefix_cache_hit_rate", "gauge",
           "Prefix-cache token hit fraction", f"{hit:.6f}")
    metric("device_memory_bytes_total", "gauge", "Device memory capacity",
           p.dev_mem_total)
    metric("device_memory_bytes_free", "gauge", "Device memory free",
           p.dev_mem_free)
    metric("qps", "gauge", "Requests finished per second of loop time",
           f"{p.finished_task_cnt / total_us * 1e6:.6f}")
    metric("tps", "gauge", "Output tokens per second of loop time",
           f"{g.output_token_cnt / total_us * 1e6:.6f}")
    for stage, val in (("prepare", g.prepare_cost),
                       ("set_input", g.set_input_cost),
                       ("forward", g.model_forward_cost),
                       ("fetch_tokens", g.choose_token_cost),
                       ("post_process", g.post_process_cost),
                       ("total", g.total_cost)):
        lines.append(f"# TYPE {_PREFIX}_stage_cost_us_total counter")
        lines.append(
            f'{_PREFIX}_stage_cost_us_total{{stage="{stage}"}} {val}')
    return "\n".join(lines) + "\n"


class MetricsServer:
    """Serves ``/metrics`` for a live profiler; daemon-threaded."""

    def __init__(self, profiler: WorkerProfiler, port: int,
                 host: str = "0.0.0.0"):
        self.profiler = profiler
        prof = profiler

        class Handler(http.server.BaseHTTPRequestHandler):
            def do_GET(self):  # noqa: N802 (stdlib API name)
                if self.path not in ("/metrics", "/"):
                    self.send_response(404)
                    self.end_headers()
                    return
                body = render_metrics(prof).encode()
                self.send_response(200)
                self.send_header("Content-Type",
                                 "text/plain; version=0.0.4")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *args):  # silence per-request logs
                pass

        self._httpd = http.server.ThreadingHTTPServer((host, port), Handler)
        self.port = self._httpd.server_address[1]
        self._thread: Optional[threading.Thread] = None

    def start(self) -> None:
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True,
            name="ppl-llm-metrics")
        self._thread.start()
        logger.info("metrics endpoint on :%d/metrics", self.port)

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
        if self._thread is not None:
            self._thread.join(timeout=5)
