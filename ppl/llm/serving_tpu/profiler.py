"""Step/request profiling counters and the ``[PERF]`` reporter.

Equivalent of the reference profiler (``src/common/profiler.h:47-121``,
``src/common/profiler.cc:6-68``): per-step stage costs aggregated in
current/global counter pairs, request-side counters, and a ``[PERF]``
stderr block with memory, kv-cache utilization, batch stats, prefix hit
rate, QPS/TPS, per-stage cur/avg/total latency, and schedule-cost %.

TPU notes: ``set_input_cost`` covers host->device array creation,
``model_forward_cost`` covers jitted step dispatch + device execution
(blocking on the sampled tokens), ``choose_token_cost`` is folded into the
forward on TPU (sampling runs inside the same jitted program — one of the
deliberate departures from the CUDA design) and instead records the
device->host token fetch. ``jax.profiler`` traces can be layered on top via
:func:`ppl.llm.serving_tpu.engine.LLMEngine.start_trace`.
"""

from __future__ import annotations

import dataclasses
import sys
import time


@dataclasses.dataclass
class StepCounter:
    """One side of ``WorkerPerStepCounter`` (``profiler.h:60-73``)."""

    step_cnt: int = 0
    prepare_cost: int = 0
    set_input_cost: int = 0
    model_forward_cost: int = 0
    choose_token_cost: int = 0
    post_process_cost: int = 0
    total_cost: int = 0
    input_token_cnt: int = 0
    output_token_cnt: int = 0
    cache_hit_count: int = 0

    def reset(self) -> None:
        for f in dataclasses.fields(self):
            setattr(self, f.name, 0)


@dataclasses.dataclass
class GeneratorReqCounter:
    """``profiler.h:47-58``."""

    encode_cnt: int = 0
    encode_cost: int = 0
    output_tokens_per_req: int = 0
    waiting_cnt: int = 0
    waiting_cost: int = 0


@dataclasses.dataclass
class WorkerProfiler:
    """``profiler.h:75-93``."""

    finished_task_cnt: int = 0
    kv_rest_blk: int = 0
    kv_max_blk: int = 0
    running_task: int = 0
    prefill_batch: int = 0
    prefill_tokens: int = 0
    max_running_task: int = 0
    pending_task_size: int = 0
    dev_mem_total: int = 0
    dev_mem_free: int = 0
    current: StepCounter = dataclasses.field(default_factory=StepCounter)
    global_: StepCounter = dataclasses.field(default_factory=StepCounter)
    req_counter: GeneratorReqCounter = dataclasses.field(
        default_factory=GeneratorReqCounter
    )

    def accumulate_step(self) -> None:
        g, c = self.global_, self.current
        g.step_cnt += 1
        g.prepare_cost += c.prepare_cost
        g.set_input_cost += c.set_input_cost
        g.model_forward_cost += c.model_forward_cost
        g.choose_token_cost += c.choose_token_cost
        g.post_process_cost += c.post_process_cost
        g.total_cost += c.total_cost


def print_profiler(p: WorkerProfiler, file=None) -> None:
    """``PrintProfiler`` (``profiler.cc:6-68``)."""
    out = file if file is not None else sys.stderr
    g, c = p.global_, p.current
    steps = max(g.step_cnt, 1)
    total = max(g.total_cost, 1)
    qps = p.finished_task_cnt / total * 1e6
    tps = g.output_token_cnt / total * 1e6
    hit = g.cache_hit_count / max(g.input_token_cnt, 1)

    def w(line):
        print(line, file=out)

    w(f"[PERF] --- step {g.step_cnt} @ {time.time():.3f} "
      "-------------------------------------------------")
    w(f"[PERF]  |- memory usage: ({p.dev_mem_total / 1e9:.2f} - "
      f"{p.dev_mem_free / 1e9:.2f}) -> "
      f"{(p.dev_mem_total - p.dev_mem_free) / 1e9:.2f} GiB")
    kv_used = (1.0 - p.kv_rest_blk / p.kv_max_blk) * 100 if p.kv_max_blk else 0.0
    w(f"[PERF]  |- kv cache usage: {kv_used:.2f} %")
    w(f"[PERF]  |- pending task number: {p.pending_task_size}")
    w(f"[PERF]  |- running batch: {p.running_task}, "
      f"max running batch: {p.max_running_task}")
    w(f"[PERF]  |- prefill batch: {p.prefill_batch} , "
      f"prefill tokens: {p.prefill_tokens}")
    w(f"[PERF]  |- prefix cache hit rate: {hit * 100:.2f} %")
    w(f"[PERF]  |- finished query count: {p.finished_task_cnt}, QPS: {qps:.2f}")
    avg_len = (g.output_token_cnt / p.finished_task_cnt
               if p.finished_task_cnt else 0.0)
    w(f"[PERF]  |- gen token count: {g.output_token_cnt}, "
      f"avg gen len: {avg_len:.2f}, TPS: {tps:.2f}")
    for name, cur, tot in (
        ("pipeline          ", c.total_cost, g.total_cost),
        ("- batching        ", c.prepare_cost, g.prepare_cost),
        ("- set inputs      ", c.set_input_cost, g.set_input_cost),
        ("- model inference ", c.model_forward_cost, g.model_forward_cost),
        ("- choose token    ", c.choose_token_cost, g.choose_token_cost),
        ("- post process    ", c.post_process_cost, g.post_process_cost),
    ):
        w(f"[PERF]  |-{name}| cur: {cur / 1e3:.2f} ms, "
          f"| avg: {tot / 1e3 / steps:.2f} ms, | total: {tot / 1e3:.2f} ms")
    sched = (g.total_cost - g.model_forward_cost - g.choose_token_cost) / total
    w(f"[PERF]  |- schedule cost: {sched * 100:.2f} %")
