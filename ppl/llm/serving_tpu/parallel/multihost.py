"""Multi-host serving topology.

The north-star extension beyond the reference's single-host NCCL TP
(SURVEY.md section 2.3): weights and KV tensor-sharded across a multi-host
pod slice with the SAME jitted step running SPMD on every host.

Design (controller-host scheduler):

- ``jax.distributed.initialize()`` on every host; ``jax.devices()`` then
  spans the slice and :func:`..parallel.shardings.make_mesh` builds a TP
  mesh whose collectives ride ICI (intra-host) and DCN (cross-host).
- Host 0 is the CONTROLLER: it runs the tokenizer, the gRPC frontend and
  the LLMGenerator admission logic. Every host runs the engine step.
- Continuous batching requires all hosts to enter the identical jitted
  step with identical host-side inputs each iteration: the controller
  broadcasts the per-step batch plan (the numpy StepInput arrays + the
  bucket key) to workers over the plan channel before dispatch, i.e. a
  single logical scheduler with lockstep workers (SURVEY.md section 7.3
  "cross-host continuous batching").
- Detokenization stays on the controller (streaming responses leave from
  the frontend host anyway).

This module provides the initialization + plan-channel plumbing;
single-host TP needs none of it (the engine's mesh covers all local
devices). The plan channel uses jax's key-value store via
``jax.experimental.multihost_utils.broadcast_one_to_all`` on small arrays
— simple and correct; a custom socket fan-out can replace it if the
per-step broadcast ever shows up in profiles.
"""

from __future__ import annotations

import logging
import pickle
from typing import Any, Optional

import jax
import numpy as np

logger = logging.getLogger("ppl.llm.serving_tpu.multihost")


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """``jax.distributed.initialize`` wrapper (env-driven when args are
    None, matching jax's own cluster auto-detection)."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes,
                      process_id=process_id)
    jax.distributed.initialize(**kwargs)
    logger.info("jax.distributed initialized: process %d/%d, %d local / %d "
                "global devices", jax.process_index(), jax.process_count(),
                jax.local_device_count(), jax.device_count())


def is_controller() -> bool:
    return jax.process_index() == 0


def controller_plan_channel(plan: Any) -> Any:
    """Controller side of the lockstep plan channel: broadcast this step's
    batch plan to every worker host; pass as LLMGenerator(plan_channel=)."""
    return broadcast_plan({"op": "step", "plan": plan})["plan"]


def worker_serve(engine) -> None:
    """Worker-host main loop: execute the controller's batch plans in
    lockstep until a stop message arrives."""
    logger.info("worker %d serving", jax.process_index())
    while True:
        msg = broadcast_plan(None)
        if msg.get("op") == "stop":
            logger.info("worker %d stopping", jax.process_index())
            return
        plan = msg["plan"]
        if plan.get("continuation"):
            # speculative-block fast path: continue from this engine's
            # previous dispatch (device-resident plan, no arrays on the
            # wire) — workers track no spec queue, just the last handle
            engine.run_continuation()
        else:
            engine.run_plan(plan)


def broadcast_stop() -> None:
    broadcast_plan({"op": "stop"})


def broadcast_plan(plan: Any) -> Any:
    """Broadcast a picklable per-step batch plan from the controller to
    every host; returns the plan on all hosts.

    All hosts MUST call this the same number of times (lockstep); the
    generator's step loop guarantees that by construction — one call per
    engine step, driven solely by controller-side scheduling decisions.
    """
    from jax.experimental import multihost_utils

    if jax.process_count() == 1:
        return plan
    payload = pickle.dumps(plan) if is_controller() else b""
    data = np.frombuffer(payload, dtype=np.uint8)
    # length-prefix broadcast: sizes first, then the padded payload
    size = multihost_utils.broadcast_one_to_all(
        np.array([data.size], np.int64))
    buf = np.zeros(int(size[0]), np.uint8)
    if is_controller():
        buf[:] = data
    buf = multihost_utils.broadcast_one_to_all(buf)
    return pickle.loads(buf.tobytes())
