"""Data-parallel replica routing.

dp is a DEPLOYMENT axis here, not a mesh axis: replicas have divergent
KV caches and schedules, so in-program dp sharding would serialize their
scheduling (parallel/shardings.py docstring). Instead, N independent
engine+generator replicas sit behind ONE frontend; this router fans
requests out round-robin and keeps cancels sticky to the owning replica.

The reference has no dp story at all (single engine per server,
SURVEY.md section 2.3); this is part of the north-star scaling surface.
"""

from __future__ import annotations

import threading
from collections import OrderedDict
from typing import List

# cancel routing remembers this many most-recent request owners; a
# cancel for an evicted (long-finished) id falls back to broadcast,
# which ClearTask semantics tolerate (unknown tids are ignored)
_OWNER_MEMORY = 100_000


class DataParallelRouter:
    """Round-robin request router over generator replicas.

    Exposes the same (process, clear_task, shutdown) surface as a single
    :class:`~..generator.LLMGenerator`, so the gRPC server wires to it
    unchanged.
    """

    def __init__(self, generators: List):
        if not generators:
            raise ValueError("need at least one generator replica")
        self._gens = list(generators)
        self._lock = threading.Lock()
        self._next = 0
        self._owner: "OrderedDict[int, int]" = OrderedDict()

    @property
    def replicas(self) -> int:
        return len(self._gens)

    def process(self, req) -> None:
        with self._lock:
            i = self._next
            self._next = (self._next + 1) % len(self._gens)
            self._owner[req.id] = i
            while len(self._owner) > _OWNER_MEMORY:
                self._owner.popitem(last=False)
        self._gens[i].process(req)

    def clear_task(self, tid: int) -> None:
        with self._lock:
            i = self._owner.get(tid)
        if i is not None:
            self._gens[i].clear_task(tid)
        else:  # owner evicted: broadcast (unknown tids are ignored)
            for g in self._gens:
                g.clear_task(tid)

    def shutdown(self) -> None:
        for g in self._gens:
            g.shutdown()
