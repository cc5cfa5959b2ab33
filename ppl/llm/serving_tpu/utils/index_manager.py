"""Linear KV-cache slot allocator (cache_mode 0) and batch-slot allocator.

Equivalent of the reference ``IndexManager`` over
``ppl::common::CompactAddrManager`` (``src/utils/index_manager.h:27-82``):
contiguous ranges are allocated from a virtual space of
``kv_cache_max_tokens`` slots; exhaustion returns a sentinel. The same class
doubles as the persistent penalty batch-slot allocator
(``llm_generator.h:172``, ``llm_generator.cc:562-568``).

Implementation: address-ordered free list with coalescing on free
(best-fit), pure host-side. A C++ backing can replace this transparently.
"""

from __future__ import annotations

import bisect
from typing import List, Optional, Tuple

# Reference returns INT64_MAX on exhaustion (index_manager.h:61-72); we keep
# the same sentinel so call sites can stay structurally identical.
INVALID_INDEX = (1 << 63) - 1


class IndexManager:
    def __init__(self, capacity: int = 0):
        self._capacity = 0
        self._free: List[Tuple[int, int]] = []  # sorted (start, size)
        self._avail = 0
        if capacity:
            self.init(capacity)

    def init(self, capacity: int) -> None:
        self._capacity = int(capacity)
        self._free = [(0, self._capacity)] if capacity > 0 else []
        self._avail = self._capacity

    @property
    def capacity(self) -> int:
        return self._capacity

    def alloc(self, size: int) -> int:
        """Allocate ``size`` contiguous slots; returns start index or
        :data:`INVALID_INDEX` on exhaustion."""
        if size <= 0:
            return INVALID_INDEX
        best = -1
        best_size = None
        for i, (_, sz) in enumerate(self._free):
            if sz >= size and (best_size is None or sz < best_size):
                best, best_size = i, sz
                if sz == size:
                    break
        if best < 0:
            return INVALID_INDEX
        start, sz = self._free[best]
        if sz == size:
            self._free.pop(best)
        else:
            self._free[best] = (start + size, sz - size)
        self._avail -= size
        return start

    def free(self, start: int, size: int) -> None:
        if size <= 0:
            return
        i = bisect.bisect_left(self._free, (start, 0))
        # coalesce with predecessor / successor
        merged_start, merged_size = start, size
        if i > 0:
            p_start, p_size = self._free[i - 1]
            if p_start + p_size == start:
                merged_start, merged_size = p_start, p_size + size
                i -= 1
                self._free.pop(i)
        if i < len(self._free):
            n_start, n_size = self._free[i]
            if merged_start + merged_size == n_start:
                merged_size += n_size
                self._free.pop(i)
        self._free.insert(i, (merged_start, merged_size))
        self._avail += size

    def get_available_block_num(self) -> int:
        return self._avail
