"""Refcounted, LRU-evictable prefix-cache page map.

Equivalent of the reference ``PrefixCacheManager`` + ``LRUCache``
(``src/utils/prefix_cache_manager.h:32-189``):

- maps a chained prefix hash (see :mod:`.hashing`) to a KV page id,
- pages in use by >=1 running request hold a refcount,
- pages whose refcount drops to 0 move into an LRU list and become
  evictable (``prefix_cache_manager.h:150-163``),
- ``evict(n)`` pops up to n least-recently-used refcount-0 pages and
  returns their page ids to the caller, which hands them back to the
  :class:`~..utils.page_manager.PageManager` (``llm_generator.cc:519-523``).
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Dict, Iterable, List, Tuple


class PrefixCacheManager:
    def __init__(self):
        # hash -> [page_id, refcount]
        self._map: Dict[int, list] = {}
        # hash -> None for refcount-0 entries, in becoming-evictable order
        self._lru: "OrderedDict[int, None]" = OrderedDict()

    def __len__(self) -> int:
        return len(self._map)

    @property
    def evictable_count(self) -> int:
        return len(self._lru)

    def find(self, hash_val: int) -> int:
        """Return the cached page id for ``hash_val`` or -1."""
        ent = self._map.get(hash_val)
        return ent[0] if ent is not None else -1

    def insert(self, hash_val: int, page_id: int) -> bool:
        """Register a newly filled page under ``hash_val`` with refcount 1
        (the inserting request holds the reference). Returns False if the
        hash is already present (the existing entry's refcount is bumped
        instead, so a paired ``dec_ref_count`` stays balanced)."""
        ent = self._map.get(hash_val)
        if ent is not None:
            ent[1] += 1
            self._lru.pop(hash_val, None)
            return False
        self._map[hash_val] = [page_id, 1]
        return True

    def inc_ref_count(self, hashes: Iterable[int]) -> None:
        for h in hashes:
            ent = self._map[h]
            ent[1] += 1
            if ent[1] == 1:
                self._lru.pop(h, None)

    def dec_ref_count(self, hashes: Iterable[int]) -> None:
        for h in hashes:
            ent = self._map.get(h)
            if ent is None:
                continue
            ent[1] -= 1
            if ent[1] <= 0:
                self._lru[h] = None

    def evict(self, n: int) -> List[int]:
        """Evict up to ``n`` least-recently-used refcount-0 pages; returns
        their page ids (``prefix_cache_manager.h:165-172``)."""
        out: List[int] = []
        while n > 0 and self._lru:
            h, _ = self._lru.popitem(last=False)
            ent = self._map.pop(h)
            out.append(ent[0])
            n -= 1
        return out

    def reset(self) -> None:
        self._map.clear()
        self._lru.clear()
