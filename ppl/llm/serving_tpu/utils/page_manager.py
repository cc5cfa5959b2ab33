"""Paged KV-cache allocator (cache_mode 1).

Equivalent of ``ppl::common::PageManager`` as used by the generator
(``llm_generator.cc:157,534,553-557``): page-granularity alloc/free over a
pool of ``kv_cache_max_tokens / page_size`` pages, with ``get_avail()``
driving prefix-cache eviction decisions (``llm_generator.cc:516-527``).
"""

from __future__ import annotations

from typing import Iterable, List, Optional


class PageManager:
    def __init__(self, max_tokens: int = 0, page_size: int = 128):
        self._page_size = page_size
        self._free: List[int] = []
        self._num_pages = 0
        if max_tokens:
            self.init(max_tokens, page_size)

    def init(self, max_tokens: int, page_size: int) -> None:
        self._page_size = int(page_size)
        self._num_pages = int(max_tokens) // int(page_size)
        # LIFO free list: recently freed pages are reused first, keeping the
        # hot working set of the device pool small.
        self._free = list(range(self._num_pages - 1, -1, -1))

    @property
    def page_size(self) -> int:
        return self._page_size

    @property
    def num_pages(self) -> int:
        return self._num_pages

    def alloc(self, n: int) -> Optional[List[int]]:
        """Allocate ``n`` pages, returning their ids, or None if short
        (all-or-nothing, like ``PageManager::Alloc``)."""
        if n < 0 or n > len(self._free):
            return None
        if n == 0:
            return []
        out = self._free[-n:]
        del self._free[-n:]
        return out

    def free(self, pages: Iterable[int]) -> None:
        self._free.extend(pages)

    def get_avail(self) -> int:
        return len(self._free)
