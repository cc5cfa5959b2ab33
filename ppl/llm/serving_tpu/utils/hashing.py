"""Chained per-page token hashing for the prefix cache.

Behavioral equivalent of the reference's ``HashCombine(prev_hash, tokens,
page_size)`` chained page hashes (``src/utils/utils.cc:87-94``,
``llm_generator.cc:500-511``): page N's hash mixes page N-1's hash with
page N's token ids, so a hash identifies a *prefix*, not a page in
isolation. The concrete mix function here is blake2b-based (stable across
processes/hosts, which matters for multi-host schedulers sharing prefix
state; the reference's std::hash chain is process-local).
"""

from __future__ import annotations

import hashlib
from typing import List, Sequence

import numpy as np


def hash_page(prev_hash: int, tokens) -> int:
    """Combine a previous prefix hash with one page of token ids."""
    arr = np.ascontiguousarray(tokens, dtype=np.int32)
    h = hashlib.blake2b(digest_size=8)
    h.update(int(prev_hash).to_bytes(8, "little", signed=False))
    h.update(arr.tobytes())
    return int.from_bytes(h.digest(), "little")


def hash_prefix_pages(token_ids: Sequence[int], page_size: int) -> List[int]:
    """Chained hashes of every *full* page of ``token_ids``
    (partial trailing pages are never cached, ``llm_generator.cc:501-504``)."""
    arr = np.ascontiguousarray(token_ids, dtype=np.int32)
    out: List[int] = []
    prev = 0
    for start in range(0, len(arr) - page_size + 1, page_size):
        prev = hash_page(prev, arr[start : start + page_size])
        out.append(prev)
    return out
