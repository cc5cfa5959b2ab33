"""Prefix-cache manager tests, superset of the reference's single smoke test
(``test/test_prefix_cache_mgr.cc:25-66``)."""

import numpy as np

from ppl.llm.serving_tpu.utils.hashing import hash_page, hash_prefix_pages
from ppl.llm.serving_tpu.utils.prefix_cache import PrefixCacheManager


class TestHashing:
    def test_deterministic(self):
        toks = list(range(128))
        assert hash_page(0, toks) == hash_page(0, toks)
        assert hash_page(0, toks) != hash_page(1, toks)
        assert hash_page(0, toks) != hash_page(0, toks[::-1])

    def test_chained_prefix(self):
        toks = np.arange(300)
        hashes = hash_prefix_pages(toks, 128)
        assert len(hashes) == 2  # only full pages
        # same prefix -> same chain
        assert hash_prefix_pages(toks[:256], 128) == hashes
        # different first page changes every downstream hash
        other = toks.copy()
        other[0] = 999
        hashes2 = hash_prefix_pages(other, 128)
        assert hashes2[0] != hashes[0] and hashes2[1] != hashes[1]

    def test_short_prompt_no_pages(self):
        assert hash_prefix_pages(list(range(100)), 128) == []


class TestPrefixCacheManager:
    def test_insert_find(self):
        mgr = PrefixCacheManager()
        assert mgr.find(42) == -1
        assert mgr.insert(42, 7)
        assert mgr.find(42) == 7
        assert len(mgr) == 1

    def test_refcount_evict_lifecycle(self):
        mgr = PrefixCacheManager()
        mgr.insert(1, 10)
        mgr.insert(2, 20)
        # refcount 1 each: nothing evictable
        assert mgr.evict(2) == []
        mgr.dec_ref_count([1])
        assert mgr.evictable_count == 1
        # evict returns page id and removes the entry
        assert mgr.evict(5) == [10]
        assert mgr.find(1) == -1
        assert mgr.find(2) == 20

    def test_inc_ref_rescues_from_lru(self):
        mgr = PrefixCacheManager()
        mgr.insert(1, 10)
        mgr.dec_ref_count([1])
        assert mgr.evictable_count == 1
        mgr.inc_ref_count([1])
        assert mgr.evictable_count == 0
        assert mgr.evict(1) == []

    def test_lru_order(self):
        mgr = PrefixCacheManager()
        for h in (1, 2, 3):
            mgr.insert(h, h * 10)
        mgr.dec_ref_count([2])
        mgr.dec_ref_count([1])
        mgr.dec_ref_count([3])
        # least-recently-become-evictable first
        assert mgr.evict(2) == [20, 10]
        assert mgr.evict(2) == [30]

    def test_duplicate_insert_bumps_refcount(self):
        mgr = PrefixCacheManager()
        assert mgr.insert(5, 50)
        assert not mgr.insert(5, 51)  # dup: keeps original page
        assert mgr.find(5) == 50
        mgr.dec_ref_count([5])
        assert mgr.evictable_count == 0  # still one ref held
        mgr.dec_ref_count([5])
        assert mgr.evictable_count == 1

    def test_reset(self):
        mgr = PrefixCacheManager()
        mgr.insert(1, 10)
        mgr.dec_ref_count([1])
        mgr.reset()
        assert len(mgr) == 0 and mgr.evictable_count == 0
