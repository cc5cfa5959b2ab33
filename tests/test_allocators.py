import random

from ppl.llm.serving_tpu.utils.index_manager import INVALID_INDEX, IndexManager
from ppl.llm.serving_tpu.utils.page_manager import PageManager


class TestIndexManager:
    def test_basic_alloc_free(self):
        mgr = IndexManager(100)
        a = mgr.alloc(40)
        b = mgr.alloc(60)
        assert {a, b} == {0, 40}
        assert mgr.get_available_block_num() == 0
        assert mgr.alloc(1) == INVALID_INDEX
        mgr.free(a, 40)
        assert mgr.get_available_block_num() == 40
        assert mgr.alloc(41) == INVALID_INDEX
        assert mgr.alloc(40) == a

    def test_exhaustion_sentinel(self):
        mgr = IndexManager(10)
        assert mgr.alloc(11) == INVALID_INDEX
        assert mgr.alloc(0) == INVALID_INDEX

    def test_coalescing(self):
        mgr = IndexManager(30)
        a = mgr.alloc(10)
        b = mgr.alloc(10)
        c = mgr.alloc(10)
        mgr.free(a, 10)
        mgr.free(c, 10)
        # fragmented: no contiguous 20
        assert mgr.alloc(20) == INVALID_INDEX
        mgr.free(b, 10)
        # now coalesced into one block of 30
        assert mgr.alloc(30) == 0

    def test_best_fit(self):
        mgr = IndexManager(100)
        a = mgr.alloc(10)   # [0,10)
        b = mgr.alloc(30)   # [10,40)
        c = mgr.alloc(60)   # [40,100)
        mgr.free(a, 10)
        mgr.free(c, 60)
        # best fit for 10 is the [0,10) hole, not the 60 hole
        assert mgr.alloc(10) == 0

    def test_randomized_no_overlap(self):
        rng = random.Random(0)
        mgr = IndexManager(1000)
        live = []
        for _ in range(2000):
            if live and rng.random() < 0.5:
                start, size = live.pop(rng.randrange(len(live)))
                mgr.free(start, size)
            else:
                size = rng.randint(1, 50)
                start = mgr.alloc(size)
                if start != INVALID_INDEX:
                    for s, sz in live:
                        assert start + size <= s or s + sz <= start
                    live.append((start, size))
        total_live = sum(sz for _, sz in live)
        assert mgr.get_available_block_num() == 1000 - total_live


class TestPageManager:
    def test_alloc_free(self):
        mgr = PageManager(max_tokens=1024, page_size=128)
        assert mgr.num_pages == 8
        pages = mgr.alloc(3)
        assert len(pages) == 3 and len(set(pages)) == 3
        assert mgr.get_avail() == 5
        # all-or-nothing on shortage
        assert mgr.alloc(6) is None
        assert mgr.get_avail() == 5
        mgr.free(pages)
        assert mgr.get_avail() == 8

    def test_alloc_zero(self):
        mgr = PageManager(max_tokens=256, page_size=128)
        assert mgr.alloc(0) == []

    def test_unique_ids(self):
        mgr = PageManager(max_tokens=128 * 16, page_size=128)
        a = mgr.alloc(8)
        b = mgr.alloc(8)
        assert set(a) | set(b) == set(range(16))
        mgr.free(a)
        c = mgr.alloc(8)
        assert set(c) == set(a)
