"""Native C++ host-runtime vs Python reference: behavioral equivalence
(the Python classes are the spec; the extension must be a drop-in)."""

import random

import pytest

from ppl.llm.serving_tpu.utils._native import (HAVE_NATIVE,
                                               get_index_manager_cls,
                                               get_page_manager_cls,
                                               get_prefix_cache_cls)
from ppl.llm.serving_tpu.utils.index_manager import (INVALID_INDEX,
                                                     IndexManager)
from ppl.llm.serving_tpu.utils.page_manager import PageManager
from ppl.llm.serving_tpu.utils.prefix_cache import PrefixCacheManager

pytestmark = pytest.mark.skipif(not HAVE_NATIVE,
                                reason="native extension not built")


def test_native_is_selected():
    assert get_index_manager_cls().__module__ == "ppl_llm_host"


def test_index_manager_equivalence_random():
    rng = random.Random(1)
    py = IndexManager(500)
    cc = get_index_manager_cls()(500)
    live = []
    for _ in range(3000):
        if live and rng.random() < 0.5:
            start, size = live.pop(rng.randrange(len(live)))
            py.free(start, size)
            cc.free(start, size)
        else:
            size = rng.randint(1, 40)
            a = py.alloc(size)
            b = cc.alloc(size)
            assert a == b, (a, b)
            if a != INVALID_INDEX:
                live.append((a, size))
        assert py.get_available_block_num() == cc.get_available_block_num()


def test_index_manager_sentinel():
    cc = get_index_manager_cls()(10)
    assert cc.alloc(11) == INVALID_INDEX
    assert cc.alloc(0) == INVALID_INDEX


def test_page_manager_equivalence():
    rng = random.Random(2)
    py = PageManager(128 * 64, 128)
    cc = get_page_manager_cls()(128 * 64, 128)
    held_py, held_cc = [], []
    for _ in range(1000):
        if held_py and rng.random() < 0.5:
            i = rng.randrange(len(held_py))
            py.free(held_py.pop(i))
            cc.free(held_cc.pop(i))
        else:
            n = rng.randint(0, 8)
            a = py.alloc(n)
            b = cc.alloc(n)
            assert (a is None) == (b is None)
            if a is not None:
                assert a == list(b)
                held_py.append(a)
                held_cc.append(list(b))
        assert py.get_avail() == cc.get_avail()


def test_prefix_cache_equivalence():
    rng = random.Random(3)
    py = PrefixCacheManager()
    cc = get_prefix_cache_cls()()
    hashes = list(range(100, 200))
    inserted = set()
    for _ in range(2000):
        op = rng.random()
        h = rng.choice(hashes)
        if op < 0.3:
            assert py.insert(h, h * 10) == cc.insert(h, h * 10)
            inserted.add(h)
        elif op < 0.5:
            assert py.find(h) == cc.find(h)
        elif op < 0.7 and inserted:
            hs = rng.sample(sorted(inserted), min(3, len(inserted)))
            py.inc_ref_count(hs)
            cc.inc_ref_count(hs)
        elif op < 0.9 and inserted:
            hs = rng.sample(sorted(inserted), min(3, len(inserted)))
            py.dec_ref_count(hs)
            cc.dec_ref_count(hs)
        else:
            n = rng.randint(1, 4)
            assert py.evict(n) == list(cc.evict(n))
            inserted = {h for h in inserted if py.find(h) != -1}
        assert len(py) == len(cc)
        assert py.evictable_count == cc.evictable_count


def test_generator_uses_native_cleanly():
    """Full e2e decode with the native allocators in the loop."""
    from test_generator_e2e import build, req, run
    gen, conn = build()
    try:
        assert type(gen.page_mgr).__module__ == "ppl_llm_host"
        run(gen, conn, [req(1, gen_len=6)])
        assert len(conn.tokens[1]) == 6
    finally:
        gen.shutdown()
