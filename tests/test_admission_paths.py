"""Admission failure-path tests: every branch of
``LLMGenerator._check_and_alloc_memory`` (``CheckAndAllocGPUMemory``,
``llm_generator.cc:480-572``) that fails AFTER allocating something must
release it and (for OOM-shaped failures) set the admission cooldown."""

import pytest

from ppl.llm.serving_tpu.config import GeneratorConfig, ModelConfig
from ppl.llm.serving_tpu.generator import LLMGenerator, _CheckResult
from ppl.llm.serving_tpu.request import Request
from ppl.llm.serving_tpu.utils.index_manager import INVALID_INDEX


class _FakeEngine:
    def set_max_kv_pages(self, n):
        pass


class _NullConn:
    def send(self, rsp):
        pass

    def notify_failure(self, tid, rc, msg):
        pass


def make_gen(cache_mode=1, enable_prefix_cache=False, enable_penalty=False,
             kv_tokens=256, page_size=16):
    mc = ModelConfig(hidden_dim=64, intermediate_dim=128, num_layers=2,
                     num_heads=4, num_kv_heads=2, vocab_size=256,
                     cache_mode=cache_mode, page_size=page_size,
                     dtype="float32")
    gc = GeneratorConfig(max_running_batch=8, max_prefill_batch=4,
                         max_tokens_per_step=256,
                         max_input_tokens_per_request=128,
                         max_output_tokens_per_request=64,
                         max_total_tokens_per_request=192,
                         enable_prefix_cache=enable_prefix_cache,
                         enable_penalty=enable_penalty,
                         stop_tokens=frozenset({2}))
    return LLMGenerator(mc, gc, _FakeEngine(), None, _NullConn(), kv_tokens)


class _FailSlotMgr:
    def alloc(self, n):
        return INVALID_INDEX

    def free(self, start, n):
        pass


class _FailPageMgr:
    def __init__(self, inner):
        self._inner = inner

    def alloc(self, n):
        return None

    def free(self, pages):
        self._inner.free(pages)

    def get_avail(self):
        return 10**6


def make_req(n_prompt=40, gen_len=8):
    return Request(id=1, token_ids=list(range(3, 3 + n_prompt)),
                   generation_length=gen_len, is_token_in_out=True)


def admit(gen, req):
    res = _CheckResult()
    res.first_fill_len = len(req.token_ids)
    res.rest_iters = req.generation_length
    ok = gen._check_and_alloc_memory(req, res)
    return ok, res


def test_penalty_slot_failure_frees_pages_paged():
    gen = make_gen(cache_mode=1, enable_penalty=True)
    avail0 = gen.page_mgr.get_avail()
    gen.batch_slots_mgr = _FailSlotMgr()
    ok, res = admit(gen, make_req())
    assert not ok
    assert gen.page_mgr.get_avail() == avail0
    assert res.page_list == []


def test_penalty_slot_failure_frees_pages_linear():
    gen = make_gen(cache_mode=0, enable_penalty=True)
    avail0 = gen.idx_mgr.get_available_block_num()
    gen.batch_slots_mgr = _FailSlotMgr()
    ok, res = admit(gen, make_req())
    assert not ok
    assert gen.idx_mgr.get_available_block_num() == avail0
    assert res.cache_index == INVALID_INDEX


def test_penalty_slot_failure_releases_prefix_refs():
    gen = make_gen(cache_mode=1, enable_prefix_cache=True,
                   enable_penalty=True)
    gen.batch_slots_mgr = _FailSlotMgr()
    avail0 = gen.page_mgr.get_avail()
    ok, res = admit(gen, make_req(n_prompt=40))
    assert not ok
    # the full pages this prompt registered (40 tokens / 16-page = 2) must
    # be refcount-0 (evictable) so the cache can reclaim them; the tail
    # pages must be back in the pool; nothing may stay pinned
    n_registered = 40 // 16
    evicted = gen.prefix_cache.evict(n_registered)
    assert len(evicted) == n_registered
    gen.page_mgr.free(evicted)
    assert gen.page_mgr.get_avail() == avail0


def test_prefix_fresh_alloc_failure_sets_cooldown():
    gen = make_gen(cache_mode=1, enable_prefix_cache=True)
    gen.page_mgr = _FailPageMgr(gen.page_mgr)
    ok, res = admit(gen, make_req())
    assert not ok
    assert gen._cooldown > 0


def test_admission_success_then_teardown_restores_all():
    gen = make_gen(cache_mode=1, enable_prefix_cache=True,
                   enable_penalty=True)
    avail0 = gen.page_mgr.get_avail()
    ok, res = admit(gen, make_req())
    assert ok and res.slot_index != INVALID_INDEX
    n_prefix = len(res.hash_list)
    gen.prefix_cache.dec_ref_count(res.hash_list)
    gen.page_mgr.free(res.page_list[n_prefix:])
    gen.batch_slots_mgr.free(res.slot_index, 1)
    evicted = gen.prefix_cache.evict(n_prefix)
    gen.page_mgr.free(evicted)
    assert gen.page_mgr.get_avail() == avail0
