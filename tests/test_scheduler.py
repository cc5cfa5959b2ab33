import threading

from ppl.llm.serving_tpu.utils.scheduler import RequestScheduler


def test_fifo_order():
    s = RequestScheduler()
    for i in range(5):
        s.push_request(i)
    out = [s.try_pop_request(lambda r: True) for _ in range(5)]
    assert out == [0, 1, 2, 3, 4]
    assert s.try_pop_request(lambda r: True) is None


def test_push_reports_maybe_empty():
    s = RequestScheduler()
    assert s.push_request("a") is True
    assert s.push_request("b") is False
    s.try_pop_request(lambda r: True)
    s.try_pop_request(lambda r: True)
    assert s.push_request("c") is True


def test_stash_preserves_fifo():
    s = RequestScheduler()
    s.push_request("big")
    s.push_request("small")
    # admission rejects "big": it must be stashed, and "small" must NOT
    # leapfrog it (mpsc_request_scheduler.h:58-88)
    assert s.try_pop_request(lambda r: r == "small") is None
    assert s.get_pending_size() == 2
    assert s.try_pop_request(lambda r: r == "small") is None
    # once the check passes, the stashed request pops first
    assert s.try_pop_request(lambda r: True) == "big"
    assert s.try_pop_request(lambda r: True) == "small"


def test_pending_size():
    s = RequestScheduler()
    assert s.get_pending_size() == 0
    s.push_request(1)
    s.push_request(2)
    assert s.get_pending_size() == 2
    s.try_pop_request(lambda r: False)  # stashes
    assert s.get_pending_size() == 2
    s.try_pop_request(lambda r: True)
    assert s.get_pending_size() == 1


def test_concurrent_producers():
    s = RequestScheduler()
    n_threads, per_thread = 8, 200

    def producer(base):
        for i in range(per_thread):
            s.push_request(base + i)

    threads = [threading.Thread(target=producer, args=(t * 1000,))
               for t in range(n_threads)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    seen = []
    while (r := s.try_pop_request(lambda x: True)) is not None:
        seen.append(r)
    assert len(seen) == n_threads * per_thread
    assert len(set(seen)) == len(seen)
    # per-producer FIFO holds
    for t in range(n_threads):
        mine = [x for x in seen if t * 1000 <= x < t * 1000 + per_thread]
        assert mine == sorted(mine)
