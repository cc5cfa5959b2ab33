"""FIFO-preserving request admission queue.

Equivalent of the reference ``MPSCRequestScheduler``
(``src/utils/mpsc_request_scheduler.h:27-110``): frontend threads push
requests; the single generate thread pops them through an admission
predicate. A one-deep "stash" holds a request whose admission check failed
so FIFO order is preserved across steps
(``mpsc_request_scheduler.h:58-88``). The reference's lock-free MPSC queue
is replaced by a mutex-protected deque — at serving request rates the lock
is nanoseconds per op and never on the device-critical path.
"""

from __future__ import annotations

import threading
from collections import deque
from typing import Callable, Optional, TypeVar

T = TypeVar("T")


class RequestScheduler:
    def __init__(self):
        self._lock = threading.Lock()
        self._queue: deque = deque()
        self._stash = None
        self._has_stash = False

    def push_request(self, req) -> bool:
        """Returns True if the queue may have been empty before the push —
        the caller uses it to wake the generate thread
        (``mpsc_request_scheduler.h:52-56``)."""
        with self._lock:
            was_empty = not self._queue and not self._has_stash
            self._queue.append(req)
            return was_empty

    def try_pop_request(self, check_func: Callable[[T], bool]) -> Optional[T]:
        """Pop the oldest request iff ``check_func(req)`` accepts it;
        otherwise stash it and return None (keeping FIFO order)."""
        with self._lock:
            if self._has_stash:
                req = self._stash
                if not check_func(req):
                    return None
                self._stash, self._has_stash = None, False
                return req
            if not self._queue:
                return None
            req = self._queue.popleft()
        # Run the (potentially slow: hashing, allocation) admission check
        # outside the lock; only this consumer thread touches the stash.
        if not check_func(req):
            with self._lock:
                self._stash, self._has_stash = req, True
            return None
        return req

    def get_pending_size(self) -> int:
        with self._lock:
            return len(self._queue) + (1 if self._has_stash else 0)
