"""Connection abstraction between the generator and a frontend.

Mirrors ``src/common/connection.h:28-35``: the generator calls up into the
frontend via ``send`` / ``notify_failure`` / ``on_tokenize`` /
``on_profiling``. ``LocalConnection`` is the offline-mode implementation
(``tools/offline_inference.cc:234-301``) used by tools and tests.
"""

from __future__ import annotations

import threading
from typing import Callable, Dict, List, Optional, Sequence

from .request import FinishFlag, Response


class Connection:
    """Upcall interface from the generator (``connection.h:28-35``)."""

    def send(self, responses: Sequence[Response]) -> None:
        raise NotImplementedError

    def notify_failure(self, tid: int, rc: int = 1, msg: str = "") -> None:
        raise NotImplementedError

    def on_tokenize(self, tid: int, token_ids: Sequence[int]) -> None:
        pass

    def on_profiling(self, profiler) -> None:
        pass


class LocalConnection(Connection):
    """Collects streamed tokens in-process and supports blocking waits.

    Equivalent behavior to the reference LocalConnection: a condition
    variable counts finished requests (``offline_inference.cc:234-301``);
    additionally records per-request text/tokens/first-token timestamps for
    the offline benchmark tools (``benchmark_prefix_cache_offline.cc:233-237``).
    """

    def __init__(self, on_first_token: Optional[Callable[[int], None]] = None):
        self._cond = threading.Condition()
        self._wanted = 0
        self._finished = 0
        self.texts: Dict[int, List[str]] = {}
        self.tokens: Dict[int, List[int]] = {}
        self.logprobs: Dict[int, List[float]] = {}
        self.finish_flags: Dict[int, FinishFlag] = {}
        self.failures: Dict[int, str] = {}
        self.prompt_tokens: Dict[int, List[int]] = {}
        self._on_first_token = on_first_token

    def set_wanted(self, n: int) -> None:
        with self._cond:
            self._wanted = n
            self._finished = 0

    def send(self, responses: Sequence[Response]) -> None:
        with self._cond:
            for rsp in responses:
                first = rsp.id not in self.tokens
                self.texts.setdefault(rsp.id, []).append(rsp.generated)
                self.tokens.setdefault(rsp.id, []).append(rsp.token)
                self.logprobs.setdefault(rsp.id, []).append(rsp.logprob)
                if first and self._on_first_token is not None:
                    self._on_first_token(rsp.id)
                if rsp.finish_flag != FinishFlag.NOT_FINISHED:
                    self.finish_flags[rsp.id] = rsp.finish_flag
                    self._finished += 1
            if self._finished >= self._wanted:
                self._cond.notify_all()

    def notify_failure(self, tid: int, rc: int = 1, msg: str = "") -> None:
        with self._cond:
            self.failures[tid] = msg
            self._finished += 1
            if self._finished >= self._wanted:
                self._cond.notify_all()

    def on_tokenize(self, tid: int, token_ids: Sequence[int]) -> None:
        self.prompt_tokens[tid] = list(token_ids)

    def wait(self, timeout: Optional[float] = None) -> bool:
        with self._cond:
            return self._cond.wait_for(
                lambda: self._finished >= self._wanted, timeout=timeout
            )

    def text(self, tid: int) -> str:
        return "".join(self.texts.get(tid, []))
