"""Streaming incremental detokenization.

Behavioral equivalent of the reference ``DecodeAndSendTask`` buffering
(``src/generator/llm_generator.cc:58-112``): decoding a single token that
yields the UTF-8 replacement character U+FFFD means the token is a partial
multi-byte sequence; up to 3 such tokens are buffered and decoded jointly,
after which the buffer flushes. Tokens are streamed as soon as they form
valid UTF-8.
"""

from __future__ import annotations

from typing import Callable, List, Tuple

_REPLACEMENT = "�"
_MAX_BUFFER = 3


class StreamDetokenizer:
    """Per-request incremental decode state (one instance per running tid,
    created lazily and dropped on finish like the reference's
    ``decode_stat``/``decode_buffer`` maps)."""

    def __init__(self, decode_fn: Callable[[List[int]], str]):
        self._decode = decode_fn
        self._buffer: List[int] = []

    def feed(self, token: int) -> str:
        """Feed one generated token; returns the text to stream now
        (may be empty while a partial UTF-8 sequence is buffered)."""
        piece = self._decode([token])
        if _REPLACEMENT not in piece:
            if self._buffer:
                # A buffered partial sequence never completed (e.g. an
                # invalid byte followed by a normal token): flush whatever
                # the joint decode gives so no token is silently dropped.
                joint = self._decode(self._buffer + [token])
                self._buffer.clear()
                return joint
            return piece
        self._buffer.append(token)
        if len(self._buffer) >= _MAX_BUFFER:
            joint = self._decode(self._buffer)
            self._buffer.clear()
            if _REPLACEMENT in joint:
                # Still invalid after 3 tokens: emit as-is, matching the
                # reference's flush-at-3 behavior (llm_generator.cc:92-97).
                return joint
            return joint
        # Buffered partials may already form a valid string (2-token case:
        # the reference waits for 3; we flush as soon as the joint decode is
        # clean, which strictly reduces streaming latency).
        joint = self._decode(self._buffer)
        if _REPLACEMENT not in joint:
            self._buffer.clear()
            return joint
        return ""

    def flush(self) -> str:
        """Drain any buffered tokens (request finished mid-sequence)."""
        if not self._buffer:
            return ""
        joint = self._decode(self._buffer)
        self._buffer.clear()
        return joint
