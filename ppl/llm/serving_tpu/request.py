"""Request/response types.

Mirrors the reference's ``src/common/request.h:29-46`` and
``src/common/response.h:27-41``.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Optional


class FinishFlag(enum.IntEnum):
    """``response.h:27-32``; values align with proto FinishReason mapping
    (NOT_FINISHED is wire Status PROCESSING, the rest map to FinishReason)."""

    NOT_FINISHED = 0
    LENGTH = 1
    EOS_TOKEN = 2
    STOP_SEQUENCE = 3


@dataclasses.dataclass
class Request:
    """An inference request (``request.h:29-46``).

    Exactly one of ``prompt`` / ``token_ids`` is set by the client;
    ``token_ids`` set by the client means token-in-out mode
    (``llm_generator.cc:790-792``): responses carry raw token ids and no
    detokenized text.
    """

    id: int
    prompt: str = ""
    token_ids: Optional[list] = None

    temperature: float = 1.0
    top_p: float = 0.0
    top_k: int = 0
    repetition_penalty: float = 1.0
    presence_penalty: float = 0.0
    frequency_penalty: float = 0.0

    generation_length: int = 0
    early_stopping: bool = True
    stop_tokens: Optional[set] = None

    is_token_in_out: bool = False


@dataclasses.dataclass
class Response:
    """One streamed token (``response.h:34-41``)."""

    id: int
    generated: str = ""
    token: int = -1
    finish_flag: FinishFlag = FinishFlag.NOT_FINISHED
    logprob: float = 0.0
    is_special: bool = False
