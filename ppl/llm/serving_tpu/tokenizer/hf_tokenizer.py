"""HuggingFace ``tokenizers`` backend.

Equivalent of the reference ``TokenizerImplHF`` which wraps the Rust
``tokenizers-cpp`` FFI and reads bos/eos from ``tokenizer_config.json``
(``src/tokenizer/tokenizer_impl_hf.h:76-137``). Here we use the HF
``tokenizers`` Python package directly (same Rust core underneath).
"""

from __future__ import annotations

import json
import os
from typing import List, Optional, Sequence

from .base import Tokenizer


def _token_from_config(value) -> Optional[str]:
    """tokenizer_config.json stores bos/eos either as a plain string or an
    AddedToken dict ({"content": ...})."""
    if value is None:
        return None
    if isinstance(value, str):
        return value
    if isinstance(value, dict):
        return value.get("content")
    return None


class HFTokenizer(Tokenizer):
    def __init__(self, tokenizer_json_path: str,
                 tokenizer_config_path: Optional[str] = None):
        from tokenizers import Tokenizer as RustTokenizer

        self._tok = RustTokenizer.from_file(tokenizer_json_path)
        bos_token = eos_token = None
        if tokenizer_config_path and os.path.exists(tokenizer_config_path):
            with open(tokenizer_config_path) as f:
                cfg = json.load(f)
            bos_token = _token_from_config(cfg.get("bos_token"))
            eos_token = _token_from_config(cfg.get("eos_token"))
        self._bos_id = (self._tok.token_to_id(bos_token)
                        if bos_token is not None else None)
        self._eos_id = (self._tok.token_to_id(eos_token)
                        if eos_token is not None else None)
        if self._bos_id is None:
            self._bos_id = self._tok.token_to_id("<s>") or 1
        if self._eos_id is None:
            self._eos_id = self._tok.token_to_id("</s>") or 2

    def encode(self, text: str) -> List[int]:
        # add_special_tokens=False: BOS policy belongs to the model wrapper
        # (tokenizer_impl_hf.h encodes raw; wrappers prepend).
        return self._tok.encode(text, add_special_tokens=False).ids

    def decode(self, token_ids: Sequence[int]) -> str:
        return self._tok.decode(list(token_ids), skip_special_tokens=False)

    @property
    def bos_id(self) -> int:
        return self._bos_id

    @property
    def eos_id(self) -> int:
        return self._eos_id

    @property
    def vocab_size(self) -> int:
        return self._tok.get_vocab_size()
