"""sentencepiece backend.

Equivalent of the reference ``TokenizerImplSP``
(``src/tokenizer/tokenizer_impl_sp.h:35-59``), including the single-token
leading-space decode fix-up: sentencepiece drops the leading U+2581 space
marker when decoding a lone token, so a piece beginning with the marker
must re-gain a leading space (``tokenizer_impl_sp.h:53-59``).

Gated: the ``sentencepiece`` module is optional in this environment; the HF
backend covers llama-family tokenizer.json files.
"""

from __future__ import annotations

from typing import List, Sequence

from .base import Tokenizer

_SP_SPACE = "▁"


class SPTokenizer(Tokenizer):
    def __init__(self, model_path: str):
        try:
            import sentencepiece as spm
        except ImportError as e:  # pragma: no cover - env without sp
            raise ImportError(
                "sentencepiece is not installed; use the HF tokenizer backend"
            ) from e
        self._sp = spm.SentencePieceProcessor(model_file=model_path)

    def encode(self, text: str) -> List[int]:
        return list(self._sp.encode(text))

    def decode(self, token_ids: Sequence[int]) -> str:
        ids = list(token_ids)
        text = self._sp.decode(ids)
        if len(ids) == 1:
            # leading-space fix-up for streaming single-token decode
            piece = self._sp.id_to_piece(ids[0])
            if piece.startswith(_SP_SPACE):
                text = " " + text
        return text

    @property
    def bos_id(self) -> int:
        return self._sp.bos_id()

    @property
    def eos_id(self) -> int:
        return self._sp.eos_id()

    @property
    def vocab_size(self) -> int:
        return self._sp.get_piece_size()
