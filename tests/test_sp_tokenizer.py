"""sentencepiece backend tests: the pure-Python ModelProto reader +
unigram codec (``tokenizer/sp_model.py``) and the SPTokenizer wrapper's
single-token leading-space fix-up (parity with the reference,
``tokenizer_impl_sp.h:53-59``)."""

import struct

import pytest

from ppl.llm.serving_tpu.tokenizer.sp_model import (
    SPModel, TYPE_BYTE, TYPE_CONTROL, TYPE_NORMAL, TYPE_UNKNOWN)
from ppl.llm.serving_tpu.tokenizer.sp_tokenizer import SPTokenizer


# -- a tiny protobuf ModelProto writer (test-only) ---------------------------

def _varint(v):
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _field(num, wire, payload):
    return _varint((num << 3) | wire) + payload


def _piece(piece, score, typ):
    body = (_field(1, 2, _varint(len(piece.encode())) + piece.encode())
            + _field(2, 5, struct.pack("<f", score))
            + _field(3, 0, _varint(typ)))
    return _field(1, 2, _varint(len(body)) + body)


def build_model_bytes(pieces, trainer_ids=None):
    data = b"".join(_piece(p, s, t) for p, s, t in pieces)
    if trainer_ids is not None:
        unk, bos, eos = trainer_ids
        body = (_field(40, 0, _varint(unk)) + _field(41, 0, _varint(bos))
                + _field(42, 0, _varint(eos)))
        data += _field(2, 2, _varint(len(body)) + body)
    return data


VOCAB = [
    ("<unk>", 0.0, TYPE_UNKNOWN),
    ("<s>", 0.0, TYPE_CONTROL),
    ("</s>", 0.0, TYPE_CONTROL),
    ("▁hello", -1.0, TYPE_NORMAL),
    ("▁world", -1.5, TYPE_NORMAL),
    ("▁", -4.0, TYPE_NORMAL),
    ("hello", -2.0, TYPE_NORMAL),
    ("wor", -3.0, TYPE_NORMAL),
    ("ld", -3.0, TYPE_NORMAL),
    ("h", -6.0, TYPE_NORMAL),
    ("e", -6.0, TYPE_NORMAL),
    ("l", -6.0, TYPE_NORMAL),
    ("o", -6.0, TYPE_NORMAL),
] + [(f"<0x{b:02X}>", -10.0, TYPE_BYTE) for b in range(256)]


@pytest.fixture
def model(tmp_path):
    p = tmp_path / "tokenizer.model"
    p.write_bytes(build_model_bytes(VOCAB))
    return SPModel.load(str(p))


@pytest.fixture
def tok(tmp_path):
    p = tmp_path / "tokenizer.model"
    p.write_bytes(build_model_bytes(VOCAB))
    return SPTokenizer(str(p))


def test_parse_pieces_and_ids(model):
    assert model.get_piece_size() == len(VOCAB)
    assert model.id_to_piece(3) == "▁hello"
    # no TrainerSpec -> conventional control pieces
    assert model.unk_id == 0 and model.bos_id == 1 and model.eos_id == 2


def test_trainer_spec_ids(tmp_path):
    data = build_model_bytes(VOCAB, trainer_ids=(0, 1, 2))
    m = SPModel.from_bytes(data)
    assert (m.unk_id, m.bos_id, m.eos_id) == (0, 1, 2)


def test_viterbi_prefers_high_score_segmentation(model):
    # "▁hello" (-1.0) beats "▁"+"hello" (-4.0 + -2.0)
    ids = model.encode("hello")
    assert [model.id_to_piece(i) for i in ids] == ["▁hello"]
    ids = model.encode("hello world")
    assert [model.id_to_piece(i) for i in ids] == [
        "▁hello", "▁world"]


def test_multi_piece_segmentation(model):
    # "held" is not in vocab whole: must split via chars/subpieces
    ids = model.encode("world")
    assert [model.id_to_piece(i) for i in ids] == ["▁world"]


def test_roundtrip(model):
    for text in ("hello world", "hello", "world hello hello"):
        assert model.decode(model.encode(text)) == text


def test_byte_fallback_roundtrip(model):
    # "Z" and emoji have no piece: byte pieces must cover them
    text = "hello Zé"
    ids = model.encode(text)
    assert model.decode(ids) == text


def test_control_pieces_skipped_in_decode(model):
    ids = [1] + model.encode("hello") + [2]
    assert model.decode(ids) == "hello"


def test_single_token_leading_space_fixup(tok):
    """The reference's fix: a lone piece starting with U+2581 decodes
    with its leading space restored (sp itself strips it)."""
    wid = next(i for i, (p, _s, _t) in enumerate(VOCAB)
               if p == "▁world")
    assert tok.decode([wid]) == " world"
    # multi-token decode keeps sp semantics (dummy prefix stripped)
    assert tok.decode(tok.encode("hello world")) == "hello world"


def test_wrapper_properties(tok):
    assert tok.bos_id == 1
    assert tok.eos_id == 2
    assert tok.vocab_size == len(VOCAB)


def test_negative_trainer_ids(tmp_path):
    # pad_id=-1 is serialized as a 10-byte negative varint
    body = _field(40, 0, _varint(0)) + _field(
        43, 0, _varint((1 << 64) - 1))
    data = (b"".join(_piece(p, s, t) for p, s, t in VOCAB[:3])
            + _field(2, 2, _varint(len(body)) + body))
    m = SPModel.from_bytes(data)
    assert m.pad_id == -1


def test_streaming_detokenizer_integration(tok):
    """SPTokenizer through the streaming detokenizer path used by the
    generator (decode-per-token with the leading-space fix)."""
    from ppl.llm.serving_tpu.utils.detokenizer import StreamDetokenizer
    det = StreamDetokenizer(tok.decode)
    ids = tok.encode("hello world hello")
    out = "".join(det.feed(i) for i in ids) + det.flush()
    assert "hello" in out and "world" in out
