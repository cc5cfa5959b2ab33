"""StreamDetokenizer: UTF-8 partial-token buffering
(reference behavior at llm_generator.cc:58-112)."""

from ppl.llm.serving_tpu.utils.detokenizer import StreamDetokenizer


class ByteTokenizer:
    """Toy tokenizer: one token = one UTF-8 byte (worst case for streaming)."""

    def decode(self, ids):
        return bytes(ids).decode("utf-8", errors="replace")


def toks(s):
    return list(s.encode("utf-8"))


def test_ascii_passthrough():
    d = StreamDetokenizer(ByteTokenizer().decode)
    out = "".join(d.feed(t) for t in toks("hello"))
    assert out == "hello"


def test_multibyte_buffered():
    d = StreamDetokenizer(ByteTokenizer().decode)
    pieces = [d.feed(t) for t in toks("中")]  # 3 bytes
    assert pieces[:-1] == ["", ""]
    assert pieces[-1] == "中"


def test_two_byte_char_flushes_early():
    d = StreamDetokenizer(ByteTokenizer().decode)
    pieces = [d.feed(t) for t in toks("é")]  # 2 bytes
    assert "".join(pieces) == "é"


def test_mixed_stream():
    d = StreamDetokenizer(ByteTokenizer().decode)
    text = "a中b😀c"  # 1 + 3 + 1 + 4 + 1 bytes
    out = "".join(d.feed(t) for t in toks(text)) + d.flush()
    # 4-byte emoji exceeds the 3-token buffer: the reference flushes the
    # partial after 3; our decoder emits a replacement-bearing flush then
    # the tail. Total visible text must contain all complete chars.
    assert "a" in out and "中" in out and "b" in out and "c" in out


def test_flush_on_finish():
    d = StreamDetokenizer(ByteTokenizer().decode)
    emitted = d.feed(toks("中")[0])
    assert emitted == ""
    assert d.flush() != ""
    assert d.flush() == ""
