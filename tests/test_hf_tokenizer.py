"""Real HF `tokenizers` backend coverage (the reference wraps the same
Rust core via tokenizers-cpp FFI, tokenizer_impl_hf.h:76-137): a tiny
BPE trained in-test exercises HFTokenizer, the BOS-policy model
wrappers, factory resolution, and streaming detokenization."""

import json

import pytest

tokenizers = pytest.importorskip("tokenizers")

from ppl.llm.serving_tpu.tokenizer import create_tokenizer
from ppl.llm.serving_tpu.tokenizer.hf_tokenizer import HFTokenizer
from ppl.llm.serving_tpu.utils import StreamDetokenizer


@pytest.fixture(scope="module")
def tok_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("hftok")
    from tokenizers import Tokenizer, models, pre_tokenizers, trainers, \
        decoders
    tok = Tokenizer(models.BPE(unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=400, special_tokens=["<unk>", "<s>", "</s>"])
    corpus = ["hello world", "the quick brown fox jumps over the lazy dog",
              "tensor processing units serve tokens", "hola señor 你好"]
    tok.train_from_iterator(corpus * 10, trainer)
    tok.save(str(d / "tokenizer.json"))
    (d / "tokenizer_config.json").write_text(json.dumps(
        {"bos_token": "<s>", "eos_token": {"content": "</s>"}}))
    return d


def test_roundtrip(tok_dir):
    t = HFTokenizer(str(tok_dir / "tokenizer.json"),
                    str(tok_dir / "tokenizer_config.json"))
    ids = t.encode("hello world")
    assert ids and all(isinstance(i, int) for i in ids)
    assert t.decode(ids) == "hello world"


def test_bos_eos_from_config(tok_dir):
    t = HFTokenizer(str(tok_dir / "tokenizer.json"),
                    str(tok_dir / "tokenizer_config.json"))
    assert t.bos_id == 1 and t.eos_id == 2


def test_model_wrapper_bos_policy(tok_dir):
    # llama prepends BOS (llama_tokenizer.h:35-38); baichuan does not
    # (baichuan_tokenizer.h:35-37)
    llama = create_tokenizer("llama", str(tok_dir / "tokenizer.json"), "hf",
                             str(tok_dir / "tokenizer_config.json"))
    baichuan = create_tokenizer("baichuan", str(tok_dir / "tokenizer.json"),
                                "hf", str(tok_dir / "tokenizer_config.json"))
    ids_l = llama.encode("hello world")
    ids_b = baichuan.encode("hello world")
    assert ids_l[0] == llama.bos_id
    assert ids_b == ids_l[1:]


def test_streaming_detokenizer_utf8(tok_dir):
    """Streaming decode must buffer partial UTF-8 (U+FFFD) and emit the
    same text as a one-shot decode (DecodeAndSendTask's 3-token buffer,
    llm_generator.cc:58-112)."""
    t = HFTokenizer(str(tok_dir / "tokenizer.json"),
                    str(tok_dir / "tokenizer_config.json"))
    text = "hola señor 你好 dog"
    ids = t.encode(text)
    det = StreamDetokenizer(t.decode)
    out = "".join(det.feed(i) for i in ids) + det.flush()
    assert out == text
