"""Tokenizer tests: BPE roundtrip with merges, special-token splitting, SPM
byte-fallback and scored merges, streaming UTF-8 decode."""
import numpy as np

from llamatpu.models.config import Family
from llamatpu.tokenizer import BPETokenizer, SPMTokenizer, StreamDecoder, Vocabulary
from llamatpu.tokenizer.bpe import LLAMA3_PATTERN, bytes_to_unicode
from llamatpu.tokenizer.builders import build_tokenizer


def make_bpe_vocab():
    byte_enc = bytes_to_unicode()
    tokens = [byte_enc[i] for i in range(256)]
    merge_pairs = [("h", "e"), ("l", "l"), ("he", "ll"), ("hell", "o"),
                   ("Ġ", "w"), ("Ġw", "o"), ("Ġwo", "r"), ("Ġwor", "l"), ("Ġworl", "d")]
    merges = [f"{a} {b}" for a, b in merge_pairs]
    tokens += [a + b for a, b in merge_pairs]
    specials = {"<|bos|>": len(tokens), "<|eos|>": len(tokens) + 1}
    tokens += list(specials)
    vocab = Vocabulary(tokens)
    return BPETokenizer(vocab, merges, LLAMA3_PATTERN, specials), vocab


def test_bpe_merges_and_roundtrip():
    tok, vocab = make_bpe_vocab()
    ids = tok.encode("hello world")
    assert tok.decode(ids) == "hello world"
    # "hello" must merge into the single token "hello"
    assert vocab.index_of("hello") in ids
    assert vocab.index_of("Ġworld") in ids
    assert len(ids) == 2


def test_bpe_utf8_roundtrip():
    tok, _ = make_bpe_vocab()
    for text in ["héllo wörld", "日本語テスト", "emoji 🎉 ok", "tabs\tand\nnewlines"]:
        assert tok.decode(tok.encode(text)) == text


def test_bpe_special_token_splitting():
    tok, _ = make_bpe_vocab()
    ids = tok.encode("<|bos|>hello<|eos|>", allowed_special="all")
    assert ids[0] == tok.special_tokens["<|bos|>"]
    assert ids[-1] == tok.special_tokens["<|eos|>"]
    # without allowance, specials are encoded as plain text
    ids2 = tok.encode("<|bos|>", allowed_special="none")
    assert tok.special_tokens["<|bos|>"] not in ids2


def make_spm_vocab():
    tokens = ["<unk>", "<s>", "</s>"]
    scores = [0.0, 0.0, 0.0]
    types = [2, 3, 3]
    for b in range(256):
        tokens.append(f"<0x{b:02X}>")
        scores.append(0.0)
        types.append(6)
    pieces = [("▁", -1.0), ("h", -1.0), ("e", -1.0), ("l", -1.0), ("o", -1.0),
              ("he", -2.0), ("ll", -2.5), ("hell", -3.0), ("hello", -3.5), ("▁hello", -4.0)]
    for s, sc in pieces:
        tokens.append(s)
        scores.append(sc)
        types.append(1)
    vocab = Vocabulary(tokens, scores, types)
    return SPMTokenizer(vocab, {"<s>": 1, "</s>": 2})


def test_spm_scored_merge():
    tok = make_spm_vocab()
    ids = tok.encode(" hello")
    assert ids == [tok.vocabulary.index_of("▁hello")]
    assert tok.decode(ids) == " hello"


def test_spm_byte_fallback():
    tok = make_spm_vocab()
    ids = tok.encode("hé")  # é not in vocab -> two byte tokens
    assert len(ids) == 3
    assert tok.decode(ids) == "hé"


def test_stream_decoder_partial_codepoints():
    tok, _ = make_bpe_vocab()
    ids = tok.encode("héllo 🎉")
    sd = StreamDecoder(tok)
    out = "".join(sd.push(i) for i in ids) + sd.flush()
    assert out == "héllo 🎉"


def test_builder_from_tiny_gguf(tmp_path):
    import tiny_models
    from llamatpu.gguf import GGUFReader

    tiny_models.build_tiny_gguf(tmp_path / "m.gguf", family="llama", with_tokenizer=True)
    with GGUFReader(tmp_path / "m.gguf") as r:
        tok = build_tokenizer(Family.LLAMA_3, r.metadata)
    ids = tok.encode("hello world")
    assert tok.decode(ids) == "hello world"
    assert tok.special_tokens["<|begin_of_text|>"] == 265
    assert not tok.should_display_token(265)
