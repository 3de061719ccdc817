"""Adversarial tokenizer fidelity suite (round-2 hardening).

Anchors the compressed 2-engine tokenizer layer against the edge cases the
reference's six per-family tokenizer classes handle explicitly
(tokenizer/LlamaTokenizer.java:30-63, MistralTokenizer.java:82-137,
DevstralTokenizer.java:21): emoji/ZWJ clusters, CJK, lone surrogates,
partial UTF-8 across token boundaries, digit-run pattern splits, contraction
casing — plus the fast SPM heap merge cross-checked against the slow exact
rescan oracle, and the BPE unmappable-char regression (the round-1 bug
silently dropped the rest of a chunk)."""
import random

import regex

from llamatpu.tokenizer import BPETokenizer, SPMTokenizer, StreamDecoder, Vocabulary
from llamatpu.tokenizer.bpe import (GRANITE_DBRX_PATTERN, LLAMA3_PATTERN,
                                    QWEN_PATTERN, bytes_to_unicode)

from llamatpu.tokenizer.adversarial import ADVERSARIAL_TEXTS


# -- fixtures ---------------------------------------------------------------

def full_byte_bpe(pattern=LLAMA3_PATTERN, n_random_merges=400, seed=3):
    """Byte-level BPE with all 256 byte chars + randomized merge list (mimics
    a real vocab's long merge tail: merges reference earlier merge outputs)."""
    byte_enc = bytes_to_unicode()
    tokens = [byte_enc[i] for i in range(256)]
    rng = random.Random(seed)
    merges = []
    for _ in range(n_random_merges):
        a, b = rng.choice(tokens), rng.choice(tokens)
        if len(a) + len(b) > 12 or (a + b) in tokens:
            continue
        merges.append(f"{a} {b}")
        tokens.append(a + b)
    specials = {"<|bos|>": len(tokens), "<|eos|>": len(tokens) + 1}
    tokens += list(specials)
    return BPETokenizer(Vocabulary(tokens), merges, pattern, specials)


def scored_spm(n_pieces=600, seed=11):
    """SPM vocab with byte fallback + randomized multi-char pieces/scores."""
    tokens = ["<unk>", "<s>", "</s>"]
    scores = [0.0, 0.0, 0.0]
    for b in range(256):
        tokens.append(f"<0x{b:02X}>")
        scores.append(0.0)
    alphabet = "abcdehlo▁"  # includes the SPM space marker
    seen = set(tokens)
    rng = random.Random(seed)
    for ch in alphabet:
        tokens.append(ch)
        scores.append(-1.0)
        seen.add(ch)
    for _ in range(n_pieces):
        piece = "".join(rng.choice(alphabet) for _ in range(rng.randint(2, 6)))
        if piece in seen:
            continue
        seen.add(piece)
        tokens.append(piece)
        scores.append(-rng.uniform(1.0, 8.0))
    vocab = Vocabulary(tokens, scores=scores)
    return SPMTokenizer(vocab, {"<s>": 1, "</s>": 2})


# -- BPE --------------------------------------------------------------------

def test_bpe_adversarial_roundtrip():
    for pattern in (LLAMA3_PATTERN, QWEN_PATTERN, GRANITE_DBRX_PATTERN):
        tok = full_byte_bpe(pattern)
        for text in ADVERSARIAL_TEXTS:
            assert tok.decode(tok.encode(text)) == text, (pattern[:20], text[:40])


def test_bpe_lone_surrogate_no_crash():
    # JSON '"\ud800"' parses to a str holding a lone surrogate — the server
    # must not crash; it encodes as U+FFFD
    tok = full_byte_bpe()
    text = "ok \ud800 done"
    ids = tok.encode(text)
    assert tok.decode(ids) == "ok ? done"  # utf-8 errors="replace" emits '?' 


def test_bpe_unmappable_char_keeps_rest_of_chunk():
    """Round-1 regression: an unmappable byte char silently dropped the REST
    of the chunk; now it skips only that char."""
    byte_enc = bytes_to_unicode()
    tokens = [byte_enc[i] for i in range(256)]
    victim = byte_enc["é".encode("utf-8")[0]]  # drop é's lead byte from vocab
    tokens.remove(victim)
    tok = BPETokenizer(Vocabulary(tokens), [], LLAMA3_PATTERN, {})
    ids = tok.encode("héllo")  # one chunk: h é l l o
    # é is unencodable (lead byte missing) but h + llo must all survive
    decoded = tok.decode(ids)
    assert "h" in decoded and "llo" in decoded


def test_digit_run_pattern_split():
    """llama3/dbrx split digit runs into {1,3} groups; qwen per-digit."""
    four = "1234"
    assert regex.compile(LLAMA3_PATTERN).findall(four) == ["123", "4"]
    assert regex.compile(QWEN_PATTERN).findall(four) == ["1", "2", "3", "4"]
    assert regex.compile(GRANITE_DBRX_PATTERN).findall(four) == ["123", "4"]
    # digits never glue to preceding letters in any pattern
    for pat in (LLAMA3_PATTERN, QWEN_PATTERN, GRANITE_DBRX_PATTERN):
        chunks = regex.compile(pat).findall("abc123")
        assert chunks[0] == "abc"


def test_contraction_casing_split():
    """llama3's (?i:'s|...) matches any case; qwen enumerates case pairs —
    both must take the contraction branch for upper and lower case."""
    for pat in (LLAMA3_PATTERN, QWEN_PATTERN):
        for text in ("don't", "DON'T"):
            chunks = regex.compile(pat).findall(text)
            assert chunks[-1].lower() == "'t", (pat[:20], text, chunks)


def test_bpe_merge_priority_order():
    """Merges must apply by rank, not adjacency order: with ranks
    [l l] < [he ll] the word 'hello' becomes he+ll+o -> hell+o only if
    (he,ll) exists; a later-rank (e,l) must not preempt (l,l)."""
    byte_enc = bytes_to_unicode()
    tokens = [byte_enc[i] for i in range(256)]
    merges = ["h e", "l l", "e l", "he ll", "hell o"]
    for m in merges:
        a, b = m.split(" ")
        tokens.append(a + b)
    tok = BPETokenizer(Vocabulary(tokens), merges, LLAMA3_PATTERN, {})
    ids = tok.encode("hello")
    assert [tok.vocabulary.get(i) for i in ids] == ["hello"]


# -- SPM fast merge vs exact oracle ------------------------------------------

def test_spm_fast_matches_slow_oracle_random():
    tok = scored_spm()
    rng = random.Random(0)
    alphabet = "abcdehlo "
    for trial in range(60):
        text = "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 80)))
        fast = tok.encode_ordinary(text)
        slow = tok._encode_ordinary_slow(text)
        assert fast == slow, (trial, text)
        assert tok.decode(fast) == text.replace("▁", " ")


def test_spm_fast_matches_slow_on_adversarial():
    tok = scored_spm()
    for text in ADVERSARIAL_TEXTS:
        fast = tok.encode_ordinary(text)
        slow = tok._encode_ordinary_slow(text)
        assert fast == slow, text[:40]


def test_spm_byte_fallback_roundtrip_unicode():
    tok = scored_spm()
    for text in ("日本語", "🎉", "héllo", "\x00\x7f"):
        ids = tok.encode_ordinary(text)
        assert tok.decode(ids) == text
        # non-alphabet chars must ride the <0xNN> byte tokens
        assert any(tok.byte0 <= i < tok.byte0 + 256 for i in ids)


def test_spm_long_text_linear():
    """20k chars through the heap merge completes (the O(n^2) rescan took
    minutes at this size); equality vs oracle checked on a 1k slice."""
    tok = scored_spm()
    rng = random.Random(7)
    text = "".join(rng.choice("abcdehlo ") for _ in range(20000))
    ids = tok.encode_ordinary(text)
    assert tok.decode(ids) == text
    assert tok.encode_ordinary(text[:1000]) == tok._encode_ordinary_slow(text[:1000])


def test_spm_lone_surrogate_no_crash():
    tok = scored_spm()
    ids = tok.encode_ordinary("ok \ud800 done")
    assert tok.decode(ids) == "ok ? done"  # utf-8 errors="replace" emits '?' 


# -- streaming UTF-8 across token boundaries ---------------------------------

def test_stream_partial_utf8_across_tokens_spm():
    """A 4-byte emoji split across four byte-fallback tokens must emerge only
    once complete — no replacement chars mid-stream."""
    tok = scored_spm()
    ids = tok.encode_ordinary("🎉")
    byte_ids = [i for i in ids if tok.byte0 <= i < tok.byte0 + 256]
    assert len(byte_ids) == 4
    sd = StreamDecoder(tok)
    outs = [sd.push(i) for i in byte_ids]
    assert outs[:3] == ["", "", ""] and outs[3] == "🎉"
    assert sd.flush() == ""


def test_stream_mixed_complete_and_partial():
    tok = full_byte_bpe()
    ids = tok.encode("ab 日")  # multibyte at the end
    sd = StreamDecoder(tok)
    text = "".join(sd.push(i) for i in ids) + sd.flush()
    assert text == "ab 日"


def test_stream_flush_emits_replacement_for_dangling_bytes():
    tok = scored_spm()
    sd = StreamDecoder(tok)
    out = sd.push(tok.byte0 + 0xE6)  # lone UTF-8 lead byte
    assert out == ""
    assert sd.flush() == "�"
