"""GPT-2-style byte-level BPE with an explicit merges list.

Used (with per-family regex pretokenizers and special-token policies) by
Llama-3, Qwen2/Qwen3, Granite, and Devstral/Tekken — behavior matches the
reference tokenizers (tokenizer/LlamaTokenizer.java:30-63, Qwen3Tokenizer.java,
GraniteTokenizer.java, DevstralTokenizer.java): text is split by the regex, each
chunk mapped bytes->printable-unicode (bytes_to_unicode), then pairs are merged
by merge-list priority; special tokens split the text first and encode as
single ids.
"""
from __future__ import annotations

import functools
import logging

import regex

log = logging.getLogger(__name__)

# Pretokenizer regexes (verbatim semantics from the reference tokenizers)
LLAMA3_PATTERN = r"(?i:'s|'t|'re|'ve|'m|'ll|'d)|[^\r\n\p{L}\p{N}]?\p{L}+|\p{N}{1,3}| ?[^\s\p{L}\p{N}]+[\r\n]*|\s*[\r\n]+|\s+(?!\S)|\s+"
QWEN_PATTERN = r"(?:'[sS]|'[tT]|'[rR][eE]|'[vV][eE]|'[mM]|'[lL][lL]|'[dD])|[^\r\n\p{L}\p{N}]?\p{L}+|\p{N}| ?[^\s\p{L}\p{N}]+[\r\n]*|\s*[\r\n]+|\s+(?!\S)|\s+"
GRANITE_PATTERN = LLAMA3_PATTERN  # refact pretokenizer (GraniteTokenizer.java:28)
GRANITE_DBRX_PATTERN = r"(?:'[sS]|'[tT]|'[rR][eE]|'[vV][eE]|'[mM]|'[lL][lL]|'[dD])|[^\r\n\p{L}\p{N}]?\p{L}+|\p{N}{1,3}| ?[^\s\p{L}\p{N}]+[\r\n]*|\s*[\r\n]+|\s+(?!\S)|\s+"
TEKKEN_PATTERN = LLAMA3_PATTERN


@functools.lru_cache(maxsize=1)
def bytes_to_unicode() -> dict[int, str]:
    """GPT-2's reversible byte -> printable unicode char mapping."""
    bs = list(range(ord("!"), ord("~") + 1)) + list(range(0xA1, 0xAD)) + list(range(0xAE, 0x100))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return {b: chr(c) for b, c in zip(bs, cs)}


@functools.lru_cache(maxsize=1)
def unicode_to_bytes() -> dict[str, int]:
    return {v: k for k, v in bytes_to_unicode().items()}


class BPETokenizer:
    def __init__(self, vocabulary, merges_lines: list[str], pattern: str,
                 special_tokens: dict[str, int]):
        self.vocabulary = vocabulary
        self.pattern = regex.compile(pattern)
        self.special_tokens = dict(special_tokens)
        self._special_ids = set(special_tokens.values())
        # merge ranks: (id_a, id_b) -> (rank, merged_id)
        self.merges: dict[tuple[int, int], tuple[int, int]] = {}
        for rank, line in enumerate(merges_lines):
            a, b = line.split(" ")
            ia, ib = vocabulary.index_of(a), vocabulary.index_of(b)
            im = vocabulary.index_of(a + b)
            if ia is None or ib is None or im is None:
                continue
            self.merges[(ia, ib)] = (rank, im)
        self._byte_enc = bytes_to_unicode()
        self._byte_dec = unicode_to_bytes()
        if self.special_tokens:
            self._special_re = regex.compile(
                "(" + "|".join(regex.escape(t) for t in sorted(self.special_tokens, key=len, reverse=True)) + ")")
        else:
            self._special_re = None

    # -- encode -----------------------------------------------------------

    def _encode_chunk(self, chunk: str) -> list[int]:
        # errors="replace": a lone surrogate (reachable via JSON "\ud800" in a
        # server request) must not crash encode — it becomes U+FFFD bytes
        s = "".join(self._byte_enc[b] for b in chunk.encode("utf-8", errors="replace"))
        ids = []
        for ch in s:
            i = self.vocabulary.index_of(ch)
            if i is None:
                # a byte-level vocab contains all 256 byte chars, so this only
                # happens with a truncated/corrupt vocab: skip THIS char and
                # keep encoding (previously the rest of the chunk was silently
                # dropped), warning once per tokenizer
                if not getattr(self, "_warned_unmappable", False):
                    self._warned_unmappable = True
                    log.warning("vocab is missing byte-level char %r (0x%02x); "
                                "skipping occurrences", ch, self._byte_dec.get(ch, 0))
                continue
            ids.append(i)
        while len(ids) > 1:
            best = None
            for i in range(len(ids) - 1):
                m = self.merges.get((ids[i], ids[i + 1]))
                if m is not None and (best is None or m[0] < best[0]):
                    best = (m[0], i, m[1])
            if best is None:
                break
            _, i, merged = best
            ids = ids[:i] + [merged] + ids[i + 2 :]
        return ids

    def encode_ordinary(self, text: str) -> list[int]:
        ids: list[int] = []
        for chunk in self.pattern.findall(text):
            ids.extend(self._encode_chunk(chunk))
        return ids

    def encode(self, text: str, allowed_special: set[str] | str = "none") -> list[int]:
        if allowed_special == "all":
            allowed = set(self.special_tokens)
        elif allowed_special in ("none", None):
            allowed = set()
        else:
            allowed = set(allowed_special)
        if not allowed or self._special_re is None:
            return self.encode_ordinary(text)
        ids: list[int] = []
        for part in self._special_re.split(text):
            if part in allowed:
                ids.append(self.special_tokens[part])
            elif part:
                ids.extend(self.encode_ordinary(part))
        return ids

    # -- decode -----------------------------------------------------------

    def decode_token_bytes(self, token_id: int) -> bytes:
        """Raw UTF-8 bytes of one token (for streaming partial-codepoint handling)."""
        s = self.vocabulary.get(token_id)
        if token_id in self._special_ids:
            return s.encode("utf-8")
        return bytes(self._byte_dec.get(c, ord("?") & 0xFF) for c in s)

    def decode(self, ids: list[int]) -> str:
        return b"".join(self.decode_token_bytes(i) for i in ids).decode("utf-8", errors="replace")

    # -- policy -----------------------------------------------------------

    def is_special(self, token_id: int) -> bool:
        return token_id in self._special_ids

    def should_display_token(self, token_id: int) -> bool:
        return token_id not in self._special_ids
