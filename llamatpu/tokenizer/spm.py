"""SentencePiece-flavored score-based BPE with byte fallback.

Used by Mistral and Phi-3: spaces become '▁', each codepoint maps to a vocab
entry (or falls back to per-byte '<0xNN>' tokens), then the highest-scoring
adjacent pair merges until no pair exists in the vocab — matching the reference
(tokenizer/MistralTokenizer.java:82-137, Phi3Tokenizer.java).
"""
from __future__ import annotations

import heapq

import regex

from llamatpu.tokenizer.vocabulary import Vocabulary

SPACE = "▁"  # ▁


class SPMTokenizer:
    def __init__(self, vocabulary: Vocabulary, special_tokens: dict[str, int],
                 add_leading_space: bool = False):
        self.vocabulary = vocabulary
        self.special_tokens = dict(special_tokens)
        self._special_ids = set(special_tokens.values())
        b0 = vocabulary.index_of("<0x00>")
        if b0 is None:
            raise ValueError("SPM tokenizer requires <0x00> byte-fallback tokens")
        self.byte0 = b0
        self.add_leading_space = add_leading_space
        if self.special_tokens:
            self._special_re = regex.compile(
                "(" + "|".join(regex.escape(t) for t in sorted(self.special_tokens, key=len, reverse=True)) + ")")
        else:
            self._special_re = None

    def _char_ids(self, text: str) -> list[int]:
        text = text.replace(" ", SPACE)
        ids: list[int] = []
        for ch in text:
            i = self.vocabulary.index_of(ch)
            if i is not None:
                ids.append(i)
            else:
                # errors="replace": lone surrogates (reachable via JSON
                # "\ud800") fall back to U+FFFD's bytes instead of crashing
                for b in ch.encode("utf-8", errors="replace"):
                    ids.append(self.byte0 + b)
        return ids

    def _encode_ordinary(self, text: str) -> list[int]:
        """Heap-driven merge: O(n log n) over adjacent pairs (the round-1
        whole-text rescan was O(n^2) — perplexity corpora crawled). Semantics
        identical to _encode_ordinary_slow: repeatedly merge the
        highest-scoring in-vocab adjacent pair, leftmost on score ties."""
        ids = self._char_ids(text)
        n = len(ids)
        if n < 2:
            return ids
        vals = list(ids)
        alive = [True] * n
        nxt = list(range(1, n)) + [-1]
        prv = [-1] + list(range(n - 1))
        heap: list[tuple[float, int, int, int, int]] = []

        def push(i: int) -> None:
            j = nxt[i]
            if j == -1:
                return
            merged = self.vocabulary.get(vals[i]) + self.vocabulary.get(vals[j])
            m = self.vocabulary.index_of(merged)
            if m is not None:
                # (-score, left position) orders by score desc then leftmost;
                # stale entries are detected by the recorded pair values
                heapq.heappush(heap, (-self.vocabulary.score(m), i, vals[i], vals[j], m))

        for i in range(n - 1):
            push(i)
        while heap:
            _, i, vi, vj, m = heapq.heappop(heap)
            j = nxt[i]
            if not alive[i] or j == -1 or vals[i] != vi or vals[j] != vj:
                continue  # stale: one side already merged away
            vals[i] = m
            alive[j] = False
            nxt[i] = nxt[j]
            if nxt[j] != -1:
                prv[nxt[j]] = i
            if prv[i] != -1:
                push(prv[i])
            push(i)
        return [vals[i] for i in range(n) if alive[i]]

    def _encode_ordinary_slow(self, text: str) -> list[int]:
        """Direct transcription of the merge rule (reference semantics,
        MistralTokenizer.java:82-137): rescan all adjacent pairs, merge the
        best-scoring one, repeat. O(n^2) — kept as the oracle the fast
        heap encoder is tested against (tests/test_tokenizer.py)."""
        ids = self._char_ids(text)
        while True:
            best_score, best_idx, best_id = -1e10, -1, -1
            for i in range(len(ids) - 1):
                merged = self.vocabulary.get(ids[i]) + self.vocabulary.get(ids[i + 1])
                j = self.vocabulary.index_of(merged)
                if j is not None and self.vocabulary.score(j) > best_score:
                    best_score, best_idx, best_id = self.vocabulary.score(j), i, j
            if best_idx == -1:
                break
            ids = ids[:best_idx] + [best_id] + ids[best_idx + 2 :]
        return ids

    def encode(self, text: str, allowed_special: set[str] | str = "none") -> list[int]:
        if allowed_special == "all":
            allowed = set(self.special_tokens)
        elif allowed_special in ("none", None):
            allowed = set()
        else:
            allowed = set(allowed_special)
        if not allowed or self._special_re is None:
            return self._encode_ordinary(text)
        ids: list[int] = []
        for part in self._special_re.split(text):
            if part in allowed:
                ids.append(self.special_tokens[part])
            elif part:
                ids.extend(self._encode_ordinary(part))
        return ids

    def encode_ordinary(self, text: str) -> list[int]:
        return self._encode_ordinary(text)

    def decode_token_bytes(self, token_id: int) -> bytes:
        s = self.vocabulary.get(token_id)
        if len(s) == 6 and s.startswith("<0x") and s.endswith(">"):
            try:
                return bytes([int(s[3:5], 16)])
            except ValueError:
                pass
        return s.replace(SPACE, " ").encode("utf-8")

    def decode(self, ids: list[int]) -> str:
        return b"".join(self.decode_token_bytes(i) for i in ids).decode("utf-8", errors="replace")

    def is_special(self, token_id: int) -> bool:
        return token_id in self._special_ids

    def should_display_token(self, token_id: int) -> bool:
        return token_id not in self._special_ids
