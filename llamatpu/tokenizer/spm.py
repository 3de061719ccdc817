"""SentencePiece-flavored score-based BPE with byte fallback.

Used by Mistral and Phi-3: spaces become '▁', each codepoint maps to a vocab
entry (or falls back to per-byte '<0xNN>' tokens), then the highest-scoring
adjacent pair merges until no pair exists in the vocab — matching the reference
(tokenizer/MistralTokenizer.java:82-137, Phi3Tokenizer.java).
"""
from __future__ import annotations

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

    def _encode_ordinary(self, text: str) -> list[int]:
        text = text.replace(" ", SPACE)
        ids: list[int] = []
        for ch in text:
            i = self.vocabulary.index_of(ch)
            if i is not None:
                ids.append(i)
            else:
                for b in ch.encode("utf-8"):
                    ids.append(self.byte0 + b)
        # greedy merge of the best-scoring adjacent pair
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
