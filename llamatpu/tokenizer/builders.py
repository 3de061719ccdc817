"""Per-family tokenizer construction from GGUF metadata.

Special-token policies mirror the reference's per-family tokenizer classes
(SURVEY.md §2.7): GGML token types (CONTROL/USER_DEFINED/...) mark specials
where available, with family fallbacks (Llama-3's ids>=128000 rule,
LlamaTokenizer.java:47; Phi-3's base-32000 rule; Qwen3 removing <think> tokens
from the special set so reasoning renders as text, Qwen3Tokenizer.java:67-72).
"""
from __future__ import annotations

from llamatpu.models.config import Family
from llamatpu.tokenizer.bpe import (
    BPETokenizer, GRANITE_DBRX_PATTERN, GRANITE_PATTERN, LLAMA3_PATTERN,
    QWEN_PATTERN, TEKKEN_PATTERN,
)
from llamatpu.tokenizer.spm import SPMTokenizer
from llamatpu.tokenizer.vocabulary import Vocabulary


def _specials_from_types(vocab: Vocabulary) -> dict[str, int]:
    if vocab.token_types is None:
        return {}
    out = {}
    for i, t in enumerate(vocab.token_types):
        if int(t) not in (Vocabulary.NORMAL, Vocabulary.BYTE):
            out[vocab.tokens[i]] = i
    return out


def build_tokenizer(family: Family, md: dict):
    vocab = Vocabulary.from_metadata(md)
    specials = _specials_from_types(vocab)
    merges = [str(m) for m in md.get("tokenizer.ggml.merges", [])]

    if family in (Family.MISTRAL, Family.PHI_3):
        if not specials:
            # fallbacks: Phi-3 treats ids >= 32000 as special; SPM <s>/</s> by name
            if family == Family.PHI_3:
                specials = {vocab.tokens[i]: i for i in range(32000, len(vocab))}
            for name in ("<s>", "</s>", "<unk>"):
                i = vocab.index_of(name)
                if i is not None:
                    specials.setdefault(name, i)
        tok = SPMTokenizer(vocab, specials)
    else:
        if family in (Family.QWEN_2, Family.QWEN_2_MOE, Family.QWEN_3,
                      Family.DEEPSEEK_R1_DISTILL_QWEN):
            pattern = QWEN_PATTERN
        elif family == Family.GRANITE:
            pre = md.get("tokenizer.ggml.pre", "refact")
            pattern = GRANITE_DBRX_PATTERN if pre == "dbrx" else GRANITE_PATTERN
        elif family == Family.DEVSTRAL_2:
            pattern = TEKKEN_PATTERN
        else:
            pattern = LLAMA3_PATTERN
        if not specials and len(vocab) > 128000:
            # Llama-3 rule: all tokens after the 128000 base ones are special
            specials = {vocab.tokens[i]: i for i in range(128000, len(vocab))}
        if family in (Family.QWEN_3, Family.DEEPSEEK_R1_DISTILL_QWEN):
            # <think>/</think> must render as visible text (Qwen3Tokenizer.java:67-72)
            specials.pop("<think>", None)
            specials.pop("</think>", None)
        tok = BPETokenizer(vocab, merges, pattern, specials)

    tok.bos_id = int(md.get("tokenizer.ggml.bos_token_id", -1))
    tok.eos_id = int(md.get("tokenizer.ggml.eos_token_id", -1))
    tok.family = family
    return tok
