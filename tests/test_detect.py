"""Family detection: reference-parity name heuristics PLUS rename-proof
structural cross-checks (architecture + tokenizer + rope keys).

Reference behavior anchor: ModelLoader.detectModelType (ModelLoader.java:47-84)
— which silently misdetects a renamed Mistral/DeepSeek GGUF; here the
structural evidence wins on conflict."""
import logging

from llamatpu.models.config import Family
from llamatpu.models.detect import detect_family


def test_named_families():
    assert detect_family({"general.architecture": "llama",
                          "general.name": "Llama 3.2 1B"}) == Family.LLAMA_3
    assert detect_family({"general.architecture": "llama",
                          "general.name": "Mistral 7B",
                          "tokenizer.ggml.model": "llama"}) == Family.MISTRAL
    assert detect_family({"general.architecture": "qwen2moe",
                          "general.name": "whatever"}) == Family.QWEN_2_MOE
    assert detect_family({"general.architecture": "qwen3",
                          "general.name": "Qwen3 0.6B"}) == Family.QWEN_3


def test_renamed_mistral_detects_by_tokenizer():
    # arch llama + SPM tokenizer, name gives nothing away
    md = {"general.architecture": "llama", "general.name": "my-model-v2",
          "tokenizer.ggml.model": "llama"}
    assert detect_family(md) == Family.MISTRAL


def test_renamed_deepseek_detects_by_pretokenizer():
    md = {"general.architecture": "qwen2", "general.name": "super-chat-8b",
          "tokenizer.ggml.model": "gpt2", "tokenizer.ggml.pre": "deepseek-r1-qwen"}
    assert detect_family(md) == Family.DEEPSEEK_R1_DISTILL_QWEN


def test_renamed_devstral_detects_by_tekken():
    md = {"general.architecture": "llama", "general.name": "code-helper",
          "tokenizer.ggml.model": "gpt2", "tokenizer.ggml.pre": "tekken"}
    assert detect_family(md) == Family.DEVSTRAL_2


def test_yarn_is_not_a_devstral_signal():
    # a long-context Llama-3 GGUF with YaRN rope scaling stays LLAMA_3
    # (advisor r2: yarn is not Devstral-specific)
    md = {"general.architecture": "llama", "general.name": "code-helper",
          "tokenizer.ggml.model": "gpt2", "llama.rope.scaling.type": "yarn"}
    assert detect_family(md) == Family.LLAMA_3


def test_tekken_mistral_name_wins(caplog):
    # a Tekken-based Mistral-Small named "mistral...": Devstral is the
    # refinement, the name claims the base — trust the name, no warning
    md = {"general.architecture": "llama", "general.name": "Mistral-Small-3",
          "tokenizer.ggml.model": "gpt2", "tokenizer.ggml.pre": "tekken"}
    with caplog.at_level(logging.WARNING):
        assert detect_family(md) == Family.MISTRAL
    assert not caplog.records


def test_qwen2moe_named_qwen_no_spurious_warning(caplog):
    # "Qwen1.5-MoE-A2.7B" contains "qwen2"? No — but "Qwen2-57B-A14B" does;
    # either way a qwen2moe arch with a qwen2-ish name must not warn
    md = {"general.architecture": "qwen2moe", "general.name": "Qwen2-57B-A14B",
          "tokenizer.ggml.model": "gpt2"}
    with caplog.at_level(logging.WARNING):
        assert detect_family(md) == Family.QWEN_2_MOE
    assert not caplog.records


def test_conflicting_rename_warns_and_trusts_structure(caplog):
    # a Mistral checkpoint renamed to claim it's llama: SPM tokenizer wins
    md = {"general.architecture": "llama", "general.name": "llama-compatible",
          "tokenizer.ggml.model": "llama"}
    with caplog.at_level(logging.WARNING):
        fam = detect_family(md)
    assert fam == Family.MISTRAL
    assert any("trusting the structure" in r.message for r in caplog.records)


def test_deepseek_name_refines_structural_qwen2():
    # name says distill, structure says plain qwen2 (no deepseek pretok):
    # the distill is a refinement of qwen2 — trust the name
    md = {"general.architecture": "qwen2",
          "general.basename": "DeepSeek-R1-Distill-Qwen-7B",
          "tokenizer.ggml.model": "gpt2"}
    assert detect_family(md) == Family.DEEPSEEK_R1_DISTILL_QWEN


def test_arch_fallback_without_name():
    assert detect_family({"general.architecture": "phi3"}) == Family.PHI_3
    assert detect_family({"general.architecture": "granite"}) == Family.GRANITE
