"""Model family detection from GGUF metadata.

Mirrors the reference's detection order (ModelLoader.detectModelType,
/root/reference/src/main/java/org/beehive/gpullama3/model/loader/ModelLoader.java:47-84):
architecture key "qwen2moe" is authoritative; then general.name substrings;
then metadata-key fallbacks. We additionally fall back on general.architecture
for robustness against renamed files.
"""
from __future__ import annotations

from llamatpu.models.config import Family


def detect_family(metadata: dict) -> Family:
    arch = metadata.get("general.architecture")
    if arch == "qwen2moe":
        return Family.QWEN_2_MOE

    name = (metadata.get("general.name") or "").lower()
    basename = metadata.get("general.basename") or ""
    if "DeepSeek-R1-Distill-Qwen" in str(basename) or "deepseek r1 distill" in name:
        return Family.DEEPSEEK_R1_DISTILL_QWEN
    if name:
        if "granite" in name:
            return Family.GRANITE
        if "devstral" in name:
            return Family.DEVSTRAL_2
        if "mistral" in name:
            return Family.MISTRAL
        if "llama" in name:
            return Family.LLAMA_3
        if "qwen2" in name:
            return Family.QWEN_2
        if "qwen3" in name:
            return Family.QWEN_3
        if "phi3" in name or "phi-3" in name:
            return Family.PHI_3

    if "granite.block_count" in metadata:
        return Family.GRANITE
    by_arch = {
        "llama": Family.LLAMA_3,
        "qwen2": Family.QWEN_2,
        "qwen3": Family.QWEN_3,
        "phi3": Family.PHI_3,
        "granite": Family.GRANITE,
    }
    if arch in by_arch:
        return by_arch[arch]
    raise ValueError(f"cannot detect model family (architecture={arch!r}, name={name!r})")
