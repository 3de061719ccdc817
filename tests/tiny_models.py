"""Synthesize tiny random GGUF checkpoints per model family for tests.

The reference's integration tests download real GGUFs in CI (SURVEY.md §4);
hermetic tests instead generate miniature checkpoints with the exact GGUF keys
and tensor names each family loader expects.
"""
from __future__ import annotations

import numpy as np

from llamatpu.gguf import GGMLType, GGUFWriter

DIM = 64
HEADS = 4
KV_HEADS = 2
HEAD_DIM = 16
HIDDEN = 96
LAYERS = 2
VOCAB = 96
CTX = 64

# all matmul in-features must be multiples of 32 (ggml block size)
MOE_EXPERTS = 4
MOE_TOPK = 2
MOE_HIDDEN = 64
SHARED_HIDDEN = 96


def _rng(seed):
    return np.random.default_rng(seed)


def _norm_w(rng, n):
    return (1.0 + 0.1 * rng.normal(size=n)).astype(np.float32)


def _mat(rng, out, inp, scale=None):
    scale = scale if scale is not None else 1.0 / np.sqrt(inp)
    return (rng.normal(size=(out, inp)) * scale).astype(np.float32)


def build_tiny_gguf(path, family="llama", quant=GGMLType.F32, seed=0, with_tokenizer=False,
                    norm_quant=GGMLType.F32):
    """Write a tiny GGUF for `family` in {llama, mistral, devstral, qwen2, qwen3,
    qwen2moe, phi3, granite, deepseek}. Returns the dict of float tensors used."""
    rng = _rng(seed)
    w = GGUFWriter()
    arch = {
        "llama": "llama", "mistral": "llama", "devstral": "llama",
        "qwen2": "qwen2", "deepseek": "qwen2", "qwen2moe": "qwen2moe",
        "qwen3": "qwen3", "phi3": "phi3", "granite": "granite",
    }[family]
    name = {
        "llama": "Llama Tiny", "mistral": "Mistral Tiny", "devstral": "Devstral Tiny",
        "qwen2": "Qwen2 Tiny", "deepseek": "DeepSeek R1 Distill Tiny",
        "qwen2moe": "QwenMoE Tiny", "qwen3": "Qwen3 Tiny", "phi3": "Phi3 Tiny",
        "granite": "Granite Tiny",
    }[family]
    p = arch + "."
    w.add("general.architecture", arch)
    w.add("general.name", name)
    if family == "deepseek":
        w.add("general.basename", "DeepSeek-R1-Distill-Qwen")
    w.add(p + "embedding_length", DIM)
    w.add(p + "feed_forward_length", HIDDEN if family != "qwen2moe" else SHARED_HIDDEN)
    w.add(p + "block_count", LAYERS)
    w.add(p + "attention.head_count", HEADS)
    w.add(p + "attention.head_count_kv", KV_HEADS)
    w.add(p + "context_length", CTX)
    w.add(p + "attention.layer_norm_rms_epsilon", 1e-5)
    w.add(p + "rope.freq_base", 10000.0)
    vocab = VOCAB
    if with_tokenizer:
        # the tiny tokenizer defines ~270 ids; the embedding/head must cover
        # them all or text-driven paths (ppl, validate) gather out of bounds
        vocab = add_tiny_tokenizer(w, family)
    w.add(p + "vocab_size", vocab)
    if family == "qwen3":
        w.add(p + "attention.key_length", HEAD_DIM)
        w.add(p + "attention.value_length", HEAD_DIM)
    if family == "devstral":
        w.add(p + "attention.key_length", HEAD_DIM)
        w.add(p + "rope.scaling.type", "yarn")
        w.add(p + "rope.scaling.factor", 2.0)
        w.add(p + "rope.scaling.yarn_beta_fast", 32.0)
        w.add(p + "rope.scaling.yarn_beta_slow", 1.0)
        w.add(p + "rope.scaling.yarn_log_multiplier", 1.0)
        w.add(p + "rope.scaling.original_context_length", CTX // 2)
    if family == "qwen2moe":
        w.add(p + "expert_count", MOE_EXPERTS)
        w.add(p + "expert_used_count", MOE_TOPK)
    if family == "granite":
        w.add("granite.embedding_scale", 12.0)
        w.add("granite.residual_scale", 0.22)
        w.add("granite.attention.scale", 0.0078125)
        w.add("granite.logit_scale", 16.0)
    tensors = {}

    def add(tname, arr, q=quant):
        tensors[tname] = arr
        w.add_tensor(tname, arr, q)

    q_dim = HEADS * HEAD_DIM
    kv_dim = KV_HEADS * HEAD_DIM
    add("token_embd.weight", _mat(rng, vocab, DIM, scale=0.5))
    add("output_norm.weight", _norm_w(rng, DIM), norm_quant)
    add("output.weight", _mat(rng, vocab, DIM))
    for i in range(LAYERS):
        b = f"blk.{i}."
        add(b + "attn_norm.weight", _norm_w(rng, DIM), norm_quant)
        add(b + "ffn_norm.weight", _norm_w(rng, DIM), norm_quant)
        add(b + "attn_output.weight", _mat(rng, DIM, q_dim))
        if family == "phi3":
            add(b + "attn_qkv.weight", _mat(rng, q_dim + 2 * kv_dim, DIM))
            add(b + "ffn_up.weight", _mat(rng, 2 * HIDDEN, DIM))
            add(b + "ffn_down.weight", _mat(rng, DIM, HIDDEN))
        else:
            add(b + "attn_q.weight", _mat(rng, q_dim, DIM))
            add(b + "attn_k.weight", _mat(rng, kv_dim, DIM))
            add(b + "attn_v.weight", _mat(rng, kv_dim, DIM))
            if family == "qwen2moe":
                add(b + "ffn_gate_inp.weight", _mat(rng, MOE_EXPERTS, DIM), GGMLType.F32)
                add(b + "ffn_gate_exps.weight", rng.normal(size=(MOE_EXPERTS, MOE_HIDDEN, DIM)).astype(np.float32) / 8, quant)
                add(b + "ffn_up_exps.weight", rng.normal(size=(MOE_EXPERTS, MOE_HIDDEN, DIM)).astype(np.float32) / 8, quant)
                add(b + "ffn_down_exps.weight", rng.normal(size=(MOE_EXPERTS, DIM, MOE_HIDDEN)).astype(np.float32) / 8, quant)
                add(b + "ffn_gate_shexp.weight", _mat(rng, SHARED_HIDDEN, DIM))
                add(b + "ffn_up_shexp.weight", _mat(rng, SHARED_HIDDEN, DIM))
                add(b + "ffn_down_shexp.weight", _mat(rng, DIM, SHARED_HIDDEN))
                add(b + "ffn_gate_inp_shexp.weight", _mat(rng, 1, DIM), GGMLType.F32)
            else:
                add(b + "ffn_gate.weight", _mat(rng, HIDDEN, DIM))
                add(b + "ffn_up.weight", _mat(rng, HIDDEN, DIM))
                add(b + "ffn_down.weight", _mat(rng, DIM, HIDDEN))
        if family in ("qwen2", "deepseek", "qwen2moe"):
            add(b + "attn_q.bias", (rng.normal(size=q_dim) * 0.1).astype(np.float32), GGMLType.F32)
            add(b + "attn_k.bias", (rng.normal(size=kv_dim) * 0.1).astype(np.float32), GGMLType.F32)
            add(b + "attn_v.bias", (rng.normal(size=kv_dim) * 0.1).astype(np.float32), GGMLType.F32)
        if family == "qwen3":
            add(b + "attn_q_norm.weight", _norm_w(rng, HEAD_DIM), norm_quant)
            add(b + "attn_k_norm.weight", _norm_w(rng, HEAD_DIM), norm_quant)
    w.write(str(path))
    return tensors


def add_tiny_tokenizer(w: GGUFWriter, family: str) -> int:
    """Attach a minimal tokenizer matching the family's REAL engine: SPM with
    byte fallback for mistral/phi3 (tokenizer.ggml.model="llama"), byte-level
    BPE for the rest (with pre="tekken" for devstral) — so family detection
    sees the same structural evidence a real checkpoint carries and `validate`
    exercises the right tokenizer engine per family."""
    from llamatpu.tokenizer.bpe import bytes_to_unicode

    if family in ("mistral", "phi3"):
        return _add_tiny_spm_tokenizer(w, family)
    if family == "devstral":
        w.add("tokenizer.ggml.pre", "tekken")
    byte_enc = bytes_to_unicode()
    tokens = [byte_enc[i] for i in range(256)]
    merges = []
    # merge "h e", "l l", "he ll" etc. to give multi-char tokens
    pairs = [("h", "e"), ("l", "l"), ("he", "ll"), ("hell", "o"), ("Ġ", "w"),
             ("Ġw", "o"), ("Ġwo", "r"), ("Ġwor", "l"), ("Ġworl", "d")]
    for a, b in pairs:
        merges.append(f"{a} {b}")
        tokens.append(a + b)
    specials = ["<|begin_of_text|>", "<|end_of_text|>", "<|start_header_id|>",
                "<|end_header_id|>", "<|eot_id|>"]
    if family in ("qwen2", "qwen2moe", "qwen3"):
        specials += ["<|im_start|>", "<|im_end|>"]
        if family == "qwen3":
            specials += ["<think>", "</think>"]
    elif family == "deepseek":
        specials += ["<｜User｜>", "<｜Assistant｜>", "<think>", "</think>"]
    tokens += specials
    types = [1] * 256 + [1] * len(pairs) + [3] * len(specials)
    w.add("tokenizer.ggml.model", "gpt2")
    w.add("tokenizer.ggml.tokens", tokens)
    w.add("tokenizer.ggml.merges", merges)
    w.add("tokenizer.ggml.token_type", np.array(types, dtype=np.int32))
    w.add("tokenizer.ggml.bos_token_id", 256 + len(pairs))
    w.add("tokenizer.ggml.eos_token_id", 256 + len(pairs) + 1)
    return len(tokens)


def _add_tiny_spm_tokenizer(w: GGUFWriter, family: str) -> int:
    """Minimal SentencePiece vocab: <unk>/<s>/</s> + 256 byte-fallback pieces
    + single chars + a few scored multi-char pieces (same layout a real
    Mistral/Phi-3 GGUF ships)."""
    V = 1  # NORMAL
    tokens = ["<unk>", "<s>", "</s>"]
    scores = [0.0, 0.0, 0.0]
    types = [2, 3, 3]  # UNKNOWN, CONTROL, CONTROL
    for b in range(256):
        tokens.append(f"<0x{b:02X}>")
        scores.append(0.0)
        types.append(6)  # BYTE
    import string

    for ch in "▁" + string.ascii_letters + string.digits + string.punctuation:
        tokens.append(ch)
        scores.append(-1.0)
        types.append(V)
    pieces = ["▁the", "▁hello", "▁world", "he", "ll", "lo",
              "th", "er", "in", "ing", "ion"]
    for i, piece in enumerate(pieces):
        tokens.append(piece)
        scores.append(-2.0 - 0.1 * i)
        types.append(V)
    if family == "phi3":
        specials = ["<|end|>", "<|user|>", "<|assistant|>", "<|system|>"]
        tokens += specials
        scores += [0.0] * len(specials)
        types += [3] * len(specials)
    w.add("tokenizer.ggml.model", "llama")
    w.add("tokenizer.ggml.tokens", tokens)
    w.add("tokenizer.ggml.scores", np.array(scores, dtype=np.float32))
    w.add("tokenizer.ggml.token_type", np.array(types, dtype=np.int32))
    w.add("tokenizer.ggml.bos_token_id", 1)
    w.add("tokenizer.ggml.eos_token_id", 2)
    w.add("tokenizer.ggml.add_bos_token", True)
    return len(tokens)
