"""GGUF -> (ModelConfig, weights pytree) loader for every supported family.

Replaces the reference's per-family loader class hierarchy
(model/loader/*.java, SURVEY.md §2.3) with one table-driven loader:

- config keys use the GGUF `<arch>.` prefix (llama./qwen2./qwen2moe./qwen3./
  phi3./granite.) exactly as the reference loaders read them
- tensor names follow the llama.cpp convention (blk.N.attn_q.weight, ...);
  Phi-3's fused blk.N.attn_qkv.weight / blk.N.ffn_up.weight (gate||up) are
  split at load into wq/wk/wv/w1/w3 by rows — exact for block-quantized data
  because ggml blocks never cross matrix rows (in-features % 32 == 0), so the
  fused-kernel trick the reference implements at run time
  (InferenceCore.java:718-723, 780-786) costs nothing here
- weight modes: "quant" keeps Q8_0/Q4_0 as int8+scale QTensors (K-quants are
  requantized to Q8_0 like the reference GPU path, ModelLoader.java:156-224)
  while F16/F32/BF16 become dense arrays; "dequant" materializes everything
  dense (the numerics-oracle path)
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from llamatpu.gguf import GGUFReader, quants
from llamatpu.gguf.ggml_type import GGMLType
from llamatpu.models.config import Family, ModelConfig
from llamatpu.models.detect import detect_family
from llamatpu.models.weights import QTensor, prepare_qtensor
from llamatpu.ops.rope import precompute_rope_tables

_QWEN_FAMILIES = (Family.QWEN_2, Family.QWEN_2_MOE, Family.DEEPSEEK_R1_DISTILL_QWEN)


def _arch_prefix(md: dict) -> str:
    return md.get("general.architecture", "llama")


def config_from_metadata(family: Family, md: dict, max_tokens: int = 0) -> ModelConfig:
    p = _arch_prefix(md) + "."

    def get(key, default=None):
        v = md.get(p + key, default)
        if v is None:
            raise KeyError(p + key)
        return v

    dim = int(get("embedding_length"))
    n_heads = int(get("attention.head_count"))
    n_kv = int(md.get(p + "attention.head_count_kv", n_heads))
    vocab = int(md.get(p + "vocab_size", md.get("tokenizer.ggml.tokens.length", 0)))
    head_dim = int(md.get(p + "attention.key_length", dim // n_heads))
    v_head_dim = int(md.get(p + "attention.value_length", head_dim))

    kw: dict[str, Any] = dict(
        family=family,
        dim=dim,
        hidden_dim=int(get("feed_forward_length")),
        n_layers=int(get("block_count")),
        n_heads=n_heads,
        n_kv_heads=n_kv,
        vocab_size=vocab,
        context_length=int(get("context_length")),
        rms_norm_eps=float(md.get(p + "attention.layer_norm_rms_epsilon", 1e-5)),
        rope_theta=float(md.get(p + "rope.freq_base", 10000.0)),
        head_dim=head_dim,
        v_head_dim=v_head_dim,
    )

    if family in (Family.QWEN_2, Family.QWEN_2_MOE, Family.QWEN_3,
                  Family.DEEPSEEK_R1_DISTILL_QWEN, Family.PHI_3):
        kw["rope_style"] = "neox"
    if family in _QWEN_FAMILIES:
        kw["qkv_bias"] = True
    if family == Family.QWEN_3:
        kw["qk_norm"] = True
    if family == Family.GRANITE:
        kw.update(
            embedding_scale=float(md.get("granite.embedding_scale", 12.0)),
            residual_scale=float(md.get("granite.residual_scale", 0.22)),
            attention_scale=float(md.get("granite.attention.scale", 0.0078125)),
            logit_scale=1.0 / float(md.get("granite.logit_scale", 16.0)),
        )
    if family == Family.QWEN_2_MOE:
        kw.update(
            n_experts=int(get("expert_count")),
            n_experts_used=int(get("expert_used_count")),
            shared_expert_hidden_dim=int(get("feed_forward_length")),
            # moe hidden dim comes from the expert tensor shape (reference:
            # Qwen2MoEModelLoader.java:61); filled by load_model below.
        )
    if family == Family.DEVSTRAL_2 and md.get(p + "rope.scaling.type") == "yarn":
        kw.update(
            rope_scaling="yarn",
            rope_scale_factor=float(md[p + "rope.scaling.factor"]),
            yarn_beta_fast=float(md[p + "rope.scaling.yarn_beta_fast"]),
            yarn_beta_slow=float(md[p + "rope.scaling.yarn_beta_slow"]),
            yarn_log_multiplier=float(md.get(p + "rope.scaling.yarn_log_multiplier", 0.0)),
            rope_original_context=int(md[p + "rope.scaling.original_context_length"]),
        )

    cfg = ModelConfig(**kw)
    if max_tokens:
        cfg = cfg.with_context_length(max_tokens)
    return cfg


# ---------------------------------------------------------------------------
# Weight loading
# ---------------------------------------------------------------------------

def _load_dense(reader: GGUFReader, name: str, dtype) -> np.ndarray:
    return reader.tensor_f32(name).astype(dtype)


def _load_matmul(reader: GGUFReader, name: str, mode: str, dtype) -> QTensor | np.ndarray:
    info = reader.tensor_infos[name]
    t = info.ggml_type
    if mode == "quant" and t.is_quantized and t.supported:
        n = info.n_elements
        shape = info.shape
        if t == GGMLType.Q4_K:
            # NATIVE K-quant compute (round 4): Q4_K streams ~6 bits/weight
            # (packed nibbles + f32 per-32 scale/offset) through the Q4_0
            # kernel machinery instead of the 9 bits/weight a Q8_0 requant
            # costs on a bytes-bound decode. Reference analog: the CPU engine
            # runs Q4_K directly (tensor/standard/Q4_KFloatTensor.java);
            # kernel-native here.
            qs, scales, offs = quants.q4_k_views(
                np.asarray(reader.tensor_raw(name), np.uint8), n)
            qs = np.ascontiguousarray(qs).reshape(shape)
            scales = np.ascontiguousarray(scales).reshape(*shape[:-1], shape[-1] // 32)
            offs = np.ascontiguousarray(offs).reshape(*shape[:-1], shape[-1] // 32)
            return QTensor(qs, scales, "q4_k", offs=offs)
        if t == GGMLType.Q5_K:
            # NATIVE Q5_K (round 5): values depack to small int8s (q-16) +
            # f32 per-32 scale/offset, so the whole Q8_0-class int8 kernel
            # set serves Q5_K checkpoints with ZERO requant loss (the old
            # path double-rounded through Q8_0) at fewer streamed bytes
            # (1.25 vs 1.125+requant). Reference analog: the CPU engine dots
            # Q5_K natively (tensor/standard/Q5_KFloatTensor.java).
            qs, scales, offs = quants.q5_k_views(
                np.asarray(reader.tensor_raw(name), np.uint8), n)
            qs = np.ascontiguousarray(qs).reshape(shape)
            scales = np.ascontiguousarray(scales).reshape(*shape[:-1], shape[-1] // 32)
            offs = np.ascontiguousarray(offs).reshape(*shape[:-1], shape[-1] // 32)
            return QTensor(qs, scales, "q5_k", offs=offs)
        if t in (GGMLType.Q8_0, GGMLType.Q4_0):
            raw = reader.tensor_raw(name)
        else:  # Q6_K: requantize to Q8_0 (native Q6_K would stream >=1.125 B/w — no byte win; Q4_K/Q5_K load native above)
            raw = quants.requantize_to_q8_0(t, reader.tensor_raw(name), info.n_elements)
            t = GGMLType.Q8_0
        if t == GGMLType.Q8_0:
            qs, scales = quants.q8_0_views(np.asarray(raw, np.uint8), n)
            kind = "q8_0"
        else:
            qs, scales = quants.q4_0_views(np.asarray(raw, np.uint8), n)
            kind = "q4_0"
        qs = np.ascontiguousarray(qs).reshape(shape)
        scales = np.ascontiguousarray(scales).astype(np.float32).reshape(*shape[:-1], shape[-1] // 32)
        return QTensor(qs, scales, kind)
    return _load_dense(reader, name, dtype)


def _row_slice(w, a: int, b: int):
    if isinstance(w, QTensor):
        return QTensor(w.qs[a:b], w.scales[a:b], w.kind,
                       offs=None if w.offs is None else w.offs[a:b])
    return w[a:b]


def _stack(ws: list):
    if isinstance(ws[0], QTensor):
        offs = (np.stack([t.offs for t in ws])
                if ws[0].offs is not None else None)
        return QTensor(np.stack([t.qs for t in ws]),
                       np.stack([t.scales for t in ws]), ws[0].kind, offs=offs)
    return np.stack(ws)


@dataclass
class LoadedModel:
    cfg: ModelConfig
    weights: dict
    metadata: dict
    family: Family
    tokenizer: Any = None
    chat_format: Any = None
    quant_label: str = "f16"


def load_model(path: str, max_tokens: int = 0, mode: str = "quant",
               param_dtype=jnp.bfloat16, device_put: bool = True,
               load_tokenizer: bool = True, pack4: bool = False) -> LoadedModel:
    """Load a GGUF checkpoint into a config + stacked weights pytree.

    pack4: store Q4_0 tensors as packed nibbles (half the HBM footprint,
    same decode speed — the chip is value-rate-bound). Non-Q4_0 tensors
    are unaffected."""
    reader = GGUFReader(path)
    md = reader.metadata
    family = detect_family(md)
    cfg = config_from_metadata(family, md, max_tokens)

    if family == Family.QWEN_2_MOE:
        # moe hidden dim from the expert tensor (ne[0] in ggml order = last numpy dim
        # is `dim`; numpy shape (E, moe_hidden? , ...)): down_exps numpy = (E, dim, mh)
        down_shape = reader.tensor_infos["blk.0.ffn_down_exps.weight"].shape
        object.__setattr__(cfg, "moe_hidden_dim", int(down_shape[-1]))

    import ml_dtypes  # numpy bfloat16 support (ships with jax)

    np_dtype = {jnp.bfloat16: ml_dtypes.bfloat16, jnp.float32: np.float32,
                jnp.float16: np.float16}.get(param_dtype, np.float32)

    def dense(name):
        return _load_dense(reader, name, np_dtype)

    def matw(name):
        return _load_matmul(reader, name, mode, np_dtype)

    layers = []
    for i in range(cfg.n_layers):
        b = f"blk.{i}."
        lw: dict[str, Any] = {
            "attn_norm": _load_dense(reader, b + "attn_norm.weight", "float32"),
            "ffn_norm": _load_dense(reader, b + "ffn_norm.weight", "float32"),
            "wo": matw(b + "attn_output.weight"),
        }
        if family == Family.PHI_3:
            wqkv = matw(b + "attn_qkv.weight")
            q_d, kv_d = cfg.q_dim, cfg.kv_dim
            lw["wq"] = _row_slice(wqkv, 0, q_d)
            lw["wk"] = _row_slice(wqkv, q_d, q_d + kv_d)
            lw["wv"] = _row_slice(wqkv, q_d + kv_d, q_d + 2 * kv_d)
            gate_up = matw(b + "ffn_up.weight")  # fused [2*hidden, dim]: gate rows then up rows
            lw["w1"] = _row_slice(gate_up, 0, cfg.hidden_dim)
            lw["w3"] = _row_slice(gate_up, cfg.hidden_dim, 2 * cfg.hidden_dim)
            lw["w2"] = matw(b + "ffn_down.weight")
        else:
            lw["wq"] = matw(b + "attn_q.weight")
            lw["wk"] = matw(b + "attn_k.weight")
            lw["wv"] = matw(b + "attn_v.weight")
            if cfg.is_moe:
                lw["router"] = matw(b + "ffn_gate_inp.weight")
                lw["gate_exps"] = matw(b + "ffn_gate_exps.weight")
                lw["up_exps"] = matw(b + "ffn_up_exps.weight")
                lw["down_exps"] = matw(b + "ffn_down_exps.weight")
                lw["shared_gate"] = matw(b + "ffn_gate_shexp.weight")
                lw["shared_up"] = matw(b + "ffn_up_shexp.weight")
                lw["shared_down"] = matw(b + "ffn_down_shexp.weight")
                lw["shared_gate_inp"] = _load_dense(reader, b + "ffn_gate_inp_shexp.weight", "float32").reshape(-1)
            else:
                lw["w1"] = matw(b + "ffn_gate.weight")
                lw["w2"] = matw(b + "ffn_down.weight")
                lw["w3"] = matw(b + "ffn_up.weight")
        if cfg.qkv_bias:
            lw["q_bias"] = _load_dense(reader, b + "attn_q.bias", "float32")
            lw["k_bias"] = _load_dense(reader, b + "attn_k.bias", "float32")
            lw["v_bias"] = _load_dense(reader, b + "attn_v.bias", "float32")
        if cfg.qk_norm:
            lw["q_norm"] = _load_dense(reader, b + "attn_q_norm.weight", "float32")
            lw["k_norm"] = _load_dense(reader, b + "attn_k_norm.weight", "float32")
        layers.append(lw)

    def _pad(w):
        # lane-align out-features + interleave columns for the Pallas matmul;
        # consumers slice via QTensor.logical_out, dequant/int8 paths
        # deinterleave (models/weights.py)
        return prepare_qtensor(w, pack4=pack4) if isinstance(w, QTensor) else w

    stacked = {k: _pad(_stack([l[k] for l in layers])) for k in layers[0]}

    cos, sin = precompute_rope_tables(cfg)
    tok_name = "token_embd.weight"
    out_name = "output.weight" if "output.weight" in reader.tensor_infos else tok_name
    weights = {
        "tok_emb": dense(tok_name),
        "final_norm": _load_dense(reader, "output_norm.weight", "float32"),
        "wcls": _pad(matw(out_name)),
        "rope_cos": cos,
        "rope_sin": sin,
        "layers": stacked,
    }

    # quant label for metrics/bench (reference: outputWeight.ggmlType())
    out_t = reader.tensor_infos[out_name].ggml_type
    quant_label = out_t.name.lower()

    if device_put:
        weights = jax.tree.map(jnp.asarray, weights)

    model = LoadedModel(cfg=cfg, weights=weights, metadata=md, family=family,
                        quant_label=quant_label)
    if load_tokenizer:
        from llamatpu.tokenizer import build_tokenizer
        from llamatpu.format import build_chat_format

        model.tokenizer = build_tokenizer(family, md)
        model.chat_format = build_chat_format(family, model.tokenizer, md)
    reader.close()
    return model
