"""The single transformer forward graph for ALL supported families.

Replaces the reference's 8 per-family forward passes (InferenceCore.java:
forwardJava/forwardJavaDevstral/forwardJavaQwen2MoE/forwardJavaQwen2/
forwardJavaQwen3/forwardJavaPhi3/forwardGranite) and its ~90 per-family×quant×mode
GPU plan/layer/kernel classes (SURVEY.md §2.5-2.6) with ONE config-driven graph:

- prefill and decode are the same function over a [B, T] token window writing a
  preallocated KV cache at `pos` (T=1 decode ≡ the reference's single-token
  plan; T=chunk ≡ its batch-prefill MMA plan — on TPU the batched GEMM path is
  simply the default, SURVEY.md §7.1)
- layers run under jax.lax.scan over stacked weights: one XLA program per step
  instead of N+2 TaskGraph dispatches (TornadoVMMasterPlanSingleToken.java:68-96)
- family deltas (qkv bias, per-head q/k norm, µP scales, MoE, head-dim
  decoupling, RoPE layout) are config fields, see models/config.py

Numerics follow the reference CPU path (the project's de-facto oracle,
SURVEY.md §3.2): f32 softmax/norm reductions, f32 matmul accumulation.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from llamatpu.models.config import ModelConfig
from llamatpu.models.weights import QTensor
from llamatpu.ops.matmul import matmul
from llamatpu.ops.rmsnorm import rmsnorm
from llamatpu.ops.rope import apply_rope


@partial(jax.tree_util.register_dataclass,
         data_fields=["kv", "scale"], meta_fields=[])
@dataclass
class KVCache:
    """Preallocated per-layer KV cache (reference: State.keyCache/valueCache,
    inference/state/State.java:44-45, flattened [L][ctx*kvDim]; here ONE
    PACKED array [L, B, n_kv, S, hd + vhd] — K in lanes [0:hd], V in lanes
    [hd:]. Head-major so each kv head's stripe is contiguous for the Pallas
    decode-attention kernels.

    Why packed (r5): with separate K/V arrays and hd = 64, XLA lane-pads the
    minor dim to 128 in HBM — every attention byte was fetched twice, and
    every layer paid two cache-write thunks. Packing makes the minor dim
    128-exact (half the attention HBM traffic) and appends one row per layer.
    See ops/pallas_attention.py for how the kernels dot against the packed
    stripe without ever lane-slicing.

    With int8 entries (init_cache(dtype=jnp.int8)), `scale` holds one f32 per
    (token, kv head) for K and V separately, stored [L, B, n_kv, 2, S]
    (row 0 = K, row 1 = V; S on lanes — Mosaic block-legal and VMEM-compact);
    dequant folds into the attention dots, see ops/kv_quant.py."""

    kv: jax.Array  # [L, B, n_kv, S, head_dim + v_head_dim] packed
    scale: jax.Array | None = None  # [L, B, n_kv, 2, S] f32 (int8 mode)

    @property
    def batch(self) -> int:
        return self.kv.shape[1]

    @property
    def length(self) -> int:
        return self.kv.shape[3]

    @property
    def quantized(self) -> bool:
        return self.scale is not None


PAD_GRANULE = 128  # final prefill chunks pad to this (8-sublane × MXU friendly)


def physical_cache_len(logical: int, prefill_chunk: int) -> int:
    """Cache positions to ALLOCATE for `logical` usable positions.

    Chunked prefill pads its final chunk up to the next PAD_GRANULE multiple,
    so the KV write window can extend up to `granule - 1` positions past the
    last real token. XLA's dynamic_update_slice CLAMPS an out-of-range start
    index, which would silently wrap the padded window back over live
    positions and corrupt the cache (bug found via prefix-cache warm/cold
    divergence) — slack positions make the write always in-bounds instead.
    Slack is one granule (not a whole prefill chunk) to keep the decode
    attention stripe close to the logical length.

    Long caches round up to a 1024 multiple: past the full-stripe kernel's
    VMEM ceiling the splitKV decode kernel tiles S with the largest
    power-of-two divisor (ops/pallas_attention._pick_tile), and an unaligned
    physical length forces 128-256-row tiles — 4-8x the grid steps, each
    well under the 1.5-2.25 MB DMA sweet spot (scripts/bench_dma_sweep.py).
    The rounding costs <=1023 slack rows of HBM (~30 MB at 1B geometry,
    never attended) and buys 1024-row tiles.

    Short caches round to 32 (not just the 8-sublane minimum) so the fused
    KV-append attention kernels' `S % 32 == 0` write-tile requirement holds
    for EVERY logical length — with 8-alignment the fused path silently
    disengaged for lengths like 1000 (phys 1064), making fused coverage
    depend on the user's context length (advisor finding, r4). Slack rows
    are already tolerated by the masking invariant."""
    granule = min(prefill_chunk, PAD_GRANULE)
    phys = -(-(logical + granule) // 32) * 32  # fused-write tile aligned
    if phys > 8192:
        phys = -(-phys // 1024) * 1024
    return phys


def pad_chunk_len(real: int, prefill_chunk: int) -> int:
    """Compiled length for a final partial prefill chunk: next PAD_GRANULE
    multiple (bounded program count: prefill_chunk/PAD_GRANULE variants)."""
    granule = min(prefill_chunk, PAD_GRANULE)
    return min(prefill_chunk, -(-real // granule) * granule)


def init_cache(cfg: ModelConfig, batch: int, dtype=jnp.bfloat16, length: int | None = None) -> KVCache:
    s = length or cfg.context_length
    width = cfg.head_dim + cfg.v_head_dim
    kv = jnp.zeros((cfg.n_layers, batch, cfg.n_kv_heads, s, width), dtype)
    if dtype == jnp.int8:
        shape = (cfg.n_layers, batch, cfg.n_kv_heads, 2, s)
        return KVCache(kv, jnp.zeros(shape, jnp.float32))
    return KVCache(kv)


def _attention(cfg: ModelConfig, q, kc, vc, pos_vec, t_len):
    """Masked GQA attention over the full cache.

    q: [B, T, KV, G, hd]; kc: [B, KV, S, hd]; vc: [B, KV, S, vhd];
    pos_vec: [B] per-sequence start positions. Valid keys for query t of
    sequence b: absolute s <= pos_vec[b] + t (reference loops t=0..position,
    InferenceCore.java:108-137). f32 scores/softmax.
    """
    scale = cfg.attn_score_scale
    scores = jnp.einsum("btkgh,bksh->bkgts", q.astype(jnp.float32), kc.astype(jnp.float32)) * scale
    s_len = kc.shape[2]
    t_idx = jnp.arange(t_len)[None, :, None]
    s_idx = jnp.arange(s_len)[None, None, :]
    mask = s_idx <= (pos_vec[:, None, None] + t_idx)  # [B, T, S]
    scores = jnp.where(mask[:, None, None], scores, -jnp.inf)
    att = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bkgts,bksv->btkgv", att, vc.astype(jnp.float32))
    return out  # [B, T, KV, G, vhd] f32


def _attention_sp(cfg: ModelConfig, q, kd, vd, pos_vec, t_len, off, axis):
    """Masked GQA attention over a LOCAL S stripe with a cross-shard
    partial-softmax combine over `axis` (sequence parallelism inside a
    pipeline stage — GSPMD cannot see into the stage loop, so the softmax
    max/sum and the att.V contraction reduce manually). kd/vd are this
    shard's stripe rows [off, off + S_loc); masks use ABSOLUTE positions."""
    scale = cfg.attn_score_scale
    scores = jnp.einsum("btkgh,bksh->bkgts", q.astype(jnp.float32),
                        kd.astype(jnp.float32)) * scale
    s_len = kd.shape[2]
    t_idx = jnp.arange(t_len)[None, :, None]
    s_idx = jnp.arange(s_len)[None, None, :] + off  # absolute positions
    mask = s_idx <= (pos_vec[:, None, None] + t_idx)  # [B, T, S]
    scores = jnp.where(mask[:, None, None], scores, -jnp.inf)
    m = jnp.max(scores, axis=-1, keepdims=True)          # [B, K, G, T, 1]
    m_safe = jnp.maximum(m, -1e30)                       # all-masked shards
    e = jnp.exp(scores - m_safe)
    e = jnp.where(mask[:, None, None], e, 0.0)
    l = jnp.sum(e, axis=-1, keepdims=True)
    num = jnp.einsum("bkgts,bksv->bkgtv", e, vd.astype(jnp.float32))
    m_g = jax.lax.pmax(m_safe, axis)
    w = jnp.exp(m_safe - m_g)
    den = jax.lax.psum(l * w, axis)                      # [B, K, G, T, 1]
    num_g = jax.lax.psum(num * w, axis)
    out = num_g / jnp.maximum(den, 1e-38)
    return out.transpose(0, 3, 1, 2, 4)  # [B, T, KV, G, vhd] f32


def _mm(lw, slw, li, key, x, impl):
    """Layer matmul: quantized weights under pallas go through the STACKED
    kernel (slw[key] is the full [L, O, I] stack, layer li DMA'd in-kernel);
    everything else uses the scan-sliced lw[key]. Rationale: XLA fuses a scan
    xs slice into a dot_general operand for free, but MATERIALIZES a full
    per-layer copy when the consumer is a pallas custom call — profiled at
    ~50% of the Llama-1B Q8_0 decode step (3x weight HBM traffic)."""
    if slw is not None and impl == "pallas" and isinstance(slw[key], QTensor):
        return matmul(slw[key], x, impl, li=li)
    return matmul(lw[key], x, impl)


def _dense_ffn(cfg: ModelConfig, h, lw, impl, slw=None, li=None):
    if (impl == "pallas" and slw is not None and li is not None
            and "w13" in slw and "w2" in slw):
        # q8_row decode: the whole FFN (w13 -> silu*up -> w2) runs as ONE
        # pallas call so the weight stream never restarts its DMA pipeline
        # mid-FFN (PERF.md: stream rate is set by grid steps per call)
        from llamatpu.ops.ffn_fused import ffn_fused_rowq

        y = ffn_fused_rowq(slw["w13"], slw["w2"], h, li)
        if y is not None:
            return y
    if "w13" in lw:  # fused gate+up (weights.fuse_layer_weights)
        g13 = _mm(lw, slw, li, "w13", h, impl)
        ff = g13.shape[-1] // 2
        gate, up = g13[..., :ff], g13[..., ff:]
    else:
        gate = _mm(lw, slw, li, "w1", h, impl)
        up = _mm(lw, slw, li, "w3", h, impl)
    act = jax.nn.silu(gate.astype(jnp.float32)).astype(h.dtype) * up
    return _mm(lw, slw, li, "w2", act, impl)


def _index_qtensor(w, i):
    if isinstance(w, QTensor):
        return QTensor(w.qs[i], w.scales[i], w.kind, w.logical_out, w.layout,
                       offs=None if w.offs is None else w.offs[i])
    return w[i]


# The grouped ragged kernel serves ALL pallas MoE shapes, decode included:
# at N=1/top-4 it runs 4 m-tiles of tm=8 (one kernel per projection) vs the
# per-token scan's 12 sequential gathered GEMVs — measured 19.2 -> see
# STATUS.md tok/s on Qwen1.5-MoE. The scan path remains for impl="xla"
# (numerics reference on CPU).


def _moe_ffn(cfg: ModelConfig, h, lw, impl, ep_mesh=None, slw=None, li=None):
    """Qwen2-MoE FFN: softmax-over-all-experts router, top-k WITHOUT
    renormalization (norm_topk_prob=false), plus an always-on shared expert
    gated by sigmoid(shared_gate_inp · h) (InferenceCore.java:366-415).

    The pallas impl runs the routed experts through the grouped ragged
    matmul (ops/moe_grouped.py) at every N, decode included; the per-token
    scan remains as the xla-impl reference — both compute identical math.
    With ep_mesh set, expert weights are sharded whole-expert over "tp" and
    ALL routed compute runs under shard_map (parallel/expert.py)."""
    b, t, d = h.shape
    hf = h.reshape(b * t, d)
    router_logits = _mm(lw, slw, li, "router", hf, impl).astype(jnp.float32)  # [N, E]
    probs = jax.nn.softmax(router_logits, axis=-1)
    top_w, top_i = jax.lax.top_k(probs, cfg.n_experts_used)  # no renorm

    # folded shared expert (weights.fold_shared_expert): the expert stacks
    # carry S extra VIRTUAL experts (the shared expert chunked to routed
    # geometry); every token routes to all S with the sigmoid shared-gate
    # weight, and the explicit shared-expert matmuls disappear
    gu = lw.get("gu_exps", lw.get("gate_exps"))
    e_have = gu.qs.shape[0] if isinstance(gu, QTensor) else gu.shape[0]
    folded = e_have > cfg.n_experts and "shared_gate_inp" in lw
    n_experts = e_have
    if folded:
        s = e_have - cfg.n_experts
        gate_score = jnp.einsum("nd,d->n", hf.astype(jnp.float32),
                                lw["shared_gate_inp"].astype(jnp.float32))
        shared_w = jax.nn.sigmoid(gate_score)  # [N]
        vir = jnp.arange(cfg.n_experts, e_have, dtype=top_i.dtype)
        top_i = jnp.concatenate(
            [top_i, jnp.broadcast_to(vir[None], (hf.shape[0], s))], axis=1)
        top_w = jnp.concatenate(
            [top_w, jnp.broadcast_to(shared_w[:, None].astype(top_w.dtype),
                                     (hf.shape[0], s))], axis=1)

    if ep_mesh is not None:
        from llamatpu.parallel.expert import moe_ffn_expert_parallel

        assert not folded, "fold_shared_expert is a single-device layout"
        tm = 128 if b * t * cfg.n_experts_used >= 1024 else 8
        routed = moe_ffn_expert_parallel(cfg, hf, top_w, top_i, lw, ep_mesh,
                                         tm=tm).astype(h.dtype)
        return _moe_shared(cfg, h, hf, routed, lw, impl, slw, li)

    if impl == "pallas":
        from llamatpu.ops.moe_grouped import moe_ffn_grouped

        nk = b * t * top_i.shape[1]
        tm = 128 if nk >= 1024 else (8 if nk <= 64 else 32)
        routed = moe_ffn_grouped(cfg, hf, top_w, top_i, lw, tm=tm,
                                 slw=slw, li=li,
                                 n_experts=n_experts).astype(h.dtype)
        if folded:  # shared expert already inside the routed combine
            return routed.reshape(b, t, d)
        return _moe_shared(cfg, h, hf, routed, lw, impl, slw, li)

    def one_token(hv, ws, ids):
        def one_expert(carry, ji):
            w_j, i_j = ji
            if "gu_exps" in lw:  # fused gate+up stacks
                g13 = matmul(_index_qtensor(lw["gu_exps"], i_j), hv, impl)
                mh = g13.shape[-1] // 2
                gate, up = g13[..., :mh], g13[..., mh:]
            else:
                gate = matmul(_index_qtensor(lw["gate_exps"], i_j), hv, impl)
                up = matmul(_index_qtensor(lw["up_exps"], i_j), hv, impl)
            act = jax.nn.silu(gate.astype(jnp.float32)).astype(hv.dtype) * up
            down = matmul(_index_qtensor(lw["down_exps"], i_j), act, impl)
            return carry + w_j.astype(jnp.float32) * down.astype(jnp.float32), None

        out, _ = jax.lax.scan(one_expert, jnp.zeros((d,), jnp.float32), (ws, ids))
        return out

    routed = jax.vmap(one_token)(hf, top_w, top_i).astype(h.dtype)
    if folded:  # shared expert rides the extended routing (exact)
        return routed.reshape(b, t, d)
    return _moe_shared(cfg, h, hf, routed, lw, impl, slw, li)


def _moe_shared(cfg: ModelConfig, h, hf, routed, lw, impl, slw=None, li=None):
    b, t, d = h.shape
    if "shared_g13" in lw:  # fused shared gate+up
        g13 = _mm(lw, slw, li, "shared_g13", hf, impl)
        ff = g13.shape[-1] // 2
        sg, su = g13[..., :ff], g13[..., ff:]
    else:
        sg = _mm(lw, slw, li, "shared_gate", hf, impl)
        su = _mm(lw, slw, li, "shared_up", hf, impl)
    sact = jax.nn.silu(sg.astype(jnp.float32)).astype(h.dtype) * su
    sdown = _mm(lw, slw, li, "shared_down", sact, impl)
    gate_score = jnp.einsum("nd,d->n", hf.astype(jnp.float32), lw["shared_gate_inp"].astype(jnp.float32))
    shared_w = jax.nn.sigmoid(gate_score)[:, None]
    out = routed.astype(jnp.float32) + shared_w * sdown.astype(jnp.float32)
    return out.astype(h.dtype).reshape(b, t, d)


def embed_tokens(cfg: ModelConfig, weights, tokens):
    """Token embedding lookup (+ Granite µP embedding scale)."""
    x = weights["tok_emb"][tokens]  # [B, T, D]
    if cfg.embedding_scale != 1.0:
        x = (x.astype(jnp.float32) * cfg.embedding_scale).astype(x.dtype)
    return x


def rope_slices(weights, pos_vec, t):
    """Per-(sequence, position) RoPE table rows: [B, T, 1, half] cos/sin."""
    positions = pos_vec[:, None] + jnp.arange(t)[None, :]  # [B, T]
    cos = weights["rope_cos"][positions][:, :, None, :]
    sin = weights["rope_sin"][positions][:, :, None, :]
    return cos, sin


def finish_logits(cfg: ModelConfig, weights, x, impl="xla",
                  last_logit_only=False, logit_index=None):
    """Final norm + vocab projection (+ Granite logit scale); x: [B, T, D]."""
    if logit_index is not None:
        x = jax.vmap(lambda xb: jax.lax.dynamic_index_in_dim(xb, logit_index, axis=0, keepdims=False))(x)
    elif last_logit_only:
        x = x[:, -1]
    x = rmsnorm(x, weights["final_norm"], cfg.rms_norm_eps)
    logits = matmul(weights["wcls"], x, impl).astype(jnp.float32)
    if cfg.logit_scale != 1.0:
        logits = logits * cfg.logit_scale
    return logits


def _write_rows(c_all, new, li, pos_vec, row0, gate):
    """Write [B, KV, T, hd] token KV into the STACKED cache [L, Ball, KV, S,
    hd] at (layer li, batch rows row0.., positions pos_vec[b]..). Writes touch
    only the T new positions — the whole point of the carry-form scan (a per-
    layer slice passed through scan xs/ys makes XLA copy the entire cache
    every step: 26 ms vs 2 ms per decode step at Phi-3 geometry, on chip).
    gate: traced bool (pipeline bubble steps) or per-batch bool vector [B]
    (sp shards own disjoint position stripes)."""
    per_b = gate is not None and getattr(gate, "ndim", 0) == 1
    upd = c_all
    for bi_ in range(new.shape[0]):
        row = bi_ if row0 is None else row0 + bi_
        nxt = jax.lax.dynamic_update_slice(
            upd, new[bi_][None, None].astype(c_all.dtype),
            (li, row, 0, pos_vec[bi_], 0))
        upd = jnp.where(gate[bi_], nxt, upd) if per_b else nxt
    if gate is not None and not per_b:  # bubble steps must not write garbage
        upd = jnp.where(gate, upd, c_all)
    return upd


def _write_scale_rows(c_all, snew, li, pos_vec, row0, gate):
    """snew [B, T, KV, 2] f32 (K scale, V scale per token-head) -> stacked
    scale rows [L, Ball, KV, 2, S]."""
    upd = c_all
    for bi_ in range(snew.shape[0]):
        row = bi_ if row0 is None else row0 + bi_
        blockv = snew[bi_].transpose(1, 2, 0)[None, None]  # [1, 1, KV, 2, T]
        upd = jax.lax.dynamic_update_slice(
            upd, blockv, (li, row, 0, 0, pos_vec[bi_]))
    if gate is not None:
        upd = jnp.where(gate, upd, c_all)
    return upd


def make_layer_fn(cfg: ModelConfig, impl, b, t, pos_vec, cos, sin, *,
                  quantized=False, paged=False, block_size=None, tables=None,
                  s_limit: int | None = None, ep_mesh=None, batch_offset=None,
                  write_gate=None, slw=None, tp_axis: str | None = None,
                  sp_axis: str | None = None, sp_off=None):
    """One transformer layer as a lax.scan step over stacked weights with the
    STACKED KV cache carried through the scan.

    layer_fn(carry, per_layer): carry = (x, kvc[, scale]) where the
    cache arrays keep their leading L axis ([L, Ball, KV, S, hd] dense pools
    or [L, NBLK, KV, BS, hd] paged pools); per_layer = (lw, layer_index).
    Writes touch only the T new positions; decode attention DMAs straight from
    the stacked arrays (layer_index-mode Pallas kernels) so no per-layer slice
    is ever materialized. batch_offset: this window's rows live at
    [batch_offset, batch_offset + b) of the cache batch axis (pipeline
    microbatches / lane prefill). write_gate: traced bool — False suppresses
    the cache writes (pipeline bubble steps).

    tp_axis: MANUAL tensor parallelism inside a shard_map (pipeline stages
    compose tp this way — GSPMD can't see into the stage loop): cfg must
    already carry the LOCAL head counts (n_heads/tp, n_kv_heads/tp), weights
    arrive pre-sharded Megatron-style (q/k/v/w1/w3 rows, wo/w2 columns), and
    the attention/FFN outputs psum over the axis.

    sp_axis/sp_off: MANUAL sequence parallelism inside a shard_map (r5,
    closes the pipeline.py sp==1 assert): the cache holds only this shard's
    position stripe [sp_off, sp_off + S_loc); writes gate on stripe
    ownership, decode attention runs the split kernel with partial-softmax
    stats and combines across the axis (exp(m - pmax m) * l weights), and
    prefill combines the masked-softmax partials the same way
    (_attention_sp). Dense, non-int8 caches."""
    kv, g = cfg.n_kv_heads, cfg.gqa_groups

    def _tp_sum(y):
        return jax.lax.psum(y, tp_axis) if tp_axis is not None else y

    def layer_fn(carry, per_layer):
        lw, li = per_layer
        if quantized:
            x, kvc, ssc = carry
        else:
            x, kvc = carry
            ssc = None
        sc_view = None  # dense [B, KV, 2, S] scale view (int8 mode)
        qkv_out = None
        if (impl == "pallas" and slw is not None and li is not None
                and "wqkv" in lw and isinstance(slw.get("wqkv"), QTensor)
                and slw["wqkv"].kind == "q8_row"):
            # q8_row decode: rmsnorm fused into the wqkv kernel's first grid
            # step (one fewer fusion boundary before the weight stream starts)
            from llamatpu.ops.layer_fused import qkv_norm_fused_rowq

            qkv_out = qkv_norm_fused_rowq(slw["wqkv"], slw["attn_norm"], x,
                                          li, cfg.rms_norm_eps)
        if qkv_out is None and "wqkv" in lw:
            h = rmsnorm(x, lw["attn_norm"], cfg.rms_norm_eps)
            qkv_out = _mm(lw, slw, li, "wqkv", h, impl)
        if qkv_out is not None:  # fused q+k+v (weights.fuse_layer_weights)
            qd, kd = cfg.n_heads * cfg.head_dim, kv * cfg.head_dim
            q = qkv_out[..., :qd]
            k = qkv_out[..., qd:qd + kd]
            v = qkv_out[..., qd + kd:]
        else:
            h = rmsnorm(x, lw["attn_norm"], cfg.rms_norm_eps)
            q = _mm(lw, slw, li, "wq", h, impl)
            k = _mm(lw, slw, li, "wk", h, impl)
            v = _mm(lw, slw, li, "wv", h, impl)
        if cfg.qkv_bias:
            q = q + lw["q_bias"].astype(q.dtype)
            k = k + lw["k_bias"].astype(k.dtype)
            v = v + lw["v_bias"].astype(v.dtype)
        q = q.reshape(b, t, cfg.n_heads, cfg.head_dim)
        k = k.reshape(b, t, kv, cfg.head_dim)
        v = v.reshape(b, t, kv, cfg.v_head_dim)
        if cfg.qk_norm:
            q = rmsnorm(q, lw["q_norm"], cfg.rms_norm_eps)
            k = rmsnorm(k, lw["k_norm"], cfg.rms_norm_eps)
        q = apply_rope(q, cos, sin, cfg.rope_style)
        k = apply_rope(k, cos, sin, cfg.rope_style)

        # stacked-kernel mode: decode attention DMAs straight from the carried
        # [L, ...] arrays (batch_offset windows fall back to materialized
        # slices — the kernels' index maps have no row offset)
        use_stacked = (impl == "pallas" and t == 1 and batch_offset is None
                       and sp_axis is None)
        sp_gate = None
        pos_vec_w = pos_vec
        if sp_axis is not None:
            assert not paged and not quantized, \
                "sp inside a stage: dense bf16/f32 cache only"
            s_loc = kvc.shape[3]
            pos_local = pos_vec - sp_off
            in_range = (pos_local >= 0) & (pos_local <= s_loc - t)
            sp_gate = (in_range if write_gate is None
                       else in_range & write_gate)
            pos_vec_w = jnp.clip(pos_local, 0, s_loc - t)
        # fused KV-append + attention (one pallas call replaces 2x
        # dynamic_update_slice + the attention call — megakernel v3 step 1,
        # PERF.md launch-residual lever). Dense bf16/f32 stacked caches whose
        # stripe fits the full-stripe kernel; int8-KV / long-context / gated
        # (pipeline) writes keep the unfused path.
        fused_write = fused_write_q = fused_split = False
        if use_stacked and not paged and write_gate is None:
            import os

            from llamatpu.ops.pallas_attention import (SPLIT_THRESHOLD_BYTES,
                                                       _pick_tile)

            s_phys = kvc.shape[3]
            long_cache = s_phys * kvc.dtype.itemsize >= SPLIT_THRESHOLD_BYTES
            ok = (s_phys % 32 == 0
                  and not os.environ.get("LLAMATPU_NO_FUSED_ATTN"))
            if long_cache:
                # long caches fuse the append into the splitKV kernel —
                # killing the per-layer dynamic_update_slice thunks that
                # dominate deep decode (61 ms/step of writes measured at
                # depth 16k, r4c probe)
                fused_split = ok = ok and _pick_tile(s_phys) >= 128
            fused_write = ok and not quantized
            fused_write_q = ok and quantized
        row0 = batch_offset
        width = cfg.head_dim + cfg.v_head_dim
        kvnew = jnp.concatenate([k, v], axis=-1)  # [B, T, KV, hd+vhd] packed
        kvq = s_new = None
        if paged:
            from llamatpu.runtime.paged_cache import (paged_gather,
                                                      paged_write_stacked)

            bs = block_size
            if quantized:
                from llamatpu.ops.kv_quant import quantize_kv

                from llamatpu.runtime.paged_cache import (
                    paged_gather_scale, paged_write_scale_stacked)

                kq, ks_new = quantize_kv(k)  # int8 [B,T,KV,hd], f32 [B,T,KV]
                vq, vs_new = quantize_kv(v)
                kvq = jnp.concatenate([kq, vq], axis=-1)
                s_new = jnp.stack([ks_new, vs_new], axis=-1)  # [B, T, KV, 2]
                kvc = paged_write_stacked(kvc, li, kvq, tables, pos_vec, bs)
                ssc = paged_write_scale_stacked(ssc, li, s_new, tables,
                                                pos_vec, bs)
            else:
                kvc = paged_write_stacked(kvc, li, kvnew, tables, pos_vec, bs)
            if not use_stacked:
                pool_l = jax.lax.dynamic_index_in_dim(kvc, li, 0, keepdims=False)
                kvd = paged_gather(pool_l, tables)
                if quantized:
                    sl = jax.lax.dynamic_index_in_dim(ssc, li, 0, keepdims=False)
                    sc_view = paged_gather_scale(sl, tables)
        else:
            if quantized:
                from llamatpu.ops.kv_quant import quantize_kv

                kq, ks_new = quantize_kv(k)  # int8 [B,T,KV,hd], f32 [B,T,KV]
                vq, vs_new = quantize_kv(v)
                kvq = jnp.concatenate([kq, vq], axis=-1)
                s_new = jnp.stack([ks_new, vs_new], axis=-1)  # [B, T, KV, 2]
                if not fused_write_q:
                    kvc = _write_rows(kvc, kvq.transpose(0, 2, 1, 3), li,
                                      pos_vec, row0, write_gate)
                    ssc = _write_scale_rows(ssc, s_new, li, pos_vec, row0,
                                            write_gate)
            elif not fused_write:
                kvc = _write_rows(kvc, kvnew.transpose(0, 2, 1, 3), li,
                                  pos_vec_w if sp_axis is not None else pos_vec,
                                  row0,
                                  sp_gate if sp_axis is not None else write_gate)
            if not use_stacked:
                r0 = 0 if row0 is None else row0
                s_full = kvc.shape[3]
                kvd = jax.lax.dynamic_slice(
                    kvc, (li, r0, 0, 0, 0), (1, b, kv, s_full, width))[0]
                if quantized:
                    sc_view = jax.lax.dynamic_slice(
                        ssc, (li, r0, 0, 0, 0), (1, b, kv, 2, s_full))[0]

        if use_stacked:
            q4 = q.reshape(b, kv, g, cfg.head_dim)
            if (fused_write and not fused_split and b == 1 and tp_axis is None
                    and not cfg.is_moe and slw is not None and li is not None
                    and "wo" in lw and "w13" in lw):
                import os as _os

                if not _os.environ.get("LLAMATPU_NO_ATTN_TAIL"):
                    # megakernel v3: KV-append + attention + wo + FFN as ONE
                    # pallas call (ops/layer_fused.py) — the layer becomes
                    # two weight-streaming calls total (norm+qkv; this).
                    # DEFAULT ON since r5b (386.9 vs 380.6 tok/s on chip,
                    # bit-exact vs the split-attention composition); the env
                    # var restores the v2 two-call path
                    from llamatpu.ops.layer_fused import \
                        layer_attn_tail_fused_rowq

                    mega = layer_attn_tail_fused_rowq(
                        slw["wo"], slw["w13"], slw["w2"], slw["ffn_norm"],
                        q4, kvnew[:, 0], kvc, x, pos_vec, li,
                        cfg.rms_norm_eps, cfg.attn_score_scale,
                        cfg.head_dim, cfg.residual_scale)
                    if mega is not None:
                        x, kvc = mega
                        carry = ((x, kvc, ssc) if quantized else (x, kvc))
                        return carry, None
            if paged:
                from llamatpu.ops.pallas_attention import decode_attention_paged

                attn = decode_attention_paged(
                    q4, kvc, tables, pos_vec, cfg.attn_score_scale,
                    scale_pool=ssc, hd=cfg.head_dim, layer_index=li,
                    interpret=jax.default_backend() != "tpu")
            elif fused_write and fused_split:
                from llamatpu.ops.pallas_attention import (
                    _pick_tile, decode_attention_split_fused_write)

                attn, kvc = decode_attention_split_fused_write(
                    q4, kvnew[:, 0], kvc, pos_vec, cfg.attn_score_scale, li,
                    hd=cfg.head_dim, s_tile=_pick_tile(kvc.shape[3]),
                    interpret=jax.default_backend() != "tpu")
            elif fused_write:
                from llamatpu.ops.pallas_attention import \
                    decode_attention_fused_write

                attn, kvc = decode_attention_fused_write(
                    q4, kvnew[:, 0], kvc, pos_vec, cfg.attn_score_scale, li,
                    hd=cfg.head_dim,
                    interpret=jax.default_backend() != "tpu")
            elif fused_write_q and fused_split:
                from llamatpu.ops.pallas_attention import (
                    _pick_tile, decode_attention_split_fused_write_q)

                attn, kvc, ssc = decode_attention_split_fused_write_q(
                    q4, kvq[:, 0], s_new[:, 0], kvc, ssc, pos_vec,
                    cfg.attn_score_scale, li, hd=cfg.head_dim,
                    s_tile=_pick_tile(kvc.shape[3]),
                    interpret=jax.default_backend() != "tpu")
            elif fused_write_q:
                from llamatpu.ops.pallas_attention import \
                    decode_attention_fused_write_q

                attn, kvc, ssc = decode_attention_fused_write_q(
                    q4, kvq[:, 0], s_new[:, 0], kvc, ssc, pos_vec,
                    cfg.attn_score_scale, li, hd=cfg.head_dim,
                    interpret=jax.default_backend() != "tpu")
            else:
                from llamatpu.ops.pallas_attention import decode_attention_auto

                attn = decode_attention_auto(
                    q4, kvc, pos_vec, cfg.attn_score_scale,
                    scale_rows=ssc, s_limit=s_limit, layer_index=li,
                    hd=cfg.head_dim)
            attn = attn.reshape(b, t, kv, g, cfg.v_head_dim)
        elif (sp_axis is not None and impl == "pallas" and t == 1
              and kvd.shape[2] % 128 == 0):
            from llamatpu.ops.pallas_attention import (
                _pick_tile, decode_attention_split_stats)

            s_loc = kvd.shape[2]
            tile = _pick_tile(s_loc)
            pos_k = jnp.clip(pos_vec - sp_off, 0, s_loc - 1)
            o_sh, m_sh, l_sh = decode_attention_split_stats(
                q.reshape(b, kv, g, cfg.head_dim), kvd, pos_k,
                cfg.attn_score_scale, hd=cfg.head_dim, s_tile=tile,
                interpret=jax.default_backend() != "tpu")
            valid = ((pos_vec - sp_off) >= 0)[:, None, None, None]
            m_sh = jnp.where(valid, m_sh, -1e30)
            m_g = jax.lax.pmax(m_sh, sp_axis)
            w = jnp.where(valid, jnp.exp(m_sh - m_g) * l_sh, 0.0)
            den = jax.lax.psum(w, sp_axis)
            num = jax.lax.psum(w * o_sh, sp_axis)
            attn = (num / jnp.maximum(den, 1e-38)).reshape(
                b, t, kv, g, cfg.v_head_dim)
        elif sp_axis is not None:
            kd = kvd[..., :cfg.head_dim]
            vd = kvd[..., cfg.head_dim:]
            attn = _attention_sp(cfg, q.reshape(b, t, kv, g, cfg.head_dim),
                                 kd, vd, pos_vec, t, sp_off, sp_axis)
        elif impl == "pallas" and t == 1:
            from llamatpu.ops.pallas_attention import decode_attention_auto

            attn = decode_attention_auto(
                q.reshape(b, kv, g, cfg.head_dim), kvd, pos_vec,
                cfg.attn_score_scale, scale_rows=sc_view,
                s_limit=s_limit, hd=cfg.head_dim,
            ).reshape(b, t, kv, g, cfg.v_head_dim)
        else:
            kd = kvd[..., :cfg.head_dim]
            vd = kvd[..., cfg.head_dim:]
            if quantized:
                from llamatpu.ops.kv_quant import dequantize_kv

                kd = dequantize_kv(kd, sc_view[..., 0:1, :])
                vd = dequantize_kv(vd, sc_view[..., 1:2, :])
            if s_limit and s_limit < kd.shape[2]:
                # static slice: XLA folds the offset/limit into the dot; the
                # rows past the logical length are write-slack, never attended
                lim = -(-s_limit // 8) * 8
                kd, vd = kd[:, :, :lim], vd[:, :, :lim]
            attn = _attention(cfg, q.reshape(b, t, kv, g, cfg.head_dim), kd, vd, pos_vec, t)
        attn = attn.reshape(b, t, kv * g * cfg.v_head_dim).astype(x.dtype)
        new_x = None
        if (impl == "pallas" and slw is not None and li is not None
                and not cfg.is_moe and tp_axis is None
                and "w13" in lw and "wo" in lw):
            # q8_row decode: the layer's whole post-attention weight set
            # (wo -> residual -> rmsnorm -> w13 -> silu -> w2 -> residual)
            # runs as ONE pallas call / one continuous DMA pipeline
            # (ops/layer_fused.py; PERF.md megakernel plan)
            from llamatpu.ops.layer_fused import layer_tail_fused_rowq

            new_x = layer_tail_fused_rowq(
                slw["wo"], slw["w13"], slw["w2"], slw["ffn_norm"], attn, x,
                li, cfg.rms_norm_eps, cfg.residual_scale)
        if new_x is not None:
            x = new_x
        else:
            attn_out = _tp_sum(_mm(lw, slw, li, "wo", attn, impl))
            if cfg.residual_scale != 1.0:
                attn_out = (attn_out.astype(jnp.float32) * cfg.residual_scale).astype(x.dtype)
            x = x + attn_out

            h2 = rmsnorm(x, lw["ffn_norm"], cfg.rms_norm_eps)
            if cfg.is_moe:
                assert tp_axis is None, "tp inside a pipeline stage is dense-only"
                ffn = _moe_ffn(cfg, h2, lw, impl, ep_mesh, slw, li)
            else:
                ffn = _tp_sum(_dense_ffn(cfg, h2, lw, impl, slw, li))
            if cfg.residual_scale != 1.0:
                ffn = (ffn.astype(jnp.float32) * cfg.residual_scale).astype(x.dtype)
            x = x + ffn
        carry = (x, kvc, ssc) if quantized else (x, kvc)
        return carry, None

    return layer_fn


def forward_tokens(cfg: ModelConfig, weights, tokens, cache, pos, impl="xla",
                   last_logit_only=False, logit_index=None, tables=None,
                   ep_mesh=None, s_limit: int | None = None,
                   batch_offset=None):
    """Run T tokens at absolute positions pos..pos+T-1 through the full model.

    tokens: int32 [B, T]; pos: scalar int32 OR per-sequence vector [B] (the
    continuous-batching path decodes sequences sitting at different positions);
    cache: KVCache, or PagedKVCache with `tables` [B, MAXBLK] block tables;
    returns (logits f32, new cache).
    logits: [B, T, vocab], or [B, vocab] when last_logit_only (static index -1)
    or logit_index (traced scalar — used by chunked prefill to pick the last
    REAL token's logits inside a padded final chunk).
    batch_offset (traced, dense cache only): tokens' B rows map to cache rows
    [batch_offset, batch_offset + B) — lane prefill into a wider batched cache
    without slicing/scattering the whole lane stripe.
    """
    from llamatpu.runtime.paged_cache import PagedKVCache

    paged = isinstance(cache, PagedKVCache)
    b, t = tokens.shape
    pos_vec = jnp.broadcast_to(jnp.atleast_1d(jnp.asarray(pos)), (b,))
    x = embed_tokens(cfg, weights, tokens)
    cos, sin = rope_slices(weights, pos_vec, t)
    quantized = cache.quantized
    layer_fn = make_layer_fn(cfg, impl, b, t, pos_vec, cos, sin,
                             quantized=quantized, paged=paged,
                             block_size=cache.block_size if paged else None,
                             tables=tables, s_limit=s_limit, ep_mesh=ep_mesh,
                             batch_offset=batch_offset,
                             slw=weights["layers"] if impl == "pallas" else None)

    # the STACKED cache rides the scan CARRY with position-only writes (xs/ys
    # plumbing makes XLA copy the whole cache per step — see make_layer_fn)
    arrs = ((cache.kv_pool,) if paged else (cache.kv,))
    if quantized:
        arrs += (cache.scale,)
    li_arr = jnp.arange(cfg.n_layers, dtype=jnp.int32)
    carry, _ = jax.lax.scan(layer_fn, (x,) + arrs, (weights["layers"], li_arr))
    x, new = carry[0], carry[1:]

    if paged:
        from llamatpu.runtime.paged_cache import PagedKVCache as _P

        new_cache = (_P(new[0], cache.block_size, new[1])
                     if quantized else _P(new[0], cache.block_size))
    else:
        new_cache = KVCache(*new)

    logits = finish_logits(cfg, weights, x, impl, last_logit_only, logit_index)
    return logits, new_cache
