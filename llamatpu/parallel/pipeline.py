"""Pipeline parallelism: layer stages over the "pp" mesh axis.

New TPU-native scope (the reference is single-device, SURVEY.md §2.9). The
memory motivation: a model whose stacked layer weights + KV cache exceed one
chip's HBM splits L layers into pp contiguous stages, each device holding
L/pp layers and their KV stripes. The throughput motivation: microbatch
pipelining (GPipe-style) keeps every stage busy during batched prefill/decode.

Design (shard_map over the mesh — manual SPMD, the scaling-book pipeline
recipe; GSPMD alone would move WEIGHTS to activations for a scan over a
layer-sharded axis, which is backwards):

- stacked layer weights shard their leading L axis over "pp"
  (weight_shardings with pp>1); KV cache shards its L axis the same way
- the local batch splits into M = min(B_local, pp) microbatches; a
  lax.fori_loop runs M + pp - 1 steps; at step t, stage s processes
  microbatch t - s (when 0 <= t - s < M): stage 0 ingests the microbatch's
  embeddings, every stage scans its local layers (the SAME layer_fn
  forward_tokens scans — models/transformer.py make_layer_fn), and
  lax.ppermute hands the activation to stage s+1; the last stage accumulates
  final hidden states, psum-broadcast after the loop
- idle stages compute on garbage and mask their cache/output writes — the
  standard SPMD pipeline trade (bubble steps burn FLOPs, not correctness)
- composes with dp (each dp row pipelines its own batch shard) AND with tp
  INSIDE each stage (round 2): q/k/v/w1/w3 shard rows and wo/w2 columns over
  "tp" (weight_shardings), the stage runs with LOCAL head counts, and the
  attention/FFN outputs psum over "tp" (make_layer_fn tp_axis — manual
  Megatron collectives, since GSPMD cannot see into the stage loop)
- batch_offset maps a small window (one scheduler lane's prefill chunk) onto
  its cache rows, so the continuous-batching engines can drive a pipelined
  model (BatchEngine with pp>1)

Paged-cache support (round 3): the pool's L axis shards over "pp" exactly like
the dense cache; block tables are position-indexed and layer-agnostic, so they
replicate per stage, and pipeline bubble steps swap in the trash-block table
(the paged decode loop's inactive-lane convention) instead of a write gate.

Why pp x EP is deliberately NOT composed: for the biggest MoE checkpoints the
expert stacks are the dominant HBM term, and expert parallelism already
divides them by ep — dp x ep (tokens over dp, whole experts over tp, paged
pool + continuous batching) reaches the same per-chip memory as pp x ep would,
with no pipeline bubbles and one psum per MoE layer (parallel/expert.py,
dryrun `ep x dp paged-serving` step). pp remains the tool for DENSE models
whose layer stack exceeds a chip.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

try:
    from jax import shard_map  # jax >= 0.8
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map
from jax.sharding import PartitionSpec as P

from llamatpu.models.config import ModelConfig
from llamatpu.models.transformer import (KVCache, embed_tokens, finish_logits,
                                         make_layer_fn)
from llamatpu.models.weights import QTensor


def pp_layer_specs(layers: dict, tp: int = 1):
    """Per-leaf PartitionSpecs: leading (layer) axis over "pp", plus Megatron
    row/column sharding over "tp" inside each stage when tp > 1."""
    col = ("wq", "wk", "wv", "w1", "w3", "wqkv", "w13")
    row = ("wo", "w2")

    def spec_for(name, leaf):
        if tp > 1 and name in col:
            s = P("pp", "tp", None)
        elif tp > 1 and name in row:
            s = P("pp", None, "tp")
        elif tp > 1 and name in ("q_bias", "k_bias", "v_bias"):
            s = P("pp", "tp")
        else:
            s = P("pp")
        if isinstance(leaf, QTensor):
            from llamatpu.parallel.shard import qtensor_specs

            pair = qtensor_specs(s, leaf, tp) or (P("pp"), P("pp"))
            return QTensor(pair[0], pair[1], leaf.kind, leaf.logical_out,
                           leaf.layout,
                           offs=None if leaf.offs is None else pair[1])
        return s

    return {name: spec_for(name, leaf) for name, leaf in layers.items()}


def forward_tokens_pp(cfg: ModelConfig, weights, tokens, cache, pos, mesh,
                      impl="xla", last_logit_only=False, logit_index=None,
                      s_limit: int | None = None, batch_offset=None,
                      tables=None):
    """Pipeline-parallel forward_tokens (dense KVCache or PagedKVCache). Same
    contract as models/transformer.forward_tokens; `mesh` must carry a pp axis
    > 1 and the layer weights / cache must already be sharded by
    parallel/shard.py. Composes with dp (batch shards) and tp (Megatron inside
    each stage).
    batch_offset (dense, dp == 1 only): the window's b rows live at cache rows
    [batch_offset, batch_offset + b) — lane prefill for the batched engines.
    tables [b, MAXBLK] (paged): each stage holds its layers' stripe of the
    block pool ([L/pp, NBLK, ...]); tables are position-indexed and layer-
    agnostic, so they replicate per stage (sliced per microbatch); pipeline
    BUBBLE steps route their writes to the trash block (last pool block, the
    same convention the paged decode loop uses for inactive lanes)."""
    from llamatpu.runtime.paged_cache import PagedKVCache

    paged = isinstance(cache, PagedKVCache)
    pp = mesh.shape["pp"]
    dp = mesh.shape.get("dp", 1)
    tp = mesh.shape.get("tp", 1)
    sp = mesh.shape.get("sp", 1)
    assert cfg.n_layers % pp == 0, (cfg.n_layers, pp)
    if sp > 1:
        # sequence parallelism INSIDE the stage (r5; closed the r3/r4 gap):
        # the KV stripe's S axis shards over "sp"; make_layer_fn runs the
        # split kernel with partial-softmax stats and combines across the
        # axis manually (GSPMD cannot see into the stage loop). Dense
        # bf16/f32 caches; window length must divide the local stripe so
        # chunk writes never straddle shards.
        assert not paged and not cache.quantized, \
            "sp inside a stage: dense bf16/f32 cache only"
        assert cache.kv.shape[3] % sp == 0, (cache.kv.shape[3], sp)
        s_loc_sp = cache.kv.shape[3] // sp
        t_win = tokens.shape[1]
        assert t_win == 1 or s_loc_sp % t_win == 0, (s_loc_sp, t_win)
    if tp > 1:
        assert cfg.n_heads % tp == 0 and cfg.n_kv_heads % tp == 0, \
            (cfg.n_heads, cfg.n_kv_heads, tp)
        assert not cfg.is_moe, "tp inside a pipeline stage is dense-only"
    b, t = tokens.shape
    # lane_dp: a single-lane window (batched-engine lane prefill) under dp>1.
    # The window replicates across dp ranks; only the rank OWNING the lane's
    # cache rows keeps its writes and output (others compute gated-off garbage
    # — their per-rank caches hold other lanes' KV, so their activations are
    # wrong past layer 1 and are masked out of the psum).
    lane_dp = batch_offset is not None and dp > 1
    if lane_dp:
        assert b == 1, "batch_offset under dp>1 is for single-lane windows"
    else:
        assert b % dp == 0, (b, dp)
    if paged:
        assert tables is not None and batch_offset is None
    b_local = b if lane_dp else b // dp
    quantized = cache.quantized
    pos_vec = jnp.broadcast_to(jnp.atleast_1d(jnp.asarray(pos)), (b,))

    # stage-local head counts for tp (weights arrive row/column-sharded)
    cfg_stage = (dataclasses.replace(cfg, n_heads=cfg.n_heads // tp,
                                     n_kv_heads=cfg.n_kv_heads // tp)
                 if tp > 1 else cfg)
    tp_axis = "tp" if tp > 1 else None

    m_count = min(b_local, pp)
    while b_local % m_count:
        m_count -= 1
    mb = b_local // m_count
    steps = m_count + pp - 1
    perm = [(i, (i + 1) % pp) for i in range(pp)]

    # only what the stages need inside the shard_map; final norm + wcls run
    # outside on the psum-broadcast hidden states
    static_w = {k: weights[k] for k in ("tok_emb", "rope_cos", "rope_sin")}
    tp_kv = "tp" if tp > 1 else None
    if paged:
        cache_args = (cache.kv_pool,) + ((cache.scale,) if quantized else ())
        kv_spec = P("pp", None, tp_kv)  # pool [L, NBLK, KV, BS, hd+vhd]
        bs = cache.block_size
        trash = cache.kv_pool.shape[1] - 1
    else:
        cache_args = (cache.kv,) + ((cache.scale,) if quantized else ())
        kv_spec = P("pp", "dp", tp_kv, "sp" if sp > 1 else None)

    l_loc = cfg.n_layers // pp
    off = 0 if batch_offset is None else batch_offset
    rows_loc = None if paged else cache.kv.shape[1] // dp  # cache rows per dp shard

    def stage_fn(layers_l, static_l, tokens_l, pos_l, tables_l, *cache_l):
        s = jax.lax.axis_index("pp")
        dtype = static_l["tok_emb"].dtype

        def body(step, carry):
            cur, cache_l, outbuf = carry
            mi = jnp.clip(step - s, 0, m_count - 1)
            valid = (step - s >= 0) & (step - s < m_count)
            r0 = mi * mb
            tok_mb = jax.lax.dynamic_slice_in_dim(tokens_l, r0, mb, 0)
            pos_mb = jax.lax.dynamic_slice_in_dim(pos_l, r0, mb, 0)
            x0 = embed_tokens(cfg, static_l, tok_mb)  # stage 0's ingest
            x = jnp.where(s == 0, x0, cur)
            positions = pos_mb[:, None] + jnp.arange(t)[None, :]
            cos = static_l["rope_cos"][positions][:, :, None, :]
            sin = static_l["rope_sin"][positions][:, :, None, :]
            # carry-form layer scan: the stage-local stacked cache flows
            # through; this microbatch's rows start at off + r0 and bubble
            # steps gate their writes off (dense) or land in the trash block
            # (paged: tables are swapped wholesale, same trick the paged
            # decode loop uses for inactive lanes)
            owner = jnp.bool_(True)
            if paged:
                tbl_mb = jax.lax.dynamic_slice_in_dim(tables_l, r0, mb, 0)
                tbl_mb = jnp.where(valid, tbl_mb, jnp.int32(trash))
                paged_kw = dict(paged=True, block_size=bs, tables=tbl_mb)
            elif lane_dp:
                # replicated single-lane window: only the dp rank whose cache
                # stripe holds row `off` keeps writes/output (others' caches
                # hold other lanes, so their activations are garbage past the
                # first attention — harmless because fully gated + masked)
                local_off = off + r0 - jax.lax.axis_index("dp") * rows_loc
                owner = (local_off >= 0) & (local_off < rows_loc)
                paged_kw = dict(
                    batch_offset=jnp.clip(local_off, 0, rows_loc - mb),
                    write_gate=valid & owner)
            else:
                paged_kw = dict(batch_offset=off + r0, write_gate=valid)
            sp_kw = {}
            if sp > 1:
                sp_kw = dict(sp_axis="sp",
                             sp_off=jax.lax.axis_index("sp")
                             * (cache_l[0].shape[3] if not paged else 0))
            layer_fn = make_layer_fn(cfg_stage, impl, mb, t, pos_mb, cos, sin,
                                     quantized=quantized,
                                     s_limit=None if sp > 1 else s_limit,
                                     tp_axis=tp_axis,
                                     slw=layers_l if impl == "pallas" else None,
                                     **sp_kw, **paged_kw)
            carry_l, _ = jax.lax.scan(
                layer_fn, (x,) + cache_l,
                (layers_l, jnp.arange(l_loc, dtype=jnp.int32)))
            y, cache_l = carry_l[0], carry_l[1:]
            outbuf = jnp.where(
                valid & (s == pp - 1) & owner,
                jax.lax.dynamic_update_slice_in_dim(outbuf, y, r0, 0), outbuf)
            cur = jax.lax.ppermute(y, "pp", perm)
            return (cur, cache_l, outbuf)

        cur0 = jnp.zeros((mb, t, cfg.dim), dtype)
        outbuf0 = jnp.zeros((b_local, t, cfg.dim), dtype)
        cur, cache_l, outbuf = jax.lax.fori_loop(
            0, steps, body, (cur0, cache_l, outbuf0))
        # only the last stage (and, in lane_dp mode, the owner rank) is nonzero
        outbuf = jax.lax.psum(outbuf, ("pp", "dp") if lane_dp else "pp")
        return (outbuf,) + cache_l

    tables_arg = tables if paged else jnp.zeros((b, 1), jnp.int32)
    win_b = None if lane_dp else "dp"  # lane windows replicate across dp
    fn = shard_map(
        stage_fn, mesh=mesh,
        in_specs=(pp_layer_specs(weights["layers"], tp),
                  jax.tree.map(lambda _: P(), static_w,
                               is_leaf=lambda x: isinstance(x, QTensor)),
                  P(win_b, None), P(win_b), P(win_b, None),
                  *([kv_spec] * len(cache_args))),
        out_specs=(P(win_b, None, None), *([kv_spec] * len(cache_args))),
        check_vma=False,
    )
    out = fn(weights["layers"], static_w, tokens, pos_vec, tables_arg,
             *cache_args)
    hidden, new_kv = out[0], out[1:]
    if paged:
        new_cache = PagedKVCache(new_kv[0], cache.block_size,
                                 *(new_kv[1:] if quantized else ()))
    else:
        new_cache = KVCache(*new_kv)
    logits = finish_logits(cfg, weights, hidden, impl, last_logit_only,
                           logit_index)
    return logits, new_cache
