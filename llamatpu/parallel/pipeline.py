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

No paged-cache support (pp shards the cache's L axis; the paged pool's block
tables are position-indexed, not layer-indexed — a later round).
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
            return QTensor(s, s, leaf.kind, leaf.logical_out, leaf.layout)
        return s

    return {name: spec_for(name, leaf) for name, leaf in layers.items()}


def forward_tokens_pp(cfg: ModelConfig, weights, tokens, cache, pos, mesh,
                      impl="xla", last_logit_only=False, logit_index=None,
                      s_limit: int | None = None, batch_offset=None):
    """Pipeline-parallel forward_tokens (dense KVCache only). Same contract as
    models/transformer.forward_tokens; `mesh` must carry a pp axis > 1 and the
    layer weights / cache must already be sharded by parallel/shard.py.
    Composes with dp (batch shards) and tp (Megatron inside each stage).
    batch_offset (dp == 1 only): the window's b rows live at cache rows
    [batch_offset, batch_offset + b) — lane prefill for the batched engines."""
    pp = mesh.shape["pp"]
    dp = mesh.shape.get("dp", 1)
    tp = mesh.shape.get("tp", 1)
    assert mesh.shape.get("sp", 1) == 1, "sp inside a pipeline stage: future work"
    assert cfg.n_layers % pp == 0, (cfg.n_layers, pp)
    if tp > 1:
        assert cfg.n_heads % tp == 0 and cfg.n_kv_heads % tp == 0, \
            (cfg.n_heads, cfg.n_kv_heads, tp)
        assert not cfg.is_moe, "tp inside a pipeline stage is dense-only"
    b, t = tokens.shape
    assert b % dp == 0, (b, dp)
    if batch_offset is not None:
        assert dp == 1, "batch_offset lane windows don't compose with dp"
    b_local = b // dp
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
    cache_args = (cache.k, cache.v) + (
        (cache.k_scale, cache.v_scale) if quantized else ())
    tp_kv = "tp" if tp > 1 else None
    kv_spec = P("pp", "dp", tp_kv)

    l_loc = cfg.n_layers // pp
    off = 0 if batch_offset is None else batch_offset

    def stage_fn(layers_l, static_l, tokens_l, pos_l, *cache_l):
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
            # steps gate their writes off
            layer_fn = make_layer_fn(cfg_stage, impl, mb, t, pos_mb, cos, sin,
                                     quantized=quantized, s_limit=s_limit,
                                     batch_offset=off + r0, write_gate=valid,
                                     tp_axis=tp_axis,
                                     slw=layers_l if impl == "pallas" else None)
            carry_l, _ = jax.lax.scan(
                layer_fn, (x,) + cache_l,
                (layers_l, jnp.arange(l_loc, dtype=jnp.int32)))
            y, cache_l = carry_l[0], carry_l[1:]
            outbuf = jnp.where(
                valid & (s == pp - 1),
                jax.lax.dynamic_update_slice_in_dim(outbuf, y, r0, 0), outbuf)
            cur = jax.lax.ppermute(y, "pp", perm)
            return (cur, cache_l, outbuf)

        cur0 = jnp.zeros((mb, t, cfg.dim), dtype)
        outbuf0 = jnp.zeros((b_local, t, cfg.dim), dtype)
        cur, cache_l, outbuf = jax.lax.fori_loop(
            0, steps, body, (cur0, cache_l, outbuf0))
        outbuf = jax.lax.psum(outbuf, "pp")  # only the last stage is nonzero
        return (outbuf,) + cache_l

    fn = shard_map(
        stage_fn, mesh=mesh,
        in_specs=(pp_layer_specs(weights["layers"], tp),
                  jax.tree.map(lambda _: P(), static_w,
                               is_leaf=lambda x: isinstance(x, QTensor)),
                  P("dp", None), P("dp"),
                  *([kv_spec] * len(cache_args))),
        out_specs=(P("dp", None, None), *([kv_spec] * len(cache_args))),
        check_vma=False,
    )
    out = fn(weights["layers"], static_w, tokens, pos_vec, *cache_args)
    hidden, new_kv = out[0], out[1:]
    new_cache = (KVCache(*new_kv[:2], *new_kv[2:]) if quantized
                 else KVCache(*new_kv))
    logits = finish_logits(cfg, weights, hidden, impl, last_logit_only,
                           logit_index)
    return logits, new_cache
