"""Sharding rules: Megatron-style tensor parallelism + data parallelism for
the unified transformer weights/KV pytrees.

New TPU-native scope beyond the reference (SURVEY.md §2.9): weights and KV are
tensor-sharded over the "tp" mesh axis so per-layer collectives (an all-reduce
of the attention and FFN outputs) ride ICI; batch shards over "dp". Rules:

- column-parallel (shard out-features):  wq wk wv w1 w3, q/k/v bias
- row-parallel   (shard in-features):    wo w2  -> XLA inserts the psum
- replicated:                            norms, rope tables, embedding
- vocab-sharded:                         wcls (logits all-gathered/argmaxed by
                                         XLA inside the sampling fusion)
- KV cache: heads on "tp", batch on "dp"
- MoE expert tensors: experts stay whole, sharded over out-features like dense
  (expert-parallel placement is a later-round upgrade)

QTensor leaves shard qs and scales with the same spec (scales have in/32 lanes
— same partitioning semantics since 32 | in-shard when tp | out as enforced).
"""
from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from llamatpu.models.config import ModelConfig
from llamatpu.models.weights import QTensor


def qtensor_specs(spec: P, leaf: QTensor, tp: int) -> tuple[P, P] | None:
    """(qs_spec, scales_spec) for a QTensor under `spec`, or None when the
    tensor must stay replicated (a sharded dim that doesn't divide).

    q8_row scales are [..., out, 1]: they follow an OUT-axis shard but stay
    replicated under an in-features (row-parallel) shard — the per-row scale
    multiplies the OUTPUT, which is linear over the partial-sum psum, so
    replicating it is exact. Block-scale tensors ([..., out, in/32]) share the
    qs spec (32 | in-shard whenever tp | in)."""
    def size(axis_name):  # mesh axis size ("pp" always divides L by assert)
        return tp if axis_name == "tp" else 1

    sc_axes = []
    for ax, a in enumerate(spec):
        if a is None:
            sc_axes.append(None)
            continue
        if size(a) > 1 and leaf.qs.shape[ax] % size(a):
            return None
        if leaf.scales.shape[ax] == 1 and size(a) > 1:
            if leaf.kind != "q8_row" or ax != leaf.qs.ndim - 1:
                return None  # unexpected: only q8_row's in-axis is size-1
            sc_axes.append(None)  # in-features shard: scales replicated
        else:
            if size(a) > 1 and leaf.scales.shape[ax] % size(a):
                return None
            sc_axes.append(a)
    return spec, P(*sc_axes)


def _spec_for(name: str, ndim_extra: int = 0, ep: bool = False) -> P:
    """PartitionSpec for a stacked [L, out, in] (or [L, E, out, in]) weight.
    With ep=True, routed-expert tensors shard the EXPERT axis over "tp"
    (whole experts per device, parallel/expert.py) instead of out-features."""
    col = ("wq", "wk", "wv", "w1", "w3", "gate_exps", "up_exps",
           "shared_gate", "shared_up")
    row = ("wo", "w2", "down_exps", "shared_down")
    if ep and name.endswith("_exps"):
        return P(None, "tp", None, None)
    lead = (None,) * (1 + ndim_extra)  # layer (+ expert) axes unsharded
    if name in col:
        return P(*lead, "tp", None)
    if name in row:
        return P(*lead, None, "tp")
    return P()  # replicated: norms, biases handled below, router, shared_gate_inp


def weight_shardings(cfg: ModelConfig, mesh: Mesh, weights: dict,
                     ep: bool = False) -> dict:
    """Pytree of NamedShardings matching the weights dict structure.

    With a pp axis > 1 every stacked layer tensor shards its leading L axis
    over "pp" instead (stage-local weights for parallel/pipeline.py; pp
    composes with dp only, so tp specs don't apply)."""

    def ns(spec):
        return NamedSharding(mesh, spec)

    tp = mesh.shape.get("tp", 1)
    pp = mesh.shape.get("pp", 1)
    if pp > 1:
        assert cfg.n_layers % pp == 0, (cfg.n_layers, pp)
        from llamatpu.parallel.pipeline import pp_layer_specs

        # layer stages over "pp", Megatron row/col sharding over "tp" inside
        # each stage (manual collectives in forward_tokens_pp)
        layers = {
            name: (QTensor(ns(spec.qs), ns(spec.scales), spec.kind,
                           spec.logical_out, spec.layout,
                           offs=None if spec.offs is None else ns(spec.offs))
                   if isinstance(spec, QTensor) else ns(spec))
            for name, spec in pp_layer_specs(weights["layers"], tp).items()
        }
        wcls = weights["wcls"]
        rep = ns(P())
        wcls_s = ns(P("tp", None)) if tp > 1 else rep
        return {
            "tok_emb": rep, "final_norm": rep,
            "wcls": (QTensor(wcls_s, wcls_s, wcls.kind, wcls.logical_out,
                             wcls.layout,
                             offs=None if wcls.offs is None else wcls_s)
                     if isinstance(wcls, QTensor) else wcls_s),
            "rope_cos": rep, "rope_sin": rep,
            "layers": layers,
        }

    def qt(leaf, spec):
        """NamedSharding pair for a QTensor, falling back to replicated when a
        sharded dim doesn't divide on qs or scales (production dims do; tiny
        test geometries may not)."""
        pair = qtensor_specs(spec, leaf, tp)
        if pair is None:
            pair = (P(), P())
        return QTensor(ns(pair[0]), ns(pair[1]), leaf.kind, leaf.logical_out,
                       leaf.layout,
                       offs=None if leaf.offs is None else ns(pair[1]))

    def layer_spec(name, leaf):
        extra = 1 if name.endswith("_exps") else 0
        if name in ("q_bias", "k_bias", "v_bias"):
            return ns(P(None, "tp"))
        if isinstance(leaf, QTensor):
            return qt(leaf, _spec_for(name, extra, ep))
        if getattr(leaf, "ndim", 0) >= 3 + extra:
            return ns(_spec_for(name, extra, ep))
        return ns(P())

    layers = {name: layer_spec(name, leaf)
              for name, leaf in weights["layers"].items()}

    wcls = weights["wcls"]
    return {
        "tok_emb": ns(P()),
        "final_norm": ns(P()),
        "wcls": (qt(wcls, P("tp", None)) if isinstance(wcls, QTensor)
                 else ns(P("tp", None))),
        "rope_cos": ns(P()),
        "rope_sin": ns(P()),
        "layers": layers,
    }


def cache_shardings(cfg: ModelConfig, mesh: Mesh, cache=None):
    """KVCache sharding: packed [L, B, n_kv, S, hd+vhd] -> batch on dp, kv heads on tp,
    sequence positions on sp (sequence-parallel attention: the softmax max/sum
    and the att·V contraction over the sharded S axis become GSPMD all-reduces
    over "sp" — the TPU-native splitKV-across-chips, no reference counterpart).
    Scale rows of an int8 cache ([L, B, n_kv, 2, S]) put S on their lane axis.
    Pass the cache to pick up the optional scale fields and the S-divisibility
    guard (an S not divisible by sp stays unsharded)."""
    from llamatpu.models.transformer import KVCache

    sp = "sp" if mesh.shape.get("sp", 1) > 1 else None
    if cache is not None and sp and cache.kv.shape[3] % mesh.shape["sp"]:
        sp = None  # uneven split: keep S replicated
    pp = "pp" if mesh.shape.get("pp", 1) > 1 else None  # L axis -> stages
    kv_s = NamedSharding(mesh, P(pp, "dp", "tp", sp, None))
    if cache is not None and getattr(cache, "quantized", False):
        sc_s = NamedSharding(mesh, P(pp, "dp", "tp", None, sp))
        return KVCache(kv_s, sc_s)
    return KVCache(kv_s)


def paged_cache_shardings(cfg: ModelConfig, mesh: Mesh, cache):
    """PagedKVCache sharding: the pool [L, NBLK, KV, BS, hd+vhd] puts kv heads on
    "tp" and (with pp > 1) the layer axis on "pp". NBLK stays replicated —
    block tables index arbitrary pool blocks, so splitting the pool would turn
    every table lookup into a cross-device gather; paged serving shards the
    MODEL (tp/pp), not the pool."""
    from llamatpu.runtime.paged_cache import PagedKVCache

    pp = "pp" if mesh.shape.get("pp", 1) > 1 else None
    kv_s = NamedSharding(mesh, P(pp, None, "tp", None, None))
    if cache.quantized:
        sc_s = NamedSharding(mesh, P(pp, None, "tp", None, None))
        return PagedKVCache(kv_s, cache.block_size, sc_s)
    return PagedKVCache(kv_s, cache.block_size)


def shard_model(weights: dict, cfg: ModelConfig, mesh: Mesh, ep: bool = False) -> dict:
    """device_put the weights pytree with TP/DP (+ optional EP) shardings."""
    shardings = weight_shardings(cfg, mesh, weights, ep)
    return jax.device_put(weights, shardings)
