"""Expert parallelism: MoE expert weights sharded across the mesh.

New TPU-native scope (SURVEY.md §2.9 gap list; the reference is single-device
and runs MoE on its CPU path, InferenceCore.java:366-415). Megatron TP shards
every expert's out-features; EXPERT parallelism instead places whole experts
on devices — the right layout when E x expert_size dominates HBM (the usual
MoE regime). Design:

- expert tensors shard [L, E, O, I] -> E over the "tp" axis (weight_shardings
  with ep=True); attention + shared expert stay Megatron TP
- compute runs under shard_map: every device sees the full token set
  (replicated activations), keeps only assignments routed to ITS experts
  (others sort into an overflow group whose tiles carry the -1 inactive
  sentinel — the grouped kernel skips their compute AND weight DMA), and
  psums the partial token outputs across the axis
- per-device work is ~N*k/ep assignments: FLOPs and expert-weight traffic both
  scale with the expert-parallel degree; the psum is one [N, D] reduction,
  the same collective volume as a Megatron row-parallel layer
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
try:
    from jax import shard_map  # jax >= 0.8
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map
from jax.sharding import PartitionSpec as P

from llamatpu.models.weights import QTensor
from llamatpu.ops.moe_grouped import grouped_ffn, sort_by_expert


def _expert_leaf_spec(leaf):
    if isinstance(leaf, QTensor):
        sp = P("tp", None, None)
        return QTensor(sp, sp, leaf.kind, leaf.logical_out, leaf.layout,
                       offs=None if leaf.offs is None else sp)
    return P("tp", None, None)


def moe_ffn_expert_parallel(cfg, hf, top_w, top_i, lw, mesh, tm: int = 32):
    """Routed-expert FFN with expert-sharded weights. hf: [N, D];
    returns [N, D] f32. Bit-compatible with the single-device grouped path up
    to f32 psum reordering.

    dp x ep composition (round 3): when the mesh carries a dp axis and N
    divides by it, TOKENS shard over "dp" while EXPERTS shard over "tp" — each
    device computes its N/dp tokens x its E/ep experts and psums over "tp"
    only. This is the north-star large-MoE serving topology: expert weights
    (the dominant HBM term) divide by ep, attention/KV divide by dp, and no
    pipeline bubbles exist — which is why dp x ep, not pp x ep, is the shape
    the batched engines compose (see parallel/pipeline.py docstring)."""
    experts = {k: lw[k] for k in ("gate_exps", "up_exps", "down_exps")}
    e_total = cfg.n_experts
    ep = mesh.shape["tp"]
    assert e_total % ep == 0, (e_total, ep)
    e_loc = e_total // ep
    dp = mesh.shape.get("dp", 1)
    n = hf.shape[0]
    tok_spec = P("dp") if (dp > 1 and n % dp == 0) else P()

    def local_moe(hf_, top_w_, top_i_, experts_):
        rank = jax.lax.axis_index("tp")
        lo = rank * e_loc
        local = (top_i_ >= lo) & (top_i_ < lo + e_loc)
        li = jnp.where(local, top_i_ - lo, e_loc)     # e_loc = overflow group
        w = jnp.where(local, top_w_, 0.0)
        row_token, row_src, tile_expert = sort_by_expert(li, e_loc + 1, tm)
        # overflow tiles -> inactive sentinel (no compute, no weight DMA)
        tile_expert = jnp.where(tile_expert >= e_loc, -1, tile_expert)
        out = grouped_ffn(experts_, hf_, w, row_token, row_src, tile_expert, tm)
        return jax.lax.psum(out, "tp")

    fn = shard_map(
        local_moe, mesh=mesh,
        in_specs=(tok_spec, tok_spec, tok_spec, jax.tree.map(
            _expert_leaf_spec, experts,
            is_leaf=lambda x: isinstance(x, QTensor))),
        out_specs=tok_spec,
        check_vma=False,  # pallas_call inside shard_map lacks vma metadata
    )
    return fn(hf, top_w.astype(jnp.float32), top_i, experts)