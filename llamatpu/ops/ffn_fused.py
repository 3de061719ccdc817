"""Fused FFN megakernel for q8_row weights: w13 -> silu*up -> w2 in ONE
pallas call per layer.

Why (PERF.md): decode is a weight-stream problem, and the stream rate is set
by grid steps per kernel call — each pallas_call pays a pipeline fill before
its first block lands (2-step wo streams at 535 GB/s vs 789 for the 126-step
vocab head). Splitting the FFN into two calls (w13, w2) restarts the DMA
pipeline mid-FFN and adds a fusion boundary for the silu glue. This kernel
runs the whole FFN weight set (w13 then w2, ~57 MB/layer for Llama-1B) as one
continuous (n13 + n2)-step pipeline: while the last w13 blocks are dotted,
the first w2 blocks are already in flight.

q8_row only (models/weights.py rowq_requant): per-row scales multiply the
[T, to] chunk in-kernel (no block-scale expansion, no column interleave), so
the heterogeneous two-phase grid stays simple. The dequant path and the
block-scale formats keep the two-call path in transformer._dense_ffn.

Grid phases (1-D grid of n13 + n2 steps, scalar-prefetched layer index):
  steps [0, n13):    g13[:, s*to13:(s+1)*to13] = (x @ w13_blk^T) * s13_blk
  step  n13:         act = silu(g13[:, :F]) * g13[:, F:]   (VMEM scratch)
  steps [n13, end):  out[:, j*to2:(j+1)*to2] = (act @ w2_blk^T) * s2_blk

Index maps clamp each input to its own phase, so inactive phases issue no new
DMA (same-index blocks are not re-fetched). Reference tier being replaced:
the per-projection GEMV kernels + host-side silu of
TransformerComputeKernelsLayered.java:2773-2945.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from llamatpu.models.weights import QTensor

_MAX_T = 32          # decode/small-batch only; prefill takes the int8 MXU path
_BLOCK_BYTES = 2.4 * 1024 * 1024
_VMEM_BUDGET = 12 * 1024 * 1024


def _pick_to(o: int, i: int) -> int:
    for to in (1024, 512, 256, 128):
        if o % to == 0 and to * i <= _BLOCK_BYTES:
            return to
    return 0


def _vmem_need(tp: int, d: int, f: int, o13: int, to13: int, to2: int,
               xbytes: int, act_bytes: int) -> int:
    """Total VMEM estimate: the f32 g13/act scratches coexist with BOTH
    phases' double-buffered weight blocks (index maps clamp inactive phases
    to a constant block, but the pipeline still allocates their buffers)."""
    return (tp * d * xbytes                     # x block (constant index)
            + tp * o13 * 4                      # g13 scratch (f32)
            + tp * f * act_bytes                # act scratch (dot dtype)
            + 2 * tp * to2 * 4                  # out blocks, double-buffered
            + 2 * (to13 * d + to13 * 4)         # w13 + s13 blocks, 2x
            + 2 * (to2 * f + to2 * 4))          # w2 + s2 blocks, 2x


def _kernel(li_ref, x_ref, w13_ref, s13_ref, w2_ref, s2_ref, o_ref,
            g13_ref, act_ref, *, n13, to13, n2, to2, f, dot_dtype):
    s = pl.program_id(0)

    @pl.when(s < n13)
    def _():
        y = jax.lax.dot_general(
            x_ref[:].astype(dot_dtype), w13_ref[0].astype(dot_dtype),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        y = y * s13_ref[0][:, 0][None, :]
        g13_ref[:, pl.ds(s * to13, to13)] = y

    @pl.when(s >= n13)
    def _():
        @pl.when(s == n13)
        def _():
            gate = g13_ref[:, :f]
            up = g13_ref[:, f:]
            act_ref[:] = (gate * jax.nn.sigmoid(gate) * up).astype(dot_dtype)

        y2 = jax.lax.dot_general(
            act_ref[:], w2_ref[0].astype(dot_dtype),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[:] = y2 * s2_ref[0][:, 0][None, :]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _ffn_fused_2d(w13_qs, w13_s, w2_qs, w2_s, x2, li, interpret=False):
    L, o13, d = w13_qs.shape
    _, d2, f = w2_qs.shape
    t = x2.shape[0]
    tp = -(-t // 8) * 8
    if tp != t:
        x2 = jnp.pad(x2, ((0, tp - t), (0, 0)))
    to13 = _pick_to(o13, d)
    to2 = _pick_to(d2, f)
    n13, n2 = o13 // to13, d2 // to2
    dot_dtype = jnp.float32 if x2.dtype == jnp.float32 else jnp.bfloat16
    li_arr = jnp.asarray(li, jnp.int32).reshape(1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n13 + n2,),
        in_specs=[
            pl.BlockSpec((tp, d), lambda s, li_: (0, 0)),
            pl.BlockSpec((1, to13, d),
                         lambda s, li_: (li_[0], jnp.minimum(s, n13 - 1), 0)),
            pl.BlockSpec((1, to13, 1),
                         lambda s, li_: (li_[0], jnp.minimum(s, n13 - 1), 0)),
            pl.BlockSpec((1, to2, f),
                         lambda s, li_: (li_[0], jnp.clip(s - n13, 0, n2 - 1), 0)),
            pl.BlockSpec((1, to2, 1),
                         lambda s, li_: (li_[0], jnp.clip(s - n13, 0, n2 - 1), 0)),
        ],
        out_specs=pl.BlockSpec((tp, to2),
                               lambda s, li_: (0, jnp.clip(s - n13, 0, n2 - 1))),
        scratch_shapes=[
            pltpu.VMEM((tp, o13), jnp.float32),
            pltpu.VMEM((tp, f), dot_dtype),
        ],
    )
    y = pl.pallas_call(
        functools.partial(_kernel, n13=n13, to13=to13, n2=n2, to2=to2,
                          f=f, dot_dtype=dot_dtype),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((tp, d2), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * tp * (o13 * d + d2 * f),
            bytes_accessed=o13 * d + d2 * f + tp * d * 2 + tp * d2 * 4,
            transcendentals=tp * f,
        ),
    )(li_arr, x2, w13_qs, w13_s, w2_qs, w2_s)
    return y[:t] if tp != t else y


def ffn_fused_rowq(w13: QTensor, w2: QTensor, x, li, interpret=None):
    """y[..., D] = FFN(x) with stacked q8_row w13 [L, 2F, D] / w2 [L, D, F].
    Returns None when the shape isn't eligible (caller falls back)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if not (isinstance(w13, QTensor) and isinstance(w2, QTensor)
            and w13.kind == "q8_row" and w2.kind == "q8_row"
            and w13.qs.ndim == 3 and w2.qs.ndim == 3
            and not w13.logical_out and not w2.logical_out):
        return None
    lead = x.shape[:-1]
    t = 1
    for dd in lead:
        t *= dd
    if t > _MAX_T:
        return None
    o13, d = w13.qs.shape[-2:]
    d2, f = w2.qs.shape[-2:]
    to13, to2 = _pick_to(o13, d), _pick_to(d2, f)
    if o13 != 2 * f or d2 != d or not to13 or not to2:
        return None
    tp = -(-t // 8) * 8
    xbytes = 4 if x.dtype == jnp.float32 else 2
    if _vmem_need(tp, d, f, o13, to13, to2, xbytes, xbytes) > _VMEM_BUDGET:
        return None  # e.g. tp=32 at 8B geometry: scratches + both phases'
                     # double-buffered blocks exceed VMEM (advisor r3); the
                     # two-call path handles it
    y = _ffn_fused_2d(w13.qs, w13.scales, w2.qs, w2.scales,
                      x.reshape(t, d), li, interpret=interpret)
    return y.reshape(*lead, d2).astype(x.dtype)
