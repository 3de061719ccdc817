"""Blocked w8a8 GEMM on the int8 MXU for q8_row prefill/batch matmuls.

Why: the XLA int8 dot the prefill path uses (ops/int8_prefill.rowq_matmul_mxu)
measured 24-35 TFLOP/s at pp512 llama-1b shapes — 6-9% of the chip's 394T
int8 peak, and neither MXU- nor HBM-limited (PERF.md prefill roofline), i.e.
pure lowering inefficiency. This kernel owns the tiling instead: the [T, I]
int8 activation block stays resident in VMEM, [to, I] weight blocks stream
through a (T/tm, O/to) grid, each step issues one [tm, I] x [I, to]
int8xint8->int32 MXU contraction, and the per-token activation scale and
per-row weight scale apply in the epilogue on the int32 accumulator —
integer all the way to the accumulator, exactly like the XLA formulation
(bit-identical: same products, same f32 rescale).

Stacked mode (`li`): weights are the [L, O, I] layer stack; the scalar-
prefetched layer index routes the weight-block DMA, so no per-layer copy is
ever materialized (the same zero-copy pattern as ops/pallas_matmul.py).

Reference tier being replaced: gemmMMAQ8
(TransformerBatchPrefillKernels.java:971-1132) — which dequantizes Q8_0 to
f16 fragments for the tensor cores; here the MXU multiplies int8 directly.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 12 * 1024 * 1024


def _pick_tiles(t: int, o: int, i: int):
    """(tm, to) — x block [tm, i] resident, double-buffered w blocks [to, i],
    double-buffered out blocks [tm, to] f32, inside the VMEM budget."""
    for tm in (512, 256, 128, 64, 32, 16, 8):
        if t % tm:
            continue
        for to in (1024, 512, 256, 128):
            if o % to:
                continue
            need = (tm * i                      # x block (int8)
                    + 2 * (to * i + to * 4)     # w + scale blocks
                    + 2 * tm * to * 4           # out blocks
                    + tm * 4 + 128              # ax block
                    # bf16-cast diagnostic variant materializes bf16 copies
                    # of both operands on the kernel stack (w2 shape OOMed
                    # 17.37M on chip without this term)
                    + 2 * (tm * i + to * i))
            if need <= _VMEM_BUDGET:
                return tm, to
    return None


def _gemm_kernel(x_ref, ax_ref, w_ref, s_ref, o_ref):
    acc = jax.lax.dot_general(
        x_ref[:], w_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)
    o_ref[:] = (acc.astype(jnp.float32)
                * ax_ref[:, 0][:, None] * s_ref[:, 0][None, :])


def _gemm_kernel_bf16(x_ref, ax_ref, w_ref, s_ref, o_ref):
    # diagnostic variant: cast the int8 operands to bf16 and use the bf16
    # MXU path (half the int8 peak on paper — if this WINS, the int8 dot
    # is not reaching the int8 MXU path in Mosaic). int8 values in
    # [-127, 127] are exact in bf16? NO — bf16 has 8 significand bits, so
    # |v| > 256 rounds; int8 fits exactly (|v| <= 127 < 256). Products
    # accumulate in f32, so the result differs from the int32 path only in
    # summation rounding.
    acc = jax.lax.dot_general(
        x_ref[:].astype(jnp.bfloat16), w_ref[:].astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[:] = acc * ax_ref[:, 0][:, None] * s_ref[:, 0][None, :]


def _gemm_kernel_li(li_ref, x_ref, ax_ref, w_ref, s_ref, o_ref):
    del li_ref  # feeds the index maps only
    acc = jax.lax.dot_general(
        x_ref[:], w_ref[0],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)
    o_ref[:] = (acc.astype(jnp.float32)
                * ax_ref[:, 0][:, None] * s_ref[0][:, 0][None, :])


@functools.partial(jax.jit, static_argnames=("tm", "to", "interpret",
                                             "variant"))
def _gemm_call(qs, scales, xi8, ax, li, tm, to, interpret=False,
               variant="int8"):
    t, i = xi8.shape
    stacked = li is not None
    o = qs.shape[-2]
    nm, no = t // tm, o // to
    if stacked:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nm, no),
            in_specs=[
                pl.BlockSpec((tm, i), lambda m, n, li_: (m, 0)),
                pl.BlockSpec((tm, 1), lambda m, n, li_: (m, 0)),
                pl.BlockSpec((1, to, i), lambda m, n, li_: (li_[0], n, 0)),
                pl.BlockSpec((1, to, 1), lambda m, n, li_: (li_[0], n, 0)),
            ],
            out_specs=pl.BlockSpec((tm, to), lambda m, n, li_: (m, n)),
        )
        return pl.pallas_call(
            _gemm_kernel_li,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((t, o), jnp.float32),
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=2 * t * o * i,
                bytes_accessed=o * i + t * i + t * o * 4,
                transcendentals=0),
        )(jnp.asarray(li, jnp.int32).reshape(1), xi8, ax, qs, scales)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nm, no),
        in_specs=[
            pl.BlockSpec((tm, i), lambda m, n: (m, 0)),
            pl.BlockSpec((tm, 1), lambda m, n: (m, 0)),
            pl.BlockSpec((to, i), lambda m, n: (n, 0)),
            pl.BlockSpec((to, 1), lambda m, n: (n, 0)),
        ],
        out_specs=pl.BlockSpec((tm, to), lambda m, n: (m, n)),
    )
    return pl.pallas_call(
        _gemm_kernel_bf16 if variant == "bf16" else _gemm_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((t, o), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * t * o * i,
            bytes_accessed=o * i + t * i + t * o * 4,
            transcendentals=0),
    )(xi8, ax, qs, scales)


def rowq_gemm_pallas(qs, scales, xi8, ax, li=None, interpret=None,
                     variant="int8"):
    """y[T, O] f32 = (xi8 [T, I] . qs[(li,) O, I]^T)_int32 * ax[T, 1] *
    scales[(li,) O, 1] — or None when no tiling fits (caller falls back to
    the XLA dot). Bit-identical to int8_prefill.rowq_matmul_mxu's formulation
    (same integer products, same f32 epilogue)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    t, i = xi8.shape
    o = qs.shape[-2]
    # pad T to a sublane multiple so tiny final chunks still tile
    tiles = _pick_tiles(t, o, i)
    if tiles is None:
        return None
    tm, to = tiles
    return _gemm_call(qs, scales, xi8, ax, li, tm, to, interpret=interpret,
                      variant=variant)
