"""Pallas fused dequant+matmul for block-quantized weights.

The TPU-native equivalent of the reference's quantized GEMV/GEMM kernel tier
(matrixVectorGenericQ8Byte / fusedQKVMatmulQ8 / gemmMMAQ8,
TransformerComputeKernelsLayered.java:2773-2945, TransformerBatchPrefillKernels
.java:1580-1857): weights stream from HBM as int8 (+ f32 block scales) and are
dequantized in VMEM inside the matmul tile, so HBM traffic per token is
~1.1 bytes/weight instead of the 3-5 bytes a materialized dequant costs on the
XLA fallback path (ops/matmul.py) — measured 857MB of temp allocations per
decode step for Llama-1B on the XLA path.

One kernel serves decode (T=1 GEMV: memory-bound) and prefill/batch (T up to
512: compute-bound MXU GEMM), mirroring SURVEY.md §7.1 "prefill naturally
batched". Grid: (T tiles, O tiles) — for each activation tile the full weight
matrix streams through VMEM; Pallas double-buffers the HBM->VMEM copies.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from llamatpu.models.weights import QTensor

BLOCK = 32
_VMEM_BUDGET = 10 * 1024 * 1024


def _tiles(O: int, I: int, T: int, xbytes: int, packed: bool = False) -> tuple[int, int, int]:
    """Choose (padded_T, T_tile, O_tile) under the VMEM budget."""
    wI = I // 2 if packed else I  # weight bytes per row (packed4: 2 vals/byte)

    def fits(tt, to):
        need = 2 * (tt * I * xbytes + to * wI + to * (I // BLOCK) * 4) + tt * to * 4
        return need <= _VMEM_BUDGET

    tp = -(-T // 8) * 8
    # O tile must be lane-aligned (multiple of 128) unless it covers all of O
    for to in (256, 512, 128):
        if O % to:
            continue
        tt = min(tp, 256)
        while tt > 8 and not fits(tt, to):
            tt //= 2
        if fits(tt, to):
            return -(-tp // tt) * tt, tt, to
    tt = min(tp, 256)
    while tt > 8 and not fits(tt, O):
        tt //= 2
    return -(-tp // tt) * tt, tt, O  # tiny models: whole-O block


def _kernel(x_ref, w_ref, s_ref, o_ref, *, dot_dtype, interleaved):
    w = w_ref[:]                      # [TO, I] int8
    s = s_ref[:].astype(jnp.float32)  # [TO, I/32]
    to, i = w.shape
    nb = i // BLOCK
    if interleaved:
        # interleaved column layout (QTensor.layout): the scale of column j is
        # scales[j % NB], so expansion is a lane-tiled repeat — ~30% faster
        # decode than the expander matmul below (no MXU work for dequant)
        s_exp = pltpu.repeat(s, BLOCK, axis=1)
    else:
        # canonical layout. Mosaic can't reshape (TO, NB, 32) -> (TO, I), so
        # the per-32-block scale expansion rides the MXU: s_exp = s @ E with
        # E[b, k] = (k >> 5 == b) built from iota (shift, NOT //: the VPU has
        # no integer divide — `// 32` lowers to a ~20x-slower software loop).
        b_ids = jax.lax.broadcasted_iota(jnp.int32, (nb, i), 0)
        k_ids = jax.lax.broadcasted_iota(jnp.int32, (nb, i), 1)
        expander = (jax.lax.shift_right_logical(k_ids, 5) == b_ids).astype(jnp.float32)
        s_exp = jax.lax.dot_general(
            s, expander, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    wd = (w.astype(jnp.float32) * s_exp).astype(dot_dtype)
    x = x_ref[:].astype(dot_dtype)    # [TT, I]
    o_ref[:] = jax.lax.dot_general(
        x, wd,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def unpack4_halves(wp, s, dot_dtype):
    """In-kernel packed4 dequant: wp int8 [TO, I/2] (two nibbles per byte,
    interleaved column order split across halves), s f32 [TO, I/32]. Returns
    the two dequantized half-matrices [TO, I/2] — the caller contracts each
    against the matching activation half and sums, which avoids any in-kernel
    lane concat/slice (works for non-128-multiple halves, e.g. MoE I=1408).
    Both halves share one scale expansion: half = 16*NB always, and
    interleaved column j of either half has scale s[j % NB]."""
    p = wp.astype(jnp.int32)          # Mosaic has no i8 shifts
    lo = jnp.right_shift(jnp.left_shift(p, 28), 28)   # sign-extend low nibble
    hi = jnp.right_shift(p, 4)                        # arithmetic: high nibble
    s_half = pltpu.repeat(s.astype(jnp.float32), BLOCK // 2, axis=-1)
    return ((lo.astype(jnp.float32) * s_half).astype(dot_dtype),
            (hi.astype(jnp.float32) * s_half).astype(dot_dtype))


def _kernel_packed4(xl_ref, xh_ref, w_ref, s_ref, o_ref, *, dot_dtype):
    wl, wh = unpack4_halves(w_ref[:], s_ref[:], dot_dtype)
    dn = (((1,), (1,)), ((), ()))
    o_ref[:] = (
        jax.lax.dot_general(xl_ref[:].astype(dot_dtype), wl, dn,
                            preferred_element_type=jnp.float32)
        + jax.lax.dot_general(xh_ref[:].astype(dot_dtype), wh, dn,
                              preferred_element_type=jnp.float32))


@functools.partial(jax.jit, static_argnames=("interpret", "layout"))
def _quant_matmul_2d(qs, scales, x2, interpret=False, layout="canonical"):
    """y[T, O] = x2[T, I] @ dequant(qs, scales)[O, I]^T"""
    from llamatpu.models.weights import interleave_activation

    packed = layout == "packed4"
    O, wI = qs.shape
    I = wI * 2 if packed else wI
    T = x2.shape[0]
    xbytes = 4 if x2.dtype == jnp.float32 else 2
    tp, tt, to = _tiles(O, I, T, xbytes, packed)
    dot_dtype = jnp.float32 if x2.dtype == jnp.float32 else jnp.bfloat16
    if layout != "canonical":
        x2 = interleave_activation(x2)  # match the weight column permutation
    if tp != T:
        x2 = jnp.pad(x2, ((0, tp - T), (0, 0)))
    grid = (tp // tt, O // to)
    w_spec = pl.BlockSpec((to, wI), lambda t, o: (o, 0), memory_space=pltpu.VMEM)
    s_spec = pl.BlockSpec((to, I // BLOCK), lambda t, o: (o, 0), memory_space=pltpu.VMEM)
    cost = pl.CostEstimate(
        flops=2 * tp * O * I,
        bytes_accessed=(tp // tt) * (O * wI + O * (I // BLOCK) * 4) + tp * I * xbytes + tp * O * 4,
        transcendentals=0,
    )
    if packed:
        # activation halves are split OUTSIDE the kernel so Mosaic never
        # slices/concats lanes at a potentially unaligned I/2 boundary
        xl, xh = x2[:, : I // 2], x2[:, I // 2:]
        y = pl.pallas_call(
            functools.partial(_kernel_packed4, dot_dtype=dot_dtype),
            grid=grid,
            in_specs=[
                pl.BlockSpec((tt, I // 2), lambda t, o: (t, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tt, I // 2), lambda t, o: (t, 0), memory_space=pltpu.VMEM),
                w_spec, s_spec,
            ],
            out_specs=pl.BlockSpec((tt, to), lambda t, o: (t, o), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((tp, O), jnp.float32),
            interpret=interpret,
            cost_estimate=cost,
        )(xl, xh, qs, scales)
    else:
        y = pl.pallas_call(
            functools.partial(_kernel, dot_dtype=dot_dtype,
                              interleaved=(layout == "interleaved")),
            grid=grid,
            in_specs=[
                pl.BlockSpec((tt, I), lambda t, o: (t, 0), memory_space=pltpu.VMEM),
                w_spec, s_spec,
            ],
            out_specs=pl.BlockSpec((tt, to), lambda t, o: (t, o), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((tp, O), jnp.float32),
            interpret=interpret,
            cost_estimate=cost,
        )(x2, qs, scales)
    if tp != T:
        y = y[:T]
    return y


def quant_matmul_pallas(w: QTensor, x: jnp.ndarray, interpret: bool | None = None) -> jnp.ndarray:
    """y[..., O] = x[..., I] @ W^T with fused in-kernel dequantization.

    Matrices whose out-dim can't tile lane-aligned within the VMEM budget
    (e.g. Phi-3's 32064-row / Granite's 49155-row vocab heads — not multiples
    of 128) fall back to the XLA dequant path rather than a whole-O block."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    qs, scales = w.qs, w.scales
    assert qs.ndim == 2, "layer/expert stacking must be sliced before the kernel"
    lead = x.shape[:-1]
    T = 1
    for d in lead:
        T *= d
    packed = w.layout == "packed4"
    O, wI = qs.shape
    I = wI * 2 if packed else wI
    xbytes = 4 if x.dtype == jnp.float32 else 2
    tp, tt, to = _tiles(O, I, T, xbytes, packed)
    if not interpret and to == O and (to * wI + to * (I // BLOCK) * 4) > _VMEM_BUDGET:
        from llamatpu.ops.matmul import matmul

        return matmul(w, x, impl="xla")
    x2 = x.reshape(T, x.shape[-1])
    y = _quant_matmul_2d(qs, scales, x2, interpret=interpret, layout=w.layout)
    return y.reshape(*lead, O).astype(x.dtype)
