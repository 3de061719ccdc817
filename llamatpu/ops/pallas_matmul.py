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
    """Choose (padded_T, T_tile, O_tile) under the VMEM budget.

    O_tile sizing is DMA-driven (decode is pure weight streaming): target
    ~1.5 MB weight blocks — measured on-chip, 0.5 MB blocks stream at
    ~300-500 GB/s while 1-2 MB blocks reach 600-750 GB/s — while keeping at
    least 2 grid steps so the pipeline overlaps DMA with the dequant+dot."""
    wI = I // 2 if packed else I  # weight bytes per row (packed4: 2 vals/byte)

    def fits(tt, to):
        need = 2 * (tt * I * xbytes + to * wI + to * (I // BLOCK) * 4) + tt * to * 4
        return need <= _VMEM_BUDGET

    tp = -(-T // 8) * 8
    target = 1.5 * 1024 * 1024
    # O tile must be lane-aligned (multiple of 128) unless it covers all of O
    best = None  # (score, to, tt)
    for to in (128, 256, 512, 1024, 2048):
        if O % to:
            continue
        tt = min(tp, 256)
        while tt > 8 and not fits(tt, to):
            tt //= 2
        if not fits(tt, to):
            continue
        blk = to * wI + to * (I // BLOCK) * 4
        size_score = min(blk, target) / target   # prefer blocks near the target
        pipe_score = 0.0 if O // to >= 2 else -0.25  # single-step: no overlap
        score = size_score + pipe_score - (blk / (64 * target))  # mild anti-huge
        if best is None or score > best[0]:
            best = (score, to, tt)
    if best is not None:
        _, to, tt = best
        return -(-tp // tt) * tt, tt, to
    tt = min(tp, 256)
    while tt > 8 and not fits(tt, O):
        tt //= 2
    return -(-tp // tt) * tt, tt, O  # tiny models: whole-O block


def _dequant_dot(x, w, s, o_ref, *, dot_dtype, interleaved):
    """o_ref[:] = x [TT, I] @ dequant(w [TO, I] int8, s [TO, I/32])^T."""
    s = s.astype(jnp.float32)
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
    o_ref[:] = jax.lax.dot_general(
        x.astype(dot_dtype), wd,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _kernel(x_ref, w_ref, s_ref, o_ref, *, dot_dtype, interleaved):
    _dequant_dot(x_ref[:], w_ref[:], s_ref[:], o_ref,
                 dot_dtype=dot_dtype, interleaved=interleaved)


def _kernel_li(li_ref, x_ref, w_ref, s_ref, o_ref, *, dot_dtype, interleaved):
    """Stacked-weights kernel: blocks arrive as [1, TO, ...] slices of the
    [L, O, I] stack (layer picked by the scalar-prefetched index map)."""
    _dequant_dot(x_ref[:], w_ref[0], s_ref[0], o_ref,
                 dot_dtype=dot_dtype, interleaved=interleaved)


def _kernel_rowq(x_ref, w_ref, o_ref, *, dot_dtype):
    """q8_row kernel: pure cast-and-dot — the per-row scale multiplies the
    [T, O] output OUTSIDE the kernel (XLA fuses it), so the weight stream is
    exactly 1.0 byte/weight and the VPU does no dequant multiply at all."""
    o_ref[:] = jax.lax.dot_general(
        x_ref[:].astype(dot_dtype), w_ref[:].astype(dot_dtype),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


def _kernel_rowq_li(li_ref, x_ref, w_ref, o_ref, *, dot_dtype):
    o_ref[:] = jax.lax.dot_general(
        x_ref[:].astype(dot_dtype), w_ref[0].astype(dot_dtype),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _rowq_matmul_2d(qs, scales, x2, interpret=False):
    """y[T, O] = (x2[T, I] @ qs[O, I]^T) * scales[O, 1]^T (q8_row, canonical)."""
    O, I = qs.shape
    T = x2.shape[0]
    xbytes = 4 if x2.dtype == jnp.float32 else 2
    tp, tt, to = _tiles(O, I, T, xbytes)
    dot_dtype = jnp.float32 if x2.dtype == jnp.float32 else jnp.bfloat16
    if tp != T:
        x2 = jnp.pad(x2, ((0, tp - T), (0, 0)))
    y = pl.pallas_call(
        functools.partial(_kernel_rowq, dot_dtype=dot_dtype),
        grid=(tp // tt, O // to),
        in_specs=[
            pl.BlockSpec((tt, I), lambda t, o: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((to, I), lambda t, o: (o, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tt, to), lambda t, o: (t, o), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((tp, O), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * tp * O * I,
            bytes_accessed=(tp // tt) * O * I + tp * I * xbytes + tp * O * 4,
            transcendentals=0),
    )(x2, qs)
    y = y * scales[:, 0][None, :]
    if tp != T:
        y = y[:T]
    return y


@functools.partial(jax.jit, static_argnames=("interpret",))
def _rowq_matmul_2d_li(qs3, scales3, x2, li, interpret=False):
    """Stacked q8_row: y[T, O] = (x2 @ qs3[li]^T) * scales3[li, :, 0]."""
    L, O, I = qs3.shape
    T = x2.shape[0]
    xbytes = 4 if x2.dtype == jnp.float32 else 2
    tp, tt, to = _tiles(O, I, T, xbytes)
    dot_dtype = jnp.float32 if x2.dtype == jnp.float32 else jnp.bfloat16
    if tp != T:
        x2 = jnp.pad(x2, ((0, tp - T), (0, 0)))
    li_arr = jnp.asarray(li, jnp.int32).reshape(1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(tp // tt, O // to),
        in_specs=[
            pl.BlockSpec((tt, I), lambda t, o, li_: (t, 0)),
            pl.BlockSpec((1, to, I), lambda t, o, li_: (li_[0], o, 0)),
        ],
        out_specs=pl.BlockSpec((tt, to), lambda t, o, li_: (t, o)),
    )
    y = pl.pallas_call(
        functools.partial(_kernel_rowq_li, dot_dtype=dot_dtype),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((tp, O), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * tp * O * I,
            bytes_accessed=(tp // tt) * O * I + tp * I * xbytes + tp * O * 4,
            transcendentals=0),
    )(li_arr, x2, qs3)
    y = y * scales3[li][:, 0][None, :]
    if tp != T:
        y = y[:T]
    return y


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


def _kernel_packed4_li(li_ref, xl_ref, xh_ref, w_ref, s_ref, o_ref, *, dot_dtype):
    wl, wh = unpack4_halves(w_ref[0], s_ref[0], dot_dtype)
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


@functools.partial(jax.jit, static_argnames=("interpret", "layout"))
def _quant_matmul_2d_li(qs3, scales3, x2, li, interpret=False, layout="canonical"):
    """y[T, O] = x2[T, I] @ dequant(qs3[li], scales3[li])[O, I]^T.

    The layer's weight blocks are DMA'd straight out of the STACKED [L, O, I]
    array via a scalar-prefetched layer index in the block index maps. This is
    the decode-critical path: feeding pallas a lax.scan xs slice instead makes
    XLA materialize a full per-layer weight copy before every custom call
    (profiled at ~50% of the decode step for Llama-1B: weights were read,
    copied, and re-read — 3x HBM traffic)."""
    from llamatpu.models.weights import interleave_activation

    packed = layout == "packed4"
    L, O, wI = qs3.shape
    I = wI * 2 if packed else wI
    T = x2.shape[0]
    xbytes = 4 if x2.dtype == jnp.float32 else 2
    tp, tt, to = _tiles(O, I, T, xbytes, packed)
    dot_dtype = jnp.float32 if x2.dtype == jnp.float32 else jnp.bfloat16
    if layout != "canonical":
        x2 = interleave_activation(x2)
    if tp != T:
        x2 = jnp.pad(x2, ((0, tp - T), (0, 0)))
    grid = (tp // tt, O // to)
    w_spec = pl.BlockSpec((1, to, wI), lambda t, o, li_: (li_[0], o, 0))
    s_spec = pl.BlockSpec((1, to, I // BLOCK), lambda t, o, li_: (li_[0], o, 0))
    out_spec = pl.BlockSpec((tt, to), lambda t, o, li_: (t, o))
    cost = pl.CostEstimate(
        flops=2 * tp * O * I,
        bytes_accessed=(tp // tt) * (O * wI + O * (I // BLOCK) * 4) + tp * I * xbytes + tp * O * 4,
        transcendentals=0,
    )
    li_arr = jnp.asarray(li, jnp.int32).reshape(1)
    if packed:
        xl, xh = x2[:, : I // 2], x2[:, I // 2:]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=grid,
            in_specs=[
                pl.BlockSpec((tt, I // 2), lambda t, o, li_: (t, 0)),
                pl.BlockSpec((tt, I // 2), lambda t, o, li_: (t, 0)),
                w_spec, s_spec,
            ],
            out_specs=out_spec,
        )
        y = pl.pallas_call(
            functools.partial(_kernel_packed4_li, dot_dtype=dot_dtype),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((tp, O), jnp.float32),
            interpret=interpret,
            cost_estimate=cost,
        )(li_arr, xl, xh, qs3, scales3)
    else:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=grid,
            in_specs=[
                pl.BlockSpec((tt, I), lambda t, o, li_: (t, 0)),
                w_spec, s_spec,
            ],
            out_specs=out_spec,
        )
        y = pl.pallas_call(
            functools.partial(_kernel_li, dot_dtype=dot_dtype,
                              interleaved=(layout == "interleaved")),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((tp, O), jnp.float32),
            interpret=interpret,
            cost_estimate=cost,
        )(li_arr, x2, qs3, scales3)
    if tp != T:
        y = y[:T]
    return y


def quant_matmul_pallas(w: QTensor, x: jnp.ndarray, interpret: bool | None = None,
                        li=None) -> jnp.ndarray:
    """y[..., O] = x[..., I] @ W^T with fused in-kernel dequantization.

    With `li` (a traced layer index), `w` holds the full [L, O, I] layer stack
    and the kernel DMAs layer li's blocks directly (no per-layer slice copy —
    see _quant_matmul_2d_li). Without it, `w` is a single [O, I] matrix.

    Matrices whose out-dim can't tile lane-aligned within the VMEM budget
    (e.g. Phi-3's 32064-row / Granite's 49155-row vocab heads — not multiples
    of 128) fall back to the XLA dequant path rather than a whole-O block."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    qs, scales = w.qs, w.scales
    stacked = li is not None
    assert qs.ndim == (3 if stacked else 2), \
        "pass li= for stacked [L, O, I] weights; slice expert stacks first"
    lead = x.shape[:-1]
    T = 1
    for d in lead:
        T *= d
    packed = w.layout == "packed4"
    O, wI = qs.shape[-2:]
    I = wI * 2 if packed else wI
    if w.kind == "q8_row":
        from llamatpu.ops.int8_prefill import INT8_MXU_MIN_T, rowq_matmul

        x2 = x.reshape(T, x.shape[-1])
        if T >= INT8_MXU_MIN_T:
            # compute-bound regime: native int8 MXU dot, XLA-tiled
            y = rowq_matmul(w, x2, li=li)
        else:
            xbytes = 4 if x.dtype == jnp.float32 else 2
            tp, tt, to = _tiles(O, I, T, xbytes)
            if not interpret and to == O and to * wI > _VMEM_BUDGET:
                from llamatpu.ops.matmul import matmul

                if stacked:
                    from llamatpu.models.transformer import _index_qtensor

                    w = _index_qtensor(w, li)
                return matmul(w, x, impl="xla")
            if stacked:
                y = _rowq_matmul_2d_li(qs, scales, x2, li, interpret=interpret)
            else:
                y = _rowq_matmul_2d(qs, scales, x2, interpret=interpret)
        return y.reshape(*lead, O).astype(x.dtype)
    xbytes = 4 if x.dtype == jnp.float32 else 2
    tp, tt, to = _tiles(O, I, T, xbytes, packed)
    if not interpret and to == O and (to * wI + to * (I // BLOCK) * 4) > _VMEM_BUDGET:
        from llamatpu.ops.matmul import matmul

        if stacked:
            from llamatpu.models.transformer import _index_qtensor

            w = _index_qtensor(w, li)
        return matmul(w, x, impl="xla")
    x2 = x.reshape(T, x.shape[-1])
    if stacked:
        y = _quant_matmul_2d_li(qs, scales, x2, li, interpret=interpret,
                                layout=w.layout)
    else:
        y = _quant_matmul_2d(qs, scales, x2, interpret=interpret, layout=w.layout)
    if w.offs is not None:
        # q4_k additive offsets: sum_b xbsum[t, b] * off[o, b] added as an XLA
        # epilogue dot (offs never enter the kernel; a stacked [L, O, NB]
        # slice fuses into the dot operand — no pallas copy trap). xbsum uses
        # CANONICAL 32-blocks of the activation (offs are block-ordered).
        nb = I // BLOCK
        xbsum = x2.astype(jnp.float32).reshape(T, nb, BLOCK).sum(axis=-1)
        offs = jnp.asarray(w.offs)
        if li is not None:
            offs = offs[li]
        y = y + jax.lax.dot_general(
            xbsum, offs.astype(jnp.float32),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
    return y.reshape(*lead, O).astype(x.dtype)
