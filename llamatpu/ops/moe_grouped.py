"""Grouped (ragged) expert matmul for MoE prefill.

The decode path routes each token through its top-k experts with a gathered
per-token scan (transformer._moe_ffn) — right for B=1 where only k expert
row-sets are touched. For PREFILL that shape is catastrophic: T sequential
scan steps of tiny GEMVs. The reference has no MoE GPU kernels at all (MoE
runs on its CPU path, InferenceCore.java:366-415); this is the TPU-native
design for the SURVEY §2.5 "MoE kernels" row:

1. flatten the [N, k] routing to N*k (token, expert) assignments
2. stable-sort by expert; pad each expert's segment to the m-tile size so
   every m-tile belongs to EXACTLY ONE expert
3. a Pallas matmul over grid (m_tiles, o_tiles) whose weight block index map
   reads the tile->expert table from scalar prefetch: each m-tile streams only
   its expert's (still-quantized) weight block from HBM — total weight traffic
   = sum over USED experts of their matrix bytes + one block per partial tile,
   vs. N x E for a dense-all-experts matmul
4. scatter-add the down-projected rows back per token, scaled by the routing
   weights (padding rows carry weight 0)

Dense (bf16/f32) experts use the same kernel without the dequant step.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from llamatpu.models.weights import QTensor

BLOCK = 32  # ggml quant block (scale group) size


# ----------------------------------------------------------------- routing
def sort_by_expert(top_i, n_experts: int, tm: int):
    """Flatten + sort the [N, k] routing into expert-contiguous, tile-aligned
    rows. Returns (row_token [Mp], row_src [Mp], tile_expert [Mp//tm]) where
    Mp = roundup(N*k + min(N*k, E)*(tm-1), tm) — the tight static bound: at
    most min(N*k, E) experts are used and each wastes <= tm-1 pad rows.
    (The earlier N*k + E*tm bound made DECODE catastrophic: top-4 over 60
    experts padded 4 real rows to 488, and the ~57 all-padding tail tiles
    each re-streamed weight blocks.) row_src maps each padded row back to its
    ORIGINAL assignment index in [0, N*k) (N*k = padding); row_token to its
    token (N = the zero pad row). Tiles past the last group carry
    tile_expert = -1 (inactive: kernels skip the dot and zero the rows).

    Deliberately SCATTER-FREE: every array is built with sort, searchsorted,
    cumsum and gathers — XLA's TPU scatter lowers to a sequential per-update
    loop (measured ~600us for 8 rows on the paged-KV path) and was the
    dominant cost of MoE decode in the earlier formulation."""
    n, k = top_i.shape
    nk = n * k
    if n == 1:
        # DECODE fast path: with one token, "expert-contiguous tile-aligned
        # rows" is just one tm-row tile per assignment (top_k indices are
        # distinct) — no argsort/searchsorted/cumsum chain. That chain is
        # pure launch overhead at N=1 and runs once per LAYER per token
        # (measured: the routed FFN phase at 168 GB/s while its weight
        # streams alone run 400-650 — the glue was the gap).
        r = jnp.arange(k * tm, dtype=jnp.int32)
        first = (r % tm) == 0
        row_token = jnp.where(first, 0, n).astype(jnp.int32)
        row_src = jnp.where(first, r // tm, nk).astype(jnp.int32)
        tile_expert = top_i[0].astype(jnp.int32)
        return row_token, row_src, tile_expert
    mp = -(-(nk + min(nk, n_experts) * (tm - 1)) // tm) * tm
    eid = top_i.reshape(nk).astype(jnp.int32)

    sort_idx = jnp.argsort(eid, stable=True).astype(jnp.int32)
    eid_s = eid[sort_idx]

    # per-expert group starts/counts from the sorted ids (no bincount scatter)
    starts = jnp.searchsorted(eid_s, jnp.arange(n_experts, dtype=jnp.int32),
                              side="left").astype(jnp.int32)          # [E]
    counts = jnp.concatenate([starts[1:], jnp.array([nk], jnp.int32)]) - starts
    padded = -(-counts // tm) * tm                             # tile-aligned
    grp_start = jnp.cumsum(padded) - padded                    # group starts, padded rows
    j = jnp.arange(nk, dtype=jnp.int32)
    # strictly increasing: groups in expert order, offsets within each group
    dest_sorted = grp_start[eid_s] + (j - starts[eid_s])

    # invert dest_sorted by binary search instead of scattering into rows
    r = jnp.arange(mp, dtype=jnp.int32)
    jj = jnp.minimum(jnp.searchsorted(dest_sorted, r).astype(jnp.int32), nk - 1)
    hit = dest_sorted[jj] == r
    src = sort_idx[jj]
    row_src = jnp.where(hit, src, nk).astype(jnp.int32)
    row_token = jnp.where(hit, src // k, n).astype(jnp.int32)

    ends = jnp.cumsum(padded)                                  # padded group ends
    tile_start = jnp.arange(mp // tm) * tm
    tile_expert = jnp.searchsorted(ends, tile_start,
                                   side="right").astype(jnp.int32)
    tile_expert = jnp.minimum(tile_expert, n_experts - 1)
    tile_expert = jnp.where(tile_start < ends[-1], tile_expert, -1)  # tail = inactive
    return row_token, row_src, tile_expert


# ----------------------------------------------------------------- kernel
# `stacked` variants take the full [L, E, O, I] expert stack plus a scalar-
# prefetched layer index (blocks [1, 1, TO, ...]): the forward scans layers
# with the stacks closed over, so XLA never materializes a per-layer expert
# slice — for Qwen1.5-MoE that slice copy is the WHOLE layer's 60-expert
# weight set (~250 MB/layer) while the kernel only reads the top-4 experts.


def _gkernel(te_ref, *rest, dot_dtype, interleaved, mdim=0, stacked=False):
    # tile_expert < 0 marks an INACTIVE tile (expert-parallel: assignments
    # belonging to other devices): skip the dot entirely — the index maps
    # clamp to block 0 so no new weight DMA is issued either, and the output
    # rows are zeroed (their routing weights are 0 anyway).
    if stacked:
        li_ref, x_ref, w_ref, s_ref, o_ref = rest
    else:
        x_ref, w_ref, s_ref, o_ref = rest
    mi = pl.program_id(mdim)
    active = te_ref[mi] >= 0

    @pl.when(active)
    def _():
        w = w_ref[0, 0] if stacked else w_ref[0]      # [TO, I] int8
        s = (s_ref[0, 0] if stacked else s_ref[0]).astype(jnp.float32)  # [TO, I/32]
        to, i = w.shape
        nb = i // BLOCK
        if interleaved:
            s_exp = pltpu.repeat(s, BLOCK, axis=1)
        else:
            b_ids = jax.lax.broadcasted_iota(jnp.int32, (nb, i), 0)
            k_ids = jax.lax.broadcasted_iota(jnp.int32, (nb, i), 1)
            expander = (jax.lax.shift_right_logical(k_ids, 5) == b_ids).astype(jnp.float32)
            s_exp = jax.lax.dot_general(
                s, expander, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        wd = (w.astype(jnp.float32) * s_exp).astype(dot_dtype)
        x = x_ref[:].astype(dot_dtype)
        o_ref[:] = jax.lax.dot_general(
            x, wd, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(jnp.logical_not(active))
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)


def _gkernel_packed4(te_ref, *rest, dot_dtype, mdim=0, stacked=False):
    from llamatpu.ops.pallas_matmul import unpack4_halves

    if stacked:
        li_ref, xl_ref, xh_ref, w_ref, s_ref, o_ref = rest
    else:
        xl_ref, xh_ref, w_ref, s_ref, o_ref = rest
    mi = pl.program_id(mdim)
    active = te_ref[mi] >= 0

    @pl.when(active)
    def _():
        if stacked:
            wl, wh = unpack4_halves(w_ref[0, 0], s_ref[0, 0], dot_dtype)
        else:
            wl, wh = unpack4_halves(w_ref[0], s_ref[0], dot_dtype)
        dn = (((1,), (1,)), ((), ()))
        o_ref[:] = (
            jax.lax.dot_general(xl_ref[:].astype(dot_dtype), wl, dn,
                                preferred_element_type=jnp.float32)
            + jax.lax.dot_general(xh_ref[:].astype(dot_dtype), wh, dn,
                                  preferred_element_type=jnp.float32))

    @pl.when(jnp.logical_not(active))
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)


def _gkernel_rowq(te_ref, *rest, dot_dtype, mdim=0, stacked=False):
    """q8_row expert blocks: cast-and-dot, per-row scale folded into the
    output tile in-kernel (scales are [E, O, 1] — one lane per row, a
    negligible stream next to the scale-free int8 weight blocks)."""
    if stacked:
        li_ref, x_ref, w_ref, s_ref, o_ref = rest
    else:
        x_ref, w_ref, s_ref, o_ref = rest
    mi = pl.program_id(mdim)
    active = te_ref[mi] >= 0

    @pl.when(active)
    def _():
        w = w_ref[0, 0] if stacked else w_ref[0]      # [TO, I] int8
        s = (s_ref[0, 0] if stacked else s_ref[0]).astype(jnp.float32)  # [TO, 1]
        y = jax.lax.dot_general(
            x_ref[:].astype(dot_dtype), w.astype(dot_dtype),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[:] = y * s[:, 0][None, :]

    @pl.when(jnp.logical_not(active))
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)


def _gkernel_dense(te_ref, *rest, dot_dtype, mdim=0, stacked=False):
    if stacked:
        li_ref, x_ref, w_ref, o_ref = rest
    else:
        x_ref, w_ref, o_ref = rest
    mi = pl.program_id(mdim)
    active = te_ref[mi] >= 0

    @pl.when(active)
    def _():
        wd = (w_ref[0, 0] if stacked else w_ref[0]).astype(dot_dtype)
        x = x_ref[:].astype(dot_dtype)
        o_ref[:] = jax.lax.dot_general(
            x, wd, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(jnp.logical_not(active))
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)


def _pick_to(o: int, i: int, wbytes: float, tm: int = 8,
             xbytes: int = 2, n_x: int = 1) -> int:
    """Largest dividing out-tile whose TOTAL per-call VMEM (double-buffered
    weight+scale blocks, out blocks at this tm, x blocks) fits the budget.

    Bigger blocks win for DECODE (tm=8: out blocks are tiny, so whole-O
    1.4-2.9 MB expert streams survive the check — 0.13 MB blocks ran at
    ~168 GB/s on chip vs 600-750 for 1.5-2 MB, PERF.md). PREFILL (tm=128)
    naturally shrinks: a 2816-row folded-gu whole-O block plus its
    [128, 2816] f32 out blocks blew Mosaic's 16 M scoped-vmem limit
    (found on chip 2026-08-21)."""
    budget = 13 * 1024 * 1024  # Mosaic scoped-vmem limit 16M minus slack
    xblk = 2 * n_x * tm * i * xbytes
    # packed4's in-kernel unpack materializes int32 intermediates (p, lo, hi)
    # plus the bf16 half-matrices: ~12.5 bytes of VMEM per PACKED byte
    # (measured: a [2048, 704] packed block hit 17.82M scoped — 12.3 B/byte);
    # plain int8 dequant peaks at ~6 B/byte (w + f32 dequant + bf16 cast)
    # packed4: 12.3 B of scoped VMEM per packed byte MEASURED on chip (int32
    # unpack intermediates); plain int8: <=4 (r2/r3 ran whole-O 1408x2048
    # int8 expert blocks, so Mosaic keeps the f32 dequant fused in chunks)
    # the multiplier scales with the DOT dtype: f32 activations (ppl /
    # parity runs) dequantize weights to f32 instead of bf16, roughly
    # doubling the fused intermediates (found via the chunk-8 MoE parity
    # compile: est 12.4M vs actual 32.4M scoped with f32 x — the r4
    # "compile service crash" was this OOM)
    if wbytes == 0.5:
        per_wbyte = 12.5 if xbytes == 2 else 20.0
    else:
        per_wbyte = 4.0 if xbytes == 2 else 10.0
    # `to` is ALSO the out block's LANE dim: it must be a multiple of 128 or
    # equal to the full O (Mosaic last-dim rule — to=704 of O=2816 rejected
    # on chip)
    cands = sorted({c for c in range(128, o + 1, 128) if o % c == 0}
                   | ({o} if o % 8 == 0 else set()), reverse=True)
    for to in cands:
        if (per_wbyte * to * int(i * wbytes) + 2 * to * 4 * (i // BLOCK)
                + 2 * tm * to * 4 + xblk) <= budget:
            return to
    return 128 if o % 128 == 0 else o


def _specs(tm, to, m_fastest, stacked=False):
    """Grid + index maps for both iteration orders.

    Default (oi fastest): the x block is constant over each m-tile's oi-run —
    right for prefill where x tiles are large. m_fastest (decode/tiny Mp):
    consecutive programs share oi, so runs of INACTIVE tiles (clamped to
    weight block 0) keep an identical weight index and issue no DMA at all,
    and x tiles are tiny so re-fetching them per program is cheap.

    stacked: weights are the [L, E, O, I] stack; maps take a second scalar-
    prefetch ref (the layer index) and pick (li, expert, oi)."""
    if stacked:
        if m_fastest:
            xmap = lambda oi, mi, te, li: (mi, 0)
            wmap = lambda oi, mi, te, li: (li[0], jnp.maximum(te[mi], 0), oi, 0)
            omap = lambda oi, mi, te, li: (mi, oi)
            return (lambda mp_t, o_t: (o_t, mp_t)), xmap, wmap, omap, 1
        xmap = lambda mi, oi, te, li: (mi, 0)
        wmap = lambda mi, oi, te, li: (li[0], jnp.maximum(te[mi], 0), oi, 0)
        omap = lambda mi, oi, te, li: (mi, oi)
        return (lambda mp_t, o_t: (mp_t, o_t)), xmap, wmap, omap, 0
    if m_fastest:
        xmap = lambda oi, mi, te: (mi, 0)
        wmap = lambda oi, mi, te: (jnp.maximum(te[mi], 0), oi, 0)
        omap = lambda oi, mi, te: (mi, oi)
        return (lambda mp_t, o_t: (o_t, mp_t)), xmap, wmap, omap, 1
    xmap = lambda mi, oi, te: (mi, 0)
    wmap = lambda mi, oi, te: (jnp.maximum(te[mi], 0), oi, 0)
    omap = lambda mi, oi, te: (mi, oi)
    return (lambda mp_t, o_t: (mp_t, o_t)), xmap, wmap, omap, 0


@functools.partial(jax.jit, static_argnames=("tm", "interpret", "layout",
                                             "m_fastest", "kind"))
def _grouped_matmul_q(qs, scales, x_sorted, tile_expert, tm, interpret, layout,
                      m_fastest=False, li=None, kind="q8_0"):
    packed = layout == "packed4"
    rowq = kind == "q8_row"
    stacked = li is not None
    e, o, wi = qs.shape[-3:]
    i = wi * 2 if packed else wi
    mp = x_sorted.shape[0]
    xbytes = 4 if x_sorted.dtype == jnp.float32 else 2
    to = _pick_to(o, i, 0.5 if packed else 1, tm=tm, xbytes=xbytes,
                  n_x=2 if packed else 1)
    dot_dtype = jnp.float32 if x_sorted.dtype == jnp.float32 else jnp.bfloat16
    grid_of, xmap, wmap, omap, mdim = _specs(tm, to, m_fastest, stacked)
    wb = (1, 1) if stacked else (1,)
    w_specs = [pl.BlockSpec(wb + (to, wi), wmap),
               pl.BlockSpec(wb + (to, 1 if rowq else i // BLOCK), wmap)]
    npf = 2 if stacked else 1
    pref = (tile_expert,) + ((jnp.asarray(li, jnp.int32).reshape(1),) if stacked else ())
    if rowq:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=npf,
            grid=grid_of(mp // tm, o // to),
            in_specs=[pl.BlockSpec((tm, i), xmap), *w_specs],
            out_specs=pl.BlockSpec((tm, to), omap),
        )
        return pl.pallas_call(
            functools.partial(_gkernel_rowq, dot_dtype=dot_dtype, mdim=mdim,
                              stacked=stacked),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((mp, o), jnp.float32),
            interpret=interpret,
        )(*pref, x_sorted, qs, scales)
    if packed:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=npf,
            grid=grid_of(mp // tm, o // to),
            in_specs=[pl.BlockSpec((tm, i // 2), xmap),
                      pl.BlockSpec((tm, i // 2), xmap),
                      *w_specs],
            out_specs=pl.BlockSpec((tm, to), omap),
        )
        return pl.pallas_call(
            functools.partial(_gkernel_packed4, dot_dtype=dot_dtype, mdim=mdim,
                              stacked=stacked),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((mp, o), jnp.float32),
            interpret=interpret,
        )(*pref, x_sorted[:, : i // 2], x_sorted[:, i // 2:], qs, scales)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=npf,
        grid=grid_of(mp // tm, o // to),
        in_specs=[pl.BlockSpec((tm, i), xmap), *w_specs],
        out_specs=pl.BlockSpec((tm, to), omap),
    )
    return pl.pallas_call(
        functools.partial(_gkernel, dot_dtype=dot_dtype,
                          interleaved=(layout == "interleaved"), mdim=mdim,
                          stacked=stacked),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((mp, o), jnp.float32),
        interpret=interpret,
    )(*pref, x_sorted, qs, scales)


@functools.partial(jax.jit, static_argnames=("tm", "interpret", "m_fastest"))
def _grouped_matmul_dense(w, x_sorted, tile_expert, tm, interpret,
                          m_fastest=False, li=None):
    stacked = li is not None
    e, o, i = w.shape[-3:]
    mp = x_sorted.shape[0]
    xbytes = 4 if x_sorted.dtype == jnp.float32 else 2
    to = _pick_to(o, i, w.dtype.itemsize, tm=tm, xbytes=xbytes)
    dot_dtype = jnp.float32 if x_sorted.dtype == jnp.float32 else jnp.bfloat16
    grid_of, xmap, wmap, omap, mdim = _specs(tm, to, m_fastest, stacked)
    wb = (1, 1) if stacked else (1,)
    npf = 2 if stacked else 1
    pref = (tile_expert,) + ((jnp.asarray(li, jnp.int32).reshape(1),) if stacked else ())
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=npf,
        grid=grid_of(mp // tm, o // to),
        in_specs=[pl.BlockSpec((tm, i), xmap),
                  pl.BlockSpec(wb + (to, i), wmap)],
        out_specs=pl.BlockSpec((tm, to), omap),
    )
    return pl.pallas_call(
        functools.partial(_gkernel_dense, dot_dtype=dot_dtype, mdim=mdim,
                          stacked=stacked),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((mp, o), jnp.float32),
        interpret=interpret,
    )(*pref, x_sorted, w)


# below this many m-tiles, iterate the grid m-fastest (see _specs)
_M_FASTEST_MAX_TILES = 8


def grouped_matmul(w, x_sorted, tile_expert, tm: int, interpret: bool | None = None,
                   li=None):
    """y[Mp, O] = x_sorted[Mp, I] @ W[tile_expert[row//tm]]^T (tile-aligned
    grouped matmul; W: QTensor [E, O, I] or dense [E, O, I] — or the full
    [L, E, O, I] layer stack with `li`, which DMAs layer li's expert blocks
    directly so the forward's layer scan never materializes a per-layer
    expert-slice copy)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    m_fastest = x_sorted.shape[0] // tm <= _M_FASTEST_MAX_TILES
    if isinstance(w, QTensor):
        x = x_sorted
        if w.layout != "canonical":
            from llamatpu.models.weights import interleave_activation

            x = interleave_activation(x_sorted)
        y = _grouped_matmul_q(w.qs, w.scales, x, tile_expert, tm, interpret,
                              w.layout, m_fastest, li=li, kind=w.kind)
        if w.offs is not None:
            # q4_k experts: the per-32 additive offset term is itself a
            # grouped matmul — xbsum [Mp, I/32] (CANONICAL block sums of the
            # pre-interleave activation) against offs [.., E, O, I/32] through
            # the SAME tile->expert maps (dense kernel; tiny stream)
            mp, i_can = x_sorted.shape
            xbsum = x_sorted.astype(jnp.float32).reshape(
                mp, i_can // BLOCK, BLOCK).sum(axis=-1)
            y = y + _grouped_matmul_dense(w.offs, xbsum, tile_expert, tm,
                                          interpret, m_fastest, li=li)
        return y
    return _grouped_matmul_dense(w, x_sorted, tile_expert, tm, interpret,
                                 m_fastest, li=li)


# ----------------------------------------------------------------- FFN
def grouped_ffn(lw, hf, top_w, row_token, row_src, tile_expert, tm: int,
                slw=None, li=None):
    """gate/up/act/down over expert-sorted rows + weighted combine back to
    tokens. Shared by the single-device and expert-parallel paths.
    Scatter-free: routing weights gather through row_src and the per-token
    combine is a one-hot matmul on the MXU (XLA's TPU scatter-add would
    serialize per row). With slw/li, the expert weights come from the full
    [L, E, O, I] stacks (layer picked in-kernel; no per-layer slice copy)."""
    n, d = hf.shape

    hf_pad = jnp.concatenate([hf, jnp.zeros((1, d), hf.dtype)], axis=0)
    x_sorted = hf_pad[row_token]                                   # [Mp, D]
    w_pad = jnp.concatenate([top_w.reshape(-1).astype(jnp.float32),
                             jnp.zeros((1,), jnp.float32)])
    row_w = w_pad[row_src]                                         # [Mp]

    def unpad(y, w):
        lo = getattr(w, "logical_out", 0)
        return y[:, :lo] if lo else y

    def pick(key):
        w = None if slw is None else slw.get(key)
        if li is not None and isinstance(w, QTensor) and w.qs.ndim == 4:
            return w, li
        return lw[key], None

    keys = lw if slw is None else slw
    if "gu_exps" in keys:  # fused gate+up stacks (weights.fuse_layer_weights)
        wgu, lg = pick("gu_exps")
        g13 = unpad(grouped_matmul(wgu, x_sorted, tile_expert, tm, li=lg), wgu)
        mh = g13.shape[-1] // 2
        gate, up = g13[:, :mh], g13[:, mh:]
    else:
        wg, lg = pick("gate_exps")
        wu, lu = pick("up_exps")
        gate = unpad(grouped_matmul(wg, x_sorted, tile_expert, tm, li=lg), wg)
        up = unpad(grouped_matmul(wu, x_sorted, tile_expert, tm, li=lu), wu)
    wd_, ld = pick("down_exps")
    act = (jax.nn.silu(gate) * up).astype(hf.dtype)                # [Mp, MH]
    down = unpad(grouped_matmul(wd_, act, tile_expert, tm, li=ld), wd_)  # [Mp, D]

    # per-token combine: one-hot [N, Mp] @ weighted rows [Mp, D] (pad rows
    # have row_token == n and match nothing)
    onehot = (row_token[None, :] == jnp.arange(n, dtype=jnp.int32)[:, None]
              ).astype(jnp.float32)
    return jax.lax.dot_general(onehot, down * row_w[:, None],
                               dimension_numbers=(((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def moe_ffn_grouped(cfg, hf, top_w, top_i, lw, tm: int = 128, slw=None, li=None,
                    n_experts: int | None = None):
    """Routed-expert FFN over N tokens via grouped matmuls. hf: [N, D];
    top_w/top_i: [N, k]. Returns routed output [N, D] f32 (shared expert is
    handled by the caller — or rides along as virtual experts when the stacks
    are folded, n_experts > cfg.n_experts). Semantics identical to the
    per-token scan path (top-k without renorm)."""
    row_token, row_src, tile_expert = sort_by_expert(
        top_i, n_experts or cfg.n_experts, tm)
    return grouped_ffn(lw, hf, top_w, row_token, row_src, tile_expert, tm,
                       slw=slw, li=li)
