"""Pallas decode attention over the HBM-resident KV cache.

TPU-native analog of the reference's decode attention kernels
(processHeadsFlashAttention / processHeadsParallel / splitKV variants,
TransformerComputeKernelsLayered.java:784-1433): one program per (batch, head
group) computes the GQA group's scores against the cache stripe in VMEM with
f32 masked softmax, keeping the [G, S] score matrix out of HBM entirely.

PACKED KV LAYOUT (round 5): the cache stores K and V in ONE array
[..., S, hd + vhd] — K in lanes [0:hd], V in lanes [hd:]. Rationale: with
separate K/V arrays and hd = 64 (every GQA model here), XLA lane-pads the
minor dim to 128 in HBM, so every attention byte was fetched TWICE (5.95
ms/step measured for the 16-layer stripe at depth 16k vs a ~1.5 ms padded
roofline — r5 probe). Packing makes the minor dim 128-exact: half the HBM
traffic, half the DMA chunks, and ONE cache write per layer instead of two.
The kernels never slice lanes (Mosaic can't do that efficiently); instead:

  scores = (q_pad . kv)          q_pad has ZEROS in the V lanes, so the
                                 contraction over hd+vhd lanes equals q . k
  out    = (att . kv)[:, hd:]    one dot produces [G, hd+vhd]; the V-lane
                                 columns are att . V, the K-lane columns are
                                 discarded (attention is DMA-bound — the
                                 extra MXU columns are free). The slice
                                 happens OUTSIDE the kernel (tiny array).

Int8 mode packs the same way; the f32 scale rows live in a [..., 2, S]
sidecar (row 0 = K scales, row 1 = V) and fold into the dots as before
(ops/kv_quant.py).

Kernels:

- `decode_attention`: one program per (batch, hpp kv heads) over the FULL
  cache stripe in VMEM. Simplest + fastest for short caches. `hpp` heads per
  program amortize grid overhead for MHA models (Phi-3: 32 kv heads, G=1).
- `decode_attention_split`: the reference's splitKV analog re-designed for TPU
  — the stripe is tiled along S with an online-softmax accumulator carried in
  VMEM scratch across the sequential tile grid. The KV block index maps are
  CLAMPED to the tile containing `pos` (scalar-prefetch): tiles past the
  current length re-request the same block, which Pallas recognises as a
  revisit and skips the DMA — decode HBM traffic scales with the ACTUAL
  sequence length. Compute for those tiles is skipped with pl.when.
- `decode_attention_fused_write[_q]` / `decode_attention_split_fused_write[_q]`:
  the per-layer cache append rides the attention kernel (stale row corrected
  in-register; only the 32-row tile containing pos written back through
  aliased outputs) — replaces the dynamic_update_slice thunks per layer.
- `decode_attention_paged`: block-table DMA over the shared paged pool
  (runtime/paged_cache.py) — grid steps fetch pool blocks through the lane's
  table via scalar prefetch; no dense per-lane gather is ever materialized.

STACKED-CACHE MODE (`layer_index=...`): the forward pass scans layers with the
whole [L, ...] cache as the scan CARRY (position-only writes — passing per-
layer slices through scan xs/ys makes XLA copy the ENTIRE cache every step:
26 ms vs 2 ms per decode step at Phi-3 geometry, measured on chip). In this
mode the cache keeps its leading L axis and the kernels' index maps prepend the
scalar-prefetched layer index — the kernel DMAs its blocks straight out of the
stacked cache, so no per-layer slice is materialized either.

`decode_attention_auto` picks a kernel per cache length/dtype.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def pack_q(q, vhd: int):
    """[..., G, hd] query -> [..., G, hd + vhd] with ZERO V lanes, so the
    packed-KV score contraction equals q . k exactly."""
    pad = [(0, 0)] * (q.ndim - 1) + [(0, vhd)]
    return jnp.pad(q, pad)


def _attend_one(q_pad, kvb, pos, scale, start=0, ks=None, vs=None):
    """One head group's masked-softmax attention over a packed stripe.
    q_pad [G, hd+vhd] (V lanes zero); kvb [S, hd+vhd]; optional int8 scale
    rows ks/vs [1, S]. Returns [G, hd+vhd] f32 — caller takes [:, hd:]."""
    q = q_pad.astype(jnp.float32)
    kv = kvb.astype(jnp.float32)
    scores = jax.lax.dot_general(
        q, kv, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale  # [G, S]
    if ks is not None:
        scores = scores * ks
    s_idx = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1) + start
    scores = jnp.where(s_idx <= pos, scores, NEG_INF)
    m = jnp.max(scores, axis=1, keepdims=True)
    e = jnp.exp(scores - m)
    att = e / jnp.sum(e, axis=1, keepdims=True)
    if vs is not None:
        att = att * vs
    return jax.lax.dot_general(
        att, kv, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


_HPP_VMEM_BUDGET = 4 << 20  # packed KV bytes per program (double-buffered)


def _pick_hpp(kv: int, s: int, width: int, itemsize: int) -> int:
    """Heads per program: largest divisor of kv whose packed block fits the
    VMEM budget. 1 for GQA models with long caches; up to 8 for MHA."""
    per_head = s * width * itemsize
    hpp = max(1, min(8, _HPP_VMEM_BUDGET // max(per_head, 1)))
    while kv % hpp:
        hpp -= 1
    return hpp


# ---------------------------------------------------------------------------
# full-stripe kernels (optionally int8, optionally stacked-cache)
# ---------------------------------------------------------------------------

def _full_kernel(pos_pref, *refs, scale, hpp, stacked, quant):
    # refs: [li_pref?] q kv [sc]? o  (prefetch refs lead; see callers)
    if stacked:
        refs = refs[1:]  # li feeds the index maps only
    if quant:
        q_ref, kv_ref, sc_ref, o_ref = refs
    else:
        q_ref, kv_ref, o_ref = refs
        sc_ref = None
    pos = pos_pref[pl.program_id(0)]
    kv_ix = (0, 0) if stacked else (0,)  # cache blocks carry a leading L=1 dim
    for i in range(hpp):
        ks = sc_ref[kv_ix + (i, 0)][None, :] if quant else None
        vs = sc_ref[kv_ix + (i, 1)][None, :] if quant else None
        o_ref[0, i] = _attend_one(q_ref[0, i], kv_ref[kv_ix + (i,)],
                                  pos, scale, ks=ks, vs=vs)


def _full_call(q_pad, kvc, pos_vec, scale, *, s, hpp, interpret, layer_index,
               scale_rows=None):
    b, kv, g, width = q_pad.shape
    quant = scale_rows is not None
    stacked = layer_index is not None
    npf = 2 if stacked else 1

    def q_map(bi, hi, *pref):
        return (bi, hi, 0, 0)

    if stacked:
        def kv_map(bi, hi, pp, li):
            return (li[0], bi, hi, 0, 0)

        kb = (1, 1, hpp, s, width)
        sb = (1, 1, hpp, 2, s)
    else:
        def kv_map(bi, hi, pp):
            return (bi, hi, 0, 0)

        kb = (1, hpp, s, width)
        sb = (1, hpp, 2, s)

    in_specs = [pl.BlockSpec((1, hpp, g, width), q_map),
                pl.BlockSpec(kb, kv_map)]
    args = [q_pad, kvc]
    if quant:
        in_specs += [pl.BlockSpec(sb, kv_map)]
        args += [scale_rows]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=npf,
        grid=(b, kv // hpp),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, hpp, g, width), q_map),
    )
    pref = (pos_vec.astype(jnp.int32),)
    if stacked:
        pref += (jnp.asarray(layer_index, jnp.int32).reshape(1),)
    return pl.pallas_call(
        functools.partial(_full_kernel, scale=scale, hpp=hpp, stacked=stacked,
                          quant=quant),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, kv, g, width), jnp.float32),
        interpret=interpret,
    )(*pref, *args)


@functools.partial(jax.jit, static_argnames=("scale", "hd", "interpret",
                                             "s_use", "hpp"))
def decode_attention(q, kvc, pos_vec, scale: float, hd: int | None = None,
                     interpret: bool = False, s_use: int | None = None,
                     hpp: int | None = None, layer_index=None):
    """q: [B, KV, G, hd]; kvc: packed [B, KV, S, hd+vhd] head-major (or
    [L, B, KV, S, ...] with layer_index); pos_vec: [B] (keys s <= pos are
    valid). Returns [B, KV, G, vhd] f32. s_use: read only the first s_use
    cache rows (the physical cache allocates write-slack rows past the logical
    length that no query ever attends)."""
    b, kv, g, hd_q = q.shape
    hd = hd or hd_q
    width = kvc.shape[-1]
    s = s_use or kvc.shape[-2]
    q_pad = pack_q(q, width - hd)
    hpp = hpp or _pick_hpp(kv, s, width, kvc.dtype.itemsize)
    out = _full_call(q_pad, kvc, pos_vec, scale, s=s, hpp=hpp,
                     interpret=interpret, layer_index=layer_index)
    return out[..., hd:]


@functools.partial(jax.jit, static_argnames=("scale", "hd", "interpret",
                                             "s_use", "hpp"))
def decode_attention_q(q, kvc, scale_rows, pos_vec, scale: float,
                       hd: int | None = None, interpret: bool = False,
                       s_use: int | None = None, hpp: int | None = None,
                       layer_index=None):
    """Int8-KV decode attention. kvc int8 packed [(L,) B, KV, S, hd+vhd];
    scale_rows f32 [(L,) B, KV, 2, S] (row 0 = K, row 1 = V); otherwise as
    decode_attention."""
    b, kv, g, hd_q = q.shape
    hd = hd or hd_q
    width = kvc.shape[-1]
    s = s_use or kvc.shape[-2]
    q_pad = pack_q(q, width - hd)
    hpp = hpp or _pick_hpp(kv, s, width, kvc.dtype.itemsize)
    out = _full_call(q_pad, kvc, pos_vec, scale, s=s, hpp=hpp,
                     interpret=interpret, layer_index=layer_index,
                     scale_rows=scale_rows)
    return out[..., hd:]


# ---------------------------------------------------------------------------
# splitKV kernels: online softmax over S tiles, DMA clamped to pos
# ---------------------------------------------------------------------------

def _split_kernel(pos_pref, *refs, scale, s_tile, stacked, quant, hpp=1,
                  fused=False, shift=0):
    # hpp kv heads per program share one grid walk over the S tiles; each
    # head's online-softmax state lives in its row band of the shared scratch.
    # fused mode: kvn carries this token's packed post-RoPE K/V row — the
    # stale cache row is corrected in-register before the dots and only the
    # 32-row tile containing pos (plus, in quant mode, the visited scale
    # tiles) is written back through aliased outputs.
    if stacked:
        refs = refs[1:]
    kvn_ref = sn_ref = kvo_ref = sco_ref = mo_ref = lo_ref = None
    if fused and quant:
        (q_ref, kvn_ref, sn_ref, kv_ref, sc_ref, o_ref, kvo_ref, sco_ref,
         m_ref, l_ref, acc_ref) = refs
    elif fused:
        (q_ref, kvn_ref, kv_ref, o_ref, kvo_ref, m_ref, l_ref, acc_ref) = refs
        sc_ref = None
    elif quant:
        q_ref, kv_ref, sc_ref, o_ref, *refs = refs
        mo_ref, lo_ref = (refs[0], refs[1]) if len(refs) == 5 else (None, None)
        m_ref, l_ref, acc_ref = refs[-3:]
    else:
        q_ref, kv_ref, o_ref, *refs = refs
        mo_ref, lo_ref = (refs[0], refs[1]) if len(refs) == 5 else (None, None)
        m_ref, l_ref, acc_ref = refs[-3:]
        sc_ref = None
    g = q_ref.shape[2]
    bi = pl.program_id(0)
    ti = pl.program_id(2)
    nt = pl.num_programs(2)
    pos = pos_pref[bi]
    kv_ix = (0, 0) if stacked else (0,)

    @pl.when(ti == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    start = ti * s_tile

    @pl.when(start <= pos)
    def _tile():
        for i in range(hpp):
            band = slice(i * g, (i + 1) * g)
            q = q_ref[0, i].astype(jnp.float32)
            kvb = kv_ref[kv_ix + (i,)]
            if fused:
                # replace the stale row `pos` in-register (true only in the
                # tile that contains it): the dots see exactly what the
                # unfused write-then-attend path reads back from the cache
                rel = jax.lax.broadcasted_iota(jnp.int32, (s_tile, 1), 0) + start
                kvn = kvn_ref[0, i, 0]
                kvb = jnp.where(rel == pos, kvn[None, :].astype(kvb.dtype), kvb)
            kvb = kvb.astype(jnp.float32)
            if quant:
                ks_row = sc_ref[kv_ix + (i, 0)]  # [s_tile]
                vs_row = sc_ref[kv_ix + (i, 1)]
                if fused:
                    col = jax.lax.broadcasted_iota(
                        jnp.int32, (1, s_tile), 1) + start
                    ks_row = jnp.where(col == pos, sn_ref[0, i, 0, 0],
                                       ks_row[None, :])[0]
                    vs_row = jnp.where(col == pos, sn_ref[0, i, 1, 0],
                                       vs_row[None, :])[0]
                    # scale tiles flush per visited tile (clamped out map)
                    sco_ref[0, 0, i, 0] = ks_row
                    sco_ref[0, 0, i, 1] = vs_row
            scores = jax.lax.dot_general(
                q, kvb, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            if quant:
                scores = scores * ks_row[None, :]
            s_idx = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1) + start
            scores = jnp.where(s_idx <= pos, scores, NEG_INF)
            # lanes of m/l are replicated, so a lane-max is a read
            m_prev = jnp.max(m_ref[band], axis=1, keepdims=True)  # [G, 1]
            l_prev = jnp.max(l_ref[band], axis=1, keepdims=True)
            m_new = jnp.maximum(m_prev, jnp.max(scores, axis=1, keepdims=True))
            alpha = jnp.exp(m_prev - m_new)
            e = jnp.exp(scores - m_new)
            l_new = l_prev * alpha + jnp.sum(e, axis=1, keepdims=True)
            # v-scale folds into the att.V dot only — NOT the denominator
            ev = e * vs_row[None, :] if quant else e
            acc_ref[band] = acc_ref[band] * alpha + jax.lax.dot_general(
                ev, kvb, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            m_ref[band] = jnp.broadcast_to(m_new, (g, m_ref.shape[1]))
            l_ref[band] = jnp.broadcast_to(l_new, (g, l_ref.shape[1]))

    if fused:
        # write-back: this grid step owns the 32-row tile containing pos; the
        # kvo out block's index map is constant per (bi, hi) program, so the
        # buffer written here flushes once at program end
        @pl.when(ti == (pos >> shift))
        def _writeback():
            t0 = pl.multiple_of(((pos >> 5) << 5) - start, _WTILE)
            rel32 = (jax.lax.broadcasted_iota(jnp.int32, (_WTILE, 1), 0)
                     + start + t0)
            for i in range(hpp):
                kvn = kvn_ref[0, i, 0]
                tile = kv_ref[kv_ix + (i, pl.ds(t0, _WTILE))]
                kvo_ref[0, 0, i] = jnp.where(
                    rel32 == pos, kvn[None, :].astype(tile.dtype), tile)

    @pl.when(ti == nt - 1)
    def _finalize():
        for i in range(hpp):
            band = slice(i * g, (i + 1) * g)
            l = jnp.max(l_ref[band], axis=1, keepdims=True)  # >= 1 term
            o_ref[0, i] = acc_ref[band] / l
            if mo_ref is not None:
                # partial-softmax stats for cross-shard combine (sequence
                # parallelism inside a pipeline stage): o is normalized by
                # the LOCAL l; the combiner reweights with exp(m - m_g) * l
                mo_ref[0, i] = m_ref[band]
                lo_ref[0, i] = l_ref[band]


def _split_call(q_pad, kvc, pos_vec, scale, *, s_tile, interpret, layer_index,
                scale_rows=None, hpp=1, stats=False):
    b, kv, g, width = q_pad.shape
    s = kvc.shape[-2]
    quant = scale_rows is not None
    stacked = layer_index is not None
    assert s % s_tile == 0, (s, s_tile)
    assert s_tile & (s_tile - 1) == 0, s_tile  # clamp uses a shift, not a div
    shift = s_tile.bit_length() - 1
    nt = s // s_tile
    npf = 2 if stacked else 1

    def q_map(bi, hi, ti, *pref):
        return (bi, hi, 0, 0)

    if stacked:
        def kv_map(bi, hi, ti, pp, li):
            return (li[0], bi, hi, jnp.minimum(ti, pp[bi] >> shift), 0)

        def sc_map(bi, hi, ti, pp, li):
            return (li[0], bi, hi, 0, jnp.minimum(ti, pp[bi] >> shift))

        kb = (1, 1, hpp, s_tile, width)
        sb = (1, 1, hpp, 2, s_tile)
    else:
        def kv_map(bi, hi, ti, pp):
            return (bi, hi, jnp.minimum(ti, pp[bi] >> shift), 0)

        def sc_map(bi, hi, ti, pp):
            return (bi, hi, 0, jnp.minimum(ti, pp[bi] >> shift))

        kb = (1, hpp, s_tile, width)
        sb = (1, hpp, 2, s_tile)

    in_specs = [pl.BlockSpec((1, hpp, g, width), q_map),
                pl.BlockSpec(kb, kv_map)]
    args = [q_pad, kvc]
    if quant:
        in_specs += [pl.BlockSpec(sb, sc_map)]
        args += [scale_rows]
    out_specs = pl.BlockSpec((1, hpp, g, width), q_map)
    out_shape = jax.ShapeDtypeStruct((b, kv, g, width), jnp.float32)
    if stats:
        out_specs = [out_specs,
                     pl.BlockSpec((1, hpp, g, 128), q_map),
                     pl.BlockSpec((1, hpp, g, 128), q_map)]
        out_shape = [out_shape,
                     jax.ShapeDtypeStruct((b, kv, g, 128), jnp.float32),
                     jax.ShapeDtypeStruct((b, kv, g, 128), jnp.float32)]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=npf,
        grid=(b, kv // hpp, nt),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((hpp * g, 128), jnp.float32),
            pltpu.VMEM((hpp * g, 128), jnp.float32),
            pltpu.VMEM((hpp * g, width), jnp.float32),
        ],
    )
    pref = (pos_vec.astype(jnp.int32),)
    if stacked:
        pref += (jnp.asarray(layer_index, jnp.int32).reshape(1),)
    return pl.pallas_call(
        functools.partial(_split_kernel, scale=scale, s_tile=s_tile,
                          stacked=stacked, quant=quant, hpp=hpp),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(*pref, *args)


@functools.partial(jax.jit, static_argnames=("scale", "hd", "s_tile",
                                             "interpret", "hpp"))
def decode_attention_split(q, kvc, pos_vec, scale: float,
                           hd: int | None = None, s_tile: int = 1024,
                           interpret: bool = False, layer_index=None,
                           hpp: int | None = None):
    """KV-tiled online-softmax decode attention (splitKV analog). Same
    signature/semantics as `decode_attention`; requires S % s_tile == 0 and
    s_tile a power of two (`//` lowers to a ~20x software divide on TPU)."""
    kv = q.shape[1]
    hd = hd or q.shape[3]
    width = kvc.shape[-1]
    q_pad = pack_q(q, width - hd)
    hpp = hpp or _pick_hpp(kv, s_tile, width, kvc.dtype.itemsize)
    out = _split_call(q_pad, kvc, pos_vec, scale, s_tile=s_tile,
                      interpret=interpret, layer_index=layer_index, hpp=hpp)
    return out[..., hd:]


@functools.partial(jax.jit, static_argnames=("scale", "hd", "s_tile",
                                             "interpret", "hpp"))
def decode_attention_split_stats(q, kvc, pos_vec, scale: float,
                                 hd: int | None = None, s_tile: int = 1024,
                                 interpret: bool = False, layer_index=None,
                                 hpp: int | None = None):
    """Split attention returning PARTIAL-softmax stats for a cross-shard
    combine (sp inside a pipeline stage, parallel/pipeline.py): returns
    (o [B, KV, G, vhd] — normalized by the LOCAL denominator — plus
    m [B, KV, G, 1] and l [B, KV, G, 1]); combine as
    w_sh = exp(m_sh - max_sh m) * l_sh, o = sum w*o / sum w."""
    kv = q.shape[1]
    hd = hd or q.shape[3]
    width = kvc.shape[-1]
    q_pad = pack_q(q, width - hd)
    hpp = hpp or _pick_hpp(kv, s_tile, width, kvc.dtype.itemsize)
    o, m, l = _split_call(q_pad, kvc, pos_vec, scale, s_tile=s_tile,
                          interpret=interpret, layer_index=layer_index,
                          hpp=hpp, stats=True)
    return o[..., hd:], m[..., :1], l[..., :1]


@functools.partial(jax.jit, static_argnames=("scale", "hd", "s_tile",
                                             "interpret", "hpp"))
def decode_attention_split_q(q, kvc, scale_rows, pos_vec, scale: float,
                             hd: int | None = None, s_tile: int = 1024,
                             interpret: bool = False, layer_index=None,
                             hpp: int | None = None):
    """Int8-KV KV-tiled decode attention with the same DMA-clamped block maps
    as `decode_attention_split`. scale_rows [(L,) B, KV, 2, S]."""
    kv = q.shape[1]
    hd = hd or q.shape[3]
    width = kvc.shape[-1]
    q_pad = pack_q(q, width - hd)
    hpp = hpp or _pick_hpp(kv, s_tile, width, kvc.dtype.itemsize)
    out = _split_call(q_pad, kvc, pos_vec, scale, s_tile=s_tile,
                      interpret=interpret, layer_index=layer_index,
                      scale_rows=scale_rows, hpp=hpp)
    return out[..., hd:]


def _split_fused_call(q_pad, kv_new, kvc, pos_vec, scale, layer_index, *,
                      s_tile, interpret, hpp, s_new=None, scale_rows=None):
    """Shared wrapper for the fused-append split kernels (stacked cache only).
    Returns (attn, kvc'[, scale']) with the cache buffers aliased."""
    b, kv, g, width = q_pad.shape
    s = kvc.shape[-2]
    quant = scale_rows is not None
    assert s % s_tile == 0 and s % _WTILE == 0, (s, s_tile)
    assert s_tile & (s_tile - 1) == 0, s_tile
    shift = s_tile.bit_length() - 1
    nt = s // s_tile
    kv_new = kv_new[:, :, None, :]
    if quant:
        s_new = s_new[:, :, :, None].astype(jnp.float32)  # [B, KV, 2, 1]

    def q_map(bi, hi, ti, pp, li):
        return (bi, hi, 0, 0)

    def new_map(bi, hi, ti, pp, li):
        return (bi, hi, 0, 0)

    def kv_map(bi, hi, ti, pp, li):
        return (li[0], bi, hi, jnp.minimum(ti, pp[bi] >> shift), 0)

    def sc_map(bi, hi, ti, pp, li):
        return (li[0], bi, hi, 0, jnp.minimum(ti, pp[bi] >> shift))

    def tile_map(bi, hi, ti, pp, li):
        return (li[0], bi, hi, pp[bi] >> 5, 0)

    in_specs = [pl.BlockSpec((1, hpp, g, width), q_map),
                pl.BlockSpec((1, hpp, 1, width), new_map)]
    args = [q_pad, kv_new]
    if quant:
        in_specs += [pl.BlockSpec((1, hpp, 2, 1), new_map)]
        args += [s_new]
    in_specs += [pl.BlockSpec((1, 1, hpp, s_tile, width), kv_map)]
    args += [kvc]
    out_specs = [pl.BlockSpec((1, hpp, g, width), q_map),
                 pl.BlockSpec((1, 1, hpp, _WTILE, width), tile_map)]
    out_shape = [jax.ShapeDtypeStruct((b, kv, g, width), jnp.float32),
                 jax.ShapeDtypeStruct(kvc.shape, kvc.dtype)]
    if quant:
        in_specs += [pl.BlockSpec((1, 1, hpp, 2, s_tile), sc_map)]
        args += [scale_rows]
        out_specs += [pl.BlockSpec((1, 1, hpp, 2, s_tile), sc_map)]
        out_shape += [jax.ShapeDtypeStruct(scale_rows.shape, scale_rows.dtype)]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, kv // hpp, nt),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((hpp * g, 128), jnp.float32),
            pltpu.VMEM((hpp * g, 128), jnp.float32),
            pltpu.VMEM((hpp * g, width), jnp.float32),
        ],
    )
    # operand indices incl. scalar prefetch — plain: pos=0 li=1 q=2 kvn=3
    # kvc=4; quant: ... sn=4 kvc=5 sc=6
    aliases = ({5: 1, 6: 2} if quant else {4: 1})
    return pl.pallas_call(
        functools.partial(_split_kernel, scale=scale, s_tile=s_tile,
                          stacked=True, quant=quant, hpp=hpp, fused=True,
                          shift=shift),
        grid_spec=grid_spec,
        out_shape=out_shape,
        input_output_aliases=aliases,
        interpret=interpret,
    )(pos_vec.astype(jnp.int32),
      jnp.asarray(layer_index, jnp.int32).reshape(1), *args)


@functools.partial(jax.jit, static_argnames=("scale", "hd", "s_tile",
                                             "interpret", "hpp"))
def decode_attention_split_fused_write(q, kv_new, kvc, pos_vec, scale: float,
                                       layer_index, hd: int | None = None,
                                       s_tile: int = 1024,
                                       interpret: bool = False,
                                       hpp: int | None = None):
    """Fused KV-append + splitKV decode attention over the STACKED cache —
    the long-context analog of `decode_attention_fused_write`. At 16k+
    positions the unfused path's dynamic_update_slice thunks per layer cost
    ~4.7 ms/step (r5 probe) — here the append rides the attention kernel's
    aliased output: only the 32-row tile containing pos (per kv head) returns
    to HBM.

    Same numerics as write-then-attend with `decode_attention_split` (the
    stale row is corrected in-register before the dots). kvc packed stacked
    [L, B, KV, S, hd+vhd]; kv_new [B, KV, hd+vhd] is this token's packed
    post-RoPE row. Returns (attn [B, KV, G, vhd] f32, kvc') with kvc'
    aliasing kvc. Reference analog: splitKV + combine
    (TransformerComputeKernelsLayered.java:1245-1433) — which still writes KV
    through a separate copyToCache kernel; this fuses both."""
    kv = q.shape[1]
    hd = hd or q.shape[3]
    width = kvc.shape[-1]
    q_pad = pack_q(q, width - hd)
    hpp = hpp or _pick_hpp(kv, s_tile, width, kvc.dtype.itemsize)
    out, kvc2 = _split_fused_call(q_pad, kv_new, kvc, pos_vec, scale,
                                  layer_index, s_tile=s_tile,
                                  interpret=interpret, hpp=hpp)
    return out[..., hd:], kvc2


@functools.partial(jax.jit, static_argnames=("scale", "hd", "s_tile",
                                             "interpret", "hpp"))
def decode_attention_split_fused_write_q(q, kv_new, s_new, kvc, scale_rows,
                                         pos_vec, scale: float, layer_index,
                                         hd: int | None = None,
                                         s_tile: int = 1024,
                                         interpret: bool = False,
                                         hpp: int | None = None):
    """Int8-KV fused KV-append + splitKV attention: replaces the int8 row +
    scale dynamic_update_slice thunks per layer plus the attention call.
    kv_new int8 [B, KV, hd+vhd]; s_new f32 [B, KV, 2] (K, V scales);
    scale_rows [L, B, KV, 2, S]. The int8 write-back is the 32-row tile
    containing pos, the [2, s_tile] scale tiles are rewritten per visited
    tile (trivial traffic; Mosaic has no dynamic lane slicing). Returns
    (attn, kvc', scale') aliased."""
    kv = q.shape[1]
    hd = hd or q.shape[3]
    width = kvc.shape[-1]
    q_pad = pack_q(q, width - hd)
    hpp = hpp or _pick_hpp(kv, s_tile, width, kvc.dtype.itemsize)
    out, kvc2, sc2 = _split_fused_call(q_pad, kv_new, kvc, pos_vec, scale,
                                       layer_index, s_tile=s_tile,
                                       interpret=interpret, hpp=hpp,
                                       s_new=s_new, scale_rows=scale_rows)
    return out[..., hd:], kvc2, sc2


# ---------------------------------------------------------------------------
# paged kernel: block-table DMA over the shared pool
# ---------------------------------------------------------------------------

def _paged_kernel(tables_pref, pos_pref, *refs, scale, s_tile, stacked, quant,
                  hpp=1):
    del tables_pref  # feeds the index maps only
    _split_kernel(pos_pref, *refs, scale=scale, s_tile=s_tile,
                  stacked=stacked, quant=quant, hpp=hpp)


@functools.partial(jax.jit, static_argnames=("scale", "hd", "interpret"))
def decode_attention_paged(q, kv_pool, tables, pos_vec, scale: float,
                           scale_pool=None, hd: int | None = None,
                           interpret: bool = False, layer_index=None):
    """Block-table DMA paged decode attention: the kernel reads KV straight
    from the shared block pool — no dense per-lane gather materialized in HBM
    (runtime/paged_cache.paged_gather copies the lane's whole KV stripe per
    layer per step; this kernel's HBM traffic is exactly the live blocks).

    q: [B, KV, G, hd]; kv_pool: packed [NBLK, KV, BS, hd+vhd] (one layer) or
    [L, NBLK, KV, BS, ...] with layer_index; tables: [B, MAXBLK] int32;
    pos_vec: [B]. Int8 pools pass scale_pool [(L,) NBLK, KV, 2, BS].
    Returns [B, KV, G, vhd] f32.

    Grid (B, KV, MAXBLK): the pool-block index map routes grid step (b, h, j)
    to physical block tables[b, min(j, pos_b//BS)] via scalar prefetch — tiles
    past the current length revisit the previous block so Pallas skips their
    DMA (reads scale with the ACTUAL sequence length), and their compute is
    skipped with pl.when. The reference's paged analog doesn't exist (its KV
    is a flat preallocated array, State.java:44-45); vLLM's paged_attention
    kernel is the conceptual ancestor."""
    b, kv, g, hd_q = q.shape
    hd = hd or hd_q
    stacked = layer_index is not None
    bs = kv_pool.shape[-2]
    width = kv_pool.shape[-1]
    maxblk = tables.shape[1]
    quant = scale_pool is not None
    assert bs & (bs - 1) == 0, bs  # clamp uses a shift, not a divide
    shift = bs.bit_length() - 1
    npf = 3 if stacked else 2
    hpp = _pick_hpp(kv, bs, width, kv_pool.dtype.itemsize)
    q_pad = pack_q(q, width - hd)

    def q_map(bi, hi, ti, *pref):
        return (bi, hi, 0, 0)

    if stacked:
        def kv_map(bi, hi, ti, tp, pp, li):
            lj = jnp.minimum(ti, pp[bi] >> shift)
            return (li[0], tp[bi, lj], hi, 0, 0)

        kb = (1, 1, hpp, bs, width)
        sb = (1, 1, hpp, 2, bs)
    else:
        def kv_map(bi, hi, ti, tp, pp):
            lj = jnp.minimum(ti, pp[bi] >> shift)
            return (tp[bi, lj], hi, 0, 0)

        kb = (1, hpp, bs, width)
        sb = (1, hpp, 2, bs)

    in_specs = [pl.BlockSpec((1, hpp, g, width), q_map),
                pl.BlockSpec(kb, kv_map)]
    args = [q_pad, kv_pool]
    if quant:
        in_specs += [pl.BlockSpec(sb, kv_map)]
        args += [scale_pool]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=npf,
        grid=(b, kv // hpp, maxblk),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, hpp, g, width), q_map),
        scratch_shapes=[
            pltpu.VMEM((hpp * g, 128), jnp.float32),
            pltpu.VMEM((hpp * g, 128), jnp.float32),
            pltpu.VMEM((hpp * g, width), jnp.float32),
        ],
    )
    pref = (tables.astype(jnp.int32), pos_vec.astype(jnp.int32))
    if stacked:
        pref += (jnp.asarray(layer_index, jnp.int32).reshape(1),)
    out = pl.pallas_call(
        functools.partial(_paged_kernel, scale=scale, s_tile=bs,
                          stacked=stacked, quant=quant, hpp=hpp),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, kv, g, width), jnp.float32),
        interpret=interpret,
    )(*pref, *args)
    return out[..., hd:]


# ---------------------------------------------------------------------------
# fused KV-append + attention (megakernel v3 step 1): the decode step's
# per-layer cache write rides the attention kernel instead of standalone
# dynamic_update_slice ops
# ---------------------------------------------------------------------------

_WTILE = 32  # write-back tile rows: a multiple of every dtype's sublane
             # granule (f32 8 / bf16 16 / int8 32), so the tile block is
             # always Mosaic-legal


def _fused_write_kernel(pos_pref, li_pref, *refs, scale, hpp, quant):
    # refs: q kv_new [s_new] kv [sc] | o kv_tile [sc_row]
    del li_pref  # feeds the index maps only
    if quant:
        (q_ref, kvn_ref, sn_ref, kv_ref, sc_ref, o_ref, kvo_ref,
         sco_ref) = refs
    else:
        q_ref, kvn_ref, kv_ref, o_ref, kvo_ref = refs
    bi = pl.program_id(0)
    pos = pos_pref[bi]
    # start row of the _WTILE-row tile containing pos; multiple_of lets
    # Mosaic prove the dynamic sublane slice below is 8-aligned (it rejects
    # the load otherwise: "cannot statically prove that index in dimension 3
    # is a multiple of 8", found on chip)
    t0 = pl.multiple_of((pos >> 5) << 5, _WTILE)
    s = kv_ref.shape[3]
    for i in range(hpp):
        kvn = kvn_ref[0, i, 0]  # [hd+vhd] (packed new row; int8 in quant mode)
        kvb = kv_ref[0, 0, i]
        # replace the stale row `pos` in-register: the attention dots then see
        # exactly what the unfused write-then-attend path reads back from the
        # cache (same cast, same operands -> bit-identical output)
        row = jax.lax.broadcasted_iota(jnp.int32, (s, 1), 0)
        kv_corr = jnp.where(row == pos, kvn[None, :].astype(kvb.dtype), kvb)
        ks = vs = None
        if quant:  # correct + write back the [2, S] scale rows wholesale
            col = jax.lax.broadcasted_iota(jnp.int32, (1, s), 1)
            ks = jnp.where(col == pos, sn_ref[0, i, 0, 0], sc_ref[0, 0, i, 0])
            vs = jnp.where(col == pos, sn_ref[0, i, 1, 0], sc_ref[0, 0, i, 1])
            sco_ref[0, 0, i, 0] = ks[0]
            sco_ref[0, 0, i, 1] = vs[0]
        o_ref[0, i] = _attend_one(q_ref[0, i], kv_corr, pos, scale,
                                  ks=ks, vs=vs)
        # write-back: only the 32-row tile containing `pos` returns to HBM
        # (the out block's index map points at it); all other rows of the
        # aliased cache buffer are untouched
        rel = jax.lax.broadcasted_iota(jnp.int32, (_WTILE, 1), 0) + t0
        tile = kv_ref[0, 0, i, pl.ds(t0, _WTILE), :]
        kvo_ref[0, 0, i] = jnp.where(rel == pos,
                                     kvn[None, :].astype(kvb.dtype), tile)


def _fused_full_call(q_pad, kv_new, kvc, pos_vec, scale, layer_index, *,
                     interpret, hpp, s_new=None, scale_rows=None):
    b, kv, g, width = q_pad.shape
    s = kvc.shape[-2]
    quant = scale_rows is not None
    assert s % _WTILE == 0, s
    # [B, KV, 1, width] so the block's last-two dims are (1, width) — a
    # (hpp, width) block of a 3-D array violates Mosaic's sublane rule
    # (CLAUDE.md: ship per-head vectors with a singleton sublane dim)
    kv_new = kv_new[:, :, None, :]
    if quant:
        s_new = s_new[:, :, :, None].astype(jnp.float32)  # [B, KV, 2, 1]

    def q_map(bi, hi, pp, li):
        return (bi, hi, 0, 0)

    def new_map(bi, hi, pp, li):
        return (bi, hi, 0, 0)

    def kv_map(bi, hi, pp, li):
        return (li[0], bi, hi, 0, 0)

    def tile_map(bi, hi, pp, li):
        return (li[0], bi, hi, pp[bi] >> 5, 0)

    in_specs = [pl.BlockSpec((1, hpp, g, width), q_map),
                pl.BlockSpec((1, hpp, 1, width), new_map)]
    args = [q_pad, kv_new]
    if quant:
        in_specs += [pl.BlockSpec((1, hpp, 2, 1), new_map)]
        args += [s_new]
    in_specs += [pl.BlockSpec((1, 1, hpp, s, width), kv_map)]
    args += [kvc]
    out_specs = [pl.BlockSpec((1, hpp, g, width), q_map),
                 pl.BlockSpec((1, 1, hpp, _WTILE, width), tile_map)]
    out_shape = [jax.ShapeDtypeStruct((b, kv, g, width), jnp.float32),
                 jax.ShapeDtypeStruct(kvc.shape, kvc.dtype)]
    if quant:
        in_specs += [pl.BlockSpec((1, 1, hpp, 2, s), kv_map)]
        args += [scale_rows]
        out_specs += [pl.BlockSpec((1, 1, hpp, 2, s), kv_map)]
        out_shape += [jax.ShapeDtypeStruct(scale_rows.shape,
                                           scale_rows.dtype)]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, kv // hpp),
        in_specs=in_specs,
        out_specs=out_specs,
    )
    # operand order incl. scalar prefetch — plain: pos=0 li=1 q=2 kvn=3 kvc=4;
    # quant: ... sn=4 kvc=5 sc=6
    aliases = ({5: 1, 6: 2} if quant else {4: 1})
    return pl.pallas_call(
        functools.partial(_fused_write_kernel, scale=scale, hpp=hpp,
                          quant=quant),
        grid_spec=grid_spec,
        out_shape=out_shape,
        input_output_aliases=aliases,
        interpret=interpret,
    )(pos_vec.astype(jnp.int32),
      jnp.asarray(layer_index, jnp.int32).reshape(1), *args)


@functools.partial(jax.jit, static_argnames=("scale", "hd", "interpret",
                                             "hpp"))
def decode_attention_fused_write(q, kv_new, kvc, pos_vec, scale: float,
                                 layer_index, hd: int | None = None,
                                 interpret: bool = False,
                                 hpp: int | None = None):
    """Fused KV-append + full-stripe decode attention over the STACKED cache:
    one pallas call per layer replaces (dynamic_update_slice + attention) —
    the dominant share of the decode step's per-launch residual (PERF.md r4
    reading #2: ~0.45 ms/tok over ~50 launches at llama-1b geometry).

    q: [B, KV, G, hd]; kv_new: [B, KV, hd+vhd] (this token's packed post-RoPE
    row); kvc: packed stacked [L, B, KV, S, hd+vhd] with S % 32 == 0. Returns
    (attn [B, KV, G, vhd] f32, kvc') where kvc' ALIASES kvc (XLA
    operand-output aliasing): row pos_vec[b] of layer `layer_index` holds
    kv_new cast to the cache dtype, everything else untouched — only the
    32-row tile containing the position is written back to HBM. The attention
    output includes the new position (row corrected in-register before the
    dots, so the result is bit-identical to write-then-attend). Reads the
    full physical stripe (slack rows cost ~1% of the step's weight bytes;
    positions past pos are masked), so parked-lane writes at slack rows are
    safe. bf16/f32 cache only (int8-KV uses the `decode_attention_fused_write_q`
    variant); long caches (>= SPLIT_THRESHOLD_BYTES) use
    `decode_attention_split_fused_write[_q]` — same fusion over S tiles."""
    b, kv, g, hd_q = q.shape
    hd = hd or hd_q
    width = kvc.shape[-1]
    s = kvc.shape[-2]
    q_pad = pack_q(q, width - hd)
    hpp = hpp or _pick_hpp(kv, s, width, kvc.dtype.itemsize)
    out, kvc2 = _fused_full_call(q_pad, kv_new, kvc, pos_vec, scale,
                                 layer_index, interpret=interpret, hpp=hpp)
    return out[..., hd:], kvc2


@functools.partial(jax.jit, static_argnames=("scale", "hd", "interpret",
                                             "hpp"))
def decode_attention_fused_write_q(q, kv_new, s_new, kvc, scale_rows, pos_vec,
                                   scale: float, layer_index,
                                   hd: int | None = None,
                                   interpret: bool = False,
                                   hpp: int | None = None):
    """Int8-KV fused KV-append + attention: replaces the packed int8 row +
    scale dynamic_update_slice ops plus the attention call with one pallas
    call per layer. kv_new int8 [B, KV, hd+vhd] and s_new f32 [B, KV, 2]
    come from ops/kv_quant.quantize_kv applied to K and V separately
    (quantized OUTSIDE so the numerics match the unfused path exactly);
    kvc int8 [L, B, KV, S, hd+vhd]; scale_rows f32 [L, B, KV, 2, S]. Returns
    (attn, kvc', scale') with the cache buffers aliased — the int8 tile
    writes back the 32-row tile containing pos, the scale rows write back
    whole [2, S] rows (trivial traffic, avoids dynamic LANE slicing which
    Mosaic does not support)."""
    b, kv, g, hd_q = q.shape
    hd = hd or hd_q
    width = kvc.shape[-1]
    s = kvc.shape[-2]
    q_pad = pack_q(q, width - hd)
    hpp = hpp or _pick_hpp(kv, s, width, kvc.dtype.itemsize)
    out, kvc2, sc2 = _fused_full_call(q_pad, kv_new, kvc, pos_vec, scale,
                                      layer_index, interpret=interpret,
                                      hpp=hpp, s_new=s_new,
                                      scale_rows=scale_rows)
    return out[..., hd:], kvc2, sc2


SPLIT_THRESHOLD_BYTES = 16384  # S * itemsize: full-stripe VMEM (packed K+V,
_SPLIT_TILE = 1024             # double-buffered) hits the 16M scoped limit
                               # past this (bf16 S=8192 measured at 16.01M)


def _pick_tile(s: int) -> int:
    # largest power-of-two tile that divides S (the full kernel VMEM-OOMs
    # past ~8k, so prefer split whenever a legal tiling exists)
    tile = _SPLIT_TILE
    while tile >= 128 and s % tile != 0:
        tile //= 2
    return tile


def decode_attention_auto(q, kvc, pos_vec, scale: float, scale_rows=None,
                          s_limit: int | None = None, layer_index=None,
                          hd: int | None = None):
    """s_limit: logical cache length — the full-stripe kernels read only the
    first round8(s_limit) rows (physical write-slack rows are never attended;
    the split kernels already clamp their DMA to the current position)."""
    interpret = jax.default_backend() != "tpu"
    s = kvc.shape[-2]
    quantized = scale_rows is not None
    split = s * kvc.dtype.itemsize >= SPLIT_THRESHOLD_BYTES
    if split:
        tile = _pick_tile(s)
        if tile >= 128:
            if quantized:
                return decode_attention_split_q(q, kvc, scale_rows, pos_vec,
                                                scale, hd=hd, s_tile=tile,
                                                interpret=interpret,
                                                layer_index=layer_index)
            return decode_attention_split(q, kvc, pos_vec, scale, hd=hd,
                                          s_tile=tile, interpret=interpret,
                                          layer_index=layer_index)
    s_use = min(s, -(-s_limit // 8) * 8) if s_limit else None
    if quantized:
        return decode_attention_q(q, kvc, scale_rows, pos_vec, scale, hd=hd,
                                  interpret=interpret, s_use=s_use,
                                  layer_index=layer_index)
    return decode_attention(q, kvc, pos_vec, scale, hd=hd,
                            interpret=interpret, s_use=s_use,
                            layer_index=layer_index)
