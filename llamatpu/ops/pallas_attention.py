"""Pallas decode attention over the HBM-resident KV cache.

TPU-native analog of the reference's decode attention kernels
(processHeadsFlashAttention / processHeadsParallel / splitKV variants,
TransformerComputeKernelsLayered.java:784-1433): one program per (batch, head
group) computes the GQA group's scores against the cache stripe in VMEM with
f32 masked softmax, keeping the [G, S] score matrix out of HBM entirely.

Kernels:

- `decode_attention`: one program per (batch, hpp kv heads) over the FULL
  cache stripe in VMEM. Simplest + fastest for short caches. `hpp` heads per
  program amortize grid overhead for MHA models (Phi-3: 32 kv heads, G=1).
- `decode_attention_split`: the reference's splitKV analog re-designed for TPU
  — the stripe is tiled along S with an online-softmax accumulator carried in
  VMEM scratch across the sequential tile grid. The K/V block index maps are
  CLAMPED to the tile containing `pos` (scalar-prefetch): tiles past the
  current length re-request the same block, which Pallas recognises as a
  revisit and skips the DMA — decode HBM traffic scales with the ACTUAL
  sequence length. Compute for those tiles is skipped with pl.when.
- `decode_attention_paged`: block-table DMA over the shared paged pool
  (runtime/paged_cache.py) — grid steps fetch pool blocks through the lane's
  table via scalar prefetch; no dense per-lane gather is ever materialized.

STACKED-CACHE MODE (`layer_index=...`): the forward pass scans layers with the
whole [L, ...] cache as the scan CARRY (position-only writes — passing per-
layer slices through scan xs/ys makes XLA copy the ENTIRE cache every step:
26 ms vs 2 ms per decode step at Phi-3 geometry, measured on chip). In this
mode kc/vc keep their leading L axis and the kernels' index maps prepend the
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


def _attend_one(q, k, v, pos, scale, start=0, ks=None, vs=None):
    """One head group's masked-softmax attention. q [G, hd]; k [S, hd];
    v [S, vhd]; optional int8-KV scale rows ks/vs [1, S] fold into the dots
    (ops/kv_quant.py). Returns [G, vhd] f32."""
    q = q.astype(jnp.float32)
    k = k.astype(jnp.float32)
    v = v.astype(jnp.float32)
    scores = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
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
        att, v, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


_HPP_VMEM_BUDGET = 4 << 20  # K+V bytes per program (double-buffered by Pallas)


def _pick_hpp(kv: int, s: int, hd: int, vhd: int, itemsize: int) -> int:
    """Heads per program: largest divisor of kv whose K+V block fits the VMEM
    budget. 1 for GQA models with few kv heads / long caches; up to 8 for MHA."""
    per_head = s * (hd + vhd) * itemsize
    hpp = max(1, min(8, _HPP_VMEM_BUDGET // max(per_head, 1)))
    while kv % hpp:
        hpp -= 1
    return hpp


# ---------------------------------------------------------------------------
# full-stripe kernels (optionally int8, optionally stacked-cache)
# ---------------------------------------------------------------------------

def _full_kernel(pos_pref, *refs, scale, hpp, stacked, quant):
    # refs: [li_pref?] q k v [ks vs]? o  (prefetch refs lead; see callers)
    if stacked:
        refs = refs[1:]  # li feeds the index maps only
    if quant:
        q_ref, k_ref, v_ref, ks_ref, vs_ref, o_ref = refs
    else:
        q_ref, k_ref, v_ref, o_ref = refs
        ks_ref = vs_ref = None
    pos = pos_pref[pl.program_id(0)]
    kv_ix = (0, 0) if stacked else (0,)  # cache blocks carry a leading L=1 dim
    for i in range(hpp):
        ks = ks_ref[kv_ix + (i, 0)][None, :] if quant else None
        vs = vs_ref[kv_ix + (i, 0)][None, :] if quant else None
        o_ref[0, i] = _attend_one(q_ref[0, i], k_ref[kv_ix + (i,)],
                                  v_ref[kv_ix + (i,)], pos, scale,
                                  ks=ks, vs=vs)


def _full_call(q, kc, vc, pos_vec, scale, *, s, hpp, interpret, layer_index,
               k_scale=None, v_scale=None):
    b, kv, g, hd = q.shape
    vhd = vc.shape[-1]
    quant = k_scale is not None
    stacked = layer_index is not None
    npf = 2 if stacked else 1

    def q_map(bi, hi, *pref):
        return (bi, hi, 0, 0)

    if stacked:
        def kv_map(bi, hi, pp, li):
            return (li[0], bi, hi, 0, 0)

        def sc_map(bi, hi, pp, li):
            return (li[0], bi, hi, 0, 0)

        kb = (1, 1, hpp, s, hd)
        vb = (1, 1, hpp, s, vhd)
        sb = (1, 1, hpp, 1, s)
    else:
        def kv_map(bi, hi, pp):
            return (bi, hi, 0, 0)

        def sc_map(bi, hi, pp):
            return (bi, hi, 0, 0)

        kb = (1, hpp, s, hd)
        vb = (1, hpp, s, vhd)
        sb = (1, hpp, 1, s)

    in_specs = [pl.BlockSpec((1, hpp, g, hd), q_map),
                pl.BlockSpec(kb, kv_map), pl.BlockSpec(vb, kv_map)]
    args = [q, kc, vc]
    if quant:
        in_specs += [pl.BlockSpec(sb, sc_map)] * 2
        args += [k_scale, v_scale]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=npf,
        grid=(b, kv // hpp),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, hpp, g, vhd), q_map),
    )
    pref = (pos_vec.astype(jnp.int32),)
    if stacked:
        pref += (jnp.asarray(layer_index, jnp.int32).reshape(1),)
    return pl.pallas_call(
        functools.partial(_full_kernel, scale=scale, hpp=hpp, stacked=stacked,
                          quant=quant),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, kv, g, vhd), jnp.float32),
        interpret=interpret,
    )(*pref, *args)


@functools.partial(jax.jit, static_argnames=("scale", "interpret", "s_use", "hpp"))
def decode_attention(q, kc, vc, pos_vec, scale: float, interpret: bool = False,
                     s_use: int | None = None, hpp: int | None = None,
                     layer_index=None):
    """q: [B, KV, G, hd]; kc/vc: [B, KV, S, hd|vhd] head-major (or
    [L, B, KV, S, ...] with layer_index); pos_vec: [B] (keys s <= pos are
    valid). Returns [B, KV, G, vhd] f32. s_use: read only the first s_use
    cache rows (the physical cache allocates write-slack rows past the logical
    length that no query ever attends)."""
    b, kv, g, hd = q.shape
    s = s_use or kc.shape[-2]
    hpp = hpp or _pick_hpp(kv, s, hd, vc.shape[-1], kc.dtype.itemsize)
    return _full_call(q, kc, vc, pos_vec, scale, s=s, hpp=hpp,
                      interpret=interpret, layer_index=layer_index)


@functools.partial(jax.jit, static_argnames=("scale", "interpret", "s_use", "hpp"))
def decode_attention_q(q, kc, vc, k_scale, v_scale, pos_vec, scale: float,
                       interpret: bool = False, s_use: int | None = None,
                       hpp: int | None = None, layer_index=None):
    """Int8-KV decode attention. kc/vc int8 [(L,) B, KV, S, hd];
    k_scale/v_scale f32 [(L,) B, KV, 1, S]; otherwise as decode_attention."""
    b, kv, g, hd = q.shape
    s = s_use or kc.shape[-2]
    hpp = hpp or _pick_hpp(kv, s, hd, vc.shape[-1], kc.dtype.itemsize)
    return _full_call(q, kc, vc, pos_vec, scale, s=s, hpp=hpp,
                      interpret=interpret, layer_index=layer_index,
                      k_scale=k_scale, v_scale=v_scale)


# ---------------------------------------------------------------------------
# splitKV kernels: online softmax over S tiles, DMA clamped to pos
# ---------------------------------------------------------------------------

def _split_kernel(pos_pref, *refs, scale, s_tile, stacked, quant, hpp=1,
                  fused=False, shift=0):
    # hpp kv heads per program share one grid walk over the S tiles; each
    # head's online-softmax state lives in its row band of the shared scratch.
    # fused mode (long-cache analog of _fused_write_kernel): kn/vn carry this
    # token's post-RoPE K/V — the stale cache row is corrected in-register
    # before the dots and only the 32-row tile containing pos (plus, in quant
    # mode, the visited scale tiles) is written back through aliased outputs.
    if stacked:
        refs = refs[1:]
    kn_ref = vn_ref = ksn_ref = vsn_ref = ko_ref = vo_ref = None
    kso_ref = vso_ref = None
    if fused and quant:
        (q_ref, kn_ref, vn_ref, ksn_ref, vsn_ref, k_ref, v_ref, ks_ref,
         vs_ref, o_ref, ko_ref, vo_ref, kso_ref, vso_ref,
         m_ref, l_ref, acc_ref) = refs
    elif fused:
        (q_ref, kn_ref, vn_ref, k_ref, v_ref, o_ref, ko_ref, vo_ref,
         m_ref, l_ref, acc_ref) = refs
        ks_ref = vs_ref = None
    elif quant:
        q_ref, k_ref, v_ref, ks_ref, vs_ref, o_ref, m_ref, l_ref, acc_ref = refs
    else:
        q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref = refs
        ks_ref = vs_ref = None
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
            k = k_ref[kv_ix + (i,)]
            v = v_ref[kv_ix + (i,)]
            if fused:
                # replace the stale row `pos` in-register (true only in the
                # tile that contains it): the dots see exactly what the
                # unfused write-then-attend path reads back from the cache
                rel = jax.lax.broadcasted_iota(jnp.int32, (s_tile, 1), 0) + start
                kn = kn_ref[0, i, 0]
                vn = vn_ref[0, i, 0]
                k = jnp.where(rel == pos, kn[None, :].astype(k.dtype), k)
                v = jnp.where(rel == pos, vn[None, :].astype(v.dtype), v)
            k = k.astype(jnp.float32)
            v = v.astype(jnp.float32)
            if quant:
                ks_row = ks_ref[kv_ix + (i, 0)]  # [s_tile]
                vs_row = vs_ref[kv_ix + (i, 0)]
                if fused:
                    col = jax.lax.broadcasted_iota(
                        jnp.int32, (1, s_tile), 1) + start
                    ks_row = jnp.where(col == pos, ksn_ref[0, i, 0, 0],
                                       ks_row[None, :])[0]
                    vs_row = jnp.where(col == pos, vsn_ref[0, i, 0, 0],
                                       vs_row[None, :])[0]
                    # scale rows flush per visited tile (clamped out map)
                    kso_ref[0, 0, i] = ks_row[None, :]
                    vso_ref[0, 0, i] = vs_row[None, :]
            scores = jax.lax.dot_general(
                q, k, dimension_numbers=(((1,), (1,)), ((), ())),
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
                ev, v, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            m_ref[band] = jnp.broadcast_to(m_new, (g, m_ref.shape[1]))
            l_ref[band] = jnp.broadcast_to(l_new, (g, l_ref.shape[1]))

    if fused:
        # write-back: this grid step owns the 32-row tile containing pos; the
        # ko/vo out blocks' index maps are constant per (bi, hi) program, so
        # the buffer written here flushes once at program end
        @pl.when(ti == (pos >> shift))
        def _writeback():
            t0 = pl.multiple_of(((pos >> 5) << 5) - start, _WTILE)
            rel32 = (jax.lax.broadcasted_iota(jnp.int32, (_WTILE, 1), 0)
                     + start + t0)
            for i in range(hpp):
                kn = kn_ref[0, i, 0]
                vn = vn_ref[0, i, 0]
                k_tile = k_ref[kv_ix + (i, pl.ds(t0, _WTILE))]
                v_tile = v_ref[kv_ix + (i, pl.ds(t0, _WTILE))]
                ko_ref[0, 0, i] = jnp.where(
                    rel32 == pos, kn[None, :].astype(k_tile.dtype), k_tile)
                vo_ref[0, 0, i] = jnp.where(
                    rel32 == pos, vn[None, :].astype(v_tile.dtype), v_tile)

    @pl.when(ti == nt - 1)
    def _finalize():
        for i in range(hpp):
            band = slice(i * g, (i + 1) * g)
            l = jnp.max(l_ref[band], axis=1, keepdims=True)  # >= 1 term
            o_ref[0, i] = acc_ref[band] / l


def _split_call(q, kc, vc, pos_vec, scale, *, s_tile, interpret, layer_index,
                k_scale=None, v_scale=None, hpp=1):
    b, kv, g, hd = q.shape
    s = kc.shape[-2]
    vhd = vc.shape[-1]
    quant = k_scale is not None
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

        kb = (1, 1, hpp, s_tile, hd)
        vb = (1, 1, hpp, s_tile, vhd)
        sb = (1, 1, hpp, 1, s_tile)
    else:
        def kv_map(bi, hi, ti, pp):
            return (bi, hi, jnp.minimum(ti, pp[bi] >> shift), 0)

        def sc_map(bi, hi, ti, pp):
            return (bi, hi, 0, jnp.minimum(ti, pp[bi] >> shift))

        kb = (1, hpp, s_tile, hd)
        vb = (1, hpp, s_tile, vhd)
        sb = (1, hpp, 1, s_tile)

    in_specs = [pl.BlockSpec((1, hpp, g, hd), q_map),
                pl.BlockSpec(kb, kv_map), pl.BlockSpec(vb, kv_map)]
    args = [q, kc, vc]
    if quant:
        in_specs += [pl.BlockSpec(sb, sc_map)] * 2
        args += [k_scale, v_scale]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=npf,
        grid=(b, kv // hpp, nt),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, hpp, g, vhd), q_map),
        scratch_shapes=[
            pltpu.VMEM((hpp * g, 128), jnp.float32),
            pltpu.VMEM((hpp * g, 128), jnp.float32),
            pltpu.VMEM((hpp * g, vhd), jnp.float32),
        ],
    )
    pref = (pos_vec.astype(jnp.int32),)
    if stacked:
        pref += (jnp.asarray(layer_index, jnp.int32).reshape(1),)
    return pl.pallas_call(
        functools.partial(_split_kernel, scale=scale, s_tile=s_tile,
                          stacked=stacked, quant=quant, hpp=hpp),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, kv, g, vhd), jnp.float32),
        interpret=interpret,
    )(*pref, *args)


@functools.partial(jax.jit, static_argnames=("scale", "s_tile", "interpret", "hpp"))
def decode_attention_split(q, kc, vc, pos_vec, scale: float,
                           s_tile: int = 1024, interpret: bool = False,
                           layer_index=None, hpp: int | None = None):
    """KV-tiled online-softmax decode attention (splitKV analog). Same
    signature/semantics as `decode_attention`; requires S % s_tile == 0 and
    s_tile a power of two (`//` lowers to a ~20x software divide on TPU)."""
    kv = q.shape[1]
    hpp = hpp or _pick_hpp(kv, s_tile, q.shape[3], vc.shape[-1], kc.dtype.itemsize)
    return _split_call(q, kc, vc, pos_vec, scale, s_tile=s_tile,
                       interpret=interpret, layer_index=layer_index, hpp=hpp)


@functools.partial(jax.jit, static_argnames=("scale", "s_tile", "interpret", "hpp"))
def decode_attention_split_q(q, kc, vc, k_scale, v_scale, pos_vec, scale: float,
                             s_tile: int = 1024, interpret: bool = False,
                             layer_index=None, hpp: int | None = None):
    """Int8-KV KV-tiled decode attention with the same DMA-clamped block maps
    as `decode_attention_split`."""
    kv = q.shape[1]
    hpp = hpp or _pick_hpp(kv, s_tile, q.shape[3], vc.shape[-1], kc.dtype.itemsize)
    return _split_call(q, kc, vc, pos_vec, scale, s_tile=s_tile,
                       interpret=interpret, layer_index=layer_index,
                       k_scale=k_scale, v_scale=v_scale, hpp=hpp)


def _split_fused_call(q, k_new, v_new, kc, vc, pos_vec, scale, layer_index, *,
                      s_tile, interpret, hpp, ks_new=None, vs_new=None,
                      k_scale=None, v_scale=None):
    """Shared wrapper for the fused-append split kernels (stacked cache only).
    Returns (attn, kc', vc'[, ks', vs']) with the cache buffers aliased."""
    b, kv, g, hd = q.shape
    s = kc.shape[-2]
    vhd = vc.shape[-1]
    quant = k_scale is not None
    assert s % s_tile == 0 and s % _WTILE == 0, (s, s_tile)
    assert s_tile & (s_tile - 1) == 0, s_tile
    shift = s_tile.bit_length() - 1
    nt = s // s_tile
    k_new = k_new[:, :, None, :]
    v_new = v_new[:, :, None, :]
    if quant:
        ks_new = ks_new[:, :, None, None].astype(jnp.float32)
        vs_new = vs_new[:, :, None, None].astype(jnp.float32)

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

    in_specs = [pl.BlockSpec((1, hpp, g, hd), q_map),
                pl.BlockSpec((1, hpp, 1, hd), new_map),
                pl.BlockSpec((1, hpp, 1, vhd), new_map)]
    args = [q, k_new, v_new]
    if quant:
        in_specs += [pl.BlockSpec((1, hpp, 1, 1), new_map)] * 2
        args += [ks_new, vs_new]
    in_specs += [pl.BlockSpec((1, 1, hpp, s_tile, hd), kv_map),
                 pl.BlockSpec((1, 1, hpp, s_tile, vhd), kv_map)]
    args += [kc, vc]
    out_specs = [pl.BlockSpec((1, hpp, g, vhd), q_map),
                 pl.BlockSpec((1, 1, hpp, _WTILE, hd), tile_map),
                 pl.BlockSpec((1, 1, hpp, _WTILE, vhd), tile_map)]
    out_shape = [jax.ShapeDtypeStruct((b, kv, g, vhd), jnp.float32),
                 jax.ShapeDtypeStruct(kc.shape, kc.dtype),
                 jax.ShapeDtypeStruct(vc.shape, vc.dtype)]
    if quant:
        in_specs += [pl.BlockSpec((1, 1, hpp, 1, s_tile), sc_map)] * 2
        args += [k_scale, v_scale]
        out_specs += [pl.BlockSpec((1, 1, hpp, 1, s_tile), sc_map)] * 2
        out_shape += [jax.ShapeDtypeStruct(k_scale.shape, k_scale.dtype),
                      jax.ShapeDtypeStruct(v_scale.shape, v_scale.dtype)]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, kv // hpp, nt),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((hpp * g, 128), jnp.float32),
            pltpu.VMEM((hpp * g, 128), jnp.float32),
            pltpu.VMEM((hpp * g, vhd), jnp.float32),
        ],
    )
    # operand indices incl. scalar prefetch — bf16: pos=0 li=1 q=2 kn=3 vn=4
    # kc=5 vc=6; quant: ... ksn=5 vsn=6 kc=7 vc=8 ks=9 vs=10
    aliases = ({7: 1, 8: 2, 9: 3, 10: 4} if quant else {5: 1, 6: 2})
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


@functools.partial(jax.jit, static_argnames=("scale", "s_tile", "interpret",
                                             "hpp"))
def decode_attention_split_fused_write(q, k_new, v_new, kc, vc, pos_vec,
                                       scale: float, layer_index,
                                       s_tile: int = 1024,
                                       interpret: bool = False,
                                       hpp: int | None = None):
    """Fused KV-append + splitKV decode attention over the STACKED cache —
    the long-context analog of `decode_attention_fused_write`. At 16k+
    positions the unfused path's two dynamic_update_slice thunks per layer
    dominate the decode step (61 ms/step of writes measured at depth 16384 on
    chip, r4c longctx probe — XLA materializes cache copies); here the append
    rides the attention kernel's aliased output: only the 32-row tile
    containing pos (per kv head) returns to HBM.

    Same numerics as write-then-attend with `decode_attention_split` (the
    stale row is corrected in-register before the dots). kc/vc stacked
    [L, B, KV, S, hd|vhd], S % s_tile == 0, s_tile a power of two >= 32.
    Returns (attn [B, KV, G, vhd] f32, kc', vc') with kc'/vc' aliasing kc/vc.
    Reference analog: splitKV + combine
    (TransformerComputeKernelsLayered.java:1245-1433) — which still writes KV
    through a separate copyToCache kernel; this fuses both."""
    kv = q.shape[1]
    hpp = hpp or _pick_hpp(kv, s_tile, q.shape[3], vc.shape[-1],
                           kc.dtype.itemsize)
    return _split_fused_call(q, k_new, v_new, kc, vc, pos_vec, scale,
                             layer_index, s_tile=s_tile, interpret=interpret,
                             hpp=hpp)


@functools.partial(jax.jit, static_argnames=("scale", "s_tile", "interpret",
                                             "hpp"))
def decode_attention_split_fused_write_q(q, kq_new, vq_new, ks_new, vs_new,
                                         kc, vc, k_scale, v_scale, pos_vec,
                                         scale: float, layer_index,
                                         s_tile: int = 1024,
                                         interpret: bool = False,
                                         hpp: int | None = None):
    """Int8-KV fused KV-append + splitKV attention: replaces FOUR
    dynamic_update_slice thunks per layer plus the attention call. Inputs as
    `decode_attention_fused_write_q` but over the tiled long-cache path; the
    int8 K/V write-back is the 32-row tile containing pos, the [1, s_tile]
    scale tiles are rewritten per visited tile (trivial traffic; Mosaic has
    no dynamic lane slicing). Returns (attn, kc', vc', ks', vs') aliased."""
    kv = q.shape[1]
    hpp = hpp or _pick_hpp(kv, s_tile, q.shape[3], vc.shape[-1],
                           kc.dtype.itemsize)
    return _split_fused_call(q, kq_new, vq_new, kc, vc, pos_vec, scale,
                             layer_index, s_tile=s_tile, interpret=interpret,
                             hpp=hpp, ks_new=ks_new, vs_new=vs_new,
                             k_scale=k_scale, v_scale=v_scale)


# ---------------------------------------------------------------------------
# paged kernel: block-table DMA over the shared pool
# ---------------------------------------------------------------------------

def _paged_kernel(tables_pref, pos_pref, *refs, scale, s_tile, stacked, quant,
                  hpp=1):
    del tables_pref  # feeds the index maps only
    _split_kernel(pos_pref, *refs, scale=scale, s_tile=s_tile,
                  stacked=stacked, quant=quant, hpp=hpp)


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def decode_attention_paged(q, k_pool, v_pool, tables, pos_vec, scale: float,
                           k_scale=None, v_scale=None, interpret: bool = False,
                           layer_index=None):
    """Block-table DMA paged decode attention: the kernel reads KV straight
    from the shared block pool — no dense per-lane gather materialized in HBM
    (runtime/paged_cache.paged_gather copies the lane's whole KV stripe per
    layer per step; this kernel's HBM traffic is exactly the live blocks).

    q: [B, KV, G, hd]; k_pool/v_pool: [NBLK, KV, BS, hd] (one layer) or
    [L, NBLK, KV, BS, hd] with layer_index; tables: [B, MAXBLK] int32;
    pos_vec: [B]. Int8 pools pass k_scale/v_scale [( L,) NBLK, KV, 1, BS].
    Returns [B, KV, G, vhd] f32.

    Grid (B, KV, MAXBLK): the pool-block index map routes grid step (b, h, j)
    to physical block tables[b, min(j, pos_b//BS)] via scalar prefetch — tiles
    past the current length revisit the previous block so Pallas skips their
    DMA (reads scale with the ACTUAL sequence length), and their compute is
    skipped with pl.when. The reference's paged analog doesn't exist (its KV
    is a flat preallocated array, State.java:44-45); vLLM's paged_attention
    kernel is the conceptual ancestor."""
    b, kv, g, hd = q.shape
    stacked = layer_index is not None
    bs = k_pool.shape[-2]
    vhd = v_pool.shape[-1]
    maxblk = tables.shape[1]
    quant = k_scale is not None
    assert bs & (bs - 1) == 0, bs  # clamp uses a shift, not a divide
    shift = bs.bit_length() - 1
    npf = 3 if stacked else 2
    hpp = _pick_hpp(kv, bs, hd, vhd, k_pool.dtype.itemsize)

    def q_map(bi, hi, ti, *pref):
        return (bi, hi, 0, 0)

    if stacked:
        def kv_map(bi, hi, ti, tp, pp, li):
            lj = jnp.minimum(ti, pp[bi] >> shift)
            return (li[0], tp[bi, lj], hi, 0, 0)

        kb = (1, 1, hpp, bs, hd)
        vb = (1, 1, hpp, bs, vhd)
        sb = (1, 1, hpp, 1, bs)
    else:
        def kv_map(bi, hi, ti, tp, pp):
            lj = jnp.minimum(ti, pp[bi] >> shift)
            return (tp[bi, lj], hi, 0, 0)

        kb = (1, hpp, bs, hd)
        vb = (1, hpp, bs, vhd)
        sb = (1, hpp, 1, bs)

    in_specs = [pl.BlockSpec((1, hpp, g, hd), q_map),
                pl.BlockSpec(kb, kv_map), pl.BlockSpec(vb, kv_map)]
    args = [q, k_pool, v_pool]
    if quant:
        in_specs += [pl.BlockSpec(sb, kv_map)] * 2
        args += [k_scale, v_scale]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=npf,
        grid=(b, kv // hpp, maxblk),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, hpp, g, vhd), q_map),
        scratch_shapes=[
            pltpu.VMEM((hpp * g, 128), jnp.float32),
            pltpu.VMEM((hpp * g, 128), jnp.float32),
            pltpu.VMEM((hpp * g, vhd), jnp.float32),
        ],
    )
    pref = (tables.astype(jnp.int32), pos_vec.astype(jnp.int32))
    if stacked:
        pref += (jnp.asarray(layer_index, jnp.int32).reshape(1),)
    return pl.pallas_call(
        functools.partial(_paged_kernel, scale=scale, s_tile=bs,
                          stacked=stacked, quant=quant, hpp=hpp),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, kv, g, vhd), jnp.float32),
        interpret=interpret,
    )(*pref, *args)


# ---------------------------------------------------------------------------
# fused KV-append + attention (megakernel v3 step 1): the decode step's
# per-layer cache writes ride the attention kernel instead of standalone
# dynamic_update_slice ops
# ---------------------------------------------------------------------------

_WTILE = 32  # write-back tile rows: a multiple of every dtype's sublane
             # granule (f32 8 / bf16 16 / int8 32), so the tile block is
             # always Mosaic-legal


def _fused_write_kernel(pos_pref, li_pref, *refs, scale, hpp, quant):
    # refs: q k_new v_new [ks_new vs_new] k v [ks vs] | o k_tile v_tile
    #       [ks_row vs_row]
    del li_pref  # feeds the index maps only
    if quant:
        (q_ref, kn_ref, vn_ref, ksn_ref, vsn_ref, k_ref, v_ref, ks_ref,
         vs_ref, o_ref, ko_ref, vo_ref, kso_ref, vso_ref) = refs
    else:
        q_ref, kn_ref, vn_ref, k_ref, v_ref, o_ref, ko_ref, vo_ref = refs
    bi = pl.program_id(0)
    pos = pos_pref[bi]
    # start row of the _WTILE-row tile containing pos; multiple_of lets
    # Mosaic prove the dynamic sublane slice below is 8-aligned (it rejects
    # the load otherwise: "cannot statically prove that index in dimension 3
    # is a multiple of 8", found on chip)
    t0 = pl.multiple_of((pos >> 5) << 5, _WTILE)
    s = k_ref.shape[3]
    for i in range(hpp):
        kn = kn_ref[0, i, 0]  # [hd]   (post-rope new key; int8 in quant mode)
        vn = vn_ref[0, i, 0]  # [vhd]
        k = k_ref[0, 0, i]
        v = v_ref[0, 0, i]
        # replace the stale row `pos` in-register: the attention dots then see
        # exactly what the unfused write-then-attend path reads back from the
        # cache (same cast, same operands -> bit-identical output)
        row = jax.lax.broadcasted_iota(jnp.int32, (s, 1), 0)
        k_corr = jnp.where(row == pos, kn[None, :].astype(k.dtype), k)
        v_corr = jnp.where(row == pos, vn[None, :].astype(v.dtype), v)
        ks = vs = None
        if quant:  # correct + write back the [1, S] scale rows wholesale
            col = jax.lax.broadcasted_iota(jnp.int32, (1, s), 1)
            ks = jnp.where(col == pos, ksn_ref[0, i, 0, 0], ks_ref[0, 0, i])
            vs = jnp.where(col == pos, vsn_ref[0, i, 0, 0], vs_ref[0, 0, i])
            kso_ref[0, 0, i] = ks
            vso_ref[0, 0, i] = vs
        o_ref[0, i] = _attend_one(q_ref[0, i], k_corr, v_corr, pos, scale,
                                  ks=ks, vs=vs)
        # write-back: only the 32-row tile containing `pos` returns to HBM
        # (the out block's index map points at it); all other rows of the
        # aliased cache buffer are untouched
        rel = jax.lax.broadcasted_iota(jnp.int32, (_WTILE, 1), 0) + t0
        k_tile = k_ref[0, 0, i, pl.ds(t0, _WTILE), :]
        v_tile = v_ref[0, 0, i, pl.ds(t0, _WTILE), :]
        ko_ref[0, 0, i] = jnp.where(rel == pos, kn[None, :].astype(k.dtype),
                                    k_tile)
        vo_ref[0, 0, i] = jnp.where(rel == pos, vn[None, :].astype(v.dtype),
                                    v_tile)


@functools.partial(jax.jit, static_argnames=("scale", "interpret", "hpp"))
def decode_attention_fused_write(q, k_new, v_new, kc, vc, pos_vec,
                                 scale: float, layer_index,
                                 interpret: bool = False,
                                 hpp: int | None = None):
    """Fused KV-append + full-stripe decode attention over the STACKED cache:
    one pallas call per layer replaces (2x dynamic_update_slice + attention) —
    three XLA thunks -> one, the dominant share of the decode step's
    per-launch residual (PERF.md r4 reading #2: ~0.45 ms/tok over ~50
    launches at llama-1b geometry).

    q: [B, KV, G, hd]; k_new/v_new: [B, KV, hd|vhd] (this token's post-RoPE
    K/V); kc/vc: stacked [L, B, KV, S, hd|vhd] with S % 32 == 0. Returns
    (attn [B, KV, G, vhd] f32, kc', vc') where kc'/vc' ALIAS kc/vc (XLA
    operand-output aliasing): row pos_vec[b] of layer `layer_index` holds
    k_new/v_new cast to the cache dtype, everything else untouched — only the
    32-row tile containing the position is written back to HBM. The attention
    output includes the new position (row corrected in-register before the
    dots, so the result is bit-identical to write-then-attend). Reads the
    full physical stripe (slack rows cost ~1% of the step's weight bytes;
    positions past pos are masked), so parked-lane writes at slack rows are
    safe. bf16/f32 cache only (int8-KV uses the `decode_attention_fused_write_q`
    variant); long caches (>= SPLIT_THRESHOLD_BYTES) use
    `decode_attention_split_fused_write[_q]` — same fusion over S tiles."""
    b, kv, g, hd = q.shape
    s, vhd = kc.shape[-2], vc.shape[-1]
    assert s % _WTILE == 0, s
    hpp = hpp or _pick_hpp(kv, s, hd, vhd, kc.dtype.itemsize)
    # [B, KV, 1, hd] so the block's last-two dims are (1, hd) — a (hpp, hd)
    # block of a 3-D [B, KV, hd] array violates Mosaic's sublane rule
    # (CLAUDE.md: ship per-head vectors with a singleton sublane dim)
    k_new = k_new[:, :, None, :]
    v_new = v_new[:, :, None, :]

    def q_map(bi, hi, pp, li):
        return (bi, hi, 0, 0)

    def new_map(bi, hi, pp, li):
        return (bi, hi, 0, 0)

    def kv_map(bi, hi, pp, li):
        return (li[0], bi, hi, 0, 0)

    def tile_map(bi, hi, pp, li):
        return (li[0], bi, hi, pp[bi] >> 5, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, kv // hpp),
        in_specs=[pl.BlockSpec((1, hpp, g, hd), q_map),
                  pl.BlockSpec((1, hpp, 1, hd), new_map),
                  pl.BlockSpec((1, hpp, 1, vhd), new_map),
                  pl.BlockSpec((1, 1, hpp, s, hd), kv_map),
                  pl.BlockSpec((1, 1, hpp, s, vhd), kv_map)],
        out_specs=[pl.BlockSpec((1, hpp, g, vhd), q_map),
                   pl.BlockSpec((1, 1, hpp, _WTILE, hd), tile_map),
                   pl.BlockSpec((1, 1, hpp, _WTILE, vhd), tile_map)],
    )
    # operand indices include the scalar-prefetch args: pos=0 li=1 q=2 kn=3
    # vn=4 kc=5 vc=6 -> outputs (attn=0, kc'=1, vc'=2)
    return pl.pallas_call(
        functools.partial(_fused_write_kernel, scale=scale, hpp=hpp,
                          quant=False),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((b, kv, g, vhd), jnp.float32),
                   jax.ShapeDtypeStruct(kc.shape, kc.dtype),
                   jax.ShapeDtypeStruct(vc.shape, vc.dtype)],
        input_output_aliases={5: 1, 6: 2},
        interpret=interpret,
    )(pos_vec.astype(jnp.int32),
      jnp.asarray(layer_index, jnp.int32).reshape(1),
      q, k_new, v_new, kc, vc)


@functools.partial(jax.jit, static_argnames=("scale", "interpret", "hpp"))
def decode_attention_fused_write_q(q, kq_new, vq_new, ks_new, vs_new,
                                   kc, vc, k_scale, v_scale, pos_vec,
                                   scale: float, layer_index,
                                   interpret: bool = False,
                                   hpp: int | None = None):
    """Int8-KV fused KV-append + attention: replaces FOUR
    dynamic_update_slice ops (int8 K/V rows + two scale entries) plus the
    attention call with one pallas call per layer. kq_new/vq_new int8
    [B, KV, hd|vhd] and ks_new/vs_new f32 [B, KV] come from
    ops/kv_quant.quantize_kv (quantized OUTSIDE so the numerics match the
    unfused path exactly); kc/vc int8 [L, B, KV, S, *];
    k_scale/v_scale f32 [L, B, KV, 1, S]. Returns (attn, kc', vc', ks', vs')
    with all four cache buffers aliased — the int8 tiles write back the
    32-row tile containing pos, the scale rows write back whole [1, S] rows
    (S f32 per head, trivial traffic, avoids dynamic LANE slicing which
    Mosaic does not support)."""
    b, kv, g, hd = q.shape
    s, vhd = kc.shape[-2], vc.shape[-1]
    assert s % _WTILE == 0, s
    hpp = hpp or _pick_hpp(kv, s, hd, vhd, kc.dtype.itemsize)
    kq_new = kq_new[:, :, None, :]
    vq_new = vq_new[:, :, None, :]
    ks_new = ks_new[:, :, None, None].astype(jnp.float32)
    vs_new = vs_new[:, :, None, None].astype(jnp.float32)

    def q_map(bi, hi, pp, li):
        return (bi, hi, 0, 0)

    def new_map(bi, hi, pp, li):
        return (bi, hi, 0, 0)

    def kv_map(bi, hi, pp, li):
        return (li[0], bi, hi, 0, 0)

    def tile_map(bi, hi, pp, li):
        return (li[0], bi, hi, pp[bi] >> 5, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, kv // hpp),
        in_specs=[pl.BlockSpec((1, hpp, g, hd), q_map),
                  pl.BlockSpec((1, hpp, 1, hd), new_map),
                  pl.BlockSpec((1, hpp, 1, vhd), new_map),
                  pl.BlockSpec((1, hpp, 1, 1), new_map),
                  pl.BlockSpec((1, hpp, 1, 1), new_map),
                  pl.BlockSpec((1, 1, hpp, s, hd), kv_map),
                  pl.BlockSpec((1, 1, hpp, s, vhd), kv_map),
                  pl.BlockSpec((1, 1, hpp, 1, s), kv_map),
                  pl.BlockSpec((1, 1, hpp, 1, s), kv_map)],
        out_specs=[pl.BlockSpec((1, hpp, g, vhd), q_map),
                   pl.BlockSpec((1, 1, hpp, _WTILE, hd), tile_map),
                   pl.BlockSpec((1, 1, hpp, _WTILE, vhd), tile_map),
                   pl.BlockSpec((1, 1, hpp, 1, s), kv_map),
                   pl.BlockSpec((1, 1, hpp, 1, s), kv_map)],
    )
    # operands: pos=0 li=1 q=2 kqn=3 vqn=4 ksn=5 vsn=6 kc=7 vc=8 ks=9 vs=10
    # -> outputs (attn=0, kc'=1, vc'=2, ks'=3, vs'=4)
    return pl.pallas_call(
        functools.partial(_fused_write_kernel, scale=scale, hpp=hpp,
                          quant=True),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((b, kv, g, vhd), jnp.float32),
                   jax.ShapeDtypeStruct(kc.shape, kc.dtype),
                   jax.ShapeDtypeStruct(vc.shape, vc.dtype),
                   jax.ShapeDtypeStruct(k_scale.shape, k_scale.dtype),
                   jax.ShapeDtypeStruct(v_scale.shape, v_scale.dtype)],
        input_output_aliases={7: 1, 8: 2, 9: 3, 10: 4},
        interpret=interpret,
    )(pos_vec.astype(jnp.int32),
      jnp.asarray(layer_index, jnp.int32).reshape(1),
      q, kq_new, vq_new, ks_new, vs_new, kc, vc, k_scale, v_scale)


SPLIT_THRESHOLD_BYTES = 16384  # S * itemsize: full-stripe VMEM (K+V, double-
_SPLIT_TILE = 1024             # buffered) hits the 16M scoped limit past this
                               # (bf16 S=8192 measured at 16.01M on v5e)


def _pick_tile(s: int) -> int:
    # largest power-of-two tile that divides S (the full kernel VMEM-OOMs
    # past ~8k, so prefer split whenever a legal tiling exists)
    tile = _SPLIT_TILE
    while tile >= 128 and s % tile != 0:
        tile //= 2
    return tile


def decode_attention_auto(q, kc, vc, pos_vec, scale: float,
                          k_scale=None, v_scale=None, s_limit: int | None = None,
                          layer_index=None):
    """s_limit: logical cache length — the full-stripe kernels read only the
    first round8(s_limit) rows (physical write-slack rows are never attended;
    the split kernels already clamp their DMA to the current position)."""
    interpret = jax.default_backend() != "tpu"
    s = kc.shape[-2]
    quantized = k_scale is not None
    split = s * kc.dtype.itemsize >= SPLIT_THRESHOLD_BYTES
    if split:
        tile = _pick_tile(s)
        if tile >= 128:
            if quantized:
                return decode_attention_split_q(q, kc, vc, k_scale, v_scale,
                                                pos_vec, scale, s_tile=tile,
                                                interpret=interpret,
                                                layer_index=layer_index)
            return decode_attention_split(q, kc, vc, pos_vec, scale,
                                          s_tile=tile, interpret=interpret,
                                          layer_index=layer_index)
    s_use = min(s, -(-s_limit // 8) * 8) if s_limit else None
    if quantized:
        return decode_attention_q(q, kc, vc, k_scale, v_scale, pos_vec, scale,
                                  interpret=interpret, s_use=s_use,
                                  layer_index=layer_index)
    return decode_attention(q, kc, vc, pos_vec, scale, interpret=interpret,
                            s_use=s_use, layer_index=layer_index)
