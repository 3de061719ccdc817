"""Pallas decode attention over the HBM-resident KV cache.

TPU-native analog of the reference's decode attention kernels
(processHeadsFlashAttention / processHeadsParallel / splitKV variants,
TransformerComputeKernelsLayered.java:784-1433): one program per (batch, kv
head) computes the GQA group's scores against the full cache stripe in VMEM
with f32 masked softmax, keeping the [G, S] score matrix out of HBM entirely.

Two kernels:

- `decode_attention`: one program per (batch, kv head) over the FULL cache
  stripe in VMEM. Simplest + fastest for short caches (stripe fits VMEM up to
  a few k tokens with double buffering).
- `decode_attention_split`: the reference's splitKV analog
  (TransformerComputeKernelsLayered.java:1090-1433) re-designed for TPU — the
  cache stripe is tiled along S with an online-softmax accumulator carried in
  VMEM scratch across the sequential tile grid. The K/V block index maps are
  CLAMPED to the tile containing `pos` (scalar-prefetch): tiles past the
  current length re-request the same block, which Pallas recognises as a
  revisit and skips the DMA — so decode HBM traffic scales with the ACTUAL
  sequence length, not the allocated cache length. Compute for those tiles is
  skipped with pl.when.

`decode_attention_auto` picks per cache length (tiled above SPLIT_THRESHOLD).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _kernel(pos_pref, q_ref, k_ref, v_ref, o_ref, *, scale):
    # blocks: q [1, 1, G, hd]; k [1, 1, S, hd]; v [1, 1, S, vhd];
    # pos_pref: full [B] scalar-prefetch (an SMEM BlockSpec of (1, 1) over
    # [B, 1] fails Mosaic's block-divisibility rule for B > 1)
    pos = pos_pref[pl.program_id(0)]
    q = q_ref[0, 0].astype(jnp.float32)          # [G, hd]
    k = k_ref[0, 0].astype(jnp.float32)          # [S, hd]
    v = v_ref[0, 0].astype(jnp.float32)          # [S, vhd]
    scores = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale  # [G, S]
    s_idx = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    scores = jnp.where(s_idx <= pos, scores, NEG_INF)
    m = jnp.max(scores, axis=1, keepdims=True)
    e = jnp.exp(scores - m)
    att = e / jnp.sum(e, axis=1, keepdims=True)
    o_ref[0, 0] = jax.lax.dot_general(
        att, v, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("scale", "interpret", "s_use"))
def decode_attention(q, kc, vc, pos_vec, scale: float, interpret: bool = False,
                     s_use: int | None = None):
    """q: [B, KV, G, hd]; kc: [B, KV, S, hd]; vc: [B, KV, S, vhd] (head-major);
    pos_vec: [B] (keys s <= pos are valid). Returns [B, KV, G, vhd] f32.
    s_use: read only the first s_use cache rows (the physical cache allocates
    write-slack rows past the logical length that no query ever attends)."""
    b, kv, g, hd = q.shape
    s = s_use or kc.shape[2]
    vhd = vc.shape[3]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, kv),
        in_specs=[
            pl.BlockSpec((1, 1, g, hd), lambda bi, hi, pp: (bi, hi, 0, 0)),
            pl.BlockSpec((1, 1, s, hd), lambda bi, hi, pp: (bi, hi, 0, 0)),
            pl.BlockSpec((1, 1, s, vhd), lambda bi, hi, pp: (bi, hi, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, g, vhd), lambda bi, hi, pp: (bi, hi, 0, 0)),
    )
    return pl.pallas_call(
        functools.partial(_kernel, scale=scale),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, kv, g, vhd), jnp.float32),
        interpret=interpret,
    )(pos_vec.astype(jnp.int32), q, kc, vc)


def _split_kernel(pos_pref, q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref,
                  *, scale, s_tile):
    # grid (b, kv, nt); blocks: q [1,1,G,hd]; k [1,1,Ts,hd]; v [1,1,Ts,vhd]
    # scratch (persist across the sequential ti loop): m/l [G,128] lane-
    # replicated running max / denominator, acc [G,vhd] f32 accumulator.
    bi = pl.program_id(0)
    ti = pl.program_id(2)
    nt = pl.num_programs(2)
    pos = pos_pref[bi]

    @pl.when(ti == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    start = ti * s_tile

    @pl.when(start <= pos)
    def _tile():
        q = q_ref[0, 0].astype(jnp.float32)      # [G, hd]
        k = k_ref[0, 0].astype(jnp.float32)      # [Ts, hd]
        v = v_ref[0, 0].astype(jnp.float32)      # [Ts, vhd]
        scores = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale  # [G, Ts]
        s_idx = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1) + start
        scores = jnp.where(s_idx <= pos, scores, NEG_INF)
        # lanes of m/l are replicated, so a lane-max is a read
        m_prev = jnp.max(m_ref[...], axis=1, keepdims=True)      # [G, 1]
        l_prev = jnp.max(l_ref[...], axis=1, keepdims=True)      # [G, 1]
        m_new = jnp.maximum(m_prev, jnp.max(scores, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)                          # [G, 1]
        e = jnp.exp(scores - m_new)                              # [G, Ts]
        l_new = l_prev * alpha + jnp.sum(e, axis=1, keepdims=True)
        acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
            e, v, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[...] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(ti == nt - 1)
    def _finalize():
        l = jnp.max(l_ref[...], axis=1, keepdims=True)  # >= 1 term (pos >= 0)
        o_ref[0, 0] = acc_ref[...] / l


@functools.partial(jax.jit, static_argnames=("scale", "s_tile", "interpret"))
def decode_attention_split(q, kc, vc, pos_vec, scale: float,
                           s_tile: int = 1024, interpret: bool = False):
    """KV-tiled online-softmax decode attention (splitKV analog). Same
    signature/semantics as `decode_attention`; requires S % s_tile == 0 and
    s_tile a power of two (the clamp uses a shift — `//` lowers to a ~20x
    software divide on TPU)."""
    b, kv, g, hd = q.shape
    s = kc.shape[2]
    vhd = vc.shape[3]
    assert s % s_tile == 0, (s, s_tile)
    assert s_tile & (s_tile - 1) == 0, s_tile
    shift = s_tile.bit_length() - 1
    nt = s // s_tile
    pos = pos_vec.astype(jnp.int32)

    def kv_index(bi, hi, ti, pos_pref):
        # clamp to the tile containing pos: later tiles revisit this block, so
        # Pallas skips their DMA (decode reads scale with the real length)
        return (bi, hi, jnp.minimum(ti, pos_pref[bi] >> shift), 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, kv, nt),
        in_specs=[
            pl.BlockSpec((1, 1, g, hd), lambda bi, hi, ti, pp: (bi, hi, 0, 0)),
            pl.BlockSpec((1, 1, s_tile, hd), kv_index),
            pl.BlockSpec((1, 1, s_tile, vhd), kv_index),
        ],
        out_specs=pl.BlockSpec((1, 1, g, vhd),
                               lambda bi, hi, ti, pp: (bi, hi, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((g, 128), jnp.float32),
            pltpu.VMEM((g, 128), jnp.float32),
            pltpu.VMEM((g, vhd), jnp.float32),
        ],
    )
    return pl.pallas_call(
        functools.partial(_split_kernel, scale=scale, s_tile=s_tile),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, kv, g, vhd), jnp.float32),
        interpret=interpret,
    )(pos, q, kc, vc)


def _kernel_q(pos_pref, q_ref, k_ref, v_ref, ks_ref, vs_ref, o_ref, *, scale):
    """Int8-KV variant: per-(token, head) scales fold into the dots as [1, S]
    row multiplies (see ops/kv_quant.py) — no dequantized stripe materialized.
    Blocks: ks/vs [1, 1, 1, S] f32; pos_pref: full [B] scalar-prefetch."""
    pos = pos_pref[pl.program_id(0)]
    q = q_ref[0, 0].astype(jnp.float32)          # [G, hd]
    k = k_ref[0, 0].astype(jnp.float32)          # [S, hd] int8 -> f32
    v = v_ref[0, 0].astype(jnp.float32)          # [S, vhd]
    ks = ks_ref[0, 0, 0][None, :]                # [1, S]
    vs = vs_ref[0, 0, 0][None, :]
    scores = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale * ks  # [G, S]
    s_idx = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    scores = jnp.where(s_idx <= pos, scores, NEG_INF)
    m = jnp.max(scores, axis=1, keepdims=True)
    e = jnp.exp(scores - m)
    att = e / jnp.sum(e, axis=1, keepdims=True)
    o_ref[0, 0] = jax.lax.dot_general(
        att * vs, v, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("scale", "interpret", "s_use"))
def decode_attention_q(q, kc, vc, k_scale, v_scale, pos_vec, scale: float,
                       interpret: bool = False, s_use: int | None = None):
    """Int8-KV decode attention. kc/vc int8 [B, KV, S, hd]; k_scale/v_scale
    f32 [B, KV, 1, S]; otherwise as `decode_attention`."""
    b, kv, g, hd = q.shape
    s = s_use or kc.shape[2]
    vhd = vc.shape[3]
    scale_spec = pl.BlockSpec((1, 1, 1, s), lambda bi, hi, pp: (bi, hi, 0, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, kv),
        in_specs=[
            pl.BlockSpec((1, 1, g, hd), lambda bi, hi, pp: (bi, hi, 0, 0)),
            pl.BlockSpec((1, 1, s, hd), lambda bi, hi, pp: (bi, hi, 0, 0)),
            pl.BlockSpec((1, 1, s, vhd), lambda bi, hi, pp: (bi, hi, 0, 0)),
            scale_spec,
            scale_spec,
        ],
        out_specs=pl.BlockSpec((1, 1, g, vhd), lambda bi, hi, pp: (bi, hi, 0, 0)),
    )
    return pl.pallas_call(
        functools.partial(_kernel_q, scale=scale),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, kv, g, vhd), jnp.float32),
        interpret=interpret,
    )(pos_vec.astype(jnp.int32), q, kc, vc, k_scale, v_scale)


def _split_kernel_q(pos_pref, q_ref, k_ref, v_ref, ks_ref, vs_ref, o_ref,
                    m_ref, l_ref, acc_ref, *, scale, s_tile):
    """Int8-KV splitKV: online softmax over tiles with the scale folds of
    `_kernel_q`."""
    bi = pl.program_id(0)
    ti = pl.program_id(2)
    nt = pl.num_programs(2)
    pos = pos_pref[bi]

    @pl.when(ti == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    start = ti * s_tile

    @pl.when(start <= pos)
    def _tile():
        q = q_ref[0, 0].astype(jnp.float32)
        k = k_ref[0, 0].astype(jnp.float32)
        v = v_ref[0, 0].astype(jnp.float32)
        ks = ks_ref[0, 0, 0][None, :]            # [1, Ts]
        vs = vs_ref[0, 0, 0][None, :]
        scores = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale * ks
        s_idx = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1) + start
        scores = jnp.where(s_idx <= pos, scores, NEG_INF)
        m_prev = jnp.max(m_ref[...], axis=1, keepdims=True)
        l_prev = jnp.max(l_ref[...], axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, jnp.max(scores, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        e = jnp.exp(scores - m_new)
        l_new = l_prev * alpha + jnp.sum(e, axis=1, keepdims=True)
        acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
            e * vs, v, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[...] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(ti == nt - 1)
    def _finalize():
        l = jnp.max(l_ref[...], axis=1, keepdims=True)
        o_ref[0, 0] = acc_ref[...] / l


@functools.partial(jax.jit, static_argnames=("scale", "s_tile", "interpret"))
def decode_attention_split_q(q, kc, vc, k_scale, v_scale, pos_vec, scale: float,
                             s_tile: int = 1024, interpret: bool = False):
    """Int8-KV KV-tiled decode attention with the same DMA-clamped block maps
    as `decode_attention_split`."""
    b, kv, g, hd = q.shape
    s = kc.shape[2]
    vhd = vc.shape[3]
    assert s % s_tile == 0, (s, s_tile)
    assert s_tile & (s_tile - 1) == 0, s_tile
    shift = s_tile.bit_length() - 1
    nt = s // s_tile
    pos = pos_vec.astype(jnp.int32)

    def kv_index(bi, hi, ti, pos_pref):
        return (bi, hi, jnp.minimum(ti, pos_pref[bi] >> shift), 0)

    def sc_index(bi, hi, ti, pos_pref):
        return (bi, hi, 0, jnp.minimum(ti, pos_pref[bi] >> shift))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, kv, nt),
        in_specs=[
            pl.BlockSpec((1, 1, g, hd), lambda bi, hi, ti, pp: (bi, hi, 0, 0)),
            pl.BlockSpec((1, 1, s_tile, hd), kv_index),
            pl.BlockSpec((1, 1, s_tile, vhd), kv_index),
            pl.BlockSpec((1, 1, 1, s_tile), sc_index),
            pl.BlockSpec((1, 1, 1, s_tile), sc_index),
        ],
        out_specs=pl.BlockSpec((1, 1, g, vhd),
                               lambda bi, hi, ti, pp: (bi, hi, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((g, 128), jnp.float32),
            pltpu.VMEM((g, 128), jnp.float32),
            pltpu.VMEM((g, vhd), jnp.float32),
        ],
    )
    return pl.pallas_call(
        functools.partial(_split_kernel_q, scale=scale, s_tile=s_tile),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, kv, g, vhd), jnp.float32),
        interpret=interpret,
    )(pos, q, kc, vc, k_scale, v_scale)


def _paged_kernel(tables_pref, pos_pref, *args, scale, s_tile):
    # identical online-softmax math; the block tables only change WHICH pool
    # block each grid step's DMA fetched (kv_index below) — the kernel body
    # sees logical tile ti via program_id and masks by absolute position
    _split_kernel(pos_pref, *args, scale=scale, s_tile=s_tile)


def _paged_kernel_q(tables_pref, pos_pref, *args, scale, s_tile):
    _split_kernel_q(pos_pref, *args, scale=scale, s_tile=s_tile)


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def decode_attention_paged(q, k_pool, v_pool, tables, pos_vec, scale: float,
                           k_scale=None, v_scale=None, interpret: bool = False):
    """Block-table DMA paged decode attention: the kernel reads KV straight
    from the shared block pool — no dense per-lane gather materialized in HBM
    (runtime/paged_cache.paged_gather copies the lane's whole KV stripe per
    layer per step; this kernel's HBM traffic is exactly the live blocks).

    q: [B, KV, G, hd]; k_pool/v_pool: [NBLK, KV, BS, hd] (one layer's pool);
    tables: [B, MAXBLK] int32 block tables; pos_vec: [B]. Int8 pools pass
    k_scale/v_scale pools [NBLK, KV, 1, BS]. Returns [B, KV, G, vhd] f32.

    Grid (B, KV, MAXBLK): the pool-block index map routes grid step (b, h, j)
    to physical block tables[b, min(j, pos_b//BS)] via scalar prefetch — tiles
    past the current length revisit the previous block so Pallas skips their
    DMA (reads scale with the ACTUAL sequence length), and their compute is
    skipped with pl.when. The reference's paged analog doesn't exist (its KV
    is a flat preallocated array, State.java:44-45); vLLM's paged_attention
    kernel is the conceptual ancestor."""
    b, kv, g, hd = q.shape
    nblk, _, bs, _ = k_pool.shape
    vhd = v_pool.shape[3]
    maxblk = tables.shape[1]
    assert bs & (bs - 1) == 0, bs  # clamp uses a shift, not a divide
    shift = bs.bit_length() - 1
    quantized = k_scale is not None

    def kv_index(bi, hi, ti, tables_pref, pos_pref):
        lj = jnp.minimum(ti, pos_pref[bi] >> shift)
        return (tables_pref[bi, lj], hi, 0, 0)

    in_specs = [
        pl.BlockSpec((1, 1, g, hd), lambda bi, hi, ti, tp, pp: (bi, hi, 0, 0)),
        pl.BlockSpec((1, 1, bs, hd), kv_index),
        pl.BlockSpec((1, 1, bs, vhd), kv_index),
    ]
    args = [q, k_pool, v_pool]
    kernel = _paged_kernel
    if quantized:
        in_specs += [pl.BlockSpec((1, 1, 1, bs), kv_index)] * 2
        args += [k_scale, v_scale]
        kernel = _paged_kernel_q

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, kv, maxblk),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, g, vhd),
                               lambda bi, hi, ti, tp, pp: (bi, hi, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((g, 128), jnp.float32),
            pltpu.VMEM((g, 128), jnp.float32),
            pltpu.VMEM((g, vhd), jnp.float32),
        ],
    )
    return pl.pallas_call(
        functools.partial(kernel, scale=scale, s_tile=bs),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, kv, g, vhd), jnp.float32),
        interpret=interpret,
    )(tables.astype(jnp.int32), pos_vec.astype(jnp.int32), *args)


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
                          k_scale=None, v_scale=None, s_limit: int | None = None):
    """s_limit: logical cache length — the full-stripe kernels read only the
    first round8(s_limit) rows (physical write-slack rows are never attended;
    the split kernels already clamp their DMA to the current position)."""
    interpret = jax.default_backend() != "tpu"
    s = kc.shape[2]
    quantized = k_scale is not None
    split = s * kc.dtype.itemsize >= SPLIT_THRESHOLD_BYTES
    if split:
        tile = _pick_tile(s)
        if tile >= 128:
            if quantized:
                return decode_attention_split_q(q, kc, vc, k_scale, v_scale,
                                                pos_vec, scale, s_tile=tile,
                                                interpret=interpret)
            return decode_attention_split(q, kc, vc, pos_vec, scale,
                                          s_tile=tile, interpret=interpret)
    s_use = min(s, -(-s_limit // 8) * 8) if s_limit else None
    if quantized:
        return decode_attention_q(q, kc, vc, k_scale, v_scale, pos_vec, scale,
                                  interpret=interpret, s_use=s_use)
    return decode_attention(q, kc, vc, pos_vec, scale, interpret=interpret,
                            s_use=s_use)
