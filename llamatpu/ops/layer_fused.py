"""Layer megakernel v2 for q8_row weights: the PERF.md plan's second fused
call — wo + residual + rmsnorm + w13 + silu*up + w2 + residual in ONE pallas
call per layer — plus a norm-fused wqkv kernel, giving TWO weight-streaming
pallas calls per transformer layer (wqkv; wo..w2) instead of four.

Why (PERF.md r3 breakdown): decode is a weight-stream problem and the stream
rate is set by grid steps per kernel call — every `pallas_call` pays a
pipeline fill before its first block lands (2-step wo streamed at 535 GB/s vs
789 GB/s for the 126-step vocab head), and every call boundary adds an XLA
fusion boundary for the glue (residual adds, rmsnorm). This kernel runs the
layer's entire post-attention weight set (wo -> w13 -> w2, ~54 MB/layer for
Llama-1B) as one continuous (n_wo + n13 + n2)-step DMA pipeline: while the
last wo blocks are dotted, the first w13 blocks are already in flight.

Grid phases (1-D grid, scalar-prefetched layer index):
  steps [0, n_wo):   x2[:, s*towo:...] = x[:, tile] + rs * (attn @ wo_blk^T) * s_wo
  step  n_wo:        h = rmsnorm(x2) * ffn_norm          (VMEM scratch, f32)
  steps [n_wo, +n13): g13[:, tile] = (h @ w13_blk^T) * s13
  step  n_wo+n13:    act = silu(g13[:, :F]) * g13[:, F:]
  steps [.., end):   out[:, tile] = x2[:, tile] + rs * (act @ w2_blk^T) * s2

Index maps clamp every input to its own phase so inactive phases issue no new
DMA. q8_row only (per-row scales multiply the output tile in-kernel — no
block-scale expansion, no column interleave). The rmsnorm-inside-matmul trick
also serves wqkv: step 0 computes h = rmsnorm(x)*attn_norm into scratch, all
steps dot against it (removes the pre-attention glue fusion boundary).

Numerics: residuals accumulate in f32 inside the kernel (the unfused path
rounds the residual stream to bf16 between calls); parity is tolerance-gated
by tests/test_layer_fused.py and the parity-gate rowq rows.

Reference tier being replaced: the per-projection GEMV kernel chain +
host-glued norms of TransformerComputeKernelsLayered.java:2773-2945 (one
dispatch per projection per layer there; two per layer here).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from llamatpu.models.weights import QTensor
from llamatpu.ops.ffn_fused import _BLOCK_BYTES, _MAX_T, _VMEM_BUDGET, _pick_to


# ------------------------------------------------------------- tail kernel
def _tail_kernel(li_ref, attn_ref, x_ref, nw_ref, wo_ref, so_ref,
                 w13_ref, s13_ref, w2_ref, s2_ref, o_ref,
                 x2_ref, h_ref, g13_ref, act_ref, *,
                 nwo, towo, n13, to13, n2, to2, f, d, eps, rs, dot_dtype):
    s = pl.program_id(0)

    @pl.when(s < nwo)
    def _():
        y = jax.lax.dot_general(
            attn_ref[:].astype(dot_dtype), wo_ref[0].astype(dot_dtype),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        y = y * so_ref[0][:, 0][None, :]
        if rs != 1.0:
            y = y * rs
        x2_ref[:, pl.ds(s * towo, towo)] = (
            x_ref[:, pl.ds(s * towo, towo)].astype(jnp.float32) + y)

    @pl.when((s >= nwo) & (s < nwo + n13))
    def _():
        @pl.when(s == nwo)
        def _():
            x2 = x2_ref[:]
            ss = jnp.mean(x2 * x2, axis=-1, keepdims=True) + eps
            h_ref[:] = (x2 * jax.lax.rsqrt(ss)
                        * nw_ref[0].astype(jnp.float32)  # [1, d] broadcast
                        ).astype(dot_dtype)

        j = s - nwo
        y = jax.lax.dot_general(
            h_ref[:], w13_ref[0].astype(dot_dtype),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        g13_ref[:, pl.ds(j * to13, to13)] = y * s13_ref[0][:, 0][None, :]

    @pl.when(s >= nwo + n13)
    def _():
        @pl.when(s == nwo + n13)
        def _():
            gate = g13_ref[:, :f]
            up = g13_ref[:, f:]
            act_ref[:] = (gate * jax.nn.sigmoid(gate) * up).astype(dot_dtype)

        j = s - nwo - n13
        y2 = jax.lax.dot_general(
            act_ref[:], w2_ref[0].astype(dot_dtype),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        y2 = y2 * s2_ref[0][:, 0][None, :]
        if rs != 1.0:
            y2 = y2 * rs
        o_ref[:] = x2_ref[:, pl.ds(j * to2, to2)] + y2


# w2 phase layout A/B: False = out-tiled short-fat blocks [to2, F];
# True = contraction-tiled tall blocks [D, tf] (the head's 740 GB/s shape),
# accumulating partials in scratch. Measured on chip via scripts/sweep_tail.py.
_W2_KTILE = False


def _tail_kernel_kt(li_ref, attn_ref, x_ref, nw_ref, wo_ref, so_ref,
                    w13_ref, s13_ref, w2_ref, s2_ref, o_ref,
                    x2_ref, h_ref, g13_ref, act_ref, acc_ref, *,
                    nwo, towo, n13, to13, n2k, tf, f, d, eps, rs, dot_dtype):
    """Variant B: w2 streams [d, tf] contraction tiles; partial dots
    accumulate in acc scratch; one (tp, d) output write at the last step."""
    s = pl.program_id(0)

    @pl.when(s < nwo)
    def _():
        y = jax.lax.dot_general(
            attn_ref[:].astype(dot_dtype), wo_ref[0].astype(dot_dtype),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        y = y * so_ref[0][:, 0][None, :]
        if rs != 1.0:
            y = y * rs
        x2_ref[:, pl.ds(s * towo, towo)] = (
            x_ref[:, pl.ds(s * towo, towo)].astype(jnp.float32) + y)

    @pl.when((s >= nwo) & (s < nwo + n13))
    def _():
        @pl.when(s == nwo)
        def _():
            x2 = x2_ref[:]
            ss = jnp.mean(x2 * x2, axis=-1, keepdims=True) + eps
            h_ref[:] = (x2 * jax.lax.rsqrt(ss)
                        * nw_ref[0].astype(jnp.float32)).astype(dot_dtype)

        j = s - nwo
        y = jax.lax.dot_general(
            h_ref[:], w13_ref[0].astype(dot_dtype),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        g13_ref[:, pl.ds(j * to13, to13)] = y * s13_ref[0][:, 0][None, :]

    @pl.when(s >= nwo + n13)
    def _():
        @pl.when(s == nwo + n13)
        def _():
            gate = g13_ref[:, :f]
            up = g13_ref[:, f:]
            act_ref[:] = (gate * jax.nn.sigmoid(gate) * up).astype(dot_dtype)
            acc_ref[:] = jnp.zeros_like(acc_ref)

        j = s - nwo - n13
        acc_ref[:] += jax.lax.dot_general(
            act_ref[:, pl.ds(j * tf, tf)], w2_ref[0].astype(dot_dtype),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

        @pl.when(s == nwo + n13 + n2k - 1)
        def _():
            y2 = acc_ref[:] * s2_ref[0][:, 0][None, :]
            if rs != 1.0:
                y2 = y2 * rs
            o_ref[:] = x2_ref[:] + y2


@functools.partial(jax.jit, static_argnames=("eps", "rs", "interpret",
                                             "towo", "to13", "tf"))
def _tail_2d_kt(wo_qs, wo_s, w13_qs, w13_s, w2_qs, w2_s, nw, attn2, x2, li,
                eps, rs, towo, to13, tf, interpret=False):
    L, d, hdim = wo_qs.shape
    _, o13, _ = w13_qs.shape
    _, d2, f = w2_qs.shape
    t = x2.shape[0]
    tp = -(-t // 8) * 8
    if tp != t:
        attn2 = jnp.pad(attn2, ((0, tp - t), (0, 0)))
        x2 = jnp.pad(x2, ((0, tp - t), (0, 0)))
    nwo, n13, n2k = d // towo, o13 // to13, f // tf
    dot_dtype = jnp.float32 if x2.dtype == jnp.float32 else jnp.bfloat16
    li_arr = jnp.asarray(li, jnp.int32).reshape(1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nwo + n13 + n2k,),
        in_specs=[
            pl.BlockSpec((tp, hdim), lambda s, li_: (0, 0)),
            pl.BlockSpec((tp, d), lambda s, li_: (0, 0)),
            pl.BlockSpec((1, 1, d), lambda s, li_: (li_[0], 0, 0)),
            pl.BlockSpec((1, towo, hdim),
                         lambda s, li_: (li_[0], jnp.minimum(s, nwo - 1), 0)),
            pl.BlockSpec((1, towo, 1),
                         lambda s, li_: (li_[0], jnp.minimum(s, nwo - 1), 0)),
            pl.BlockSpec((1, to13, d),
                         lambda s, li_: (li_[0], jnp.clip(s - nwo, 0, n13 - 1), 0)),
            pl.BlockSpec((1, to13, 1),
                         lambda s, li_: (li_[0], jnp.clip(s - nwo, 0, n13 - 1), 0)),
            pl.BlockSpec((1, d2, tf),
                         lambda s, li_: (li_[0], 0,
                                         jnp.clip(s - nwo - n13, 0, n2k - 1))),
            pl.BlockSpec((1, d2, 1), lambda s, li_: (li_[0], 0, 0)),
        ],
        out_specs=pl.BlockSpec((tp, d2), lambda s, li_: (0, 0)),
        scratch_shapes=[
            pltpu.VMEM((tp, d), jnp.float32),      # x2
            pltpu.VMEM((tp, d), dot_dtype),        # h
            pltpu.VMEM((tp, o13), jnp.float32),    # g13
            pltpu.VMEM((tp, f), dot_dtype),        # act
            pltpu.VMEM((tp, d2), jnp.float32),     # acc (w2 partials)
        ],
    )
    y = pl.pallas_call(
        functools.partial(_tail_kernel_kt, nwo=nwo, towo=towo, n13=n13,
                          to13=to13, n2k=n2k, tf=tf, f=f, d=d, eps=eps, rs=rs,
                          dot_dtype=dot_dtype),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((tp, d2), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * tp * (d * hdim + o13 * d + d2 * f),
            bytes_accessed=(d * hdim + o13 * d + d2 * f
                            + tp * (hdim + d) * 2 + tp * d2 * 4),
            transcendentals=tp * f,
        ),
    )(li_arr, attn2, x2, nw.reshape(nw.shape[0], 1, d),
      wo_qs, wo_s, w13_qs, w13_s, w2_qs, w2_s)
    return y[:t] if tp != t else y


@functools.partial(jax.jit, static_argnames=("eps", "rs", "interpret",
                                             "towo", "to13", "to2"))
def _tail_2d(wo_qs, wo_s, w13_qs, w13_s, w2_qs, w2_s, nw, attn2, x2, li,
             eps, rs, towo, to13, to2, interpret=False):
    L, d, hdim = wo_qs.shape
    _, o13, _ = w13_qs.shape
    _, d2, f = w2_qs.shape
    t = x2.shape[0]
    tp = -(-t // 8) * 8
    if tp != t:
        attn2 = jnp.pad(attn2, ((0, tp - t), (0, 0)))
        x2 = jnp.pad(x2, ((0, tp - t), (0, 0)))
    nwo, n13, n2 = d // towo, o13 // to13, d2 // to2
    dot_dtype = jnp.float32 if x2.dtype == jnp.float32 else jnp.bfloat16
    li_arr = jnp.asarray(li, jnp.int32).reshape(1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nwo + n13 + n2,),
        in_specs=[
            pl.BlockSpec((tp, hdim), lambda s, li_: (0, 0)),
            pl.BlockSpec((tp, d), lambda s, li_: (0, 0)),
            # norms ship as [L, 1, D]: a (1, D) block of [L, D] violates the
            # Mosaic (8k, 128k)-or-full rule on the sublane dim (found on
            # chip); (1, 1, D) blocks of [L, 1, D] are legal (1 == full dim)
            pl.BlockSpec((1, 1, d), lambda s, li_: (li_[0], 0, 0)),
            pl.BlockSpec((1, towo, hdim),
                         lambda s, li_: (li_[0], jnp.minimum(s, nwo - 1), 0)),
            pl.BlockSpec((1, towo, 1),
                         lambda s, li_: (li_[0], jnp.minimum(s, nwo - 1), 0)),
            pl.BlockSpec((1, to13, d),
                         lambda s, li_: (li_[0], jnp.clip(s - nwo, 0, n13 - 1), 0)),
            pl.BlockSpec((1, to13, 1),
                         lambda s, li_: (li_[0], jnp.clip(s - nwo, 0, n13 - 1), 0)),
            pl.BlockSpec((1, to2, f),
                         lambda s, li_: (li_[0],
                                         jnp.clip(s - nwo - n13, 0, n2 - 1), 0)),
            pl.BlockSpec((1, to2, 1),
                         lambda s, li_: (li_[0],
                                         jnp.clip(s - nwo - n13, 0, n2 - 1), 0)),
        ],
        out_specs=pl.BlockSpec(
            (tp, to2), lambda s, li_: (0, jnp.clip(s - nwo - n13, 0, n2 - 1))),
        scratch_shapes=[
            pltpu.VMEM((tp, d), jnp.float32),      # x2 (post-attn residual)
            pltpu.VMEM((tp, d), dot_dtype),        # h (normed FFN input)
            pltpu.VMEM((tp, o13), jnp.float32),    # g13
            pltpu.VMEM((tp, f), dot_dtype),        # act
        ],
    )
    y = pl.pallas_call(
        functools.partial(_tail_kernel, nwo=nwo, towo=towo, n13=n13, to13=to13,
                          n2=n2, to2=to2, f=f, d=d, eps=eps, rs=rs,
                          dot_dtype=dot_dtype),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((tp, d2), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * tp * (d * hdim + o13 * d + d2 * f),
            bytes_accessed=(d * hdim + o13 * d + d2 * f
                            + tp * (hdim + d) * 2 + tp * d2 * 4),
            transcendentals=tp * f,
        ),
    )(li_arr, attn2, x2, nw.reshape(nw.shape[0], 1, d),
      wo_qs, wo_s, w13_qs, w13_s, w2_qs, w2_s)
    return y[:t] if tp != t else y


def _fit_tail_tiles(t, d, hdim, o13, f, xbytes):
    """(towo, to13, to2) with all three phases' double-buffered blocks +
    scratches inside the VMEM budget, or None. Starts every stream at the
    2.4 MB DMA sweet spot and shrinks asymmetrically — wo first (it carries
    the fewest bytes/layer, so its block size matters least for the blended
    stream rate), then w2, then w13."""
    towo, to13, to2 = _pick_to(d, hdim), _pick_to(o13, d), _pick_to(d2_ := d, f)
    if not (towo and to13 and to2):
        return None
    tp = -(-t // 8) * 8
    order = ["wo", "w2", "w13"]
    cur = {"wo": towo, "w13": to13, "w2": to2}
    while _tail_vmem(tp, d, hdim, o13, f, cur["wo"], cur["w13"], cur["w2"],
                     xbytes, xbytes) > _VMEM_BUDGET:
        for name in order:
            if cur[name] > 128 and (cur[name] // 2) % 128 == 0:
                cur[name] //= 2
                break
        else:
            return None  # everything at minimum and still over budget
    return cur["wo"], cur["w13"], cur["w2"]


def _fit_tail_tiles_kt(t, d, hdim, o13, f, xbytes):
    """(towo, to13, tf) for the k-tiled w2 variant, or None."""
    def pick_tf():
        for c in (1024, 512, 256, 128):
            if f % c == 0 and d * c <= _BLOCK_BYTES:
                return c
        return 0

    towo, to13, tf = _pick_to(d, hdim), _pick_to(o13, d), pick_tf()
    if not (towo and to13 and tf):
        return None
    tp = -(-t // 8) * 8

    def need(towo_, to13_, tf_):
        return (_tail_vmem(tp, d, hdim, o13, f, towo_, to13_, 128, xbytes,
                           xbytes)
                - 2 * (128 * f + 128 * 4)          # out-tiled w2 blocks
                + 2 * (d * tf_ + d * 4)            # k-tiled w2 blocks
                + tp * d * 4)                      # acc scratch

    order = ["wo", "w2", "w13"]
    cur = {"wo": towo, "w13": to13, "w2": tf}
    while need(cur["wo"], cur["w13"], cur["w2"]) > _VMEM_BUDGET:
        for name in order:
            if cur[name] > 128 and (cur[name] // 2) % 128 == 0:
                cur[name] //= 2
                break
        else:
            return None
    return cur["wo"], cur["w13"], cur["w2"]


def _tail_vmem(tp, d, hdim, o13, f, towo, to13, to2, xbytes, act_bytes):
    return (tp * hdim * xbytes + tp * d * xbytes          # attn + x blocks
            + tp * d * 4 + tp * d * act_bytes             # x2 + h scratch
            + tp * o13 * 4 + tp * f * act_bytes           # g13 + act scratch
            + 2 * tp * to2 * 4                            # out blocks (2x)
            + 2 * (towo * hdim + towo * 4)                # wo blocks (2x)
            + 2 * (to13 * d + to13 * 4)                   # w13 blocks (2x)
            + 2 * (to2 * f + to2 * 4))                    # w2 blocks (2x)


def layer_tail_fused_rowq(wo: QTensor, w13: QTensor, w2: QTensor, ffn_norm,
                          attn, x, li, eps: float, residual_scale: float = 1.0,
                          interpret=None):
    """new_x[..., D] = x + rs*wo(attn) then + rs*FFN(rmsnorm(...)) with stacked
    q8_row wo [L, D, H] / w13 [L, 2F, D] / w2 [L, D, F] and stacked ffn_norm
    [L, D]. Returns None when the shape isn't eligible (caller falls back to
    the per-call path)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    for w in (wo, w13, w2):
        if not (isinstance(w, QTensor) and w.kind == "q8_row"
                and w.qs.ndim == 3 and not w.logical_out):
            return None
    lead = x.shape[:-1]
    t = 1
    for dd in lead:
        t *= dd
    if t > _MAX_T:
        return None
    d, hdim = wo.qs.shape[-2:]
    o13, d13 = w13.qs.shape[-2:]
    d2, f = w2.qs.shape[-2:]
    if not (d13 == d == d2 and o13 == 2 * f and x.shape[-1] == d
            and attn.shape[-1] == hdim):
        return None
    xbytes = 4 if x.dtype == jnp.float32 else 2
    if _W2_KTILE:
        kt = _fit_tail_tiles_kt(t, d, hdim, o13, f, xbytes)
        if kt is not None:
            towo, to13, tf = kt
            y = _tail_2d_kt(wo.qs, wo.scales, w13.qs, w13.scales, w2.qs,
                            w2.scales, ffn_norm, attn.reshape(t, hdim),
                            x.reshape(t, d), li, float(eps),
                            float(residual_scale), towo, to13, tf,
                            interpret=interpret)
            return y.reshape(*lead, d).astype(x.dtype)
    tiles = _fit_tail_tiles(t, d, hdim, o13, f, xbytes)
    if tiles is None:
        return None
    towo, to13, to2 = tiles
    y = _tail_2d(wo.qs, wo.scales, w13.qs, w13.scales, w2.qs, w2.scales,
                 ffn_norm, attn.reshape(t, hdim), x.reshape(t, d), li,
                 float(eps), float(residual_scale), towo, to13, to2,
                 interpret=interpret)
    return y.reshape(*lead, d).astype(x.dtype)


# ------------------------------------------- attn + tail megakernel (v3)
NEG_INF = -1e30


def _attn_tail_kernel(pos_ref, li_ref, q_ref, kvn_ref, kv_ref,
                      x_ref, nw_ref, wo_ref, so_ref, w13_ref, s13_ref,
                      w2_ref, s2_ref, o_ref, kvo_ref,
                      x2_ref, h_ref, g13_ref, act_ref, m_ref, l_ref, acc_ref,
                      aflat_ref, *, na, s_tile, st_shift, nwo, towo, n13,
                      to13, n2, to2, f, d, kvh, g, hd, vhd, vshift, eps, rs,
                      scale, dot_dtype):
    """ONE call per layer: [attn tiles] -> wo -> w13 -> w2 (megakernel v3).
    Phase A appends this token's PACKED K/V row (write-back tile out spec,
    cache aliased) and runs online-softmax attention over pos-clamped S tiles
    of the packed stripe (ops/pallas_attention.py packed-layout math: q is
    lane-padded with zeros so the score contraction equals q . k; the att.kv
    dot's V lanes are the attention output, extracted with a constant
    selection matmul — Mosaic cannot lane-slice); phases B-D are the tail
    kernel with the attention output read from VMEM scratch instead of an
    input block. wo arrives viewed [L, D, KV*G, vhd] so phase B contracts per
    attention-scratch row — a [KV*G, vhd] -> [1, hdim] flatten would cross
    lane boundaries, which Mosaic reshapes cannot do."""
    s = pl.program_id(0)
    pos = pos_ref[0]
    width = hd + vhd

    # ---- phase A: KV append + attention over S tiles (online softmax)
    @pl.when(s == 0)
    def _():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    start = s * s_tile

    @pl.when((s < na) & (start <= pos))
    def _():
        for i in range(kvh):
            band = slice(i * g, (i + 1) * g)
            kvn = kvn_ref[i, 0]
            rel = jax.lax.broadcasted_iota(jnp.int32, (s_tile, 1), 0) + start
            kvb = kv_ref[0, 0, i]
            kvb = jnp.where(rel == pos, kvn[None, :].astype(kvb.dtype), kvb)
            kvb = kvb.astype(jnp.float32)
            q = q_ref[i].astype(jnp.float32)  # [g, width], zeros in V lanes
            scores = jax.lax.dot_general(
                q, kvb, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            s_idx = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1) + start
            scores = jnp.where(s_idx <= pos, scores, NEG_INF)
            m_prev = jnp.max(m_ref[band], axis=1, keepdims=True)
            l_prev = jnp.max(l_ref[band], axis=1, keepdims=True)
            m_new = jnp.maximum(m_prev, jnp.max(scores, axis=1, keepdims=True))
            alpha = jnp.exp(m_prev - m_new)
            e = jnp.exp(scores - m_new)
            l_new = l_prev * alpha + jnp.sum(e, axis=1, keepdims=True)
            acc_ref[band] = acc_ref[band] * alpha + jax.lax.dot_general(
                e, kvb, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            m_ref[band] = jnp.broadcast_to(m_new, (g, m_ref.shape[1]))
            l_ref[band] = jnp.broadcast_to(l_new, (g, l_ref.shape[1]))

        # write-back: this step owns the tile containing pos
        @pl.when((pos >> st_shift) == s)
        def _():
            # multiple_of: Mosaic must prove the dynamic sublane slice is
            # 8-aligned (pallas_attention._fused_write_kernel, found on chip)
            t0 = pl.multiple_of(((pos >> 5) << 5) - start, 32)
            rel32 = (jax.lax.broadcasted_iota(jnp.int32, (32, 1), 0) + start
                     + t0)
            for i in range(kvh):
                tile = kv_ref[0, 0, i, pl.ds(t0, 32), :]
                kvn = kvn_ref[i, 0]
                kvo_ref[0, 0, i] = jnp.where(
                    rel32 == pos, kvn[None, :].astype(tile.dtype), tile)

    @pl.when(s == na - 1)
    def _():
        # finalize: flatten the packed attention rows [KV*G, width] into ONE
        # [tp, hdim] scratch row via two constant matmuls — select the V
        # lanes AND lay head r's vhd values at lanes [r*vhd, (r+1)*vhd) with
        # R[c, j] = [c >= hd][ (j & (vhd-1)) == c - hd ], then keep only row
        # j >> log2(vhd) with mask D and collapse rows with u. No lane
        # slicing, no per-row dots (the r5a per-row phase B cost ~0.9
        # ms/layer: 32 tiny MXU dots x 8 grid steps + the lane-padded wo4
        # view); phase B below is then EXACTLY the v2 tail's big dot.
        nheads = acc_ref.shape[0]
        l = jnp.maximum(jnp.max(l_ref[...], axis=1, keepdims=True), 1e-38)
        accn = acc_ref[...] / l                           # [KV*G, width] f32
        hdim = aflat_ref.shape[1]
        c_i = jax.lax.broadcasted_iota(jnp.int32, (width, hdim), 0)
        j_i = jax.lax.broadcasted_iota(jnp.int32, (width, hdim), 1)
        r_sel = ((c_i >= hd)
                 & ((j_i & (vhd - 1)) == c_i - hd)).astype(jnp.float32)
        ao_t = jax.lax.dot_general(
            accn, r_sel, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)           # [KV*G, hdim]
        r_i = jax.lax.broadcasted_iota(jnp.int32, (nheads, hdim), 0)
        jj = jax.lax.broadcasted_iota(jnp.int32, (nheads, hdim), 1)
        masked = ao_t * ((jj >> vshift) == r_i).astype(jnp.float32)
        tp_rows = aflat_ref.shape[0]
        u = (jax.lax.broadcasted_iota(jnp.int32, (tp_rows, nheads), 0)
             == 0).astype(jnp.float32)
        aflat_ref[...] = jax.lax.dot_general(
            u, masked, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(aflat_ref.dtype)

    # ---- phase B: wo + residual (v2-shape big dot from the aflat scratch)
    @pl.when((s >= na) & (s < na + nwo))
    def _():
        j = s - na
        y = jax.lax.dot_general(
            aflat_ref[:], wo_ref[0].astype(dot_dtype),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        y = y * so_ref[0][:, 0][None, :]
        if rs != 1.0:
            y = y * rs
        x2_ref[:, pl.ds(j * towo, towo)] = (
            x_ref[:, pl.ds(j * towo, towo)].astype(jnp.float32) + y)

    # ---- phase C: rmsnorm + w13
    @pl.when((s >= na + nwo) & (s < na + nwo + n13))
    def _():
        @pl.when(s == na + nwo)
        def _():
            x2 = x2_ref[:]
            ss = jnp.mean(x2 * x2, axis=-1, keepdims=True) + eps
            h_ref[:] = (x2 * jax.lax.rsqrt(ss)
                        * nw_ref[0].astype(jnp.float32)).astype(dot_dtype)

        j = s - na - nwo
        y = jax.lax.dot_general(
            h_ref[:], w13_ref[0].astype(dot_dtype),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        g13_ref[:, pl.ds(j * to13, to13)] = y * s13_ref[0][:, 0][None, :]

    # ---- phase D: silu + w2 + residual
    @pl.when(s >= na + nwo + n13)
    def _():
        @pl.when(s == na + nwo + n13)
        def _():
            gate = g13_ref[:, :f]
            up = g13_ref[:, f:]
            act_ref[:] = (gate * jax.nn.sigmoid(gate) * up).astype(dot_dtype)

        j = s - na - nwo - n13
        y2 = jax.lax.dot_general(
            act_ref[:], w2_ref[0].astype(dot_dtype),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        y2 = y2 * s2_ref[0][:, 0][None, :]
        if rs != 1.0:
            y2 = y2 * rs
        o_ref[:] = x2_ref[:, pl.ds(j * to2, to2)] + y2


@functools.partial(jax.jit, static_argnames=(
    "eps", "rs", "scale", "kvh", "g", "hd", "interpret", "towo", "to13",
    "to2", "s_tile"))
def _attn_tail_2d(wo_qs, wo_s, w13_qs, w13_s, w2_qs, w2_s, nw, q4p, kvn,
                  kvc, x2, pos, li, eps, rs, scale, kvh, g, hd, towo, to13,
                  to2, s_tile, interpret=False):
    L, d, hdim = wo_qs.shape
    _, o13, _ = w13_qs.shape
    _, d2, f = w2_qs.shape
    S, width = kvc.shape[-2], kvc.shape[-1]
    vhd = width - hd
    t = x2.shape[0]
    tp = -(-t // 8) * 8
    if tp != t:
        x2 = jnp.pad(x2, ((0, tp - t), (0, 0)))
    nwo, n13, n2 = d // towo, o13 // to13, d2 // to2
    na = S // s_tile
    st_shift = s_tile.bit_length() - 1
    dot_dtype = jnp.float32 if x2.dtype == jnp.float32 else jnp.bfloat16
    li_arr = jnp.asarray(li, jnp.int32).reshape(1)
    pos_arr = jnp.asarray(pos, jnp.int32).reshape(1)
    vshift = vhd.bit_length() - 1

    def cl_attn(s, pp, li_):
        return jnp.minimum(jnp.minimum(s, na - 1), pp[0] >> st_shift)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(na + nwo + n13 + n2,),
        in_specs=[
            pl.BlockSpec((kvh, g, width), lambda s, pp, li_: (0, 0, 0)),
            pl.BlockSpec((kvh, 1, width), lambda s, pp, li_: (0, 0, 0)),
            pl.BlockSpec((1, 1, kvh, s_tile, width),
                         lambda s, pp, li_: (li_[0], 0, 0, cl_attn(s, pp, li_), 0)),
            pl.BlockSpec((tp, d), lambda s, pp, li_: (0, 0)),
            pl.BlockSpec((1, 1, d), lambda s, pp, li_: (li_[0], 0, 0)),
            pl.BlockSpec((1, towo, hdim),
                         lambda s, pp, li_: (li_[0],
                                             jnp.clip(s - na, 0, nwo - 1), 0)),
            pl.BlockSpec((1, towo, 1),
                         lambda s, pp, li_: (li_[0],
                                             jnp.clip(s - na, 0, nwo - 1), 0)),
            pl.BlockSpec((1, to13, d),
                         lambda s, pp, li_: (li_[0],
                                             jnp.clip(s - na - nwo, 0, n13 - 1), 0)),
            pl.BlockSpec((1, to13, 1),
                         lambda s, pp, li_: (li_[0],
                                             jnp.clip(s - na - nwo, 0, n13 - 1), 0)),
            pl.BlockSpec((1, to2, f),
                         lambda s, pp, li_: (li_[0],
                                             jnp.clip(s - na - nwo - n13, 0, n2 - 1), 0)),
            pl.BlockSpec((1, to2, 1),
                         lambda s, pp, li_: (li_[0],
                                             jnp.clip(s - na - nwo - n13, 0, n2 - 1), 0)),
        ],
        out_specs=[
            pl.BlockSpec((tp, to2),
                         lambda s, pp, li_: (0, jnp.clip(s - na - nwo - n13,
                                                         0, n2 - 1))),
            pl.BlockSpec((1, 1, kvh, 32, width),
                         lambda s, pp, li_: (li_[0], 0, 0, pp[0] >> 5, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((tp, d), jnp.float32),          # x2
            pltpu.VMEM((tp, d), dot_dtype),            # h
            pltpu.VMEM((tp, o13), jnp.float32),        # g13
            pltpu.VMEM((tp, f), dot_dtype),            # act
            pltpu.VMEM((kvh * g, 128), jnp.float32),   # m
            pltpu.VMEM((kvh * g, 128), jnp.float32),   # l
            pltpu.VMEM((kvh * g, width), jnp.float32), # acc (packed att.kv)
            pltpu.VMEM((tp, hdim), dot_dtype),         # aflat (attn row, flat)
        ],
    )
    # operand order incl. scalar prefetch: pos=0 li=1 q=2 kvn=3 kvc=4 x=5
    # nw=6 wo=7 so=8 w13=9 s13=10 w2=11 s2=12 -> outputs o=0 kvo=1
    y, kvc2 = pl.pallas_call(
        functools.partial(_attn_tail_kernel, na=na, s_tile=s_tile,
                          st_shift=st_shift, nwo=nwo, towo=towo, n13=n13,
                          to13=to13, n2=n2, to2=to2, f=f, d=d, kvh=kvh, g=g,
                          hd=hd, vhd=vhd, vshift=vshift, eps=eps, rs=rs,
                          scale=scale, dot_dtype=dot_dtype),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((tp, d2), jnp.float32),
                   jax.ShapeDtypeStruct(kvc.shape, kvc.dtype)],
        input_output_aliases={4: 1},
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * (kvh * g * S * 2 * width
                       + tp * (d * hdim + o13 * d + d2 * f)),
            bytes_accessed=(kvh * S * width * kvc.dtype.itemsize
                            + d * hdim + o13 * d + d2 * f + tp * d2 * 4),
            transcendentals=kvh * g * S + tp * f,
        ),
    )(pos_arr, li_arr, q4p, kvn, kvc, x2,
      nw.reshape(nw.shape[0], 1, d), wo_qs, wo_s, w13_qs, w13_s, w2_qs, w2_s)
    return (y[:t] if tp != t else y), kvc2


_V3_LIMIT = 16 * 1024 * 1024        # Mosaic's scoped-vmem hard limit
_V3_STACK = int(3.5 * 1024 * 1024)  # kernel-stack margin: the unrolled
                                    # per-head attention phase holds f32
                                    # KV-cast + score temporaries Mosaic
                                    # allocates on the scoped stack (r4c chip
                                    # OOM: est 12.0M vs actual 17.54M — the
                                    # residual beyond lane padding)


def _lane_pad(n: int) -> int:
    return -(-n // 128) * 128


def _fit_attn_tail(t, d, hdim, o13, f, kvh, g, width, S, kv_itemsize,
                   xbytes):
    """(towo, to13, to2, s_tile) fitting the tail tiles + the packed KV tile
    stream + attention scratches inside Mosaic's 16M scoped-vmem limit, or
    None. Accounts LANE PADDING (the wo4 view's last dim is vhd, padded to
    128 per block; the packed KV blocks are 128-exact by construction) plus a
    measured stack margin (r4c chip OOM: est 12.0M vs actual 17.54M)."""
    towo, to13, to2 = _pick_to(d, hdim), _pick_to(o13, d), _pick_to(d, f)
    if not (towo and to13 and to2):
        return None
    tp = -(-t // 8) * 8
    vhd = width // 2  # wo4 row width (hd == vhd for every current model)
    kv_padw = _lane_pad(width)

    def need(towo_, to13_, to2_, s_tile):
        est = _tail_vmem(tp, d, hdim, o13, f, towo_, to13_, to2_, xbytes,
                         xbytes)
        est += 2 * kvh * s_tile * kv_padw * kv_itemsize       # KV blocks, 2x
        est += 2 * kvh * 32 * kv_padw * kv_itemsize           # write tiles
        est += (3 * kvh * g * 128 * 4 + kvh * g * kv_padw * 4
                + tp * hdim * xbytes)                         # m/l/acc/aflat
        est += 2 * kvh * (kv_padw + _lane_pad(vhd)) * xbytes  # q/kvn blocks
        # finalize-step flatten temporaries (R + ao_t + masked, f32)
        est += (kv_padw * hdim + 2 * kvh * g * hdim) * 4
        return est + _V3_STACK

    order = ["wo", "w2", "w13"]
    for s_tile in (512, 256, 128, 64, 32):
        if S % s_tile:
            continue
        cur = {"wo": towo, "w13": to13, "w2": to2}
        while need(cur["wo"], cur["w13"], cur["w2"], s_tile) > _V3_LIMIT:
            for name in order:
                if cur[name] > 128 and (cur[name] // 2) % 128 == 0:
                    cur[name] //= 2
                    break
            else:
                break  # all tiles at minimum; try a smaller s_tile
        if need(cur["wo"], cur["w13"], cur["w2"], s_tile) <= _V3_LIMIT:
            return cur["wo"], cur["w13"], cur["w2"], s_tile
    return None


def layer_attn_tail_fused_rowq(wo: QTensor, w13: QTensor, w2: QTensor,
                               ffn_norm, q4, kv_new, kvc, x, pos_vec,
                               li, eps: float, scale: float, hd: int,
                               residual_scale: float = 1.0, interpret=None):
    """Megakernel v3: KV-append + attention + wo + residual + rmsnorm + FFN +
    residual as ONE pallas call per layer (B=1 decode). q4 [1, KV, G, hd];
    kv_new [1, KV, hd+vhd] packed post-RoPE row; kvc PACKED stacked
    [L, 1, KV, S, hd+vhd] (S % 32 == 0, s_tile | S); x [1, 1, D]. Returns
    (new_x, kvc') with the cache aliased (only the 32-row tile containing pos
    written), or None when the shape isn't eligible. Same numerics class as
    the v2 tail kernel (f32 residuals in VMEM; tolerance-gated by tests +
    parity rows); the attention math matches ops/pallas_attention (masked f32
    online softmax over the packed stripe)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    for w in (wo, w13, w2):
        if not (isinstance(w, QTensor) and w.kind == "q8_row"
                and w.qs.ndim == 3 and not w.logical_out):
            return None
    if q4.shape[0] != 1 or x.shape[0] != 1:
        return None  # B=1 decode only
    _, kvh, g, hd_q = q4.shape
    width = kvc.shape[-1]
    vhd = width - hd
    S = kvc.shape[-2]
    if S % 32 or kvc.dtype.itemsize == 1 or hd != vhd:
        return None
    if vhd & (vhd - 1):
        return None  # flatten uses & (vhd-1) / >> log2(vhd) (Mosaic: % and
                     # // lower to ~20x software divides)
    d, hdim = wo.qs.shape[-2:]
    o13 = w13.qs.shape[-2]
    d2, f = w2.qs.shape[-2:]
    if not (hdim == kvh * g * vhd and d == d2 and o13 == 2 * f
            and x.shape[-1] == d):
        return None
    xbytes = 4 if x.dtype == jnp.float32 else 2
    fit = _fit_attn_tail(1, d, hdim, o13, f, kvh, g, width, S,
                         kvc.dtype.itemsize, xbytes)
    if fit is None:
        return None
    towo, to13, to2, s_tile = fit
    from llamatpu.ops.pallas_attention import pack_q

    q4p = pack_q(q4, vhd)
    y, kvc2 = _attn_tail_2d(
        wo.qs, wo.scales, w13.qs, w13.scales, w2.qs, w2.scales, ffn_norm,
        q4p[0], kv_new[0][:, None, :], kvc,
        x.reshape(1, d), pos_vec[0], li, float(eps), float(residual_scale),
        float(scale), int(kvh), int(g), int(hd), towo, to13, to2, s_tile,
        interpret=interpret)
    return y.reshape(1, 1, d).astype(x.dtype), kvc2


# ------------------------------------------------------- norm+qkv kernel
def _qkv_kernel(li_ref, x_ref, nw_ref, w_ref, s_ref, o_ref, h_ref, *,
                eps, dot_dtype):
    s = pl.program_id(0)

    @pl.when(s == 0)
    def _():
        x = x_ref[:].astype(jnp.float32)
        ss = jnp.mean(x * x, axis=-1, keepdims=True) + eps
        h_ref[:] = (x * jax.lax.rsqrt(ss)
                    * nw_ref[0].astype(jnp.float32)).astype(dot_dtype)

    y = jax.lax.dot_general(
        h_ref[:], w_ref[0].astype(dot_dtype),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[:] = y * s_ref[0][:, 0][None, :]


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def _qkv_2d(qs, scales, nw, x2, li, eps, interpret=False):
    L, o, d = qs.shape
    t = x2.shape[0]
    tp = -(-t // 8) * 8
    if tp != t:
        x2 = jnp.pad(x2, ((0, tp - t), (0, 0)))
    to = _pick_to(o, d)
    n = o // to
    dot_dtype = jnp.float32 if x2.dtype == jnp.float32 else jnp.bfloat16
    li_arr = jnp.asarray(li, jnp.int32).reshape(1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((tp, d), lambda s, li_: (0, 0)),
            # [L, 1, D] norm (see _tail_2d note on the Mosaic sublane rule)
            pl.BlockSpec((1, 1, d), lambda s, li_: (li_[0], 0, 0)),
            pl.BlockSpec((1, to, d), lambda s, li_: (li_[0], s, 0)),
            pl.BlockSpec((1, to, 1), lambda s, li_: (li_[0], s, 0)),
        ],
        out_specs=pl.BlockSpec((tp, to), lambda s, li_: (0, s)),
        scratch_shapes=[pltpu.VMEM((tp, d), dot_dtype)],
    )
    y = pl.pallas_call(
        functools.partial(_qkv_kernel, eps=eps, dot_dtype=dot_dtype),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((tp, o), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * tp * o * d,
            bytes_accessed=o * d + tp * d * 2 + tp * o * 4,
            transcendentals=0),
    )(li_arr, x2, nw.reshape(nw.shape[0], 1, d), qs, scales)
    return y[:t] if tp != t else y


def qkv_norm_fused_rowq(wqkv: QTensor, attn_norm, x, li, eps: float,
                        interpret=None):
    """y[..., O] = rmsnorm(x, attn_norm[li]) @ wqkv[li]^T for stacked q8_row
    wqkv [L, O, D] (attn_norm stacked [L, D]). Returns None if not eligible."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if not (isinstance(wqkv, QTensor) and wqkv.kind == "q8_row"
            and wqkv.qs.ndim == 3 and not wqkv.logical_out):
        return None
    lead = x.shape[:-1]
    t = 1
    for dd in lead:
        t *= dd
    if t > _MAX_T:
        return None
    o, d = wqkv.qs.shape[-2:]
    if x.shape[-1] != d:
        return None
    to = _pick_to(o, d)
    if not to:
        return None
    tp = -(-t // 8) * 8
    xbytes = 4 if x.dtype == jnp.float32 else 2
    need = (tp * d * xbytes + tp * d * xbytes     # x block + h scratch
            + 2 * tp * to * 4 + 2 * (to * d + to * 4))
    if need > _VMEM_BUDGET:
        return None
    y = _qkv_2d(wqkv.qs, wqkv.scales, attn_norm, x.reshape(t, d), li,
                float(eps), interpret=interpret)
    return y.reshape(*lead, o).astype(x.dtype)
