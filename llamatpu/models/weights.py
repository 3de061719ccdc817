"""Weight containers.

Quantized weights are kept as depacked pairs (int8 values, f16 block scales) —
the TPU-native layout for GGUF's Q8_0/Q4_0 scheme (34/18-byte interleaved blocks
make sense for byte-addressable GPU buffers, reference tensor/tornado/*.java,
but TPU lanes want contiguous same-dtype arrays; SURVEY.md §7.1). A QTensor of
logical shape [out, in] stores:

    qs:     int8  [..., out, in]          (Q4_0 values depacked to int8 in [-8, 7])
    scales: f16   [..., out, in // 32]    (per-32-element ggml block scales)

Leading batch dims stack layers ([L, ...]) or experts ([L, E, ...]) so the whole
transformer scans over one pytree (replaces the reference's per-layer TaskGraphs,
TornadoVMMasterPlan*.java).
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

BLOCK = 32  # ggml Q8_0/Q4_0 block size


@partial(jax.tree_util.register_dataclass, data_fields=["qs", "scales", "offs"],
         meta_fields=["kind", "logical_out", "layout"])
@dataclass
class QTensor:
    """Block-quantized tensor: int8 values + per-32 f16 scales."""

    qs: jax.Array      # int8 [..., out, in]
    scales: jax.Array  # float32 [..., out, in // 32] (exact upcast of the GGUF
                       # f16 block scales; Mosaic has no f16, and f32 costs only
                       # +1/16 byte/weight of HBM traffic)
    kind: str = "q8_0"  # "q8_0" | "q4_0" (affects only provenance/bit width)
                        # | "q8_row": per-OUT-ROW requant (scales [..., out, 1],
                        # qs CANONICAL) — the TPU serving format for the int8
                        # MXU prefill path + scale-free decode streaming; see
                        # rowq_requant below.
                        # | "q4_k": NATIVE K-quant (gguf/quants.q4_k_views) —
                        # Q4_0-shaped values/scales plus per-32 additive `offs`
                        # (w = qs*scale + off); the offset matmul term rides an
                        # XLA epilogue dot, so all Q4_0 kernels serve it.
    logical_out: int = 0  # real out-features when rows were padded to a lane
                          # multiple (e.g. Phi-3's 32064-row vocab head); 0 = full
    layout: str = "canonical"  # "canonical" | "interleaved" | "packed4"
                               # interleaved stores column j as original
                               # (j % NB)*32 + j//NB so the Pallas kernel's scale
                               # expansion is a lane-tiled repeat instead of an
                               # in-VMEM matmul (~30% decode win); activations
                               # are permuted to match per call.
                               # packed4 = interleaved + two 4-bit values per
                               # byte (Q4_0/Q4_K): byte c of row o holds
                               # interleaved columns c (low nibble) and
                               # c + in//2 (high nibble) — qs is [..., out, in//2].
                               # Halves the HBM footprint; decode speed is
                               # unchanged (the chip is value-rate-bound, see
                               # scripts/stream_diag.py 2026-08-18).
    offs: jax.Array | None = None  # f32 [..., out, in // 32] per-32 ADDITIVE
                                   # offsets (q4_k only): w = qs*scale + off;
                                   # always canonical-block-ordered (the
                                   # offset term never enters the kernels)

    @property
    def shape(self):
        return self.qs.shape

    def dequant(self, dtype=jnp.float32) -> jax.Array:
        """Materialize the full-precision matrix in CANONICAL column order
        (XLA fallback path / tests)."""
        qs = self.qs
        if self.kind == "q8_row":  # scales [..., out, 1] broadcast over in
            return qs.astype(dtype) * self.scales.astype(dtype)
        if self.layout == "packed4":
            qs = deinterleave_columns(unpack4_columns(qs))
        elif self.layout == "interleaved":
            qs = deinterleave_columns(qs)
        s = jnp.repeat(self.scales.astype(dtype), BLOCK, axis=-1)
        w = qs.astype(dtype) * s
        if self.offs is not None:
            w = w + jnp.repeat(self.offs.astype(dtype), BLOCK, axis=-1)
        return w

    def canonical_qs(self) -> jax.Array:
        if self.layout == "packed4":
            return deinterleave_columns(unpack4_columns(self.qs))
        return deinterleave_columns(self.qs) if self.layout == "interleaved" else self.qs


def interleave_columns(qs):
    """Canonical -> interleaved: new column j = original (j % NB)*32 + j//NB,
    i.e. transpose the (NB, 32) block structure to (32, NB). After this, the
    scale of interleaved column j is scales[..., j % NB] — a lane-tiled repeat."""
    *lead, o, i = qs.shape
    nb = i // BLOCK
    x = qs.reshape(*lead, o, nb, BLOCK)
    x = jnp.swapaxes(x, -1, -2) if not isinstance(qs, np.ndarray) else np.swapaxes(x, -1, -2)
    return x.reshape(*lead, o, i)


def deinterleave_columns(qs):
    """Interleaved -> canonical (inverse transpose)."""
    *lead, o, i = qs.shape
    nb = i // BLOCK
    x = qs.reshape(*lead, o, BLOCK, nb)
    x = jnp.swapaxes(x, -1, -2) if not isinstance(qs, np.ndarray) else np.swapaxes(x, -1, -2)
    return x.reshape(*lead, o, i)


def pack4_columns(qs: np.ndarray) -> np.ndarray:
    """Interleaved int8 values in [-8, 7] -> packed nibbles [..., out, in//2]:
    byte c = (col c) | (col c + in//2) << 4. Load-time, numpy."""
    half = qs.shape[-1] // 2
    lo = np.asarray(qs[..., :half]).astype(np.uint8) & 0x0F
    hi = np.asarray(qs[..., half:]).astype(np.uint8) & 0x0F
    return np.ascontiguousarray(lo | (hi << 4)).view(np.int8)


def unpack4_columns(qp) -> jnp.ndarray:
    """Packed nibbles -> interleaved int8 (sign-extended)."""
    p = jnp.asarray(qp).astype(jnp.int32)
    lo = jnp.right_shift(jnp.left_shift(p, 28), 28)
    hi = jnp.right_shift(p, 4)
    return jnp.concatenate([lo, hi], axis=-1).astype(jnp.int8)


def interleave_activation(x2):
    """Permute activation columns to match interleaved weight storage:
    x2 [T, I] -> x2p with x2p[:, j] = x2[:, (j % NB)*32 + j//NB]."""
    t, i = x2.shape
    nb = i // BLOCK
    return jnp.swapaxes(x2.reshape(t, nb, BLOCK), 1, 2).reshape(t, i)


def qtensor_from_gguf(ggml_type, raw: np.ndarray, shape: tuple[int, ...]) -> QTensor:
    """Build a QTensor from raw GGUF block bytes (Q8_0 or Q4_0)."""
    from llamatpu.gguf import quants
    from llamatpu.gguf.ggml_type import GGMLType

    n = int(np.prod(shape))
    if ggml_type == GGMLType.Q8_0:
        qs, scales = quants.q8_0_views(raw, n)
        kind = "q8_0"
    elif ggml_type == GGMLType.Q4_0:
        qs, scales = quants.q4_0_views(raw, n)
        kind = "q4_0"
    else:
        raise ValueError(f"qtensor_from_gguf: {ggml_type!r}")
    qs = np.ascontiguousarray(qs).reshape(*shape[:-1], shape[-1])
    scales = np.ascontiguousarray(scales).astype(np.float32).reshape(*shape[:-1], shape[-1] // BLOCK)
    return QTensor(jnp.asarray(qs), jnp.asarray(scales), kind)


def quantize_array_q8_0(arr: np.ndarray) -> QTensor:
    """Quantize a float array (numpy) to a Q8_0 QTensor (ggml-order encode)."""
    from llamatpu.gguf import quants
    from llamatpu.gguf.ggml_type import GGMLType

    raw = quants.quantize_q8_0(np.asarray(arr, dtype=np.float32).reshape(-1))
    return qtensor_from_gguf(GGMLType.Q8_0, raw, tuple(arr.shape))


def quantize_array_q4_0(arr: np.ndarray) -> QTensor:
    """Quantize a float array (numpy) to a Q4_0 QTensor (ggml-order encode)."""
    from llamatpu.gguf import quants
    from llamatpu.gguf.ggml_type import GGMLType

    raw = quants.quantize_q4_0(np.asarray(arr, dtype=np.float32).reshape(-1))
    return qtensor_from_gguf(GGMLType.Q4_0, raw, tuple(arr.shape))


def quantize_array_q4_k(arr: np.ndarray) -> QTensor:
    """Quantize a float array (numpy) to a NATIVE Q4_K QTensor (ggml-order
    superblock encode -> kernel layout with per-32 scales + additive offs)."""
    from llamatpu.gguf import quants

    raw = quants.quantize_q4_k(np.asarray(arr, dtype=np.float32).reshape(-1))
    qs, scales, offs = quants.q4_k_views(raw, arr.size)
    shape = tuple(arr.shape)
    return QTensor(np.ascontiguousarray(qs).reshape(*shape[:-1], shape[-1]),
                   np.ascontiguousarray(scales).reshape(*shape[:-1], shape[-1] // BLOCK),
                   "q4_k", offs=np.ascontiguousarray(offs).reshape(
                       *shape[:-1], shape[-1] // BLOCK))


def quantize_array_q5_k(arr: np.ndarray) -> QTensor:
    """Quantize a float array (numpy) to a NATIVE Q5_K QTensor (ggml-order
    superblock encode -> int8 kernel layout with per-32 scales + offs)."""
    from llamatpu.gguf import quants

    raw = quants.quantize_q5_k(np.asarray(arr, dtype=np.float32).reshape(-1))
    qs, scales, offs = quants.q5_k_views(raw, arr.size)
    shape = tuple(arr.shape)
    return QTensor(np.ascontiguousarray(qs).reshape(*shape[:-1], shape[-1]),
                   np.ascontiguousarray(scales).reshape(*shape[:-1], shape[-1] // BLOCK),
                   "q5_k", offs=np.ascontiguousarray(offs).reshape(
                       *shape[:-1], shape[-1] // BLOCK))


def pad_qtensor_rows(w: QTensor, multiple: int = 128) -> QTensor:
    """Zero-pad the out-features axis to a lane multiple so the Pallas matmul
    can tile it; consumers slice y[..., :logical_out] (ops/matmul.py)."""
    o = w.qs.shape[-2]
    if o % multiple == 0:
        return w
    pad = multiple - o % multiple
    widths = [(0, 0)] * (w.qs.ndim - 2) + [(0, pad), (0, 0)]
    qs = np.pad(np.asarray(w.qs), widths)
    scales = np.pad(np.asarray(w.scales), widths)
    offs = None if w.offs is None else np.pad(np.asarray(w.offs), widths)
    return QTensor(qs, scales, w.kind, logical_out=o, layout=w.layout, offs=offs)


def prepare_qtensor(w: QTensor, pack4: bool = False) -> QTensor:
    """Load-time prep for the Pallas path: lane-pad rows + interleave columns
    (numpy, one-time). With pack4 (Q4_0 only), additionally pack nibble pairs
    across column halves — half the HBM footprint, same decode speed
    (value-rate-bound chip).

    Big matrices (vocab heads) pad to 1024 rows so the kernel can pick
    ~2.25 MB weight blocks: measured on-chip, 0.56 MB blocks stream at
    ~600 GB/s vs ~745 GB/s for 2.25 MB — worth the <=1023 padded rows."""
    big = w.qs.shape[-2] >= 32768
    w = pad_qtensor_rows(w, multiple=1024 if big else 128)
    if w.layout != "canonical":
        return w
    qs = interleave_columns(np.asarray(w.qs))
    # offs stay canonical-block-ordered: the offset term never enters the
    # kernel (xbsum epilogue dot, ops/pallas_matmul.py)
    if pack4 and w.kind in ("q4_0", "q4_k"):
        return QTensor(pack4_columns(qs), w.scales, w.kind, w.logical_out,
                       layout="packed4", offs=w.offs)
    return QTensor(qs, w.scales, w.kind, w.logical_out, layout="interleaved",
                   offs=w.offs)


def rowq_requant(w: QTensor) -> QTensor:
    """Requantize a Q8_0 tensor to per-OUT-ROW int8 (`q8_row`): one f32 scale
    per output row instead of one f16 per 32 inputs.

    This is a deliberate TPU-serving trade (measured by bench/parity.py's
    `q8_row` rows, gated in tests/test_parity_gate.py):
    - decode streams 1.0 byte/weight instead of 1.125 (block scales gone) and
      the in-kernel dequant collapses to an int8->bf16 cast — the row scale
      multiplies the [T, O] OUTPUT outside the kernel, where XLA fuses it
    - prefill/batch can feed the int8 values STRAIGHT to the MXU's native
      int8xint8->int32 path (2x bf16 peak) with per-token activation scales
      (ops/int8_prefill.py) — the reference has no analog tier (its int8 dot
      is the CPU block-dot, Q8_0FloatTensor.java:90-121)
    - cost: a second rounding against the row max; rows mixing very different
      block magnitudes lose low bits (the parity table quantifies it)

    Input may be canonical or interleaved (load-time layouts); output is
    CANONICAL — per-row scales have no column structure, so the interleave
    permutation buys nothing. Processes layer-by-layer to bound the f32
    dequant working set (an 8B w13 stack is ~15 GB at once). Numpy, load-time.
    """
    assert w.kind == "q8_0", f"rowq_requant: want q8_0, got {w.kind}"
    assert w.offs is None
    qs = np.asarray(w.qs)
    scales = np.asarray(w.scales)
    if w.layout == "interleaved":
        qs = deinterleave_columns(qs)
    else:
        assert w.layout == "canonical", "rowq_requant: packed4 is Q4_0-only"
    lead = qs.shape[:-2]
    qs2 = qs.reshape(-1, *qs.shape[-2:])
    sc2 = scales.reshape(-1, *scales.shape[-2:])
    out_q = np.empty_like(qs2)
    out_s = np.empty((qs2.shape[0], qs2.shape[1], 1), np.float32)
    for l in range(qs2.shape[0]):
        v = qs2[l].astype(np.float32) * np.repeat(sc2[l], BLOCK, axis=-1)
        r = np.max(np.abs(v), axis=-1, keepdims=True) / 127.0  # [O, 1]
        inv = np.where(r > 0, 1.0 / np.where(r > 0, r, 1.0), 0.0)
        s = v * inv
        out_q[l] = np.trunc(s + np.copysign(0.5, s)).astype(np.int8)
        out_s[l] = r
    return QTensor(out_q.reshape(*lead, *qs.shape[-2:]),
                   out_s.reshape(*lead, qs.shape[-2], 1),
                   kind="q8_row", logical_out=w.logical_out, layout="canonical")


def _rowq_from_f32(v: np.ndarray):
    """[O, I] f32 -> (int8 [O, I], f32 [O, 1]) per-out-row symmetric quant
    (same rounding as rowq_requant's inner step)."""
    r = np.max(np.abs(v), axis=-1, keepdims=True) / 127.0
    inv = np.where(r > 0, 1.0 / np.where(r > 0, r, 1.0), 0.0)
    s = v * inv
    q = np.trunc(s + np.copysign(0.5, s)).astype(np.int8)
    return q, r.astype(np.float32)


def _col_eq_scale(v: np.ndarray, clip: float = 4.0) -> np.ndarray:
    """Per-input-column equalization scale: s_j = sqrt(colamax_j / gmean),
    clipped. Dividing W's columns by s flattens outlier input channels so the
    per-ROW amax no longer coarsens every other weight in the row."""
    a = np.max(np.abs(v), axis=0)
    pos = a[a > 0]
    if pos.size == 0:
        return np.ones_like(a)
    g = np.exp(np.mean(np.log(pos)))
    s = np.sqrt(np.where(a > 0, a, g) / g)
    return np.clip(s, 1.0 / clip, clip).astype(np.float32)


def equalize_rowq_layers(layers: dict) -> dict:
    """EQUALIZED q8_row (exact algebra, zero runtime cost): before the
    per-row requant, divide each matmul's input columns by an equalization
    scale and fold the inverse into the op that produces its input —

      wqkv columns  -> attn_norm rows   (x enters wqkv straight from rmsnorm)
      w13 columns   -> ffn_norm rows
      w2 columns    -> w13's UP rows    (act = silu(gate) * up is LINEAR in
                                         up, so scaling up's output rows
                                         rescales w2's input channels exactly)

    Why: q8_row keeps ONE scale per output row; an outlier input channel
    inflates the row amax and coarsens every other weight in the row. On the
    heavy-tailed outlier-channel spectrum (bench/parity.apply_spectrum) plain
    q8_row measured ~4x q8_0's ppl delta — this fold recovers most of it while
    keeping the 1.0 byte/weight stream (measured: tests/test_parity_gate.py
    llama-heavy rows + PARITY.md). alpha = 0.5 (sqrt) balances the weight-side
    win against the activation scaling the a8 prefill path quantizes.
    wo keeps plain rowq (its fold would scale cached V channels — int8-KV
    interaction not worth the 5%-of-bytes tensor). SmoothQuant/AWQ are the
    public ancestors of the trick; here it is exact (no calibration data —
    weight-only equalization folded into existing per-channel ops).

    Input: stacked layers dict — FUSED (wqkv/w13/w2 q8_0 [L, O, I]) or
    UNFUSED (wq/wk/wv/w1/w3/w2; the parity harness scores unfused masters) —
    plus attn_norm/ffn_norm [L, D]. Returns a new dict with the eligible
    matmuls as q8_row QTensors and the norms scaled; non-eligible dicts
    return unchanged."""
    import os

    fused = all(k in layers for k in ("wqkv", "w13"))
    qkv_keys = ("wqkv",) if fused else ("wq", "wk", "wv")
    ffn_keys = ("w13",) if fused else ("w1", "w3")
    mm_keys = qkv_keys + ffn_keys + ("w2",)
    need = mm_keys + ("attn_norm", "ffn_norm")
    if os.environ.get("LLAMATPU_NO_ROWQ_EQ") or not all(k in layers for k in need):
        return layers
    for k in mm_keys:
        t = layers[k]
        if not (isinstance(t, QTensor) and t.kind == "q8_0" and t.offs is None
                and t.layout in ("canonical", "interleaved")):
            return layers
    out = dict(layers)

    def deq(t: QTensor, l: int) -> np.ndarray:
        qs = np.asarray(t.qs[l])
        if t.layout == "interleaved":
            qs = deinterleave_columns(qs)
        return qs.astype(np.float32) * np.repeat(np.asarray(t.scales[l]),
                                                 BLOCK, axis=-1)

    L = layers["w2"].qs.shape[0]
    f = layers["w2"].qs.shape[-1]
    an = np.array(np.asarray(layers["attn_norm"]), np.float32, copy=True)
    fn = np.array(np.asarray(layers["ffn_norm"]), np.float32, copy=True)
    parts = {k: ([], []) for k in mm_keys}

    def push(k, v):
        q, r = _rowq_from_f32(v)
        parts[k][0].append(q)
        parts[k][1].append(r)

    for l in range(L):
        v2 = deq(layers["w2"], l)            # [D, F]
        s_f = _col_eq_scale(v2)
        v2 = v2 / s_f[None, :]
        push("w2", v2)
        ffn = {k: deq(layers[k], l) for k in ffn_keys}
        # up rows absorb w2's fold (act = silu(gate) * up is linear in up);
        # apply to the LOGICAL rows only — up rows may be lane-padded past
        # w2's in-features (pad_qtensor_rows), and padded rows are zero
        if fused:
            if ffn["w13"].shape[0] != 2 * f:
                return layers  # padded fused stack: fold mapping ambiguous
            ffn["w13"][f:] *= s_f[:, None]
        else:
            ffn["w3"][:f] *= s_f[:, None]
        s_d2 = _col_eq_scale(np.concatenate(list(ffn.values()), axis=0))
        fn[l] *= s_d2
        for k in ffn_keys:
            push(k, ffn[k] / s_d2[None, :])
        qkv = {k: deq(layers[k], l) for k in qkv_keys}
        s_d = _col_eq_scale(np.concatenate(list(qkv.values()), axis=0))
        an[l] *= s_d
        for k in qkv_keys:
            push(k, qkv[k] / s_d[None, :])
    for k in mm_keys:
        t = layers[k]
        out[k] = QTensor(np.stack(parts[k][0]), np.stack(parts[k][1]),
                         kind="q8_row", logical_out=t.logical_out,
                         layout="canonical")
    out["attn_norm"] = an.astype(np.asarray(layers["attn_norm"]).dtype)
    out["ffn_norm"] = fn.astype(np.asarray(layers["ffn_norm"]).dtype)
    return out


def rowq_convert_weights(weights: dict, experts: bool = True) -> dict:
    """Convert every dense-path Q8_0 QTensor in a (fused) weights pytree to
    q8_row — attention/FFN/shared-expert/vocab-head switch to the row-scale
    serving format. With experts=True (default) the MoE routed-expert stacks
    convert too (the grouped kernels have a rowq variant, ops/moe_grouped.py:
    scale-free expert streams, per-row scale folded into the output)."""
    skip = set() if experts else {"gate_exps", "up_exps", "gu_exps",
                                  "down_exps"}
    converted = 0
    eq_layers = equalize_rowq_layers(weights["layers"])
    converted += sum(1 for k in ("wqkv", "w13", "w2")
                     if isinstance(eq_layers.get(k), QTensor)
                     and eq_layers[k].kind == "q8_row")
    layers = {}
    for k, v in eq_layers.items():
        if k not in skip and isinstance(v, QTensor) and v.kind == "q8_0":
            v = rowq_requant(v)
            converted += 1
        layers[k] = v
    out = dict(weights)
    out["layers"] = layers
    if isinstance(out.get("wcls"), QTensor) and out["wcls"].kind == "q8_0":
        out["wcls"] = rowq_requant(out["wcls"])
        converted += 1
    if not converted:
        # --rowq on a non-Q8_0 checkpoint would otherwise silently no-op
        # (rowq only requantizes q8_0 tensors); make the mismatch loud
        import warnings

        warnings.warn(
            "--rowq had no effect: no Q8_0 tensors in the checkpoint "
            "(q8_row is a Q8_0 requant format; convert the model to Q8_0 "
            "first or drop --rowq)", stacklevel=2)
    return out


def stack_qtensors(ts: list[QTensor]) -> QTensor:
    offs = (jnp.stack([t.offs for t in ts])
            if ts[0].offs is not None else None)
    return QTensor(jnp.stack([t.qs for t in ts]),
                   jnp.stack([t.scales for t in ts]), ts[0].kind, offs=offs)


def _concat_rows(ts: list[QTensor]) -> QTensor:
    qs = np.concatenate([np.asarray(t.qs) for t in ts], axis=-2)
    scales = np.concatenate([np.asarray(t.scales) for t in ts], axis=-2)
    offs = (np.concatenate([np.asarray(t.offs) for t in ts], axis=-2)
            if ts[0].offs is not None else None)
    return QTensor(qs, scales, ts[0].kind, logical_out=0, layout=ts[0].layout,
                   offs=offs)


def _fusable(ts: list[QTensor]) -> bool:
    return (all(isinstance(t, QTensor) for t in ts)
            and len({t.kind for t in ts}) == 1
            and len({t.offs is None for t in ts}) == 1
            and len({t.layout for t in ts}) == 1
            and all(not t.logical_out for t in ts)
            and len({t.qs.shape[-1] for t in ts}) == 1)


def _unpack4_columns_np(qp: np.ndarray) -> np.ndarray:
    """numpy inverse of pack4_columns (packed nibbles -> interleaved int8)."""
    p = np.asarray(qp).astype(np.int32)
    lo = (p << 28) >> 28
    hi = p >> 4
    return np.concatenate([lo, hi], axis=-1).astype(np.int8)


def _to_canonical_np(w: QTensor) -> tuple[np.ndarray, str]:
    """(canonical int8 qs, original layout) for a prepped QTensor (numpy)."""
    qs = np.asarray(w.qs)
    if w.layout == "packed4":
        qs = deinterleave_columns(_unpack4_columns_np(qs))
    elif w.layout == "interleaved":
        qs = deinterleave_columns(qs)
    return qs, w.layout


def _from_canonical_np(qs: np.ndarray, layout: str) -> np.ndarray:
    if layout == "canonical":
        return qs
    il = interleave_columns(qs)
    return pack4_columns(il) if layout == "packed4" else il


def fold_shared_expert(cfg, layers: dict) -> dict:
    """Fold the always-on shared expert into the routed expert stacks as
    S = hidden_dim / moe_hidden_dim VIRTUAL experts (Qwen1.5-MoE: 5632/1408
    = 4), each assigned to every token with the sigmoid shared-gate weight.

    Exact by construction: silu/mul are elementwise (row partition of
    gate/up commutes), and the down projection's partial outputs over
    column chunks sum — so S chunk-experts, each weighted shared_w, equal
    shared_w * shared_down(act) (InferenceCore.java:366-415 semantics).

    Why: MoE decode is per-call pipeline-fill-bound; folding removes the two
    shared-expert pallas calls per layer AND doubles the grouped call's
    weight stream (shared bytes ~= active routed bytes at Qwen1.5 geometry).
    Down-projection chunks are cut in CANONICAL column space (the interleave
    permutation is global over the in-features, so the prepped tensor is
    de/re-interleaved per chunk — numpy, load-time). The per-token routing
    extension happens in transformer._moe_ffn (pallas grouped path only; the
    xla scan path keeps the explicit shared-expert reference semantics)."""
    import os

    if os.environ.get("LLAMATPU_NO_SHARED_FOLD"):
        # escape hatch for HBM-tight configs: folding grows the expert stacks
        # by S virtual experts (~7% at Qwen1.5 geometry), which pushed the
        # q4_0p 14.3B preset past a 16G chip's prefill memory plan
        # (found on chip 2026-08-21)
        return layers
    need = ("gate_exps", "up_exps", "down_exps",
            "shared_gate", "shared_up", "shared_down")
    if not all(k in layers for k in need):
        return layers
    mh = layers["gate_exps"].qs.shape[-2] if isinstance(layers["gate_exps"], QTensor) \
        else layers["gate_exps"].shape[-2]
    sh = layers["shared_gate"].qs.shape[-2] if isinstance(layers["shared_gate"], QTensor) \
        else layers["shared_gate"].shape[-2]
    if mh == 0 or sh % mh:
        return layers
    s = sh // mh
    ts = [layers[k] for k in need]
    if not all(isinstance(t, QTensor) for t in ts):
        return layers
    if len({t.kind for t in ts}) != 1 or len({t.layout for t in ts}) != 1 \
            or any(t.logical_out for t in ts):
        return layers

    def chunk_rows(t: QTensor) -> QTensor:
        """[L, S*MH, D] -> [L, S, MH, D] (rows are never interleaved)."""
        L = t.qs.shape[0]
        qs = np.asarray(t.qs).reshape(L, s, mh, t.qs.shape[-1])
        sc = np.asarray(t.scales).reshape(L, s, mh, t.scales.shape[-1])
        offs = (None if t.offs is None
                else np.asarray(t.offs).reshape(L, s, mh, t.offs.shape[-1]))
        return QTensor(qs, sc, t.kind, 0, t.layout, offs=offs)

    def chunk_cols(t: QTensor) -> QTensor:
        """[L, D, S*MH] -> [L, S, D, MH] in canonical column space."""
        L, d = t.qs.shape[0], t.qs.shape[1]
        qs, layout = _to_canonical_np(t)
        qs = qs.reshape(L, d, s, mh).transpose(0, 2, 1, 3)
        qs = _from_canonical_np(np.ascontiguousarray(qs), layout)
        nb = t.scales.shape[-1] // s
        sc = np.asarray(t.scales).reshape(L, d, s, nb).transpose(0, 2, 1, 3)
        offs = (None if t.offs is None else
                np.asarray(t.offs).reshape(L, d, s, nb).transpose(0, 2, 1, 3))
        return QTensor(np.ascontiguousarray(qs), np.ascontiguousarray(sc),
                       t.kind, 0, t.layout,
                       offs=None if offs is None else np.ascontiguousarray(offs))

    def cat(stack: QTensor, extra: QTensor) -> QTensor:
        offs = (None if stack.offs is None else
                np.concatenate([np.asarray(stack.offs), np.asarray(extra.offs)], axis=1))
        return QTensor(
            np.concatenate([np.asarray(stack.qs), np.asarray(extra.qs)], axis=1),
            np.concatenate([np.asarray(stack.scales), np.asarray(extra.scales)], axis=1),
            stack.kind, 0, stack.layout, offs=offs)

    out = dict(layers)
    out["gate_exps"] = cat(layers["gate_exps"], chunk_rows(layers["shared_gate"]))
    out["up_exps"] = cat(layers["up_exps"], chunk_rows(layers["shared_up"]))
    out["down_exps"] = cat(layers["down_exps"], chunk_cols(layers["shared_down"]))
    del out["shared_gate"], out["shared_up"], out["shared_down"]
    return out


def fuse_layer_weights(cfg, weights: dict) -> dict:
    """Fuse per-layer projections sharing the same input into single wider
    matmuls: wq+wk+wv -> wqkv and w1+w3 -> w13 (rows are independent, so a
    row-concat is bit-exact; the forward splits the output columns).

    Mirrors the reference's fusedQKVMatmul kernel tier
    (TransformerComputeKernelsLayered.java:2773-2945) but done once at load.
    Why it wins on TPU: decode is one weight-stream per token, and fewer,
    larger kernels mean fewer pipeline fills and bigger DMA blocks (wk/wv at
    llama-1b geometry stream at ~330 GB/s alone vs ~745 GB/s fused).
    Only applies to unsharded serving — tensor-parallel layouts shard q/k/v
    per head and keep the unfused names (parallel/shard.py)."""
    layers = dict(weights["layers"])
    if getattr(cfg, "is_moe", False):
        # fold the shared expert into the routed stacks BEFORE fusing, so the
        # gate/up fusion below fuses the EXTENDED stacks and the shared_g13
        # fusion no-ops (its keys are consumed)
        layers = fold_shared_expert(cfg, layers)
    qkv = [layers.get(k) for k in ("wq", "wk", "wv")]
    if all(t is not None for t in qkv) and _fusable(qkv):
        layers["wqkv"] = _concat_rows(qkv)
        del layers["wq"], layers["wk"], layers["wv"]
    w13 = [layers.get(k) for k in ("w1", "w3")]
    if all(t is not None for t in w13) and _fusable(w13):
        layers["w13"] = _concat_rows(w13)
        del layers["w1"], layers["w3"]
    sh = [layers.get(k) for k in ("shared_gate", "shared_up")]
    if all(t is not None for t in sh) and _fusable(sh):
        layers["shared_g13"] = _concat_rows(sh)
        del layers["shared_gate"], layers["shared_up"]
    # routed expert gate+up stacks fuse the same way ([L, E, O, I] row
    # concat): halves the grouped-kernel calls per MoE layer and doubles the
    # per-call weight stream (decode is per-call pipeline-fill-bound, PERF.md)
    gu = [layers.get(k) for k in ("gate_exps", "up_exps")]
    if all(t is not None for t in gu) and _fusable(gu):
        layers["gu_exps"] = _concat_rows(gu)
        del layers["gate_exps"], layers["up_exps"]
    out = dict(weights)
    out["layers"] = layers
    return out


def serving_weights(cfg, weights: dict, mesh=None, ep: bool = False,
                    rowq: bool = False, rowq_experts: bool | None = None):
    """Load-time weight prep shared by Engine/BatchEngine/PagedBatchEngine:
    fuse per-layer projections (unsharded only — tensor-parallel layouts shard
    q/k/v per head and keep the unfused names), optionally requantize Q8_0 to
    the q8_row serving format, then device_put with the mesh shardings.
    rowq_experts: also convert MoE routed-expert stacks (default: follow
    `rowq` — the grouped kernels have a rowq variant, ops/moe_grouped.py)."""
    import jax as _jax

    if mesh is not None:
        from llamatpu.parallel import shard_model

        if rowq:
            weights = rowq_convert_weights(
                weights, experts=rowq if rowq_experts is None else rowq_experts)
        return shard_model(weights, cfg, mesh, ep=ep)
    w = fuse_layer_weights(cfg, weights)
    if rowq:
        w = rowq_convert_weights(
            w, experts=rowq if rowq_experts is None else rowq_experts)
    return _jax.device_put(w)


def stack_weights(ws: list) -> object:
    """Stack per-layer weights (arrays or QTensors) along a new leading axis."""
    if isinstance(ws[0], QTensor):
        return stack_qtensors(ws)
    return jnp.stack(ws)
