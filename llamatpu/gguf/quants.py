"""Vectorized (numpy) GGML block-quant codecs.

Dequantization semantics follow the reference CPU tensors bit-for-bit
(/root/reference/src/main/java/org/beehive/gpullama3/tensor/standard/
 Q8_0FloatTensor.java:54-66, Q4_0FloatTensor.java:57-71, Q4_KFloatTensor.java,
 Q5_KFloatTensor.java, Q6_KFloatTensor.java), which themselves mirror ggml.

Quantization (used for tests, for K-quant->Q8_0 requant at load time, and for
activation quantization parity) follows ggml's order: derive int8 values with the
full-precision scale, round half away from zero, store the scale as f16
(reference: Q8_0FloatTensor.dotQ8Activation, ModelLoader.dequantizeToQ8_0TornadoTensor
 /root/reference/.../model/loader/ModelLoader.java:173-224).

Array layout convention for the TPU side: quantized weights are kept depacked as
`qs` int8 arrays plus `scales` float16 arrays (separate, contiguous) because TPU
kernels want lane-aligned dtypes, not 34-byte interleaved blocks (SURVEY.md §7.1).
"""
from __future__ import annotations

import numpy as np

from llamatpu.gguf.ggml_type import GGMLType, QK_K


def _f16(u16: np.ndarray) -> np.ndarray:
    return u16.view(np.float16).astype(np.float32)


# ---------------------------------------------------------------------------
# Q8_0: 32-element blocks, f16 scale + 32 int8
# ---------------------------------------------------------------------------

def q8_0_views(raw: np.ndarray, n_elements: int) -> tuple[np.ndarray, np.ndarray]:
    """Zero-copy split of raw Q8_0 block bytes into (qs int8 [nb, 32], scales f16 [nb])."""
    nb = n_elements // 32
    blocks = raw[: nb * 34].reshape(nb, 34)
    scales = np.ascontiguousarray(blocks[:, :2]).view(np.float16).reshape(nb)
    qs = blocks[:, 2:].view(np.int8)
    return qs, scales


def dequantize_q8_0(raw: np.ndarray, n_elements: int) -> np.ndarray:
    qs, scales = q8_0_views(raw, n_elements)
    return (qs.astype(np.float32) * scales.astype(np.float32)[:, None]).reshape(-1)


def quantize_q8_0(values: np.ndarray) -> np.ndarray:
    """ggml-order Q8_0 quantization: int8 from full-precision scale, f16 stored scale,
    round half away from zero."""
    values = np.asarray(values, dtype=np.float32)
    assert values.size % 32 == 0
    v = values.reshape(-1, 32)
    amax = np.max(np.abs(v), axis=1)
    d = amax / 127.0
    inv = np.where(d != 0.0, np.divide(1.0, d, out=np.zeros_like(d), where=d != 0), 0.0)
    s = v * inv[:, None]
    q = np.trunc(s + np.copysign(0.5, s)).astype(np.int8)  # round half away from zero
    nb = v.shape[0]
    out = np.empty((nb, 34), dtype=np.uint8)
    out[:, :2] = d.astype(np.float16)[:, None].view(np.uint8)
    out[:, 2:] = q.view(np.uint8)
    return out.reshape(-1)


# ---------------------------------------------------------------------------
# Q4_0: 32-element blocks, f16 scale + 16 bytes; elem j in low nibble, j+16 high
# ---------------------------------------------------------------------------

def q4_0_views(raw: np.ndarray, n_elements: int) -> tuple[np.ndarray, np.ndarray]:
    """Depack raw Q4_0 into (qs int8 [nb, 32] with values in [-8, 7], scales f16 [nb])."""
    nb = n_elements // 32
    blocks = raw[: nb * 18].reshape(nb, 18)
    scales = np.ascontiguousarray(blocks[:, :2]).view(np.float16).reshape(nb)
    packed = blocks[:, 2:]
    qs = np.empty((nb, 32), dtype=np.int8)
    qs[:, :16] = (packed & 0x0F).astype(np.int8) - 8
    qs[:, 16:] = (packed >> 4).astype(np.int8) - 8
    return qs, scales


def dequantize_q4_0(raw: np.ndarray, n_elements: int) -> np.ndarray:
    qs, scales = q4_0_views(raw, n_elements)
    return (qs.astype(np.float32) * scales.astype(np.float32)[:, None]).reshape(-1)


def quantize_q4_0(values: np.ndarray) -> np.ndarray:
    """ggml-order Q4_0: d = max-abs/-8 signed-max trick (ggml uses amax value with sign)."""
    values = np.asarray(values, dtype=np.float32)
    assert values.size % 32 == 0
    v = values.reshape(-1, 32)
    # ggml picks the element with max |x| and uses d = x_max / -8
    idx = np.argmax(np.abs(v), axis=1)
    maxv = v[np.arange(v.shape[0]), idx]
    d = maxv / -8.0
    inv = np.where(d != 0.0, 1.0 / d, 0.0)
    q = np.clip((v * inv[:, None]) + 8.5, 0.0, 15.0).astype(np.uint8)
    nb = v.shape[0]
    out = np.empty((nb, 18), dtype=np.uint8)
    out[:, :2] = d.astype(np.float16)[:, None].view(np.uint8)
    out[:, 2:] = (q[:, :16] | (q[:, 16:] << 4)).astype(np.uint8)
    return out.reshape(-1)


# ---------------------------------------------------------------------------
# K-quants (256-element super-blocks) — decode only
# ---------------------------------------------------------------------------

def _kquant_scales_mins(scale_bytes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Unpack the 12-byte 6-bit scale/min encoding of Q4_K/Q5_K into ([nb,8], [nb,8])."""
    b = scale_bytes.astype(np.uint16)  # [nb, 12]
    sc = np.empty(b.shape[:1] + (8,), dtype=np.int32)
    mn = np.empty_like(sc)
    for j in range(4):
        sc[:, j] = b[:, j] & 63
        mn[:, j] = b[:, j + 4] & 63
    for j in range(4, 8):
        sc[:, j] = (b[:, j + 4] & 0x0F) | ((b[:, j - 4] >> 6) << 4)
        mn[:, j] = (b[:, j + 4] >> 4) | ((b[:, j] >> 6) << 4)
    return sc, mn


def q4_k_views(raw: np.ndarray, n_elements: int):
    """Depack raw Q4_K superblocks into the NATIVE TPU compute layout:
    (qs int8 [nb32, 32] values in [-8, 7], scales f32 [nb32], offs f32 [nb32])
    with nb32 = n/32 ordinary 32-element blocks, such that

        w[j] = qs[j] * scales[block(j)] + offs[block(j)]

    exactly equals the reference dequant (Q4_KFloatTensor.java getFloat:
    d*sc*q - dmin*m, q in [0,15]): qs stores q-8 so the whole Q4_0 kernel
    machinery (interleave, pack4 nibbles, in-kernel per-32 scale expansion)
    applies unchanged, and the additive offset term absorbs the shift:
    offs = 8*d*sc - dmin*m. The offset contribution to a matmul is
    xbsum @ offs^T (per-32-block activation sums), computed OUTSIDE the
    kernel as an XLA epilogue dot (ops/pallas_matmul.py). f32 scales/offs are
    exact (f16 d/dmin x 6-bit int products need 17 significand bits)."""
    nb = n_elements // QK_K
    blocks = raw[: nb * 144].reshape(nb, 144)
    d = _f16(np.ascontiguousarray(blocks[:, 0:2]).view(np.uint16).reshape(nb))
    dmin = _f16(np.ascontiguousarray(blocks[:, 2:4]).view(np.uint16).reshape(nb))
    sc, mn = _kquant_scales_mins(blocks[:, 4:16])
    qsrc = blocks[:, 16:]  # [nb, 128]
    qs = np.empty((nb, QK_K), dtype=np.int8)
    for pair in range(4):  # 64-elem pairs: low nibbles -> sub 2p, high -> 2p+1
        chunk = qsrc[:, pair * 32 : (pair + 1) * 32]
        qs[:, pair * 64 : pair * 64 + 32] = (chunk & 0x0F).astype(np.int8) - 8
        qs[:, pair * 64 + 32 : pair * 64 + 64] = (chunk >> 4).astype(np.int8) - 8
    scales = (d[:, None] * sc.astype(np.float32))            # [nb, 8]
    offs = 8.0 * scales - dmin[:, None] * mn.astype(np.float32)
    return (qs.reshape(-1, 32),
            np.ascontiguousarray(scales, dtype=np.float32).reshape(-1),
            np.ascontiguousarray(offs, dtype=np.float32).reshape(-1))


def q5_k_views(raw: np.ndarray, n_elements: int):
    """Depack raw Q5_K superblocks into the NATIVE TPU compute layout:
    (qs int8 [nb32, 32] values in [-16, 15], scales f32 [nb32], offs f32
    [nb32]) such that w[j] = qs[j] * scales[block(j)] + offs[block(j)]
    exactly equals the reference dequant (Q5_KFloatTensor.java getFloat:
    d*sc*q - dmin*m, q in [0, 31] from nibble + qh bit): qs stores q-16 so
    the whole Q8_0-class int8 kernel machinery applies unchanged (5-bit
    values are just small int8s), and the additive offset absorbs the shift:
    offs = 16*d*sc - dmin*m. The offset matmul term rides the same xbsum
    epilogue dot as q4_k (ops/pallas_matmul.py). vs the Q8_0 requant this is
    EXACT (single rounding at the original encode) and streams 1.0 B/w + f32
    scale/off instead of 1.0 + block-scale + requant loss."""
    nb = n_elements // QK_K
    blocks = raw[: nb * 176].reshape(nb, 176)
    d = _f16(np.ascontiguousarray(blocks[:, 0:2]).view(np.uint16).reshape(nb))
    dmin = _f16(np.ascontiguousarray(blocks[:, 2:4]).view(np.uint16).reshape(nb))
    sc, mn = _kquant_scales_mins(blocks[:, 4:16])
    qh = blocks[:, 16:48]   # [nb, 32]
    qsrc = blocks[:, 48:176]  # [nb, 128]
    qs = np.empty((nb, QK_K), dtype=np.int8)
    for pair in range(4):  # 64-elem pairs: low nibbles -> sub 2p, high -> 2p+1
        chunk = qsrc[:, pair * 32 : (pair + 1) * 32]
        lo = (chunk & 0x0F).astype(np.int16) | (((qh >> (pair * 2)) & 1).astype(np.int16) << 4)
        hi = (chunk >> 4).astype(np.int16) | (((qh >> (pair * 2 + 1)) & 1).astype(np.int16) << 4)
        qs[:, pair * 64 : pair * 64 + 32] = (lo - 16).astype(np.int8)
        qs[:, pair * 64 + 32 : pair * 64 + 64] = (hi - 16).astype(np.int8)
    scales8 = d[:, None] * sc.astype(np.float32)             # [nb, 8] per-32
    offs8 = 16.0 * scales8 - dmin[:, None] * mn.astype(np.float32)
    return (qs.reshape(-1, 32),
            np.ascontiguousarray(scales8, dtype=np.float32).reshape(-1),
            np.ascontiguousarray(offs8, dtype=np.float32).reshape(-1))


def quantize_q5_k(values: np.ndarray) -> np.ndarray:
    """Encode f32 values as Q5_K superblocks (ggml layout; simplified
    single-pass scale search, see quantize_q4_k)."""
    values = np.asarray(values, dtype=np.float32)
    assert values.size % QK_K == 0
    v = values.reshape(-1, 8, 32)
    nb = v.shape[0]
    vmax = v.max(axis=-1)
    mins_f = np.maximum(-v.min(axis=-1), 0.0)
    scales_f = np.maximum(vmax + mins_f, 0.0) / 31.0
    d = scales_f.max(axis=-1) / 63.0
    dmin = mins_f.max(axis=-1) / 63.0
    d16 = d.astype(np.float16)
    dmin16 = dmin.astype(np.float16)
    df, dminf = d16.astype(np.float32), dmin16.astype(np.float32)
    with np.errstate(divide="ignore", invalid="ignore"):
        sc = np.where(df[:, None] > 0,
                      np.clip(np.round(scales_f / df[:, None]), 0, 63), 0
                      ).astype(np.int32)
        mn = np.where(dminf[:, None] > 0,
                      np.clip(np.round(mins_f / dminf[:, None]), 0, 63), 0
                      ).astype(np.int32)
        eff_s = df[:, None] * sc
        q = np.where(eff_s[..., None] > 0,
                     np.clip(np.round(
                         (v + (dminf[:, None] * mn)[..., None])
                         / np.where(eff_s[..., None] > 0, eff_s[..., None], 1.0)),
                         0, 31), 0).astype(np.uint8)
    out = np.zeros((nb, 176), dtype=np.uint8)
    out[:, 0:2] = d16[:, None].view(np.uint8)
    out[:, 2:4] = dmin16[:, None].view(np.uint8)
    for j in range(4):
        out[:, 4 + j] = (sc[:, j] & 63) | ((sc[:, j + 4] >> 4) << 6)
        out[:, 8 + j] = (mn[:, j] & 63) | ((mn[:, j + 4] >> 4) << 6)
        out[:, 12 + j] = (sc[:, j + 4] & 0x0F) | ((mn[:, j + 4] & 0x0F) << 4)
    qf = q.reshape(nb, QK_K)
    qh = np.zeros((nb, 32), dtype=np.uint8)
    for pair in range(4):
        lo = qf[:, pair * 64 : pair * 64 + 32]
        hi = qf[:, pair * 64 + 32 : pair * 64 + 64]
        out[:, 48 + pair * 32 : 48 + (pair + 1) * 32] = (lo & 0x0F) | ((hi & 0x0F) << 4)
        qh |= ((lo >> 4) & 1).astype(np.uint8) << (pair * 2)
        qh |= ((hi >> 4) & 1).astype(np.uint8) << (pair * 2 + 1)
    out[:, 16:48] = qh
    return out.reshape(-1)


def quantize_q4_k(values: np.ndarray) -> np.ndarray:
    """Encode f32 values as Q4_K superblocks (ggml layout; simplified
    single-pass scale search vs llama.cpp's iterative make_qkx2_quants —
    valid blocks, marginally coarser ppl; used for tests/parity/synthetic
    checkpoints, not re-export fidelity)."""
    values = np.asarray(values, dtype=np.float32)
    assert values.size % QK_K == 0
    v = values.reshape(-1, 8, 32)                     # [nb, sub, 32]
    nb = v.shape[0]
    vmax = v.max(axis=-1)
    mins_f = np.maximum(-v.min(axis=-1), 0.0)         # ggml mins are >= 0
    scales_f = np.maximum(vmax + mins_f, 0.0) / 15.0  # per-sub ideal scale
    d = scales_f.max(axis=-1) / 63.0                  # [nb]
    dmin = mins_f.max(axis=-1) / 63.0
    d16 = d.astype(np.float16)
    dmin16 = dmin.astype(np.float16)
    df, dminf = d16.astype(np.float32), dmin16.astype(np.float32)
    with np.errstate(divide="ignore", invalid="ignore"):
        sc = np.where(df[:, None] > 0,
                      np.clip(np.round(scales_f / df[:, None]), 0, 63), 0
                      ).astype(np.int32)
        mn = np.where(dminf[:, None] > 0,
                      np.clip(np.round(mins_f / dminf[:, None]), 0, 63), 0
                      ).astype(np.int32)
        eff_s = df[:, None] * sc                      # [nb, 8]
        q = np.where(eff_s[..., None] > 0,
                     np.clip(np.round(
                         (v + (dminf[:, None] * mn)[..., None])
                         / np.where(eff_s[..., None] > 0, eff_s[..., None], 1.0)),
                         0, 15), 0).astype(np.uint8)
    out = np.zeros((nb, 144), dtype=np.uint8)
    out[:, 0:2] = d16[:, None].view(np.uint8)
    out[:, 2:4] = dmin16[:, None].view(np.uint8)
    # 12-byte 6-bit pack (inverse of _kquant_scales_mins)
    for j in range(4):
        out[:, 4 + j] = (sc[:, j] & 63) | ((sc[:, j + 4] >> 4) << 6)
        out[:, 8 + j] = (mn[:, j] & 63) | ((mn[:, j + 4] >> 4) << 6)
        out[:, 12 + j] = (sc[:, j + 4] & 0x0F) | ((mn[:, j + 4] & 0x0F) << 4)
    qf = q.reshape(nb, QK_K)
    for pair in range(4):  # low nibbles = elems 64p..64p+31, high = +32..+63
        lo = qf[:, pair * 64 : pair * 64 + 32]
        hi = qf[:, pair * 64 + 32 : pair * 64 + 64]
        out[:, 16 + pair * 32 : 16 + (pair + 1) * 32] = lo | (hi << 4)
    return out.reshape(-1)


def dequantize_q4_k(raw: np.ndarray, n_elements: int) -> np.ndarray:
    nb = n_elements // QK_K
    blocks = raw[: nb * 144].reshape(nb, 144)
    d = _f16(np.ascontiguousarray(blocks[:, 0:2]).view(np.uint16).reshape(nb))
    dmin = _f16(np.ascontiguousarray(blocks[:, 2:4]).view(np.uint16).reshape(nb))
    sc, mn = _kquant_scales_mins(blocks[:, 4:16])
    qs = blocks[:, 16:]  # [nb, 128]
    out = np.empty((nb, QK_K), dtype=np.float32)
    for pair in range(4):  # 64-element pairs: low nibbles -> sub-block 2p, high -> 2p+1
        chunk = qs[:, pair * 32 : (pair + 1) * 32]
        lo = (chunk & 0x0F).astype(np.float32)
        hi = (chunk >> 4).astype(np.float32)
        out[:, pair * 64 : pair * 64 + 32] = d[:, None] * sc[:, 2 * pair, None] * lo - dmin[:, None] * mn[:, 2 * pair, None]
        out[:, pair * 64 + 32 : pair * 64 + 64] = d[:, None] * sc[:, 2 * pair + 1, None] * hi - dmin[:, None] * mn[:, 2 * pair + 1, None]
    return out.reshape(-1)


def dequantize_q5_k(raw: np.ndarray, n_elements: int) -> np.ndarray:
    nb = n_elements // QK_K
    blocks = raw[: nb * 176].reshape(nb, 176)
    d = _f16(np.ascontiguousarray(blocks[:, 0:2]).view(np.uint16).reshape(nb))
    dmin = _f16(np.ascontiguousarray(blocks[:, 2:4]).view(np.uint16).reshape(nb))
    sc, mn = _kquant_scales_mins(blocks[:, 4:16])
    qh = blocks[:, 16:48]   # [nb, 32]
    qs = blocks[:, 48:176]  # [nb, 128]
    out = np.empty((nb, QK_K), dtype=np.float32)
    for pair in range(4):
        chunk = qs[:, pair * 32 : (pair + 1) * 32]
        lo = (chunk & 0x0F).astype(np.int32) | (((qh >> (pair * 2)) & 1).astype(np.int32) << 4)
        hi = (chunk >> 4).astype(np.int32) | (((qh >> (pair * 2 + 1)) & 1).astype(np.int32) << 4)
        out[:, pair * 64 : pair * 64 + 32] = d[:, None] * sc[:, 2 * pair, None] * lo - dmin[:, None] * mn[:, 2 * pair, None]
        out[:, pair * 64 + 32 : pair * 64 + 64] = d[:, None] * sc[:, 2 * pair + 1, None] * hi - dmin[:, None] * mn[:, 2 * pair + 1, None]
    return out.reshape(-1)


def dequantize_q6_k(raw: np.ndarray, n_elements: int) -> np.ndarray:
    nb = n_elements // QK_K
    blocks = raw[: nb * 210].reshape(nb, 210)
    ql = blocks[:, 0:128]
    qh = blocks[:, 128:192]
    scales = blocks[:, 192:208].view(np.int8).astype(np.float32)  # [nb, 16]
    d = _f16(np.ascontiguousarray(blocks[:, 208:210]).view(np.uint16).reshape(nb))
    out = np.empty((nb, QK_K), dtype=np.float32)
    for half in range(2):  # 128-element halves
        qlh = ql[:, half * 64 : half * 64 + 64]
        qhh = qh[:, half * 32 : half * 32 + 32]
        scb = scales[:, half * 8 : half * 8 + 8]  # [nb, 8]
        base = half * 128
        # groups 0,1 read ql[0:32]&0xF / ql[32:64]&0xF; groups 2,3 read >>4
        for group in range(4):
            if group == 0:
                q = (qlh[:, 0:32] & 0x0F).astype(np.int32) | (((qhh >> 0) & 3).astype(np.int32) << 4)
                sidx = 0
            elif group == 1:
                q = (qlh[:, 32:64] & 0x0F).astype(np.int32) | (((qhh >> 2) & 3).astype(np.int32) << 4)
                sidx = 2
            elif group == 2:
                q = (qlh[:, 0:32] >> 4).astype(np.int32) | (((qhh >> 4) & 3).astype(np.int32) << 4)
                sidx = 4
            else:
                q = (qlh[:, 32:64] >> 4).astype(np.int32) | (((qhh >> 6) & 3).astype(np.int32) << 4)
                sidx = 6
            q = q - 32
            # per-16-element scale: is = pos_in_group/16 (0 or 1) -> scales[sidx + is]
            s = np.repeat(scb[:, sidx : sidx + 2], 16, axis=1)  # [nb, 32]
            out[:, base + group * 32 : base + (group + 1) * 32] = d[:, None] * s * q
    return out.reshape(-1)


# ---------------------------------------------------------------------------
# Dispatch + requant
# ---------------------------------------------------------------------------

_DEQUANT = {
    GGMLType.Q8_0: dequantize_q8_0,
    GGMLType.Q4_0: dequantize_q4_0,
    GGMLType.Q4_K: dequantize_q4_k,
    GGMLType.Q5_K: dequantize_q5_k,
    GGMLType.Q6_K: dequantize_q6_k,
}


_NATIVE_KIND = {
    GGMLType.Q8_0: ("q8_0", 32),
    GGMLType.Q4_0: ("q4_0", 32),
    GGMLType.Q4_K: ("q4_k", QK_K),
    GGMLType.Q5_K: ("q5_k", QK_K),
    GGMLType.Q6_K: ("q6_k", QK_K),
}


def dequantize(ggml_type: GGMLType, raw: np.ndarray, n_elements: int) -> np.ndarray:
    """Decode any supported GGML format to float32 (native C++ codec when
    available — llamatpu/gguf/native.py — numpy fallback otherwise)."""
    if ggml_type == GGMLType.F32:
        return np.ascontiguousarray(raw[: n_elements * 4]).view(np.float32).copy()
    if ggml_type == GGMLType.F16:
        return np.ascontiguousarray(raw[: n_elements * 2]).view(np.float16).astype(np.float32)
    if ggml_type == GGMLType.BF16:
        u = np.ascontiguousarray(raw[: n_elements * 2]).view(np.uint16).astype(np.uint32) << 16
        return u.view(np.float32)
    if ggml_type in _NATIVE_KIND:
        from llamatpu.gguf import native

        kind, bs = _NATIVE_KIND[ggml_type]
        out = native.dequant(kind, raw, n_elements // bs, bs)
        if out is not None:
            return out
    fn = _DEQUANT.get(ggml_type)
    if fn is None:
        raise NotImplementedError(f"dequantize: {ggml_type!r} not supported")
    return fn(np.asarray(raw, dtype=np.uint8), n_elements)


def requantize_to_q8_0(ggml_type: GGMLType, raw: np.ndarray, n_elements: int) -> np.ndarray:
    """K-quant -> Q8_0 requantization, mirroring the reference's GPU-load path
    (ModelLoader.dequantizeToQ8_0TornadoTensor): full dequant then ggml Q8_0 encode."""
    return quantize_q8_0(dequantize(ggml_type, raw, n_elements))
