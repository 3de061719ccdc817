"""End-to-end K-quant loading: a GGUF with Q4_K/Q6_K matmul weights loads in
quant mode (requantized to Q8_0 QTensors, reference GPU-load parity) and the
forward matches the oracle running on the requantized values."""
import numpy as np
import pytest

import jax.numpy as jnp

import tiny_models
from oracle import Oracle
from llamatpu.gguf import GGMLType, GGUFReader, GGUFWriter, quants
from llamatpu.models import loader as mloader
from llamatpu.models.transformer import forward_tokens, init_cache
from llamatpu.models.weights import QTensor


def encode_q6k_roundtrip(arr: np.ndarray) -> bytes:
    """Encode float data as Q6_K-decodable bytes: synthesize plausible blocks
    by quantizing to 6-bit with per-16 scales (simplified encoder, decoder is
    the real ggml layout)."""
    flat = arr.reshape(-1)
    nb = flat.size // 256
    out = bytearray()
    for b in range(nb):
        x = flat[b * 256 : (b + 1) * 256]
        amax = np.abs(x).max() or 1.0
        d = amax / (32 * 127)
        scales = np.zeros(16, np.int8)
        q = np.zeros(256, np.int32)
        for g in range(16):
            seg = x[g * 16 : (g + 1) * 16]
            smax = np.abs(seg).max()
            sc = max(1, min(127, int(round(smax / (31 * d))))) if smax > 0 else 1
            scales[g] = sc
            q[g * 16 : (g + 1) * 16] = np.clip(np.round(seg / (d * sc)), -32, 31) + 32
        # pack into ggml q6_k layout: two 128-halves, each 4 groups of 32
        ql = np.zeros(128, np.uint8)
        qh = np.zeros(64, np.uint8)
        for half in range(2):
            base = half * 128
            for g in range(32):
                q0 = q[base + g]; q1 = q[base + 32 + g]
                q2 = q[base + 64 + g]; q3 = q[base + 96 + g]
                ql[half * 64 + g] = (q0 & 0x0F) | ((q2 & 0x0F) << 4)
                ql[half * 64 + 32 + g] = (q1 & 0x0F) | ((q3 & 0x0F) << 4)
                qh[half * 32 + g] = ((q0 >> 4) | ((q1 >> 4) << 2)
                                     | ((q2 >> 4) << 4) | ((q3 >> 4) << 6))
        # scales order: per-half [s(g0,is0), s(g0,is1), s(g1,is0), ...]
        sc_bytes = np.zeros(16, np.int8)
        for half in range(2):
            for group in range(4):
                for is_ in range(2):
                    gidx = half * 8 + group * 2 + is_
                    sc_bytes[half * 8 + group * 2 + is_] = scales[gidx]
        out += ql.tobytes() + qh.tobytes() + sc_bytes.tobytes()
        out += np.float16(d).tobytes()
    return bytes(out)


def test_q6k_load_requantizes_and_runs(tmp_path):
    # build a llama tiny gguf, then rewrite its matmul weights as Q6_K
    src = tmp_path / "f32.gguf"
    tiny_models.build_tiny_gguf(src, family="llama", quant=GGMLType.F32, seed=47)
    with GGUFReader(str(src)) as r:
        md = dict(r.metadata)
        md.pop("tokenizer.ggml.tokens.length", None)
        tensors = {n: r.tensor_f32(n) for n in r.tensor_infos}

    w = GGUFWriter()
    for k, v in md.items():
        w.add(k, v)
    kq = tmp_path / "q6k.gguf"
    for name, arr in tensors.items():
        # ggml K-quant superblocks run over the flattened tensor
        if arr.ndim >= 2 and arr.size % 256 == 0 and arr.shape[-1] % 32 == 0 \
                and "norm" not in name:
            w.add_tensor_raw(name, arr.shape, GGMLType.Q6_K, encode_q6k_roundtrip(arr))
        else:
            w.add_tensor(name, arr, GGMLType.F32)
    w.write(str(kq))

    model = mloader.load_model(str(kq), mode="quant", param_dtype=jnp.float32,
                               load_tokenizer=False)
    # matmul weights must be requantized Q8_0 QTensors now
    assert isinstance(model.weights["layers"]["wq"], QTensor)
    assert model.weights["layers"]["wq"].kind == "q8_0"

    # oracle runs on the dequantized values of the SAME q6k file
    with GGUFReader(str(kq)) as r:
        deq = {n: r.tensor_f32(n) for n in r.tensor_infos}
    orc = Oracle(model.cfg, deq, "llama")
    cache = init_cache(model.cfg, 1, jnp.float32)
    for pos, tok in enumerate([3, 17]):
        want = orc.forward(tok, pos)
        logits, cache = forward_tokens(model.cfg, model.weights,
                                       jnp.array([[tok]], jnp.int32), cache, pos,
                                       last_logit_only=True)
        # engine sees Q8_0-of-Q6_K; oracle sees Q6_K: only requant noise apart
        np.testing.assert_allclose(np.asarray(logits[0]), want, atol=0.05, rtol=0)
