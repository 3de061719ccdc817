"""Exact ggml Q8_0 x Q8_0 matmul: activations quantized per-32 block, int8·int8
accumulated in int32, rescaled by (weight f16 scale) x (activation f16 scale).

Bit-for-bit parity with the reference CPU path's default matmul
(Q8_0FloatTensor.dotQ8Activation, tensor/standard/Q8_0FloatTensor.java:90-121,
itself mirroring llama.cpp's ggml Q8_0 scheme): the activation scale is derived
at full precision (amax/127), int8 values rounded half away from zero, and the
STORED scale is f16-rounded before entering the product. This is the
ppl-parity mode (BASELINE.json "match llama.cpp-equivalent perplexity at the
same bit-width"); the bf16-dequant paths (xla/pallas) trade that exactness for
MXU-friendly dtypes.

Intended for decode / perplexity evaluation (T small): the block-dot
intermediate is [T, O, I/32] int32, which is prohibitive at prefill widths —
callers fall back to the dequant path for large T.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from llamatpu.models.weights import QTensor

BLOCK = 32
_T_LIMIT = 16  # fall back to dequant matmul above this window


def _quantize_activation(x2: jnp.ndarray):
    """ggml-order per-32-block activation quantization.

    Returns (q int8 [T, NB, 32], scale f32 [T, NB]) where scale is the
    f16-rounded amax/127 and q derives from the full-precision scale."""
    t, i = x2.shape
    xb = x2.astype(jnp.float32).reshape(t, i // BLOCK, BLOCK)
    amax = jnp.max(jnp.abs(xb), axis=-1)
    d = amax / 127.0
    inv = jnp.where(d > 0, 1.0 / jnp.where(d > 0, d, 1.0), 0.0)
    s = xb * inv[..., None]
    q = jnp.trunc(s + jnp.copysign(0.5, s)).astype(jnp.int8)  # round half away
    d_f16 = d.astype(jnp.float16).astype(jnp.float32)
    return q, d_f16


def quant_matmul_int8(w: QTensor, x: jnp.ndarray) -> jnp.ndarray:
    """y[..., O] = exact ggml int8 dot of x against Q8_0 weights."""
    assert w.kind == "q8_0", "int8 path requires Q8_0 weights"
    # canonical column order (deinterleaves in-graph if the tensor is stored
    # interleaved for the Pallas path — one extra weight read, ppl-mode only)
    qs, scales = w.canonical_qs(), w.scales
    lead = x.shape[:-1]
    t = 1
    for d_ in lead:
        t *= d_
    x2 = x.reshape(t, x.shape[-1])
    if t > _T_LIMIT:
        from llamatpu.ops.matmul import matmul

        return matmul(w, x, impl="xla")
    aq, ascale = _quantize_activation(x2)             # [T, NB, 32], [T, NB]
    o, i = qs.shape
    wq = qs.reshape(o, i // BLOCK, BLOCK)
    # int32 block dots on the MXU int8 path
    p = jax.lax.dot_general(
        aq.astype(jnp.int32), wq.astype(jnp.int32),
        dimension_numbers=(((2,), (2,)), ((1,), (1,))),
        preferred_element_type=jnp.int32)              # [NB, T, O]
    combined = scales.T[:, None, :] * ascale.T[:, :, None]  # [NB, T, O]
    y = jnp.sum(p.astype(jnp.float32) * combined, axis=0)   # [T, O]
    return y.reshape(*lead, o).astype(x.dtype)
