"""int8 MXU prefill/batch matmul for q8_row weights.

Prefill GEMMs are compute-bound (decode is HBM-bound), and the TPU v5 MXU runs
int8xint8->int32 at 2x its bf16 rate. With per-row weight scales (q8_row,
models/weights.py rowq_requant) the whole contraction stays integer:

    y[t, o] = (xi8[t, :] . wi8[o, :])_int32 * ax[t] * s[o]

where xi8/ax is a per-TOKEN symmetric activation quantization (amax/127) and
s the per-row weight scale. Both rescales apply to the [T, O] OUTPUT, so XLA
fuses them into the dot's epilogue — no dequantized weight matrix is ever
materialized. Plain XLA (no Pallas): a dot_general with int8 operands and
preferred_element_type=int32 lowers straight onto the native int8 MXU path,
and scan-sliced [L, O, I] stacks fuse into the dot for free (the pallas-
custom-call copy trap does not apply to XLA consumers, see ops/matmul.py).

Activation quantization is per-token rather than ggml's per-32-block — the
numeric cost of that coarsening is measured by bench/parity.py's `q8_row-a8`
row and gated in tests/test_parity_gate.py.

Reference tier being replaced: gemmMMAQ8 / the batched-prefill GEMM kernels
(TransformerBatchPrefillKernels.java:1580-1857), which dequantize to f16
fragments for the tensor cores; the TPU-native design keeps int8 all the way
to the accumulator instead.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from llamatpu.models.weights import QTensor

# Below this many activation rows the bf16 cast-and-dot decode kernel wins
# (bandwidth-bound regime; avoids the activation-quant rounding entirely).
# Module-level so the parity harness can force the MXU path at chunk=16.
INT8_MXU_MIN_T = 128


def quantize_activation_rows(x2: jnp.ndarray):
    """Per-row symmetric int8 quantization: returns (xi8 [T, I], ax [T, 1] f32)
    with x ~= xi8 * ax. Zero rows quantize to (0, 0)."""
    xf = x2.astype(jnp.float32)
    ax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
    inv = jnp.where(ax > 0, 1.0 / jnp.where(ax > 0, ax, 1.0), 0.0)
    s = xf * inv
    xi8 = jnp.trunc(s + jnp.sign(s) * 0.5).astype(jnp.int8)  # half away from 0
    return xi8, ax


# int32 accumulator overflow bound: the per-element product is at most
# 127*127 = 16129, so a full-contraction int32 sum is exact while
# I <= (2^31 - 1) / 16129 ~= 133,152. Every supported geometry is far below
# that (largest in-feature dim: 28,672); past the bound the contraction is
# split into partial dots accumulated in f32.
_INT8_ACC_MAX_I = 131_072


def rowq_matmul_mxu(qs, row_scales, x2: jnp.ndarray) -> jnp.ndarray:
    """y[T, O] = x2[T, I] @ (qs[O, I] * row_scales[O, 1])^T on the int8 MXU.

    qs int8 canonical, row_scales f32. Returns f32.
    """
    xi8, ax = quantize_activation_rows(x2)
    dn = (((1,), (1,)), ((), ()))
    i = qs.shape[-1]
    if i <= _INT8_ACC_MAX_I:
        p = jax.lax.dot_general(
            xi8, qs, dimension_numbers=dn,
            preferred_element_type=jnp.int32).astype(jnp.float32)  # native int8 MXU
    else:  # overflow-safe: int32 partials over <=_INT8_ACC_MAX_I chunks, f32 sum
        n = -(-i // _INT8_ACC_MAX_I)
        step = -(-i // n)
        p = sum(
            jax.lax.dot_general(
                xi8[:, c:c + step], qs[:, c:c + step], dimension_numbers=dn,
                preferred_element_type=jnp.int32).astype(jnp.float32)
            for c in range(0, i, step))
    return p * ax * row_scales[:, 0][None, :]


def rowq_matmul(w: QTensor, x2: jnp.ndarray, li=None) -> jnp.ndarray:
    """Dispatch wrapper used by quant_matmul_pallas for q8_row tensors at
    T >= INT8_MXU_MIN_T. With `li`, w is the stacked [L, O, I] tensor and the
    layer slice fuses into the XLA dot (no pallas copy trap).

    LLAMATPU_PALLAS_GEMM=1 routes through the blocked Pallas w8a8 GEMM
    (ops/pallas_gemm.py — opt-in until its chip MFU A/B lands; the XLA dot
    measured 6-9% int8-peak MFU, PERF.md prefill roofline). Bit-identical
    epilogue either way."""
    import os

    qs, s = w.qs, w.scales
    if (os.environ.get("LLAMATPU_PALLAS_GEMM")
            and jax.default_backend() == "tpu" and x2.ndim == 2):
        from llamatpu.ops.pallas_gemm import rowq_gemm_pallas

        xi8, ax = quantize_activation_rows(x2)
        y = rowq_gemm_pallas(qs, s, xi8, ax, li=li)
        if y is not None:
            return y
    if li is not None:
        qs = qs[li]          # dynamic-slice; fuses into the dot operand
        s = s[li]
    return rowq_matmul_mxu(qs, s, x2)
