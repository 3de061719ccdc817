"""Projection matmuls over plain or block-quantized weights.

This is the TPU replacement for the reference's GEMV/GEMM kernel zoo
(matrixVectorGeneric*/fusedQKVMatmul*/gemmMMA* — SURVEY.md §2.6): one entry
point that contracts activations [..., in] against weights stored [out, in]
(GGUF row-major convention), with the quantized path either

- "xla": dequantize int8->f32/bf16 inline and let XLA fuse + tile onto the MXU
  (weights are re-materialized at 2-4 bytes/elem of HBM traffic), or
- "pallas": fused dequant+matmul kernels (ops/pallas_matmul.py) that read int8
  straight from HBM — the bandwidth-optimal decode path.

Accumulation is always float32 (preferred_element_type), matching the
reference's FP32-accumulate discipline.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from llamatpu.models.weights import QTensor


def matmul(w, x: jnp.ndarray, impl: str = "xla", li=None) -> jnp.ndarray:
    """y[..., out] = x[..., in] @ W[out, in]^T.

    `w` is a QTensor or an array. With `li` (traced layer index) and
    impl="pallas", `w` holds the full [L, out, in] layer stack and the kernel
    DMAs layer li directly — the decode-critical zero-copy path (a lax.scan
    xs slice feeding a pallas call makes XLA materialize a per-layer weight
    copy: 3x HBM traffic, profiled at ~50% of the Llama-1B decode step).
    """
    if li is not None and not (impl == "pallas" and isinstance(w, QTensor)):
        from llamatpu.models.transformer import _index_qtensor

        w = _index_qtensor(w, li)  # non-pallas paths take the sliced layer
        li = None
    if isinstance(w, QTensor):
        def unpad(y):
            return y[..., : w.logical_out] if w.logical_out else y

        if impl == "pallas":
            from llamatpu.ops.pallas_matmul import quant_matmul_pallas

            return unpad(quant_matmul_pallas(w, x, li=li))
        if impl == "int8" and w.kind == "q8_0":
            from llamatpu.ops.int8_matmul import quant_matmul_int8

            return unpad(quant_matmul_int8(w, x))
        wd = w.dequant(jnp.bfloat16 if x.dtype == jnp.bfloat16 else jnp.float32)
        if w.logical_out:
            wd = wd[..., : w.logical_out, :]
    else:
        wd = w
    y = jax.lax.dot_general(
        x, wd,
        dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return y.astype(x.dtype)
