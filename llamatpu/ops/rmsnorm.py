"""RMSNorm.

Semantics match the reference exactly (InferenceCore.rmsnorm,
/root/reference/src/main/java/org/beehive/gpullama3/inference/InferenceCore.java:39-48):
ss = mean(x^2) + eps; out = weight * x / sqrt(ss). The eps is added AFTER the
mean (llama.cpp convention). Reduction always in float32 regardless of the
activation dtype. On TPU this is a single VPU fusion — no hand-rolled
block-reduction kernels needed (the reference's reductionOneBlockWithLayer /
reductionFinalNormalization two-kernel NVIDIA/NON_NVIDIA split,
TransformerComputeKernelsLayered.java:387-2531, is a GPU workgroup artifact).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def rmsnorm(x: jnp.ndarray, weight: jnp.ndarray, eps: float) -> jnp.ndarray:
    """Normalize the last axis. x: [..., D]; weight: [D] (broadcast)."""
    xf = x.astype(jnp.float32)
    ss = jnp.mean(xf * xf, axis=-1, keepdims=True) + eps
    out = xf * jax.lax.rsqrt(ss) * weight.astype(jnp.float32)
    return out.astype(x.dtype)
