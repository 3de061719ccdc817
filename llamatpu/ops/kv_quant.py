"""Int8 KV-cache quantization (per token, per kv-head).

The reference keeps its KV cache in f16/f32 (State.java keyCache/valueCache);
int8 KV halves cache bytes, doubling usable context length / batch lanes for
the same HBM. Chosen granularity is ONE f32 scale per (token, kv head) —
coarser than the ggml 32-group weight format, but it is exactly the
granularity that folds into the attention dots with zero expansion work:

  scores[g, s] = (q · k_int[s]) * k_scale[s]      (fold AFTER the QK^T dot)
  out[g, :]   = Σ_s (att[g, s] * v_scale[s]) · v_int[s]   (fold BEFORE att·V)

so both Pallas decode kernels and the XLA path dequantize as a [1, S] row
multiply on the score/attention matrix instead of materializing a dequantized
[S, hd] stripe. Scales are stored [..., 2, S] (row 0 = K, row 1 = V; S on
lanes) beside the PACKED int8 cache (models/transformer.KVCache) — Mosaic
block-legal and VMEM-compact.
"""
from __future__ import annotations

import jax.numpy as jnp


def quantize_kv(x):
    """x: [..., hd] float -> (int8 [..., hd], f32 scales [...]) with
    symmetric per-row (= per token, per head) scaling; zero rows get scale 0
    (dequant yields exact zeros, matching the zero-initialized cache)."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1)  # [...]
    scale = amax / 127.0
    safe = jnp.where(scale > 0, scale, 1.0)
    q = jnp.clip(jnp.round(xf / safe[..., None]), -127, 127).astype(jnp.int8)
    return q, scale


def dequantize_kv(q, scale_row):
    """q: [..., S, hd] int8; scale_row: [..., 1, S] f32 -> f32 [..., S, hd]."""
    s = jnp.swapaxes(scale_row, -1, -2)  # [..., S, 1]
    return q.astype(jnp.float32) * s
