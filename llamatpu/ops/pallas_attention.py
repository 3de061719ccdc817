"""Pallas decode attention over the HBM-resident KV cache.

TPU-native analog of the reference's decode attention kernels
(processHeadsFlashAttention / processHeadsParallel / splitKV variants,
TransformerComputeKernelsLayered.java:784-1433): one program per (batch, kv
head) computes the GQA group's scores against the full cache stripe in VMEM
with f32 masked softmax, keeping the [G, S] score matrix out of HBM entirely.

The whole cache stripe for one kv head (S x head_dim, bf16) fits VMEM up to
S ~ 32k, so no online-softmax tiling is needed at supported context lengths;
a KV-tiled online-softmax variant (the reference's splitKV analog) is the
long-context extension point.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _kernel(pos_ref, q_ref, k_ref, v_ref, o_ref, *, scale):
    # blocks: q [1, 1, G, hd]; k [1, 1, S, hd]; v [1, 1, S, vhd]; pos [1, 1] SMEM
    q = q_ref[0, 0].astype(jnp.float32)          # [G, hd]
    k = k_ref[0, 0].astype(jnp.float32)          # [S, hd]
    v = v_ref[0, 0].astype(jnp.float32)          # [S, vhd]
    s_len = k.shape[0]
    scores = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale  # [G, S]
    s_idx = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    scores = jnp.where(s_idx <= pos_ref[0, 0], scores, NEG_INF)
    m = jnp.max(scores, axis=1, keepdims=True)
    e = jnp.exp(scores - m)
    att = e / jnp.sum(e, axis=1, keepdims=True)
    o_ref[0, 0] = jax.lax.dot_general(
        att, v, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def decode_attention(q, kc, vc, pos_vec, scale: float, interpret: bool = False):
    """q: [B, KV, G, hd]; kc: [B, KV, S, hd]; vc: [B, KV, S, vhd] (head-major);
    pos_vec: [B] (keys s <= pos are valid). Returns [B, KV, G, vhd] f32."""
    b, kv, g, hd = q.shape
    s = kc.shape[2]
    vhd = vc.shape[3]
    pos2 = pos_vec.reshape(b, 1).astype(jnp.int32)
    return pl.pallas_call(
        functools.partial(_kernel, scale=scale),
        grid=(b, kv),
        in_specs=[
            pl.BlockSpec((1, 1), lambda bi, hi: (bi, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, g, hd), lambda bi, hi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s, hd), lambda bi, hi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s, vhd), lambda bi, hi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, g, vhd), lambda bi, hi: (bi, hi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, kv, g, vhd), jnp.float32),
        interpret=interpret,
    )(pos2, q, kc, vc)


def decode_attention_auto(q, kc, vc, pos_vec, scale: float):
    interpret = jax.default_backend() != "tpu"
    return decode_attention(q, kc, vc, pos_vec, scale, interpret=interpret)
