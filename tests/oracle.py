"""Independent numpy oracle: re-implements the reference's CPU forward passes
(InferenceCore.forwardJava* — /root/reference/src/main/java/org/beehive/gpullama3/
inference/InferenceCore.java) token-by-token with explicit loops/slices, for
numerics-parity tests of the JAX transformer graph. Deliberately written in the
reference's sequential style, NOT with the engine's ops.
"""
from __future__ import annotations

import math

import numpy as np


def rmsnorm(x, w, eps):
    ss = float(np.mean(x.astype(np.float64) ** 2)) + eps
    return (w * (x / math.sqrt(ss))).astype(np.float32)


def softmax(x):
    m = np.max(x)
    e = np.exp(x - m)
    return e / e.sum()


def silu(x):
    return x / (1.0 + np.exp(-x))


class Oracle:
    """Per-token forward with python loops over heads/positions."""

    def __init__(self, cfg, tensors: dict, family: str):
        self.cfg = cfg
        self.family = family
        self.t = tensors
        c = cfg
        self.kv_cache_k = np.zeros((c.n_layers, c.context_length, c.kv_dim), np.float32)
        self.kv_cache_v = np.zeros((c.n_layers, c.context_length, c.v_dim), np.float32)
        # rope table: freq_i = theta^(-2i/head_dim) (RoPE.precomputeFreqsCis)
        half = c.head_dim // 2
        if c.rope_scaling == "yarn":
            from llamatpu.ops.rope import precompute_rope_tables

            cos, sin = precompute_rope_tables(c)
            self.cr, self.ci = np.asarray(cos), np.asarray(sin)
        else:
            freqs = np.array([1.0 / (c.rope_theta ** (2.0 * i / c.head_dim)) for i in range(half)])
            pos = np.arange(c.context_length)[:, None]
            self.cr = np.cos(pos * freqs)
            self.ci = np.sin(pos * freqs)

    def _rope(self, vec, n_heads, pos):
        c = self.cfg
        half = c.head_dim // 2
        out = vec.copy()
        for h in range(n_heads):
            o = h * c.head_dim
            for j in range(half):
                fcr, fci = self.cr[pos, j], self.ci[pos, j]
                if c.rope_style == "interleaved":
                    i0, i1 = o + 2 * j, o + 2 * j + 1
                else:  # neox
                    i0, i1 = o + j, o + j + half
                v0, v1 = out[i0], out[i1]
                out[i0] = v0 * fcr - v1 * fci
                out[i1] = v0 * fci + v1 * fcr
        return out

    def forward(self, token: int, pos: int) -> np.ndarray:
        c, t = self.cfg, self.t
        x = t["token_embd.weight"][token].astype(np.float32).copy()
        x *= c.embedding_scale
        for l in range(c.n_layers):
            b = f"blk.{l}."
            h = rmsnorm(x, t[b + "attn_norm.weight"], c.rms_norm_eps)
            if self.family == "phi3":
                qkv = t[b + "attn_qkv.weight"] @ h
                q = qkv[: c.q_dim].copy()
                k = qkv[c.q_dim : c.q_dim + c.kv_dim].copy()
                v = qkv[c.q_dim + c.kv_dim :].copy()
            else:
                q = t[b + "attn_q.weight"] @ h
                k = t[b + "attn_k.weight"] @ h
                v = t[b + "attn_v.weight"] @ h
            if c.qkv_bias:
                q += t[b + "attn_q.bias"]
                k += t[b + "attn_k.bias"]
                v += t[b + "attn_v.bias"]
            if c.qk_norm:
                for i in range(c.n_heads):
                    q[i * c.head_dim : (i + 1) * c.head_dim] = rmsnorm(
                        q[i * c.head_dim : (i + 1) * c.head_dim], t[b + "attn_q_norm.weight"], c.rms_norm_eps)
                for i in range(c.n_kv_heads):
                    k[i * c.head_dim : (i + 1) * c.head_dim] = rmsnorm(
                        k[i * c.head_dim : (i + 1) * c.head_dim], t[b + "attn_k_norm.weight"], c.rms_norm_eps)
            q = self._rope(q, c.n_heads, pos)
            k = self._rope(k, c.n_kv_heads, pos)
            self.kv_cache_k[l, pos] = k
            self.kv_cache_v[l, pos] = v

            kv_mul = c.n_heads // c.n_kv_heads
            attn_out = np.zeros(c.n_heads * c.v_head_dim, np.float32)
            for hh in range(c.n_heads):
                qh = q[hh * c.head_dim : (hh + 1) * c.head_dim]
                scores = np.empty(pos + 1, np.float32)
                for s in range(pos + 1):
                    ks = self.kv_cache_k[l, s, (hh // kv_mul) * c.head_dim : (hh // kv_mul + 1) * c.head_dim]
                    scores[s] = float(qh @ ks) * c.attn_score_scale
                att = softmax(scores)
                acc = np.zeros(c.v_head_dim, np.float32)
                for s in range(pos + 1):
                    vs = self.kv_cache_v[l, s, (hh // kv_mul) * c.v_head_dim : (hh // kv_mul + 1) * c.v_head_dim]
                    acc += att[s] * vs
                attn_out[hh * c.v_head_dim : (hh + 1) * c.v_head_dim] = acc

            xb2 = t[b + "attn_output.weight"] @ attn_out
            x = x + xb2 * c.residual_scale

            hf = rmsnorm(x, t[b + "ffn_norm.weight"], c.rms_norm_eps)
            if c.is_moe:
                ffn = self._moe(hf, b)
            elif self.family == "phi3":
                gate_up = t[b + "ffn_up.weight"] @ hf
                g = silu(gate_up[: c.hidden_dim])
                u = gate_up[c.hidden_dim :]
                ffn = t[b + "ffn_down.weight"] @ (g * u)
            else:
                g = silu(t[b + "ffn_gate.weight"] @ hf)
                u = t[b + "ffn_up.weight"] @ hf
                ffn = t[b + "ffn_down.weight"] @ (g * u)
            x = x + ffn * c.residual_scale

        x = rmsnorm(x, t["output_norm.weight"], c.rms_norm_eps)
        logits = t["output.weight"] @ x if "output.weight" in t else t["token_embd.weight"] @ x
        return logits * c.logit_scale

    def _moe(self, h, b):
        """Qwen2-MoE (InferenceCore.forwardJavaQwen2MoE:366-415)."""
        c, t = self.cfg, self.t
        probs = softmax(t[b + "ffn_gate_inp.weight"] @ h)
        out = np.zeros(c.dim, np.float32)
        p = probs.copy()
        for _ in range(c.n_experts_used):
            e = int(np.argmax(p))
            wgt = p[e]
            p[e] = -np.inf
            g = silu(t[b + "ffn_gate_exps.weight"][e] @ h)
            u = t[b + "ffn_up_exps.weight"][e] @ h
            out += wgt * (t[b + "ffn_down_exps.weight"][e] @ (g * u))
        g = silu(t[b + "ffn_gate_shexp.weight"] @ h)
        u = t[b + "ffn_up_shexp.weight"] @ h
        shared = t[b + "ffn_down_shexp.weight"] @ (g * u)
        gate_score = float(t[b + "ffn_gate_inp_shexp.weight"].reshape(-1) @ h)
        out += (1.0 / (1.0 + math.exp(-gate_score))) * shared
        return out
