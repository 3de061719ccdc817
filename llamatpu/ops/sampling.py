"""On-device sampling: greedy argmax, temperature+categorical, top-p nucleus.

The reference samples on the host (inference/sampler/Sampler.java:74-122;
ToppSampler.java partial-heap nucleus) except for an opt-in GPU argmax
(TransformerComputeKernels.argmaxLogits, ~500x D2H reduction README.md:73).
Here sampling ALWAYS runs inside the jitted step — only the sampled token id
(4 bytes/step) crosses to the host, which is the TPU-idiomatic default
(SURVEY.md §7.1 "deviceSample ... default, not opt-in").

Semantics match the reference: temperature == 0 -> argmax; otherwise softmax of
logits/temperature, then categorical, restricted to the smallest prefix of
probability-sorted tokens whose cumulative mass reaches top-p (0 < p < 1).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def greedy(logits: jnp.ndarray) -> jnp.ndarray:
    """argmax over the last axis. logits: [..., V] -> [...] int32."""
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)


def sample(logits: jnp.ndarray, rng: jax.Array, temperature: float, top_p: float) -> jnp.ndarray:
    """Sample token ids from [..., V] logits. Static temperature/top_p (baked
    into the compiled program, like the reference's per-run Sampler)."""
    if temperature == 0.0:
        return greedy(logits)
    scaled = logits.astype(jnp.float32) / temperature
    if 0.0 < top_p < 1.0:
        return _top_p_sample(scaled, rng, top_p)
    return jax.random.categorical(rng, scaled, axis=-1).astype(jnp.int32)


def _top_p_sample(scaled_logits: jnp.ndarray, rng: jax.Array, top_p: float) -> jnp.ndarray:
    probs = jax.nn.softmax(scaled_logits, axis=-1)
    sorted_probs = jnp.sort(probs, axis=-1, descending=True)
    sorted_idx = jnp.argsort(probs, axis=-1, descending=True)
    cum = jnp.cumsum(sorted_probs, axis=-1)
    # keep the smallest prefix with cumulative mass >= top_p (the first token
    # crossing the threshold stays in)
    keep = (cum - sorted_probs) < top_p
    masked = jnp.where(keep, jnp.log(sorted_probs), -jnp.inf)
    choice = jax.random.categorical(rng, masked, axis=-1)
    return jnp.take_along_axis(sorted_idx, choice[..., None], axis=-1)[..., 0].astype(jnp.int32)


def make_sampler(temperature: float, top_p: float):
    """Returns sample_fn(logits, rng) -> token ids with params baked in."""
    if temperature == 0.0:
        return lambda logits, rng: greedy(logits)
    return partial(sample, temperature=temperature, top_p=top_p)


def filtered_scaled_logits(logits: jnp.ndarray, temperature: jnp.ndarray,
                           top_p: jnp.ndarray) -> jnp.ndarray:
    """sample_dynamic's temperature+nucleus filter WITHOUT the draw, in
    ORIGINAL token order: temperature-scaled logits with tokens outside the
    top-p nucleus masked to -inf. softmax of a row is exactly the distribution
    sample_dynamic draws from — used by speculative verify to score drafted
    tokens under the target distribution. logits: [..., V] -> [..., V] f32."""
    scaled = logits.astype(jnp.float32) / jnp.maximum(temperature, 1e-6)
    top_p = jnp.clip(top_p, 1e-6, 1.0)
    probs = jax.nn.softmax(scaled, axis=-1)
    sorted_probs = jnp.sort(probs, axis=-1, descending=True)
    sorted_idx = jnp.argsort(probs, axis=-1, descending=True)
    cum = jnp.cumsum(sorted_probs, axis=-1)
    keep_sorted = (cum - sorted_probs) < top_p  # first token always kept
    inv = jnp.argsort(sorted_idx, axis=-1)  # token id -> its descending rank
    keep = jnp.take_along_axis(keep_sorted, inv, axis=-1)
    return jnp.where(keep, scaled, -jnp.inf)


def spec_verify_sample(logits: jnp.ndarray, drafts: jnp.ndarray, rng: jax.Array,
                       temperature: jnp.ndarray, top_p: jnp.ndarray):
    """Rejection-sampling verification of DETERMINISTIC drafts (speculative
    sampling with a delta draft distribution q: accept d_i with prob
    min(1, p(d_i)/q(d_i)) = p(d_i); the residual max(0, p - q) renormalized is
    p with the rejected token removed). The emitted token stream is therefore
    distributed EXACTLY as plain sample_dynamic decoding — the spec-decode
    losslessness guarantee — though not draw-for-draw identical (the rng is
    consumed differently).

    logits: [K+1, V] target logits at the K drafted positions + the bonus
    position; drafts: [K] int32 drafted token ids. Returns (cand [K+1] int32,
    m int32 accepted count in 0..K): cand[:m] == drafts[:m], cand[m] is the
    residual/bonus sample, entries past m are garbage (callers consume exactly
    m + 1 tokens)."""
    K = drafts.shape[0]
    fl = filtered_scaled_logits(logits, temperature, top_p)  # [K+1, V]
    p = jax.nn.softmax(fl, axis=-1)
    k_acc, k_res = jax.random.split(rng)
    u = jax.random.uniform(k_acc, (K,))
    pd = jnp.take_along_axis(p[:K], drafts[:, None], axis=-1)[:, 0]
    acc = (u < pd).astype(jnp.int32)
    m = jnp.sum(jnp.cumprod(acc)).astype(jnp.int32)  # first-rejection index
    row = fl[m]
    # residual: zero the rejected draft's mass; the bonus row (m == K) stays
    # unmasked
    v_iota = jnp.arange(fl.shape[-1], dtype=jnp.int32)
    d_m = drafts[jnp.minimum(m, K - 1)]
    row = jnp.where((m < K) & (v_iota == d_m), -jnp.inf, row)
    # degenerate guard: nucleus == {d_m} AND rejected is reachable only via
    # float round-off (p(d_m) == 1 accepts surely) -> fall back unmasked
    row = jnp.where(jnp.any(jnp.isfinite(row)), row, fl[m])
    final = jax.random.categorical(k_res, row).astype(jnp.int32)
    idxs = jnp.arange(K + 1, dtype=jnp.int32)
    drafts_ext = jnp.concatenate([drafts, jnp.zeros((1,), jnp.int32)])
    cand = jnp.where(idxs == m, final, drafts_ext)
    return cand, m


def sample_dynamic(logits: jnp.ndarray, rng: jax.Array, temperature: jnp.ndarray,
                   top_p: jnp.ndarray) -> jnp.ndarray:
    """Sampling with TRACED temperature/top_p so per-request parameters (the
    serving path: one sampler per request, InferenceService.java:58-99) never
    trigger recompiles. temperature must be > 0 (the greedy case is a separate
    compiled program); top_p is clamped to (0, 1], 1.0 == plain categorical."""
    scaled = logits.astype(jnp.float32) / jnp.maximum(temperature, 1e-6)
    top_p = jnp.clip(top_p, 1e-6, 1.0)
    probs = jax.nn.softmax(scaled, axis=-1)
    sorted_probs = jnp.sort(probs, axis=-1, descending=True)
    sorted_idx = jnp.argsort(probs, axis=-1, descending=True)
    cum = jnp.cumsum(sorted_probs, axis=-1)
    keep = (cum - sorted_probs) < top_p  # first token always kept
    masked = jnp.where(keep, jnp.log(jnp.maximum(sorted_probs, 1e-38)), -jnp.inf)
    choice = jax.random.categorical(rng, masked, axis=-1)
    return jnp.take_along_axis(sorted_idx, choice[..., None], axis=-1)[..., 0].astype(jnp.int32)
