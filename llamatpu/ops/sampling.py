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
