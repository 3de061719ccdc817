"""Sampling op semantics: greedy argmax, nucleus restriction, dynamic params."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from llamatpu.ops.sampling import greedy, sample, sample_dynamic


def test_greedy_argmax():
    logits = jnp.asarray([[0.1, 3.0, -1.0], [2.0, 0.0, 5.0]])
    np.testing.assert_array_equal(np.asarray(greedy(logits)), [1, 2])


def test_top_p_restricts_support():
    # token 0 and 1 carry ~96% of mass; top_p=0.5 must only ever sample token 0
    logits = jnp.asarray([[5.0, 4.0, 0.0, -1.0, -2.0, -3.0, -4.0, -5.0]])
    seen = set()
    for i in range(50):
        tok = sample(logits, jax.random.PRNGKey(i), temperature=1.0, top_p=0.5)
        seen.add(int(tok[0]))
    assert seen == {0}
    # top_p=0.9 admits the top two
    seen = set()
    for i in range(200):
        tok = sample(logits, jax.random.PRNGKey(i), temperature=1.0, top_p=0.9)
        seen.add(int(tok[0]))
    assert seen <= {0, 1} and len(seen) == 2


def test_temperature_zero_is_greedy():
    logits = jnp.asarray([[0.0, 1.0, 0.5]])
    tok = sample(logits, jax.random.PRNGKey(0), temperature=0.0, top_p=0.9)
    assert int(tok[0]) == 1


def test_dynamic_matches_static():
    logits = jnp.asarray(np.random.default_rng(0).normal(size=(2, 16)), jnp.float32)
    for seed in range(5):
        k = jax.random.PRNGKey(seed)
        a = sample(logits, k, temperature=0.7, top_p=0.9)
        b = sample_dynamic(logits, k, jnp.float32(0.7), jnp.float32(0.9))
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_dynamic_top_p_one_is_categorical():
    logits = jnp.asarray([[1.0, 1.0, 1.0, 1.0]])
    seen = {int(sample_dynamic(logits, jax.random.PRNGKey(i),
                               jnp.float32(1.0), jnp.float32(1.0))[0])
            for i in range(100)}
    assert len(seen) == 4  # all tokens reachable under uniform logits
