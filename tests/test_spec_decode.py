"""Prompt-lookup speculative decoding: greedy output must be IDENTICAL to
plain greedy decoding (speculation only changes how many forwards produce it),
for accepting and rejecting drafts, stop tokens, and tight budgets."""
import numpy as np
import pytest

import jax.numpy as jnp

import tiny_models
from llamatpu.gguf import GGMLType
from llamatpu.models import loader as mloader
from llamatpu.runtime.engine import Engine


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    path = tmp_path_factory.mktemp("spec") / "m.gguf"
    tiny_models.build_tiny_gguf(path, family="llama", quant=GGMLType.F32, seed=23)
    return mloader.load_model(str(path), mode="dequant", param_dtype=jnp.float32,
                              load_tokenizer=False)


def _pair(model, k):
    ref = Engine(model, cache_dtype=jnp.float32, aot_compile=False,
                 decode_window=6)
    spec = Engine(model, cache_dtype=jnp.float32, aot_compile=False,
                  decode_window=6, spec_decode=k)
    return ref, spec


def test_spec_matches_greedy_random_prompt(model):
    """Random prompt: drafts mostly reject — output still identical."""
    ref, spec = _pair(model, 4)
    prompt = [5, 9, 23, 41, 8, 2]
    r = ref.generate(prompt, 10).tokens
    s = spec.generate(prompt, 10).tokens
    assert s == r


def test_spec_matches_greedy_repetitive_prompt(model):
    """Repetitive prompt: the bigram lookup finds continuations — accepted
    drafts must not change the output."""
    ref, spec = _pair(model, 4)
    prompt = [7, 8, 9, 7, 8, 9, 7, 8, 9, 7, 8]
    r = ref.generate(prompt, 12).tokens
    s = spec.generate(prompt, 12).tokens
    assert s == r


def test_spec_respects_stop_tokens_and_budget(model):
    ref, spec = _pair(model, 4)
    prompt = [3, 1, 4, 1, 5]
    r = ref.generate(prompt, 8).tokens
    # use the greedy continuation's 3rd token as a stop token
    stop = {r[2]}
    r2 = ref.generate(prompt, 8, stop_tokens=stop)
    s2 = spec.generate(prompt, 8, stop_tokens=stop)
    assert s2.tokens == r2.tokens
    assert s2.stop_reason == r2.stop_reason == "stop_token"
    # budget exactness
    assert spec.generate(prompt, 3).tokens == ref.generate(prompt, 3).tokens
    assert len(spec.generate(prompt, 3).tokens) == 3


def test_spec_multiturn_continuation(model):
    """KV continuation across calls (chat session pattern: the last generated
    token is re-fed next turn since its KV was never written) stays exact."""
    ref, spec = _pair(model, 3)
    p1 = [11, 12, 13, 14]
    r1 = ref.generate(p1, 5).tokens
    s1 = spec.generate(p1, 5).tokens
    assert s1 == r1
    p2 = [r1[-1], 20, 21]
    start = len(p1) + len(r1) - 1
    r2 = ref.generate(p2, 5, start_pos=start).tokens
    s2 = spec.generate(p2, 5, start_pos=start).tokens
    assert s2 == r2


def test_spec_sampled_low_temp_matches_greedy(model):
    """Rejection-sampled verification at temperature -> 0 degenerates to the
    greedy verify (draft == argmax accepted surely, residual/bonus == argmax):
    the sampled-spec stream must equal the greedy-spec stream exactly."""
    _, spec = _pair(model, 4)
    prompt = [7, 8, 9, 7, 8, 9, 7, 8, 9, 7, 8]
    g = spec.generate(prompt, 12).tokens  # greedy spec program
    spec.reset()
    s = spec.generate(prompt, 12, temperature=1e-6, top_p=1.0).tokens
    assert s == g


def test_spec_sampled_runs_with_telemetry(model):
    """Sampled requests speculate too (rejection sampling): generation runs to
    budget and records acceptance telemetry."""
    spec = Engine(model, cache_dtype=jnp.float32, aot_compile=False,
                  decode_window=4, spec_decode=4, seed=7)
    prompt = [7, 8, 9, 7, 8, 9, 7, 8]
    r = spec.generate(prompt, 10, temperature=0.8, top_p=0.9)
    assert len(r.tokens) == 10
    ex = spec.metrics.extra
    assert ex["spec_forwards"] >= 1
    assert ex["spec_emitted"] >= ex["spec_forwards"]


def test_spec_verify_sample_marginal_distribution():
    """The losslessness guarantee, tested where it is checkable: the FIRST
    emitted token of spec_verify_sample (drafts[0] if accepted, else the
    residual sample) must be distributed exactly as sample_dynamic's filtered
    softmax of row 0 — p(d)*delta_d + (1-p(d))*[p without d] == p for a delta
    draft. Empirical marginal over many keys vs the analytic distribution."""
    import jax

    from llamatpu.ops import sampling

    V, K, N = 16, 3, 20000
    rng = np.random.default_rng(3)
    logits = jnp.asarray(rng.normal(0, 2.0, (K + 1, V)), jnp.float32)
    drafts = jnp.asarray([4, 11, 2], jnp.int32)
    temp, topp = jnp.float32(0.8), jnp.float32(0.9)

    def first_tok(key):
        cand, m = sampling.spec_verify_sample(logits, drafts, key, temp, topp)
        return cand[0]

    keys = jax.random.split(jax.random.PRNGKey(0), N)
    toks = np.asarray(jax.jit(jax.vmap(first_tok))(keys))
    emp = np.bincount(toks, minlength=V) / N
    target = np.asarray(jax.nn.softmax(
        sampling.filtered_scaled_logits(logits[0], temp, topp)))
    # sd of a frequency estimate <= 0.5/sqrt(N) ~ 0.0035; 6 sigma
    np.testing.assert_allclose(emp, target, atol=0.022)
    # tokens outside the nucleus must never be emitted
    assert emp[target == 0.0].sum() == 0.0


def test_spec_acceptance_telemetry(model):
    """RunMetrics records verify forwards + emitted tokens; on a repetitive
    prompt the lookup accepts drafts, so emitted > forwards (rate > 0)."""
    _, spec = _pair(model, 4)
    prompt = [7, 8, 9, 7, 8, 9, 7, 8, 9, 7, 8]
    spec.generate(prompt, 12)
    ex = spec.metrics.extra
    assert ex["spec_forwards"] >= 1
    assert ex["spec_emitted"] >= ex["spec_forwards"]
    assert "spec_accept_rate" in ex
    assert ex["spec_accept_rate"] >= 0.0
