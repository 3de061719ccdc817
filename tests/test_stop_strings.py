"""Per-request stop strings (OpenAI `stop` param): incremental matcher
semantics and end-to-end truncation through both services.

The reference only stops on stop tokens (InferenceEngine.java stop-token
check); stop strings are an OpenAI-compat serving feature layered on the
decoded text stream.
"""
import jax.numpy as jnp
import pytest

import tiny_models
from llamatpu.models import loader as mloader
from llamatpu.server.service import InferenceService, Request
from llamatpu.server.stop_strings import StopStringMatcher


# ---------------------------------------------------------------- matcher
def test_match_within_one_piece():
    m = StopStringMatcher(["END"])
    out, hit = m.feed("hello END world")
    assert out == "hello " and hit
    assert m.feed("more")[0] == ""
    assert m.flush() == ""


def test_match_split_across_pieces():
    m = StopStringMatcher(["STOP"])
    out, hit = m.feed("abc ST")
    assert out == "abc " and not hit  # "ST" held back as possible prefix
    out, hit = m.feed("OP xyz")
    assert out == "" and hit


def test_holdback_released_on_flush():
    m = StopStringMatcher(["STOP"])
    out, hit = m.feed("abc ST")
    assert out == "abc " and not hit
    assert m.flush() == "ST"


def test_false_prefix_is_emitted():
    m = StopStringMatcher(["STOP"])
    out, hit = m.feed("a ST")
    assert out == "a " and not hit
    out, hit = m.feed("YLE b")  # "ST" was not a stop prefix after all
    assert out == "STYLE b" and not hit
    assert m.flush() == ""


def test_earliest_of_multiple_stops_wins():
    m = StopStringMatcher(["zzz", "bb"])
    out, hit = m.feed("a bb zzz")
    assert out == "a " and hit


def test_empty_and_none_stops_pass_through():
    m = StopStringMatcher([])
    assert m.feed("anything") == ("anything", False)
    m2 = StopStringMatcher(["", "X"])
    assert m2.feed("abc")[0] == "abc"


def test_repeated_prefix_overlap():
    # "aab" in "aaab": first feed holds "aa", match completes later
    m = StopStringMatcher(["aab"])
    out, hit = m.feed("aa")
    assert out == "" and not hit
    out, hit = m.feed("ab")
    assert out == "a" and hit  # match starts at index 1


# ---------------------------------------------------------------- services
@pytest.fixture(scope="module")
def model(tmp_path_factory):
    path = tmp_path_factory.mktemp("stopstr") / "m.gguf"
    tiny_models.build_tiny_gguf(path, family="llama", with_tokenizer=True, seed=23)
    return mloader.load_model(str(path), param_dtype=jnp.float32)


def _pick_stop(full_text: str) -> str:
    """A substring from the middle of the deterministic greedy output."""
    assert len(full_text) >= 8, full_text
    mid = len(full_text) // 2
    return full_text[mid : mid + 3]


def test_service_stop_string_truncates(model):
    from llamatpu.runtime.engine import Engine

    engine = Engine(model, cache_dtype=jnp.float32, aot_compile=False,
                    decode_window=4)
    svc = InferenceService(model, engine)
    base = Request(messages=[{"role": "user", "content": "hi"}], max_tokens=24,
                   temperature=0.0)
    full = svc.generate(base)
    stop = _pick_stop(full.text)
    r = svc.generate(Request(messages=[{"role": "user", "content": "hi"}],
                             max_tokens=24, temperature=0.0, stop=[stop]))
    assert r.finish_reason == "stop"
    assert stop not in r.text
    assert r.text == full.text[: full.text.index(stop)]
    assert r.completion_tokens <= full.completion_tokens

    # streamed pieces must concatenate to the same truncated text
    pieces = []
    r2 = svc.generate(Request(messages=[{"role": "user", "content": "hi"}],
                              max_tokens=24, temperature=0.0, stop=[stop]),
                      on_piece=pieces.append)
    assert "".join(pieces) == r2.text == r.text


def test_batched_service_stop_string(model):
    from llamatpu.runtime.batch_engine import BatchEngine
    from llamatpu.server.service import BatchedInferenceService

    be = BatchEngine(model, batch_size=2, cache_dtype=jnp.float32,
                     decode_window=4)
    svc = BatchedInferenceService(model, be)
    try:
        base = Request(messages=[{"role": "user", "content": "hi"}],
                       max_tokens=24, temperature=0.0)
        full = svc.generate(base)
        stop = _pick_stop(full.text)
        r = svc.generate(Request(messages=[{"role": "user", "content": "hi"}],
                                 max_tokens=24, temperature=0.0, stop=[stop]))
        assert r.finish_reason == "stop"
        assert stop not in r.text
        assert r.text == full.text[: full.text.index(stop)]
    finally:
        svc.batcher.shutdown()


def test_no_match_emits_everything(model):
    from llamatpu.runtime.engine import Engine

    engine = Engine(model, cache_dtype=jnp.float32, aot_compile=False,
                    decode_window=4)
    svc = InferenceService(model, engine)
    base = Request(messages=[{"role": "user", "content": "hi"}], max_tokens=16,
                   temperature=0.0)
    full = svc.generate(base)
    r = svc.generate(Request(messages=[{"role": "user", "content": "hi"}],
                             max_tokens=16, temperature=0.0,
                             stop=["\x00NEVER\x00"]))
    assert r.text == full.text
    assert r.finish_reason == full.finish_reason
