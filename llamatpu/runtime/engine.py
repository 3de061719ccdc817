"""Single-sequence inference engine: AOT-compiled prefill/decode XLA programs.

This is the TPU replacement for the reference's whole execution stack —
TornadoVMMasterPlan{SingleToken,PrefillDecode,BatchPrefillDecode} + the
InferenceEngine* generation loops (SURVEY.md §2.4-2.5). Design mapping
(SURVEY.md §7.1):

- one jitted program per step (scan over layers inside) instead of N+2
  TaskGraph dispatches per token (TornadoVMMasterPlanSingleToken.java:68-96)
- prefill is ALWAYS batched over the token window (the reference's
  batch-prefill MMA mode is the TPU default: chunked causal GEMM prefill with
  the final partial chunk padded; pad garbage in the KV cache sits beyond the
  real length and every later reader overwrites its position before attending
  to it)
- KV cache + rng live in a donated pytree, updated in place on device — the
  analog of persistOnDevice/consumeFromDevice buffer plumbing
- sampling happens inside the decode program; only the 4-byte token id leaves
  the chip (vs the reference's opt-in deviceSample argmax, LlamaApp.java:24-38)
- AOT compile at construction == withPreCompilation() JIT warmup; weight
  device_put == forceCopyInReadOnlyData(), both timed into RunMetrics
  (TornadoVMMasterPlan.java:55-70)
"""
from __future__ import annotations

import time
from dataclasses import dataclass, field
from functools import partial

import jax
import jax.numpy as jnp

from llamatpu.models.loader import LoadedModel
from llamatpu.models.transformer import KVCache, forward_tokens, init_cache
from llamatpu.ops.sampling import make_sampler
from llamatpu.utils.metrics import RunMetrics, Timer


@dataclass
class GenerationResult:
    tokens: list[int]
    stop_reason: str  # "stop_token" | "length"
    metrics: RunMetrics


class Engine:
    def __init__(
        self,
        model: LoadedModel,
        batch_size: int = 1,
        cache_len: int | None = None,
        prefill_chunk: int = 128,
        impl: str = "xla",
        cache_dtype=jnp.bfloat16,
        temperature: float = 0.0,
        top_p: float = 0.0,
        seed: int = 42,
        aot_compile: bool = True,
        metrics: RunMetrics | None = None,
        decode_window: int = 16,
    ):
        self.model = model
        self.cfg = model.cfg
        self.batch_size = batch_size
        self.cache_len = cache_len or self.cfg.context_length
        self.prefill_chunk = min(prefill_chunk, self.cache_len)
        self.impl = impl
        self.cache_dtype = cache_dtype
        self.metrics = metrics or RunMetrics()
        self._sample = make_sampler(temperature, top_p)
        self._rng = jax.random.PRNGKey(seed)

        cfg, impl_ = self.cfg, impl

        def prefill_fn(weights, tokens, cache, pos, logit_idx, rng):
            logits, cache = forward_tokens(cfg, weights, tokens, cache, pos,
                                           impl=impl_, logit_index=logit_idx)
            rng, sub = jax.random.split(rng)
            next_tok = self._sample(logits, sub)
            return next_tok, logits, cache, rng

        def decode_fn(weights, token, cache, pos, rng):
            logits, cache = forward_tokens(cfg, weights, token, cache, pos,
                                           impl=impl_, last_logit_only=True)
            rng, sub = jax.random.split(rng)
            next_tok = self._sample(logits, sub)
            return next_tok, cache, rng

        W = self.decode_window = max(1, int(decode_window))

        def decode_n_fn(weights, token, cache, pos0, rng, stops, limit):
            """Device-side autoregressive loop: up to `limit` (<= W) tokens in ONE
            dispatch, stopping early when a stop token is sampled. Replaces
            per-token host round trips (the reference's per-token
            tornadoVMForwardDecode dispatch; on a remote-attached TPU each
            host hop costs ~30ms, so the loop must live on device)."""
            b = token.shape[0]
            out = jnp.zeros((W, b), jnp.int32)

            def cond(c):
                i, tok, cache, pos, rng, out, done = c
                return jnp.logical_and(i < limit, jnp.logical_not(done))

            def body(c):
                i, tok, cache, pos, rng, out, done = c
                logits, cache = forward_tokens(cfg, weights, tok[:, None], cache, pos,
                                               impl=impl_, last_logit_only=True)
                rng, sub = jax.random.split(rng)
                nxt = self._sample(logits, sub)
                out = out.at[i].set(nxt)
                done = jnp.isin(nxt, stops).any()
                return (i + 1, nxt, cache, pos + 1, rng, out, done)

            i, tok, cache, pos, rng, out, done = jax.lax.while_loop(
                cond, body,
                (jnp.int32(0), token, cache, pos0, rng, out, jnp.bool_(False)))
            return out, i, cache, rng

        # donate the KV cache and rng for in-place update; everything the host
        # loop touches is inside these programs (sampling + stop detection
        # included), so steady-state host<->device traffic is W token ids per
        # dispatch
        self._prefill = jax.jit(prefill_fn, donate_argnums=(2, 5))
        self._decode = jax.jit(decode_fn, donate_argnums=(2, 4))
        self._decode_n = jax.jit(decode_n_fn, donate_argnums=(2, 4))

        with Timer() as t:
            self.weights = jax.device_put(model.weights)
            jax.block_until_ready(jax.tree.leaves(self.weights))
        self.metrics.weight_upload_s = t.elapsed

        self.cache = init_cache(cfg, batch_size, cache_dtype, self.cache_len)

        if aot_compile:
            self._aot_compile()

    # ------------------------------------------------------------------
    def _aot_compile(self) -> None:
        """Warm up the jit caches for the decode and prefill-chunk shapes
        (== withPreCompilation). Uses real warmup calls so the executables land
        in the dispatch cache; the cache is rebuilt afterwards since donation
        consumes it."""
        import numpy as np

        b = self.batch_size
        tok1 = np.zeros((b, 1), np.int32)
        tokc = np.zeros((b, self.prefill_chunk), np.int32)
        pos = np.int32(0)
        with Timer() as t:
            _, _, cache, self._rng = self._prefill(
                self.weights, tokc, self.cache, pos, np.int32(0), self._rng)
            _, _, cache, self._rng = self._decode_n(
                self.weights, np.zeros((b,), np.int32), cache, pos, self._rng,
                self._stops_array(set()), np.int32(1))
            jax.block_until_ready(self._rng)
        self.metrics.compile_s = t.elapsed
        self.reset()

    # ------------------------------------------------------------------
    def reset(self) -> None:
        self.cache = init_cache(self.cfg, self.batch_size, self.cache_dtype, self.cache_len)

    def prefill(self, tokens: list[int], start_pos: int = 0):
        """Run the prompt through the model in causal chunks; returns
        (sampled_next_token [B], last real token's logits [B, V]). Advances the
        KV cache in place. All inputs are numpy so jit handles transfers — no
        eager op dispatches in the host loop."""
        import numpy as np

        assert self.batch_size == 1, "Engine.prefill is single-sequence; use BatchEngine for B>1"
        c = self.prefill_chunk
        n = len(tokens)
        tok = logits = None
        i = 0
        while i < n:
            chunk = tokens[i : i + c]
            r = len(chunk)
            if r < c:
                chunk = chunk + [0] * (c - r)  # pad final partial chunk
            arr = np.asarray([chunk], np.int32)
            tok, logits, self.cache, self._rng = self._prefill(
                self.weights, arr, self.cache, np.int32(start_pos + i),
                np.int32(r - 1), self._rng)
            i += r
        return tok, logits

    def decode_step(self, token: int, pos: int) -> int:
        import numpy as np

        tok = np.full((self.batch_size, 1), token, np.int32)
        next_tok, self.cache, self._rng = self._decode(
            self.weights, tok, self.cache, np.int32(pos), self._rng)
        return int(next_tok[0])

    # ------------------------------------------------------------------
    def generate(
        self,
        prompt_tokens: list[int],
        max_new_tokens: int,
        stop_tokens: set[int] = frozenset(),
        on_token=None,
        echo: bool = False,
        start_pos: int = 0,
    ) -> GenerationResult:
        """Autoregressive generation (reference: InferenceEngine.generateTokens*,
        InferenceEngine.java:81-680): prompt ingestion, decode with stop-token
        check and streaming callback, per-phase metrics."""
        m = self.metrics
        assert prompt_tokens, "empty prompt"
        if echo and on_token:
            for t in prompt_tokens:
                on_token(t)

        total = start_pos + len(prompt_tokens)
        assert total <= self.cache_len, (
            f"prompt ({total}) exceeds cache length {self.cache_len}")

        t0 = time.perf_counter()
        tok_arr, _ = self.prefill(prompt_tokens, start_pos)
        first = int(tok_arr[0])  # blocks until the prefill chain completes
        m.prefill_s += time.perf_counter() - t0
        m.prefill_tokens += len(prompt_tokens)

        import numpy as np

        out: list[int] = []
        stop_reason = "length"
        tok = first
        pos = total
        stops_arr = self._stops_array(stop_tokens)
        t0 = time.perf_counter()

        out.append(tok)
        if on_token:
            on_token(tok)
        if tok in stop_tokens:
            stop_reason = "stop_token"
        else:
            remaining = max_new_tokens - 1
            while remaining > 0 and pos + 1 < self.cache_len:
                limit = min(self.decode_window, remaining, self.cache_len - pos - 1)
                toks, count, self.cache, self._rng = self._decode_n(
                    self.weights, np.full((self.batch_size,), tok, np.int32),
                    self.cache, np.int32(pos), self._rng, stops_arr, np.int32(limit))
                count = int(count)
                window = [int(t) for t in toks[:count, 0]]
                for t in window:
                    out.append(t)
                    if on_token:
                        on_token(t)
                if window and window[-1] in stop_tokens:
                    stop_reason = "stop_token"
                    break
                if count == 0:
                    break
                tok = window[-1]
                pos += count
                remaining -= count

        m.decode_s += time.perf_counter() - t0
        m.decode_tokens += len(out)
        return GenerationResult(out, stop_reason, m)

    @staticmethod
    def _stops_array(stop_tokens, pad_to: int = 8):
        """Fixed-size stop-token array (padded with -1) so the decode program
        never recompiles across differing stop sets."""
        import numpy as np

        stops = sorted(stop_tokens)[:pad_to]
        arr = np.full((pad_to,), -1, np.int32)
        arr[: len(stops)] = stops
        return arr
