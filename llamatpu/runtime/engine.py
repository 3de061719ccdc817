"""Single-sequence inference engine: AOT-compiled prefill/decode XLA programs.

This is the TPU replacement for the reference's whole execution stack —
TornadoVMMasterPlan{SingleToken,PrefillDecode,BatchPrefillDecode} + the
InferenceEngine* generation loops (SURVEY.md §2.4-2.5). Design mapping
(SURVEY.md §7.1):

- one jitted program per step (scan over layers inside) instead of N+2
  TaskGraph dispatches per token (TornadoVMMasterPlanSingleToken.java:68-96)
- prefill is ALWAYS batched over the token window (the reference's
  batch-prefill MMA mode is the TPU default): chunked causal GEMM prefill with
  the final partial chunk padded; pad garbage in the KV cache sits beyond the
  real length and every later reader overwrites its position before attending
  to it
- decode runs as a DEVICE-SIDE autoregressive loop (lax.while_loop window of up
  to `decode_window` tokens per dispatch, sampling + stop-token detection on
  device) — the whole-token analog of the reference's CUDA-graphs mode; on a
  remote-attached TPU each host hop costs ~30ms so per-token dispatch is not
  viable, and on local hosts it still removes launch overhead
- KV cache + rng live in donated pytrees, updated in place on device — the
  analog of persistOnDevice/consumeFromDevice buffer plumbing
- sampling happens inside the programs with TRACED temperature/top_p (two
  compiled variants: greedy and sampled) so per-request sampler params
  (InferenceService.java:58-99) never recompile; only token ids leave the chip
- AOT compile at construction == withPreCompilation() JIT warmup; weight
  device_put == forceCopyInReadOnlyData(), both timed into RunMetrics
  (TornadoVMMasterPlan.java:55-70)
"""
from __future__ import annotations

import time
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from llamatpu.models.loader import LoadedModel
from llamatpu.models.transformer import forward_tokens, init_cache
from llamatpu.ops import sampling
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
        mesh=None,
        ep: bool = False,
        spec_decode: int = 0,
        rowq: bool = False,
    ):
        self.model = model
        self.cfg = model.cfg
        self.batch_size = batch_size
        self.cache_len = cache_len or self.cfg.context_length
        self.prefill_chunk = min(prefill_chunk, self.cache_len)
        self.impl = impl
        self.cache_dtype = cache_dtype
        self.metrics = metrics or RunMetrics()
        self.default_temperature = temperature
        self.default_top_p = top_p
        self.decode_window = max(1, int(decode_window))
        self._rng = jax.random.PRNGKey(seed)
        self._progs: dict[bool, tuple] = {}
        self.mesh = mesh  # jax.sharding.Mesh for tensor/data parallelism
        self.ep = bool(ep and mesh is not None)  # expert-parallel MoE placement
        self.pp = bool(mesh is not None and mesh.shape.get("pp", 1) > 1)
        if self.pp:
            assert not self.ep, "pp + expert parallelism not supported yet"
        # prompt-lookup speculative decoding: draft length K (0 = off).
        # Each step drafts K tokens from the token history's last-bigram
        # continuation and verifies them in ONE T=1+K forward — on a
        # weight-bandwidth-bound chip that forward reads the same weight bytes
        # as T=1, so accepted drafts are nearly free (measured <5% step-cost
        # overhead at K=8 on chip, up to ~(1+K)x on predictable text).
        # GREEDY: every emitted token is the verify forward's own argmax —
        # bit-exact vs plain greedy when the forward is batch-invariant
        # (f32/XLA, tested); under bf16 TPU kernels the T=1+K tiling can flip
        # argmax near-ties, the standard speculative-decoding caveat.
        # SAMPLED: rejection-sampling verification (sampling.spec_verify_sample
        # — accept draft d_i with prob p(d_i), residual-sample at the first
        # rejection) emits a stream distributed EXACTLY as plain sampled
        # decoding (distribution-exact, not draw-for-draw identical: the rng
        # is consumed per verify forward, not per token).
        self.spec_k = max(0, int(spec_decode))
        assert self.spec_k == 0 or batch_size == 1, \
            "speculative decoding is single-sequence"
        self._ids = None  # [B, physical_len] device token-id history (spec)

        with Timer() as t:
            # fuse qkv / gate+up (unsharded), optional q8_row requant
            # (per-row int8 serving format: scale-free decode streams + int8
            # MXU prefill; fidelity gated by bench/parity.py `q8_row` rows),
            # then device_put with mesh shardings (parallel/shard.py handles
            # q8_row's [.., O, 1] scale layout)
            from llamatpu.models.weights import serving_weights

            self.weights = serving_weights(self.cfg, model.weights, mesh=mesh,
                                           ep=self.ep, rowq=rowq)
            jax.block_until_ready(jax.tree.leaves(self.weights))
        self.metrics.weight_upload_s = t.elapsed

        self.cache = self._new_cache()

        if aot_compile:
            self._aot_compile()

    def _new_cache(self):
        from llamatpu.models.transformer import physical_cache_len

        plen = physical_cache_len(self.cache_len, self.prefill_chunk)
        cache = init_cache(self.cfg, self.batch_size, self.cache_dtype, plen)
        if self.mesh is not None:
            from llamatpu.parallel import cache_shardings

            cache = jax.device_put(cache, cache_shardings(self.cfg, self.mesh, cache))
        if self.spec_k:
            self._ids = jnp.zeros((self.batch_size, plen), jnp.int32)
        return cache

    # ------------------------------------------------------------------
    def _programs(self, greedy: bool):
        """Build (or fetch) the jitted prefill/decode programs for one sampling
        mode. Greedy and sampled are separate compiled variants; within the
        sampled variant temperature/top_p are traced scalars."""
        if greedy in self._progs:
            return self._progs[greedy]
        cfg, impl, W = self.cfg, self.impl, self.decode_window
        ep_mesh = self.mesh if self.ep else None
        s_limit = self.cache_len

        if self.pp:
            from llamatpu.parallel.pipeline import forward_tokens_pp

            def fwd(weights, tokens, cache, pos, **kw):
                return forward_tokens_pp(cfg, weights, tokens, cache, pos,
                                         self.mesh, impl=impl,
                                         s_limit=s_limit, **kw)
        else:
            def fwd(weights, tokens, cache, pos, **kw):
                return forward_tokens(cfg, weights, tokens, cache, pos,
                                      impl=impl, ep_mesh=ep_mesh,
                                      s_limit=s_limit, **kw)

        def sample_fn(logits, sub, temp, topp):
            if greedy:
                return sampling.greedy(logits)
            return sampling.sample_dynamic(logits, sub, temp, topp)

        K = self.spec_k

        def prefill_fn(weights, tokens, cache, pos, logit_idx, rng, temp, topp):
            logits, cache = fwd(weights, tokens, cache, pos,
                                logit_index=logit_idx)
            rng, sub = jax.random.split(rng)
            next_tok = sample_fn(logits, sub, temp, topp)
            return next_tok, logits, cache, rng

        def prefill_spec_fn(weights, tokens, cache, ids, pos, logit_idx, rng,
                            temp, topp):
            # record the prompt ids (the prompt-lookup draft corpus); pad
            # garbage past the real length is masked by the search (j <= pos-2)
            # or overwritten by the next contiguous chunk/window
            ids = jax.lax.dynamic_update_slice(ids, tokens, (0, pos))
            next_tok, logits, cache, rng = prefill_fn(
                weights, tokens, cache, pos, logit_idx, rng, temp, topp)
            return next_tok, logits, cache, ids, rng

        def spec_decode_n_fn(weights, token, cache, ids, pos0, rng, stops, limit,
                             temp, topp):
            """Prompt-lookup speculative decode: each step drafts K tokens
            from the last bigram's previous continuation in the token history
            and verifies them in ONE T=1+K forward (same weight HBM traffic as
            T=1). Greedy: emits the accepted argmax-match prefix + one bonus
            token — identical to plain greedy decode by construction. Sampled:
            rejection-sampling verification (sampling.spec_verify_sample) —
            the emitted stream is distributed exactly as plain sampled decode.
            Rejected drafts leave garbage KV/ids past the accepted position;
            the next window starts there and rewrites every such position
            before any query attends to it (same invariant as padded prefill
            chunks)."""
            b = token.shape[0]
            out = jnp.full((W + K, b), -1, jnp.int32)

            def cond(c):
                cnt, nfwd, tok, cache_, ids_, pos, rng_, out_, done = c
                return jnp.logical_and(cnt < limit, jnp.logical_not(done))

            def body(c):
                cnt, nfwd, tok, cache_, ids_, pos, rng_, out_, done = c
                s_phys = ids_.shape[1]
                a = ids_[0, pos - 1]
                iota = jnp.arange(s_phys - 1, dtype=jnp.int32)
                hitmask = ((iota <= pos - 2) & (ids_[0, :-1] == a)
                           & (ids_[0, 1:] == tok[0]))
                jstar = jnp.max(jnp.where(hitmask, iota, -1))
                start = jnp.clip(jstar + 2, 0, s_phys - K)
                drafts = jax.lax.dynamic_slice(ids_, (0, start), (1, K))[0]
                drafts = jnp.where(jstar >= 0, drafts, jnp.full((K,), tok[0]))
                w = jnp.concatenate([tok, drafts])[None, :]        # [1, 1+K]
                ids_ = jax.lax.dynamic_update_slice(ids_, w, (0, pos))
                logits, cache_ = fwd(weights, w, cache_, pos)      # [1,1+K,V]
                if greedy:
                    cand = jnp.argmax(logits[0], axis=-1).astype(jnp.int32)
                    match = (cand[:-1] == drafts).astype(jnp.int32)
                    m = jnp.sum(jnp.cumprod(match))                # accepted
                else:
                    rng_, sub = jax.random.split(rng_)
                    cand, m = sampling.spec_verify_sample(
                        logits[0], drafts, sub, temp, topp)
                idxs = jnp.arange(K + 1, dtype=jnp.int32)
                isstop = jnp.isin(cand, stops)
                stop_at = jnp.min(jnp.where(isstop & (idxs <= m), idxs, K + 1))
                e = jnp.where(stop_at <= m, stop_at + 1, m + 1)
                e = jnp.minimum(e, limit - cnt)                    # budget
                e = jnp.minimum(e, jnp.maximum(1, self.cache_len - 1 - pos))
                hit = (stop_at <= m) & (stop_at + 1 <= e)
                out_ = jax.lax.dynamic_update_slice(out_, cand[:, None], (cnt, 0))
                tok_n = cand[e - 1][None]
                pos_n = pos + e
                done_n = hit | (pos_n + 1 >= self.cache_len)
                return (cnt + e, nfwd + 1, tok_n, cache_, ids_, pos_n, rng_,
                        out_, done_n)

            cnt, nfwd, tok, cache, ids, pos, rng, out, done = jax.lax.while_loop(
                cond, body,
                (jnp.int32(0), jnp.int32(0), token, cache, ids, pos0, rng, out,
                 jnp.bool_(False)))
            # nfwd = verify forwards this window; emitted/forwards - 1 is the
            # mean accepted drafts per step (acceptance telemetry, RunMetrics)
            return out, cnt, nfwd, cache, ids, rng

        def decode_n_fn(weights, token, cache, pos0, rng, stops, limit, temp, topp):
            b = token.shape[0]
            out = jnp.zeros((W, b), jnp.int32)

            def cond(c):
                i, tok, cache_, pos, rng_, out_, done = c
                return jnp.logical_and(i < limit, jnp.logical_not(done))

            def body(c):
                i, tok, cache_, pos, rng_, out_, done = c
                logits, cache_ = fwd(weights, tok[:, None], cache_, pos,
                                     last_logit_only=True)
                rng_, sub = jax.random.split(rng_)
                nxt = sample_fn(logits, sub, temp, topp)
                out_ = out_.at[i].set(nxt)
                done = jnp.isin(nxt, stops).any()
                return (i + 1, nxt, cache_, pos + 1, rng_, out_, done)

            i, tok, cache, pos, rng, out, done = jax.lax.while_loop(
                cond, body,
                (jnp.int32(0), token, cache, pos0, rng, out, jnp.bool_(False)))
            return out, i, cache, rng

        if K:
            progs = (
                jax.jit(prefill_spec_fn, donate_argnums=(2, 3, 6)),
                jax.jit(spec_decode_n_fn, donate_argnums=(2, 3, 5)),
            )
        else:
            progs = (
                jax.jit(prefill_fn, donate_argnums=(2, 5)),
                jax.jit(decode_n_fn, donate_argnums=(2, 4)),
            )
        self._progs[greedy] = progs
        return progs

    def _resolve_sampling(self, temperature, top_p):
        t = self.default_temperature if temperature is None else temperature
        p = self.default_top_p if top_p is None else top_p
        return (t == 0.0), np.float32(t), np.float32(p)

    # ------------------------------------------------------------------
    def _aot_compile(self) -> None:
        """Warm up the jit caches for the default sampling mode's prefill-chunk
        and decode-window programs (== withPreCompilation)."""
        b = self.batch_size
        greedy, temp, topp = self._resolve_sampling(None, None)
        prefill, decode_n = self._programs(greedy)
        with Timer() as t:
            if self.spec_k:
                _, _, cache, self._ids, self._rng = prefill(
                    self.weights, np.zeros((b, self.prefill_chunk), np.int32),
                    self.cache, self._ids, np.int32(0), np.int32(0),
                    self._rng, temp, topp)
                _, _, _, cache, self._ids, self._rng = decode_n(
                    self.weights, np.ones((b,), np.int32), cache, self._ids,
                    np.int32(1), self._rng, self._stops_array(set()),
                    np.int32(1), temp, topp)
            else:
                _, _, cache, self._rng = prefill(
                    self.weights, np.zeros((b, self.prefill_chunk), np.int32),
                    self.cache, np.int32(0), np.int32(0), self._rng, temp, topp)
                _, _, cache, self._rng = decode_n(
                    self.weights, np.zeros((b,), np.int32), cache, np.int32(0),
                    self._rng, self._stops_array(set()), np.int32(1), temp, topp)
            jax.block_until_ready(self._rng)
        self.metrics.compile_s = t.elapsed
        self.reset()

    # ------------------------------------------------------------------
    def reset(self, seed: int | None = None) -> None:
        self.cache = self._new_cache()
        if seed is not None:
            self._rng = jax.random.PRNGKey(seed)

    def reseed(self, seed: int) -> None:
        """Reset the sampling rng WITHOUT dropping the KV cache (prefix-cache
        reuse across requests keeps the cache; stale positions beyond the
        written length are never attended)."""
        self._rng = jax.random.PRNGKey(seed)

    def prefill(self, tokens: list[int], start_pos: int = 0,
                temperature=None, top_p=None):
        """Run the prompt through the model in causal chunks; returns
        (sampled_next_token [B], last real token's logits [B, V]). Advances the
        KV cache in place. All inputs are numpy so jit handles transfers — no
        eager dispatches in the host loop."""
        assert self.batch_size == 1, "Engine.prefill is single-sequence; use BatchEngine for B>1"
        greedy, temp, topp = self._resolve_sampling(temperature, top_p)
        prefill, _ = self._programs(greedy)
        from llamatpu.models.transformer import pad_chunk_len

        c = self.prefill_chunk
        n = len(tokens)
        tok = logits = None
        i = 0
        spec = bool(self.spec_k)
        while i < n:
            chunk = tokens[i : i + c]
            r = len(chunk)
            if r < c:  # pad final partial chunk to the next granule
                chunk = chunk + [0] * (pad_chunk_len(r, c) - r)
            arr = np.asarray([chunk], np.int32)
            if spec:
                tok, logits, self.cache, self._ids, self._rng = prefill(
                    self.weights, arr, self.cache, self._ids,
                    np.int32(start_pos + i), np.int32(r - 1), self._rng,
                    temp, topp)
            else:
                tok, logits, self.cache, self._rng = prefill(
                    self.weights, arr, self.cache, np.int32(start_pos + i),
                    np.int32(r - 1), self._rng, temp, topp)
            i += r
        return tok, logits

    def decode_window_run(self, token: int, pos: int, limit: int,
                          stop_tokens=frozenset(), temperature=None, top_p=None):
        """One device-side decode window: generate up to `limit` (<= decode
        window W) tokens starting after `token` at position `pos`. Returns the
        list of generated ids (stop token included if hit)."""
        greedy, temp, topp = self._resolve_sampling(temperature, top_p)
        _, decode_n = self._programs(greedy)
        limit = min(limit, self.decode_window, self.cache_len - pos - 1)
        if limit <= 0:
            return []
        if self.spec_k:
            toks, count, nfwd, self.cache, self._ids, self._rng = decode_n(
                self.weights, np.full((self.batch_size,), token, np.int32),
                self.cache, self._ids, np.int32(pos), self._rng,
                self._stops_array(stop_tokens), np.int32(limit), temp, topp)
            toks_h, count_h, nfwd_h = jax.device_get((toks, count, nfwd))
            ex = self.metrics.extra
            ex["spec_emitted"] = ex.get("spec_emitted", 0) + int(count_h)
            ex["spec_forwards"] = ex.get("spec_forwards", 0) + int(nfwd_h)
            if ex["spec_forwards"]:
                # mean drafted tokens accepted per verify forward (0 = no
                # speedup, K = every draft accepted); the bench row's metric
                ex["spec_accept_rate"] = round(
                    ex["spec_emitted"] / ex["spec_forwards"] - 1.0, 4)
            return toks_h[: int(count_h), 0].tolist()
        else:
            toks, count, self.cache, self._rng = decode_n(
                self.weights, np.full((self.batch_size,), token, np.int32),
                self.cache, np.int32(pos), self._rng,
                self._stops_array(stop_tokens), np.int32(limit), temp, topp)
        # ONE device->host fetch for the whole window (indexing the device
        # array per element costs a full host round trip PER TOKEN — ~30ms
        # each on a remote-attached chip)
        toks_h, count_h = jax.device_get((toks, count))
        return toks_h[: int(count_h), 0].tolist()

    def decode_step(self, token: int, pos: int, temperature=None, top_p=None) -> int:
        out = self.decode_window_run(token, pos, 1, frozenset(), temperature, top_p)
        return out[0] if out else -1

    # ------------------------------------------------------------------
    def generate(
        self,
        prompt_tokens: list[int],
        max_new_tokens: int,
        stop_tokens: set[int] = frozenset(),
        on_token=None,
        echo: bool = False,
        start_pos: int = 0,
        temperature=None,
        top_p=None,
    ) -> GenerationResult:
        """Autoregressive generation (reference: InferenceEngine.generateTokens*,
        InferenceEngine.java:81-680): prompt ingestion, windowed decode with
        stop-token check and streaming callback, per-phase metrics.

        `on_token` may return truthy to cancel generation after that token
        (used for per-request stop STRINGS, which only exist at the decoded-
        text level); the remainder of the in-flight decode window is dropped
        and stop_reason is "cancelled"."""
        m = self.metrics
        assert prompt_tokens, "empty prompt"
        if echo and on_token:
            for t in prompt_tokens:
                on_token(t)

        total = start_pos + len(prompt_tokens)
        assert total <= self.cache_len, (
            f"prompt ({total}) exceeds cache length {self.cache_len}")

        t0 = time.perf_counter()
        tok_arr, _ = self.prefill(prompt_tokens, start_pos, temperature, top_p)
        first = int(tok_arr[0])  # blocks until the prefill chain completes
        m.prefill_s += time.perf_counter() - t0
        m.prefill_tokens += len(prompt_tokens)

        out: list[int] = []
        stop_reason = "length"
        tok = first
        pos = total
        t0 = time.perf_counter()

        out.append(tok)
        cancelled = bool(on_token(tok)) if on_token else False
        if tok in stop_tokens:
            stop_reason = "stop_token"
        elif cancelled:
            stop_reason = "cancelled"
        else:
            remaining = max_new_tokens - 1
            while remaining > 0 and pos + 1 < self.cache_len:
                window = self.decode_window_run(tok, pos, remaining, stop_tokens,
                                                temperature, top_p)
                if not window:
                    break
                for t in window:
                    out.append(t)
                    if on_token and on_token(t):
                        cancelled = True
                        break
                if cancelled:
                    stop_reason = "cancelled"
                    break
                if window[-1] in stop_tokens:
                    stop_reason = "stop_token"
                    break
                tok = window[-1]
                pos += len(window)
                remaining -= len(window)

        m.decode_s += time.perf_counter() - t0
        m.decode_tokens += len(out)
        return GenerationResult(out, stop_reason, m)

    @staticmethod
    def _stops_array(stop_tokens, pad_to: int = 8):
        """Fixed-size stop-token array (padded with -1) so the decode program
        never recompiles across differing stop sets."""
        stops = sorted(stop_tokens)[:pad_to]
        arr = np.full((pad_to,), -1, np.int32)
        arr[: len(stops)] = stops
        return arr
