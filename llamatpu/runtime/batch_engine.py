"""Static batched decode engine: B independent sequences share one jitted
decode program over a [L, B, S, ...] KV cache with per-lane positions, sampling
params, and stop detection.

Goes beyond the reference mainline (its static batched decode was a pending PR,
README.md:74 "up to 41x aggregate throughput") and is the substrate for the
continuous-batching server scheduler (runtime/scheduler.py): lanes prefill
independently (the lane's cache stripe is sliced, run as B=1, and scattered
back) and decode together; a lane that samples a stop token goes inactive
inside the device loop while the others continue.

Per-lane semantics:
- pos_vec[B]: each lane's next write position (transformer handles vector pos)
- active[B]: inactive lanes re-feed their last token and emit -1 in the output
  slab; their KV writes are PARKED in the physical slack row past cache_len
  (never attended — s_limit masks it), because with interleaved chunked
  prefill another request may already be mid-prefill in this lane and a
  stale-position rewrite would corrupt its freshly written KV
- temps/topps[B]: temp == 0 lanes take the argmax branch (select, not recompile)
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from llamatpu.models.loader import LoadedModel
from llamatpu.models.transformer import KVCache, forward_tokens, init_cache
from llamatpu.ops import sampling
from llamatpu.utils.metrics import RunMetrics, Timer


def _sample_lanes(logits, rng, temps, topps):
    """Per-lane sampling: argmax where temp==0 else nucleus/categorical."""
    greedy = sampling.greedy(logits)
    sampled = sampling.sample_dynamic(logits, rng, temps[:, None], topps[:, None])
    return jnp.where(temps == 0.0, greedy, sampled)


class BatchEngine:
    def __init__(
        self,
        model: LoadedModel,
        batch_size: int = 8,
        cache_len: int | None = None,
        prefill_chunk: int = 128,
        impl: str = "xla",
        cache_dtype=jnp.bfloat16,
        seed: int = 42,
        decode_window: int = 16,
        metrics: RunMetrics | None = None,
        mesh=None,
        ep: bool = False,
        rowq: bool = False,
    ):
        self.model = model
        self.cfg = model.cfg
        self.batch_size = batch_size
        self.cache_len = cache_len or self.cfg.context_length
        self.prefill_chunk = min(prefill_chunk, self.cache_len)
        self.impl = impl
        self.cache_dtype = cache_dtype
        self.decode_window = max(1, int(decode_window))
        self.metrics = metrics or RunMetrics()
        self.mesh = mesh  # tensor/data/pipeline-parallel serving
        self.ep = bool(ep and mesh is not None)
        self.pp = 1 if mesh is None else mesh.shape.get("pp", 1)
        if mesh is not None:
            assert batch_size % mesh.shape.get("dp", 1) == 0, \
                (batch_size, mesh.shape)
            if self.pp > 1:
                # lane prefill maps a 1-row window onto its cache row via
                # batch_offset (replicated across dp with owner-rank gating,
                # parallel/pipeline.py lane_dp); pp x ep stays excluded —
                # dp x ep is the MoE serving shape (pipeline.py docstring)
                assert not self.ep, \
                    "pp x ep deliberately not composed: use dp x ep for MoE"
        self._rng = jax.random.PRNGKey(seed)

        cfg, impl_, W, B = self.cfg, impl, self.decode_window, batch_size
        ep_mesh = self.mesh if self.ep else None

        def fwd(weights, tokens, cache, pos, **kw):
            if self.pp > 1:
                from llamatpu.parallel.pipeline import forward_tokens_pp

                kw.pop("ep_mesh", None)
                return forward_tokens_pp(cfg, weights, tokens, cache, pos,
                                         self.mesh, impl=impl_, **kw)
            return forward_tokens(cfg, weights, tokens, cache, pos,
                                  impl=impl_, **kw)

        def prefill_lane_fn(weights, tokens, cache, lane, pos, logit_idx, rng, temp, topp):
            """Prefill one chunk of one lane IN PLACE via batch_offset: the
            window's KV writes land at cache row `lane` directly — no lane
            stripe slice/scatter (those copied the whole stripe per chunk)."""
            logits, cache = fwd(weights, tokens, cache, pos,
                                logit_index=logit_idx, ep_mesh=ep_mesh,
                                batch_offset=lane, s_limit=self.cache_len)
            rng, sub = jax.random.split(rng)
            tok = _sample_lanes(logits, sub, jnp.full((1,), temp), jnp.full((1,), topp))
            return tok, cache, rng

        def decode_n_fn(weights, tokens, cache, pos_vec, active0, rng, stops,
                        limit, temps, topps):
            out = jnp.full((W, B), -1, jnp.int32)

            def cond(c):
                i, tok, cache_, pos, act, rng_, out_ = c
                return jnp.logical_and(i < limit, act.any())

            def body(c):
                i, tok, cache_, pos, act, rng_, out_ = c
                # park inactive lanes' KV rewrites in the physical slack row
                # (never read): with interleaved chunked prefill another
                # request may be mid-prefill in this lane, and a stale-pos
                # rewrite would corrupt its freshly written KV
                park = jnp.int32(cache_.kv.shape[3] - 1)
                logits, cache_ = fwd(weights, tok[:, None], cache_,
                                     jnp.where(act, pos, park),
                                     last_logit_only=True, ep_mesh=ep_mesh,
                                     s_limit=self.cache_len)
                rng_, sub = jax.random.split(rng_)
                nxt = _sample_lanes(logits, sub, temps, topps)
                nxt = jnp.where(act, nxt, tok)  # inactive lanes re-feed last token
                out_ = out_.at[i].set(jnp.where(act, nxt, -1))
                stopped = jnp.isin(nxt, stops)
                bounded = pos + 2 < self.cache_len
                new_act = act & ~stopped & bounded
                pos = jnp.where(act, pos + 1, pos)
                return (i + 1, nxt, cache_, pos, new_act, rng_, out_)

            i, tok, cache, pos_vec, active, rng, out = jax.lax.while_loop(
                cond, body,
                (jnp.int32(0), tokens, cache, pos_vec, active0, rng, out))
            return out, cache, pos_vec, active, rng

        self._prefill_lane = jax.jit(prefill_lane_fn, donate_argnums=(2, 6))
        self._decode_n = jax.jit(decode_n_fn, donate_argnums=(2, 5))

        with Timer() as t:
            from llamatpu.models.weights import serving_weights

            self.weights = serving_weights(cfg, model.weights, mesh=mesh,
                                           ep=self.ep, rowq=rowq)
            jax.block_until_ready(jax.tree.leaves(self.weights))
        self.metrics.weight_upload_s = t.elapsed
        self.cache = self._new_cache()

    # ------------------------------------------------------------------
    def _new_cache(self):
        from llamatpu.models.transformer import physical_cache_len

        cache = init_cache(self.cfg, self.batch_size, self.cache_dtype,
                           physical_cache_len(self.cache_len, self.prefill_chunk))
        if self.mesh is not None:
            from llamatpu.parallel import cache_shardings

            cache = jax.device_put(cache, cache_shardings(self.cfg, self.mesh, cache))
        return cache

    def reset(self) -> None:
        self.cache = self._new_cache()

    def prefill_lane(self, lane: int, tokens: list[int], start_pos: int = 0,
                     temperature: float = 0.0, top_p: float = 0.0) -> int:
        """Ingest a prompt into one lane's cache stripe; returns the first
        sampled token."""
        from llamatpu.models.transformer import pad_chunk_len

        c = self.prefill_chunk
        n = len(tokens)
        tok = None
        i = 0
        while i < n:
            chunk = tokens[i : i + c]
            r = len(chunk)
            if r < c:  # pad final partial chunk to the next granule
                chunk = chunk + [0] * (pad_chunk_len(r, c) - r)
            tok, self.cache, self._rng = self._prefill_lane(
                self.weights, np.asarray([chunk], np.int32), self.cache,
                np.int32(lane), np.int32(start_pos + i), np.int32(r - 1),
                self._rng, np.float32(temperature), np.float32(top_p))
            i += r
        return int(tok[0])

    def decode_window_run(self, tokens: np.ndarray, pos: np.ndarray,
                          active: np.ndarray, stop_tokens=frozenset(),
                          temps: np.ndarray | None = None,
                          topps: np.ndarray | None = None,
                          limit: int | None = None) -> np.ndarray:
        """One batched device-side decode window. tokens/pos/active: [B] host
        arrays. Returns the [W, B] token slab (-1 = lane inactive that step);
        the caller derives per-lane new tokens/positions from the slab."""
        B = self.batch_size
        temps = np.zeros(B, np.float32) if temps is None else temps.astype(np.float32)
        topps = np.zeros(B, np.float32) if topps is None else topps.astype(np.float32)
        limit = self.decode_window if limit is None else min(limit, self.decode_window)
        from llamatpu.runtime.engine import Engine

        out, self.cache, _, _, self._rng = self._decode_n(
            self.weights, tokens.astype(np.int32), self.cache,
            pos.astype(np.int32), active.astype(bool), self._rng,
            Engine._stops_array(stop_tokens), np.int32(limit), temps, topps)
        return np.asarray(jax.device_get(out))

    # ------------------------------------------------------------------
    def generate_batch(self, prompts: list[list[int]], max_new_tokens: int,
                       stop_tokens=frozenset(), temps=None, topps=None):
        """Static batched generation: prefill each lane, decode all together.
        Returns list of per-sequence token lists (stop token included)."""
        B = self.batch_size
        assert len(prompts) <= B
        self.reset()
        tokens = np.zeros(B, np.int32)
        pos = np.zeros(B, np.int32)
        active = np.zeros(B, bool)
        outs: list[list[int]] = [[] for _ in prompts]

        t0 = time.perf_counter()
        for b, p in enumerate(prompts):
            t = self.prefill_lane(b, p, 0,
                                  0.0 if temps is None else float(temps[b]),
                                  0.0 if topps is None else float(topps[b]))
            tokens[b] = t
            pos[b] = len(p)
            active[b] = True
            outs[b].append(t)
            if t in stop_tokens:
                active[b] = False
        self.metrics.prefill_s += time.perf_counter() - t0
        self.metrics.prefill_tokens += sum(len(p) for p in prompts)

        remaining = max_new_tokens - 1
        t0 = time.perf_counter()
        while remaining > 0 and active.any():
            slab = self.decode_window_run(
                tokens, pos, active, stop_tokens,
                temps if temps is None else np.asarray(temps),
                topps if topps is None else np.asarray(topps),
                limit=remaining)
            steps = 0
            for b in range(len(prompts)):
                col = slab[:, b]
                emitted = [int(t) for t in col[col >= 0]]
                for t in emitted:
                    outs[b].append(t)
                    if t in stop_tokens:
                        active[b] = False
                if emitted:
                    tokens[b] = emitted[-1]
                pos[b] += len(emitted)
                if pos[b] + 2 >= self.cache_len:
                    active[b] = False
                steps = max(steps, len(emitted))
            if steps == 0:
                break
            remaining -= steps
        self.metrics.decode_s += time.perf_counter() - t0
        self.metrics.decode_tokens += sum(len(o) for o in outs)
        return outs
