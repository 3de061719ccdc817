"""Paged batched engine: BatchEngine's surface over a shared KV block pool.

Same lane semantics as BatchEngine (per-lane positions/sampling/stop), but KV
lives in a PagedKVCache: the host BlockAllocator grows each lane's block table
on demand (prefill chunks, decode windows) and recycles blocks when a lane
finishes — so memory is bounded by tokens in flight, not lanes x max context.
Drop-in engine for the ContinuousBatcher (it calls admit_lane/release_lane/
can_admit).

With prefix_cache=True (default) the engine also does block-level prefix
caching (paged_cache.py docstring): admit_lane maps cached full blocks of the
prompt into the lane's table and prefills only the novel suffix; release_lane
registers the lane's verified full blocks (prompt + confirmed generated
tokens) for future reuse. Exact for any sampling mode — cached blocks hold
the same KV values a fresh prefill would write (prefill is deterministic).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from llamatpu.models.loader import LoadedModel
from llamatpu.models.transformer import forward_tokens
from llamatpu.runtime.batch_engine import _sample_lanes
from llamatpu.runtime.paged_cache import BlockAllocator, init_paged_cache
from llamatpu.utils.metrics import RunMetrics, Timer


class PagedBatchEngine:
    def __init__(
        self,
        model: LoadedModel,
        batch_size: int = 8,
        n_blocks: int | None = None,
        block_size: int = 16,
        max_len: int | None = None,
        prefill_chunk: int = 128,
        impl: str = "xla",
        cache_dtype=jnp.bfloat16,
        seed: int = 42,
        decode_window: int = 16,
        metrics: RunMetrics | None = None,
        prefix_cache: bool = True,
        mesh=None,
        ep: bool = False,
        rowq: bool = False,
    ):
        self.model = model
        self.cfg = model.cfg
        self.batch_size = batch_size
        self.block_size = block_size
        self.max_len = max_len or self.cfg.context_length
        self.max_blocks_per_lane = -(-self.max_len // block_size)
        # default pool: half of the dense allocation (the paged win) + trash block
        self.n_blocks = (n_blocks or max(self.max_blocks_per_lane + 1,
                                         batch_size * self.max_blocks_per_lane // 2)) \
            if n_blocks is None else n_blocks
        self.cache_len = self.max_blocks_per_lane * block_size  # lane view length
        self.prefill_chunk = min(prefill_chunk, self.max_len)
        self.impl = impl
        self.decode_window = max(1, int(decode_window))
        self.metrics = metrics or RunMetrics()
        self.prefix_cache = prefix_cache
        self.mesh = mesh  # tp(/dp/ep/pp)-sharded serving; pool blocks replicated
        self.ep = bool(ep and mesh is not None)
        self.pp = 1 if mesh is None else mesh.shape.get("pp", 1)
        if mesh is not None:
            assert mesh.shape.get("sp", 1) == 1, \
                "paged serving shards tp/dp/ep/pp (not sp)"
            if self.pp > 1:
                assert not self.ep, \
                    "pp x ep deliberately not composed: dp x ep is the MoE " \
                    "serving shape (parallel/pipeline.py docstring)"
        self._rng = jax.random.PRNGKey(seed)
        self.alloc = BlockAllocator(self.n_blocks, batch_size, self.max_blocks_per_lane)

        cfg, impl_, W, B = self.cfg, impl, self.decode_window, batch_size
        ep_mesh = mesh if self.ep else None

        def fwd(weights, tokens, cache, pos, tables, **kw):
            if self.pp > 1:
                from llamatpu.parallel.pipeline import forward_tokens_pp

                return forward_tokens_pp(cfg, weights, tokens, cache, pos,
                                         self.mesh, impl=impl_,
                                         tables=tables, **kw)
            return forward_tokens(cfg, weights, tokens, cache, pos,
                                  impl=impl_, tables=tables, ep_mesh=ep_mesh,
                                  **kw)

        def prefill_lane_fn(weights, tokens, cache, tables, lane, pos, logit_idx,
                            rng, temp, topp):
            # paged writes land in the shared pool; only this lane's table row
            # is active, so running the token window as batch-1 is safe
            lane_tables = jax.lax.dynamic_slice_in_dim(tables, lane, 1, axis=0)
            logits, cache = fwd(weights, tokens, cache, pos, lane_tables,
                                logit_index=logit_idx)
            rng, sub = jax.random.split(rng)
            tok = _sample_lanes(logits, sub, jnp.full((1,), temp), jnp.full((1,), topp))
            return tok, cache, rng

        def decode_n_fn(weights, tokens, cache, tables, pos_vec, active0, rng,
                        stops, limit, temps, topps):
            out = jnp.full((W, B), -1, jnp.int32)

            def cond(c):
                i, tok, cache_, pos, act, rng_, out_ = c
                return jnp.logical_and(i < limit, act.any())

            def body(c):
                i, tok, cache_, pos, act, rng_, out_ = c
                # route inactive lanes' KV rewrites to the trash block: with
                # interleaved chunked prefill this lane's table may already
                # hold another request's freshly prefilled (or prefix-cache
                # SHARED) blocks, which a stale-pos rewrite would corrupt
                trash = jnp.int32(cache_.kv_pool.shape[1] - 1)
                tbl = jnp.where(act[:, None], tables, trash)
                logits, cache_ = fwd(weights, tok[:, None], cache_, pos, tbl,
                                     last_logit_only=True)
                rng_, sub = jax.random.split(rng_)
                nxt = _sample_lanes(logits, sub, temps, topps)
                nxt = jnp.where(act, nxt, tok)
                out_ = out_.at[i].set(jnp.where(act, nxt, -1))
                stopped = jnp.isin(nxt, stops)
                pos = jnp.where(act, pos + 1, pos)
                return (i + 1, nxt, cache_, pos, act & ~stopped, rng_, out_)

            i, tok, cache, pos_vec, active, rng, out = jax.lax.while_loop(
                cond, body,
                (jnp.int32(0), tokens, cache, pos_vec, active0, rng, out))
            return out, cache, rng

        self._prefill_lane = jax.jit(prefill_lane_fn, donate_argnums=(2, 7))
        self._decode_n = jax.jit(decode_n_fn, donate_argnums=(2, 6))

        with Timer() as t:
            from llamatpu.models.weights import serving_weights

            self.weights = serving_weights(cfg, model.weights, mesh=mesh,
                                           ep=self.ep, rowq=rowq)
            jax.block_until_ready(jax.tree.leaves(self.weights))
        self.metrics.weight_upload_s = t.elapsed
        self.cache = self._new_pool(cache_dtype)

    def _new_pool(self, cache_dtype):
        cache = init_paged_cache(self.cfg, self.n_blocks, self.block_size,
                                 cache_dtype)
        if self.mesh is not None:
            import jax as _jax

            from llamatpu.parallel.shard import paged_cache_shardings

            cache = _jax.device_put(
                cache, paged_cache_shardings(self.cfg, self.mesh, cache))
        return cache

    # -- scheduler hooks ---------------------------------------------------
    def can_admit(self, prompt_len: int) -> bool:
        need = -(-(prompt_len + self.decode_window + 1) // self.block_size)
        return self.alloc.can_allocate(need)

    def reserve_lane(self, lane: int, prompt_len: int) -> bool:
        """Reserve the lane's FULL prompt span (+ one decode window of
        headroom) synchronously at admission. Chunked prefill then allocates
        nothing mid-flight, so a later same-pass admission or another lane's
        decode-window growth can never starve an in-flight prefill (which
        would raise through the scheduler loop and truncate every stream).
        Returns False (partial allocation intact — caller releases the lane)
        when the pool can't cover it. Call after acquire_prefix_for: shared
        prefix blocks lead the table and count toward the span."""
        return self.alloc.ensure(lane, prompt_len + self.decode_window + 1,
                                 self.block_size)

    def acquire_prefix_for(self, lane: int, tokens: list[int]) -> int:
        """Map cached full blocks of the prompt into the lane table; returns
        the number of prompt tokens thereby served from the prefix cache.
        The caller prefills only tokens[reuse:] (the ContinuousBatcher feeds
        them chunk-at-a-time, interleaved with decode windows)."""
        if not self.prefix_cache:
            return 0
        from llamatpu.runtime.paged_cache import block_hashes

        hashes = block_hashes(tokens, self.block_size)
        # the final prompt token must run through prefill (its logits
        # produce the first sampled token), so cap reuse at len-1
        max_blocks = (len(tokens) - 1) // self.block_size
        return self.alloc.acquire_prefix(lane, hashes, max_blocks) * self.block_size

    def admit_lane(self, lane: int, tokens: list[int], temperature: float = 0.0,
                   top_p: float = 0.0) -> tuple[int, int]:
        """Prefix-cache-aware lane admission in one call: map cached blocks,
        prefill the novel suffix. Returns (first sampled token, reused)."""
        reuse = self.acquire_prefix_for(lane, tokens)
        first = self.prefill_lane(lane, tokens[reuse:], reuse, temperature, top_p)
        return first, reuse

    def release_lane(self, lane: int, fed_tokens: list[int] | None = None) -> None:
        """Recycle the lane's blocks. fed_tokens = the lane's verified token
        history (every token whose KV provably landed in the cache); with the
        prefix cache on, its full blocks are registered for reuse."""
        hashes = None
        if self.prefix_cache and fed_tokens:
            from llamatpu.runtime.paged_cache import block_hashes

            hashes = block_hashes(fed_tokens, self.block_size)
        self.alloc.release(lane, hashes)

    # -- engine surface (mirrors BatchEngine) ------------------------------
    def prefill_lane(self, lane: int, tokens: list[int], start_pos: int = 0,
                     temperature: float = 0.0, top_p: float = 0.0) -> int:
        c = self.prefill_chunk
        n = len(tokens)
        # allocate exactly the prompt's span: chunk-pad positions either share
        # a partially-filled real block (harmless — masked, then overwritten by
        # decode before any read) or hit an unallocated table entry, which
        # points at the allocator's trash block
        if not self.alloc.ensure(lane, start_pos + n, self.block_size):
            raise RuntimeError("paged KV pool exhausted")
        tok = None
        i = 0
        while i < n:
            chunk = tokens[i : i + c]
            r = len(chunk)
            if r < c:
                from llamatpu.models.transformer import pad_chunk_len

                chunk = chunk + [0] * (pad_chunk_len(r, c) - r)
            tok, self.cache, self._rng = self._prefill_lane(
                self.weights, np.asarray([chunk], np.int32), self.cache,
                self.alloc.tables, np.int32(lane), np.int32(start_pos + i),
                np.int32(r - 1), self._rng, np.float32(temperature), np.float32(top_p))
            i += r
        return int(tok[0])

    def decode_window_run(self, tokens: np.ndarray, pos: np.ndarray,
                          active: np.ndarray, stop_tokens=frozenset(),
                          temps: np.ndarray | None = None,
                          topps: np.ndarray | None = None,
                          limit: int | None = None) -> np.ndarray:
        B = self.batch_size
        temps = np.zeros(B, np.float32) if temps is None else temps.astype(np.float32)
        topps = np.zeros(B, np.float32) if topps is None else topps.astype(np.float32)
        limit = self.decode_window if limit is None else min(limit, self.decode_window)
        # pre-allocate blocks every active lane could need this window
        for b in range(B):
            if active[b]:
                if not self.alloc.ensure(b, int(pos[b]) + limit + 2, self.block_size):
                    limit = min(limit, self.alloc.lane_len_capacity(b, self.block_size)
                                - int(pos[b]) - 2)
        if limit <= 0:
            return np.full((self.decode_window, B), -1, np.int32)
        from llamatpu.runtime.engine import Engine

        out, self.cache, self._rng = self._decode_n(
            self.weights, tokens.astype(np.int32), self.cache, self.alloc.tables,
            pos.astype(np.int32), active.astype(bool), self._rng,
            Engine._stops_array(stop_tokens), np.int32(limit), temps, topps)
        return np.asarray(jax.device_get(out))

    def generate_batch(self, prompts, max_new_tokens, stop_tokens=frozenset(),
                       temps=None, topps=None):
        """Static batched generation over the paged pool (mirrors
        BatchEngine.generate_batch)."""
        from llamatpu.runtime.batch_engine import BatchEngine

        return BatchEngine.generate_batch(self, prompts, max_new_tokens,
                                          stop_tokens, temps, topps)

    def reset(self) -> None:
        # fresh allocator: drops lane tables AND the prefix cache (pool zeroed)
        self.alloc = BlockAllocator(self.n_blocks, self.batch_size,
                                    self.max_blocks_per_lane)
        self.cache = self._new_pool(self.cache.kv_pool.dtype)
