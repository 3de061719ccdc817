"""Every synthetic preset must build (tiny layer count) and run one forward
step — guards preset-geometry/config coherence for the bench matrix rows."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from llamatpu.models.synthetic import PRESETS, build_synthetic_model
from llamatpu.models.transformer import forward_tokens, init_cache


@pytest.mark.parametrize("preset", sorted(PRESETS))
def test_preset_forward_step(preset):
    # shrink the vocab (embedding/head generation dominates test time for the
    # 100k+ vocab presets) — everything else keeps the preset geometry
    vocab = min(PRESETS[preset]["vocab_size"], 4096)
    model = build_synthetic_model(preset, quant="q8_0", context_length=64,
                                  n_layers=2, overrides={"vocab_size": vocab})
    cache = init_cache(model.cfg, 1, jnp.bfloat16, 64)
    toks = jnp.asarray([[3, 7, 11]], jnp.int32)
    logits, cache = forward_tokens(model.cfg, model.weights, toks, cache, 0,
                                   impl="xla", last_logit_only=True)
    assert logits.shape == (1, model.cfg.vocab_size)
    assert bool(jnp.isfinite(logits.astype(jnp.float32)).all())
