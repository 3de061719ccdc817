"""CI gate for quantization-path numeric fidelity (tiny geometry; the
production-geometry table lives in PARITY.md via scripts/run_parity.py).

Every quantized compute path must track the f32 baseline on the SAME
weights/corpus/windows: a regression here means a kernel or codec changed
numerics, not just speed."""
import pytest

from llamatpu.bench.parity import parity_table

TINY = dict(vocab_size=512, n_layers=2, dim=256, hidden_dim=512,
            n_heads=4, n_kv_heads=2, head_dim=64, context_length=128)


@pytest.fixture(scope="module")
def rows():
    out = parity_table("llama32-1b", corpus_len=96, cache_len=64, seed=1, **TINY)
    return {r["variant"]: r for r in out}


def test_every_variant_scores_full_corpus(rows):
    counts = {v: r["tokens"] for v, r in rows.items()}
    assert len(set(counts.values())) == 1, counts


def test_q8_paths_track_f32(rows):
    # all three Q8_0 compute paths: fused bf16-dequant, exact int8 dot, int8 KV
    assert abs(rows["q8_0"]["rel"]) < 0.02, rows["q8_0"]
    assert abs(rows["q8_0-int8dot"]["rel"]) < 0.02, rows["q8_0-int8dot"]
    assert abs(rows["q8_0-kvint8"]["rel"]) < 0.03, rows["q8_0-kvint8"]


def test_bf16_tracks_f32(rows):
    assert abs(rows["bf16"]["rel"]) < 0.02, rows["bf16"]


def test_q4_paths_agree_with_each_other(rows):
    # pack4 is a pure storage transform of the same Q4_0 values: its ppl must
    # match the unpacked Q4_0 path almost exactly (same dequant math)
    a, b = rows["q4_0"]["ppl"], rows["q4_0-pack4"]["ppl"]
    assert abs(a - b) / a < 1e-3, (a, b)
