"""Golden-fixture matrix: every family × quant through the full
load → detect → tokenize → chat → generate → ppl loop, gated against
committed fixtures (fixtures/golden/<family>_<quant>.json).

This is the hermetic analog of the reference's real-model CI matrix
(/root/reference/.github/workflows/build-and-run.yml:36-520, 8 checkpoints ×
quants per backend): the checkpoints are synthesized deterministically by
tests/tiny_models.py (seeded), so greedy token ids and quick-ppl values are
exactly reproducible run-to-run — a mismatch means loading, tokenization,
detection, a kernel, or a codec changed behavior.

Regenerate after an INTENTIONAL numerics change:
  python scripts/make_golden_fixtures.py
"""
import pathlib

import pytest

from llamatpu.gguf import GGMLType

FAMILIES = ["llama", "mistral", "devstral", "qwen2", "qwen3", "qwen2moe",
            "phi3", "granite", "deepseek"]
QUANTS = {"q8_0": GGMLType.Q8_0, "q4_0": GGMLType.Q4_0}

REPO = pathlib.Path(__file__).resolve().parents[1]
GOLDEN_DIR = REPO / "fixtures" / "golden"


def run_validate(family: str, quant: str, tmp_path, update: bool = False) -> int:
    from tiny_models import build_tiny_gguf

    from llamatpu.cli import main

    gguf = tmp_path / f"{family}_{quant}.gguf"
    build_tiny_gguf(gguf, family=family, quant=QUANTS[quant], seed=0,
                    with_tokenizer=True)
    golden = GOLDEN_DIR / f"{family}_{quant}.json"
    argv = ["validate", "-m", str(gguf), "--dtype", "f32", "--impl", "xla",
            "--golden", str(golden)]
    if update:
        argv.append("--update-golden")
    return main(argv)


@pytest.mark.parametrize("family", FAMILIES)
@pytest.mark.parametrize("quant", list(QUANTS))
def test_golden_fixture(family, quant, tmp_path):
    golden = GOLDEN_DIR / f"{family}_{quant}.json"
    assert golden.exists(), (
        f"missing committed fixture {golden} — run scripts/make_golden_fixtures.py")
    assert run_validate(family, quant, tmp_path) == 0
