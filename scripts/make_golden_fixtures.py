#!/usr/bin/env python3
"""Regenerate the golden-fixture matrix (fixtures/golden/<family>_<quant>.json).

Synthesizes a deterministic tiny GGUF per family × quant (tests/tiny_models.py)
and records the `llamatpu validate` outputs (greedy token ids + quick ppl) as
committed fixtures. Run ONLY after an intentional numerics change; CI gates
every entry via tests/test_golden_fixtures.py.

Must run on CPU (the CI platform) so fixtures match the CI runs bit-for-bit.
"""
import pathlib
import sys
import tempfile

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1] / "tests"))


def main() -> int:
    import jax

    jax.config.update("jax_platforms", "cpu")

    from test_golden_fixtures import FAMILIES, QUANTS, run_validate

    with tempfile.TemporaryDirectory() as td:
        for family in FAMILIES:
            for quant in QUANTS:
                print(f"=== {family} {quant} ===")
                rc = run_validate(family, quant, pathlib.Path(td), update=True)
                if rc != 0:
                    print(f"FAILED: {family} {quant}")
                    return rc
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
