#!/usr/bin/env python3
"""Append a bench.py JSON line to docs/perf-history.jsonl with metadata.

Equivalent of the reference's scripts/process_metrics.py CI step (SURVEY.md
§2.10): the committed history doubles as the perf-regression signal.
"""
import json
import pathlib
import subprocess
import sys
import time

def main() -> int:
    src = pathlib.Path(sys.argv[1]) if len(sys.argv) > 1 else None
    line = src.read_text().strip().splitlines()[-1] if src else sys.stdin.read().strip()
    row = json.loads(line)
    try:
        commit = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                                capture_output=True, text=True).stdout.strip()
    except Exception:
        commit = "unknown"
    row["ts"] = int(time.time())
    row["commit"] = commit
    out = pathlib.Path(__file__).resolve().parents[1] / "docs" / "perf-history.jsonl"
    out.parent.mkdir(exist_ok=True)
    with out.open("a") as f:
        f.write(json.dumps(row) + "\n")
    print(f"appended to {out}")
    return 0

if __name__ == "__main__":
    sys.exit(main())
