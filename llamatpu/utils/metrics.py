"""Run metrics: load / compile / weight-transfer / prefill / decode phases.

Parity with the reference's RunMetrics singleton + renderers
(auxiliary/RunMetrics.java:35-157, auxiliary/metrics/{Human,Json,GitHub}
MetricsRenderer.java): same phases (model load, plan build == jit trace,
JIT == XLA compile, weight upload == device_put, prefill, decode), rendered
human/json/github to stderr/stdout/file via flags.
"""
from __future__ import annotations

import json
import sys
import time
from dataclasses import dataclass, field


@dataclass
class RunMetrics:
    load_s: float = 0.0
    trace_s: float = 0.0       # building jitted programs (== plan build)
    compile_s: float = 0.0     # XLA compile (== TornadoVM JIT warmup)
    weight_upload_s: float = 0.0
    prefill_tokens: int = 0
    prefill_s: float = 0.0
    decode_tokens: int = 0
    decode_s: float = 0.0
    extra: dict = field(default_factory=dict)

    @property
    def prefill_tok_s(self) -> float:
        return self.prefill_tokens / self.prefill_s if self.prefill_s > 0 else 0.0

    @property
    def decode_tok_s(self) -> float:
        return self.decode_tokens / self.decode_s if self.decode_s > 0 else 0.0

    def to_dict(self) -> dict:
        return {
            "load_s": round(self.load_s, 4),
            "trace_s": round(self.trace_s, 4),
            "compile_s": round(self.compile_s, 4),
            "weight_upload_s": round(self.weight_upload_s, 4),
            "prefill_tokens": self.prefill_tokens,
            "prefill_s": round(self.prefill_s, 4),
            "prefill_tok_s": round(self.prefill_tok_s, 2),
            "decode_tokens": self.decode_tokens,
            "decode_s": round(self.decode_s, 4),
            "decode_tok_s": round(self.decode_tok_s, 2),
            **self.extra,
        }

    def write_file(self, path: str) -> None:
        """JSON metrics sink (reference: llama.metrics.file sysprop,
        RunMetrics.java:127-139) — one JSON object per run, appended."""
        with open(path, "a", encoding="utf-8") as f:
            f.write(json.dumps(self.to_dict()) + "\n")

    def render(self, fmt: str = "human", stream=None) -> None:
        stream = stream or sys.stderr
        d = self.to_dict()
        if fmt == "json":
            print(json.dumps(d), file=stream)
        elif fmt == "github":
            for k, v in d.items():
                print(f"::notice title=llamatpu::{k}={v}", file=stream)
        else:
            print(
                f"\nllamatpu: load {d['load_s']:.2f}s | trace {d['trace_s']:.2f}s | "
                f"compile {d['compile_s']:.2f}s | upload {d['weight_upload_s']:.2f}s",
                file=stream,
            )
            print(
                f"llamatpu: prefill {d['prefill_tokens']} tok in {d['prefill_s']:.3f}s "
                f"({d['prefill_tok_s']:.1f} tok/s) | decode {d['decode_tokens']} tok in "
                f"{d['decode_s']:.3f}s ({d['decode_tok_s']:.1f} tok/s)",
                file=stream,
            )


class Timer:
    """Context timer (reference: auxiliary/Timer.java)."""

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self.t0
