"""Offline GGUF requantization: rewrite any supported checkpoint with matmul
weights re-encoded as Q8_0 (the persistent form of the reference's load-time
K-quant->Q8_0 requantization, ModelLoader.java:173-224 — llama.cpp `quantize`
analog). Metadata and non-matmul tensors (norms, biases, rope helpers) pass
through unchanged; 1-D tensors and embeddings keep their original encoding
fidelity by staying F32/F16.
"""
from __future__ import annotations

import numpy as np

from llamatpu.gguf.ggml_type import GGMLType
from llamatpu.gguf.reader import GGUFReader
from llamatpu.gguf.writer import GGUFWriter


def requantize_gguf(src_path: str, dst_path: str, target: str = "q8_0") -> dict:
    """Returns a summary {tensors, requantized, bytes_in, bytes_out}."""
    assert target == "q8_0", "only q8_0 target supported"
    stats = {"tensors": 0, "requantized": 0, "bytes_in": 0, "bytes_out": 0}
    with GGUFReader(src_path) as r:
        w = GGUFWriter(alignment=r.alignment)
        for key, val in r.metadata.items():
            if key == "tokenizer.ggml.tokens.length":  # synthesized by the reader
                continue
            w.add(key, val)
        for name, info in r.tensor_infos.items():
            stats["tensors"] += 1
            stats["bytes_in"] += info.n_bytes
            data = r.tensor_f32(name)
            # matmul weights: 2-D+ with block-aligned in-features
            if data.ndim >= 2 and data.shape[-1] % 32 == 0 and info.ggml_type != GGMLType.F32:
                w.add_tensor(name, data, GGMLType.Q8_0)
                stats["requantized"] += 1
                stats["bytes_out"] += GGMLType.Q8_0.byte_size_for(info.n_elements)
            else:
                # keep small/1-D tensors full precision
                w.add_tensor(name, data.astype(np.float32), GGMLType.F32)
                stats["bytes_out"] += info.n_elements * 4
        w.write(dst_path)
    return stats
