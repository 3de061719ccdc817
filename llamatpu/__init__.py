"""llamatpu — TPU-native GGUF quantized-inference engine.

A brand-new JAX/XLA/Pallas implementation of the capabilities of
beehive-lab/GPULlama3.java (see SURVEY.md): GGUF loading (FP16/Q8_0/Q4_0/K-quants),
Llama-3 / Mistral / Devstral / Qwen2(+MoE) / Qwen3 / DeepSeek-R1-Distill / Phi-3 /
Granite model families, tokenizers + chat formats + tool calling, single-prompt /
interactive / batched / server inference, llama-bench-style benchmarking — built
TPU-first: one jitted XLA program per prefill/decode step, Pallas kernels for the
memory-bound quantized matmuls and attention, sharding via jax.sharding.Mesh.
"""

__version__ = "0.1.0"
