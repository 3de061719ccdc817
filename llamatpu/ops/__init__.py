from llamatpu.ops.rmsnorm import rmsnorm
from llamatpu.ops.rope import precompute_rope_tables, apply_rope
from llamatpu.ops.matmul import matmul

__all__ = ["rmsnorm", "precompute_rope_tables", "apply_rope", "matmul"]
