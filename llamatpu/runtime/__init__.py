from llamatpu.runtime.engine import Engine, GenerationResult

__all__ = ["Engine", "GenerationResult"]
