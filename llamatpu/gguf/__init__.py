from llamatpu.gguf.ggml_type import GGMLType
from llamatpu.gguf.reader import GGUFReader, GGUFTensorInfo
from llamatpu.gguf.writer import GGUFWriter
from llamatpu.gguf import quants

__all__ = ["GGMLType", "GGUFReader", "GGUFTensorInfo", "GGUFWriter", "quants"]
