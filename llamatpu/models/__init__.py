from llamatpu.models.config import Family, ModelConfig
from llamatpu.models.detect import detect_family

__all__ = ["Family", "ModelConfig", "detect_family"]
