from .utils import inference

__all__ = ["inference"]
