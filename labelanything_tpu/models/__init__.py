from .registry import model_registry

__all__ = ["model_registry"]
