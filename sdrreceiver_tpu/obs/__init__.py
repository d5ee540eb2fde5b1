from . import metrics, spectrum

__all__ = ["metrics", "spectrum"]
