from .fetch import fetch_np, fetch_outputs

__all__ = ["fetch_np", "fetch_outputs"]
