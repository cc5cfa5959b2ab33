from . import attention, kv_cache, sampling

__all__ = ["attention", "kv_cache", "sampling"]
