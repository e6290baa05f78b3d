"""Utilities: compilation caching, profiling, structured logging."""

from vbt_tpu.utils.cache import enable_persistent_cache

__all__ = ["enable_persistent_cache"]
