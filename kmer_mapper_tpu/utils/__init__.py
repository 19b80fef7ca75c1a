from .timing import log_memory_usage_now, span

__all__ = ["span", "log_memory_usage_now"]
