from . import u32hash

__all__ = ["u32hash"]
