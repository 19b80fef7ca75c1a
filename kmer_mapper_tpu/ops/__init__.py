from . import encode, hashing, probe, stream_probe, u32hash

__all__ = ["encode", "hashing", "probe", "stream_probe", "u32hash"]
