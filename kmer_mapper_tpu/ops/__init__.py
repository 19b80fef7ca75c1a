"""Device ops. ``probe``/``stream_probe`` are imported lazily by their users
(they depend on ``index.layout``, which itself uses ``ops.u32hash`` — eager
imports here would cycle)."""
from . import encode, hashing, u32hash

__all__ = ["encode", "hashing", "u32hash", "probe", "stream_probe"]


def __getattr__(name):
    if name in ("probe", "stream_probe"):
        import importlib

        return importlib.import_module(f".{name}", __name__)
    raise AttributeError(name)
