from .readers import SequenceChunk, detect_format, open_bytes, pack_for_device, read_chunks

__all__ = ["SequenceChunk", "detect_format", "open_bytes", "pack_for_device", "read_chunks"]
