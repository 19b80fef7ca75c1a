"""ctypes bindings for the native host data loader (native/kmer_host.cpp).

The shared library is compiled on demand with g++ -O3 and cached next to the
source; if no compiler is available the pipeline silently falls back to the
vectorized numpy framer (``io/readers.py``). Both paths produce bit-identical
buffers (tests enforce it).
"""
from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from pathlib import Path
from typing import Iterator

import numpy as np

logger = logging.getLogger(__name__)

_SRC = Path(__file__).resolve().parent.parent / "native" / "kmer_host.cpp"


def _lib_path() -> Path:
    # -march=native binaries are CPU-specific: key the cache on the platform
    # so a repo shared across heterogeneous machines (NFS, container images)
    # never dlopens a library built for a different microarchitecture
    import hashlib
    import platform

    tag = f"{platform.system()}-{platform.machine()}".lower()
    try:  # distinguish microarchitectures sharing an ISA name
        info = Path("/proc/cpuinfo").read_text()
        model = next(
            (l.split(":", 1)[1].strip() for l in info.splitlines() if "model name" in l),
            "",
        )
        if model:
            tag += "-" + hashlib.sha1(model.encode()).hexdigest()[:8]
    except OSError:
        pass
    return _SRC.with_name(f"kmer_host-{tag}.so")


_LIB_PATH = _lib_path()
_lock = threading.Lock()
_lib = None
_tried = False

_ERRORS = {
    1: "FASTA input does not start with a record header",
    2: "malformed FASTQ: record header does not start with '@'",
    3: "malformed FASTQ: separator line does not start with '+'",
    4: "truncated FASTQ record at end of file",
    5: "trailing unframed data at end of file",
}


class _Out(ctypes.Structure):
    _fields_ = [
        ("consumed", ctypes.c_int64),
        ("n_bases", ctypes.c_int64),
        ("n_reads", ctypes.c_int64),
        ("n_invalid", ctypes.c_int64),
        ("next_resume", ctypes.c_int64),
        ("error", ctypes.c_int32),
        ("stopped_capacity", ctypes.c_int32),
        ("strided", ctypes.c_int32),
    ]


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC",
        str(_SRC), "-o", str(_LIB_PATH),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception as exc:  # no compiler / failed build -> numpy fallback
        logger.info("native loader build failed (%s); using numpy framer", exc)
        return False


def get_lib():
    """The loaded library, or None when unavailable/disabled."""
    global _lib, _tried
    if os.environ.get("KMT_NO_NATIVE"):
        return None
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if not _LIB_PATH.exists() or _LIB_PATH.stat().st_mtime < _SRC.stat().st_mtime:
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(str(_LIB_PATH))
        except OSError as exc:
            logger.info("native loader unavailable (%s)", exc)
            return None
        for fn in (lib.kmh_pack_fastq, lib.kmh_pack_fasta):
            fn.restype = None
            fn.argtypes = [
                ctypes.POINTER(ctypes.c_char), ctypes.c_int64, ctypes.c_int32,
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_uint16),
                ctypes.POINTER(_Out),
            ]
        lib.kmh_restride.restype = None
        lib.kmh_restride.argtypes = [
            ctypes.POINTER(ctypes.c_uint32), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.POINTER(ctypes.c_uint32),
        ]
        _lib = lib
        return _lib


def restride_native(
    packed: np.ndarray, n_reads: int, read_len: int, rows: int
) -> np.ndarray | None:
    """C++ ``kmh_restride`` (continuous -> strided layout), or None when the
    native library is unavailable. Bit-identical to the numpy fallback in
    ``readers.restride_packed`` (tests enforce)."""
    lib = get_lib()
    if lib is None:
        return None
    from ..ops.hashing import read_stride

    npr = read_stride(read_len) // 16
    out = np.empty(rows * npr, dtype=np.uint32)
    packed = np.ascontiguousarray(packed, dtype=np.uint32)
    lib.kmh_restride(
        packed.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        int(n_reads), int(read_len), int(rows),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
    )
    return out


def available() -> bool:
    return get_lib() is not None


def pack_stream_native(
    stream,
    fmt: str,
    max_bases: int,
    max_reads: int,
    k: int,
    block_bytes: int = 2_500_000,
    read_len: int = 0,
) -> Iterator[tuple]:
    """Native analog of ``readers.read_chunks`` + ``readers.pack_for_device``:
    stream of decompressed bytes -> fixed-shape packed device buffers
    (packed uint32[max_bases/16+2], lengths uint16[max_reads], n_bases,
    n_reads, n_invalid).

    ``read_len > 0`` mirrors ``pack_for_device(read_len=...)``: buffers whose
    reads are all exactly ``read_len`` long are emitted directly in the
    word-aligned strided layout by the C++ frame+pack pass (no separate
    ``kmh_restride`` buffer pass), others re-frame continuously; a sixth
    tuple element carries the ``strided`` flag. Both layouts are bit-identical
    to the numpy packer's (tests enforce)."""
    lib = get_lib()
    assert lib is not None
    fn = lib.kmh_pack_fastq if fmt == "fastq" else lib.kmh_pack_fasta
    out_words = max_bases // 16 + 2
    if read_len and not (k <= read_len <= min(65535, max_bases)):
        read_len = 0  # strided layout impossible: every record would abort
    try:
        yield from _pack_stream(
            stream, fn, max_bases, max_reads, k, block_bytes, out_words, read_len
        )
    finally:
        stream.close()


def _pack_stream(stream, fn, max_bases, max_reads, k, block_bytes, out_words, read_len=0):
    # A buffer is emitted only when the framer reports a capacity stop (or at
    # eof), so chunk boundaries are identical to the numpy packer's greedy
    # record accumulation. Until then the byte window keeps growing and is
    # re-framed from scratch (cheap: a couple of passes per emitted buffer).
    # The window is a bytearray (amortized append, in-place head deletion,
    # zero-copy pointer into the native call) — bytes concatenation here was
    # quadratic: ~10x write amplification per emitted buffer.
    target = max(block_bytes, 3 * max_bases)
    leftover = bytearray()
    eof = False
    resume = 0

    def fill():
        nonlocal leftover, eof  # += rebinds even for bytearray
        while not eof and len(leftover) < target:
            block = stream.read(block_bytes)
            if not block:
                eof = True
            else:
                leftover += block

    if read_len:
        from ..ops.hashing import read_stride

        from .readers import strided_rows

        strided_words = strided_rows(max_bases, read_len) * (
            read_stride(read_len) // 16
        )

    def call(rl: int):
        n_words = strided_words if rl else out_words
        packed = np.zeros(n_words, dtype=np.uint32)
        lengths = np.zeros(max_reads, dtype=np.uint16)
        out = _Out()
        # no ctypes.cast here: cast() creates a reference cycle that keeps the
        # bytearray's buffer exported until a gc pass, blocking the head del
        buf = (ctypes.c_char * len(leftover)).from_buffer(leftover) if leftover else None
        fn(
            buf,
            len(leftover),
            1 if eof else 0,
            k,
            rl,
            resume,
            max_bases,
            max_reads,
            packed.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
            ctypes.byref(out),
        )
        del buf  # release the exported buffer so the bytearray can resize
        return packed, lengths, out

    while True:
        fill()
        # strided-first: a nonconforming record makes the C++ pass return
        # strided=0 with nothing consumed, and the identical window re-frames
        # continuously — same greedy chunk boundaries as the numpy packer
        rl = read_len if resume == 0 else 0
        packed, lengths, out = call(rl)
        if rl and not out.strided:
            packed, lengths, out = call(0)
        if out.error:
            raise ValueError(_ERRORS.get(out.error, f"native framer error {out.error}"))
        if not out.stopped_capacity and not eof:
            # buffer not full and more input may remain: grow the window and
            # re-frame so chunking matches the greedy numpy packer (on stream
            # end this re-frames once more with eof=1 for final-record rules)
            block = stream.read(block_bytes)
            if not block:
                eof = True
            else:
                leftover += block
            continue
        if out.n_reads:
            tup = (
                packed, lengths, int(out.n_bases), int(out.n_reads),
                int(out.n_invalid),
            )
            yield tup + ((bool(out.strided),) if read_len else ())
        del leftover[: out.consumed]
        resume = int(out.next_resume)
        if eof:
            if leftover.strip():
                if out.n_reads or out.consumed:
                    continue  # more records remain in the leftover
                raise ValueError("trailing unframed data at end of file")
            return
        if resume and not out.n_reads and not out.consumed:
            raise AssertionError("native framer made no progress")
