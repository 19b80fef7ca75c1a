"""Fast gzip input: parallel BGZF decode via libdeflate, isal when present.

The reference swaps ``gzip.open`` for ISA-L's igzip (~3-5x zlib decode,
``kmer_mapper/util.py:4,97-98``). This module goes further where the format
allows:

* **BGZF** files (bgzip/htslib output — the common compressed-FASTQ container
  in bioinformatics) are sequences of independent <=64 KiB gzip members whose
  compressed size is recorded in a header extra field, so member boundaries
  are known *without* decoding: blocks are fanned out to a thread pool
  decoding with **libdeflate** (ctypes; the call releases the GIL), giving
  multi-core decompression.
* plain single-member gzip: ``isal.igzip`` when importable (reference
  parity), else stdlib zlib — single-stream decode is inherently serial.

Everything presents as a readable binary stream for the framer.
"""
from __future__ import annotations

import ctypes
import ctypes.util
import io
import logging
import struct
import zlib
from concurrent.futures import ThreadPoolExecutor

logger = logging.getLogger(__name__)

BGZF_MAX_OUT = 1 << 16  # BGZF blocks decode to at most 64 KiB


def _load_libdeflate():
    for name in ("libdeflate.so", "libdeflate.so.0", ctypes.util.find_library("deflate")):
        if not name:
            continue
        try:
            lib = ctypes.CDLL(name)
        except OSError:
            continue
        lib.libdeflate_alloc_decompressor.restype = ctypes.c_void_p
        lib.libdeflate_gzip_decompress.restype = ctypes.c_int
        lib.libdeflate_gzip_decompress.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_size_t,
            ctypes.c_void_p, ctypes.c_size_t, ctypes.POINTER(ctypes.c_size_t),
        ]
        return lib
    return None


_libdeflate = None
_libdeflate_tried = False


def libdeflate():
    global _libdeflate, _libdeflate_tried
    if not _libdeflate_tried:
        _libdeflate_tried = True
        _libdeflate = _load_libdeflate()
    return _libdeflate


def bgzf_block_size(header: bytes) -> int | None:
    """Total compressed size of the BGZF member starting at ``header``, or
    None if this is not a BGZF block (gzip FEXTRA subfield BC, u16 BSIZE)."""
    if len(header) < 18 or header[:4] != b"\x1f\x8b\x08\x04":
        return None
    xlen = struct.unpack_from("<H", header, 10)[0]
    extra = header[12 : 12 + xlen]
    pos = 0
    while pos + 4 <= len(extra):
        si1, si2, slen = extra[pos], extra[pos + 1], struct.unpack_from("<H", extra, pos + 2)[0]
        if si1 == 66 and si2 == 67 and slen == 2:
            return struct.unpack_from("<H", extra, pos + 4)[0] + 1
        pos += 4 + slen
    return None


def is_bgzf(path: str) -> bool:
    try:
        with open(path, "rb") as f:
            return bgzf_block_size(f.read(64)) is not None
    except OSError:
        return False


class _Decompressor:
    """Per-thread libdeflate decompressor handle."""

    def __init__(self, lib):
        self.lib = lib
        self.handle = lib.libdeflate_alloc_decompressor()

    def gzip_decompress(self, block: bytes, out_size: int) -> bytes:
        out = ctypes.create_string_buffer(out_size)
        actual = ctypes.c_size_t(0)
        rc = self.lib.libdeflate_gzip_decompress(
            self.handle, block, len(block), out, out_size, ctypes.byref(actual)
        )
        if rc != 0:
            raise OSError(f"libdeflate gzip decode failed (rc={rc})")
        return out.raw[: actual.value]


class BgzfReader(io.RawIOBase):
    """Parallel BGZF decoder: a reader thread splits the file into members by
    the BSIZE header field, a pool decodes them with libdeflate (GIL released
    during the C call), blocks are delivered in order."""

    READ_AHEAD = 4 << 20  # compressed bytes fetched per file read
    BATCH = 64  # blocks decoded per pool task

    def __init__(self, path: str, n_threads: int = 4):
        lib = libdeflate()
        assert lib is not None
        import threading

        self._file = open(path, "rb")
        self._pool = ThreadPoolExecutor(max_workers=n_threads)
        self._local = threading.local()
        self._lib = lib
        self._pending: list = []  # futures, in file order
        self._comp = bytearray()  # compressed tail not yet split
        self._eof_file = False
        self._serial_tail = False  # hit a non-BGZF member: finish serially
        self._buf = bytearray()
        self._max_pending = max(2, 2 * n_threads)

    def _decomp(self):
        d = getattr(self._local, "d", None)
        if d is None:
            d = self._local.d = _Decompressor(self._lib)
        return d

    def _decode_batch(self, blocks: list[bytes]) -> bytes:
        d = self._decomp()
        return b"".join(d.gzip_decompress(b, BGZF_MAX_OUT) for b in blocks)

    def _split_and_submit(self):
        """Carve complete members off the compressed tail, submit a batch.
        One head deletion per batch — per-block deletion memmoves the whole
        multi-MB tail ~1000x per read-ahead."""
        blocks = []
        pos = 0
        comp = self._comp
        while len(blocks) < self.BATCH:
            size = bgzf_block_size(bytes(comp[pos : pos + 64]))
            if size is None or len(comp) - pos < size:
                break
            blocks.append(bytes(comp[pos : pos + size]))
            pos += size
        if pos:
            del comp[:pos]
        if blocks:
            self._pending.append(self._pool.submit(self._decode_batch, blocks))
            return True
        return False

    def _fill_pipeline(self):
        while len(self._pending) < self._max_pending:
            if self._split_and_submit():
                continue
            if self._comp and bgzf_block_size(bytes(self._comp[:64])) is None:
                # a non-BGZF member (or garbage): everything from here on is
                # handled as one serial gzip stream, AFTER the in-flight BGZF
                # blocks drain — ordering is preserved by _drain_tail running
                # only once _pending is empty
                self._serial_tail = True
                return
            if self._eof_file:
                return
            chunk = self._file.read(self.READ_AHEAD)
            if not chunk:
                self._eof_file = True
            else:
                self._comp += chunk

    def _drain_tail(self):
        """Serial multi-member zlib decode of the non-BGZF remainder (runs
        only once every parallel block has been delivered, so output order is
        preserved; loops over concatenated members — one-shot zlib.decompress
        would silently drop everything after the first)."""
        while True:
            while not self._comp and not self._eof_file:
                chunk = self._file.read(self.READ_AHEAD)
                if chunk:
                    self._comp += chunk
                else:
                    self._eof_file = True
            if not self._comp:
                return
            d = zlib.decompressobj(wbits=31)
            while not d.eof:
                if not self._comp:
                    if self._eof_file:
                        raise OSError("truncated gzip member at end of file")
                    chunk = self._file.read(self.READ_AHEAD)
                    if chunk:
                        self._comp += chunk
                    else:
                        self._eof_file = True
                    continue
                self._buf += d.decompress(bytes(self._comp))
                self._comp.clear()
            self._comp += d.unused_data

    def read(self, n=-1):
        if n is None or n < 0:  # io contract: read() / read(-1) = read all
            out = bytearray()
            while True:
                block = self.read(1 << 24)
                if not block:
                    return bytes(out)
                out += block
        while len(self._buf) < n:
            self._fill_pipeline()
            if self._pending:
                self._buf += self._pending.pop(0).result()
                continue
            if self._serial_tail or (self._eof_file and self._comp):
                self._drain_tail()
            break
        out = bytes(self._buf[:n])
        del self._buf[:n]
        return out

    def readable(self):
        return True

    def close(self):
        try:
            self._pool.shutdown(wait=False, cancel_futures=True)
            self._file.close()
        finally:
            super().close()


def open_gzip(path: str, n_threads: int = 4):
    """Best available decoder for a .gz file (see module docstring)."""
    if libdeflate() is not None and is_bgzf(path):
        logger.info("BGZF input: parallel libdeflate decode (%d threads)", n_threads)
        return BgzfReader(path, n_threads=n_threads)
    try:  # ISA-L igzip: the reference's fast path (util.py:97-98)
        from isal import igzip  # type: ignore

        return igzip.open(path, "rb")
    except ImportError:
        import gzip

        return gzip.open(path, "rb")
