"""ctypes bindings for the native IO layer (built on demand with g++).

Falls back cleanly when the toolchain is unavailable — callers check
`available()` and use the pure-Python reader otherwise.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Iterator, Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRCS = [
    os.path.join(_HERE, "fastx_reader.cpp"),
    os.path.join(_HERE, "bam_count.cpp"),
    os.path.join(_HERE, "cram_rans.cpp"),
]
_SO = os.path.join(_HERE, "libkmerio.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    # No ISA flags beyond the platform baseline: the .so persists next
    # to the sources, so any -march/-mavx build could SIGILL after the
    # checkout moves to an older node (the mtime freshness check cannot
    # see ISA mismatches).  The hot packing loop carries its own
    # __attribute__((target("avx2"))) + __builtin_cpu_supports runtime
    # dispatch, so the portable build loses nothing on AVX2 hosts.
    tmp = _SO + f".tmp.{os.getpid()}"
    cmd = [
        "g++",
        "-O3",
        "-shared",
        "-fPIC",
        "-o",
        tmp,
        *_SRCS,
        "-lz",
    ]
    # libdeflate (when present) decodes gzip ~2.5x faster than zlib on
    # this host; the reader falls back to zlib streaming without it.
    if os.path.exists("/usr/include/libdeflate.h"):
        cmd.insert(1, "-DKTP_HAVE_LIBDEFLATE")
        cmd.append("-ldeflate")
    try:
        r = subprocess.run(cmd, capture_output=True, timeout=120)
        if r.returncode == 0:
            # atomic publish: concurrent builders/readers never see a
            # half-written .so (g++ -o writes in place otherwise)
            os.replace(tmp, _SO)
            return True
        return False
    except (OSError, subprocess.TimeoutExpired):
        return False
    finally:
        try:
            os.unlink(tmp)  # no-op after a successful os.replace
        except OSError:
            pass


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < max(
            os.path.getmtime(s) for s in _SRCS
        ):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            # a stale or corrupt .so that passed the mtime check (e.g.
            # an interrupted legacy in-place build, or an incompatible
            # binary from another machine): rebuild once rather than
            # silently dropping every future run to the Python reader
            if not _build():
                return None
            try:
                lib = ctypes.CDLL(_SO)
            except OSError:
                return None
        lib.ktp_open.restype = ctypes.c_void_p
        lib.ktp_open.argtypes = [ctypes.c_char_p]
        lib.ktp_close.argtypes = [ctypes.c_void_p]
        lib.ktp_read_block.restype = ctypes.c_int64
        lib.ktp_read_block.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64,
            ctypes.c_int32,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.ktp_set_policy.argtypes = [
            ctypes.c_void_p,
            ctypes.c_int32,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int64,
        ]
        lib.ktp_read_block_packed.restype = ctypes.c_int64
        lib.ktp_read_block_packed.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64,
            ctypes.c_int32,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.ktp_rans_decode.restype = ctypes.c_int32
        lib.ktp_rans_decode.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64,
        ]
        lib.ktp_bam_count.restype = ctypes.c_int64
        lib.ktp_bam_count.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
        ]
        _lib = lib
        return _lib


def available() -> bool:
    if os.environ.get("KMER_TPU_NO_NATIVE"):  # force pure-Python paths
        return False
    return _load() is not None


def iter_packed2bit_native(paths, k: int, block_bases: int, capacity: int,
                           qual_policy=None):
    """Bit-packed variant of iter_packed_native for bandwidth-limited
    host->device links: yields (packed_u8[cap/4], mask_u8[cap/8],
    n_bytes_used, n_bases, n_seqs, row_bytes, batch_end).  n_bytes_used
    is the packed-region layout boundary (bases + separators of every
    piece); n_bases/n_seqs are TRUE per-read totals (each read once,
    split halos not re-counted — the reference's accounting);
    batch_end is True when this buffer completes a reference pipeline
    batch (summed kept-read length reached block_bases — the
    yak-count.c:381-383 rule; consumers aggregate per-batch stderr
    progress on it).  capacity is rounded up to a multiple of 8."""
    lib = _load()
    assert lib is not None
    capacity = (capacity + 7) & ~7
    u8p = ctypes.POINTER(ctypes.c_uint8)
    for path in paths:
        h = lib.ktp_open(os.fsencode(path))
        if not h:
            import errno

            raise OSError(errno.ENOENT, "cannot open", path)
        if qual_policy is not None:
            lib.ktp_set_policy(h, 1, block_bases, qual_policy[1], qual_policy[2])
        try:
            while True:
                packed = np.zeros(capacity // 4, np.uint8)
                mask = np.zeros(capacity // 8, np.uint8)
                n_seqs = ctypes.c_int64()
                n_bases = ctypes.c_int64()
                row_bytes = ctypes.c_int64()
                batch_end = ctypes.c_int64()
                used = lib.ktp_read_block_packed(
                    h,
                    packed.ctypes.data_as(u8p),
                    mask.ctypes.data_as(u8p),
                    capacity,
                    k,
                    block_bases,
                    ctypes.byref(n_seqs),
                    ctypes.byref(n_bases),
                    ctypes.byref(row_bytes),
                    ctypes.byref(batch_end),
                )
                if used <= 0:
                    break
                yield (
                    packed,
                    mask,
                    int(used),
                    int(n_bases.value),
                    int(n_seqs.value),
                    int(row_bytes.value) or None,
                    bool(batch_end.value),
                )
        finally:
            lib.ktp_close(h)


def bam_count_native(path, tids, starts, refs, alts):
    """Sequentially scan a BAM counting ref/alt bases at SNP positions
    (native analog of the Python fallback in tools/bam_vaf_counter.py).

    tids/starts must be sorted by (tid, start); refs/alts are ASCII base
    codes (uint8).  Returns (ref_counts, alt_counts) int64 arrays, or
    None when the native path is unavailable or the file's header is
    unreadable as BAM (caller falls back to the Python reader).  Body
    corruption mid-stream yields counts up to the damage, matching
    htslib's and the Python reader's stop-at-first-bad-record."""
    if not available():
        return None
    lib = _load()
    n = len(tids)
    tids = np.ascontiguousarray(tids, np.int32)
    starts = np.ascontiguousarray(starts, np.int32)
    refs = np.ascontiguousarray(refs, np.uint8)
    alts = np.ascontiguousarray(alts, np.uint8)
    ref_counts = np.zeros(n, np.int64)
    alt_counts = np.zeros(n, np.int64)
    i32p = ctypes.POINTER(ctypes.c_int32)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i64p = ctypes.POINTER(ctypes.c_int64)
    rc = lib.ktp_bam_count(
        os.fsencode(path),
        tids.ctypes.data_as(i32p),
        starts.ctypes.data_as(i32p),
        refs.ctypes.data_as(u8p),
        alts.ctypes.data_as(u8p),
        n,
        ref_counts.ctypes.data_as(i64p),
        alt_counts.ctypes.data_as(i64p),
    )
    if rc < 0:
        return None
    return ref_counts, alt_counts


def rans_decode_native(data: bytes, out_size: int):
    """Native rANS 4x8 decode (cram_rans.cpp); None when the native
    layer is unavailable or the stream is malformed — the caller
    (io/cram.py) falls back to the pure-Python decoder."""
    if not available():
        return None
    lib = _load()
    src = np.frombuffer(data, np.uint8)
    out = np.empty(out_size, np.uint8)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    rc = lib.ktp_rans_decode(
        src.ctypes.data_as(u8p), len(data),
        out.ctypes.data_as(u8p), out_size,
    )
    if rc != 0:
        return None
    return out.tobytes()


def iter_packed_native(
    paths, k: int, block_bases: int, capacity: int, qual_policy=None
) -> Iterator[Tuple[np.ndarray, int, int, Optional[int]]]:
    """Native equivalent of pipeline.counter._iter_packed: yields
    (ascii_u8[capacity], n_bytes_used, n_bases, n_seqs, row_bytes,
    batch_end); n_bytes_used is the buffer layout boundary,
    n_bases/n_seqs are TRUE per-read totals and batch_end flags
    reference-batch completion (see iter_packed2bit_native).
    row_bytes is L+1 when every packed read had length L (uniform-read
    fast path), else None.  qual_policy as in io.fastx.FastxReader."""
    lib = _load()
    assert lib is not None
    for path in paths:
        h = lib.ktp_open(os.fsencode(path))
        if not h:
            import errno

            raise OSError(errno.ENOENT, "cannot open", path)
        if qual_policy is not None:
            lib.ktp_set_policy(h, 1, block_bases, qual_policy[1], qual_policy[2])
        try:
            while True:
                buf = np.zeros(capacity, np.uint8)
                n_seqs = ctypes.c_int64()
                n_bases = ctypes.c_int64()
                row_bytes = ctypes.c_int64()
                batch_end = ctypes.c_int64()
                used = lib.ktp_read_block(
                    h,
                    buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                    capacity,
                    k,
                    block_bases,
                    ctypes.byref(n_seqs),
                    ctypes.byref(n_bases),
                    ctypes.byref(row_bytes),
                    ctypes.byref(batch_end),
                )
                if used <= 0:
                    break
                rb = int(row_bytes.value) or None
                yield (
                    buf,
                    int(used),
                    int(n_bases.value),
                    int(n_seqs.value),
                    rb,
                    bool(batch_end.value),
                )
        finally:
            lib.ktp_close(h)
