"""Minimal BAM writer (SAM text -> BAM over BGZF).

Test/tooling support only: lets the parity fuzzers and tests exercise
the binary BAM readers (io/bam.py and io/native/bam_count.cpp) without
external converters.  Field layout per the SAM/BAM spec as used by
htslib (the reference's vendored IO layer, SURVEY.md §2.2)."""

from __future__ import annotations

import io
import struct
from typing import List, Tuple

from .bgzf import BGZF_EOF, bgzf_write_blocks

_SEQ_NT16 = {c: i for i, c in enumerate("=ACMGRSVTWYHKDBN")}
for _c in list(_SEQ_NT16):
    _SEQ_NT16[_c.lower()] = _SEQ_NT16[_c]
_CIGAR_CODE = {c: i for i, c in enumerate("MIDNSHP=X")}
FUNMAP = 0x4


def bgzf_compress(payload: bytes, level: int = 6) -> bytes:
    """Compress a byte string into a BGZF member stream + EOF block."""
    buf = io.BytesIO()
    bgzf_write_blocks(buf, payload, level)
    buf.write(BGZF_EOF)
    return buf.getvalue()


def _encode_record(fields: List[bytes], name2tid) -> bytes:
    rn = fields[0]
    flag = int(fields[1])
    tid = name2tid.get(fields[2].decode("latin-1"), -1)
    pos = int(fields[3]) - 1
    mapq = int(fields[4])
    cigar: List[Tuple[int, int]] = []
    cs = fields[5].decode("latin-1")
    if cs != "*":
        num = ""
        for ch in cs:
            if ch.isdigit():
                num += ch
            else:
                cigar.append((_CIGAR_CODE[ch], int(num)))
                num = ""
    seq = fields[9]
    l_seq = 0 if seq == b"*" else len(seq)
    nyb = bytearray((l_seq + 1) // 2)
    for i in range(l_seq):
        code = _SEQ_NT16.get(chr(seq[i]), 15)
        if i & 1:
            nyb[i >> 1] |= code
        else:
            nyb[i >> 1] |= code << 4
    qual = fields[10]
    q = b"\xff" * l_seq if qual == b"*" else bytes(x - 33 for x in qual[:l_seq])
    body = struct.pack(
        "<iiBBHHHiiii",
        tid,
        pos,
        len(rn) + 1,
        mapq,
        0,  # bin (readers here never use it)
        len(cigar),
        flag,
        l_seq,
        -1,
        -1,
        0,
    )
    body += rn + b"\x00"
    for op, ln in cigar:
        body += struct.pack("<I", (ln << 4) | op)
    body += bytes(nyb) + q
    return struct.pack("<i", len(body)) + body


def _reg2bin(beg: int, end: int) -> int:
    """Smallest bin containing [beg, end) (SAM spec 5-level binning)."""
    end -= 1
    if beg >> 14 == end >> 14:
        return ((1 << 15) - 1) // 7 + (beg >> 14)
    if beg >> 17 == end >> 17:
        return ((1 << 12) - 1) // 7 + (beg >> 17)
    if beg >> 20 == end >> 20:
        return ((1 << 9) - 1) // 7 + (beg >> 20)
    if beg >> 23 == end >> 23:
        return ((1 << 6) - 1) // 7 + (beg >> 23)
    if beg >> 26 == end >> 26:
        return ((1 << 3) - 1) // 7 + (beg >> 26)
    return 0


def write_bai(bam_path: str, bai_path: str) -> None:
    """Build a .bai index by re-reading the BAM (test-scale; mirrors
    htslib sam_index_build's binning + 16 kb linear index)."""
    from .bam import BamReader

    rdr = BamReader(bam_path)
    n_ref = len(rdr.ref_names)
    bins = [dict() for _ in range(n_ref)]  # bin -> [(vbeg, vend)]
    intervals = [[] for _ in range(n_ref)]
    rdr._bgzf.seek_voffset(rdr._body_voffset)
    while True:
        vbeg = rdr._bgzf.tell_voffset()
        rec = rdr._read_record()
        if rec is None:
            break
        vend = rdr._bgzf.tell_voffset()
        if rec.tid < 0 or rec.pos < 0:
            continue
        end = rec.end_pos()  # bam_endpos (io/bam.py)
        b = _reg2bin(rec.pos, end)
        chunks = bins[rec.tid].setdefault(b, [])
        if chunks and chunks[-1][1] == vbeg:
            chunks[-1] = (chunks[-1][0], vend)
        else:
            chunks.append((vbeg, vend))
        ivs = intervals[rec.tid]
        for iv in range(rec.pos >> 14, ((end - 1) >> 14) + 1):
            while len(ivs) <= iv:
                ivs.append(0)
            if ivs[iv] == 0 or vbeg < ivs[iv]:
                ivs[iv] = vbeg
    rdr.close()
    # backfill empty linear slots with the next non-empty offset
    for ivs in intervals:
        nxt = 0
        for i in range(len(ivs) - 1, -1, -1):
            if ivs[i] == 0:
                ivs[i] = nxt
            else:
                nxt = ivs[i]
    out = bytearray(b"BAI\x01")
    out += struct.pack("<i", n_ref)
    for tid in range(n_ref):
        out += struct.pack("<i", len(bins[tid]))
        for b in sorted(bins[tid]):
            chunks = bins[tid][b]
            out += struct.pack("<Ii", b, len(chunks))
            for cb, ce in chunks:
                out += struct.pack("<QQ", cb, ce)
        out += struct.pack("<i", len(intervals[tid]))
        for v in intervals[tid]:
            out += struct.pack("<Q", v)
    with open(bai_path, "wb") as f:
        f.write(bytes(out))


def _bin_first(level: int) -> int:
    return ((1 << 3 * level) - 1) // 7


def _bin_level(b: int, depth: int) -> int:
    level = 0
    while level < depth and _bin_first(level + 1) <= b:
        level += 1
    return level


def _reg2bin_gen(beg: int, end: int, min_shift: int, depth: int) -> int:
    """Smallest bin containing [beg, end) under (min_shift, depth)
    binning (hts_reg2bin, htslib/hts.h)."""
    end -= 1
    s = min_shift
    t = _bin_first(depth)
    for level in range(depth, 0, -1):
        if beg >> s == end >> s:
            return t + (beg >> s)
        s += 3
        # C's `--l, t -= 1<<3*l` decrements l BEFORE the update:
        # first(l) -> first(l-1) subtracts 8^(l-1)
        t -= 1 << (3 * (level - 1))
    return 0


def write_csi(bam_path: str, csi_path: str, min_shift: int = 14,
              depth: int = 5) -> None:
    """Build a CSI index by re-reading the BAM (test-scale; mirrors
    htslib sam_index_build3 with min_shift > 0: generalized binning,
    per-bin loff from an internal min_shift-granularity linear index
    that is then discarded — update_loff(free_lidx=1), hts.c:2472 —
    plus the META pseudo-bin and trailing n_no_coor).  BGZF-wrapped
    (idx_write, hts.c:2798-2812)."""
    from .bam import BamReader

    rdr = BamReader(bam_path)
    n_ref = len(rdr.ref_names)
    n_bins_total = _bin_first(depth + 1)
    bins = [dict() for _ in range(n_ref)]  # bin -> [(vbeg, vend)]
    lidx = [[] for _ in range(n_ref)]  # min_shift intervals; -1 = unset
    span = [None] * n_ref  # (off_beg, off_end) voffsets per tid
    mapped = [[0, 0] for _ in range(n_ref)]  # [n_mapped, n_unmapped]
    n_no_coor = 0
    rdr._bgzf.seek_voffset(rdr._body_voffset)
    while True:
        vbeg = rdr._bgzf.tell_voffset()
        rec = rdr._read_record()
        if rec is None:
            break
        vend = rdr._bgzf.tell_voffset()
        if rec.tid < 0 or rec.pos < 0:
            n_no_coor += 1
            continue
        mapped[rec.tid][1 if rec.flag & FUNMAP else 0] += 1
        end = rec.end_pos()
        b = _reg2bin_gen(rec.pos, end, min_shift, depth)
        chunks = bins[rec.tid].setdefault(b, [])
        if chunks and chunks[-1][1] == vbeg:
            chunks[-1] = (chunks[-1][0], vend)
        else:
            chunks.append((vbeg, vend))
        ivs = lidx[rec.tid]
        for iv in range(rec.pos >> min_shift, ((end - 1) >> min_shift) + 1):
            while len(ivs) <= iv:
                ivs.append(-1)
            if ivs[iv] == -1 or vbeg < ivs[iv]:
                ivs[iv] = vbeg
        if span[rec.tid] is None:
            span[rec.tid] = (vbeg, vend)
        else:
            span[rec.tid] = (span[rec.tid][0], vend)
    rdr.close()
    for ivs in lidx:  # backfill unset slots from the right (update_loff)
        for i in range(len(ivs) - 2, -1, -1):
            if ivs[i] == -1:
                ivs[i] = ivs[i + 1]
    payload = bytearray(b"CSI\x01")
    payload += struct.pack("<iii", min_shift, depth, 0)  # l_aux = 0
    payload += struct.pack("<i", n_ref)
    for tid in range(n_ref):
        bd = bins[tid]
        meta = [] if span[tid] is None else [
            (span[tid][0], span[tid][1]),
            (mapped[tid][0], mapped[tid][1]),
        ]
        payload += struct.pack("<i", len(bd) + (1 if meta else 0))
        for b in sorted(bd):
            # loff = linear offset of the bin's leftmost bottom-level
            # interval (hts_bin_bot; update_loff hts.c:2445-2460)
            level = _bin_level(b, depth)
            bot = (b - _bin_first(level)) << (3 * (depth - level))
            ivs = lidx[tid]
            loff = ivs[bot] if bot < len(ivs) and ivs[bot] != -1 else 0
            chunks = bd[b]
            payload += struct.pack("<IQi", b, loff, len(chunks))
            for cb, ce in chunks:
                payload += struct.pack("<QQ", cb, ce)
        if meta:
            payload += struct.pack("<IQi", n_bins_total + 1, 0, len(meta))
            for u_, v_ in meta:
                payload += struct.pack("<QQ", u_, v_)
    payload += struct.pack("<Q", n_no_coor)
    with open(csi_path, "wb") as f:
        f.write(bgzf_compress(bytes(payload)))


def sam_to_bam(sam_path: str, bam_path: str, sort: bool = False) -> None:
    """Convert plain-text SAM to BAM (single-threaded, test-scale).
    sort=True coordinate-sorts records (required before write_bai)."""
    header_lines = []
    ref_names: List[str] = []
    ref_lens: List[int] = []
    records = []
    with open(sam_path, "rb") as f:
        for line in f:
            if line.startswith(b"@"):
                header_lines.append(line)
                if line.startswith(b"@SQ"):
                    name, ln = None, 0
                    for fld in line.rstrip(b"\r\n").split(b"\t")[1:]:
                        if fld.startswith(b"SN:"):
                            name = fld[3:].decode("latin-1")
                        elif fld.startswith(b"LN:"):
                            ln = int(fld[3:])
                    if name is not None:
                        ref_names.append(name)
                        ref_lens.append(ln)
            elif line.rstrip():
                records.append(line.rstrip(b"\r\n").split(b"\t"))
    name2tid = {n: i for i, n in enumerate(ref_names)}
    if sort:
        def _key(fields):
            tid = name2tid.get(fields[2].decode("latin-1"), -1)
            return (tid if tid >= 0 else 1 << 30, int(fields[3]) - 1)

        records.sort(key=_key)
    text = b"".join(header_lines)
    payload = bytearray(b"BAM\x01")
    payload += struct.pack("<i", len(text)) + text
    payload += struct.pack("<i", len(ref_names))
    for n, ln in zip(ref_names, ref_lens):
        nb = n.encode()
        payload += struct.pack("<i", len(nb) + 1) + nb + b"\x00"
        payload += struct.pack("<i", ln)
    for fields in records:
        payload += _encode_record(fields, name2tid)
    with open(bam_path, "wb") as f:
        f.write(bgzf_compress(bytes(payload)))
