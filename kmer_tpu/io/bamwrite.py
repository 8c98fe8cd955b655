"""Minimal BAM writer (SAM text -> BAM over BGZF).

Test/tooling support only: lets the parity fuzzers and tests exercise
the binary BAM readers (io/bam.py and io/native/bam_count.cpp) without
external converters.  Field layout per the SAM/BAM spec as used by
htslib (the reference's vendored IO layer, SURVEY.md §2.2)."""

from __future__ import annotations

import struct
import zlib
from typing import List, Tuple

_SEQ_NT16 = {c: i for i, c in enumerate("=ACMGRSVTWYHKDBN")}
for _c in list(_SEQ_NT16):
    _SEQ_NT16[_c.lower()] = _SEQ_NT16[_c]
_CIGAR_CODE = {c: i for i, c in enumerate("MIDNSHP=X")}


def bgzf_compress(payload: bytes, level: int = 6) -> bytes:
    """Compress a byte string into a BGZF member stream + EOF block."""
    out = bytearray()
    for off in range(0, len(payload), 60000):
        out += _bgzf_block(payload[off : off + 60000], level)
    out += _bgzf_block(b"", level)  # EOF marker block
    return bytes(out)


def _bgzf_block(chunk: bytes, level: int) -> bytes:
    co = zlib.compressobj(level, zlib.DEFLATED, -15)
    comp = co.compress(chunk) + co.flush()
    bsize = len(comp) + 25 + 1
    hdr = struct.pack("<4BIBBH", 31, 139, 8, 4, 0, 0, 255, 6)
    hdr += struct.pack("<BBHH", 66, 67, 2, bsize - 1)
    return (
        hdr
        + comp
        + struct.pack("<II", zlib.crc32(chunk) & 0xFFFFFFFF, len(chunk))
    )


def _encode_record(fields: List[bytes], name2tid) -> bytes:
    rn = fields[0]
    flag = int(fields[1])
    tid = name2tid.get(fields[2].decode(), -1)
    pos = int(fields[3]) - 1
    mapq = int(fields[4])
    cigar: List[Tuple[int, int]] = []
    cs = fields[5].decode()
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


def sam_to_bam(sam_path: str, bam_path: str) -> None:
    """Convert plain-text SAM to BAM (single-threaded, test-scale)."""
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
                            name = fld[3:].decode()
                        elif fld.startswith(b"LN:"):
                            ln = int(fld[3:])
                    if name is not None:
                        ref_names.append(name)
                        ref_lens.append(ln)
            elif line.rstrip():
                records.append(line.rstrip(b"\r\n").split(b"\t"))
    name2tid = {n: i for i, n in enumerate(ref_names)}
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
