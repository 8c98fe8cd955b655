"""Unit parity for the CRAM 3.1 entropy codecs (kmer_tpu/io/cram31.py)
against htscodecs itself: every rANS Nx16 transform flag combination
(ORDER/X32/STRIPE/CAT/RLE/PACK, rANS_static4x16pr.c rans_compress_to_4x16)
and the tok3 name tokenizer (tokenise_name3.c) are encoded by the C
library via tests/refbin/rans_nx16_fixture and must decode to the
original bytes through the Python decoder.

These would have caught round 3's two launch bugs: the little-endian
uint7 misread (htscodecs varint.h is BIG-endian under BIG_END) and the
order-1 compressed frequency table being parsed as a full container
(it is a raw 4-state order-0 body, rANS_static4x16pr.c:583)."""

import os
import random
import struct
import subprocess

import pytest

from kmer_tpu.io.cram31 import rans_nx16_decode, tok3_decode_names

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# RANS_ORDER_* bits (rANS_static4x16.h): 1=O1 4=X32 8=STRIPE 32=CAT
# 64=RLE 128=PACK.  Every combination htslib can emit at any profile.
ORDERS = [0, 1, 4, 5, 8, 9, 12, 13, 32, 64, 65, 128, 129, 132, 133,
          136, 140, 192, 193, 196, 200]


@pytest.fixture(scope="module")
def encoder():
    from tests import oracles

    try:
        return oracles.ensure("rans_nx16_fixture")
    except oracles.OracleBuildError as e:
        pytest.skip(str(e))


def _payloads():
    rng = random.Random(42)
    acgt = bytes(rng.choice(b"ACGT") for _ in range(50_000))
    runs = b"".join(bytes([rng.choice(b"AB")]) * rng.randint(1, 20)
                    for _ in range(3_000))
    mixed = bytes(rng.randint(0, 255) if rng.random() < 0.3 else 65
                  for _ in range(120_000))
    tiny = b"Q" * 7  # below one 4-state interleave round
    return {"acgt": acgt, "runs": runs, "mixed": mixed, "tiny": tiny}


@pytest.mark.parametrize("name", ["acgt", "runs", "mixed", "tiny"])
def test_rans_nx16_all_transforms(encoder, tmp_path, name):
    raw = _payloads()[name]
    src = tmp_path / "in.bin"
    src.write_bytes(raw)
    for order in ORDERS:
        out = tmp_path / f"o{order}.rans"
        r = subprocess.run(
            [encoder, "rans", str(order), str(src), str(out)],
            capture_output=True,
        )
        if r.returncode != 0:
            # the C encoder declines some flag/size combos (e.g. O1 on
            # tiny inputs falls back internally); nothing to decode
            continue
        blob = out.read_bytes()
        assert rans_nx16_decode(blob, len(raw)) == raw, (name, order)


def test_tok3_names_roundtrip(encoder, tmp_path):
    names = b"".join(b"read%d/%d\n" % (i * 7 % 5000, 1 + i % 2)
                     for i in range(3000))
    src = tmp_path / "names.txt"
    src.write_bytes(names)
    for level in (1, 5, 9):
        out = tmp_path / f"l{level}.tok3"
        subprocess.run(
            [encoder, "tok3", str(level), str(src), str(out)],
            capture_output=True, check=True,
        )
        dec = tok3_decode_names(out.read_bytes(), None)
        assert dec == names.replace(b"\n", b"\0"), level


def test_tok3_structured_names(encoder, tmp_path):
    """Illumina-style names exercise DIGITS0 (zero-padded), DDELTA
    (sorted tiles) and ALPHA/CHAR columns."""
    names = b"".join(
        b"M01234:%d:000000000-A1B2C:1:%04d:%d:%d\n"
        % (i % 3, 1101 + i % 4, 10000 + i * 13 % 9000, 1000 + i * 7 % 900)
        for i in range(2000)
    )
    src = tmp_path / "names.txt"
    src.write_bytes(names)
    out = tmp_path / "names.tok3"
    subprocess.run(
        [encoder, "tok3", "7", str(src), str(out)],
        capture_output=True, check=True,
    )
    assert tok3_decode_names(out.read_bytes(), None) == \
        names.replace(b"\n", b"\0")


def test_rans_nx16_corrupt_raises_valueerror():
    """Corrupt/truncated blocks surface as the documented ValueError,
    never a bare IndexError/KeyError/struct.error."""
    rng = random.Random(7)
    blobs = [
        b"",
        bytes([0x00]),                      # O0 with no body
        bytes([0x01, 0x05]),                # O1 truncated at shift byte
        bytes([0x08, 0x05, 0x00]),          # stripe, zero sub-streams
        bytes([0x80, 0x05, 0x04]) + b"AB",  # pack map cut short
        bytes([0x40, 0x05, 0x81]),          # rle meta varint runs off end
    ]
    for blob in blobs:
        with pytest.raises(ValueError):
            rans_nx16_decode(blob, 5)
    # random garbage must also normalize to ValueError (or decode, for
    # the rare garbage that parses — then the size check still applies)
    for _ in range(200):
        blob = bytes(rng.randint(0, 255) for _ in range(rng.randint(1, 64)))
        try:
            out = rans_nx16_decode(blob, 33)
        except ValueError:
            continue
        assert len(out) == 33


def test_tok3_corrupt_raises_valueerror():
    with pytest.raises(ValueError):
        tok3_decode_names(b"", None)
    # use_arith=1 routes through the adaptive coder; a truncated stream
    # still normalizes to ValueError
    hdr = struct.pack("<II", 10, 2) + b"\x01"
    with pytest.raises(ValueError):
        tok3_decode_names(hdr + b"\x80\x00", None)
    rng = random.Random(11)
    for _ in range(200):
        blob = struct.pack("<II", 64, 4) + b"\x00" + bytes(
            rng.randint(0, 255) for _ in range(rng.randint(1, 48)))
        try:
            tok3_decode_names(blob, None)
        except ValueError:
            pass


def test_rle_expansion_bounded():
    """A corrupt RLE run length must abort before ballooning memory
    (rle.c hts_rle_decode bounds by out_end)."""
    from kmer_tpu.io.cram31 import _unrle

    # one literal 'A' in the run set with a ~1G run length encoded as a
    # big-endian uint7 varint; hint says 10 bytes
    runs = bytes([0x84, 0x80, 0x80, 0x80, 0x00])
    with pytest.raises(ValueError, match="RLE"):
        _unrle(b"A", runs, b"A", 10)


# ---------------------------------------------------------------------------
# arith (method 6) and fqzcomp (method 7) — kmer_tpu/io/cram_arith.py

# X_* bits (arith_dynamic.c): 1=O1 4=EXT(bz2) 8=STRIPE 32=CAT 64=RLE
# 128=PACK.  EXT combos are skipped automatically: this box's htslib
# oracle is built without libbz2, so its encoder cannot emit them
# (the decoder handles them via the stdlib bz2 module).
ARITH_ORDERS = [0, 1, 8, 9, 32, 64, 65, 128, 129, 136, 140, 192, 193, 200]


@pytest.mark.parametrize("name", ["acgt", "runs", "mixed", "tiny"])
def test_arith_all_transforms(encoder, tmp_path, name):
    from kmer_tpu.io.cram_arith import arith_decode

    raw = _payloads()[name]
    src = tmp_path / "in.bin"
    src.write_bytes(raw)
    for order in ARITH_ORDERS:
        out = tmp_path / f"o{order}.arith"
        r = subprocess.run(
            [encoder, "arith", str(order), str(src), str(out)],
            capture_output=True,
        )
        if r.returncode != 0:
            continue
        assert arith_decode(out.read_bytes(), len(raw)) == raw, (name, order)


def _qual_reads(rng, n=2000, dup_frac=0.3):
    """Correlated quality strings with mixed lengths and duplicate
    reads — drives fqzcomp's qtab/dtab/ptab contexts and dedup."""
    reads = []
    for _ in range(n):
        length = rng.choice([100, 100, 100, 151])
        q = 30
        row = bytearray()
        for _ in range(length):
            q = max(2, min(40, q + rng.choice([-1, 0, 0, 0, 1])))
            row.append(33 + q)
        reads.append(bytes(row))
        if rng.random() < dup_frac:
            reads.append(bytes(row))
    return b"\n".join(reads) + b"\n"


@pytest.mark.parametrize("mode", ["fqz", "fqz3"])
def test_fqzcomp_all_strategies(encoder, tmp_path, mode):
    """Every encoder strategy (strat_opts presets incl. selectors,
    qtab/dtab variants, fixed vs varying lengths, dedup) and, via fqz3,
    the CRAM v3.0 DO_REV orientation flags."""
    from kmer_tpu.io.cram_arith import fqz_decode

    rng = random.Random(101)
    quals = _qual_reads(rng)
    raw = quals.replace(b"\n", b"")
    src = tmp_path / "quals.txt"
    src.write_bytes(quals)
    for strat in range(7):
        out = tmp_path / f"s{strat}.fqz"
        r = subprocess.run(
            [encoder, mode, str(strat), str(src), str(out)],
            capture_output=True,
        )
        if r.returncode != 0:
            continue
        assert fqz_decode(out.read_bytes(), len(raw)) == raw, (mode, strat)


def test_tok3_arith_names(encoder, tmp_path):
    """tok3 with use_arith=1 (the small/archive profiles) routes its
    token streams through the adaptive coder."""
    names = b"".join(b"SRR123.%d %d/%d\n" % (i, i * 31 % 1000, 1 + i % 2)
                     for i in range(2500))
    src = tmp_path / "names.txt"
    src.write_bytes(names)
    out = tmp_path / "names.tok3a"
    # level 1 only: higher levels need the bz2-enabled encoder
    subprocess.run([encoder, "tok3a", "1", str(src), str(out)],
                   capture_output=True, check=True)
    assert tok3_decode_names(out.read_bytes(), None) == \
        names.replace(b"\n", b"\0")


def test_arith_fqz_corrupt_raises_valueerror():
    from kmer_tpu.io.cram_arith import arith_decode, fqz_decode

    rng = random.Random(17)
    for fn, hint in ((arith_decode, 33), (fqz_decode, None)):
        with pytest.raises(ValueError):
            fn(b"", hint)
        for _ in range(200):
            blob = bytes(rng.randint(0, 255)
                         for _ in range(rng.randint(1, 64)))
            try:
                out = fn(blob, hint)
            except ValueError:
                continue
            if hint is not None:
                assert len(out) == hint
