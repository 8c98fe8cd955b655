"""The C++ block reader must produce byte-identical packed buffers
(modulo trailing zero padding) and identical (bases, seqs) accounting to
the pure-Python packer on the committed fixtures."""

import os

import numpy as np
import pytest

from kmer_tpu.io import native
from kmer_tpu.io import fastx, packing

FIXTURES = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")


def _python_blocks(path, k, block_bases, capacity):
    for blk in fastx.read_blocks([path], k, block_bases):
        n_seqs = len(blk.seqs)
        for buf, n in packing.pack_block(blk, capacity):
            yield buf, n, n_seqs
            n_seqs = 0


@pytest.mark.parametrize(
    "fixture,k",
    [("reads_small.fq.gz", 21), ("genome_small.fa.gz", 31),
     ("sampleB.fq.gz", 21)],
)
@pytest.mark.parametrize("block_bases", [4096, 10_000_000])
def test_native_reader_matches_python(fixture, k, block_bases):
    if not native.available():
        pytest.skip("native reader not buildable")
    path = os.path.join(FIXTURES, fixture)
    capacity = block_bases + 4096
    got = list(native.iter_packed_native([path], k, block_bases, capacity))
    want = list(_python_blocks(path, k, block_bases, capacity))

    def reads(blocks):
        """Reconstruct the ordered read stream (block boundaries are a
        packing policy, not semantics — reads are atomic and windows
        never straddle the NUL separators)."""
        out, total_seqs = [], 0
        for buf, n, n_seqs, *rest in blocks:
            assert not buf[n:].any()
            if rest and rest[0]:
                # declared-uniform blocks must actually be uniform rows
                assert n % rest[0] == 0
            out.extend(bytes(buf[:n]).split(b"\x00")[:-1])
            total_seqs += n_seqs
        return [r for r in out if r], total_seqs

    g_reads, g_seqs = reads(got)
    w_reads, w_seqs = reads(want)
    assert g_seqs == w_seqs
    assert g_reads == w_reads
