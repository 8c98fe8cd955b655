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


def test_packed2bit_matches_ascii_reader():
    """The 2-bit packed native reader must unpack to exactly the ASCII
    reader's base-code stream (io/native ktp_read_block_packed)."""
    import numpy as np

    from kmer_tpu.io import native

    if not native.available():
        import pytest

        pytest.skip("native reader unavailable")
    k = 21
    paths = [os.path.join(FIXTURES, "reads_small.fq.gz")]
    nt4 = np.full(256, 4, np.uint8)
    for i, c in enumerate(b"ACGT"):
        nt4[c] = i
        nt4[c + 32] = i
    cap = 1_000_000 + 4096
    a_blocks = list(native.iter_packed_native(paths, k, 1_000_000, cap))
    p_blocks = list(native.iter_packed2bit_native(paths, k, 1_000_000, cap))
    assert len(a_blocks) == len(p_blocks)
    shifts = np.arange(4, dtype=np.uint8) * 2
    bits = np.arange(8, dtype=np.uint8)
    for (buf, n, ns, rb), (packed, mask, n2, ns2, rb2) in zip(
        a_blocks, p_blocks
    ):
        assert (n, ns, rb) == (n2, ns2, rb2)
        codes_a = nt4[buf]
        codes_p = ((packed[:, None] >> shifts[None, :]) & 3).reshape(-1)
        inv = ((mask[:, None] >> bits[None, :]) & 1).reshape(-1)
        codes_p = np.where(inv == 1, 4, codes_p)
        m = min(len(codes_a), len(codes_p))
        assert np.array_equal(codes_a[:m], codes_p[:m])
        assert np.all(codes_p[m:] == 4)


def test_packed_ingest_engine_equivalence(monkeypatch):
    """SortCountEngine with packed ingest forced must produce the same
    histogram as the ASCII path."""
    from kmer_tpu.pipeline.counter import SortCountEngine

    path = os.path.join(FIXTURES, "reads_small.fq.gz")
    import numpy as np

    monkeypatch.setenv("KMER_TPU_PACKED", "1")
    e1 = SortCountEngine(k=17)
    e1.count_paths([path])
    h1 = e1.hist(256)
    monkeypatch.setenv("KMER_TPU_PACKED", "0")
    e2 = SortCountEngine(k=17)
    e2.count_paths([path])
    h2 = e2.hist(256)
    assert np.array_equal(h1, h2)
    assert (e1.total_bases, e1.total_seqs, e1.total_kmers) == (
        e2.total_bases, e2.total_seqs, e2.total_kmers
    )


def test_structural_mask_elision(monkeypatch, tmp_path):
    """Uniform clean reads skip the mask transfer entirely (rebuilt on
    device from n + row_bytes); a single N base forces the mask back.
    Histograms must match the ASCII path either way."""
    import gzip

    import numpy as np

    from kmer_tpu.pipeline.counter import SortCountEngine, _iter_packed2

    rng = np.random.default_rng(3)
    clean = str(tmp_path / "clean.fq.gz")
    dirty = str(tmp_path / "dirty.fq.gz")
    for path, with_n in ((clean, False), (dirty, True)):
        with gzip.open(path, "wb") as f:
            for i in range(500):
                s = rng.choice(list(b"ACGT"), 120).astype(np.uint8)
                if with_n and i == 250:
                    s[60] = ord("N")
                f.write(b"@r%d\n%s\n+\n%s\n" % (i, s.tobytes(), b"I" * 120))
    k = 21
    masks = {p: [m is None for _, m, _, _, _ in
                 _iter_packed2([p], k, 1 << 16, (1 << 16) + 4096)]
             for p in (clean, dirty)}
    assert all(masks[clean]) and not any(masks[dirty])
    for path in (clean, dirty):
        monkeypatch.setenv("KMER_TPU_PACKED", "1")
        e1 = SortCountEngine(k=k, block_bases=1 << 16)
        e1.count_paths([path])
        h1 = e1.hist(256)
        monkeypatch.setenv("KMER_TPU_PACKED", "0")
        e2 = SortCountEngine(k=k, block_bases=1 << 16)
        e2.count_paths([path])
        assert np.array_equal(h1, e2.hist(256)), path
        assert e1.total_kmers == e2.total_kmers


def test_mesh_packed_ingest_equivalence(monkeypatch, tmp_path):
    """The mesh engine's packed ingest (2-bit codes over the host link,
    structural and masked modes) must match its ASCII ingest and the
    single-chip engine."""
    import gzip

    import jax
    import numpy as np

    if len(jax.devices()) < 8:
        import pytest

        pytest.skip("needs 8 virtual devices")
    from kmer_tpu.pipeline.counter import MeshSortCountEngine, SortCountEngine

    rng = np.random.default_rng(23)
    clean = str(tmp_path / "clean.fq.gz")   # -> structural mode
    dirty = str(tmp_path / "dirty.fq.gz")   # N base -> masked mode
    for path, with_n in ((clean, False), (dirty, True)):
        with gzip.open(path, "wb") as f:
            for i in range(800):
                s = rng.choice(list(b"ACGT"), 130).astype(np.uint8)
                if with_n and i % 97 == 0:
                    s[i % 130] = ord("N")
                f.write(b"@r%d\n%s\n+\n%s\n" % (i, s.tobytes(), b"I" * 130))
    monkeypatch.setenv("KMER_TPU_FORCE_MESH", "1")
    k = 21
    for path in (clean, dirty):
        monkeypatch.setenv("KMER_TPU_PACKED", "1")
        e1 = MeshSortCountEngine(k=k, block_bases=1 << 17)
        e1.count_paths([path])
        h1 = e1.hist(256, max_count=1023)
        monkeypatch.setenv("KMER_TPU_PACKED", "0")
        e2 = MeshSortCountEngine(k=k, block_bases=1 << 17)
        e2.count_paths([path])
        assert np.array_equal(h1, e2.hist(256, max_count=1023)), path
        assert e1._n_distinct == e2._n_distinct
        eng = SortCountEngine(k=k, block_bases=1 << 17)
        eng.count_paths([path])
        assert np.array_equal(h1, eng.hist(256, max_count=1023)), path
        assert (e1.total_bases, e1.total_seqs, e1.total_kmers) == (
            eng.total_bases, eng.total_seqs, eng.total_kmers,
        ), path
