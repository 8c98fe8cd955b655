"""The C++ block reader must produce byte-identical packed buffers
(modulo trailing zero padding) and identical (bases, seqs) accounting to
the pure-Python packer on the committed fixtures."""

import os
import tempfile

import numpy as np
import pytest

from kmer_tpu.io import native
from kmer_tpu.io import fastx, packing

FIXTURES = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")


def _python_blocks(path, k, block_bases, capacity):
    for blk in fastx.read_blocks([path], k, block_bases):
        n_seqs, n_bases = len(blk.seqs), blk.sum_len
        packs = list(packing.pack_block(blk, capacity))
        for i, (buf, n) in enumerate(packs):
            yield buf, n, n_bases, n_seqs, None, i == len(packs) - 1
            n_seqs = n_bases = 0


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
        out, total_seqs, total_bases = [], 0, 0
        for buf, n, n_bases, n_seqs, rb, _be in blocks:
            assert not buf[n:].any()
            if rb:
                # declared-uniform blocks must actually be uniform rows
                assert n % rb == 0
            out.extend(bytes(buf[:n]).split(b"\x00")[:-1])
            total_seqs += n_seqs
            total_bases += n_bases
        return [r for r in out if r], total_seqs, total_bases

    g_reads, g_seqs, g_bases = reads(got)
    w_reads, w_seqs, w_bases = reads(want)
    assert g_seqs == w_seqs
    assert g_bases == w_bases  # true per-read bases, halos not recounted
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
    for (buf, n, nb, ns, rb, _be), (packed, mask, n2, nb2, ns2, rb2,
                                    _be2) in zip(
        a_blocks, p_blocks
    ):
        assert (n, nb, ns, rb) == (n2, nb2, ns2, rb2)
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
    masks = {p: [m is None for _, m, _, _, _, _, _ in
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


def test_split_reads_counted_once():
    """A read split at a buffer boundary must count ONE read with its
    full length — piece-based counting inflated n_seqs by the number of
    splits and n_bases by (k-1) per split (the reference counts per
    kseq read, vaf-counter.c:505-507).  Both the native reader and the
    pure-Python fallback must agree."""
    import gzip

    import numpy as np

    from kmer_tpu.pipeline.counter import _iter_packed

    rng = np.random.default_rng(9)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "long.fq.gz")
        n_reads, want_bases = 40, 0
        with gzip.open(path, "wb") as f:
            for i in range(n_reads):
                L = int(rng.integers(5000, 30000))
                want_bases += L
                s = rng.choice(list(b"ACGT"), L).astype(np.uint8).tobytes()
                f.write(b"@r%d\n%s\n+\n%s\n" % (i, s, b"I" * L))
        k, block = 31, 100_000  # small buffers force splits
        for force_py in (False, True):
            env = dict(os.environ)
            if force_py and not native.available():
                continue
            seqs = bases = 0
            if force_py:
                import unittest.mock as mock

                with mock.patch.object(native, "available",
                                       lambda: False):
                    for _b, nb, ns, _rb, _be in _iter_packed(
                            [path], k, block, block + 4096):
                        bases += nb
                        seqs += ns
            else:
                for _b, nb, ns, _rb, _be in _iter_packed(
                        [path], k, block, block + 4096):
                    bases += nb
                    seqs += ns
            assert seqs == n_reads, (force_py, seqs)
            assert bases == want_bases, (force_py, bases)


def test_native_reader_fifo_input():
    """A FIFO (process substitution: `tool <(zcat ...)`) must stream:
    the libdeflate slurp path reopened the file after sniffing the
    gzip magic, which deadlocks on a pipe (regression).  Plain and
    gzip content both arrive through the zlib streaming path."""
    import gzip
    import threading

    if not native.available():
        pytest.skip("native reader not buildable")
    recs = [b"@r%d\n%s\n+\n%s\n" % (i, b"ACGT" * 30, b"I" * 120)
            for i in range(50)]
    for compressed in (False, True):
        payload = b"".join(recs)
        if compressed:
            payload = gzip.compress(payload)
        with tempfile.TemporaryDirectory() as d:
            fifo = os.path.join(d, "p.fifo")
            os.mkfifo(fifo)

            def writer():
                with open(fifo, "wb") as f:
                    f.write(payload)

            t = threading.Thread(target=writer, daemon=True)
            t.start()
            total = []
            done = threading.Event()

            def reader():
                for _b, _used, nb, _ns, _rb, _be in native.iter_packed_native(
                        [fifo], 21, 1 << 16, (1 << 16) + 4096):
                    total.append(nb)
                done.set()

            rt = threading.Thread(target=reader, daemon=True)
            rt.start()
            assert done.wait(timeout=60), (
                f"native reader hung on FIFO (compressed={compressed})"
            )
            assert sum(total) == 50 * 120, compressed
