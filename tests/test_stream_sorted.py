"""Stream-sorted compactor mode (bitonic-merge accumulation) must be
bit-equivalent to the classic concat+one-giant-sort mode on every
surface: hist, counts_for, compact, checkpoint round trip."""

import numpy as np
import pytest

import jax.numpy as jnp

from kmer_tpu.table import compactor as C


def _random_batches(rng, n_batches, lanes_lo, lanes_hi, key_bits=40,
                    sent_frac=0.15):
    batches = []
    for _ in range(n_batches):
        n = int(rng.integers(lanes_lo, lanes_hi))
        hi = rng.integers(0, 1 << max(0, key_bits - 32), n,
                          dtype=np.uint32) if key_bits > 32 else np.zeros(
            n, np.uint32)
        lo = rng.integers(0, 1 << min(31, key_bits), n, dtype=np.uint32)
        m = rng.random(n) < sent_frac
        hi[m] = 0xFFFFFFFF
        lo[m] = 0xFFFFFFFF
        batches.append((hi, lo))
    return batches


def _fill(comp, batches):
    for hi, lo in batches:
        comp.add_raw(jnp.asarray(hi), jnp.asarray(lo))


@pytest.mark.parametrize("key_bits", [40, 30])
@pytest.mark.parametrize("seed", [0, 1])
def test_stream_hist_matches_classic(seed, key_bits, monkeypatch):
    monkeypatch.setattr(C, "_STREAM_CHUNK", 1 << 12)
    monkeypatch.setattr(C, "_STREAM_MIN", 1 << 8)
    rng = np.random.default_rng(seed)
    batches = _random_batches(rng, 9, 300, 5000, key_bits)
    classic = C.KmerCompactor(key_bits=key_bits)
    stream = C.KmerCompactor(key_bits=key_bits, stream_sorted=True)
    _fill(classic, batches)
    _fill(stream, batches)
    for n_bins, max_count, min_keep in [(256, None, 1), (1024, 1023, 2)]:
        h1, d1 = classic.hist(n_bins, max_count, min_keep)
        h2, d2 = stream.hist(n_bins, max_count, min_keep)
        assert np.array_equal(h1, h2)
        assert d1 == d2


@pytest.mark.parametrize("key_bits", [40, 30])
def test_stream_counts_for_matches_classic(key_bits, monkeypatch):
    monkeypatch.setattr(C, "_STREAM_CHUNK", 1 << 12)
    monkeypatch.setattr(C, "_STREAM_MIN", 1 << 8)
    rng = np.random.default_rng(7)
    batches = _random_batches(rng, 6, 500, 4000, key_bits)
    classic = C.KmerCompactor(key_bits=key_bits)
    stream = C.KmerCompactor(key_bits=key_bits, stream_sorted=True)
    _fill(classic, batches)
    _fill(stream, batches)
    # queries: a mix of present keys and absent ones, with duplicates
    hi0, lo0 = batches[0]
    qhi = np.concatenate([hi0[:50], np.zeros(20, np.uint32), hi0[:10]])
    qlo = np.concatenate([lo0[:50], np.arange(20, dtype=np.uint32), lo0[:10]])
    keep = ~((qhi == 0xFFFFFFFF) & (qlo == 0xFFFFFFFF))
    qhi, qlo = qhi[keep], qlo[keep]
    if key_bits <= 31:
        qhi[:] = 0
    c1 = classic.counts_for(qhi, qlo)
    c2 = stream.counts_for(qhi, qlo)
    assert np.array_equal(c1, c2)


def test_stream_compact_matches_classic(monkeypatch):
    monkeypatch.setattr(C, "_STREAM_CHUNK", 1 << 12)
    rng = np.random.default_rng(3)
    batches = _random_batches(rng, 5, 1000, 3000)
    classic = C.KmerCompactor()
    stream = C.KmerCompactor(stream_sorted=True)
    _fill(classic, batches)
    _fill(stream, batches)
    classic.compact()
    stream.compact()
    assert not stream._has_stream_state()
    (h1, l1, c1), (h2, l2, c2) = classic.runs[0], stream.runs[0]
    # compare the (key -> count) maps (slice sizes may differ)
    def as_map(h, l, c):
        h, l, c = np.asarray(h), np.asarray(l), np.asarray(c)
        keep = ~((h == 0xFFFFFFFF) & (l == 0xFFFFFFFF))
        return {(int(a), int(b)): int(x)
                for a, b, x in zip(h[keep], l[keep], c[keep]) if x}
    assert as_map(h1, l1, c1) == as_map(h2, l2, c2)


def test_stream_then_more_adds_and_mixed_counted(monkeypatch):
    """compact() mid-stream produces a counted run; later raw adds make a
    MIXED state, which must absorb into the classic path correctly."""
    monkeypatch.setattr(C, "_STREAM_CHUNK", 1 << 12)
    rng = np.random.default_rng(11)
    batches = _random_batches(rng, 8, 800, 4000)
    classic = C.KmerCompactor()
    stream = C.KmerCompactor(stream_sorted=True)
    _fill(classic, batches[:4])
    _fill(stream, batches[:4])
    stream.compact()
    _fill(classic, batches[4:])
    _fill(stream, batches[4:])
    h1, d1 = classic.hist(256, 255)
    h2, d2 = stream.hist(256, 255)
    assert np.array_equal(h1, h2)
    assert d1 == d2


def test_stream_interleaved_fold_add_stays_bounded(monkeypatch):
    """Repeated hist (fold) / add cycles must stay bit-equivalent to the
    classic engine AND keep resident ladder lanes bounded by
    next_pow2(raw lanes added): the fold re-ladders its padded result,
    and without the size-bounding slice each cycle would re-merge one
    power of two larger (compounding growth — the round-2 regression
    the slice fixed)."""
    monkeypatch.setattr(C, "_STREAM_CHUNK", 1 << 12)
    monkeypatch.setattr(C, "_STREAM_MIN", 1 << 8)
    rng = np.random.default_rng(23)
    batches = _random_batches(rng, 10, 500, 3000)
    classic = C.KmerCompactor()
    stream = C.KmerCompactor(stream_sorted=True)
    for i in range(0, 10, 2):
        _fill(classic, batches[i:i + 2])
        _fill(stream, batches[i:i + 2])
        h1, d1 = classic.hist(256, None)
        h2, d2 = stream.hist(256, None)
        assert np.array_equal(h1, h2) and d1 == d2
        lad = stream.stream
        resident = sum(p[0].shape[0] for p in lad.ladder.values()) + (
            lad.pending_lanes)
        bound = max(C._STREAM_MIN,
                    1 << max(0, (lad.data_lanes - 1).bit_length()))
        assert resident <= bound, (i, resident, bound)


def test_stream_budget_triggers_compact(monkeypatch):
    monkeypatch.setattr(C, "_STREAM_CHUNK", 1 << 12)
    rng = np.random.default_rng(5)
    batches = _random_batches(rng, 6, 2000, 4000)
    stream = C.KmerCompactor(budget_bytes=40_000, stream_sorted=True)
    classic = C.KmerCompactor()
    _fill(stream, batches)
    _fill(classic, batches)
    assert stream.runs and stream.runs[0][2] is not None  # compacted
    h1, d1 = classic.hist(256, None)
    h2, d2 = stream.hist(256, None)
    assert np.array_equal(h1, h2) and d1 == d2


def test_stream_small_single_batch(monkeypatch):
    """Input far below one chunk: tail-only finalize (pad + sort)."""
    rng = np.random.default_rng(9)
    (b,) = _random_batches(rng, 1, 100, 200)
    stream = C.KmerCompactor(stream_sorted=True)
    classic = C.KmerCompactor()
    _fill(stream, [b])
    _fill(classic, [b])
    h1, d1 = classic.hist(256, None)
    h2, d2 = stream.hist(256, None)
    assert np.array_equal(h1, h2) and d1 == d2


def test_stream_engine_golden_end_to_end(monkeypatch, tmp_path):
    """SortCountEngine with KMER_TPU_STREAM_SORT=1 produces the exact
    histogram of the classic engine on a real FASTQ fixture."""
    import os

    from kmer_tpu.pipeline.counter import SortCountEngine

    fx = os.path.join(os.path.dirname(__file__), "fixtures",
                      "reads_small.fq.gz")
    if not os.path.exists(fx):
        pytest.skip("fixture missing")

    def run(stream):
        monkeypatch.setenv("KMER_TPU_STREAM_SORT", "1" if stream else "0")
        eng = SortCountEngine(k=21, block_bases=1 << 16)
        eng.count_paths([fx])
        assert eng.compactor.stream_sorted == stream
        return eng.hist(256, max_count=1023), eng.total_kmers

    (h1, t1) = run(False)
    (h2, t2) = run(True)
    assert np.array_equal(h1, h2)
    assert t1 == t2


def test_stream_checkpoint_roundtrip(monkeypatch, tmp_path):
    monkeypatch.setattr(C, "_STREAM_CHUNK", 1 << 12)
    monkeypatch.setenv("KMER_TPU_STREAM_SORT", "1")
    import os

    from kmer_tpu.pipeline.counter import SortCountEngine

    fx = os.path.join(os.path.dirname(__file__), "fixtures",
                      "reads_small.fq.gz")
    if not os.path.exists(fx):
        pytest.skip("fixture missing")
    eng = SortCountEngine(k=21, block_bases=1 << 16)
    eng.count_paths([fx])
    ckpt = str(tmp_path / "state.npz")
    eng.save_checkpoint(ckpt)
    eng2 = SortCountEngine.resume_checkpoint(ckpt)
    h1, _ = eng.hist(256, max_count=1023), None
    h2, _ = eng2.hist(256, max_count=1023), None
    assert np.array_equal(h1, h2)
