"""Unit tests for the sort-based compactor against a dict oracle."""

import numpy as np
import jax.numpy as jnp

from kmer_tpu.kernels import segops, u64 as u
from kmer_tpu.table.compactor import KmerCompactor

RNG = np.random.default_rng(5)


def batch(keys_np, m=None):
    m = m or len(keys_np)
    arr = np.zeros(m, np.uint64)
    arr[: len(keys_np)] = keys_np
    valid = np.zeros(m, bool)
    valid[: len(keys_np)] = True
    return u.from_np(arr), jnp.asarray(valid)


def oracle(draws):
    h = {}
    for d in draws:
        for y in d.tolist():
            h[y] = h.get(y, 0) + 1
    return h


class TestHist:
    def test_multi_batch_hist(self):
        pool = RNG.integers(0, 1 << 62, size=400, dtype=np.uint64)
        c = KmerCompactor()
        draws = []
        for _ in range(5):
            d = RNG.choice(pool, size=3000)
            draws.append(d)
            keys, valid = batch(d, m=4096)  # includes invalid padding
            c.add_batch(keys, valid)
        want_counts = oracle(draws)
        h, nd = c.hist(64, max_count=None)
        want = np.zeros(64, np.int64)
        for v in want_counts.values():
            want[min(v, 63)] += 1
        assert np.array_equal(h[1:], want[1:])
        assert nd == len(want_counts)

    def test_min_keep_and_saturation(self):
        draws = [np.repeat(np.arange(1, 30, dtype=np.uint64), np.arange(1, 30))]
        c = KmerCompactor()
        keys, valid = batch(draws[0])
        c.add_batch(keys, valid)
        h, nd = c.hist(16, max_count=10, min_keep=2)
        want = np.zeros(16, np.int64)
        for v in range(2, 30):  # count-1 key dropped by min_keep
            want[min(min(v, 10), 15)] += 1
        assert np.array_equal(h[1:], want[1:])
        assert nd == 28

    def test_compaction_preserves_counts(self):
        pool = RNG.integers(0, 1 << 62, size=200, dtype=np.uint64)
        c = KmerCompactor()
        draws = []
        for i in range(4):
            d = RNG.choice(pool, size=2000)
            draws.append(d)
            keys, valid = batch(d)
            c.add_batch(keys, valid)
            if i % 2 == 1:
                c.compact()
        want_counts = oracle(draws)
        h, nd = c.hist(128, max_count=None)
        want = np.zeros(128, np.int64)
        for v in want_counts.values():
            want[min(v, 127)] += 1
        assert np.array_equal(h[1:], want[1:])
        assert nd == len(want_counts)


class TestCountsFor:
    def test_counts_in_query_order(self):
        pool = RNG.integers(0, 1 << 62, size=300, dtype=np.uint64)
        c = KmerCompactor()
        draws = []
        for _ in range(3):
            d = RNG.choice(pool, size=2500)
            draws.append(d)
            keys, valid = batch(d, m=4096)
            c.add_batch(keys, valid)
        want_counts = oracle(draws)
        # queries: half present, half absent, with duplicates
        queries = np.concatenate(
            [pool[:100], RNG.integers(0, 1 << 62, size=50, dtype=np.uint64), pool[:10]]
        )
        got = c.counts_for(
            (queries >> np.uint64(32)).astype(np.uint32),
            (queries & np.uint64(0xFFFFFFFF)).astype(np.uint32),
        )
        for i, q in enumerate(queries.tolist()):
            assert got[i] == want_counts.get(q, 0), i

    def test_counts_for_max_key_no_sentinel_tail(self):
        # regression: when the sorted planes end in a REAL key (no
        # sentinel padding — stream mode slices to next_pow2(data
        # lanes)), the lower-bound binary search's clamped probe at
        # index n-1 used to push low past n, over-counting by 1 any
        # query equal to the dataset maximum
        from kmer_tpu.table.compactor import _counts_for_raw_impl

        lo = jnp.asarray(np.array([1, 2, 3, 4, 5, 6, 7, 9], np.uint32))
        hi = jnp.zeros(8, jnp.uint32)
        qlo = jnp.asarray(np.array([9, 10, 1, 8], np.uint32))
        qhi = jnp.zeros(4, jnp.uint32)
        for pre_sorted in (False, True):
            got = np.asarray(
                _counts_for_raw_impl(hi, lo, qhi, qlo, False, pre_sorted)
            )
            assert got.tolist() == [1, 0, 1, 0], pre_sorted
        # two-plane max: query also equal to the max hi plane
        hi2 = jnp.asarray(np.array([0, 0, 1, 2, 2, 2, 3, 3], np.uint32))
        got = np.asarray(
            _counts_for_raw_impl(
                hi2, lo, jnp.asarray(np.array([3, 3], np.uint32)),
                jnp.asarray(np.array([9, 7], np.uint32)), False, True)
        )
        assert got.tolist() == [1, 1]

    def test_counts_for_max_key_stream_exact_pow2(self):
        # engine-level form of the same regression: exactly min_pad
        # (2^16) lanes through the stream ladder leave zero sentinel
        # tail; the max key must still count exactly once
        from kmer_tpu.table import compactor as comp_mod

        n = comp_mod._STREAM_MIN
        keys = np.arange(1, n + 1, dtype=np.uint64)  # max key = n
        c = KmerCompactor(stream_sorted=True)
        c.add_raw(
            jnp.asarray((keys >> np.uint64(32)).astype(np.uint32)),
            jnp.asarray((keys & np.uint64(0xFFFFFFFF)).astype(np.uint32)),
        )
        q = np.array([n, n + 1, 1], dtype=np.uint64)
        got = c.counts_for(
            (q >> np.uint64(32)).astype(np.uint32),
            (q & np.uint64(0xFFFFFFFF)).astype(np.uint32),
        )
        assert got.tolist() == [1, 0, 1]

    def test_counts_for_after_compaction(self):
        c = KmerCompactor()
        d = np.repeat(np.arange(10, 20, dtype=np.uint64), 3)
        keys, valid = batch(d)
        c.add_batch(keys, valid)
        c.compact()
        extra = np.arange(10, 15, dtype=np.uint64)  # one more of 10..14
        keys2, valid2 = batch(extra)
        c.add_batch(keys2, valid2)
        q = np.arange(8, 22, dtype=np.uint64)
        got = c.counts_for(
            (q >> np.uint64(32)).astype(np.uint32),
            (q & np.uint64(0xFFFFFFFF)).astype(np.uint32),
        )
        for i, qq in enumerate(q.tolist()):
            want = (3 if 10 <= qq < 20 else 0) + (1 if 10 <= qq < 15 else 0)
            assert got[i] == want


class TestSegops:
    def test_segmented_cummin(self):
        starts = jnp.asarray(np.array([1, 0, 0, 1, 0, 1, 1, 0], bool))
        vals = jnp.asarray(np.array([5, 3, 9, 7, 2, 8, 4, 6], np.uint32))
        got = np.asarray(segops.segmented_cummin(starts, vals))
        assert got.tolist() == [5, 3, 3, 7, 2, 8, 4, 4]


class TestOnePlane:
    """key_bits <= 31 drops the hi plane from every sort; results must
    match the general two-plane path exactly."""

    def _fill(self, c, draws):
        for d in draws:
            keys, valid = batch(d, m=4096)
            c.add_batch(keys, valid)

    def test_hist_compact_counts_match_two_plane(self):
        pool = RNG.integers(0, 1 << 30, size=300, dtype=np.uint64)
        draws = [RNG.choice(pool, size=2500) for _ in range(4)]
        queries = np.concatenate(
            [RNG.choice(pool, size=50), RNG.integers(0, 1 << 30, size=20,
                                                     dtype=np.uint64)]
        )
        q_hi = (queries >> np.uint64(32)).astype(np.uint32)
        q_lo = (queries & np.uint64(0xFFFFFFFF)).astype(np.uint32)

        results = []
        for key_bits in (None, 30):
            c = KmerCompactor(key_bits=key_bits)
            self._fill(c, draws)
            h_raw, nd_raw = c.hist(64, max_count=None)
            cf_raw = c.counts_for(q_hi, q_lo)
            c.compact()
            h_c, nd_c = c.hist(64, max_count=None)
            cf_c = c.counts_for(q_hi, q_lo)
            results.append((h_raw, nd_raw, cf_raw, h_c, nd_c, cf_c))
        two, one = results
        for a, b in zip(two, one):
            assert np.array_equal(np.asarray(a), np.asarray(b))
        # and against the dict oracle
        want = oracle(draws)
        assert two[1] == len(want)
        assert np.array_equal(
            two[2], np.array([want.get(int(x), 0) for x in queries])
        )


class TestModularTotals:
    """Weighted totals beyond 2^32 must not corrupt segment sums: the
    ends-diff arithmetic is exact mod 2^32 even when the global running
    sum wraps (a ~4.3 Gbp input wraps it once; production inputs many
    times)."""

    def test_wrapping_totals(self):
        big = np.uint32(1 << 30)
        keys_np = np.arange(1, 9, dtype=np.uint64) * 1000
        hi = jnp.asarray((keys_np >> np.uint64(32)).astype(np.uint32))
        lo = jnp.asarray((keys_np & np.uint64(0xFFFFFFFF)).astype(np.uint32))
        c = KmerCompactor()
        c.add_counted(u.U64(hi, lo), jnp.full(8, big, jnp.uint32))
        # total = 8 * 2^30 = 2^33: the running u32 csum wraps twice
        h, nd = c.hist(64, max_count=None)
        assert nd == 8 and h[63] == 8 and h[:63].sum() == 0
        q_hi = np.asarray(hi)
        q_lo = np.asarray(lo)
        got = c.counts_for(q_hi, q_lo)
        assert np.all(got == 1 << 30)
        # a raw run on top (mixed weighted+raw), then compaction
        raw = np.array([1000, 77777], np.uint64)
        c.add_batch(
            u.U64(
                jnp.asarray((raw >> np.uint64(32)).astype(np.uint32)),
                jnp.asarray((raw & np.uint64(0xFFFFFFFF)).astype(np.uint32)),
            ),
            jnp.ones(2, jnp.bool_),
        )
        c.compact()
        h, nd = c.hist(64, max_count=None)
        assert nd == 9
        got = c.counts_for(
            np.concatenate([q_hi, np.zeros(1, np.uint32)]),
            np.concatenate([q_lo, np.asarray([77777], np.uint32)]),
        )
        assert got[0] == (1 << 30) + 1 and np.all(got[1:8] == 1 << 30)
        assert got[8] == 1
