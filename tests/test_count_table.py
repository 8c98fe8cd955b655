"""Unit tests for the device count table against a Python dict oracle."""

import numpy as np
import jax.numpy as jnp

from kmer_tpu.kernels import u64 as u
from kmer_tpu.table import count_table as ct

RNG = np.random.default_rng(7)


def batch_from(keys_np, m=None):
    m = m or len(keys_np)
    arr = np.zeros(m, np.uint64)
    arr[: len(keys_np)] = keys_np
    valid = np.zeros(m, bool)
    valid[: len(keys_np)] = True
    return u.from_np(arr), jnp.asarray(valid)


def dict_counts(table):
    st = np.asarray(table.state)
    hi = np.asarray(table.key_hi, np.uint64)
    lo = np.asarray(table.key_lo, np.uint64)
    cnt = np.asarray(table.cnt)
    full = st == ct.FULL
    keys = (hi[full] << np.uint64(32)) | lo[full]
    return dict(zip(keys.tolist(), cnt[full].tolist()))


class TestInsert:
    def test_basic_duplicates(self):
        # heavy duplication: 5000 lanes over 300 distinct keys
        pool = RNG.integers(0, 1 << 62, size=300, dtype=np.uint64)
        draw = RNG.choice(pool, size=5000)
        keys, valid = batch_from(draw)
        t = ct.make(2048)
        t, n_new = ct.insert(t, keys, valid, max_count=None)
        want = {}
        for y in draw.tolist():
            want[y] = want.get(y, 0) + 1
        assert dict_counts(t) == want
        assert int(n_new) == len(want)
        assert int(t.n_full) == len(want)

    def test_multi_batch_and_saturation(self):
        pool = RNG.integers(0, 1 << 62, size=50, dtype=np.uint64)
        t = ct.make(256)
        want = {}
        for _ in range(4):
            draw = RNG.choice(pool, size=2000)
            keys, valid = batch_from(draw)
            t, _ = ct.insert(t, keys, valid, max_count=100)
            for y in draw.tolist():
                want[y] = min(want.get(y, 0) + 1, 100)
        assert dict_counts(t) == want

    def test_invalid_lanes_ignored(self):
        draw = RNG.integers(0, 1 << 62, size=100, dtype=np.uint64)
        keys, valid = batch_from(draw, m=256)  # 156 invalid lanes
        t = ct.make(512)
        t, _ = ct.insert(t, keys, valid, max_count=None)
        assert sum(dict_counts(t).values()) == 100

    def test_weighted_insert(self):
        ks = np.array([5, 9, 5, 11], np.uint64)
        w = jnp.asarray(np.array([2, 3, 4, 1], np.uint32))
        keys, valid = batch_from(ks)
        t = ct.make(64)
        t, _ = ct.insert(t, keys, valid, max_count=None, weights=w)
        assert dict_counts(t) == {5: 6, 9: 3, 11: 1}


class TestLookupAndPass2:
    def test_get(self):
        pool = RNG.integers(0, 1 << 62, size=100, dtype=np.uint64)
        draw = RNG.choice(pool, size=1000)
        keys, valid = batch_from(draw)
        t = ct.make(1024)
        t, _ = ct.insert(t, keys, valid, max_count=None)
        probe = np.concatenate([pool[:50], RNG.integers(0, 1 << 62, size=50, dtype=np.uint64)])
        pk, pv = batch_from(probe)
        got = np.asarray(ct.get(t, pk, pv))
        want = {}
        for y in draw.tolist():
            want[y] = want.get(y, 0) + 1
        for i, y in enumerate(probe.tolist()):
            assert got[i] == want.get(y, -1)

    def test_clear_and_add_existing(self):
        pool = RNG.integers(0, 1 << 62, size=60, dtype=np.uint64)
        draw = RNG.choice(pool, size=600)
        keys, valid = batch_from(draw)
        t = ct.make(512)
        t, _ = ct.insert(t, keys, valid, max_count=1023)
        t = ct.clear_counts(t)
        assert all(v == 0 for v in dict_counts(t).values())
        # pass 2: re-count only existing keys; novel keys must be ignored
        novel = RNG.integers(0, 1 << 62, size=100, dtype=np.uint64)
        both = np.concatenate([draw, novel])
        k2, v2 = batch_from(both)
        t = ct.add_existing(t, k2, v2, max_count=1023)
        want = {}
        for y in draw.tolist():
            want[y] = want.get(y, 0) + 1
        assert dict_counts(t) == want


class TestHistAndRebuild:
    def test_hist(self):
        ks = np.arange(1, 21, dtype=np.uint64)
        reps = np.repeat(ks, np.arange(1, 21))  # key i appears i times
        keys, valid = batch_from(reps)
        t = ct.make(256)
        t, _ = ct.insert(t, keys, valid, max_count=None)
        h = np.asarray(ct.hist(t, 16))
        want = np.zeros(16, int)
        for c in range(1, 21):
            want[min(c, 15)] += 1
        assert np.array_equal(h, want)

    def test_rebuild_shrink(self):
        ks = np.arange(1, 21, dtype=np.uint64)
        reps = np.repeat(ks, np.arange(1, 21))
        keys, valid = batch_from(reps)
        t = ct.make(128)
        t, _ = ct.insert(t, keys, valid, max_count=None)
        t2 = ct.rebuild(t, 256, min_count=5, max_count=15)
        got = dict_counts(t2)
        assert got == {int(i): int(i) for i in range(5, 16)}
        assert int(t2.n_full) == 11


class TestBloomSequential:
    def test_insert_sequential_matches_lane_by_lane_oracle(self):
        """insert_sequential must reproduce the reference's sequential
        test-and-set (yak_bf_insert lane order) exactly; the batched
        insert provably diverges on the same collision-heavy input."""
        from kmer_tpu.kernels import bloom

        spec = bloom.BloomSpec(pre=0, n_shift=9, n_hashes=4)  # ONE block
        rng = np.random.default_rng(42)
        n = 3000
        raw = rng.integers(0, 1 << 62, n, dtype=np.uint64)
        keys = u.U64(
            jnp.asarray((raw >> np.uint64(32)).astype(np.uint32)),
            jnp.asarray((raw & np.uint64(0xFFFFFFFF)).astype(np.uint32)),
        )
        valid = np.ones(n, bool)
        valid[rng.integers(0, n, 50)] = False
        validj = jnp.asarray(valid)

        idxs = [np.asarray(ix) for ix in bloom._probe_indices(keys, spec)]
        bits0 = bloom.make_bits(spec)

        # lane-by-lane oracle
        ob = np.zeros(bits0.shape[0], np.uint8)
        want = np.zeros(n, bool)
        for i in range(n):
            if not valid[i]:
                continue
            probes = [int(ix[i]) for ix in idxs]
            want[i] = all(ob[p] == 1 for p in probes)
            for p in probes:
                ob[p] = 1

        sb, sp = bloom.insert_sequential(bits0, keys, validj, spec)
        assert np.array_equal(np.asarray(sp), want)
        assert np.array_equal(np.asarray(sb), ob)
        # the batched preset must differ somewhere here, or this test
        # has no teeth (one 512-bit block, 4 probes x ~3k keys)
        _, bp = bloom.insert(bloom.make_bits(spec), keys, validj, spec)
        assert not np.array_equal(np.asarray(bp), want)
