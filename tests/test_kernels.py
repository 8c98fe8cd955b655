"""Unit tests for the u64 / encode / hash64 / k-mer extraction kernels."""

import numpy as np
import pytest

import jax.numpy as jnp

from kmer_tpu.kernels import encode, hash64, kmer, u64 as u
from tests import ref_np

RNG = np.random.default_rng(42)


def rand_u64(n):
    return RNG.integers(0, 1 << 64, size=n, dtype=np.uint64)


class TestU64:
    def test_roundtrip(self):
        a = rand_u64(1000)
        assert np.array_equal(u.to_np(u.from_np(a)), a)

    def test_add_sub(self):
        a, b = rand_u64(1000), rand_u64(1000)
        assert np.array_equal(u.to_np(u.add(u.from_np(a), u.from_np(b))), a + b)
        assert np.array_equal(u.to_np(u.sub(u.from_np(a), u.from_np(b))), a - b)

    @pytest.mark.parametrize("s", [0, 1, 2, 21, 24, 28, 31, 32, 33, 47, 63])
    def test_shifts(self, s):
        a = rand_u64(500)
        assert np.array_equal(u.to_np(u.shl(u.from_np(a), s)), a << np.uint64(s))
        assert np.array_equal(u.to_np(u.shr(u.from_np(a), s)), a >> np.uint64(s))

    def test_bitwise_cmp(self):
        a, b = rand_u64(1000), rand_u64(1000)
        A, B = u.from_np(a), u.from_np(b)
        assert np.array_equal(u.to_np(u.xor(A, B)), a ^ b)
        assert np.array_equal(u.to_np(u.and_(A, B)), a & b)
        assert np.array_equal(u.to_np(u.or_(A, B)), a | b)
        assert np.array_equal(u.to_np(u.not_(A)), ~a)
        assert np.array_equal(np.asarray(u.lt(A, B)), a < b)
        assert np.array_equal(np.asarray(u.eq(A, A)), np.ones(1000, bool))
        assert np.array_equal(u.to_np(u.min_(A, B)), np.minimum(a, b))


class TestEncode:
    def test_matches_nt4_table(self):
        ascii_all = np.arange(256, dtype=np.uint8)
        got = np.asarray(encode.encode_bases(jnp.asarray(ascii_all)))
        assert np.array_equal(got, ref_np.NT4)


class TestHash64:
    @pytest.mark.parametrize("k", [1, 5, 15, 16, 17, 21, 31, 32])
    def test_hash64_vs_numpy(self, k):
        bits = 2 * k
        keys = rand_u64(2000) & np.uint64((1 << bits) - 1 if bits < 64 else 0xFFFFFFFFFFFFFFFF)
        got = u.to_np(hash64.hash64(u.from_np(keys), bits))
        want = ref_np.hash64_np(keys, (1 << bits) - 1)
        assert np.array_equal(got, want)


def random_seq(n, n_frac=0.02):
    bases = RNG.choice(list(b"ACGTacgtN"), size=n, p=[0.23, 0.23, 0.23, 0.23, 0.01, 0.01, 0.01, 0.01, 0.04])
    return bytes(bases.tolist())


class TestExtract:
    @pytest.mark.parametrize("k", [3, 15, 16, 17, 21, 31])
    @pytest.mark.parametrize("do_hash", [False, True])
    def test_vs_rolling(self, k, do_hash):
        seq = random_seq(3000)
        codes = encode.encode_bases(jnp.asarray(np.frombuffer(seq, np.uint8)))
        out = kmer.extract_canonical(codes, k, apply_hash64=do_hash)
        valid = np.asarray(out.valid)
        got = {
            (i, int(y))
            for i, y in zip(np.nonzero(valid)[0], u.to_np(out.kmer)[valid])
        }
        want = set(ref_np.rolling_kmers(seq, k, do_hash))
        assert got == want

    def test_flat_packing_equals_per_read(self):
        """Packing reads with an invalid separator yields the union multiset."""
        k = 21
        reads = [random_seq(RNG.integers(k, 200)) for _ in range(50)]
        flat = b"\x00".join(reads)
        codes = encode.encode_bases(jnp.asarray(np.frombuffer(flat, np.uint8)))
        out = kmer.extract_canonical(codes, k, apply_hash64=True)
        valid = np.asarray(out.valid)
        got = sorted(u.to_np(out.kmer)[valid].tolist())
        want = []
        for r in reads:
            want += [y for _, y in ref_np.rolling_kmers(r, k, True)]
        assert got == sorted(want)
