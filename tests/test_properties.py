"""Property tests (SURVEY.md §4b): implementation-variant invariance and
algebraic identities, over randomized inputs via hypothesis.

The reference's implicit methodology is "run two counters on the same
input and diff the histograms" (README.md:216-222 of the reference);
here the two independent engines — the sort-based compactor and the
open-addressing device hash table — must agree on every histogram, and
the 2-bit encode/revcomp/canonical primitives must satisfy their
algebra."""

import numpy as np
from hypothesis import given, settings, strategies as st

import jax.numpy as jnp

from kmer_tpu.kernels.encode import encode_bases
from kmer_tpu.kernels.kmer import extract_canonical
from kmer_tpu.pipeline.counter import _extract_step
from kmer_tpu.table import count_table as ct
from kmer_tpu.table.compactor import KmerCompactor
from kmer_tpu.utils.seq import canonical_kmer, encode_kmer, revcomp_kmer

CAP = 1 << 16  # fixed device shape -> one jit compile across examples


def _pack(seqs):
    buf = np.zeros(CAP, np.uint8)
    pos = 0
    for s in seqs:
        buf[pos : pos + len(s)] = np.frombuffer(s, np.uint8)
        pos += len(s) + 1
    return buf, pos


seq_strategy = st.lists(
    st.text(alphabet="ACGTNacgt", min_size=1, max_size=200).map(
        lambda s: s.encode()
    ),
    min_size=1,
    max_size=40,
)


@settings(max_examples=15, deadline=None)
@given(seqs=seq_strategy, k=st.sampled_from([3, 16, 21, 31]))
def test_engines_agree(seqs, k):
    """Sort-based compactor vs device hash table on the same input."""
    buf, _ = _pack(seqs)
    hi, lo, nk = _extract_step(jnp.asarray(buf), k)

    comp = KmerCompactor()
    comp.add_raw(hi, lo)
    h_sort, nd_sort = comp.hist(256, max_count=None)

    codes = encode_bases(jnp.asarray(buf))
    out = extract_canonical(codes, k, apply_hash64=True)
    t = ct.make(1 << 12)
    t, _n = ct.insert(t, out.kmer, out.valid, None)
    h_tab = np.asarray(ct.hist(t, 256))
    assert int(nk) == int(jnp.sum(out.valid))
    assert np.array_equal(h_sort, h_tab.astype(h_sort.dtype))
    assert nd_sort == int(t.n_full)


@settings(max_examples=50, deadline=None)
@given(
    kmer=st.text(alphabet="ACGT", min_size=1, max_size=32).map(
        lambda s: s.encode()
    )
)
def test_revcomp_involution_and_canonical(kmer):
    k = len(kmer)
    enc = encode_kmer(kmer, k)
    assert enc >= 0
    assert revcomp_kmer(revcomp_kmer(enc, k), k) == enc
    can = canonical_kmer(enc, k)
    assert can == min(enc, revcomp_kmer(enc, k))
    # canonical is strand-invariant
    assert canonical_kmer(revcomp_kmer(enc, k), k) == can
