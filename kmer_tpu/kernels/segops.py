"""Segment operations over sorted key runs — the sort-based counting core.

Motivation (measured on TPU v5e, see BENCH notes in bench.py): XLA
gather/scatter on TPU execute at ~25ns/element (serialized), while
2-key sort runs at ~4ns/element and elementwise/cumulative ops at
<1ns/element.  A khashl-style hash table (random access per k-mer,
/root/reference/khashl.h:197-221) is therefore the wrong shape for this
hardware; counting by sort + segment reduction (the KMC/DSK approach)
is ~50x faster.  These helpers implement the segment machinery with
only sorts, scans, and one-hot matmuls — zero gathers/scatters.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from . import u64 as u

I32 = jnp.int32


def sort_keys(keys: u.U64, valid: jnp.ndarray) -> u.U64:
    """Sort keys ascending; invalid lanes become the all-ones sentinel and
    sort to the end.  64-bit order == lexicographic (hi, lo)."""
    hi = jnp.where(valid, keys.hi, jnp.uint32(0xFFFFFFFF))
    lo = jnp.where(valid, keys.lo, jnp.uint32(0xFFFFFFFF))
    hi_s, lo_s = jax.lax.sort((hi, lo), num_keys=2)
    return u.U64(hi_s, lo_s)


def sort_keys_with_payload(keys: u.U64, payload, valid, num_keys: int = 2):
    hi = jnp.where(valid, keys.hi, jnp.uint32(0xFFFFFFFF))
    lo = jnp.where(valid, keys.lo, jnp.uint32(0xFFFFFFFF))
    out = jax.lax.sort((hi, lo) + tuple(payload), num_keys=num_keys)
    return u.U64(out[0], out[1]), out[2:]


def segment_starts(keys_sorted: u.U64) -> jnp.ndarray:
    """True where a new key segment begins (position 0 or key != prev)."""
    hi, lo = keys_sorted.hi, keys_sorted.lo
    ne = (hi[1:] != hi[:-1]) | (lo[1:] != lo[:-1])
    return jnp.concatenate([jnp.ones((1,), jnp.bool_), ne])


def segment_end_lengths(starts: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """For each lane, (is_segment_end, length_of_its_segment_if_end).

    Length of a segment = end_pos - start_pos + 1, with start positions
    propagated forward by a running max (cummax) — no gathers.
    """
    n = starts.shape[0]
    pos = jnp.arange(n, dtype=I32)
    start_pos = jax.lax.cummax(jnp.where(starts, pos, I32(0)))
    is_end = jnp.concatenate([starts[1:], jnp.ones((1,), jnp.bool_)])
    length = pos - start_pos + 1
    return is_end, length


def histogram_by_matmul(bins: jnp.ndarray, mask: jnp.ndarray, n_bins: int) -> jnp.ndarray:
    """Histogram of bins[mask] (masked lanes are parked in bin 0, which
    callers never print).

    On TPU: one-hot + MXU reduction — ~8x faster than a scatter-add
    bincount there (XLA fuses the one-hot into the reduction, so the
    one-hot matrix is never materialized).  Per-call lane count must
    stay < 2^24 for exact f32 sums (callers chunk).

    On CPU (tests / fallback): the one-hot path materializes an
    n x n_bins f32 matrix (gigabytes); a scatter-add is the fast shape
    there.  The backend is static at trace time, so this is a plain
    Python branch."""
    b = jnp.where(mask, jnp.minimum(bins, n_bins - 1), 0)
    if jax.default_backend() == "tpu":
        chunk = 1 << 23
        if b.shape[0] > chunk:
            # each chunk's f32 bin sums stay < 2^24 (exact); converting
            # to i32 BEFORE the cross-chunk sum keeps a >2^24-lane bin
            # exact too (one unchunked call would silently lose counts)
            pad = (-b.shape[0]) % chunk
            if pad:
                b = jnp.concatenate([b, jnp.zeros((pad,), b.dtype)])
            hs = jax.lax.map(
                lambda bc: jnp.sum(
                    jax.nn.one_hot(bc, n_bins, dtype=jnp.float32), axis=0
                ).astype(I32),
                b.reshape(-1, chunk),
            )
            h = jnp.sum(hs, axis=0)
            # padding parked in bin 0, which callers never read
            return h
        h = jnp.sum(jax.nn.one_hot(b, n_bins, dtype=jnp.float32), axis=0)
        return h.astype(I32)
    return jnp.zeros((n_bins,), I32).at[b].add(1)


def segmented_cummin(starts: jnp.ndarray, vals: jnp.ndarray) -> jnp.ndarray:
    """Per-position running minimum since the last segment start (the
    classic segmented-scan combine, associative)."""

    def combine(a, b):
        af, av = a
        bf, bv = b
        return af | bf, jnp.where(bf, bv, jnp.minimum(av, bv))

    _, out = jax.lax.associative_scan(combine, (starts, vals))
    return out


def count_histogram(
    keys: u.U64, valid: jnp.ndarray, n_bins: int, max_count=None
) -> jnp.ndarray:
    """Histogram of per-distinct-key multiplicities in one fused pass:
    sort -> segment lengths -> one-hot histogram.  Equivalent to
    inserting every key into a count table (saturating at max_count)
    and binning the counts (print_hist, kc-c1.c:66-77)."""
    ks = sort_keys(keys, valid)
    starts = segment_starts(ks)
    is_end, length = segment_end_lengths(starts)
    # invalid lanes were mapped to the all-ones sentinel and sorted last;
    # subtract them from the final segment (any genuine all-ones keys —
    # only possible at k=32 — remain counted exactly).
    n = length.shape[0]
    n_invalid = jnp.sum((~valid).astype(I32))
    is_last = jnp.arange(n, dtype=I32) == (n - 1)
    length = jnp.where(is_last, length - n_invalid, length)
    mask = is_end & (length > 0)
    if max_count is not None:
        length = jnp.minimum(length, I32(max_count))
    return histogram_by_matmul(length, mask, n_bins)
