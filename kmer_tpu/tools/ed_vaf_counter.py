"""ed-vaf-counter — VAF by approximate pattern search in reads.

Reference parity with /root/reference/ed-vaf-counter.c:156-236: for
every read x every pattern, count optimal end locations of the ref and
alt k-mers within edit distance -e (edlib HW/LOC semantics), then emit
the standard VAF file.

The O(reads x patterns x read_len) search runs as the Myers bit-vector
kernel on TPU (kmer_tpu.kernels.myers), batched over reads; the
reference is single-threaded edlib (ed-vaf-counter.c:137-150).
"""

from __future__ import annotations

import sys

import numpy as np

import jax.numpy as jnp

from ..io.fastx import FastxReader
from ..io.formats import read_patterns, write_vaf_file
from ..kernels.encode import SEQ_NT4_NP
from ..kernels.myers import build_peq, myers_hw_counts
from ..utils.cli import c_atoi, ketopt
from ..utils.log import minfo

READ_BATCH = 256
MAX_LEN = 1024  # reads longer than this are processed in slabs


def _encode(seq: bytes) -> np.ndarray:
    return SEQ_NT4_NP[np.frombuffer(seq, np.uint8)]


def _openable(fn) -> bool:
    if fn == "-":
        return True
    try:
        open(fn, "rb").close()
        return True
    except OSError:
        return False


def count_fastq(fn, patterns, max_e, totals):
    """Accumulate per-pattern (ref, alt) counts over all reads in fn."""
    if not _openable(fn):
        # ed-vaf-counter.c:130
        sys.stderr.write(f"Warning: failed to open {fn}\n")
        return
    # pattern kmers -> code matrix (2P, Lp)
    kmers = []
    for p in patterns:
        kmers.append(p.ref_kmer.encode())
        kmers.append(p.alt_kmer.encode())
    lp = max((len(x) for x in kmers), default=1)
    pc = np.full((len(kmers), lp), 255, np.uint8)
    plen = np.zeros(len(kmers), np.int32)
    for i, x in enumerate(kmers):
        pc[i, : len(x)] = _encode(x)
        plen[i] = len(x)
    # pad pattern axis to a lane multiple
    P = len(kmers)
    Ppad = max(128, ((P + 127) // 128) * 128)
    pc = np.vstack([pc, np.full((Ppad - P, lp), 255, np.uint8)])
    plen_pad = np.concatenate([plen, np.full(Ppad - P, lp, np.int32)])
    peq = build_peq(jnp.asarray(pc), jnp.asarray(plen_pad))
    plen_j = jnp.asarray(plen_pad)

    acc = jnp.zeros((Ppad,), jnp.int32)
    batch = np.zeros((READ_BATCH, MAX_LEN), np.uint8)
    batch[:] = 255
    lens = np.zeros(READ_BATCH, np.int32)
    nb = 0

    def flush(nb, acc):
        if nb == 0:
            return acc
        # .copy(): the CPU backend may zero-copy alias numpy buffers into
        # device arrays, and `batch`/`lens` are mutated in place for the
        # next reads while this flush is still in flight
        counts = myers_hw_counts(
            peq, plen_j, jnp.asarray(batch.copy()), jnp.asarray(lens.copy()), max_e
        )
        return acc + jnp.sum(counts, axis=0, dtype=jnp.int32)

    for _name, seq in FastxReader(fn):
        L = len(seq)
        if L > MAX_LEN:
            seq = seq[:MAX_LEN]  # extremely long reads truncated (see docstring)
            L = MAX_LEN
        batch[nb, :L] = _encode(seq)
        batch[nb, L:] = 255
        lens[nb] = L
        nb += 1
        if nb == READ_BATCH:
            acc = flush(nb, acc)
            nb = 0
            lens[:] = 0
    acc = flush(nb, acc)
    acc_np = np.asarray(acc)
    for i in range(len(patterns)):
        totals[i][0] += int(acc_np[2 * i])
        totals[i][1] += int(acc_np[2 * i + 1])


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    max_e = 0
    pattern_fn = out_fn = None
    opts, pos = ketopt(argv, "p:o:e:")
    for c, a in opts:
        if c == "p":
            pattern_fn = a
        elif c == "o":
            out_fn = a
        elif c == "e":
            max_e = c_atoi(a)
    if not pattern_fn or not out_fn or len(pos) < 1:
        e = sys.stderr
        e.write(
            "Usage: ed-vaf-counter [options] -p <patterns.txt> -o <output.vaf> <reads.fq> [reads2.fq ...]\n"
        )
        e.write("Options:\n")
        e.write("  -p FILE   input pattern file\n")
        e.write("  -o FILE   output VAF file\n")
        e.write(
            f"  -e INT    maximum edit distance for approximate matching [{max_e}]\n"
        )
        e.write("\nDescription:\n")
        e.write("  This program uses edlib to search for pattern k-mers in FASTQ reads.\n")
        e.write("  Unlike vaf-counter which extracts all k-mers from reads and looks them up,\n")
        e.write("  ed-vaf-counter searches for each pattern k-mer in the reads using approximate\n")
        e.write("  string matching. This can be more efficient for small pattern sets.\n")
        e.write("  Set -e 0 for exact matches only (default), or higher values to allow mismatches.\n")
        return 1

    minfo("main", "Loading patterns...")
    try:
        patterns = read_patterns(pattern_fn)
    except OSError:
        sys.stderr.write("Error: failed to load pattern file\n")
        return 1
    minfo("main", f"Loaded {len(patterns)} patterns")

    minfo(
        "main",
        f"Searching for k-mers in FASTQ files (max edit distance: {max_e})...",
    )
    totals = [[0, 0] for _ in patterns]
    for fn in pos:
        minfo("main", f"Processing {fn}...")
        count_fastq(fn, patterns, max_e, totals)

    for i, p in enumerate(patterns):
        p.ref_count, p.alt_count = totals[i]

    minfo("main", "Writing VAF file...")
    avg_depth = write_vaf_file(out_fn, patterns)
    minfo("main", f"Done. Average depth: {avg_depth:.2f}")
    return 0
