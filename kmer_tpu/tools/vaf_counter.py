"""vaf-counter — count SNP pattern k-mers in FASTQ reads, emit VAF file.

Reference parity with /root/reference/vaf-counter.c:584-738: loads the
8-column pattern file, builds a combined canonical-k-mer ->
(pattern_idx<<1|is_alt) map, streams FASTQ blocks extracting canonical
k-mers, looks each up and accumulates per-SNP ref/alt counts, then
writes the VAF file (depth header + %.4f VAF rows) and optional -v
performance report.

TPU mapping: the pattern map is a device-resident static table; the
lookup + scatter-add of the whole block happens in one fused jit step
(the analog of worker_lookup's atomic increments, vaf-counter.c:449-479
— duplicates combine in the scatter-add, no atomics needed).
"""

from __future__ import annotations

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..io.formats import read_patterns, write_vaf_file
from ..kernels import segops
from ..kernels import u64 as u
from ..pipeline.counter import _extract_step, _iter_packed, _prefetch
from ..utils.cli import ketopt
from ..utils.log import minfo, verbose, warn
from ..utils.seq import canonical_kmer, encode_kmer, hash64_np


_SENT = jnp.uint32(0xFFFFFFFF)


@partial(jax.jit, donate_argnums=(0,))
def _vaf_step(counts, phi, plo, pval, rhi, rlo):
    """Sort-join block step: pattern k-mers and read k-mers are sorted
    together by key (patterns first within a key via a 3rd sort key);
    each read lane picks up its segment's minimum pattern value
    (min == first-inserted-wins on canonical collisions, matching
    create_combined_kmer_map's absent-only insert, vaf-counter.c:224-243)
    and the per-pattern ref/alt counts accumulate with one scatter-add.

    Replaces worker_lookup's hash probe + atomic increments
    (vaf-counter.c:449-479) with sort + segmented scan: measured ~6x
    faster than gather-probing on TPU (random access serializes).

    rhi/rlo: sentinelized hash64 planes from pipeline.counter._extract_step
    (the Pallas extraction on TPU; keeping extraction in its own program
    also keeps this one small — the fused version took minutes to
    compile at 8M-lane shapes)."""
    p = phi.shape[0]
    m = rhi.shape[0]
    m_hi = jnp.concatenate([phi, rhi])
    m_lo = jnp.concatenate([plo, rlo])
    origin = jnp.concatenate([jnp.zeros((p,), jnp.uint32), jnp.ones((m,), jnp.uint32)])
    val = jnp.concatenate([pval, jnp.full((m,), _SENT, jnp.uint32)])
    s_hi, s_lo, s_org, s_val = jax.lax.sort((m_hi, m_lo, origin, val), num_keys=3)
    starts = segops.segment_starts(u.U64(s_hi, s_lo))
    seg_val = segops.segmented_cummin(starts, s_val)
    hit = (s_org == 1) & (seg_val != _SENT)
    n2 = counts.shape[0]
    idx = jnp.where(hit, seg_val.astype(jnp.int32), n2)
    counts = counts.at[idx].add(1, mode="drop")
    return counts


def create_combined_kmer_map(patterns, k: int):
    """vaf-counter.c:198-252 — canonical ref/alt k-mers -> packed value.

    Returns sentinel-padded device arrays (key_hi, key_lo, value) for the
    sort-join step, plus the map entry count."""
    seen = {}
    n_collisions = 0
    mask = (1 << (2 * k)) - 1
    for i, p in enumerate(patterns):
        for kmer_str, flag in ((p.ref_kmer, 0), (p.alt_kmer, 1)):
            enc = encode_kmer(kmer_str.encode(), k)
            if enc < 0:
                continue
            can = canonical_kmer(enc, k)
            if can in seen:
                n_collisions += 1  # first value wins (absent-only insert)
            else:
                seen[can] = (i << 1) | flag
    if n_collisions > 0:
        warn(
            "create_combined_kmer_map",
            f"Warning: {n_collisions} k-mer collisions detected. "
            "Some patterns may have overlapping k-mers.",
        )
    n = len(seen)
    size = max(256, 1 << int(np.ceil(np.log2(max(n, 1)))))
    khash = hash64_np(np.fromiter(seen.keys(), np.uint64, n), mask)
    phi = np.full(size, 0xFFFFFFFF, np.uint32)
    plo = np.full(size, 0xFFFFFFFF, np.uint32)
    pval = np.full(size, 0xFFFFFFFF, np.uint32)
    phi[:n] = (khash >> np.uint64(32)).astype(np.uint32)
    plo[:n] = (khash & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    pval[:n] = np.fromiter(seen.values(), np.uint32, n)
    return jnp.asarray(phi), jnp.asarray(plo), jnp.asarray(pval), n


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    k, n_thread, block_size = 21, 4, 10_000_000
    pattern_fn = out_fn = None
    verbose_mode = False
    opts, pos = ketopt(argv, "k:p:o:t:b:v")
    for c, a in opts:
        if c == "k":
            k = int(a)
        elif c == "p":
            pattern_fn = a
        elif c == "o":
            out_fn = a
        elif c == "t":
            n_thread = int(a)
        elif c == "b":
            block_size = int(a)
        elif c == "v":
            verbose_mode = True
    if not pattern_fn or not out_fn or len(pos) < 1:
        e = sys.stderr
        e.write(
            "Usage: vaf-counter [options] -p <patterns.txt> -o <output.vaf> <reads.fq> [reads2.fq ...]\n"
        )
        e.write("Options:\n")
        e.write(f"  -k INT    k-mer length [{k}]\n")
        e.write("  -p FILE   input pattern file\n")
        e.write("  -o FILE   output VAF file\n")
        e.write(f"  -t INT    number of threads [{n_thread}]\n")
        e.write(f"  -b INT    block size [{block_size}]\n")
        e.write("  -v        verbose mode (report performance statistics)\n")
        return 1

    t_start = time.time()
    minfo("main", "Loading patterns...")
    t0 = time.time()
    patterns = read_patterns(pattern_fn)
    time_pattern_load = time.time() - t0
    minfo("main", f"Loaded {len(patterns)} patterns in {time_pattern_load:.3f} sec")

    minfo("main", "Creating k-mer map...")
    t0 = time.time()
    phi, plo, pval, n_entries = create_combined_kmer_map(patterns, k)
    time_map_create = time.time() - t0
    if verbose_mode:
        verbose(
            "create_combined_kmer_map",
            f"Created k-mer map with {n_entries} entries in {time_map_create:.3f} sec",
        )

    minfo("main", f"Counting k-mers in FASTQ files with {n_thread} threads...")
    t0 = time.time()
    counts = jnp.zeros((2 * len(patterns),), jnp.uint32)
    total_bases = total_seqs = total_kmers = 0
    capacity = block_size + 4096
    for fn in pos:
        minfo("main", f"Processing {fn}...")
        t_file = time.time()
        file_bases = file_seqs = 0
        it = _prefetch(_iter_packed([fn], k, block_size, capacity))
        for buf, n_bases, n_seqs in it:
            rhi, rlo, n_kmers = _extract_step(jnp.asarray(buf), k)
            counts = _vaf_step(counts, phi, plo, pval, rhi, rlo)
            file_bases += int(n_bases) - int(n_seqs)
            file_seqs += n_seqs
            total_kmers += int(n_kmers)
        total_bases += file_bases
        total_seqs += file_seqs
        if verbose_mode:
            el = time.time() - t_file
            verbose(
                "count_fastq_kmers",
                f"Processed {fn}: {file_seqs} sequences, {file_bases} bases in "
                f"{el:.2f} sec ({file_bases / el / 1e6:.2f} Mbases/sec)",
            )
    time_counting = time.time() - t0

    counts_np = np.asarray(counts)
    for i, p in enumerate(patterns):
        p.ref_count = int(counts_np[2 * i])
        p.alt_count = int(counts_np[2 * i + 1])

    minfo("main", "Writing VAF file...")
    t0 = time.time()
    avg_depth = write_vaf_file(out_fn, patterns)
    time_write = time.time() - t0
    minfo("main", f"Done. Average depth: {avg_depth:.2f}")

    if verbose_mode:
        total_time = time.time() - t_start
        e = sys.stderr
        e.write("\n=== Performance Statistics ===\n")
        e.write(f"Total runtime:           {total_time:.3f} sec\n")
        e.write(
            f"  Pattern loading:       {time_pattern_load:.3f} sec ({100.0 * time_pattern_load / total_time:.1f}%)\n"
        )
        e.write(
            f"  K-mer map creation:    {time_map_create:.3f} sec ({100.0 * time_map_create / total_time:.1f}%)\n"
        )
        e.write(
            f"  K-mer counting:        {time_counting:.3f} sec ({100.0 * time_counting / total_time:.1f}%)\n"
        )
        e.write(
            f"  Output writing:        {time_write:.3f} sec ({100.0 * time_write / total_time:.1f}%)\n"
        )
        e.write("\nThroughput:\n")
        e.write(f"  Sequences processed:   {total_seqs}\n")
        e.write(
            f"  Bases processed:       {total_bases} ({total_bases / 1e6:.2f} Mbases)\n"
        )
        e.write(
            f"  K-mers extracted:      {total_kmers} ({total_kmers / 1e6:.2f} million)\n"
        )
        if time_counting > 0:
            e.write(
                f"  Speed:                 {total_bases / time_counting / 1e6:.2f} Mbases/sec\n"
            )
            e.write(
                f"  K-mer throughput:      {total_kmers / time_counting / 1e6:.2f} million k-mers/sec\n"
            )
        e.write("\nMemory:\n")
        e.write(f"  Patterns:              {len(patterns)}\n")
        e.write(f"  Pattern map entries:   {n_entries}\n")
        e.write(f"  Pattern map capacity:  {phi.shape[0]}\n")
        e.write("\nOptimizations:\n")
        e.write(f"  Device:                {jax.devices()[0].device_kind}\n")
        e.write(f"  Threads:               {n_thread} workers\n")
        e.write("==============================\n")
    return 0
