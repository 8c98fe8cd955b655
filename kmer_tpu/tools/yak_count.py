"""yak-count CLI — reference parity with /root/reference/yak-count.c:468-507."""

from __future__ import annotations

import sys

from ..pipeline.yak import (
    YAK_COUNTER_BITS,
    YAK_MAX_COUNT,
    YAK_N_COUNTS,
    make_yak_engine,
    yak_count_file,
)
from ..utils.cli import c_atoi, ketopt


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    k, pre, chunk, n_thread, bf_shift, bf_n_hash = 31, 10, 10_000_000, 4, 0, 4
    opts, pos = ketopt(argv, "k:p:K:t:b:H:")
    for c, a in opts:
        if c == "k":
            k = c_atoi(a)
        elif c == "p":
            pre = c_atoi(a)
        elif c == "K":
            chunk = c_atoi(a)
        elif c == "t":
            n_thread = c_atoi(a)
        elif c == "b":
            bf_shift = c_atoi(a)
        elif c == "H":
            bf_n_hash = c_atoi(a)
    if len(pos) < 1:
        e = sys.stderr
        e.write("Usage: yak-count [options] <in.fa> [in.fa]\n")
        e.write("Options:\n")
        e.write(f"  -k INT     k-mer size [{k}]\n")
        e.write(f"  -p INT     prefix length [{pre}]\n")
        e.write(
            f"  -b INT     set Bloom filter size to 2**INT bits; 0 to disable [{bf_shift}]\n"
        )
        e.write(f"  -H INT     use INT hash functions for Bloom filter [{bf_n_hash}]\n")
        e.write(f"  -t INT     number of worker threads [{n_thread}]\n")
        e.write("  -K INT     chunk size [100m]\n")
        e.write("Note: -b37 is recommended for human reads\n")
        return 1
    if k < 1 or k > 32:
        sys.stderr.write("ERROR: -k must be between 1 and 32\n")
        return 1
    if pre < YAK_COUNTER_BITS:
        sys.stderr.write(f"ERROR: -p should be at least {YAK_COUNTER_BITS}\n")
        return 1

    fn2 = pos[1] if len(pos) >= 2 else pos[0]
    if fn2 == pos[0]:
        # Sort-engine fast path.  With fn2 == fn1 the bloom-filtered
        # two-pass result is provably {key: count >= 2} with exact
        # saturated counts (pass 2 recounts exactly and shrink drops
        # bloom-FP singletons, yak-count.c:453-464), so a single
        # counting pass with a min-count filter reproduces it
        # bit-identically — and reads the input once instead of twice.
        #
        # stderr parity (yak-count.c:427 prints "[M] processed N
        # sequences; M distinct..." per pipeline batch per pass, pass-1
        # totals including bloom-FP admissions): on a single device the
        # bloom + gated-table admission simulation rides the SAME
        # extracted planes as a tap, pass-2 lines replay the remembered
        # batch sequence counts with the constant pre-shrink total (the
        # reference's pass 2 never inserts, yak-count.c:170-174), and
        # the histogram still comes from the sort engine.
        # KMER_TPU_FAST_YAK=1 skips the simulation (identical stdout;
        # one approximate summary line on stderr), as do mesh /
        # multi-process runs, whose batch composition is
        # device-partitioned (PARITY.md divergence 8 scope).
        import os

        import jax

        from ..pipeline.counter import make_count_engine, use_mesh

        def log(n_seqs, tot):
            sys.stderr.write(
                f"[M] processed {n_seqs} sequences; {tot} distinct k-mers in the hash table\n"
            )

        fast = os.environ.get("KMER_TPU_FAST_YAK", "").strip().lower() in (
            "1", "true", "on", "yes")
        mesh_like = jax.process_count() > 1 or use_mesh()
        eng_s = make_count_engine(k=k, block_bases=chunk,
                                  qual_policy=("resume", k, 3))
        sim = None
        if not fast and not mesh_like:
            from ..pipeline.yak import YakSimTap

            sim = YakSimTap(k=k, pre=pre, bf_shift=bf_shift,
                            bf_n_hash=bf_n_hash, chunk_size=chunk, log=log)
            sim.begin_batches()
        try:
            if sim is not None:
                eng_s.count_paths([pos[0]], tap=sim.ingest_planes)
            else:
                eng_s.count_paths([pos[0]])
        except OSError:
            # the C original segfaults here (kseq on a NULL gzFile);
            # failing cleanly is a deliberate divergence (PARITY.md)
            sys.stderr.write(f"Error: failed to open {pos[0]}\n")
            return 1
        min_keep = 2 if bf_shift > 0 else 1
        if sim is not None:
            sim.finish_batches()
            if bf_shift > 0:
                # pass 2 re-reads the same file: identical batches,
                # no inserts — every line repeats the pass-1 total
                for n in sim.batch_seq_counts:
                    log(n, sim.tot)
        h = eng_s.hist(YAK_N_COUNTS, max_count=YAK_MAX_COUNT, min_keep=min_keep)
        tot = eng_s._n_distinct
        if sim is None:
            log(eng_s.total_seqs, tot)
    else:
        # two-file mode (pass 2 counts fn2 against fn1's bloom-gated key
        # set): the bloom's false positives are observable here, so run
        # the faithful bloom + hash-table engine.
        def log(n_seqs, tot):
            sys.stderr.write(
                f"[M] processed {n_seqs} sequences; {tot} distinct k-mers in the hash table\n"
            )

        eng = make_yak_engine(
            k=k, pre=pre, bf_shift=bf_shift, bf_n_hash=bf_n_hash,
            chunk_size=chunk, log=log,
        )
        try:
            yak_count_file(pos[0], fn2, eng)
        except OSError as exc:
            # clean failure instead of the C original's segfault (PARITY.md)
            fn = exc.filename if getattr(exc, "filename", None) else pos[0]
            sys.stderr.write(f"Error: failed to open {fn}\n")
            return 1
        tot = eng.tot
        h = eng.hist()
    sys.stderr.write(f"[M::main] {tot} distinct k-mers after shrinking\n")
    from ..utils.log import is_primary

    if not is_primary():
        return 0
    out = []
    for i in range(1, YAK_N_COUNTS):
        out.append(f"{i}\t{h[i]}")
    sys.stdout.write("\n".join(out) + "\n")
    return 0
