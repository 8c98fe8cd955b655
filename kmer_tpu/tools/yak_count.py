"""yak-count CLI — reference parity with /root/reference/yak-count.c:468-507."""

from __future__ import annotations

import sys

from ..pipeline.yak import YAK_COUNTER_BITS, YAK_N_COUNTS, YakEngine, yak_count_file
from ..utils.cli import ketopt


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    k, pre, chunk, n_thread, bf_shift, bf_n_hash = 31, 10, 10_000_000, 4, 0, 4
    opts, pos = ketopt(argv, "k:p:K:t:b:H:")
    for c, a in opts:
        if c == "k":
            k = int(a)
        elif c == "p":
            pre = int(a)
        elif c == "K":
            chunk = int(a)
        elif c == "t":
            n_thread = int(a)
        elif c == "b":
            bf_shift = int(a)
        elif c == "H":
            bf_n_hash = int(a)
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
    if pre < YAK_COUNTER_BITS:
        sys.stderr.write(f"ERROR: -p should be at least {YAK_COUNTER_BITS}\n")
        return 1

    def log(n_seqs, tot):
        sys.stderr.write(
            f"[M] processed {n_seqs} sequences; {tot} distinct k-mers in the hash table\n"
        )

    eng = YakEngine(
        k=k, pre=pre, bf_shift=bf_shift, bf_n_hash=bf_n_hash, chunk_size=chunk,
        log=log,
    )
    fn2 = pos[1] if len(pos) >= 2 else pos[0]
    yak_count_file(pos[0], fn2, eng)
    sys.stderr.write(
        f"[M::main] {eng.tot} distinct k-mers after shrinking\n"
    )
    h = eng.hist()
    out = []
    for i in range(1, YAK_N_COUNTS):
        out.append(f"{i}\t{h[i]}")
    sys.stdout.write("\n".join(out) + "\n")
    return 0
