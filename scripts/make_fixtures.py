#!/usr/bin/env python3
"""Generate the small deterministic test fixtures in tests/fixtures/.

A 3-chromosome random genome (with N's) and ~10x coverage reads sampled
from it with 0.5% errors and random strand, so k-mer count histograms
have realistic structure (singletons from errors + a coverage peak).
"""
import gzip
import os
import random

random.seed(123)
ACGT = "ACGT"
HERE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "tests", "fixtures")


def rand_seq(n, nfrac=0.0):
    return "".join(
        "N" if random.random() < nfrac else random.choice(ACGT) for _ in range(n)
    )


def main():
    os.makedirs(HERE, exist_ok=True)
    genome = [rand_seq(8000, 0.002) for _ in range(3)]
    with gzip.open(os.path.join(HERE, "genome_small.fa.gz"), "wt") as f:
        for c, seq in enumerate(genome):
            f.write(f">chr{c+1}\n")
            for j in range(0, len(seq), 70):
                f.write(seq[j : j + 70] + "\n")
    comp = str.maketrans("ACGTN", "TGCAN")
    with gzip.open(os.path.join(HERE, "reads_small.fq.gz"), "wt") as f:
        for i in range(3000):
            chrom = random.choice(genome)
            L = random.randint(40, 150)
            pos = random.randint(0, len(chrom) - L)
            seq = list(chrom[pos : pos + L])
            for j in range(len(seq)):
                if random.random() < 0.005:
                    seq[j] = random.choice(ACGT)
            s = "".join(seq)
            if random.random() < 0.5:
                s = s.translate(comp)[::-1]
            f.write(f"@read{i}\n{s}\n+\n{'I' * L}\n")
    print("fixtures written to", HERE)


if __name__ == "__main__":
    main()
