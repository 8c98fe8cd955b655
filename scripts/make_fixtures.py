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
    # SNP BED over the small genome: ref base from the genome, random alt
    with open(os.path.join(HERE, "snps_small.bed"), "w") as f:
        for i in range(400):
            c = random.randrange(len(genome))
            pos = random.randint(30, len(genome[c]) - 30)
            ref = genome[c][pos]
            if ref == "N":
                continue
            alt = random.choice([b for b in ACGT if b != ref])
            f.write(f"chr{c+1}\t{pos}\t{pos+1}\trs{i}\t{ref}\t{alt}\n")
    # Read samples for the identity pipeline: two individuals with diploid
    # genotypes at the SNPs (0/0, 0/1, 1/1), sample A sequenced twice.
    # A1 vs A2 should correlate highly (same genotypes); B should not.
    snp_rows = [line.split() for line in open(os.path.join(HERE, "snps_small.bed"))]

    def make_haplotypes(gt_draw):
        hap1 = [list(s) for s in genome]
        hap2 = [list(s) for s in genome]
        for t in snp_rows:
            c, p, alt = int(t[0][3:]) - 1, int(t[1]), t[5]
            gt = gt_draw()
            if gt >= 1:
                hap1[c][p] = alt
            if gt == 2:
                hap2[c][p] = alt
        return ["".join(s) for s in hap1] + ["".join(s) for s in hap2]

    random.seed(777)
    hapsA = make_haplotypes(lambda: random.choice([0, 0, 1, 1, 2]))
    hapsB = make_haplotypes(lambda: random.choice([0, 0, 1, 1, 2]))
    for tag, src, n_reads in (
        ("sampleA1", hapsA, 6000),
        ("sampleA2", hapsA, 6000),
        ("sampleB", hapsB, 6000),
    ):
        with gzip.open(os.path.join(HERE, f"{tag}.fq.gz"), "wt") as f:
            for i in range(n_reads):
                chrom = random.choice(src)
                L = random.randint(80, 150)
                pos = random.randint(0, len(chrom) - L)
                seq = list(chrom[pos : pos + L])
                for j in range(len(seq)):
                    if random.random() < 0.002:
                        seq[j] = random.choice(ACGT)
                s = "".join(seq)
                if random.random() < 0.5:
                    s = s.translate(comp)[::-1]
                f.write(f"@{tag}_{i}\n{s}\n+\n{'I' * L}\n")
    print("fixtures written to", HERE)


if __name__ == "__main__":
    main()
