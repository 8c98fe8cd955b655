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


def main(out=None):
    # out: alternate output directory (tests use this to regenerate
    # single fixtures without touching git-tracked ones).  A local, not
    # a module-global mutation: in-process callers must not redirect
    # later main() calls (ADVICE r2).
    here = out or HERE
    os.makedirs(here, exist_ok=True)
    genome = [rand_seq(8000, 0.002) for _ in range(3)]
    with gzip.open(os.path.join(here, "genome_small.fa.gz"), "wt") as f:
        for c, seq in enumerate(genome):
            f.write(f">chr{c+1}\n")
            for j in range(0, len(seq), 70):
                f.write(seq[j : j + 70] + "\n")
    comp = str.maketrans("ACGTN", "TGCAN")
    with gzip.open(os.path.join(here, "reads_small.fq.gz"), "wt") as f:
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
    with open(os.path.join(here, "snps_small.bed"), "w") as f:
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
    snp_rows = [line.split() for line in open(os.path.join(here, "snps_small.bed"))]

    def make_haplotypes(gt_draw):
        hap1 = [list(s) for s in genome]
        hap2 = [list(s) for s in genome]
        gts = []
        for t in snp_rows:
            c, p, alt = int(t[0][3:]) - 1, int(t[1]), t[5]
            gt = gt_draw()
            gts.append(gt)
            if gt >= 1:
                hap1[c][p] = alt
            if gt == 2:
                hap2[c][p] = alt
        return ["".join(s) for s in hap1] + ["".join(s) for s in hap2], gts

    random.seed(777)
    hapsA, gtsA = make_haplotypes(lambda: random.choice([0, 0, 1, 1, 2]))
    hapsB, gtsB = make_haplotypes(lambda: random.choice([0, 0, 1, 1, 2]))
    for tag, src, n_reads in (
        ("sampleA1", hapsA, 6000),
        ("sampleA2", hapsA, 6000),
        ("sampleB", hapsB, 6000),
    ):
        with gzip.open(os.path.join(here, f"{tag}.fq.gz"), "wt") as f:
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

    # Aligned fixture for bam-vaf-counter: reads from individual A's
    # haplotypes with known positions, coordinate-sorted SAM with CIGAR
    # variety (plain M, leading soft-clip, internal deletion).
    # tests/build_bam_fixture (htslib helper) converts SAM -> BAM + .bai.
    random.seed(4242)
    alns = []
    for i in range(8000):
        hap_i = random.randrange(len(hapsA))
        chrom_i = hap_i % len(genome)
        hap = hapsA[hap_i]
        style = random.random()
        if style < 0.8:  # 150M
            L = 150
            pos = random.randint(0, len(hap) - L)
            seq = list(hap[pos : pos + L])
            cigar = f"{L}M"
        elif style < 0.9:  # 6S144M
            L = 144
            pos = random.randint(0, len(hap) - L)
            clip = "".join(random.choice(ACGT) for _ in range(6))
            seq = list(clip) + list(hap[pos : pos + L])
            cigar = f"6S{L}M"
        else:  # 70M2D78M
            pos = random.randint(0, len(hap) - 150)
            seq = list(hap[pos : pos + 70]) + list(hap[pos + 72 : pos + 150])
            cigar = "70M2D78M"
        for j in range(len(seq)):
            if random.random() < 0.002:
                seq[j] = random.choice(ACGT)
        flag = 16 if random.random() < 0.5 else 0
        alns.append((chrom_i, pos, flag, cigar, "".join(seq), i))
    alns.sort(key=lambda a: (a[0], a[1]))
    with open(os.path.join(here, "sampleA_aln.sam"), "w") as f:
        f.write("@HD\tVN:1.6\tSO:coordinate\n")
        for ci, g in enumerate(genome):
            f.write(f"@SQ\tSN:chr{ci+1}\tLN:{len(g)}\n")
        for chrom_i, pos, flag, cigar, seq, i in alns:
            f.write(
                f"aread{i}\t{flag}\tchr{chrom_i+1}\t{pos+1}\t60\t{cigar}\t*\t0\t0\t{seq}\t{'I'*len(seq)}\n"
            )

    # VCF fixture for vcf-vaf-counter: individual A's genotypes at the
    # BED SNPs with AD/DP fields (some records AD-less to exercise the
    # DP+GT estimation path, vcf-vaf-counter.c:168-188).
    random.seed(31337)
    with open(os.path.join(here, "sampleA.vcf"), "w") as f:
        f.write("##fileformat=VCFv4.2\n")
        for ci, g in enumerate(genome):
            f.write(f"##contig=<ID=chr{ci+1},length={len(g)}>\n")
        f.write('##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">\n')
        f.write('##FORMAT=<ID=AD,Number=R,Type=Integer,Description="Allele depths">\n')
        f.write('##FORMAT=<ID=DP,Number=1,Type=Integer,Description="Depth">\n')
        f.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tsampleA\n")
        for t, gt in zip(snp_rows, gtsA):
            chrom, pos, rsid, ref, alt = t[0], int(t[1]), t[3], t[4], t[5]
            dp = random.randint(5, 40)
            if gt == 0:
                ad = (dp, 0)
                gs = "0/0"
            elif gt == 1:
                a = random.randint(dp // 3, 2 * dp // 3)
                ad = (dp - a, a)
                gs = "0/1"
            else:
                ad = (0, dp)
                gs = "1/1"
            if random.random() < 0.2:  # no AD -> DP+GT estimation path
                f.write(
                    f"{chrom}\t{pos+1}\t{rsid}\t{ref}\t{alt}\t50\tPASS\t.\tGT:DP\t{gs}:{dp}\n"
                )
            else:
                f.write(
                    f"{chrom}\t{pos+1}\t{rsid}\t{ref}\t{alt}\t50\tPASS\t.\tGT:AD:DP\t{gs}:{ad[0]},{ad[1]}:{dp}\n"
                )
    print("fixtures written to", here)


if __name__ == "__main__":
    import sys

    main(sys.argv[1] if len(sys.argv) > 1 else None)
