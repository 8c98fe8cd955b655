#!/usr/bin/env python3
"""Fetch the NGSCheckMate-style SNP BED panels used by the SNP pipeline.

The reference repo (gerbenvoshol/kmer-cnt) vendors four panels of ~21k
population SNPs each (6 columns: chrom start end rsID ref alt; GRCh37 and
GRCh38, with and without a "chr" prefix).  They are third-party data, so
this repo downloads them from upstream instead of vendoring copies; the
sha256 sums below pin the exact files the golden pipeline expects.

Usage:  python scripts/fetch_snp_panels.py [outdir=SNP]
"""

import hashlib
import os
import sys
import urllib.request

BASE = "https://raw.githubusercontent.com/gerbenvoshol/kmer-cnt/master/SNP/"
PANELS = {
    "SNP_GRCh37_hg19_wChr.bed":
        "98da71ac72162a45c2370a8c8a1eff869a883c2355bd487347aeb8f7447700aa",
    "SNP_GRCh37_hg19_woChr.bed":
        "8a1ad8bf1bdf673d710ab9b52c236645cd136f3761f91d50cf4aad15c9156046",
    "SNP_GRCh38_hg38_wChr.bed":
        "34297290d1f3bbfbbedba7242d633e43454ffd84755c507e1dc6f2c8fb005d3a",
    "SNP_GRCh38_woChr.bed":
        "2bc8ad08ba06259c26e7e36c057544f9f42e1d01b0c10b0bf1c65fcf416267e3",
}


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "SNP"
    os.makedirs(outdir, exist_ok=True)
    failures = 0
    for name, want in PANELS.items():
        dest = os.path.join(outdir, name)
        if os.path.exists(dest):
            have = hashlib.sha256(open(dest, "rb").read()).hexdigest()
            if have == want:
                print(f"[ok] {dest} (cached)")
                continue
            print(f"[!] {dest} exists but checksum differs; re-downloading")
        url = BASE + name
        try:
            data = urllib.request.urlopen(url, timeout=60).read()
        except Exception as e:  # noqa: BLE001 - report and continue
            print(f"[FAIL] {url}: {e}")
            failures += 1
            continue
        have = hashlib.sha256(data).hexdigest()
        if have != want:
            print(f"[FAIL] {name}: checksum mismatch ({have[:16]}... != {want[:16]}...)")
            failures += 1
            continue
        with open(dest, "wb") as f:
            f.write(data)
        print(f"[ok] {dest} ({len(data)} bytes)")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
