#!/usr/bin/env python3
"""End-to-end parity fuzz: random adversarial FASTA/FASTQ vs the C
reference binaries (built in tests/refbin by the golden tests).

Generates inputs that stress edge cases — mixed/uniform read lengths,
reads shorter than k, N runs, lowercase, empty records, single-base
reads, multi-line FASTA — runs both implementations, and diffs stdout
byte-for-byte.

Usage: python scripts/fuzz_parity.py [rounds=20] [seed=0]
"""

import gzip
import io
import os
import subprocess
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFBIN = os.path.join(REPO, "tests", "refbin")


def random_fastx(rng, fastq=True):
    alpha = "ACGTacgtNnRYx"
    probs = np.array([12, 12, 12, 12, 2, 2, 2, 2, 3, 1, 0.5, 0.5, 0.5], float)
    probs /= probs.sum()
    n_reads = int(rng.integers(1, 300))
    uniform = rng.random() < 0.4
    ulen = int(rng.integers(1, 260))
    out = io.StringIO()
    for i in range(n_reads):
        ln = ulen if uniform else int(rng.integers(0, 260))
        seq = "".join(rng.choice(list(alpha), size=ln, p=probs))
        if fastq:
            out.write(f"@r{i} comment here\n{seq}\n+\n{'I' * ln}\n")
        else:
            out.write(f">r{i}\n")
            # multi-line FASTA with random wrap
            w = int(rng.integers(1, 80))
            for off in range(0, max(ln, 1), w):
                out.write(seq[off : off + w] + "\n")
    return out.getvalue().encode()


def run_ref(tool, args):
    return subprocess.run(
        [os.path.join(REFBIN, tool)] + args, capture_output=True, check=True
    ).stdout


def run_ours(tool, args):
    import contextlib

    from kmer_tpu.tools import get_tool

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = get_tool(tool)(args)
    assert not rc, (tool, args)
    return buf.getvalue().encode()


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    rng = np.random.default_rng(seed)
    fails = 0
    for t in range(rounds):
        data = random_fastx(rng, fastq=bool(rng.integers(0, 2)))
        gz = bool(rng.integers(0, 2))
        suffix = ".fq.gz" if gz else ".fq"
        with tempfile.NamedTemporaryFile(suffix=suffix, delete=False) as tf:
            tf.write(gzip.compress(data) if gz else data)
            path = tf.name
        k = int(rng.choice([1, 2, 5, 15, 16, 17, 21, 31, 32]))
        cases = [("kc-c1", [f"-k{k}", path]), ("kc-c4", [f"-k{k}", path])]
        if k <= 31:
            cases.append(("yak-count", [f"-k{k}", "-b14", path]))
        try:
            for tool, args in cases:
                want = run_ref(tool, args)
                got = run_ours(tool, args)
                if got != want:
                    fails += 1
                    print(f"[FAIL] round {t} {tool} {args}")
                    keep = f"/tmp/fuzz_fail_{t}{suffix}"
                    os.replace(path, keep)
                    print(f"       input kept at {keep}")
                    break
            else:
                print(f"[ok] round {t} k={k} ({len(data)} bytes)")
        finally:
            if os.path.exists(path):
                os.unlink(path)
    print(f"done: {rounds - fails}/{rounds} rounds clean")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
