#!/usr/bin/env python3
"""TPU smoke: drive the CLI surface on the real chip and diff the C oracles.

CI (tests/) pins behavior on the CPU backend, where the Pallas kernels
execute in interpret mode; this script is the complement for a machine
with a TPU attached.  It runs the golden counter surface through the
Mosaic-COMPILED kernels (kernels/extract_tpu.py, kernels/seghist.py)
with KMER_TPU_DEBUG=1, which adds lane-for-lane Pallas-vs-XLA and
fast-vs-general runtime cross-checks (table/compactor.py), and then
byte-diffs every tool's stdout against the corresponding reference
binary in tests/refbin/ (built per .claude/skills/verify/SKILL.md).

Covers both sort key layouts (k<=15 single-plane, k>15 two-plane), the
Pallas extraction tile path, the bloom-gated yak table path, and the
sort-join counts_for path (vaf-counter).

Usage: python scripts/tpu_smoke.py   # ~5-10 min incl. tunnel compiles
Exit 0 = every diff empty and every debug cross-check passed.
"""

import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFBIN = os.path.join(REPO, "tests", "refbin")
FIX = os.path.join(REPO, "tests", "fixtures")
READS = os.path.join(FIX, "reads_small.fq.gz")
GENOME = os.path.join(FIX, "genome_small.fa.gz")
BED = os.path.join(FIX, "snps_small.bed")

CASES = [
    ("kc-c1", ["-k21", READS]),
    ("kc-c2", ["-k31", "-p10", READS]),
    ("kc-c4", ["-k31", READS]),
    ("kc-c4", ["-k15", READS]),  # single-plane sort path
    ("yak-count", ["-k21", "-b14", READS]),
]


def run(cmd, env=None, **kw):
    return subprocess.run(cmd, capture_output=True, env=env, **kw)


def main():
    env = dict(os.environ)
    env["KMER_TPU_DEBUG"] = "1"
    failures = []
    for tool, args in CASES:
        ref = run([os.path.join(REFBIN, tool)] + args)
        t0 = time.time()
        got = run([os.path.join(REPO, "ktc"), tool] + args, env=env)
        dt = time.time() - t0
        ok = got.returncode == 0 and got.stdout == ref.stdout
        print(f"[{'ok' if ok else 'FAIL'}] {tool} {' '.join(args[:-1])} "
              f"({dt:.1f}s)", flush=True)
        if not ok:
            failures.append((tool, args, got.stderr.decode()[-2000:]))

    # vaf-counter: pattern-gen on the small genome, then counts_for on TPU
    with tempfile.TemporaryDirectory() as td:
        pat = os.path.join(td, "p.txt")
        r = run([os.path.join(REFBIN, "snp-pattern-gen"),
                 "-k21", "-b", BED, "-f", GENOME, "-o", pat])
        if r.returncode == 0 and os.path.exists(pat) and os.path.getsize(pat):
            ref = run([os.path.join(REFBIN, "vaf-counter"), "-k21",
                       "-p", pat, "-o", os.path.join(td, "ref.vaf"), READS])
            t0 = time.time()
            got = run([os.path.join(REPO, "ktc"), "vaf-counter", "-k21",
                       "-p", pat, "-o", os.path.join(td, "tpu.vaf"), READS],
                      env=env)
            dt = time.time() - t0
            try:
                with open(os.path.join(td, "ref.vaf"), "rb") as f:
                    want = f.read()
            except FileNotFoundError:
                want = None
            try:
                with open(os.path.join(td, "tpu.vaf"), "rb") as f:
                    have = f.read()
            except FileNotFoundError:
                have = None
            if want is None:
                print("[skip] vaf pipeline (reference vaf-counter wrote "
                      "no output)")
            else:
                ok = got.returncode == ref.returncode and have == want
                print(f"[{'ok' if ok else 'FAIL'}] vaf-counter pipeline "
                      f"({dt:.1f}s)", flush=True)
                if not ok:
                    failures.append(
                        ("vaf-counter", [], got.stderr.decode()[-2000:]))
        else:
            print("[skip] vaf pipeline (no patterns from small fixtures)")

    # report the backend the CHILD tools actually used (they honor
    # KMER_TPU_PLATFORM; this parent must not init a device itself)
    plat = os.environ.get("KMER_TPU_PLATFORM")
    if plat:
        backend = plat
    else:
        import jax

        backend = jax.default_backend()
        print(f"[tpu-smoke] devices={[d.device_kind for d in jax.devices()]}")
    print(f"[tpu-smoke] backend={backend}")
    if backend != "tpu":
        print("[tpu-smoke] WARNING: ran on a non-TPU backend — Mosaic "
              "compilation NOT exercised", file=sys.stderr)
    for tool, args, err in failures:
        print(f"--- {tool} {args} stderr tail:\n{err}", file=sys.stderr)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
