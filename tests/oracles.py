"""ONE canonical build recipe per reference oracle binary.

Every test module (and scripts/fuzz_parity.py) builds the shared
tests/refbin/<tool> binaries through this table, so the binary is
flag-identical no matter which module happens to build it first —
previously test_fscanf_parsing.py built vaf-counter with
-mssse3 -msse4.1 while test_golden_snp_pipeline.py built the same path
without them, making any SIMD-vs-scalar divergence in the oracle
run-order-dependent (ADVICE r2).

Flags mirror /root/reference/Makefile exactly (CFLAGS=-O2, LIBS=-lz,
vaf-counter's -mssse3 -msse4.1 at Makefile:44) with two local
adaptations: -g is dropped (debug info only), and the C++ oracles add
`-include limits` because the vendored robin_hood.h predates g++ 13's
stricter transitive includes.  bam/vcf-vaf-counter need the htslib
static build (/tmp/htslib_build, .claude/skills/verify/SKILL.md) and
are not built here.
"""

import os
import subprocess

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFBIN = os.path.join(REPO, "tests", "refbin")

# tool -> (compiler argv prefix, sources, trailing args)
RECIPES = {
    "kc-c1": (["gcc", "-O2"], ["kc-c1.c"], ["-lz"]),
    "kc-c2": (["gcc", "-O2"], ["kc-c2.c"], ["-lz"]),
    "kc-c3": (["gcc", "-O2"], ["kc-c3.c", "kthread.c"], ["-lz", "-lpthread"]),
    "kc-c4": (["gcc", "-O2"], ["kc-c4.c", "kthread.c"], ["-lz", "-lpthread"]),
    "yak-count": (["gcc", "-O2"], ["yak-count.c", "kthread.c"],
                  ["-lz", "-lpthread"]),
    "snp-pattern-gen": (["gcc", "-O2"], ["snp-pattern-gen.c"], ["-lz"]),
    # Makefile:44 builds the SIMD encode paths in; goldens must exercise
    # the same binary the reference ships
    "vaf-counter": (["gcc", "-O2", "-mssse3", "-msse4.1"],
                    ["vaf-counter.c", "kthread.c"], ["-lz", "-lpthread"]),
    "ed-vaf-counter": (["g++", "-O2", "-std=c++11"],
                       ["ed-vaf-counter.c", "edlib.cpp"], ["-lz"]),
    "correlation-matrix": (["gcc", "-O2"], ["correlation-matrix.c"], ["-lm"]),
    "match-classifier": (["gcc", "-O2"], ["match-classifier.c"], ["-lm"]),
    "kc-cpp1": (["g++", "-O2", "-std=c++11", "-include", "limits"],
                ["kc-cpp1.cpp"], ["-lz"]),
    "kc-cpp2": (["g++", "-O2", "-std=c++11", "-include", "limits"],
                ["kc-cpp2.cpp"], ["-lz"]),
}


class OracleBuildError(RuntimeError):
    pass


def ensure(tool: str) -> str:
    """Build tests/refbin/<tool> from the canonical recipe if missing;
    returns its path.  Raises OracleBuildError on compile failure (test
    modules turn that into pytest.skip)."""
    path = os.path.join(REFBIN, tool)
    if os.path.exists(path):
        return path
    os.makedirs(REFBIN, exist_ok=True)
    cc, srcs, tail = RECIPES[tool]
    cmd = (cc + ["-o", path]
           + [f"/root/reference/{s}" for s in srcs]
           + ["-I/root/reference"] + tail)
    r = subprocess.run(cmd, capture_output=True)
    if r.returncode != 0:
        raise OracleBuildError(
            f"cannot build reference {tool}: {r.stderr.decode()}")
    return path


def ensure_all(tools) -> str:
    for t in tools:
        ensure(t)
    return REFBIN
