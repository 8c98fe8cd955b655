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
stricter transitive includes.  bam/vcf-vaf-counter (and the CRAM test
harnesses) link the htslib static build, which `ensure()` ALSO builds
on demand (/root/reference/htslib -> /tmp/htslib_build, configured
like /root/reference/Makefile:55-56) so a fresh box runs every golden
without manual steps.
"""

import multiprocessing
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFBIN = os.path.join(REPO, "tests", "refbin")
HTSLIB_DIR = "/tmp/htslib_build"
HTSLIB_LIB = os.path.join(HTSLIB_DIR, "libhts.a")

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

# Reference tools linking the htslib static lib (verify skill recipe;
# flags per /root/reference/Makefile:59,62 minus curl/crypto/deflate,
# which the --disable'd configure below doesn't need)
HTSLIB_RECIPES = {
    "bam-vaf-counter": (["gcc", "-O2"], ["bam-vaf-counter.c", "kthread.c"],
                        ["-lz", "-lpthread", "-lm"]),
    "vcf-vaf-counter": (["gcc", "-O2"], ["vcf-vaf-counter.c"],
                        ["-lz", "-lpthread", "-lm"]),
}

# Test-support harnesses (sources in scripts/, not parity tools): the
# BAM->CRAM converter for CRAM goldens and the rANS Nx16/tok3 encoder
# for the CRAM 3.1 codec unit tests.
SUPPORT_RECIPES = {
    "sam2cram": "scripts/sam2cram.c",
    "rans_nx16_fixture": "scripts/rans_nx16_fixture.c",
}


class OracleBuildError(RuntimeError):
    pass


def ensure_htslib() -> str:
    """Build the htslib static lib once per machine (mirrors
    /root/reference/Makefile:55-56 but disables the optional externals
    so it links with just -lz).  ~1-4 min on first use."""
    if os.path.exists(HTSLIB_LIB):
        return HTSLIB_LIB
    if not os.path.exists("/root/reference/htslib/configure"):
        raise OracleBuildError("reference htslib not present")
    sys.stderr.write("[oracles] building htslib static lib (one-time, "
                     "a few minutes)...\n")
    tmp = HTSLIB_DIR + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.copytree("/root/reference/htslib", tmp)
    for step in (
        ["./configure", "--disable-bz2", "--disable-lzma",
         "--disable-libcurl", "--without-libdeflate"],
        ["make", "lib-static", f"-j{max(2, multiprocessing.cpu_count())}"],
    ):
        r = subprocess.run(step, cwd=tmp, capture_output=True)
        if r.returncode != 0:
            raise OracleBuildError(
                f"htslib {' '.join(step[:1])} failed: "
                f"{r.stderr.decode()[-500:]}")
    if not os.path.exists(HTSLIB_DIR):
        os.rename(tmp, HTSLIB_DIR)
    else:  # lost a race with a concurrent builder; theirs is as good
        shutil.rmtree(tmp, ignore_errors=True)
    return HTSLIB_LIB


def ensure(tool: str) -> str:
    """Build tests/refbin/<tool> from the canonical recipe if missing
    (including the htslib static lib for the tools that link it);
    returns its path.  Raises OracleBuildError on compile failure (test
    modules turn that into pytest.skip)."""
    path = os.path.join(REFBIN, tool)
    if os.path.exists(path):
        return path
    os.makedirs(REFBIN, exist_ok=True)
    if tool in RECIPES:
        cc, srcs, tail = RECIPES[tool]
        cmd = (cc + ["-o", path]
               + [f"/root/reference/{s}" for s in srcs]
               + ["-I/root/reference"] + tail)
    elif tool in HTSLIB_RECIPES:
        ensure_htslib()
        cc, srcs, tail = HTSLIB_RECIPES[tool]
        cmd = (cc + ["-o", path]
               + [f"/root/reference/{s}" for s in srcs]
               + ["-I/root/reference", f"-I{HTSLIB_DIR}", HTSLIB_LIB] + tail)
    elif tool in SUPPORT_RECIPES:
        ensure_htslib()
        cmd = (["gcc", "-O2", "-o", path,
                os.path.join(REPO, SUPPORT_RECIPES[tool]),
                f"-I{HTSLIB_DIR}", f"-I{HTSLIB_DIR}/htscodecs",
                HTSLIB_LIB, "-lz", "-lpthread", "-lm"])
    else:
        raise KeyError(tool)
    r = subprocess.run(cmd, capture_output=True)
    if r.returncode != 0:
        raise OracleBuildError(
            f"cannot build reference {tool}: {r.stderr.decode()}")
    return path


def ensure_all(tools) -> str:
    for t in tools:
        ensure(t)
    return REFBIN
