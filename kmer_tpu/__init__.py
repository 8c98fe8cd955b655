"""kmer_tpu — a TPU-native k-mer counting and SNP-fingerprinting engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
gerbenvoshol/kmer-cnt (lh3/kmer-cnt counters + NGSCheckMate-style SNP
sample-identity pipeline).  The compute path is vectorized JAX running on
TPU (2-bit base codes as uint32 hi/lo planes, device-resident
open-addressing count tables, blocked bloom filters, Myers bit-vector
edit distance); the runtime around it (FASTA/FASTQ ingest, pipelining,
file formats) lives on the host.

Reference parity targets (cited per-module as /root/reference/<file>:<line>):
  kc-py1, kc-cpp1/2, kc-c1..c4, yak-count     -> kmer_tpu.tools.kc / yak_count
  snp-pattern-gen, vaf-counter, ed-vaf-counter,
  bam-vaf-counter, vcf-vaf-counter            -> kmer_tpu.tools.*
  correlation-matrix, match-classifier        -> kmer_tpu.tools.*
"""

__version__ = "0.1.0"

import os as _os

# Persistent compilation cache: the CLI tools are separate processes and
# the count/bloom kernels take tens of seconds to compile; caching makes
# every invocation after the first start instantly (host analog of the
# reference's ahead-of-time compiled binaries).  Configured via env vars
# (read by jax.config at import) so that host-only tools — bam/vcf-vaf-
# counter, correlation-matrix, match-classifier — never pay the ~4 s
# `import jax` cost.
# Per-backend cache dirs: a TPU-attached session also compiles HOST
# (CPU) helper executables with tuning pseudo-features the plain CPU
# backend rejects (+prefer-no-scatter/-gather) under the SAME cache key
# — a later CPU run then fails the AOT load with a multi-KB
# cpu_aot_loader error dump on stderr, every time, breaking the CLI's
# stderr byte-parity.  Keying the directory by the intended platform
# keeps the two populations apart.
def _cpu_fingerprint() -> str:
    """Short stable id of this host's CPU feature set.  CPU AOT cache
    entries are machine-code: an entry compiled on a box with different
    ISA features still LOADS elsewhere, but XLA warns with a multi-KB
    cpu_aot_loader dump per program on stderr (breaking CLI stderr
    byte-parity) and may SIGILL.  The cache directory survives across
    boxes (it lives in the persistent home), so key it by the CPU."""
    try:
        import hashlib

        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.sha256(
                        " ".join(sorted(line.split()))
                        .encode()).hexdigest()[:10]
    except OSError:
        pass
    return "unknown"


def _cache_dir() -> str:
    base = _os.environ.get(
        "KMER_TPU_JAX_CACHE", _os.path.expanduser("~/.cache/kmer_tpu_jax"))
    plat = (_os.environ.get("KMER_TPU_PLATFORM")
            or _os.environ.get("JAX_PLATFORMS", ""))
    if not plat and "jax" in _sys.modules:
        try:
            plat = _sys.modules["jax"].config.jax_platforms or ""
        except Exception:
            plat = ""
    # TPU programs are compiled remotely (host-ISA-independent and the
    # expensive population — keep them shared); CPU programs are local
    # machine code — key by host CPU so cross-box entries never load.
    return base + "_cpu_" + _cpu_fingerprint() if "cpu" in plat else base


import sys as _sys  # noqa: E402  (needed by _cache_dir above)

_os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _cache_dir())
_os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")
_os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")

# The env vars only apply at jax import; when something imported jax
# before us (the axon sitecustomize does, and so do bench.py/conftest),
# apply the config directly — module access is free at that point.
if "jax" in _sys.modules:
    try:
        _jax = _sys.modules["jax"]
        _jax.config.update(
            "jax_compilation_cache_dir",
            _os.environ["JAX_COMPILATION_CACHE_DIR"],
        )
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:  # older jax without these flags
        pass
