"""CLI tools with reference-identical interfaces.

Dispatch table used by the `ktc` launcher; each entry mirrors one
reference binary (SURVEY.md §2.1)."""

from __future__ import annotations

import importlib
from typing import Callable

# tool name -> (module, function)
_TOOLS = {
    "kc-py1": ("kmer_tpu.tools.kc", "main_kc_py1"),
    "kc-cpp1": ("kmer_tpu.tools.kc", "main_kc_cpp1"),
    "kc-cpp2": ("kmer_tpu.tools.kc", "main_kc_cpp2"),
    "kc-c1": ("kmer_tpu.tools.kc", "main_kc_c1"),
    "kc-c2": ("kmer_tpu.tools.kc", "main_kc_c2"),
    "kc-c3": ("kmer_tpu.tools.kc", "main_kc_c3"),
    "kc-c4": ("kmer_tpu.tools.kc", "main_kc_c4"),
    "yak-count": ("kmer_tpu.tools.yak_count", "main"),
    "snp-pattern-gen": ("kmer_tpu.tools.snp_pattern_gen", "main"),
    "vaf-counter": ("kmer_tpu.tools.vaf_counter", "main"),
    "ed-vaf-counter": ("kmer_tpu.tools.ed_vaf_counter", "main"),
    "bam-vaf-counter": ("kmer_tpu.tools.bam_vaf_counter", "main"),
    "vcf-vaf-counter": ("kmer_tpu.tools.vcf_vaf_counter", "main"),
    "correlation-matrix": ("kmer_tpu.tools.correlation_matrix", "main"),
    "match-classifier": ("kmer_tpu.tools.match_classifier", "main"),
}


def get_tool(name: str) -> Callable:
    mod, fn = _TOOLS[name]
    return getattr(importlib.import_module(mod), fn)


def tool_names():
    return sorted(_TOOLS)
