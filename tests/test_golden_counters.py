"""Golden parity tests: our CLI tools vs the compiled C reference tools
on the committed fixtures (the reference's own implicit test methodology
— run two counters, diff histograms; see SURVEY.md §4)."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFBIN = os.path.join(REPO, "tests", "refbin")
FIXTURES = os.path.join(REPO, "tests", "fixtures")
READS = os.path.join(FIXTURES, "reads_small.fq.gz")
GENOME = os.path.join(FIXTURES, "genome_small.fa.gz")

_REF_SOURCES = {
    "kc-c1": (["kc-c1.c"], []),
    "kc-c2": (["kc-c2.c"], []),
    "kc-c3": (["kc-c3.c", "kthread.c"], ["-lpthread"]),
    "kc-c4": (["kc-c4.c", "kthread.c"], ["-lpthread"]),
    "yak-count": (["yak-count.c", "kthread.c"], ["-lpthread"]),
}


@pytest.fixture(scope="session")
def refbin():
    os.makedirs(REFBIN, exist_ok=True)
    for name, (srcs, extra) in _REF_SOURCES.items():
        out = os.path.join(REFBIN, name)
        if os.path.exists(out):
            continue
        cmd = (
            ["gcc", "-O2", "-o", out]
            + [f"/root/reference/{s}" for s in srcs]
            + ["-I/root/reference", "-lz"]
            + extra
        )
        r = subprocess.run(cmd, capture_output=True)
        if r.returncode != 0:
            pytest.skip(f"cannot build reference {name}: {r.stderr.decode()}")
    return REFBIN


def run_ref(refbin, tool, args):
    r = subprocess.run(
        [os.path.join(refbin, tool)] + args, capture_output=True, check=True
    )
    return r.stdout.decode()


def run_ours(tool, args, capsys):
    from kmer_tpu.tools import get_tool

    rc = get_tool(tool)(args)
    assert not rc
    return capsys.readouterr().out


@pytest.mark.parametrize(
    "tool,args",
    [
        ("kc-c1", ["-k21", READS]),
        ("kc-c1", ["-k31", GENOME]),
        ("kc-c2", ["-k31", READS]),
        ("kc-c3", ["-k31", "-b1000000", READS]),
        ("kc-c4", ["-k31", "-t4", READS]),
        ("yak-count", ["-k31", READS]),
        ("yak-count", ["-k31", "-b22", READS]),
        ("yak-count", ["-k21", "-b20", "-H3", READS]),
    ],
)
def test_counter_parity(refbin, capsys, tool, args):
    want = run_ref(refbin, tool, args)
    got = run_ours(tool, args, capsys)
    assert got == want
