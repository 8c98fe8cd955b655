"""True multi-process distributed counting: two jax.distributed
processes (Gloo CPU collectives, 4 virtual devices each) run
kmer_tpu.dist.multihost.count_multihost over sharded FASTQ files and
must produce the single-engine histogram exactly.

This is the closest a single machine gets to the multi-host pod path
(SURVEY.md §5 last row): real cross-process init, file sharding,
uneven-drain coordination, and psum merges."""

import gzip
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = """
import os, sys, json
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)
pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
jax.distributed.initialize(coordinator_address="127.0.0.1:" + port,
                           num_processes=nproc, process_id=pid)
from kmer_tpu.dist import multihost
import numpy as np
# deterministic queries, identical on every process: k-mers of the
# first reads of the first file (+ two absent keys)
from kmer_tpu.pipeline.counter import _extract_step
from kmer_tpu.io.fastx import FastxReader
import jax.numpy as jnp
reads = []
for _n, sq in FastxReader(sys.argv[4]):
    reads.append(sq)
    if len(reads) >= 3:
        break
buf = np.frombuffer(b"\\x00".join(reads) + b"\\x00", np.uint8)
ehi, elo, _nk = _extract_step(jnp.asarray(buf), 21)
keys = (np.asarray(ehi).astype(np.uint64) << np.uint64(32)) | np.asarray(
    elo
).astype(np.uint64)
uniq = np.unique(keys)
uniq = uniq[uniq != np.uint64(0xFFFFFFFFFFFFFFFF)][:16]
uniq = np.concatenate([uniq, np.asarray([12345, 67890], np.uint64)])
qhi = (uniq >> np.uint64(32)).astype(np.uint32)
qlo = (uniq & np.uint64(0xFFFFFFFF)).astype(np.uint32)
h, nd, qc = multihost.count_multihost(sys.argv[4:], k=21, block=65536,
                                      n_bins=256, max_count=1023,
                                      queries=(qhi, qlo))
if jax.process_index() == 0:
    print(json.dumps({{"nd": int(nd), "hist": [int(x) for x in h],
                       "qk": [int(x) for x in uniq],
                       "qc": [int(x) for x in qc]}}))
""".format(repo=REPO)


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_count_matches_single_engine(tmp_path):
    rng = np.random.default_rng(5)
    paths = []
    for i in range(3):
        p = str(tmp_path / f"mh{i}.fq.gz")
        with gzip.open(p, "wb") as f:
            for r in range(300):
                s = "".join(rng.choice(list("ACGT"), 120))
                f.write(f"@r{r}\n{s}\n+\n{'I' * 120}\n".encode())
        paths.append(p)

    port = str(_free_port())
    worker = str(tmp_path / "worker.py")
    with open(worker, "w") as f:
        f.write(_WORKER)
    env = {k: v for k, v in os.environ.items()
           if not k.startswith(("JAX_", "XLA_"))}
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), "2", port] + paths,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=300) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, err.decode()[-2000:]
    got = json.loads(outs[0][0].decode().strip().splitlines()[-1])

    from kmer_tpu.pipeline.counter import SortCountEngine

    eng = SortCountEngine(k=21)
    eng.count_paths(paths)
    want = eng.hist(256, max_count=1023)
    assert got["nd"] == eng._n_distinct
    assert np.array_equal(np.asarray(got["hist"]), want.astype(np.int64))
    # the distributed sort-join must agree with the single engine
    qk = np.asarray(got["qk"], np.uint64)
    want_qc = eng.counts_for(
        (qk >> np.uint64(32)).astype(np.uint32),
        (qk & np.uint64(0xFFFFFFFF)).astype(np.uint32),
    )
    assert np.array_equal(np.asarray(got["qc"]), want_qc)
    assert np.asarray(got["qc"])[:-2].sum() > 0  # present keys counted
    assert got["qc"][-1] == 0 and got["qc"][-2] == 0  # absent keys


_CLI_WORKER = """
import os, sys, io, contextlib
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)
pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
jax.distributed.initialize(coordinator_address="127.0.0.1:" + port,
                           num_processes=nproc, process_id=pid)
from kmer_tpu.tools.kc import main_kc_c4
buf = io.StringIO()
with contextlib.redirect_stdout(buf):
    rc = main_kc_c4(["-k21", "-b65536", sys.argv[4]])
assert rc == 0, rc
sys.stdout.write(buf.getvalue())
""".format(repo=REPO)


def test_two_process_cli_kc_c4(tmp_path):
    """The kc-c4 CLI entry point on a 2-process jax.distributed run
    (P7 through the product surface): process 0 prints the exact
    single-engine histogram, process 1 prints nothing."""
    rng = np.random.default_rng(7)
    path = str(tmp_path / "cli.fq.gz")
    with gzip.open(path, "wb") as f:
        for r in range(400):
            s = "".join(rng.choice(list("ACGT"), 110))
            f.write(f"@r{r}\n{s}\n+\n{'I' * 110}\n".encode())

    port = str(_free_port())
    worker = str(tmp_path / "cli_worker.py")
    with open(worker, "w") as f:
        f.write(_CLI_WORKER)
    env = {k: v for k, v in os.environ.items()
           if not k.startswith(("JAX_", "XLA_"))}
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), "2", port, path],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=300) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, err.decode()[-2000:]

    def ours(raw):
        # runtimes (Gloo rank banners, loader warnings) occasionally
        # write to fd 1: keep only the tool's histogram rows
        import re

        return "".join(ln for ln in raw.decode().splitlines(keepends=True)
                       if re.match(r"^\d+\t\d+$", ln.rstrip("\n")))

    assert ours(outs[1][0]) == ""  # secondary process emits nothing

    import contextlib
    import io

    from kmer_tpu.tools.kc import main_kc_c4

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        assert not main_kc_c4(["-k21", "-b65536", path])
    assert ours(outs[0][0]) == buf.getvalue(), ours(outs[0][0])[:400]


_YAK_WORKER = """
import os, sys, io, contextlib
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)
pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
jax.distributed.initialize(coordinator_address="127.0.0.1:" + port,
                           num_processes=nproc, process_id=pid)
from kmer_tpu.tools.yak_count import main
buf = io.StringIO()
with contextlib.redirect_stdout(buf):
    rc = main(["-k21", "-b14", "-K65536", sys.argv[4], sys.argv[5]])
assert rc == 0, rc
sys.stdout.write(buf.getvalue())
""".format(repo=REPO)


def test_two_process_cli_yak_two_file(tmp_path):
    """yak-count's bloom-gated two-file two-pass on a 2-process pod:
    the per-host-sharded, all_to_all-routed, per-chip-bloomed flow must
    print the single-process histogram byte-for-byte (bloom admission
    included)."""
    rng = np.random.default_rng(21)
    paths = []
    for name in ("y1", "y2"):
        p = str(tmp_path / f"{name}.fq.gz")
        with gzip.open(p, "wb") as f:
            for r in range(250):
                s = "".join(rng.choice(list("ACGT"), 100))
                f.write(f"@r{r}\n{s}\n+\n{'I' * 100}\n".encode())
        paths.append(p)

    port = str(_free_port())
    worker = str(tmp_path / "yak_worker.py")
    with open(worker, "w") as f:
        f.write(_YAK_WORKER)
    env = {k: v for k, v in os.environ.items()
           if not k.startswith(("JAX_", "XLA_"))}
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), "2", port] + paths,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=300) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, err.decode()[-2000:]

    def ours(raw):
        # runtimes (Gloo rank banners, loader warnings) occasionally
        # write to fd 1: keep only the tool's histogram rows
        import re

        return "".join(ln for ln in raw.decode().splitlines(keepends=True)
                       if re.match(r"^\d+\t\d+$", ln.rstrip("\n")))

    assert ours(outs[1][0]) == ""

    import contextlib
    import io

    from kmer_tpu.tools.yak_count import main

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        assert not main(["-k21", "-b14", "-K65536"] + paths)
    assert ours(outs[0][0]) == buf.getvalue(), ours(outs[0][0])[:400]


_CKPT_WORKER = """
import os, sys, json
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)
pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
jax.distributed.initialize(coordinator_address="127.0.0.1:" + port,
                           num_processes=nproc, process_id=pid)
from kmer_tpu.dist.multihost import MultihostSortEngine
import numpy as np
phase, ckpt, path = sys.argv[4], sys.argv[5], sys.argv[6]
eng = MultihostSortEngine(k=21, block_bases=65536)
if phase == "save":
    eng.count_paths([path])
    eng.save_checkpoint(ckpt)
    sys.exit(0)  # the "kill": this generation dies after checkpointing
eng.resume_checkpoint_into(ckpt)
eng.count_paths([path])
h = eng.hist(256, max_count=1023)
if jax.process_index() == 0:
    print(json.dumps({{"nd": int(eng._n_distinct),
                       "hist": [int(x) for x in h],
                       "tb": eng.total_bases, "ts": eng.total_seqs}}))
""".format(repo=REPO)


def test_two_process_checkpoint_kill_and_resume(tmp_path):
    """Pod-safe checkpoints (per-process shard files): generation 1 of
    a 2-process Gloo run counts file A, checkpoints, and dies; a FRESH
    2-process generation (new coordinator) resumes from the shard files
    and counts file B.  The final histogram and totals must equal an
    uninterrupted single-engine run over both files."""
    rng = np.random.default_rng(11)
    paths = []
    for i in range(2):
        p = str(tmp_path / f"ck{i}.fq.gz")
        with gzip.open(p, "wb") as f:
            for r in range(250):
                s = "".join(rng.choice(list("ACGT"), 120))
                f.write(f"@r{r}\n{s}\n+\n{'I' * 120}\n".encode())
        paths.append(p)
    ckpt = str(tmp_path / "state.ckpt")
    worker = str(tmp_path / "worker.py")
    with open(worker, "w") as f:
        f.write(_CKPT_WORKER)
    env = {k: v for k, v in os.environ.items()
           if not k.startswith(("JAX_", "XLA_"))}
    for phase, path in (("save", paths[0]), ("resume", paths[1])):
        port = str(_free_port())
        procs = [
            subprocess.Popen(
                [sys.executable, worker, str(pid), "2", port, phase,
                 ckpt, path],
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
            )
            for pid in range(2)
        ]
        outs = [p.communicate(timeout=300) for p in procs]
        for p, (out, err) in zip(procs, outs):
            assert p.returncode == 0, (phase, err.decode()[-2000:])
    assert os.path.exists(ckpt + ".proc0of2.npz")
    assert os.path.exists(ckpt + ".proc1of2.npz")
    got = json.loads(outs[0][0].decode().strip().splitlines()[-1])

    from kmer_tpu.pipeline.counter import SortCountEngine

    eng = SortCountEngine(k=21)
    eng.count_paths(paths)
    want = eng.hist(256, max_count=1023)
    assert got["nd"] == eng._n_distinct
    assert np.array_equal(np.asarray(got["hist"]), want.astype(np.int64))
    assert got["tb"] == eng.total_bases and got["ts"] == eng.total_seqs


def test_multihost_checkpoint_format_and_validation(tmp_path):
    """Single-process (8 virtual devices): shard-file roundtrip
    preserves hist/totals, and restore validates k and the process
    layout (keys must stay with their owning devices)."""
    import gzip as _gzip

    import pytest as _pytest

    from kmer_tpu.dist.multihost import MultihostSortEngine

    rng = np.random.default_rng(3)
    p = str(tmp_path / "r.fq.gz")
    with _gzip.open(p, "wb") as f:
        for r in range(200):
            s = "".join(rng.choice(list("ACGT"), 100))
            f.write(f"@r{r}\n{s}\n+\n{'I' * 100}\n".encode())
    eng = MultihostSortEngine(k=21, block_bases=65536)
    eng.count_paths([p])
    ckpt = str(tmp_path / "s.ckpt")
    eng.save_checkpoint(ckpt)
    want = eng.hist(256, max_count=1023)
    want_nd = eng._n_distinct

    eng2 = MultihostSortEngine(k=21, block_bases=65536)
    eng2.resume_checkpoint_into(ckpt)
    got = eng2.hist(256, max_count=1023)
    assert np.array_equal(np.asarray(got), np.asarray(want))
    assert eng2._n_distinct == want_nd
    assert (eng2.total_bases, eng2.total_seqs) == (eng.total_bases,
                                                  eng.total_seqs)

    bad = MultihostSortEngine(k=31, block_bases=65536)
    with _pytest.raises(ValueError, match="k=21"):
        bad.resume_checkpoint_into(ckpt)

    # a different process layout must refuse the shard file
    import numpy as _np

    z = dict(_np.load(ckpt + ".proc0of1.npz"))
    z["meta"] = z["meta"].copy()
    z["meta"][3] = 2  # claim it came from a 2-process run
    _np.savez_compressed(ckpt + "2.proc0of1.npz", **z)
    eng3 = MultihostSortEngine(k=21, block_bases=65536)
    with _pytest.raises(ValueError, match="process"):
        eng3.resume_checkpoint_into(ckpt + "2")


_SR_WORKER = """
import os, sys, json
sys.path.insert(0, {repo!r})
os.environ["KMER_TPU_SINGLE_READER"] = "1"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)
pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
jax.distributed.initialize(coordinator_address="127.0.0.1:" + port,
                           num_processes=nproc, process_id=pid)
from kmer_tpu.dist.multihost import MultihostSortEngine
from kmer_tpu.pipeline.yak import MeshYakEngine
import numpy as np
paths = sys.argv[4:]
eng = MultihostSortEngine(k=21, block_bases=65536)
eng.count_paths(paths)
h = eng.hist(256, max_count=1023)
lines = []
yk = MeshYakEngine(k=21, pre=10, bf_shift=18, bf_n_hash=4,
                   chunk_size=65536,
                   log=lambda ns, tot: lines.append((ns, tot)))
yk.count(paths, create_new=True)
if jax.process_index() == 0:
    print(json.dumps({{"nd": int(eng._n_distinct),
                       "hist": [int(x) for x in h],
                       "tb": eng.total_bases, "ts": eng.total_seqs,
                       "yak": lines}}))
""".format(repo=REPO)


def test_two_process_single_reader_matches_mesh(tmp_path, monkeypatch):
    """KMER_TPU_SINGLE_READER=1: process 0 reads every file and
    broadcasts global batches.  The 2-process run must match the
    1-process 8-device mesh run EXACTLY — histogram, totals, and the
    yak per-batch stderr sequence (n_seqs, running tot), i.e. batch
    composition and bloom admission order (PARITY.md div 8/10 per-host
    residuals) are gone."""
    rng = np.random.default_rng(17)
    paths = []
    # files LARGER than the 64KiB row_bases/capacity so buffers split at
    # the packer's capacity boundary — the parity claim is per-buffer,
    # and sub-capacity inputs would never exercise the split geometry
    for i in range(3):
        p = str(tmp_path / f"sr{i}.fq.gz")
        with gzip.open(p, "wb") as f:
            for r in range(700 + 100 * i):
                s = "".join(rng.choice(list("ACGT"), 120))
                f.write(f"@r{r}\n{s}\n+\n{'I' * 120}\n".encode())
        paths.append(p)

    port = str(_free_port())
    worker = str(tmp_path / "worker.py")
    with open(worker, "w") as f:
        f.write(_SR_WORKER)
    env = {k: v for k, v in os.environ.items()
           if not k.startswith(("JAX_", "XLA_"))}
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), "2", port] + paths,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=300) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, err.decode()[-2000:]
    got = json.loads(outs[0][0].decode().strip().splitlines()[-1])

    # 1-process reference on the SAME 8-device mesh (conftest gives
    # this test process 8 virtual CPU devices)
    monkeypatch.setenv("KMER_TPU_FORCE_MESH", "1")
    from kmer_tpu.dist.multihost import MultihostSortEngine
    from kmer_tpu.pipeline.yak import MeshYakEngine

    eng = MultihostSortEngine(k=21, block_bases=65536)
    eng.count_paths(paths)
    want = eng.hist(256, max_count=1023)
    assert got["nd"] == eng._n_distinct
    assert np.array_equal(np.asarray(got["hist"]), np.asarray(want))
    assert (got["tb"], got["ts"]) == (eng.total_bases, eng.total_seqs)

    lines = []
    yk = MeshYakEngine(k=21, pre=10, bf_shift=18, bf_n_hash=4,
                       chunk_size=65536,
                       log=lambda ns, tot: lines.append([ns, tot]))
    yk.count(paths, create_new=True)
    assert got["yak"] == lines
