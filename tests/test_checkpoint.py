"""Device-state checkpoint/resume (SURVEY.md §5): engines dump their
count state as arrays (npz) and a resumed run reproduces the exact
histogram of an uninterrupted one."""

import os

import numpy as np
import pytest

import jax

FIXTURES = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")
A = os.path.join(FIXTURES, "sampleA1.fq.gz")
B = os.path.join(FIXTURES, "sampleB.fq.gz")


def test_sort_engine_kill_and_resume(tmp_path):
    from kmer_tpu.pipeline.counter import SortCountEngine

    ck = str(tmp_path / "count.ckpt.npz")
    e1 = SortCountEngine(k=21, block_bases=1 << 16)
    e1.count_paths([A])
    e1.save_checkpoint(ck)
    del e1  # the "kill": nothing survives but the file

    e2 = SortCountEngine.resume_checkpoint(ck, block_bases=1 << 16)
    e2.count_paths([B])
    got = e2.hist(256, max_count=1023)

    full = SortCountEngine(k=21, block_bases=1 << 16)
    full.count_paths([A, B])
    want = full.hist(256, max_count=1023)
    assert np.array_equal(got, want)
    assert e2._n_distinct == full._n_distinct
    assert (e2.total_bases, e2.total_seqs, e2.total_kmers) == (
        full.total_bases, full.total_seqs, full.total_kmers,
    )


def test_yak_engine_resume_between_passes(tmp_path):
    """Save after pass 1 (bloom + table), resume, run pass 2 + shrink:
    identical to the uninterrupted two-pass flow including bloom
    admission (observable in two-file mode)."""
    from kmer_tpu.pipeline.yak import YAK_MAX_COUNT, YakEngine, yak_count_file

    kw = dict(k=21, pre=10, bf_shift=14, bf_n_hash=4, chunk_size=1 << 14)
    ck = str(tmp_path / "yak.ckpt.npz")

    e1 = YakEngine(**kw)
    e1.count([A], create_new=True)
    e1.save_checkpoint(ck)
    del e1

    e2 = YakEngine.resume_checkpoint(ck)
    e2.destroy_bloom()
    e2.clear()
    e2.count([B], create_new=False)
    e2.shrink(2, YAK_MAX_COUNT)
    got = e2.hist()

    full = yak_count_file(A, B, YakEngine(**kw))
    assert np.array_equal(got, full.hist())
    assert e2.tot == full.tot


def test_mesh_engine_kill_and_resume(tmp_path, monkeypatch):
    """The CLI-facing mesh wrapper: save after file A, resume into a
    fresh engine, count file B — histogram and stream totals equal an
    uninterrupted run."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    monkeypatch.setenv("KMER_TPU_FORCE_MESH", "1")
    from kmer_tpu.pipeline.counter import MeshSortCountEngine

    ck = str(tmp_path / "mesh.ckpt.npz")
    e1 = MeshSortCountEngine(k=21, block_bases=1 << 17)
    e1.count_paths([A])
    e1.save_checkpoint(ck)
    del e1

    e2 = MeshSortCountEngine(k=21, block_bases=1 << 17)
    e2.resume_checkpoint_into(ck)
    e2.count_paths([B])
    got = e2.hist(256, max_count=1023)

    full = MeshSortCountEngine(k=21, block_bases=1 << 17)
    full.count_paths([A, B])
    want = full.hist(256, max_count=1023)
    assert np.array_equal(got, want)
    assert e2._n_distinct == full._n_distinct
    assert (e2.total_bases, e2.total_seqs) == (
        full.total_bases, full.total_seqs,
    )


def test_sharded_engine_checkpoint_roundtrip():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    import jax.numpy as jnp

    from kmer_tpu.dist import sharded

    rng = np.random.default_rng(9)
    mesh = sharded.make_mesh(jax.devices()[:8], data=2, shard=4)
    rows1 = jnp.asarray(rng.choice(
        np.frombuffer(b"ACGT\0", np.uint8), (8, 2048)))
    rows2 = jnp.asarray(rng.choice(
        np.frombuffer(b"ACGT\0", np.uint8), (8, 2048)))

    import tempfile

    e1 = sharded.ShardedSortEngine(mesh, 21, lanes_per_dest=1024)
    e1.add_batch(rows1)
    with tempfile.TemporaryDirectory() as d:
        ck = os.path.join(d, "sh.ckpt.npz")
        e1.save_checkpoint(ck)
        e2 = sharded.ShardedSortEngine(mesh, 21, lanes_per_dest=1024)
        e2.restore_checkpoint(ck)
    e2.add_batch(rows2)
    got = e2.hist(256, max_count=1023)

    full = sharded.ShardedSortEngine(mesh, 21, lanes_per_dest=1024)
    full.add_batch(rows1)
    full.add_batch(rows2)
    want = full.hist(256, max_count=1023)
    assert np.array_equal(got, want)
    assert e2._n_distinct == full._n_distinct
