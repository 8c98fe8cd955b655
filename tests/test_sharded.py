"""Multi-device sharded counting on the 8-device virtual CPU mesh:
the all_to_all-routed sharded table must produce the same histogram as
the single-device engine."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kmer_tpu.dist import sharded
from kmer_tpu.kernels.encode import encode_bases
from kmer_tpu.kernels.kmer import extract_canonical
from kmer_tpu.table import count_table as ct
from tests import ref_np

RNG = np.random.default_rng(11)


def _random_ascii(n):
    b = RNG.choice(np.frombuffer(b"ACGTacgtN", np.uint8), size=n,
                   p=[0.24, 0.24, 0.24, 0.24, 0.005, 0.005, 0.005, 0.005, 0.02])
    return b


@pytest.mark.parametrize("shape", [(2, 4), (1, 8), (4, 2)])
def test_sharded_matches_single_device(shape):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = sharded.make_mesh(jax.devices()[:8], data=shape[0], shard=shape[1])
    k, block, cap_local, lanes = 21, 4096, 8192, 2048
    n_rows = shape[0] * shape[1]
    ascii_rows = np.stack([_random_ascii(block) for _ in range(n_rows)])

    step = sharded.sharded_count_step_fn(mesh, k, max_count=1023,
                                         lanes_per_dest=lanes)
    tables = sharded.make_sharded_tables(mesh, cap_local)
    tables, n_new, n_drop = step(tables, jnp.asarray(ascii_rows))
    assert int(n_drop) == 0
    hist_fn = sharded.sharded_hist_fn(mesh, 256)
    got = np.asarray(hist_fn(tables))

    # oracle: single big table over the concatenated rows (rows are
    # independent reads — separators at row boundaries via distinct calls)
    t = ct.make(1 << 16)
    for row in ascii_rows:
        codes = encode_bases(jnp.asarray(row))
        out = extract_canonical(codes, k, apply_hash64=True)
        t, _ = ct.insert(t, out.kmer, out.valid, 1023)
    want = np.asarray(ct.hist(t, 256))
    assert np.array_equal(got, want)
    assert int(n_new) == int(t.n_full)  # same distinct total


@pytest.mark.parametrize("shape,k", [((2, 4), 21), ((1, 8), 21), ((2, 4), 13)])
def test_sharded_sort_engine_matches_single_device(shape, k):
    """The sort-based multi-chip engine (extract -> all_to_all routing ->
    per-device sort/segment hist -> psum) must equal the single-device
    sort engine, including k-mers duplicated across data rows."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from kmer_tpu.table.compactor import KmerCompactor
    from kmer_tpu.pipeline.counter import _extract_step

    mesh = sharded.make_mesh(jax.devices()[:8], data=shape[0], shard=shape[1])
    block, lanes = 4096, 2048  # k=13 exercises the one-plane routing/sort path
    rows = [_random_ascii(block) for _ in range(6)] + 2 * [_random_ascii(block)]
    ascii_rows = np.stack(rows)  # rows 6 and 7 identical (cross-row dups)

    eng = sharded.ShardedSortEngine(mesh, k, lanes_per_dest=lanes)
    eng.add_batch(jnp.asarray(ascii_rows))
    eng.add_batch(jnp.asarray(ascii_rows[::-1].copy()))  # second batch
    assert eng.total_dropped == 0
    got = eng.hist(256, max_count=1023)

    comp = KmerCompactor()
    for _ in range(2):
        for row in rows:
            hi, lo, _nk = _extract_step(jnp.asarray(row), k)
            comp.add_raw(hi, lo)
    want, want_nd = comp.hist(256, max_count=1023)
    assert np.array_equal(got, want.astype(got.dtype))
    assert eng._n_distinct == want_nd


def test_sharded_cross_row_duplicates():
    """The same k-mer arriving via different data rows must merge into
    one owning device's table (routing over both mesh axes), not split
    into per-data-row counts."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = sharded.make_mesh(jax.devices()[:8], data=4, shard=2)
    k, block, cap_local, lanes = 21, 1024, 8192, 2048
    row = _random_ascii(block)
    ascii_rows = np.stack([row] * 8)  # every row identical

    step = sharded.sharded_count_step_fn(mesh, k, max_count=1023,
                                         lanes_per_dest=lanes)
    tables = sharded.make_sharded_tables(mesh, cap_local)
    tables, n_new, n_drop = step(tables, jnp.asarray(ascii_rows))
    assert int(n_drop) == 0
    got = np.asarray(sharded.sharded_hist_fn(mesh, 256)(tables))

    t = ct.make(1 << 14)
    for r in ascii_rows:
        codes = encode_bases(jnp.asarray(r))
        out = extract_canonical(codes, k, apply_hash64=True)
        t, _ = ct.insert(t, out.kmer, out.valid, 1023)
    want = np.asarray(ct.hist(t, 256))
    assert np.array_equal(got, want)
    assert int(n_new) == int(t.n_full)


def test_sharded_uniform_row_slicing_matches():
    """row_bytes slicing (drop guaranteed-invalid per-read window lanes
    before the routing sort + all_to_all) must not change the
    histogram."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = sharded.make_mesh(jax.devices()[:8], data=2, shard=4)
    k, L = 21, 97
    rng = np.random.default_rng(17)
    ascii_rows = rng.choice(np.frombuffer(b"ACGTN", np.uint8), (8, 2048),
                            p=[0.24, 0.24, 0.24, 0.24, 0.04])
    ascii_rows[:, L :: L + 1] = 0  # uniform L-base reads + NUL separators
    span = (2048 // (L + 1)) * (L + 1)
    ascii_rows[:, span:] = 0  # the packer stores whole rows only

    e1 = sharded.ShardedSortEngine(mesh, k, lanes_per_dest=2048)
    e1.add_batch(jnp.asarray(ascii_rows), row_bytes=L + 1)
    h1 = e1.hist(256, max_count=1023)
    e2 = sharded.ShardedSortEngine(mesh, k, lanes_per_dest=2048)
    e2.add_batch(jnp.asarray(ascii_rows))
    h2 = e2.hist(256, max_count=1023)
    assert np.array_equal(h1, h2)
    assert e1._n_distinct == e2._n_distinct
    assert e1.total_kmers == e2.total_kmers


def test_mesh_yak_two_pass_matches_single_device(tmp_path):
    """The distributed yak two-pass (per-device bloom gating + clear +
    recount + shrink) must reproduce the single-device YakEngine exactly
    — including bloom admission, which is observable in two-file mode
    (pass 2 counts fn2 only over fn1's admitted keys)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    import gzip

    from kmer_tpu.pipeline.yak import (
        MeshYakEngine, YakEngine, yak_count_file,
    )

    rng = np.random.default_rng(5)
    paths = []
    for name in ("f1", "f2"):
        p = str(tmp_path / f"{name}.fa.gz")
        with gzip.open(p, "wb") as f:
            for i in range(300):
                s = _random_ascii(120).tobytes().replace(b"\0", b"A")
                f.write(b">r%d\n%s\n" % (i, s))
        paths.append(p)

    kw = dict(k=21, pre=10, bf_shift=14, bf_n_hash=4, chunk_size=1 << 14)
    single = yak_count_file(paths[0], paths[1], YakEngine(**kw))
    mesh = yak_count_file(paths[0], paths[1], MeshYakEngine(**kw))
    assert np.array_equal(mesh.hist(), single.hist())
    assert mesh.tot == single.tot


@pytest.mark.parametrize(
    "bf_shift",
    [
        19,  # bloom ACTIVE (19-10 = 9 = BLK_SHIFT): gated two-pass
        14,  # bf > 0 but geometry-disabled bloom: ungated two-pass
        0,   # no pass 2: hist = pass-1 exact counts
    ],
)
def test_mesh_sort_yak_matches_table_engine(tmp_path, bf_shift):
    """The sort-based mesh yak engine (MeshSortYakEngine — routing
    sorts + deferred admission + shrink merge-join, no table probe
    loop) must reproduce the table-based MeshYakEngine exactly on the
    full two-file flow: histogram, tot, AND the per-step `[M]` log
    lines (the engines share _mesh_row_batches, so their step batches
    are identical; the deferred per-step admitted totals must equal the
    table's live n_new accumulation)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    import gzip

    from kmer_tpu.pipeline.yak import (
        MeshSortYakEngine, MeshYakEngine, yak_count_file,
    )

    rng = np.random.default_rng(bf_shift)
    paths = []
    for name in ("f1", "f2"):
        p = str(tmp_path / f"{name}.fa.gz")
        with gzip.open(p, "wb") as f:
            for i in range(400):
                s = (_random_ascii(100).tobytes().replace(b"\0", b"A")
                     if rng.random() < 0.9 else
                     b"ACGT" * 25)  # repeats: multi-occurrence keys
                f.write(b">r%d\n%s\n" % (i, s))
        paths.append(p)

    logs = {"table": [], "sort": []}
    kw = dict(k=21, pre=10, bf_shift=bf_shift, bf_n_hash=4,
              chunk_size=1 << 14)
    table = yak_count_file(
        paths[0], paths[1],
        MeshYakEngine(log=lambda n, t: logs["table"].append((n, t)), **kw))
    srt = yak_count_file(
        paths[0], paths[1],
        MeshSortYakEngine(log=lambda n, t: logs["sort"].append((n, t)),
                          **kw))
    assert logs["sort"] == logs["table"]
    assert srt.tot == table.tot
    assert np.array_equal(srt.hist(), table.hist())


def test_multihost_single_process_path():
    """count_multihost degrades to the local sharded engine in a
    single-process run; histogram must match the single-device sort
    engine on the same files."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    import os

    from kmer_tpu.dist import multihost
    from kmer_tpu.pipeline.counter import SortCountEngine

    fixtures = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")
    paths = [os.path.join(fixtures, "reads_small.fq.gz"),
             os.path.join(fixtures, "sampleB.fq.gz")]
    h, nd = multihost.count_multihost(paths, k=21, block=1 << 16,
                                      max_count=1023)

    eng = SortCountEngine(k=21, block_bases=1 << 16)
    eng.count_paths(paths)
    want = eng.hist(256, max_count=1023)
    assert np.array_equal(h, want.astype(h.dtype))
    assert nd == eng._n_distinct


def test_sharded_engine_compaction_preserves_hist():
    """A tiny budget forces mid-stream compaction (raw chunks fold into
    weighted unique-key planes per device); the final histogram must be
    unchanged."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from kmer_tpu.table.compactor import KmerCompactor
    from kmer_tpu.pipeline.counter import _extract_step

    mesh = sharded.make_mesh(jax.devices()[:8], data=2, shard=4)
    k, block, lanes = 21, 2048, 1024
    batches = [np.stack([_random_ascii(block) for _ in range(8)])
               for _ in range(3)]
    batches.append(batches[0])  # repeat a batch -> cross-compaction dups

    eng = sharded.ShardedSortEngine(mesh, k, lanes_per_dest=lanes,
                                    budget_bytes=1)  # compact every batch
    for b in batches:
        eng.add_batch(jnp.asarray(b))
    assert eng.total_dropped == 0
    assert eng.weighted is not None  # compaction actually happened
    got = eng.hist(256, max_count=1023)

    comp = KmerCompactor()
    for b in batches:
        for row in b:
            hi, lo, _nk = _extract_step(jnp.asarray(row), k)
            comp.add_raw(hi, lo)
    want, want_nd = comp.hist(256, max_count=1023)
    assert np.array_equal(got, want.astype(got.dtype))
    assert eng._n_distinct == want_nd


def test_sharded_engine_overflow_auto_retries():
    """Pathological key skew (poly-A reads: every window is the same
    k-mer, all routed to one device) must not drop k-mers: the engine
    doubles lanes_per_dest and replays the batch (the static-shape form
    of the reference's buffer realloc, kc-c4.c:78-80)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from kmer_tpu.table.compactor import KmerCompactor
    from kmer_tpu.pipeline.counter import _extract_step

    mesh = sharded.make_mesh(jax.devices()[:8], data=2, shard=4)
    k, block = 21, 2048
    rows = [np.full(block, ord("A"), np.uint8) for _ in range(4)] + \
           [_random_ascii(block) for _ in range(4)]
    ascii_rows = np.stack(rows)

    # 8 rows x ~2028 windows / 8 devices = ~2028 avg, but the poly-A rows
    # concentrate ~8k identical keys on one device: 1024 lanes overflows
    eng = sharded.ShardedSortEngine(mesh, k, lanes_per_dest=1024)
    eng.add_batch(jnp.asarray(ascii_rows))
    got = eng.hist(256, max_count=1023)
    # the overflow check resolves one batch behind (dispatch pipeline);
    # by finalization the replay must have happened and dropped nothing
    assert eng.total_retries > 0
    assert eng.total_dropped == 0

    comp = KmerCompactor()
    for row in rows:
        hi, lo, _nk = _extract_step(jnp.asarray(row), k)
        comp.add_raw(hi, lo)
    want, want_nd = comp.hist(256, max_count=1023)
    assert np.array_equal(got, want.astype(got.dtype))
    assert eng._n_distinct == want_nd


@pytest.mark.parametrize("k", [21, 13])
def test_sharded_counts_for_matches_single_device(k):
    """The distributed sort-join (replicated queries + psum) must equal
    the single-chip compactor's counts_for, before and after device-side
    compaction, for both two-plane (k=21) and one-plane (k=13) keys."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from kmer_tpu.pipeline.counter import _extract_step
    from kmer_tpu.table.compactor import KmerCompactor

    mesh = sharded.make_mesh(jax.devices()[:8], data=2, shard=4)
    block, lanes = 4096, 2048
    rows = [_random_ascii(block) for _ in range(8)]
    ascii_rows = np.stack(rows)

    eng = sharded.ShardedSortEngine(mesh, k, lanes_per_dest=lanes)
    eng.add_batch(jnp.asarray(ascii_rows))
    comp = KmerCompactor(key_bits=2 * k)
    all_keys = []
    for row in rows:
        hi, lo, _nk = _extract_step(jnp.asarray(row), k)
        comp.add_raw(hi, lo)
        all_keys.append(
            (np.asarray(hi).astype(np.uint64) << np.uint64(32))
            | np.asarray(lo).astype(np.uint64)
        )
    # queries: some present keys + some absent ones
    keys = np.unique(np.concatenate(all_keys))
    present = keys[keys != np.uint64(0xFFFFFFFFFFFFFFFF)][:50]
    rng = np.random.default_rng(3)
    absent = rng.integers(0, 1 << (2 * k), 20).astype(np.uint64)
    qk = np.concatenate([present, absent])
    qhi = (qk >> np.uint64(32)).astype(np.uint32)
    qlo = (qk & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    want = comp.counts_for(qhi, qlo)
    got = eng.counts_for(qhi, qlo)
    assert np.array_equal(got, want)
    assert want[: len(present)].sum() > 0
    eng.compact()
    comp.compact()
    assert np.array_equal(eng.counts_for(qhi, qlo), comp.counts_for(qhi, qlo))


@pytest.mark.parametrize("k", [21, 13])
def test_sharded_stream_sorted_matches_classic(k, monkeypatch):
    """Stream-sorted mesh accumulation (per-device sorts + bitonic merge
    ladder under shard_map) must equal the classic chunk path on hist,
    counts_for, and compact — including mixed state after a mid-stream
    compact."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    monkeypatch.setattr(sharded, "_MESH_STREAM_CHUNK", 1 << 11)
    monkeypatch.setattr(sharded, "_MESH_STREAM_MIN", 1 << 8)
    mesh = sharded.make_mesh(jax.devices()[:8], data=2, shard=4)
    block, lanes = 4096, 2048
    rows = [_random_ascii(block) for _ in range(8)]
    ascii_rows = np.stack(rows)

    classic = sharded.ShardedSortEngine(mesh, k, lanes_per_dest=lanes,
                                        stream_sorted=False)
    stream = sharded.ShardedSortEngine(mesh, k, lanes_per_dest=lanes,
                                       stream_sorted=True)
    for eng in (classic, stream):
        eng.add_batch(jnp.asarray(ascii_rows))
        eng.add_batch(jnp.asarray(ascii_rows[::-1].copy()))
    assert stream._s_state() and not stream.chunks
    h1 = classic.hist(256, max_count=1023)
    h2 = stream.hist(256, max_count=1023)
    assert np.array_equal(h1, h2)
    assert classic._n_distinct == stream._n_distinct

    # counts_for off the pre-sorted planes
    from kmer_tpu.pipeline.counter import _extract_step

    hi0, lo0, _ = _extract_step(jnp.asarray(rows[0]), k)
    keep = np.asarray(lo0) != 0xFFFFFFFF
    qhi = np.asarray(hi0)[keep][:40]
    qlo = np.asarray(lo0)[keep][:40]
    assert np.array_equal(classic.counts_for(qhi, qlo),
                          stream.counts_for(qhi, qlo))

    # pre-sorted raw compact equals the classic compact
    classic.compact()
    stream.compact()
    assert not stream._s_state()
    h1c = classic.hist(1024, max_count=1023, min_keep=2)
    h2c = stream.hist(1024, max_count=1023, min_keep=2)
    assert np.array_equal(h1c, h2c)

    # mixed state: more raw batches on top of the compacted planes
    for eng in (classic, stream):
        eng.add_batch(jnp.asarray(ascii_rows))
    assert np.array_equal(classic.hist(256, max_count=1023),
                          stream.hist(256, max_count=1023))
