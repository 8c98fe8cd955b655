"""Multi-host runtime: jax.distributed init, per-host input sharding,
and the cross-host driver loop for the sharded sort engine.

The reference is single-node shared memory (pthreads + atomics,
SURVEY.md §2.3 P7) — this module is the new-build territory SURVEY.md §5
(last row) calls for: FASTQ files data-parallel across hosts over DCN,
k-mer routing by hash prefix across chips over ICI
(kmer_tpu.dist.sharded), histogram merges via psum, process-0 output.

Host coordination: every host must participate in every collective, but
file shards drain at different rates, so each step first agrees (one
tiny psum) whether any host still has data; exhausted hosts contribute
all-zero blocks (zero bytes are invalid bases — no k-mers, no effect).
"""

from __future__ import annotations

import os
from typing import Iterator, List, Optional, Sequence

import numpy as np

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from ..pipeline.counter import _iter_packed
from . import sharded


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """jax.distributed.initialize with env-var defaults
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID, or
    the cluster auto-detection JAX ships for TPU pods).  Call before any
    other JAX use on every host.  A single-process run needs no init."""
    if num_processes in (None, 1) and os.environ.get("JAX_NUM_PROCESSES", "1") == "1" \
            and coordinator_address is None:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def shard_files(paths: Sequence[str], process_index: Optional[int] = None,
                process_count: Optional[int] = None) -> List[str]:
    """Deterministic round-robin file assignment for this host (the
    multi-host form of the reference's one-reader kt_pipeline step 0)."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    return [p for i, p in enumerate(paths) if i % pc == pi]


def _local_batches(paths: Sequence[str], k: int, block: int,
                   n_local_rows: int) -> Iterator[np.ndarray]:
    """Pack this host's files into (n_local_rows, block) uint8 batches."""
    rows = []
    for buf, _nb, _ns, _rb in _iter_packed(paths, k, block, block):
        b = buf if buf.shape[0] == block else np.pad(buf, (0, block - buf.shape[0]))
        rows.append(b)
        if len(rows) == n_local_rows:
            yield np.stack(rows)
            rows = []
    if rows:
        pad = [np.zeros(block, np.uint8)] * (n_local_rows - len(rows))
        yield np.stack(rows + pad)


def count_multihost(paths: Sequence[str], k: int,
                    block: int = 4_194_304,
                    lanes_per_dest: Optional[int] = None,
                    n_bins: int = 256,
                    max_count: Optional[int] = 1023,
                    min_keep: int = 1,
                    queries=None):
    """Count canonical k-mers across every device of every host.

    Returns (hist, n_distinct) replicated on all hosts — plus, when
    `queries` = (query_hi, query_lo) numpy arrays IDENTICAL on every
    host, the distributed sort-join counts for those keys (the
    multi-host vaf path).  Callers print from process 0 only.
    Single-process invocations degrade to the plain sharded engine over
    the local devices."""
    mesh = sharded.make_mesh(jax.devices())
    n_dev = len(jax.devices())
    n_local = len(jax.local_devices())
    if lanes_per_dest is None:
        lanes_per_dest = sharded.default_lanes_per_dest(block, n_dev)
    eng = sharded.ShardedSortEngine(mesh, k, lanes_per_dest=lanes_per_dest)
    global_sharding = NamedSharding(mesh, P(("data", "shard"), None))

    local_it = _local_batches(
        shard_files(paths), k, block, n_local
    )

    while True:
        local = next(local_it, None)
        has = local is not None
        if jax.process_count() > 1:
            # agree on continuation: every host must step together
            from jax.experimental import multihost_utils

            flags = multihost_utils.process_allgather(
                np.asarray(1 if has else 0, np.int32)
            )
            if int(np.sum(flags)) == 0:
                break
        elif not has:
            break
        if not has:
            local = np.zeros((n_local, block), np.uint8)
        global_rows = jax.make_array_from_process_local_data(
            global_sharding, local
        )
        eng.add_batch(global_rows)
    if eng.total_retries and jax.process_index() == 0:
        import sys

        sys.stderr.write(
            f"[W::count_multihost] key skew overflowed the routing "
            f"buffers {eng.total_retries}x; auto-doubled the send lanes "
            f"and replayed (no k-mers dropped)\n"
        )
    h = eng.hist(n_bins, max_count=max_count, min_keep=min_keep)
    if queries is not None:
        qc = eng.counts_for(queries[0], queries[1])
        return h, eng._n_distinct, qc
    return h, eng._n_distinct
