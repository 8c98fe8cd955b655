#!/usr/bin/env python3
"""Probe the yak bloom/stderr-sim tap at TPU bench shapes, block by
block, to isolate the 'TPU worker process crashed' seen when the
round-4 bench first ran the tap at full scale (BENCH trial 2).

Runs the same YakEngine tap the CLI default uses (tools/yak_count.py)
over device-generated blocks of the e2e bench geometry, growing the
scale step by step and forcing a sync after each ingest so the crash
(if any) is attributed to a specific block count / table size.

Usage: python scripts/yak_tap_probe.py [n_blocks=4] [bf_shift=30]
"""

import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
logging.getLogger("jax._src.xla_bridge").setLevel(logging.ERROR)

import numpy as np

import jax
import jax.numpy as jnp


def main(argv):
    n_blocks = int(argv[1]) if len(argv) > 1 else 4
    bf_shift = int(argv[2]) if len(argv) > 2 else 30
    from kmer_tpu.pipeline.counter import _extract_step_packed_structural
    from kmer_tpu.pipeline.yak import YakSimTap as YakEngine

    k = 31
    read_len = 150
    rb = read_len + 1
    block_bases = 10_000_000
    capacity = block_bases + max(4096, block_bases // 32)
    packed_len = capacity // 4
    reads_per_block = block_bases // read_len + 1
    n_used = reads_per_block * rb

    genome = jax.random.randint(
        jax.random.key(1), (24 << 20,), 0, 4, dtype=jnp.uint8)

    @jax.jit
    def gen_block(key):
        starts = jax.random.randint(
            key, (reads_per_block,), 0, genome.shape[0] - read_len)
        idx = starts[:, None] + jnp.arange(read_len)[None, :]
        codes = jnp.take(genome, idx)
        rows = jnp.concatenate(
            [codes, jnp.zeros((reads_per_block, 1), jnp.uint8)], axis=1)
        flat = jnp.zeros((packed_len * 4,), jnp.uint8)
        flat = flat.at[: reads_per_block * rb].set(rows.reshape(-1))
        q = flat.reshape(packed_len, 4).astype(jnp.uint32)
        return (q[:, 0] | (q[:, 1] << 2) | (q[:, 2] << 4)
                | (q[:, 3] << 6)).astype(jnp.uint8)

    t0 = time.time()
    x = np.asarray(jnp.zeros((8,), jnp.uint32) + 1)
    print(f"first op {time.time()-t0:.1f}s "
          f"({jax.devices()[0].device_kind})", flush=True)

    sim = YakEngine(k=k, pre=10, bf_shift=bf_shift, bf_n_hash=4,
                    chunk_size=block_bases, log=lambda *a: None)
    sim.begin_batches()
    nu = jnp.uint32(n_used)
    for i in range(n_blocks):
        t0 = time.time()
        b = gen_block(jax.random.key(100 + i))
        hi, lo, nk = _extract_step_packed_structural(b, nu, k, rb)
        t1 = time.time()
        sim.ingest_planes(hi, lo, nk, reads_per_block, True)
        t2 = time.time()
        # deferred tap: streaming appends cost at most a hidden chunk
        # sort (stream mode) or nothing (classic); sync the newest
        # stored plane so a crash is still attributed to a specific
        # block
        fs = sim.adm.fs
        if fs.stream_sorted:
            if fs.stream.pending:
                src = fs.stream.pending[-1][0]
            elif fs.stream.ladder:
                src = next(iter(fs.stream.ladder.values()))[0]
            else:
                src = fs._compacted[0]
        else:
            src = fs.runs[-1][0]
        np.asarray(src[:8])
        print(f"block {i}: extract {t1-t0:.1f}s ingest(dispatch) "
              f"{t2-t1:.1f}s sync {time.time()-t2:.1f}s", flush=True)
    t0 = time.time()
    sim.finish_batches()
    print(f"finish (deferred admission resolve) {time.time()-t0:.1f}s "
          f"tot={sim.tot}", flush=True)
    print("tap probe OK", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
