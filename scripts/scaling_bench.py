#!/usr/bin/env python3
"""Multi-chip scaling benchmark for the sharded sort engine.

Runs canonical 31-mer counting over 1, 2, 4, ..., N devices (whatever
`jax.devices()` offers — real chips on a pod slice, or virtual CPU
devices with XLA_FLAGS=--xla_force_host_platform_device_count=8 for a
logic check) and reports per-chip throughput and scaling efficiency
vs the single-device run.

Usage: python scripts/scaling_bench.py [--bases-per-device 8388608]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# --cpu N must take effect before backend init; the container's TPU
# plugin overrides the JAX_PLATFORMS env var, so set the config directly
if "--cpu" in sys.argv:
    _n = int(sys.argv[sys.argv.index("--cpu") + 1])
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", _n)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from kmer_tpu.dist import sharded  # noqa: E402

K = 31
READ_LEN = 150


def make_rows(rng, n_rows, block):
    rows = []
    for _ in range(n_rows):
        b = rng.choice(np.frombuffer(b"ACGT", np.uint8), size=block)
        b[::READ_LEN + 1] = 0
        rows.append(b)
    return np.stack(rows)


def run(devices, block, n_batches, lanes):
    mesh = sharded.make_mesh(devices)
    n = len(devices)
    rng = np.random.default_rng(0)
    batches = [jnp.asarray(make_rows(rng, n, block)) for _ in range(n_batches)]
    eng = sharded.ShardedSortEngine(mesh, K, lanes_per_dest=lanes)
    # warm at the SAME accumulated shapes as the timed run: the final
    # hist (and each first-time stream-merge level) compiles at the
    # n_batches state, so a 1-batch warmup would leave 1-4 min remote
    # compiles inside the timed section (CLAUDE.md)
    for b in batches:
        eng.add_batch(b)
    _ = eng.hist(256, max_count=1023)
    eng.reset()
    t0 = time.time()
    for b in batches:
        eng.add_batch(b)
    h = eng.hist(256, max_count=1023)
    dt = time.time() - t0
    bases = n * block * n_batches
    assert h.sum() > 0 and eng.total_dropped == 0
    return bases / 1e6 / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bases-per-device", type=int, default=1 << 23)
    ap.add_argument("--batches", type=int, default=4)
    ap.add_argument("--cpu", type=int, default=0,
                    help="use N virtual CPU devices (logic check)")
    args = ap.parse_args()
    devs = jax.devices()
    block = args.bases_per_device
    # lanes must hold ~block/n_dev keys per destination with slack
    results = {}
    from kmer_tpu.dist.sharded import default_lanes_per_dest

    n = 1
    while n <= len(devs):
        lanes = default_lanes_per_dest(block, n)
        mbs = run(devs[:n], block, args.batches, lanes)
        results[n] = mbs
        eff = mbs / (n * results[1]) if n > 1 else 1.0
        print(json.dumps({
            "devices": n,
            "aggregate_mbases_s": round(mbs, 1),
            "per_chip_mbases_s": round(mbs / n, 1),
            "scaling_efficiency": round(eff, 3),
        }))
        n *= 2
    return 0


if __name__ == "__main__":
    sys.exit(main())
