#!/usr/bin/env python3
"""Multi-chip scaling benchmark for the sharded sort engine.

Runs canonical k-mer counting over 1, 2, 4, ..., N devices (whatever
`jax.devices()` offers — real chips on a pod slice, or virtual CPU
devices with --cpu 8 for a logic check) and reports, per device count:

  - aggregate / per-chip throughput and wall-clock scaling efficiency
    (meaningful on real chips; on virtual CPU devices every "device"
    shares the host cores, so wall efficiency measures added engine
    OVERHEAD, not chip scaling — SCALING.md explains the split),
  - the all_to_all communication volume: routed send-buffer bytes per
    device per batch (what the collective actually moves), the fraction
    that crosses ICI ((n-1)/n — each device keeps its own destination
    slice), measured valid-lane occupancy, and payload bytes per base.

The communication numbers are the ground truth for the v5e-16
projection in SCALING.md: the buffers are static-shaped (lanes set by
default_lanes_per_dest), so volume is exact, and occupancy is measured
from the engine's globally-psum'd k-mer counter on a real run.

Writes all rows + run config to --out (default SCALING.json at the
repo root).

Usage: python scripts/scaling_bench.py --cpu 8 --bases-per-device 2097152
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

READ_LEN = 150


def make_rows(rng, n_rows, block):
    rows = []
    for _ in range(n_rows):
        b = rng.choice(np.frombuffer(b"ACGT", np.uint8), size=block)
        b[::READ_LEN + 1] = 0
        rows.append(b)
    return np.stack(rows)


def run(devices, k, block, n_batches, lanes):
    """Time n_batches of streaming ingest + the final histogram on the
    first len(devices) devices; returns (aggregate Mbases/s, stats)."""
    mesh = sharded.make_mesh(devices)
    n = len(devices)
    rng = np.random.default_rng(0)
    batches = [jnp.asarray(make_rows(rng, n, block)) for _ in range(n_batches)]
    eng = sharded.ShardedSortEngine(mesh, k, lanes_per_dest=lanes)
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
    planes = 1 if eng.one_plane else 2
    # communication accounting (see module docstring): the routed
    # send buffer is (n_dev * lanes) lanes x planes x u32 per device;
    # all_to_all keeps the own-destination 1/n slice local
    buf_bytes_dev_batch = n * lanes * planes * 4
    ici_bytes_dev_batch = buf_bytes_dev_batch * (n - 1) // n
    kmers_batch = eng.total_kmers / n_batches  # measured (psum'd) valid lanes
    occupancy = kmers_batch / (n * n * lanes)  # valid / total buffer lanes
    stats = {
        "lanes_per_dest": lanes,
        "planes": planes,
        "send_buffer_bytes_per_device_per_batch": buf_bytes_dev_batch,
        "ici_bytes_per_device_per_batch": ici_bytes_dev_batch,
        "measured_kmers_per_batch": int(kmers_batch),
        "buffer_occupancy": round(occupancy, 4),
        "ici_bytes_per_base": round(ici_bytes_dev_batch / block, 3),
        "retries": eng.total_retries,
    }
    return bases / 1e6 / dt, stats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bases-per-device", type=int, default=1 << 23)
    ap.add_argument("--batches", type=int, default=4)
    ap.add_argument("--k", type=int, default=31)
    ap.add_argument("--cpu", type=int, default=0,
                    help="use N virtual CPU devices (logic check)")
    ap.add_argument("--out", default=None,
                    help="write SCALING-style JSON artifact here")
    ap.add_argument("--devices-list", default=None,
                    help="comma-separated device counts to measure "
                         "(default: 1,2,4,..,N); bench-scale runs on the "
                         "1-core CI box use 1,8 to bound wall time")
    args = ap.parse_args()
    devs = jax.devices()
    block = args.bases_per_device
    results = {}
    rows = []
    from kmer_tpu.dist.sharded import default_lanes_per_dest

    if args.devices_list:
        counts = [int(x) for x in args.devices_list.split(",")]
    else:
        counts, n = [], 1
        while n <= len(devs):
            counts.append(n)
            n *= 2
    for n in counts:
        lanes = default_lanes_per_dest(block, n)
        mbs, stats = run(devs[:n], args.k, block, args.batches, lanes)
        results[n] = mbs
        eff = mbs / (n * results[1]) if n > 1 and 1 in results else None
        row = {
            "devices": n,
            "aggregate_mbases_s": round(mbs, 1),
            "per_chip_mbases_s": round(mbs / n, 1),
            "scaling_efficiency": round(eff, 3) if eff is not None else None,
            **stats,
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
    if args.out:
        artifact = {
            "backend": jax.default_backend(),
            "virtual_cpu_devices": args.cpu or None,
            "host_cores": os.cpu_count(),
            "k": args.k,
            "read_len": READ_LEN,
            "bases_per_device_per_batch": block,
            "batches": args.batches,
            "note": ("wall efficiency on virtual CPU devices measures engine "
                     "overhead only (devices share host cores); the ICI byte "
                     "columns are the hardware-independent ground truth for "
                     "the v5e projection in SCALING.md"),
            "rows": rows,
        }
        with open(args.out, "w") as f:
            json.dump(artifact, f, indent=1)
            f.write("\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
