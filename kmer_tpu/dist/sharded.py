"""Multi-chip sharded k-mer counting over a device mesh.

This is the distributed form of the reference's central concurrency
trick (SURVEY.md §2.3 P3): kc-c4 routes each hashed k-mer to one of
2^p subtables by its low bits so each worker owns whole subtables and
insertion is lock-free (/root/reference/kc-c4.c:74-83,116-128).  Here
the same routing becomes the mesh layout:

  mesh axes ("data", "shard")
    data  — read blocks are data-parallel across this axis (the P2
            block parallelism of kc-c4.c:151)
    shard — the count table is partitioned by the low bits of the
            hashed k-mer; an all_to_all over ICI delivers every k-mer
            to its owning chip (the c4x_insert_buf routing made
            physical), where the insert is chip-local and conflict-free

  pipeline parallelism (P1) stays on the host: the prefetch thread in
  kmer_tpu.pipeline overlaps IO with device steps.  No sequence/expert
  parallelism exists in this workload (SURVEY.md §2.3 P6): reads are
  independent 100bp windows, so "sp" degenerates into dp.

Histograms merge with jax.lax.psum over both axes (the per-thread
count-array reduction of kc-c4.c:227-230).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..kernels import u64 as u
from ..kernels.encode import encode_bases
from ..kernels.kmer import extract_canonical
from ..table import count_table as ct


def make_mesh(devices=None, data: Optional[int] = None, shard: Optional[int] = None) -> Mesh:
    """Build a ("data", "shard") mesh.  With no sizes given, picks the
    most square power-of-two-ish factorization of the device count."""
    devices = jax.devices() if devices is None else devices
    n = len(devices)
    if data is None or shard is None:
        shard = 1
        for s in range(int(math.isqrt(n)), 0, -1):
            if n % s == 0:
                data, shard = s, n // s
                break
    assert data * shard == n
    dev_array = np.asarray(devices).reshape(data, shard)
    return Mesh(dev_array, ("data", "shard"))


def _bucketize(keys: u.U64, valid, dest, n_dest: int, lanes: int):
    """Scatter lanes into (n_dest, lanes) fixed send buffers, preserving
    lane order within each destination (the linear per-prefix buffers of
    kc-c4.c:69-83 with static shapes).  Returns buffers + overflow count."""
    send_hi = jnp.zeros((n_dest, lanes), jnp.uint32)
    send_lo = jnp.zeros((n_dest, lanes), jnp.uint32)
    send_ok = jnp.zeros((n_dest, lanes), jnp.bool_)
    n_drop = jnp.zeros((), jnp.int32)
    for d in range(n_dest):
        m = valid & (dest == d)
        pos = jnp.cumsum(m.astype(jnp.int32)) - 1
        total = jnp.sum(m.astype(jnp.int32))
        idx = jnp.where(m & (pos < lanes), pos, lanes)
        send_hi = send_hi.at[d, idx].set(keys.hi, mode="drop")
        send_lo = send_lo.at[d, idx].set(keys.lo, mode="drop")
        send_ok = send_ok.at[d, idx].set(True, mode="drop")
        n_drop = n_drop + jnp.maximum(total - lanes, 0)
    return send_hi, send_lo, send_ok, n_drop


def sharded_count_step_fn(mesh: Mesh, k: int, max_count: Optional[int],
                          lanes_per_dest: int):
    """Build the jitted multi-chip counting step.

    tables: CountTable with planes shaped (D, S, cap_local), sharded
            P("data", "shard", None)
    ascii:  (D*S, block) uint8, rows sharded over both axes
    Returns (tables', n_new_total, n_dropped_total).
    """
    n_shard = mesh.shape["shard"]

    def per_device(table_planes, ascii_row):
        state, key_hi, key_lo, cnt, n_full = table_planes
        local = ct.CountTable(state[0, 0], key_hi[0, 0], key_lo[0, 0],
                              cnt[0, 0], n_full[0, 0])
        codes = encode_bases(ascii_row[0])
        out = extract_canonical(codes, k, apply_hash64=True)
        # route by low bits of the hashed k-mer (kc-c4.c:76 `y & (2^p-1)`)
        dest = (out.kmer.lo & jnp.uint32(n_shard - 1)).astype(jnp.int32)
        s_hi, s_lo, s_ok, n_drop = _bucketize(
            out.kmer, out.valid, dest, n_shard, lanes_per_dest
        )
        r_hi = jax.lax.all_to_all(s_hi, "shard", 0, 0, tiled=True)
        r_lo = jax.lax.all_to_all(s_lo, "shard", 0, 0, tiled=True)
        r_ok = jax.lax.all_to_all(s_ok, "shard", 0, 0, tiled=True)
        keys = u.U64(r_hi.reshape(-1), r_lo.reshape(-1))
        local, n_new = ct.insert(local, keys, r_ok.reshape(-1), max_count)
        n_new_tot = jax.lax.psum(jax.lax.psum(n_new, "shard"), "data")
        n_drop_tot = jax.lax.psum(jax.lax.psum(n_drop, "shard"), "data")
        planes = (
            local.state[None, None],
            local.key_hi[None, None],
            local.key_lo[None, None],
            local.cnt[None, None],
            local.n_full[None, None],
        )
        return planes, n_new_tot, n_drop_tot

    table_spec = (
        P("data", "shard", None),
        P("data", "shard", None),
        P("data", "shard", None),
        P("data", "shard", None),
        P("data", "shard"),
    )
    fn = shard_map(
        per_device,
        mesh=mesh,
        in_specs=(table_spec, P(("data", "shard"), None)),
        out_specs=(table_spec, P(), P()),
        check_vma=False,
    )
    return jax.jit(fn, donate_argnums=(0,))


def sharded_hist_fn(mesh: Mesh, n_bins: int):
    """Jitted global histogram: local bincount + psum over both axes
    (the reduction of kc-c4.c:219-233)."""

    def per_device(table_planes):
        state, key_hi, key_lo, cnt, n_full = table_planes
        local = ct.CountTable(state[0, 0], key_hi[0, 0], key_lo[0, 0],
                              cnt[0, 0], n_full[0, 0])
        h = ct.hist(local, n_bins)
        return jax.lax.psum(jax.lax.psum(h, "shard"), "data")

    table_spec = (
        P("data", "shard", None),
        P("data", "shard", None),
        P("data", "shard", None),
        P("data", "shard", None),
        P("data", "shard"),
    )
    fn = shard_map(
        per_device, mesh=mesh, in_specs=(table_spec,), out_specs=P(),
        check_vma=False,
    )
    return jax.jit(fn)


def make_sharded_tables(mesh: Mesh, cap_local: int):
    """Allocate (D, S, cap_local) table planes with the mesh sharding."""
    d, s = mesh.shape["data"], mesh.shape["shard"]
    specs = [
        P("data", "shard", None),
        P("data", "shard", None),
        P("data", "shard", None),
        P("data", "shard", None),
        P("data", "shard"),
    ]
    arrays = (
        jnp.zeros((d, s, cap_local), jnp.uint8),
        jnp.zeros((d, s, cap_local), jnp.uint32),
        jnp.zeros((d, s, cap_local), jnp.uint32),
        jnp.zeros((d, s, cap_local), jnp.uint32),
        jnp.zeros((d, s), jnp.int32),
    )
    return tuple(
        jax.device_put(a, NamedSharding(mesh, sp)) for a, sp in zip(arrays, specs)
    )
