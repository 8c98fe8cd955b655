"""Static k-mer -> value map for the vaf-counter pattern lookup.

The reference builds a cached-hash khashl CMAP of canonical k-mer ->
(pattern_index << 1 | is_alt) (create_combined_kmer_map,
/root/reference/vaf-counter.c:194-252).  Here the map is built on the
host in numpy (tens of thousands of keys) directly into CountTable
planes — same slot hash and linear probing as the device kernels, so
device-side `count_table.get` can probe it.  First writer wins on
duplicate canonical k-mers; the duplicate count is returned so the CLI
can emit the reference's collision warning (vaf-counter.c:246-249).
"""

from __future__ import annotations

from typing import List, Tuple

import jax.numpy as jnp
import numpy as np

from ..utils.seq import slot_mix32_np
from . import count_table as ct


def build(keys_u64: List[int], values: List[int]) -> Tuple[ct.CountTable, int]:
    n = len(keys_u64)
    cap = 1 << max(8, int(np.ceil(np.log2(max(n, 1) * 2))))
    state = np.zeros(cap, np.uint8)
    key_hi = np.zeros(cap, np.uint32)
    key_lo = np.zeros(cap, np.uint32)
    cnt = np.zeros(cap, np.uint32)
    mask = cap - 1
    n_collisions = 0
    n_full = 0
    slots0 = slot_mix32_np(np.asarray(keys_u64, np.uint64)) & np.uint32(mask)
    for i in range(n):
        key = int(keys_u64[i])
        hi, lo = (key >> 32) & 0xFFFFFFFF, key & 0xFFFFFFFF
        s = int(slots0[i])
        while True:
            if state[s] == ct.EMPTY:
                state[s] = ct.FULL
                key_hi[s] = hi
                key_lo[s] = lo
                cnt[s] = values[i]
                n_full += 1
                break
            if key_hi[s] == hi and key_lo[s] == lo:
                n_collisions += 1  # first value wins (absent==0 branch)
                break
            s = (s + 1) & mask
    table = ct.CountTable(
        state=jnp.asarray(state),
        key_hi=jnp.asarray(key_hi),
        key_lo=jnp.asarray(key_lo),
        cnt=jnp.asarray(cnt),
        n_full=jnp.asarray(n_full, jnp.int32),
    )
    return table, n_collisions
