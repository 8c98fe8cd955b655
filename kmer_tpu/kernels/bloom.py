"""Blocked bloom filter — TPU-native equivalent of yak_bf_t.

Replicates the probe math of yak_bf_insert exactly
(/root/reference/yak-count.c:69-108): 512-bit cache-line blocks
(YAK_BLK_SHIFT 9), double-hashing probe z += h2 within the block, and
the (h2&31)==0 adjustment.  yak keeps one bloom per prefix subtable
(yak-count.c:122-125) keyed by x = y >> pre with local size
2^(n_shift - pre) bits; we lay those subtable blooms out contiguously:
global bit = pre_idx << (n_shift - pre) | local bit.

Storage is one byte per bit.  This costs 8x the memory of a packed
bitset but buys an exact vectorized OR-scatter: setting a bit is
`bits.at[idx].max(1)`, which is idempotent and duplicate-safe, with no
atomics or read-modify-write races.  (A packed bitset would need a
bitwise-OR scatter combiner, which XLA does not provide.)

Batch semantics: `insert` tests every lane against the *pre-batch*
state, then sets all probed bits.  Within-batch duplicate handling
(first occurrence sets, later occurrences pass) is reconstructed by the
caller via first-occurrence ranking (see count_table.insert_gated);
cross-key bit sharing *within one batch* is the only divergence from
the sequential reference, and it is invisible in yak-count's final
output (pass-2 recount + shrink make the result bloom-independent).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp

from . import u64 as u

BLK_SHIFT = 9  # 512-bit blocks, yak-count.c:13
BLK_MASK = (1 << BLK_SHIFT) - 1


class BloomSpec(NamedTuple):
    pre: int  # prefix bits (subtable count = 2^pre)
    n_shift: int  # total bloom size = 2^n_shift bits across all subtables
    n_hashes: int
    # multi-chip partitioning: a device owning keys with
    # lo & (n_dev - 1) == d holds only the 2^(pre - owner_bits) subtable
    # blooms whose prefix is congruent to d; probe VALUES per key are
    # identical to the owner_bits=0 layout (the low owner_bits of the
    # prefix index are constant on a device and drop out of the base),
    # so sharding never changes which keys a bloom admits.
    owner_bits: int = 0


def make_bits(spec: BloomSpec) -> jnp.ndarray:
    total_bits = 1 << (spec.n_shift - spec.owner_bits)
    assert spec.n_shift - spec.owner_bits <= 31, (
        "per-shard bloom limited to 2^31 bits (engines clamp -b via "
        "pipeline.yak._clamp_bf_shift)"
    )
    local_shift = spec.n_shift - spec.pre
    assert BLK_SHIFT <= local_shift, "bloom smaller than one block per subtable"
    assert spec.owner_bits <= spec.pre
    return jnp.zeros((total_bits,), jnp.uint8)


def _probe_indices(keys: u.U64, spec: BloomSpec):
    """Global byte-per-bit indices of the n_hashes probes for each lane."""
    local_shift = spec.n_shift - spec.pre  # per-subtable bloom bits
    xs = local_shift - BLK_SHIFT  # block index bits
    pre_idx = (keys.lo & jnp.uint32((1 << spec.pre) - 1)) >> spec.owner_bits
    x = u.shr(keys, spec.pre)
    blk = u.shr(x, 0).lo & jnp.uint32((1 << xs) - 1) if xs < 32 else x.lo
    h1 = (u.shr(x, xs).lo & jnp.uint32(BLK_MASK)).astype(jnp.int32)
    h2 = (u.shr(x, local_shift).lo & jnp.uint32(BLK_MASK)).astype(jnp.int32)
    # avoid cycling over few bits (yak-count.c:99)
    h2 = jnp.where((h2 & 31) == 0, (h2 + 1) & BLK_MASK, h2)
    base = (
        pre_idx.astype(jnp.int64) << local_shift
        if spec.n_shift > 31
        else (pre_idx.astype(jnp.int32) << local_shift)
    )
    base = base + (blk.astype(jnp.int32) << BLK_SHIFT)
    idxs = []
    z = h1
    for _ in range(spec.n_hashes):
        idxs.append(base + z)
        z = (z + h2) & BLK_MASK
    return idxs


def insert(
    bits: jnp.ndarray, keys: u.U64, valid: jnp.ndarray, spec: BloomSpec
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Test-and-set all probes.  Returns (bits', preset) where preset[i]
    is True iff all n_hashes bits were set before this batch
    (the `yak_bf_insert(...) == n_hash` gate, yak-count.c:162-163)."""
    idxs = _probe_indices(keys, spec)
    n = bits.shape[0]
    # read all probes against the pre-batch state first, then set
    preset = jnp.ones_like(valid)
    for ix in idxs:
        preset = preset & (bits[jnp.where(valid, ix, 0)] == 1)
    for ix in idxs:
        ixs = jnp.where(valid, ix, n)
        bits = bits.at[ixs].max(jnp.uint8(1), mode="drop")
    return bits, preset & valid


def test(bits: jnp.ndarray, keys: u.U64, valid: jnp.ndarray, spec: BloomSpec) -> jnp.ndarray:
    """Pure membership test (all bits set), no mutation."""
    idxs = _probe_indices(keys, spec)
    ok = jnp.ones_like(valid)
    for ix in idxs:
        ok = ok & (bits[jnp.where(valid, ix, 0)] == 1)
    return ok & valid
