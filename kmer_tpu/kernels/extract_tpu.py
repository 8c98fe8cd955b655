"""Fused Pallas extraction: ASCII block -> sentinelized hash64 key planes.

One HBM pass per read block replaces the XLA pipeline of
encode -> 31-step rolling window -> hash64 -> sentinelize
(kmer_tpu/kernels/{encode,kmer,hash64}.py), which XLA executes as many
separate HBM round trips (~18ms per 8M block on v5e; this kernel ~2ms).

Semantics are identical to extract_canonical(apply_hash64=True) followed
by sentinelization (see kmer_tpu/pipeline/counter._extract_step), i.e.
the reference's rolling canonical k-mer loop (/root/reference/kc-c4.c:85-100)
with hash64 (/root/reference/kc-c4.c:40-50):

  per flat position i over the packed block (reads separated by one
  invalid byte): fwd = bases[i-k+1..i] 2-bit packed (base i least
  significant), rev = complement with base i most significant, canonical
  = min, hashed by the invertible hash64 mod 2^(2k); positions whose
  window contains an invalid byte (or i < k-1) emit the all-ones
  sentinel.

The k-base window is built with log2(k) doubling steps (word W_j[i] =
last 2^j bases ending at i) instead of k shifted ORs, and window
validity with the same doubling on an all-good indicator.  Tiles get the
previous tile's last row as a halo so windows crossing tile boundaries
are exact (k <= 32 < 128 guarantees one row suffices).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu



LANES = 128
I32 = jnp.int32
U32 = jnp.uint32


def _shl64(hi, lo, s):
    if s == 0:
        return hi, lo
    if s < 32:
        return (hi << s) | (lo >> (32 - s)), lo << s
    if s == 32:
        return lo, jnp.zeros_like(lo)
    return lo << (s - 32), jnp.zeros_like(lo)


def _shr64(hi, lo, s):
    if s == 0:
        return hi, lo
    if s < 32:
        return hi >> s, (lo >> s) | (hi << (32 - s))
    if s == 32:
        return jnp.zeros_like(hi), hi
    return jnp.zeros_like(hi), hi >> (s - 32)


def _add64(ahi, alo, bhi, blo):
    lo = alo + blo
    carry = (lo < alo).astype(U32)
    return ahi + bhi + carry, lo


def _hash64_planes(hi, lo, nbits):
    m_hi = np.uint32((((1 << nbits) - 1) >> 32) & 0xFFFFFFFF)
    m_lo = np.uint32(((1 << nbits) - 1) & 0xFFFFFFFF)

    def mask(h, l):
        if nbits >= 64:
            return h, l
        return h & m_hi, l & m_lo

    h, l = hi, lo
    # key = (~key + (key << 21)) & mask
    sh, sl = _shl64(h, l, 21)
    h, l = _add64(~h, ~l, sh, sl)
    h, l = mask(h, l)
    # key ^= key >> 24
    sh, sl = _shr64(h, l, 24)
    h, l = h ^ sh, l ^ sl
    # key = ((key + (key << 3)) + (key << 8)) & mask
    s3h, s3l = _shl64(h, l, 3)
    th, tl = _add64(h, l, s3h, s3l)
    s8h, s8l = _shl64(h, l, 8)
    h, l = _add64(th, tl, s8h, s8l)
    h, l = mask(h, l)
    # key ^= key >> 14
    sh, sl = _shr64(h, l, 14)
    h, l = h ^ sh, l ^ sl
    # key = ((key + (key << 2)) + (key << 4)) & mask
    s2h, s2l = _shl64(h, l, 2)
    th, tl = _add64(h, l, s2h, s2l)
    s4h, s4l = _shl64(h, l, 4)
    h, l = _add64(th, tl, s4h, s4l)
    h, l = mask(h, l)
    # key ^= key >> 28
    sh, sl = _shr64(h, l, 28)
    h, l = h ^ sh, l ^ sl
    # key = (key + (key << 31)) & mask
    sh, sl = _shl64(h, l, 31)
    h, l = _add64(h, l, sh, sl)
    return mask(h, l)


def _extract_kernel(ascii_ref, halo_ref, hi_ref, lo_ref, nk_ref, acc_ref,
                    *, k, rows, apply_hash64):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        acc_ref[0] = jnp.int32(0)

    ext_ascii = jnp.concatenate([halo_ref[7:8], ascii_ref[:]], axis=0)
    # encode_bases in i32 (the VPU here supports neither 8-bit compares
    # nor 8-bit rotates; see kernels/encode.py for the mapping)
    x = ext_ascii.astype(I32)
    upper = x & 0xDF
    is_base = (
        (upper == ord("A")) | (upper == ord("C")) | (upper == ord("G"))
        | (upper == ord("T")) | (upper == ord("U"))
    )
    g = (x >> 1) & 3
    code = g ^ (g >> 1)
    good_ext = is_base.astype(I32)
    c_ext = jnp.where(is_base, code, 0).astype(U32)

    # Doubling words over the halo'd array, combined at offsets.  The
    # combine for bit j is interleaved right after W_j is built so only
    # one doubling level is live at a time (VMEM pressure).
    # W_j: last 2^j bases ending at i, base i least significant (fwd);
    # V_j: complement, base i most significant (rev); G_j: all-good.
    # Shifts move within (rows+1, LANES) using the halo row; all offsets
    # are < 128, and words read from the halo row itself stay within it
    # (k <= 32), so only row 0 results are garbage — and row 0 is sliced
    # off below.
    max_j = k.bit_length() - 1

    def shift_full(x, d):
        # out[r, c] = x[r, c-d] for c >= d else x[r-1, 128-d+c]
        # (row 0 wraps onto itself: garbage, sliced off)
        rolled = pltpu.roll(x, d, axis=1)
        prev = jnp.concatenate([rolled[:1], rolled[:-1]], axis=0)
        c_iota = jax.lax.broadcasted_iota(I32, x.shape, 1)
        return jnp.where(c_iota >= d, rolled, prev)

    wh, wl = jnp.zeros_like(c_ext), c_ext
    vh, vl = jnp.zeros_like(c_ext), jnp.uint32(3) - c_ext
    gj = good_ext
    fwd_hi = jnp.zeros_like(c_ext)
    fwd_lo = jnp.zeros_like(c_ext)
    rev_hi = jnp.zeros_like(c_ext)
    rev_lo = jnp.zeros_like(c_ext)
    good = None
    off = 0
    for j in range(max_j + 1):
        if (k >> j) & 1:
            cwh, cwl, cvh, cvl, cg = wh, wl, vh, vl, gj
            if off:
                cwh, cwl = shift_full(cwh, off), shift_full(cwl, off)
                cvh, cvl = shift_full(cvh, off), shift_full(cvl, off)
                cg = shift_full(cg, off)
            th, tl = _shl64(cwh, cwl, 2 * off)
            fwd_hi, fwd_lo = fwd_hi | th, fwd_lo | tl
            th, tl = _shl64(cvh, cvl, 2 * (k - off - (1 << j)))
            rev_hi, rev_lo = rev_hi | th, rev_lo | tl
            good = cg if good is None else (good & cg)
            off += 1 << j
        if j < max_j:
            s = 1 << j
            sh_h, sh_l = shift_full(wh, s), shift_full(wl, s)
            sh_h, sh_l = _shl64(sh_h, sh_l, 2 * s)
            wh, wl = sh_h | wh, sh_l | wl
            th, tl = _shl64(vh, vl, 2 * s)
            vh, vl = th | shift_full(vh, s), tl | shift_full(vl, s)
            gj = gj & shift_full(gj, s)

    # slice off the halo row
    fwd_hi, fwd_lo = fwd_hi[1:], fwd_lo[1:]
    rev_hi, rev_lo = rev_hi[1:], rev_lo[1:]
    good = good[1:]

    take_fwd = (fwd_hi < rev_hi) | ((fwd_hi == rev_hi) & (fwd_lo <= rev_lo))
    can_hi = jnp.where(take_fwd, fwd_hi, rev_hi)
    can_lo = jnp.where(take_fwd, fwd_lo, rev_lo)
    if k == 32:
        # x86-64 reference semantics: mask = (1ULL << 64) - 1 evaluates
        # with a mod-64 shift to 0, so every k=32 canonical key is 0
        # (see kernels/kmer.py) — reproduced for bit-identical output
        can_hi = jnp.zeros_like(can_hi)
        can_lo = jnp.zeros_like(can_lo)
    if apply_hash64:
        can_hi, can_lo = _hash64_planes(can_hi, can_lo, 2 * k)

    # validity: all k bytes good AND global flat position >= k-1
    # (computed in i32 — mixing data-derived and iota-derived bools trips
    # a Mosaic relayout bug)
    r_iota = jax.lax.broadcasted_iota(I32, (rows, LANES), 0)
    c_iota = jax.lax.broadcasted_iota(I32, (rows, LANES), 1)
    gpos = (t * rows + r_iota) * LANES + c_iota
    valid = good * (gpos >= (k - 1)).astype(I32)

    hi_ref[:] = jnp.where(valid > 0, can_hi, U32(0xFFFFFFFF))
    lo_ref[:] = jnp.where(valid > 0, can_lo, U32(0xFFFFFFFF))
    acc_ref[0] = acc_ref[0] + jnp.sum(valid)

    @pl.when(t == pl.num_programs(0) - 1)
    def _():
        nk_ref[0] = acc_ref[0]


@functools.partial(jax.jit, static_argnames=("k", "apply_hash64", "tile_rows"))
def extract_hashed_tpu(ascii_u8, k, apply_hash64=True, tile_rows=1024):
    """(hi, lo, n_kmers): sentinelized hash64 key planes for a packed
    ASCII block (flat uint8, reads separated by an invalid byte).
    N must be a multiple of tile_rows*128."""
    assert 1 <= k <= 32
    n = ascii_u8.shape[0]
    tile = tile_rows * LANES
    assert n % tile == 0, (n, tile)
    n_tiles = n // tile
    a2 = ascii_u8.reshape(n_tiles * tile_rows, LANES)
    spec = pl.BlockSpec((tile_rows, LANES), lambda t: (t, 0),
                        memory_space=pltpu.VMEM)
    # 8-row halo block (Mosaic requires >= 8 sublanes); only its last
    # row — the final row of the previous tile — is used.
    halo_spec = pl.BlockSpec(
        (8, LANES),
        lambda t: (jnp.maximum(t * (tile_rows // 8) - 1, 0), 0),
        memory_space=pltpu.VMEM,
    )
    kernel = functools.partial(
        _extract_kernel, k=k, rows=tile_rows, apply_hash64=apply_hash64
    )
    hi, lo, nk = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[spec, halo_spec],
        out_specs=(
            spec,
            spec,
            pl.BlockSpec((1,), lambda t: (0,), memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_tiles * tile_rows, LANES), U32),
            jax.ShapeDtypeStruct((n_tiles * tile_rows, LANES), U32),
            jax.ShapeDtypeStruct((1,), I32),
        ),
        scratch_shapes=[pltpu.SMEM((1,), I32)],
    )(a2, a2)
    return hi.reshape(n), lo.reshape(n), nk[0]
