"""Single-pass segment-length extraction over sorted key planes (Pallas).

After the compactor's global sort (kmer_tpu/table/compactor.py), turning
sorted (hi, lo) key planes into a count histogram previously took four
more full-array XLA passes (segment starts, cummax of start positions,
cumsum of weights, masked one-hot binning) — ~0.6s for 400M lanes on a
v5e, vs 4ms of raw HBM reads.  This kernel does the segment math in ONE
pass: a sequential Pallas grid walks tile-by-tile, carrying (previous
key, open-run length) in SMEM scratch, and emits, at each lane i, the
total length of the segment that ENDED at lane i-1 (0 if none).  The
histogram of those emissions (computed with the existing chunked
one-hot/bincount helper) equals the reference's per-key count histogram
(print_hist, /root/reference/kc-c1.c:66-77; yak_ch_hist,
/root/reference/yak-count.c:208-241).

The in-tile "run length ending at lane i" is a segmented inclusive scan
in flat row-major order, done with log2(tile) shifted combines:
  state (f, v): f = "a segment start was seen", v = run length
  combine(left, right) = (f_l | f_r, f_r ? v_r : v_r + v_l)
Flat shifts decompose into a lane roll plus a row shift for the wrapped
lanes (shift < 128) or a pure row shift (multiples of 128).

Weighted lanes (pre-counted runs from earlier compactions) use the same
scan with v initialized to the lane's weight instead of 1.
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
SENT = np.uint32(0xFFFFFFFF)


def _flat_shift(x, step, rows):
    """x shifted by `step` positions in flat row-major order, zeros in.

    out[r, c] = x at flat index (r*128 + c - step), or 0 if negative.
    """
    zero = jnp.zeros_like(x)
    if step % LANES == 0:
        rs = step // LANES
        if rs >= rows:
            return zero
        return jnp.concatenate([zero[:rs], x[:-rs]], axis=0)
    # step < 128 (all non-multiples we use are < 128)
    assert step < LANES
    rolled = pltpu.roll(x, step, axis=1)  # (r, c) <- (r, (c - step) % 128)
    # lanes c < step wrapped from the row's end; they need the previous row
    prev_row = jnp.concatenate([zero[:1], rolled[:-1]], axis=0)
    c_iota = jax.lax.broadcasted_iota(I32, x.shape, 1)
    return jnp.where(c_iota >= step, rolled, prev_row)


def _seg_emit_kernel(*refs, rows, weighted, bins_cfg=None):
    """One tile: emit, per lane, the closed segment's total length — or,
    with bins_cfg=(n_bins, max_count, min_keep), the pre-clamped
    histogram bin index as a narrow integer (u8/u16), shrinking the
    downstream histogram pass's input 4-8x.

    carry_ref (SMEM, i32[4]): [prev_hi, prev_lo, open_run_len, spare]
    final_ref (SMEM out, i32[4]): [last_hi, last_lo, last_run_len, n_tiles]
    """
    if weighted:
        hi_ref, lo_ref, w_ref, out_ref, final_ref, carry_ref = refs
    else:
        hi_ref, lo_ref, out_ref, final_ref, carry_ref = refs
        w_ref = None
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        carry_ref[0] = jnp.int32(-1)  # bitcast of SENT
        carry_ref[1] = jnp.int32(-1)
        carry_ref[2] = jnp.int32(0)

    hi = hi_ref[:]
    lo = lo_ref[:]
    carry_hi = carry_ref[0].astype(jnp.int32)
    carry_lo = carry_ref[1].astype(jnp.int32)
    carry_len = carry_ref[2]

    hi_i = hi.astype(I32)
    lo_i = lo.astype(I32)
    prev_hi = _flat_shift(hi_i, 1, rows)
    prev_lo = _flat_shift(lo_i, 1, rows)
    r_iota = jax.lax.broadcasted_iota(I32, hi.shape, 0)
    c_iota = jax.lax.broadcasted_iota(I32, hi.shape, 1)
    is_first = (r_iota == 0) & (c_iota == 0)
    prev_hi = jnp.where(is_first, carry_hi, prev_hi)
    prev_lo = jnp.where(is_first, carry_lo, prev_lo)

    starts = (hi_i != prev_hi) | (lo_i != prev_lo)

    # segmented inclusive scan of run length in flat order
    f = starts
    v = w_ref[:].astype(I32) if weighted else jnp.ones_like(hi_i)
    step = 1
    total = rows * LANES
    while step < total:
        f_s = _flat_shift(f.astype(I32), step, rows) != 0
        v_s = _flat_shift(v, step, rows)
        v = jnp.where(f, v, v + v_s)
        f = f | f_s
        step *= 2
    # f now means "segment started within this tile at or before lane i";
    # lanes with f False belong to the run carried in from previous tiles.
    run = jnp.where(f, v, v + carry_len)

    # emission at lane i: length of the segment ending at lane i-1
    prev_run = _flat_shift(run, 1, rows)
    prev_run = jnp.where(is_first, carry_len, prev_run)
    # exclude segments whose key is the all-ones sentinel (padding)
    prev_is_sent = (prev_hi == -1) & (prev_lo == -1)
    emit = jnp.where(starts & ~prev_is_sent, prev_run, 0)
    if bins_cfg is None:
        out_ref[:] = emit
    else:
        n_bins, max_count, min_keep = bins_cfg
        ok = emit >= min_keep
        if max_count is not None:
            emit = jnp.minimum(emit, max_count)
        b = jnp.where(ok, jnp.minimum(emit, n_bins - 1), 0)
        out_ref[:] = b.astype(out_ref.dtype)

    # update carries with this tile's trailing run
    last_r = rows - 1
    carry_ref[0] = hi_i[last_r, LANES - 1]
    carry_ref[1] = lo_i[last_r, LANES - 1]
    carry_ref[2] = run[last_r, LANES - 1]

    @pl.when(t == pl.num_programs(0) - 1)
    def _():
        final_ref[0] = hi_i[last_r, LANES - 1]
        final_ref[1] = lo_i[last_r, LANES - 1]
        final_ref[2] = run[last_r, LANES - 1]
        final_ref[3] = pl.num_programs(0)


@functools.partial(jax.jit, static_argnames=("weighted", "tile_rows"))
def segment_end_lengths_sorted(hi, lo, weights=None, weighted=False,
                               tile_rows=1024):
    """Per-lane closed-segment lengths over SORTED flat key planes.

    hi, lo: (N,) uint32 sorted ascending as 64-bit (hi, lo) keys, with
    all-ones sentinel padding at the end; N must be a multiple of
    tile_rows*128.  Returns (emit, final) where emit[i] (i32, (N,)) is
    the total length of the segment that ended at lane i-1 (0 if none;
    sentinel segments excluded) and final = [last_hi, last_lo,
    last_run_len, n_tiles] (i32[4]) describes the still-open final run
    (callers add it unless its key is the sentinel).
    """
    return _seg_pass(hi, lo, weights, weighted, tile_rows, None)


@functools.partial(jax.jit, static_argnames=("weighted", "tile_rows", "bins_cfg"))
def segment_bins_sorted(hi, lo, weights=None, weighted=False, tile_rows=2048,
                        bins_cfg=(256, None, 1)):
    """Like segment_end_lengths_sorted, but emits the pre-clamped
    histogram bin index per lane as u8 (n_bins <= 256) or u16, applying
    (n_bins, max_count, min_keep) inside the kernel."""
    return _seg_pass(hi, lo, weights, weighted, tile_rows, bins_cfg)


def _seg_pass(hi, lo, weights, weighted, tile_rows, bins_cfg):
    n = hi.shape[0]
    tile = tile_rows * LANES
    assert n % tile == 0, (n, tile)
    n_tiles = n // tile
    kernel = functools.partial(
        _seg_emit_kernel, rows=tile_rows, weighted=weighted, bins_cfg=bins_cfg
    )
    if bins_cfg is None:
        out_dtype = I32
    else:
        out_dtype = jnp.uint8 if bins_cfg[0] <= 256 else jnp.uint16
    spec = pl.BlockSpec((tile_rows, LANES), lambda t: (t, 0),
                        memory_space=pltpu.VMEM)
    operands = [hi.reshape(n_tiles * tile_rows, LANES),
                lo.reshape(n_tiles * tile_rows, LANES)]
    if weighted:
        operands.append(weights.reshape(n_tiles * tile_rows, LANES))
    emit, final = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[spec] * len(operands),
        out_specs=(
            spec,
            pl.BlockSpec((4,), lambda t: (0,), memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_tiles * tile_rows, LANES), out_dtype),
            jax.ShapeDtypeStruct((4,), I32),
        ),
        scratch_shapes=[pltpu.SMEM((4,), I32)],
    )(*operands)
    return emit.reshape(n), final
