"""Pallas single-pass merge epilogue: segmented sum + unpack + validity.

After the merge-phase sort, the XLA pipeline needed ⌈log₂ max_run⌉
full-array Hillis–Steele passes plus unpack/validity passes
(``ops.spgemm.merge_biased_keys``). This kernel does the whole epilogue in
**one** HBM pass with a sequential-grid carry, the TPU-native analogue of
the reference's streaming merge PEs (``SimOuterSPACE.cpp:554-606``: one
pass over the concatenated partial rows, accumulating duplicates):

- per chunk: run-start flags (cross-chunk via an SMEM key carry),
  a VMEM segmented scan (⌈log₂ max_run⌉ static-shift stages — runs are
  host-bounded), carry-in addition for the leading continuation segment;
- run-last detection via a one-element lookahead into the next chunk;
- biased-uint32 key unpack (``ops.spgemm.pack_key_biased``);
- sentinel discard with the exact 2^32-corner recovery: sentinel-keyed
  values are summed into an SMEM accumulator across the whole stream and
  the terminal slot is real iff the stream holds more sentinel slots than
  the host-known padding count (see ``merge_biased_keys``);
- the output nnz accumulates in SMEM and is emitted as a scalar.

Grid steps are sequential on TPU, so SMEM scratch carries state across
chunks exactly like the two-phase-clock registers carried state across
cycles in the reference's simulator.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_I32_MAX = np.int32(2**31 - 1)
_LANES = 128


def _flat_shift_right(x, d: int, fill, idx):
    """Logical right-shift by static ``d`` of a row-major (R, 128) array:
    out[i] = x[i-d] for i ≥ d else ``fill``. Built from cyclic rolls with
    a lane-boundary fix (no cross-vreg shift primitive on TPU)."""
    dr, dl = d // _LANES, d % _LANES
    a = pltpu.roll(x, dr, axis=0)
    if dl:
        b = pltpu.roll(x, dr + 1, axis=0)
        ar = pltpu.roll(a, dl, axis=1)
        br = pltpu.roll(b, dl, axis=1)
        lane = idx % _LANES
        rolled = jnp.where(lane >= dl, ar, br)
    else:
        rolled = a
    return jnp.where(idx < d, fill, rolled)


def _scan_kernel(
    meta_ref,  # SMEM int32[4]: [pad_count, nchunks, max_run, unused]
    key_ref,  # VMEM int32[1, R, 128]   chunk c
    nxt_ref,  # VMEM int32[1, 8, 128]   head of chunk c+1 (clamped);
    # only [0, 0, 0] is read — 8 sublanes is the minimum legal block.
    val_ref,  # VMEM f32[1, R, 128]
    row_ref,  # out VMEM int32[1, R, 128]
    col_ref,  # out VMEM int32[1, R, 128]
    oval_ref,  # out VMEM f32[1, R, 128]
    valid_ref,  # out VMEM int32[1, R, 128]
    nnz_ref,  # out SMEM int32[1]
    icarry,  # scratch SMEM int32[4]: [prev_key, sent_cnt, nnz_acc, _]
    fcarry,  # scratch SMEM f32[2]: [carry_val, corner_sum]
    *,
    rows: int,
    n_cols: int,
    scan_stages: int,
    sentinel_row: int,
):
    c = pl.program_id(0)
    nchunks = meta_ref[1]
    pad_count = meta_ref[0]
    R = rows

    @pl.when(c == 0)
    def _init():
        icarry[0] = _I32_MAX  # prev_key: sentinel ⇒ first[0] of chunk 0
        icarry[1] = 0
        icarry[2] = 0
        fcarry[0] = 0.0
        fcarry[1] = 0.0

    key = key_ref[0]
    val = val_ref[0]
    ri = jax.lax.broadcasted_iota(jnp.int32, (R, _LANES), 0)
    li = jax.lax.broadcasted_iota(jnp.int32, (R, _LANES), 1)
    idx = ri * _LANES + li
    last_idx = R * _LANES - 1

    # --- run-start flags (int32 0/1; i1 vectors trip Mosaic) ---
    prev_key = _flat_shift_right(key, 1, icarry[0], idx)
    first = (key != prev_key).astype(jnp.int32)

    # --- carry-in: if element 0 continues the previous chunk's trailing
    # run (first[0] == 0), inject the carried partial sum at position 0;
    # the inclusive scan propagates it through the whole continuation
    # segment — no per-element continuation mask needed.
    cont0 = (key[0, 0] == icarry[0]) & (c > 0)
    v = jnp.where((idx == 0) & cont0, val + fcarry[0], val)

    # --- within-chunk segmented inclusive scan (static shifts) ---
    f = first
    for s in range(scan_stages):
        d = 1 << s
        pv = _flat_shift_right(v, d, jnp.float32(0.0), idx)
        pf = _flat_shift_right(f, d, jnp.int32(1), idx)
        v = v + jnp.where(f > 0, 0.0, pv)
        f = jnp.maximum(f, pf)

    # --- run-last via one-element lookahead ---
    nxt0 = nxt_ref[0, 0, 0]
    # shift-left by 1: out[i] = key[i+1]; position C-1 takes the next
    # chunk's first key (or stays "different" on the final chunk).
    # (pltpu.roll wants non-negative static shifts: left == size-1 right.)
    kl = pltpu.roll(key, _LANES - 1, axis=1)
    kr = pltpu.roll(pltpu.roll(key, R - 1, axis=0), _LANES - 1, axis=1)
    nxt_key = jnp.where(li < _LANES - 1, kl, kr)
    nxt_key = jnp.where(idx == last_idx, nxt0, nxt_key)
    is_last = (key != nxt_key) | ((idx == last_idx) & (c == nchunks - 1))

    # --- sentinel bookkeeping (exact 2^32 corner recovery) ---
    is_sent = key == _I32_MAX
    sent_here = jnp.sum(is_sent.astype(jnp.int32))
    corner_here = jnp.sum(jnp.where(is_sent, val, 0.0))
    sent_total = icarry[1] + sent_here
    corner_total = fcarry[1] + corner_here
    corner_real = sent_total > pad_count  # only final chunk can decide,
    # and the terminal sentinel slot only exists in the final chunk.
    v = jnp.where(is_sent, corner_total, v)
    valid = is_last & (~is_sent | corner_real)

    # --- unpack biased-uint32 keys ---
    ku = pltpu.bitcast(key, jnp.uint32) ^ np.uint32(2**31)
    row = (ku // np.uint32(n_cols)).astype(jnp.int32)
    col = (ku % np.uint32(n_cols)).astype(jnp.int32)

    row_ref[0] = jnp.where(valid, row, sentinel_row)
    col_ref[0] = jnp.where(valid, col, 0)
    oval_ref[0] = jnp.where(valid, v, 0.0)
    valid_ref[0] = valid.astype(jnp.int32)

    # --- carries out ---
    nnz_here = jnp.sum(valid.astype(jnp.int32))
    icarry[0] = key[R - 1, _LANES - 1]
    icarry[1] = sent_total
    icarry[2] = icarry[2] + nnz_here
    # carry_val: inclusive sum of the trailing run so far (v already
    # includes any carry-in when the whole chunk continues one run).
    fcarry[0] = v[R - 1, _LANES - 1]
    fcarry[1] = corner_total

    @pl.when(c == nchunks - 1)
    def _emit_nnz():
        nnz_ref[0] = icarry[2]


def _pick_chunk(n: int, cap: int = 65536) -> int:
    """Largest power-of-two divisor of n, capped (chunk = grid step)."""
    return min(cap, n & -n)


@functools.partial(
    jax.jit,
    static_argnames=("n_cols", "sentinel_row", "max_run", "interpret"),
)
def merge_epilogue_scan(
    key: jax.Array,  # int32[N] SORTED biased keys (sentinel-padded)
    vals: jax.Array,  # f32[N]
    pad_count: jax.Array,  # int32 scalar: known padding slots
    *,
    n_cols: int,
    sentinel_row: int,
    max_run: int | None,
    interpret: bool = False,
):
    """One-pass epilogue over a sorted packed stream; returns
    (rows, cols, vals, valid(bool), nnz) — same contract as
    ``ops.spgemm.merge_biased_keys`` after its sort."""
    n = key.shape[0]
    chunk = _pick_chunk(n)
    if chunk < 1024 or n % chunk:
        raise ValueError(f"stream length {n} lacks a usable pow2 chunk")
    rows = chunk // _LANES
    nchunks = n // chunk
    limit = chunk if max_run is None else min(max(int(max_run), 1), chunk)
    scan_stages = max(1, (limit - 1).bit_length()) if limit > 1 else 0
    # A run can span chunks only through the carry; within-chunk real runs
    # are ≤ max_run. Sentinel runs exceed it, but their sums are replaced
    # by the exact corner accumulator.
    meta = jnp.stack(
        [
            jnp.asarray(pad_count, jnp.int32),
            jnp.asarray(nchunks, jnp.int32),
            jnp.asarray(limit, jnp.int32),
            jnp.zeros((), jnp.int32),
        ]
    )
    kc = key.reshape(nchunks, rows, _LANES)
    vc = vals.reshape(nchunks, rows, _LANES)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nchunks,),
        in_specs=[
            pl.BlockSpec(
                (1, rows, _LANES), lambda c, m: (c, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 8, _LANES),
                lambda c, m: (jnp.minimum(c + 1, m[1] - 1), 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, rows, _LANES), lambda c, m: (c, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, rows, _LANES), lambda c, m: (c, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ]
        * 4
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        scratch_shapes=[
            pltpu.SMEM((4,), jnp.int32),
            pltpu.SMEM((2,), jnp.float32),
        ],
    )
    out_shape = [
        jax.ShapeDtypeStruct((nchunks, rows, _LANES), jnp.int32),
        jax.ShapeDtypeStruct((nchunks, rows, _LANES), jnp.int32),
        jax.ShapeDtypeStruct((nchunks, rows, _LANES), jnp.float32),
        jax.ShapeDtypeStruct((nchunks, rows, _LANES), jnp.int32),
        jax.ShapeDtypeStruct((1,), jnp.int32),
    ]
    r, c, v, valid, nnz = pl.pallas_call(
        functools.partial(
            _scan_kernel,
            rows=rows,
            n_cols=n_cols,
            scan_stages=scan_stages,
            sentinel_row=sentinel_row,
        ),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(meta, kc, kc, vc)
    return (
        r.reshape(n),
        c.reshape(n),
        v.reshape(n),
        valid.reshape(n) != 0,
        nnz[0],
    )
