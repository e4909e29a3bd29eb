"""Pallas dense-tile expand kernel: the multiply phase on real hardware.

The reference's multiply PEs stream one A-element at a time against a B
row, emitting 64-byte blocks (``PEMultiplier``, ``SimOuterSPACE.cpp:
501-552``). The TPU-native version instead materialises each heavy outer
product as (8 × 128) register tiles — one VPU tile per task — chosen by
the scheduler (``sched/planner.py``):

  out_vals[t]  = a_vals[t][:, None] * b_vals[b_block[t]][None, :]
  out_cols[t]  = broadcast(b_cols[b_block[t]])
  out_rows[t]  = broadcast(a_rows[t])

All reads/writes are contiguous blocks (BlockSpec-indexed via scalar
prefetch); there are **no gathers** — the skew-heavy >90% of the partial
products is produced at HBM streaming bandwidth instead of ~10 cycles per
element through XLA gather. Masked lanes (tile padding) carry a sentinel
row that the merge phase sorts past.

Mosaic layout notes: TPU block shapes must be (8k, 128)-aligned in their
last two dimensions, so the A-side task slices are fetched in (8, 8)
groups and the B arrays in (8, 128) block groups; the kernel selects its
sublane from each group. The scheduler orders tasks B-major per k so the
Pallas pipeline re-uses the fetched B group across consecutive tasks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from outerspace_tpu.sched.planner import TILE_A, TILE_B, OuterProductSchedule

_A_GROUP = 8  # tasks per A-side fetch group (sublane alignment)


def _expand_kernel(
    task_ref,  # SMEM int32[ntasks * 4] flat: (a_len, b_block, b_lo, b_hi)
    #            (flat 1-D because SMEM pads a trailing dim to 128 lanes)
    a_rows_ref,  # VMEM int32[_A_GROUP, TILE_A]   (task group t // 8)
    a_vals_ref,  # VMEM f32[_A_GROUP, TILE_A]
    b_cols_ref,  # VMEM int32[_A_GROUP, TILE_B]   (block group b_block // 8)
    b_vals_ref,  # VMEM f32[_A_GROUP, TILE_B]
    out_rows_ref,  # VMEM int32[1, TILE_A, TILE_B]
    out_cols_ref,  # VMEM int32[1, TILE_A, TILE_B]
    out_vals_ref,  # VMEM f32[1, TILE_A, TILE_B]
    *,
    sentinel_row: int,
):
    t = pl.program_id(0)
    a_len = task_ref[t * 4]
    b_lo = task_ref[t * 4 + 2]
    b_hi = task_ref[t * 4 + 3]
    g = t % _A_GROUP  # which sublane of the A group is ours
    gb = task_ref[t * 4 + 1] % _A_GROUP  # which sublane of the B group

    a_rows = a_rows_ref[g, :].reshape(TILE_A, 1)
    a_vals = a_vals_ref[g, :].reshape(TILE_A, 1)
    b_cols = b_cols_ref[gb, :].reshape(1, TILE_B)
    b_vals = b_vals_ref[gb, :].reshape(1, TILE_B)

    sub = jax.lax.broadcasted_iota(jnp.int32, (TILE_A, TILE_B), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (TILE_A, TILE_B), 1)
    mask = (sub < a_len) & (lane >= b_lo) & (lane < b_hi)

    vals = a_vals * b_vals  # (TILE_A, TILE_B) outer product on the VPU
    rows = jnp.broadcast_to(a_rows, (TILE_A, TILE_B))
    cols = jnp.broadcast_to(b_cols, (TILE_A, TILE_B))

    out_rows_ref[0] = jnp.where(mask, rows, sentinel_row)
    out_cols_ref[0] = jnp.where(mask, cols, 0)
    out_vals_ref[0] = jnp.where(mask, vals, 0.0)


@functools.partial(
    jax.jit, static_argnames=("ntasks", "sentinel_row", "interpret")
)
def expand_tiles_device(
    tasks: jax.Array,  # int32[ntasks * 4] flat (a_len, b_block, b_lo, b_hi)
    a_rows_t: jax.Array,  # int32[ntasks_pad8, TILE_A]
    a_vals_t: jax.Array,  # f32[ntasks_pad8, TILE_A]
    b_cols_blk: jax.Array,  # int32[nblocks_pad8, TILE_B]
    b_vals_blk: jax.Array,  # f32[nblocks_pad8, TILE_B]
    *,
    ntasks: int,
    sentinel_row: int,
    interpret: bool = False,
):
    """Run the dense-tile expand; returns flat (rows, cols, vals) streams
    of length ntasks·TILE_A·TILE_B (sentinel-masked)."""
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ntasks,),
        in_specs=[
            pl.BlockSpec(
                (_A_GROUP, TILE_A),
                lambda t, task: (t // _A_GROUP, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (_A_GROUP, TILE_A),
                lambda t, task: (t // _A_GROUP, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (_A_GROUP, TILE_B),
                lambda t, task: (task[t * 4 + 1] // _A_GROUP, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (_A_GROUP, TILE_B),
                lambda t, task: (task[t * 4 + 1] // _A_GROUP, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, TILE_A, TILE_B),
                lambda t, task: (t, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ]
        * 3,
    )
    out_shape = [
        jax.ShapeDtypeStruct((ntasks, TILE_A, TILE_B), jnp.int32),
        jax.ShapeDtypeStruct((ntasks, TILE_A, TILE_B), jnp.int32),
        jax.ShapeDtypeStruct((ntasks, TILE_A, TILE_B), jnp.float32),
    ]
    rows, cols, vals = pl.pallas_call(
        functools.partial(_expand_kernel, sentinel_row=sentinel_row),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(tasks, a_rows_t, a_vals_t, b_cols_blk, b_vals_blk)
    n = ntasks * TILE_A * TILE_B
    return rows.reshape(n), cols.reshape(n), vals.reshape(n)


def schedule_to_device(
    sched: OuterProductSchedule, b_csr_cols: np.ndarray, b_csr_vals: np.ndarray
) -> dict[str, jax.Array]:
    """Stage the task table and 128-padded flat B arrays on device."""
    tasks = np.stack(
        [sched.a_len, sched.b_block, sched.b_lo, sched.b_hi], axis=1
    ).astype(np.int32).reshape(-1)
    ntasks = sched.ntasks
    pad_t = (-ntasks) % _A_GROUP
    a_rows_t = np.pad(sched.a_rows_t, ((0, pad_t), (0, 0)))
    a_vals_t = np.pad(sched.a_vals_t, ((0, pad_t), (0, 0)))
    nnz_b = b_csr_cols.shape[0]
    nblocks = -(-nnz_b // TILE_B)
    nblocks_pad = -(-nblocks // _A_GROUP) * _A_GROUP
    pad_b = nblocks_pad * TILE_B - nnz_b
    cols_p = np.pad(b_csr_cols, (0, pad_b)).reshape(nblocks_pad, TILE_B)
    vals_p = np.pad(b_csr_vals, (0, pad_b)).reshape(nblocks_pad, TILE_B)
    return dict(
        tasks=jnp.asarray(tasks),
        a_rows_t=jnp.asarray(a_rows_t.astype(np.int32)),
        a_vals_t=jnp.asarray(a_vals_t.astype(np.float32)),
        b_cols_blk=jnp.asarray(cols_p.astype(np.int32)),
        b_vals_blk=jnp.asarray(vals_p.astype(np.float32)),
    )
