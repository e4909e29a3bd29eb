"""Pallas dense-tile expand kernel: the multiply phase on real hardware.

The reference's multiply PEs stream one A-element at a time against a B
row, emitting 64-byte blocks (``PEMultiplier``, ``SimOuterSPACE.cpp:
501-552``). The TPU-native version instead materialises each heavy outer
product as (tile_a × 128) register tiles — one VPU tile per task — chosen
by the scheduler (``sched/planner.py``):

  out_vals[t] = a_vals[t][:, None] * b_vals[b_block[t]][None, :]
  out_keys[t] = a_rows[t][:, None] * n_cols + b_cols[b_block[t]][None, :]

All reads/writes are contiguous blocks (BlockSpec-indexed via scalar
prefetch); there are **no gathers** — the skew-heavy >90% of the partial
products is produced at HBM streaming bandwidth instead of ~10 cycles per
element through XLA gather. When ``m·n ≤ 2³²`` the kernel emits merged
biased-uint32 sort keys directly (packed mode: two output streams instead
of three), fusing the merge phase's key construction. Masked lanes carry
the int32 sentinel with value 0, keeping duplicate runs bounded by
``max_run`` for the merge's segmented scan.

Mosaic layout notes: TPU block shapes must be (8k, 128)-aligned in their
last two dimensions, so the A-side task slices are fetched in (8, tile_a)
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

from outerspace_tpu.sched.planner import TILE_B, OuterProductSchedule

_A_GROUP = 8  # tasks per A-side fetch group (sublane alignment)
_I32_MAX = np.int32(2**31 - 1)
_KEY_BIAS = np.int32(-(2**31))  # see ops.spgemm.pack_key_biased


def _expand_kernel_packed(
    task_ref,  # SMEM int32[ntasks * 4] flat: (a_len, b_block, b_lo, b_hi)
    a_rows_ref,  # VMEM int32[_A_GROUP, tile_a]   (task group t // 8)
    a_vals_ref,  # VMEM f32[_A_GROUP, tile_a]
    b_cols_ref,  # VMEM int32[_A_GROUP, TILE_B]   (block group b_block // 8)
    b_vals_ref,  # VMEM f32[_A_GROUP, TILE_B]
    out_keys_ref,  # VMEM int32[1, tile_a, TILE_B]
    out_vals_ref,  # VMEM f32[1, tile_a, TILE_B]
    *,
    tile_a: int,
    n_cols: int,
):
    t = pl.program_id(0)
    a_len = task_ref[t * 4]
    b_lo = task_ref[t * 4 + 2]
    b_hi = task_ref[t * 4 + 3]
    g = t % _A_GROUP
    gb = task_ref[t * 4 + 1] % _A_GROUP

    a_rows = a_rows_ref[g, :].reshape(tile_a, 1)
    a_vals = a_vals_ref[g, :].reshape(tile_a, 1)
    b_cols = b_cols_ref[gb, :].reshape(1, TILE_B)
    b_vals = b_vals_ref[gb, :].reshape(1, TILE_B)

    sub = jax.lax.broadcasted_iota(jnp.int32, (tile_a, TILE_B), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (tile_a, TILE_B), 1)
    mask = (sub < a_len) & (lane >= b_lo) & (lane < b_hi)

    rows_b = jnp.broadcast_to(a_rows, (tile_a, TILE_B))
    cols_b = jnp.broadcast_to(b_cols, (tile_a, TILE_B))
    vals = a_vals * b_vals  # (tile_a, TILE_B) outer product on the VPU
    # Sentinel padding: masked slots sort past every real key; the
    # merge discards them (with the 2^32-corner correction in
    # ops.spgemm.merge_biased_keys). Keeps duplicate runs bounded by
    # max_run for the XLA segmented scan.
    keys = jnp.where(
        mask, rows_b * np.int32(n_cols) + cols_b + _KEY_BIAS, _I32_MAX
    )
    out_keys_ref[0] = keys
    out_vals_ref[0] = jnp.where(mask, vals, 0.0)


def _expand_kernel_coords(
    task_ref,
    a_rows_ref,
    a_vals_ref,
    b_cols_ref,
    b_vals_ref,
    out_rows_ref,
    out_cols_ref,
    out_vals_ref,
    *,
    tile_a: int,
    sentinel_row: int,
):
    t = pl.program_id(0)
    a_len = task_ref[t * 4]
    b_lo = task_ref[t * 4 + 2]
    b_hi = task_ref[t * 4 + 3]
    g = t % _A_GROUP
    gb = task_ref[t * 4 + 1] % _A_GROUP

    a_rows = a_rows_ref[g, :].reshape(tile_a, 1)
    a_vals = a_vals_ref[g, :].reshape(tile_a, 1)
    b_cols = b_cols_ref[gb, :].reshape(1, TILE_B)
    b_vals = b_vals_ref[gb, :].reshape(1, TILE_B)

    sub = jax.lax.broadcasted_iota(jnp.int32, (tile_a, TILE_B), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (tile_a, TILE_B), 1)
    mask = (sub < a_len) & (lane >= b_lo) & (lane < b_hi)

    vals = a_vals * b_vals
    rows = jnp.broadcast_to(a_rows, (tile_a, TILE_B))
    cols = jnp.broadcast_to(b_cols, (tile_a, TILE_B))
    out_rows_ref[0] = jnp.where(mask, rows, sentinel_row)
    out_cols_ref[0] = jnp.where(mask, cols, 0)
    out_vals_ref[0] = jnp.where(mask, vals, 0.0)


def _grid_spec(ntasks: int, tile_a: int, n_outputs: int):
    return pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ntasks,),
        in_specs=[
            pl.BlockSpec(
                (_A_GROUP, tile_a),
                lambda t, task: (t // _A_GROUP, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (_A_GROUP, tile_a),
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
                (1, tile_a, TILE_B),
                lambda t, task: (t, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ]
        * n_outputs,
    )


@functools.partial(
    jax.jit,
    static_argnames=("ntasks", "tile_a", "n_cols", "interpret"),
)
def expand_tiles_packed(
    tasks: jax.Array,
    a_rows_t: jax.Array,
    a_vals_t: jax.Array,
    b_cols_blk: jax.Array,
    b_vals_blk: jax.Array,
    *,
    ntasks: int,
    tile_a: int,
    n_cols: int,
    interpret: bool = False,
):
    """Dense-tile expand with fused biased-uint32 key packing; returns
    flat (keys, vals) of length ntasks·tile_a·TILE_B (padding slots
    carry the int32 sentinel with value 0)."""
    out_shape = [
        jax.ShapeDtypeStruct((ntasks, tile_a, TILE_B), jnp.int32),
        jax.ShapeDtypeStruct((ntasks, tile_a, TILE_B), jnp.float32),
    ]
    keys, vals = pl.pallas_call(
        functools.partial(
            _expand_kernel_packed,
            tile_a=tile_a,
            n_cols=n_cols,
        ),
        grid_spec=_grid_spec(ntasks, tile_a, 2),
        out_shape=out_shape,
        interpret=interpret,
    )(tasks, a_rows_t, a_vals_t, b_cols_blk, b_vals_blk)
    n = ntasks * tile_a * TILE_B
    return keys.reshape(n), vals.reshape(n)


@functools.partial(
    jax.jit,
    static_argnames=("ntasks", "tile_a", "sentinel_row", "interpret"),
)
def expand_tiles_coords(
    tasks: jax.Array,
    a_rows_t: jax.Array,
    a_vals_t: jax.Array,
    b_cols_blk: jax.Array,
    b_vals_blk: jax.Array,
    *,
    ntasks: int,
    tile_a: int,
    sentinel_row: int,
    interpret: bool = False,
):
    """Dense-tile expand emitting (rows, cols, vals) coordinate streams —
    the general path when m·n does not fit an int32 key."""
    out_shape = [
        jax.ShapeDtypeStruct((ntasks, tile_a, TILE_B), jnp.int32),
        jax.ShapeDtypeStruct((ntasks, tile_a, TILE_B), jnp.int32),
        jax.ShapeDtypeStruct((ntasks, tile_a, TILE_B), jnp.float32),
    ]
    rows, cols, vals = pl.pallas_call(
        functools.partial(
            _expand_kernel_coords, tile_a=tile_a, sentinel_row=sentinel_row
        ),
        grid_spec=_grid_spec(ntasks, tile_a, 3),
        out_shape=out_shape,
        interpret=interpret,
    )(tasks, a_rows_t, a_vals_t, b_cols_blk, b_vals_blk)
    n = ntasks * tile_a * TILE_B
    return rows.reshape(n), cols.reshape(n), vals.reshape(n)


def b_blocks_host(
    b_csr_cols: np.ndarray,
    b_csr_vals: np.ndarray,
    nblocks_pad: int | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """128-pad flat B arrays into (nblocks_pad, TILE_B) block form.

    ``nblocks_pad=None`` buckets the block count (executable sharing);
    an explicit value (a multiple of ``_A_GROUP`` ≥ the natural count)
    pins it — the sharded path uses this to stack per-device shards to
    one common shape.
    """
    from outerspace_tpu.ops.symbolic import round_up_bucket

    nnz_b = b_csr_cols.shape[0]
    nblocks = -(-max(nnz_b, 1) // TILE_B)
    if nblocks_pad is None:
        nblocks_pad = round_up_bucket(
            -(-nblocks // _A_GROUP) * _A_GROUP, min_size=_A_GROUP
        )
        nblocks_pad = -(-nblocks_pad // _A_GROUP) * _A_GROUP
    elif nblocks_pad < nblocks or nblocks_pad % _A_GROUP:
        raise ValueError(
            f"nblocks_pad={nblocks_pad} must be a multiple of {_A_GROUP} "
            f">= the natural block count {nblocks}"
        )
    pad_b = nblocks_pad * TILE_B - nnz_b
    cols_p = np.pad(b_csr_cols, (0, pad_b)).reshape(nblocks_pad, TILE_B)
    vals_p = np.pad(b_csr_vals, (0, pad_b)).reshape(nblocks_pad, TILE_B)
    return cols_p.astype(np.int32), vals_p.astype(np.float32)


def schedule_to_host(
    sched: OuterProductSchedule,
    ntasks_pad: int | None = None,
) -> dict[str, np.ndarray]:
    """One class's padded task table as host arrays (no B staging).

    ``ntasks_pad=None`` uses the schedule's own slab layout; an explicit
    value (a multiple of ``_A_GROUP`` ≥ ntasks) pins the padded count —
    the sharded path uses this so every device's table stacks to one
    common shape. Empty padding tasks (a_len = 0) emit pure sentinel
    output.
    """
    ntasks = sched.ntasks
    if ntasks_pad is None:
        ntasks_pad = sched.ntasks_padded
    elif ntasks_pad < ntasks or ntasks_pad % _A_GROUP:
        raise ValueError(
            f"ntasks_pad={ntasks_pad} must be a multiple of {_A_GROUP} "
            f">= ntasks {ntasks}"
        )
    tile_a = sched.tile_a
    pad_t = ntasks_pad - ntasks
    tasks = np.zeros((ntasks_pad, 4), np.int32)
    if ntasks:
        tasks[:ntasks] = np.stack(
            [sched.a_len, sched.b_block, sched.b_lo, sched.b_hi], axis=1
        ).astype(np.int32)
    a_rows_t = np.pad(sched.a_rows_t, ((0, pad_t), (0, 0)))
    a_vals_t = np.pad(sched.a_vals_t, ((0, pad_t), (0, 0)))
    if a_rows_t.shape[0] == 0:
        a_rows_t = np.zeros((max(ntasks_pad, _A_GROUP), tile_a), np.int32)
        a_vals_t = np.zeros((max(ntasks_pad, _A_GROUP), tile_a), np.float32)
    return dict(
        tasks=tasks.reshape(-1),
        a_rows_t=a_rows_t.astype(np.int32),
        a_vals_t=a_vals_t.astype(np.float32),
    )


def schedule_to_device(
    sched: OuterProductSchedule,
    b_csr_cols: np.ndarray,
    b_csr_vals: np.ndarray,
) -> dict[str, jax.Array]:
    """Stage one class's task table and 128-padded flat B arrays.

    Task arrays pad to a whole number of slabs (``sched.slab_tasks``) so
    the kernel runs as fixed-shape calls whose executables are shared
    across operands; empty padding tasks (a_len = 0) emit pure sentinel
    output. B arrays pad to a bucketed block count (memory-only waste)
    for the same executable-sharing reason.
    """
    host = schedule_to_host(sched)
    cols_p, vals_p = b_blocks_host(b_csr_cols, b_csr_vals)
    return dict(
        tasks=jnp.asarray(host["tasks"]),
        a_rows_t=jnp.asarray(host["a_rows_t"]),
        a_vals_t=jnp.asarray(host["a_vals_t"]),
        b_cols_blk=jnp.asarray(cols_p),
        b_vals_blk=jnp.asarray(vals_p),
    )
