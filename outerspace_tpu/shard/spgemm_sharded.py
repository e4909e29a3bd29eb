"""Sharded SpGEMM: outer-product index space partitioned over a TPU mesh.

The structure mirrors OuterSPACE's machine-level dataflow
(``SimOuterSPACE.cpp:721-857``) at chip scale:

- the **outer-product index space k is partitioned** across the mesh
  (contiguous, FLOP-balanced — `mesh.balanced_contiguous_partition`
  replaces the reference's round-robin dispatch);
- each device runs the local **multiply phase** over its k-slice;
- partial products are **exchanged over ICI with `lax.all_to_all`,
  keyed by output-row owner** (owner = row // rows_per_device) — the role
  simulated DRAM played between the reference's multiply and merge phases
  (``TaskProvider.multResults``, ``SimOuterSPACE.cpp:139``);
- each device runs the local **merge phase** (sort + segmented scan) on
  the partial products of the rows it owns.

Every shape is static: the symbolic pass computes the exact per-(src, dst)
partial-product counts on the host, so the all-to-all buffers are padded
to the true maximum (the "ragged all-to-all" capacity problem called out
in SURVEY §7).
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from outerspace_tpu.formats.csr import CSC, CSR
from outerspace_tpu.ops.spgemm import (
    _I32_MAX,
    expand_partial_products,
    merge_packed_keys,
    merge_twokey,
)
from outerspace_tpu.ops.symbolic import (
    expansion_plan_subset,
    per_outer_index_flops,
    round_up_bucket,
)
from outerspace_tpu.shard.mesh import balanced_contiguous_partition


@dataclasses.dataclass
class ShardedPlan:
    """Host-side static plan for one sharded SpGEMM."""

    m: int
    n: int
    ndev: int
    rows_per_dev: int  # row ownership granularity
    p_pad: int  # per-device expansion padding
    capacity: int  # per-(src, dst) all-to-all bucket capacity
    # Stacked per-device arrays, each [ndev, ...]:
    a_rows: np.ndarray
    a_vals: np.ndarray
    a_k: np.ndarray
    offsets: np.ndarray
    p_total: np.ndarray  # [ndev]
    # Replicated B (CSR):
    b_indptr: np.ndarray
    b_cols: np.ndarray
    b_vals: np.ndarray
    # Merge hints: single-key packed sort where m·n fits int32, and the
    # host bound on duplicates per output coordinate (pow2-rounded).
    packed: bool = False
    max_run: int = 1


def shard_plan(a_csc: CSC, b_csr: CSR, ndev: int) -> ShardedPlan:
    """Split the outer-product index space into ``ndev`` FLOP-balanced
    contiguous k-ranges and compute exact exchange capacities."""
    if a_csc.shape[1] != b_csr.shape[0]:
        raise ValueError("inner dimensions differ")
    m, n = a_csc.shape[0], b_csr.shape[1]
    flops = per_outer_index_flops(a_csc, b_csr)
    bounds = balanced_contiguous_partition(flops.astype(np.float64), ndev)
    rows_per_dev = -(-m // ndev)

    plans = []
    for d in range(ndev):
        ks = np.arange(bounds[d], bounds[d + 1], dtype=np.int64)
        plans.append(expansion_plan_subset(a_csc, b_csr, ks))

    max_nnz_a = max(max(p.a_rows.shape[0] for p in plans), 1)
    max_p = max(max(p.expansion_size for p in plans), 1)
    if max_p >= 2**31:
        raise ValueError(
            f"per-device expansion size {max_p} exceeds int32 index space; "
            "use more devices or split the operands"
        )
    p_pad = round_up_bucket(max_p)

    def pad_stack(field, fill):
        out = np.full((ndev, max_nnz_a), fill, dtype=np.int32)
        for d, p in enumerate(plans):
            arr = getattr(p, field)
            out[d, : arr.shape[0]] = arr
        return out

    a_rows = pad_stack("a_rows", 0)
    a_k = pad_stack("a_k", 0)
    a_vals = np.zeros((ndev, max_nnz_a), dtype=np.float32)
    offsets = np.zeros((ndev, max_nnz_a + 1), dtype=np.int32)
    p_total = np.zeros(ndev, dtype=np.int32)
    for d, p in enumerate(plans):
        a_vals[d, : p.a_vals.shape[0]] = p.a_vals
        off = p.offsets.astype(np.int32)
        offsets[d, : off.shape[0]] = off
        offsets[d, off.shape[0] :] = off[-1]  # zero-length tail segments
        p_total[d] = p.expansion_size

    # Exact per-(src, dst) counts: every partial product of A-nonzero e
    # lands in row a_rows[e], owner = row // rows_per_dev.
    capacity = 1
    for d, p in enumerate(plans):
        if p.a_rows.shape[0] == 0:
            continue
        counts = np.diff(p.offsets)
        owners = p.a_rows // rows_per_dev
        per_dst = np.bincount(owners, weights=counts, minlength=ndev)
        capacity = max(capacity, int(per_dst.max()))
    capacity = round_up_bucket(capacity, min_size=128)

    return ShardedPlan(
        m=m,
        n=n,
        ndev=ndev,
        rows_per_dev=rows_per_dev,
        p_pad=int(p_pad),
        capacity=int(capacity),
        a_rows=a_rows,
        a_vals=a_vals,
        a_k=a_k,
        offsets=offsets,
        p_total=p_total,
        b_indptr=np.asarray(b_csr.indptr, dtype=np.int32),
        b_cols=np.asarray(b_csr.indices, dtype=np.int32),
        b_vals=np.asarray(b_csr.data, dtype=np.float32),
        packed=bool(m * n < 2**31),
        max_run=1
        << (
            max(
                int(
                    np.bincount(a_csc.indices, minlength=m).max(initial=1)
                ),
                1,
            )
            - 1
        ).bit_length(),
    )


def _local_shard_fn(
    a_rows, a_vals, a_k, offsets, p_total, b_indptr, b_cols, b_vals,
    *, p_pad, sentinel_row, rows_per_dev, ndev, capacity, axis,
    n_cols, packed, max_run,
):
    """Per-device program under shard_map (leading dim 1 stripped)."""
    # ---- multiply phase over the local k-slice ----
    r, c, v = expand_partial_products(
        a_rows[0], a_vals[0], a_k[0], b_indptr, b_cols, b_vals,
        offsets[0], p_total[0], p_pad, sentinel_row,
    )
    # ---- bucket by output-row owner (sort by row ⇒ owners monotone) ----
    r, c, v = jax.lax.sort((r, c, v), num_keys=1, is_stable=False)
    valid = r < sentinel_row
    dst = jnp.minimum(r // rows_per_dev, ndev - 1)
    # rank within bucket = position - bucket start
    pos = jnp.arange(p_pad, dtype=jnp.int32)
    bucket_start = jnp.searchsorted(
        dst, jnp.arange(ndev, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    rank = pos - bucket_start[jnp.minimum(dst, ndev - 1)]
    slot = jnp.where(valid, dst * capacity + rank, ndev * capacity)
    send_r = jnp.full(ndev * capacity + 1, _I32_MAX, jnp.int32).at[slot].set(
        jnp.where(valid, r, _I32_MAX), mode="drop"
    )[:-1]
    send_c = jnp.zeros(ndev * capacity + 1, jnp.int32).at[slot].set(
        jnp.where(valid, c, 0), mode="drop"
    )[:-1]
    send_v = jnp.zeros(ndev * capacity + 1, jnp.float32).at[slot].set(
        jnp.where(valid, v, 0.0), mode="drop"
    )[:-1]
    # ---- ICI all-to-all: bucket d of every src arrives here when we own d
    recv_r = jax.lax.all_to_all(
        send_r.reshape(ndev, capacity), axis, 0, 0, tiled=False
    ).reshape(ndev * capacity)
    recv_c = jax.lax.all_to_all(
        send_c.reshape(ndev, capacity), axis, 0, 0, tiled=False
    ).reshape(ndev * capacity)
    recv_v = jax.lax.all_to_all(
        send_v.reshape(ndev, capacity), axis, 0, 0, tiled=False
    ).reshape(ndev * capacity)
    # ---- local merge of owned rows ----
    # Single-key packed sort where m·n fits int32 (the known-faster
    # variant the single-chip pipeline prefers); max_run truncates the
    # segmented scan either way.
    if packed:
        key = jnp.where(
            recv_r < sentinel_row,
            recv_r * np.int32(n_cols) + recv_c,
            _I32_MAX,
        )
        mr, mc, mv, mvalid, nnz = merge_packed_keys(
            key, recv_v, n_cols, _I32_MAX, max_run
        )
    else:
        mr, mc, mv, mvalid, nnz = merge_twokey(
            recv_r, recv_c, recv_v, _I32_MAX, max_run
        )
    return (
        mr[None], mc[None], mv[None], mvalid[None], nnz[None],
    )


def spgemm_sharded(plan: ShardedPlan, mesh: Mesh, axis: str = "x"):
    """Run the sharded SpGEMM over ``mesh``; returns stacked per-device
    padded merged COO arrays + per-device nnz (device-resident)."""
    from jax.experimental.shard_map import shard_map

    spec = P(axis)
    rep = P()
    fn = functools.partial(
        _local_shard_fn,
        p_pad=plan.p_pad,
        sentinel_row=plan.m,
        rows_per_dev=plan.rows_per_dev,
        ndev=plan.ndev,
        capacity=plan.capacity,
        axis=axis,
        n_cols=plan.n,
        packed=plan.packed,
        max_run=plan.max_run,
    )
    sharded = shard_map(
        fn,
        mesh=mesh,
        in_specs=(spec, spec, spec, spec, spec, rep, rep, rep),
        out_specs=(spec, spec, spec, spec, spec),
        check_rep=False,
    )
    args = (
        jnp.asarray(plan.a_rows),
        jnp.asarray(plan.a_vals),
        jnp.asarray(plan.a_k),
        jnp.asarray(plan.offsets),
        jnp.asarray(plan.p_total),
        jnp.asarray(plan.b_indptr),
        jnp.asarray(plan.b_cols),
        jnp.asarray(plan.b_vals),
    )
    with mesh:
        return jax.jit(sharded)(*args)


def sharded_result_to_csr(plan: ShardedPlan, out) -> "CSR":
    """Gather per-device merged outputs to host and assemble the CSR."""
    from outerspace_tpu.formats.coo import COO

    mr, mc, mv, mvalid, nnz = out
    rows_l, cols_l, vals_l = [], [], []
    mr = np.asarray(mr).reshape(plan.ndev, -1)
    mc = np.asarray(mc).reshape(plan.ndev, -1)
    mv = np.asarray(mv).reshape(plan.ndev, -1)
    mvalid = np.asarray(mvalid).reshape(plan.ndev, -1)
    for d in range(plan.ndev):
        sel = mvalid[d]
        rows_l.append(mr[d][sel])
        cols_l.append(mc[d][sel])
        vals_l.append(mv[d][sel])
    coo = COO(
        (plan.m, plan.n),
        np.concatenate(rows_l),
        np.concatenate(cols_l),
        np.concatenate(vals_l),
    )
    return coo.to_csr()
