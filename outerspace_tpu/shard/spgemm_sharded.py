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
    merge_biased_keys,
    merge_twokey,
    pack_key_biased,
)
from outerspace_tpu.ops.symbolic import (
    expansion_plan_subset,
    per_outer_index_flops,
    round_up_bucket,
)
from outerspace_tpu.shard.mesh import balanced_contiguous_partition


def _slice_fill_buckets(starts, ends, capacity, ndst, *streams):
    """Fill (ndst, capacity) exchange buffers from owner-sorted streams
    with per-destination ``dynamic_slice`` copies — contiguous DMA at
    stream rate, where an element scatter/gather fill pays the measured
    ~13-15 ns/element random-access price per lane.

    ``starts``/``ends``: int32[ndst] bucket ranges into the streams
    (each range's length must be <= capacity).
    ``streams``: (array, dead_value) pairs; dead slots (past the
    bucket's live run) get ``dead_value``. The live run lands
    LEFT-ALIGNED in its destination slot with a dead-only tail — when
    a key lane's dead value is the key-space maximum, a slot filled
    from a sorted stream is itself sorted, so receivers can
    searchsorted part boundaries straight into exchanged buckets
    (the merge-partition pass relies on this)."""
    lane = jnp.arange(capacity, dtype=jnp.int32)
    # Extend each stream by `capacity` dead values so a slice starting
    # at any live position (starts <= len) stays in bounds without
    # dynamic_slice's silent start-clamping shifting the window.
    exts = [
        jnp.concatenate(
            [arr, jnp.full((capacity,), dead, arr.dtype)]
        )
        for arr, dead in streams
    ]
    outs = [[] for _ in streams]
    for d in range(ndst):
        s = starts[d]
        live = lane < (ends[d] - s)
        for oi, ((_, dead), ext) in enumerate(zip(streams, exts)):
            sl = jax.lax.dynamic_slice(ext, (s,), (capacity,))
            outs[oi].append(jnp.where(live, sl, dead))
    return tuple(jnp.stack(o) for o in outs)


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
        packed=bool(m * n < 2**32),
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
    # Buckets are CONTIGUOUS after the sort, so the exchange buffers
    # fill with per-destination dynamic_slice COPIES (sequential DMA) —
    # never element scatters/gathers: a 3-lane slot scatter pays the
    # TPU random-access price (~13-15 ns/element/lane, the measured
    # law) for data a contiguous slice moves at stream rate. The live
    # mask is window-relative; the downstream merge sorts the buffer,
    # so the run's position inside the destination slot is irrelevant.
    row_bounds = jnp.minimum(
        jnp.arange(1, ndev + 1, dtype=jnp.int32) * rows_per_dev,
        sentinel_row,
    )
    bstart = jnp.concatenate(
        [jnp.zeros(1, jnp.int32),
         jnp.searchsorted(r, row_bounds, side="left").astype(jnp.int32)]
    )
    send_r, send_c, send_v = _slice_fill_buckets(
        bstart[:-1], bstart[1:], capacity, ndev,
        (r, _I32_MAX), (c, 0), (v, 0.0),
    )
    # ---- ICI all-to-all: bucket d of every src arrives here when we own d
    recv_r = jax.lax.all_to_all(
        send_r, axis, 0, 0, tiled=False
    ).reshape(ndev * capacity)
    recv_c = jax.lax.all_to_all(
        send_c, axis, 0, 0, tiled=False
    ).reshape(ndev * capacity)
    recv_v = jax.lax.all_to_all(
        send_v, axis, 0, 0, tiled=False
    ).reshape(ndev * capacity)
    # ---- local merge of owned rows ----
    # Biased-uint32 single-key merge (m·n < 2³²) with the single-pass
    # Pallas epilogue on TPU — the single-chip pipeline's merge, with a
    # device-exact pad count; two-key variadic sort otherwise.
    if packed:
        valid_r = recv_r < sentinel_row
        key = jnp.where(
            valid_r, pack_key_biased(recv_r, recv_c, n_cols), _I32_MAX
        )
        pad = jnp.int32(recv_r.shape[0]) - jnp.sum(
            valid_r.astype(jnp.int32)
        )
        mr, mc, mv, mvalid, nnz = merge_biased_keys(
            key, recv_v, n_cols, sentinel_row, max_run, pad_count=pad
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


# --------------------------------------------------------------------------
# 2-D partition: outer-product index space k × output-column space
# --------------------------------------------------------------------------


@dataclasses.dataclass
class ShardedPlan2D:
    """Host-side static plan for the 2-D sharded SpGEMM.

    SURVEY §2.3 / BASELINE configs[4]: the outer-product index space is
    partitioned 2-D over a (kx × ny) mesh — axis "x" splits k (and output
    rows for the merge), axis "y" splits B's columns — so **B is sharded
    over both axes and never replicated** (device (i,j) holds only B's
    k-slice i restricted to column range j). The multiply→merge exchange
    rides ICI along "x" only (column ranges are independent), the role
    simulated DRAM played in the reference (``SimOuterSPACE.cpp:139``).
    """

    m: int
    n: int
    kx: int
    ny: int
    rows_per_dev: int  # output-row ownership granularity along x
    p_pad: int
    capacity: int
    max_run: int
    col_bounds: np.ndarray  # int64[ny+1]
    # Stacked per-device arrays, leading dims [kx, ny, ...]:
    a_rows: np.ndarray
    a_vals: np.ndarray
    a_k_local: np.ndarray  # k localised to the device's B shard rows
    offsets: np.ndarray
    p_total: np.ndarray  # [kx, ny]
    b_indptr: np.ndarray  # [kx, ny, klocal_max+1]
    b_cols: np.ndarray  # [kx, ny, nnzb_max]
    b_vals: np.ndarray


def shard_plan_2d(a_csc: CSC, b_csr: CSR, kx: int, ny: int) -> ShardedPlan2D:
    """Split k into ``kx`` FLOP-balanced ranges and B's columns into
    ``ny`` nnz-balanced ranges; compute exact exchange capacities."""
    if a_csc.shape[1] != b_csr.shape[0]:
        raise ValueError("inner dimensions differ")
    m, n = a_csc.shape[0], b_csr.shape[1]
    flops = per_outer_index_flops(a_csc, b_csr)
    k_bounds = balanced_contiguous_partition(flops.astype(np.float64), kx)
    col_hist = np.bincount(
        np.asarray(b_csr.indices, dtype=np.int64), minlength=n
    ).astype(np.float64)
    col_bounds = balanced_contiguous_partition(col_hist, ny)
    rows_per_dev = -(-m // kx)

    from outerspace_tpu.shard.tiled import slice_b_rows_cols

    a_ptr = np.asarray(a_csc.indptr)
    a_rows_all = np.asarray(a_csc.indices)
    a_vals_all = np.asarray(a_csc.data, dtype=np.float32)

    parts = {}
    max_nnz_a = max_nnz_b = max_kloc = 1
    max_p = 1
    for i in range(kx):
        k_lo, k_hi = int(k_bounds[i]), int(k_bounds[i + 1])
        kloc = k_hi - k_lo
        max_kloc = max(max_kloc, kloc)
        # A's k-slice (same for every j)
        e0, e1 = int(a_ptr[k_lo]), int(a_ptr[k_hi])
        a_rows_i = a_rows_all[e0:e1].astype(np.int32)
        a_vals_i = a_vals_all[e0:e1]
        a_k_i = (
            np.repeat(
                np.arange(k_lo, k_hi, dtype=np.int64),
                np.diff(a_ptr[k_lo : k_hi + 1]).astype(np.int64),
            )
            - k_lo
        ).astype(np.int32)
        max_nnz_a = max(max_nnz_a, a_rows_i.shape[0])
        for j in range(ny):
            c_lo, c_hi = int(col_bounds[j]), int(col_bounds[j + 1])
            # B shard: rows [k_lo, k_hi), cols [c_lo, c_hi) — one
            # vectorised mask + bincount (shard.tiled.slice_b_rows_cols),
            # no per-k Python loop.
            b_sl = slice_b_rows_cols(b_csr, k_lo, k_hi, c_lo, c_hi)
            ptr_loc = np.asarray(b_sl.indptr, dtype=np.int64)
            b_cols_ij = np.asarray(b_sl.indices).astype(np.int32)
            b_vals_ij = np.asarray(b_sl.data).astype(np.float32)
            counts = ptr_loc[a_k_i + 1] - ptr_loc[a_k_i]
            offs = np.zeros(a_k_i.shape[0] + 1, dtype=np.int64)
            np.cumsum(counts, out=offs[1:])
            p_ij = int(offs[-1])
            max_p = max(max_p, p_ij)
            max_nnz_b = max(max_nnz_b, b_cols_ij.shape[0])
            parts[(i, j)] = (
                a_rows_i, a_vals_i, a_k_i, ptr_loc, b_cols_ij, b_vals_ij,
                offs, p_ij,
            )
    if max_p >= 2**31:
        raise ValueError("per-device expansion exceeds int32 index space")
    p_pad = round_up_bucket(max_p)

    a_rows = np.zeros((kx, ny, max_nnz_a), np.int32)
    a_vals = np.zeros((kx, ny, max_nnz_a), np.float32)
    a_k_local = np.zeros((kx, ny, max_nnz_a), np.int32)
    offsets = np.zeros((kx, ny, max_nnz_a + 1), np.int32)
    p_total = np.zeros((kx, ny), np.int32)
    b_indptr = np.zeros((kx, ny, max_kloc + 1), np.int32)
    b_cols = np.zeros((kx, ny, max(max_nnz_b, 1)), np.int32)
    b_vals = np.zeros((kx, ny, max(max_nnz_b, 1)), np.float32)
    capacity = 1
    for (i, j), (ar, av, ak, ptr, bc, bv, offs, p_ij) in parts.items():
        na = ar.shape[0]
        a_rows[i, j, :na] = ar
        a_vals[i, j, :na] = av
        a_k_local[i, j, :na] = ak
        offsets[i, j, : na + 1] = offs.astype(np.int32)
        offsets[i, j, na + 1 :] = offs[-1]
        p_total[i, j] = p_ij
        b_indptr[i, j, : ptr.shape[0]] = ptr.astype(np.int32)
        b_indptr[i, j, ptr.shape[0] :] = ptr[-1]
        b_cols[i, j, : bc.shape[0]] = bc
        b_vals[i, j, : bv.shape[0]] = bv
        if na:
            counts = np.diff(offs)
            owners = ar // rows_per_dev
            per_dst = np.bincount(owners, weights=counts, minlength=kx)
            capacity = max(capacity, int(per_dst.max()))
    capacity = round_up_bucket(capacity, min_size=128)
    max_run = int(
        np.bincount(a_rows_all, minlength=m).max(initial=1)
    )
    max_run = 1 << (max(max_run, 1) - 1).bit_length()

    return ShardedPlan2D(
        m=m, n=n, kx=kx, ny=ny, rows_per_dev=rows_per_dev,
        p_pad=int(p_pad), capacity=int(capacity), max_run=max_run,
        col_bounds=col_bounds,
        a_rows=a_rows, a_vals=a_vals, a_k_local=a_k_local,
        offsets=offsets, p_total=p_total,
        b_indptr=b_indptr, b_cols=b_cols, b_vals=b_vals,
    )


def _local_shard_fn_2d(
    a_rows, a_vals, a_k, offsets, p_total, b_indptr, b_cols, b_vals,
    *, p_pad, sentinel_row, rows_per_dev, kx, capacity, axis, n_cols,
    packed, max_run,
):
    """Per-(i,j)-device program (leading [1,1] dims stripped). Identical
    dataflow to the 1-D version, but B arrays are the device's own 2-D
    shard and the exchange rides only the k/row axis."""
    r, c, v = expand_partial_products(
        a_rows[0, 0], a_vals[0, 0], a_k[0, 0], b_indptr[0, 0],
        b_cols[0, 0], b_vals[0, 0], offsets[0, 0], p_total[0, 0],
        p_pad, sentinel_row,
    )
    r, c, v = jax.lax.sort((r, c, v), num_keys=1, is_stable=False)
    # Contiguous owner buckets → slice fill, never scatters (see the
    # 1-D variant for the measured random-access rationale).
    row_bounds = jnp.minimum(
        jnp.arange(1, kx + 1, dtype=jnp.int32) * rows_per_dev,
        sentinel_row,
    )
    bstart = jnp.concatenate(
        [jnp.zeros(1, jnp.int32),
         jnp.searchsorted(r, row_bounds, side="left").astype(jnp.int32)]
    )
    send_r, send_c, send_v = _slice_fill_buckets(
        bstart[:-1], bstart[1:], capacity, kx,
        (r, _I32_MAX), (c, 0), (v, 0.0),
    )
    recv_r = jax.lax.all_to_all(
        send_r, axis, 0, 0, tiled=False
    ).reshape(kx * capacity)
    recv_c = jax.lax.all_to_all(
        send_c, axis, 0, 0, tiled=False
    ).reshape(kx * capacity)
    recv_v = jax.lax.all_to_all(
        send_v, axis, 0, 0, tiled=False
    ).reshape(kx * capacity)
    if packed:
        valid_r = recv_r < sentinel_row
        key = jnp.where(
            valid_r, pack_key_biased(recv_r, recv_c, n_cols), _I32_MAX
        )
        pad = jnp.int32(recv_r.shape[0]) - jnp.sum(
            valid_r.astype(jnp.int32)
        )
        mr, mc, mv, mvalid, nnz = merge_biased_keys(
            key, recv_v, n_cols, sentinel_row, max_run, pad_count=pad
        )
    else:
        mr, mc, mv, mvalid, nnz = merge_twokey(
            recv_r, recv_c, recv_v, _I32_MAX, max_run
        )
    return (
        mr[None, None], mc[None, None], mv[None, None],
        mvalid[None, None], nnz[None, None],
    )


def spgemm_sharded_2d(plan: ShardedPlan2D, mesh: Mesh,
                      axes: tuple[str, str] = ("x", "y")):
    """Run the 2-D sharded SpGEMM over ``mesh`` (axes = (k/row, col));
    returns stacked per-device padded merged COO arrays + per-device nnz."""
    from jax.experimental.shard_map import shard_map

    ax, ay = axes
    spec = P(ax, ay)
    fn = functools.partial(
        _local_shard_fn_2d,
        p_pad=plan.p_pad,
        sentinel_row=plan.m,
        rows_per_dev=plan.rows_per_dev,
        kx=plan.kx,
        capacity=plan.capacity,
        axis=ax,
        n_cols=plan.n,
        packed=bool(plan.m * plan.n < 2**32),
        max_run=plan.max_run,
    )
    sharded = shard_map(
        fn,
        mesh=mesh,
        in_specs=(spec,) * 8,
        out_specs=(spec,) * 5,
        check_rep=False,
    )
    args = (
        jnp.asarray(plan.a_rows), jnp.asarray(plan.a_vals),
        jnp.asarray(plan.a_k_local), jnp.asarray(plan.offsets),
        jnp.asarray(plan.p_total), jnp.asarray(plan.b_indptr),
        jnp.asarray(plan.b_cols), jnp.asarray(plan.b_vals),
    )
    with mesh:
        return jax.jit(sharded)(*args)


def sharded_2d_result_to_csr(plan: ShardedPlan2D, out) -> "CSR":
    """Gather per-device merged outputs to host and assemble the CSR."""
    from outerspace_tpu.formats.coo import COO

    mr, mc, mv, mvalid, _ = out
    mr = np.asarray(mr).reshape(plan.kx, plan.ny, -1)
    mc = np.asarray(mc).reshape(plan.kx, plan.ny, -1)
    mv = np.asarray(mv).reshape(plan.kx, plan.ny, -1)
    mvalid = np.asarray(mvalid).reshape(plan.kx, plan.ny, -1)
    rows_l, cols_l, vals_l = [], [], []
    for i in range(plan.kx):
        for j in range(plan.ny):
            sel = mvalid[i, j]
            rows_l.append(mr[i, j][sel])
            cols_l.append(mc[i, j][sel])
            vals_l.append(mv[i, j][sel])
    coo = COO(
        (plan.m, plan.n),
        np.concatenate(rows_l),
        np.concatenate(cols_l),
        np.concatenate(vals_l),
    )
    return coo.to_csr()
