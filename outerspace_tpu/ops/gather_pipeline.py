"""Row-split SpGEMM pipeline over the windowed-gather expand kernel.

The packed-uint32 merge key covers m·n ≤ 2^32. For larger output spaces
(e.g. the 100k×100k ER workload, m·n = 10^10), the outer-product stream is
**partitioned by output-row ranges** chosen so each part's span×n fits the
key space (``sched.gplanner.row_partition``). Each part expands with the
windowed-gather kernel (exact P, no tile padding — ``ops.pallas.gexpand``;
wide rows are chunked by the range planner so nothing needs a fallback),
merges with the single-key packed sort, and the parts concatenate into one
device-resident ``MergedCOO`` that is globally row-major by construction.

This is the TPU-native form of the reference's multiply→merge exchange for
the uniform/low-skew regime: the row ranges play the role output-row
ownership played across the reference's merge PEs
(``SimOuterSPACE.cpp:554-606``), with zero expansion padding.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from outerspace_tpu.formats.csr import CSC, CSR
from outerspace_tpu.ops.pallas.gexpand import (
    gather_plan_to_device,
    gather_plan_to_host,
)
from outerspace_tpu.ops.spgemm import (
    MergedCOO,
    merge_biased_keys,
)
from outerspace_tpu.sched.gplanner import (
    WIDE_B_WIN,
    call_search_bits,
    padded_group_count,
    plan_gather_ranges,
    row_partition,
    slabbed_stream_len,
)


@dataclasses.dataclass
class GatherPart:
    row_base: int
    span: int
    b_win: int  # B-window blocks (kernel variant) this part planned with
    ngroups: int
    p_out: int  # gather stream length
    p_real: int
    merge_pad: int  # bucketed total merge stream length
    max_run: int
    dev: dict  # device arrays
    # per-slab-call owner-search depth (gplanner.call_search_bits);
    # COMMON across commonized parts so they share one executable
    call_bits: tuple[int, ...] | None = None


@dataclasses.dataclass
class GatherPipelinePlan:
    m: int
    n: int
    parts: list[GatherPart]

    @property
    def flops(self) -> int:
        return sum(p.p_real for p in self.parts)

    @property
    def padded_total(self) -> int:
        return sum(p.merge_pad for p in self.parts)


def plan_spgemm_gather(
    a_csc: CSC, b_csr: CSR, part_cap: int | None = None
) -> GatherPipelinePlan:
    """Host planning: row partition + per-part gather plans + staging.

    Rows wider than the kernel's B-window are *chunked* by the range
    planner (``plan_gather_ranges``), so every element is window-servable
    and the XLA flat fallback is never used. ``part_cap`` overrides the
    partitioner's perf-driven part limit (``gplanner.PART_CAP``)."""
    m, n = a_csc.shape[0], b_csr.shape[1]
    # part_cap passes through only when set (tests monkeypatch
    # row_partition with narrower signatures)
    bounds = (
        row_partition(a_csc, b_csr) if part_cap is None
        else row_partition(a_csc, b_csr, part_cap=part_cap)
    )
    nbv = b_csr.major_nnz().astype(np.int64)
    b_ptr = np.asarray(b_csr.indptr).astype(np.int64)
    b_cols_all = np.asarray(b_csr.indices)
    b_vals_all = np.asarray(b_csr.data)
    ks = np.nonzero(nbv > 0)[0].astype(np.int64)
    multi = len(bounds) > 2
    a_rows_all = np.asarray(a_csc.indices)
    a_k_all = np.repeat(
        np.arange(a_csc.shape[1], dtype=np.int64),
        a_csc.major_nnz().astype(np.int64),
    )
    parts: list[GatherPart] = []
    staged: list[tuple] = []
    for lo, hi in zip(bounds[:-1], bounds[1:]):
        lo, hi = int(lo), int(hi)
        if multi:
            # Per-part COMPACTED B: only the k's with at least one
            # in-range A element keep their rows, laid out contiguously.
            # Without this, k's whose elements all fall outside the row
            # range leave jb gaps that the subtile B-span constraint
            # charges against every window — er100k's parts lost ~18%
            # subtile fill to them. Also cuts per-part b_pack staging.
            sel = (a_rows_all >= lo) & (a_rows_all < hi)
            ks_ref = np.unique(a_k_all[sel])
            ks_ref = ks_ref[nbv[ks_ref] > 0]
            if ks_ref.shape[0] == 0:
                continue
            nb_ref = nbv[ks_ref]
            jb_sub = np.zeros(ks_ref.shape[0], dtype=np.int64)
            np.cumsum(nb_ref[:-1], out=jb_sub[1:])
            flat_keep = np.concatenate(
                [np.arange(b_ptr[k], b_ptr[k] + nbv[k]) for k in ks_ref]
            ) if ks_ref.shape[0] < 4096 else None
            if flat_keep is None:
                # vectorised flat selection for large k sets
                row_of_flat = np.repeat(
                    np.arange(nbv.shape[0], dtype=np.int64), nbv
                )
                keep_mask = np.zeros(nbv.shape[0], dtype=bool)
                keep_mask[ks_ref] = True
                flat_keep = np.nonzero(keep_mask[row_of_flat])[0]
            # the compacted jb advances ~1 position per product, so a
            # full subtile spans up to ~(SUB_P/2) lanes: plan with the
            # wide window variant to keep subtiles ~full
            plan = plan_gather_ranges(
                a_csc, ks_ref, jb_sub, nb_ref,
                b_cols_all[flat_keep], b_vals_all[flat_keep], m, n,
                row_range=(lo, hi), row_base=lo, b_win=WIDE_B_WIN,
            )
        else:
            plan = plan_gather_ranges(
                a_csc, ks, b_ptr[ks], nbv[ks],
                b_cols_all, b_vals_all, m, n,
                row_base=lo,
            )
        if plan is None:
            continue
        rows_here = np.asarray(a_csc.indices)
        sel = (rows_here >= lo) & (rows_here < hi)
        mr = int(np.bincount(rows_here[sel] - lo, minlength=1).max(initial=1))
        staged.append((lo, hi, plan, 1 << (max(mr, 1) - 1).bit_length()))

    if len(staged) > 1:
        # COMMONIZE the parts to one static/shape signature so every
        # part runs the SAME ``_part_device`` executable: the jit is
        # keyed on (ngroups, b_win, merge_pad, sentinel_row, max_run) +
        # input shapes, and a monolithic program inlining N parts
        # compiles N structurally-identical giant sorts (measured: the
        # dominant cost of cold A² benches). Group counts round up to a
        # slab granule (padding groups emit pure sentinel, plen = 0),
        # packs pad with clamped-read zero blocks, merge streams share
        # the widest bucket (sentinels sort to the tail and pad_count
        # stays per-part exact), and max_run takes the part maximum
        # (an upper bound is always sound). Product-balanced splits
        # keep the padding waste small.
        ngroups_pad = padded_group_count(
            max(p.ngroups for _, _, p, _ in staged)
        )
        stream_len = slabbed_stream_len(ngroups_pad)
        # merge_pad = the stream length exactly (it is a multiple of the
        # slab granule × 8192, so the Pallas epilogue's pow2-divisor
        # constraint holds). Bucketing it further is pure sort-stream
        # waste with NO compile dedup: the jit key already contains
        # ngroups, and merge_pad is deterministic in ngroups — measured
        # on rmat15, the old coarse bucket padded 8 parts from 6.82M to
        # 7.34M pairs (+7.7% of the dominant sort) for nothing.
        merge_pad = max(stream_len, 4096)
        nab8_pad = max(p.a_pack.shape[0] // 8 for _, _, p, _ in staged)
        nbb8_pad = max(p.b_pack.shape[0] // 8 for _, _, p, _ in staged)
        max_run = max(r for _, _, _, r in staged)
        # COMMON per-call search depth: the per-position width max over
        # parts (each part orders its groups width-descending, so
        # positions align); one tuple keeps the one-executable property
        gw_max = np.ones(ngroups_pad, dtype=np.int64)
        for _, _, plan, _ in staged:
            if plan.group_width is not None:
                gw_max[: plan.ngroups] = np.maximum(
                    gw_max[: plan.ngroups], plan.group_width
                )
        common_bits = call_search_bits(gw_max, ngroups_pad)
        for lo, hi, plan, _ in staged:
            host = gather_plan_to_host(
                plan, ngroups_pad=ngroups_pad,
                nab8_pad=nab8_pad, nbb8_pad=nbb8_pad,
            )
            parts.append(
                GatherPart(
                    row_base=lo,
                    span=hi - lo,
                    b_win=plan.b_win,
                    ngroups=ngroups_pad,
                    p_out=stream_len,
                    p_real=plan.p_real,
                    merge_pad=merge_pad,
                    max_run=max_run,
                    dev={k: jnp.asarray(v) for k, v in host.items()},
                    call_bits=common_bits,
                )
            )
    elif staged:
        lo, hi, plan, max_run = staged[0]
        # p_out is a whole-slab stream (multiple of granule × 8192), so
        # it already satisfies the Pallas epilogue's pow2-divisor-≥1024
        # constraint; see the multi-part branch for why bucketing
        # further would be pure sort waste.
        merge_pad = max(plan.p_out, 4096)
        parts.append(
            GatherPart(
                row_base=lo,
                span=hi - lo,
                b_win=plan.b_win,
                ngroups=plan.ngroups,
                p_out=plan.p_out,
                p_real=plan.p_real,
                merge_pad=merge_pad,
                max_run=max_run,
                dev=gather_plan_to_device(plan),
                call_bits=call_search_bits(plan.group_width, plan.ngroups),
            )
        )
    return GatherPipelinePlan(m, n, parts)


@functools.partial(
    jax.jit,
    static_argnames=(
        "ngroups", "b_win", "merge_pad", "n_cols", "sentinel_row",
        "max_run", "call_bits", "interpret",
    ),
)
def _part_device(
    dev: dict,
    *,
    ngroups: int,
    b_win: int,
    merge_pad: int,
    n_cols: int,
    sentinel_row: int,
    max_run: int,
    call_bits: tuple[int, ...] | None = None,
    interpret: bool = False,
):
    # dev may carry "val_bump": a traced f32 scalar added to the value
    # stream (+0.0 in practice). Benchmarks chain iterations through it so
    # XLA cannot common-subexpression-eliminate repeated pipelines.
    from outerspace_tpu.ops.pallas.gexpand import expand_gather_slabbed

    keys_l, vals_l = expand_gather_slabbed(
        dev, ngroups, b_win=b_win, interpret=interpret,
        call_bits=call_bits,
    )
    key = jnp.concatenate(keys_l) if len(keys_l) > 1 else keys_l[0]
    vals = jnp.concatenate(vals_l) if len(vals_l) > 1 else vals_l[0]
    if "val_bump" in dev:
        vals = vals + dev["val_bump"]
    extra = merge_pad - key.shape[0]
    if extra:
        key = jnp.concatenate(
            [key, jnp.full(extra, np.int32(2**31 - 1), jnp.int32)]
        )
        vals = jnp.concatenate([vals, jnp.zeros(extra, jnp.float32)])
    pad_count = jnp.int32(merge_pad) - dev["p_real_total"]
    return merge_biased_keys(
        key, vals, n_cols, sentinel_row, max_run, pad_count,
        interpret=interpret,
        epilogue="pallas" if interpret else None,
    )


def stack_parts(plan: GatherPipelinePlan) -> dict:
    """Stack the commonized parts' device arrays along a leading part
    axis for the scanned runner (:func:`_parts_scan_device`).

    Parts built by the multi-part branch of :func:`plan_spgemm_gather`
    share every shape and static by construction, so the stack is legal;
    it runs on device (the per-part arrays are already shipped), costing
    one HBM copy. The result is cached on the plan (``plan._stacked``)
    so repeated runs reuse it."""
    cached = getattr(plan, "_stacked", None)
    if cached is not None:
        return cached
    parts = plan.parts
    assert len(parts) > 1
    stacked = {
        k: jnp.stack([p.dev[k] for p in parts])
        for k in ("bases", "table", "a_pack", "b_pack")
    }
    stacked["p_real"] = jnp.asarray(
        [p.p_real for p in parts], dtype=jnp.int32
    )
    stacked["row_base"] = jnp.asarray(
        [p.row_base for p in parts], dtype=jnp.int32
    )
    object.__setattr__(plan, "_stacked", stacked)
    return stacked


@functools.partial(
    jax.jit,
    static_argnames=(
        "ngroups", "b_win", "merge_pad", "n_cols", "sentinel_row",
        "max_run", "call_bits", "interpret",
    ),
)
def _parts_scan_device(
    stacked: dict,
    val_bump,
    *,
    ngroups: int,
    b_win: int,
    merge_pad: int,
    n_cols: int,
    sentinel_row: int,
    max_run: int,
    call_bits: tuple[int, ...] | None = None,
    interpret: bool = False,
):
    """ALL commonized row parts in ONE executable: a ``lax.scan`` whose
    body is the per-part expand → pad → sort → epilogue program.

    MEASURED NEGATIVE RESULT — the scan is ~33% SLOWER than the
    dispatch loop (rmat14 A², 7 parts, same session: 42.7 vs
    32.0 ms/op on the tunneled v5e). The hypothesis was that per-part
    dispatch latency eats the fine-partition sort win; in fact
    dispatches are async — the host loop enqueues all parts and the
    device pipelines them back-to-back — while the scan (a) serializes
    parts through the ``nnz_acc`` carry, denying XLA any cross-part
    overlap, and (b) pays a per-iteration dynamic-slice of every
    stacked operand (an extra HBM copy of a_pack/b_pack/table per
    part). The runner is kept as an explicitly-selectable variant
    (``spgemm_gather_padded(scanned=True)``) because it is the shape a
    megacore/multi-queue chip would want, and as the concrete record
    of this measurement; the default path is the dispatch loop.

    ``val_bump``: traced f32 added to each part's value stream;
    benchmark chains thread an opaque zero through it to defeat CSE
    (one executable called K times WOULD be CSE'd otherwise)."""
    from outerspace_tpu.ops.pallas.gexpand import expand_gather_slabbed

    def body(nnz_acc, xs):
        dev_i = {
            "bases": xs["bases"],
            "table": xs["table"],
            "a_pack": xs["a_pack"],
            "b_pack": xs["b_pack"],
        }
        keys_l, vals_l = expand_gather_slabbed(
            dev_i, ngroups, b_win=b_win, interpret=interpret,
            call_bits=call_bits,
        )
        key = jnp.concatenate(keys_l) if len(keys_l) > 1 else keys_l[0]
        vals = jnp.concatenate(vals_l) if len(vals_l) > 1 else vals_l[0]
        vals = vals + val_bump
        extra = merge_pad - key.shape[0]
        if extra:
            key = jnp.concatenate(
                [key, jnp.full(extra, np.int32(2**31 - 1), jnp.int32)]
            )
            vals = jnp.concatenate([vals, jnp.zeros(extra, jnp.float32)])
        r, c, v, valid, pn = merge_biased_keys(
            key, vals, n_cols, sentinel_row, max_run,
            pad_count=jnp.int32(merge_pad) - xs["p_real"],
            interpret=interpret,
            epilogue="pallas" if interpret else None,
        )
        rg = jnp.where(valid, r + xs["row_base"], np.int32(sentinel_row))
        return nnz_acc + pn, (rg, c, v, valid)

    nnz, (rows, cols, vals, valid) = jax.lax.scan(
        body, jnp.int32(0), stacked
    )
    return (
        rows.reshape(-1), cols.reshape(-1), vals.reshape(-1),
        valid.reshape(-1), nnz,
    )


def spgemm_gather_padded(
    plan: GatherPipelinePlan, interpret: bool = False,
    scanned: bool = False,
) -> MergedCOO:
    """Run all row parts and concatenate into one MergedCOO.

    The default runner is the per-part dispatch loop: dispatches are
    async, so the device pipelines the commonized parts back-to-back
    with no host round-trip between them. ``scanned=True`` selects the
    one-dispatch ``lax.scan`` executable instead — measured ~33%
    slower (see :func:`_parts_scan_device`), kept selectable."""
    if jax.default_backend() == "cpu":
        interpret = True  # Pallas kernels only run interpreted off-TPU
    if scanned and len(plan.parts) > 1:
        p0 = plan.parts[0]
        rows, cols, vals, valid, nnz = _parts_scan_device(
            stack_parts(plan),
            jnp.float32(0.0),
            ngroups=p0.ngroups,
            b_win=p0.b_win,
            merge_pad=p0.merge_pad,
            n_cols=plan.n,
            sentinel_row=plan.m,
            max_run=p0.max_run,
            call_bits=p0.call_bits,
            interpret=interpret,
        )
        return MergedCOO((plan.m, plan.n), rows, cols, vals, valid, nnz)
    rows_l, cols_l, vals_l, valid_l, nnz = [], [], [], [], jnp.int32(0)
    for p in plan.parts:
        dev = dict(p.dev)
        dev["p_real_total"] = jnp.int32(p.p_real)
        r, c, v, valid, pn = _part_device(
            dev,
            ngroups=p.ngroups,
            b_win=p.b_win,
            merge_pad=p.merge_pad,
            call_bits=p.call_bits,
            n_cols=plan.n,
            # COMMON sentinel across parts (invalid rows are masked by
            # ``valid`` everywhere; a per-part span here would fork the
            # shared executable on a cosmetic static)
            sentinel_row=plan.m,
            max_run=p.max_run,
            interpret=interpret,
        )
        rows_l.append(
            jnp.where(valid, r + np.int32(p.row_base), np.int32(plan.m))
        )
        cols_l.append(c)
        vals_l.append(v)
        valid_l.append(valid)
        nnz = nnz + pn
    cat = (lambda xs: jnp.concatenate(xs) if len(xs) > 1 else xs[0])
    return MergedCOO(
        (plan.m, plan.n),
        cat(rows_l), cat(cols_l), cat(vals_l), cat(valid_l), nnz,
    )


def spgemm_gather(a, b, interpret: bool = False) -> CSR:
    """C = A @ B via the row-split windowed-gather pipeline."""
    if jax.default_backend() == "cpu":
        interpret = True
    a_csc = a if isinstance(a, CSC) else a.to_csc()
    b_csr = b if isinstance(b, CSR) else b.to_csr()
    plan = plan_spgemm_gather(a_csc, b_csr)
    if not plan.parts:
        from outerspace_tpu.formats.coo import INDEX_DTYPE, VALUE_DTYPE

        return CSR(
            (plan.m, plan.n),
            np.zeros(plan.m + 1, dtype=np.int64),
            np.zeros(0, dtype=INDEX_DTYPE),
            np.zeros(0, dtype=VALUE_DTYPE),
        )
    return spgemm_gather_padded(plan, interpret=interpret).to_csr()
