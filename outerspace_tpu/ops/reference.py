"""Golden functional outer-product SpGEMM model + oracles.

Re-design of the reference's ``TaskProvider`` (``simulator/SimOuterSPACE.cpp:
29-144``): the same two-phase structure — a *multiply phase* that pairs
column *i* of A with row *i* of B emitting partial-product rows, and a
*merge phase* that per output row concatenates, sorts and accumulates
partials — but with **correct numerics**. The reference stores the loop
position ``k`` instead of the true column index (``SimOuterSPACE.cpp:89``)
and inverts the merge dedup condition (``:120-125``); both defects are fixed
here and guarded by tests against scipy.

This module is pure numpy: it is the CPU reference the TPU kernels are
validated against and the wall-clock baseline the benchmark speedups are
measured from.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from outerspace_tpu.formats.coo import COO, INDEX_DTYPE, VALUE_DTYPE
from outerspace_tpu.formats.csr import CSC, CSR


# --------------------------------------------------------------------------
# Task structures (parity: MultiplyTask / MergeTask, SimOuterSPACE.cpp:34-42)
# --------------------------------------------------------------------------


@dataclasses.dataclass
class MultiplyTask:
    """One outer-product pairing: a single element of column ``k`` of A
    scaled against all of row ``k`` of B, producing one partial row of C."""

    k: int  # outer-product index (column of A / row of B)
    out_row: int  # row of C this partial row belongs to
    a_val: float
    b_cols: np.ndarray  # column ids of the partial row
    b_vals: np.ndarray  # values of row k of B (unscaled)

    @property
    def flops(self) -> int:
        return int(self.b_cols.shape[0])


@dataclasses.dataclass
class MergeTask:
    """Accumulation of all partial rows landing in one output row."""

    out_row: int
    input_sizes: list[int]
    output_nnz: int

    @property
    def ways(self) -> int:
        return len(self.input_sizes)


@dataclasses.dataclass
class SpGEMMResult:
    c: CSR
    multiply_tasks: list[MultiplyTask]
    merge_tasks: list[MergeTask]
    flops: int  # multiply-phase FLOPs = Σ nnz(colA_i)·nnz(rowB_i)


# --------------------------------------------------------------------------
# Functional model
# --------------------------------------------------------------------------


def spgemm_tasks(a_csc: CSC, b_csr: CSR, with_tasks: bool = True) -> SpGEMMResult:
    """Run both phases eagerly (as the reference ctor does,
    ``SimOuterSPACE.cpp:46-57``) and return C plus the task lists the
    performance models consume."""
    if a_csc.shape[1] != b_csr.shape[0]:
        raise ValueError(
            f"inner dimensions differ: {a_csc.shape} @ {b_csr.shape}"
        )
    m, n = a_csc.shape[0], b_csr.shape[1]
    k_dim = a_csc.shape[1]

    # Multiply phase (SimOuterSPACE.cpp:74-97): per outer-product index k,
    # each element of col k of A scales all of row k of B.
    partial_rows: dict[int, list[tuple[np.ndarray, np.ndarray]]] = {}
    multiply_tasks: list[MultiplyTask] = []
    flops = 0
    for k in range(k_dim):
        a_rows, a_vals = a_csc.col_slice(k)
        if a_rows.shape[0] == 0:
            continue
        b_cols, b_vals = b_csr.row_slice(k)
        if b_cols.shape[0] == 0:
            continue
        flops += a_rows.shape[0] * b_cols.shape[0]
        for r, av in zip(a_rows, a_vals):
            partial_rows.setdefault(int(r), []).append((b_cols, av * b_vals))
            if with_tasks:
                multiply_tasks.append(
                    MultiplyTask(k, int(r), float(av), b_cols, b_vals)
                )

    # Merge phase (SimOuterSPACE.cpp:98-132, corrected): per output row,
    # concatenate partials, sort by column, accumulate equal columns.
    merge_tasks: list[MergeTask] = []
    out_indptr = np.zeros(m + 1, dtype=np.int64)
    out_cols: list[np.ndarray] = []
    out_vals: list[np.ndarray] = []
    for r in sorted(partial_rows):
        parts = partial_rows[r]
        cols = np.concatenate([p[0] for p in parts])
        vals = np.concatenate([p[1] for p in parts])
        order = np.argsort(cols, kind="stable")
        cols, vals = cols[order], vals[order]
        new = np.ones(cols.shape[0], dtype=bool)
        new[1:] = cols[1:] != cols[:-1]
        seg = np.cumsum(new) - 1
        acc = np.zeros(int(seg[-1]) + 1, dtype=np.float64)
        np.add.at(acc, seg, vals.astype(np.float64))
        out_indptr[r + 1] = acc.shape[0]
        out_cols.append(cols[new])
        out_vals.append(acc.astype(VALUE_DTYPE))
        if with_tasks:
            merge_tasks.append(
                MergeTask(r, [int(p[0].shape[0]) for p in parts], acc.shape[0])
            )
    np.cumsum(out_indptr, out=out_indptr)
    c = CSR(
        (m, n),
        out_indptr,
        np.concatenate(out_cols) if out_cols else np.zeros(0, INDEX_DTYPE),
        np.concatenate(out_vals) if out_vals else np.zeros(0, VALUE_DTYPE),
    )
    return SpGEMMResult(c, multiply_tasks, merge_tasks, flops)


def spgemm_reference(a: COO | CSR | CSC, b: COO | CSR | CSC) -> CSR:
    """C = A @ B via the golden functional model (no task capture)."""
    a_csc = a if isinstance(a, CSC) else a.to_csc()
    b_csr = b if isinstance(b, CSR) else b.to_csr()
    return spgemm_tasks(a_csc, b_csr, with_tasks=False).c


def spgemm_scipy(a: COO | CSR | CSC, b: COO | CSR | CSC) -> CSR:
    """scipy oracle: the independent checker and the CPU wall-clock baseline
    (``BASELINE.json`` measures speedups against CPU-reference SpGEMM)."""
    c = a.to_scipy().tocsr() @ b.to_scipy().tocsr()
    c.sum_duplicates()
    c.sort_indices()
    return CSR.from_scipy(c)


def spgemm_flops(a_csc: CSC, b_csr: CSR) -> int:
    """Multiply-phase FLOP count Σᵢ nnz(col i of A)·nnz(row i of B) —
    the reference's GFLOP/s numerator (``SimSpGEMM.cpp:884-891``)."""
    return int(
        np.dot(
            a_csc.major_nnz().astype(np.int64),
            b_csr.major_nnz().astype(np.int64),
        )
    )


# --------------------------------------------------------------------------
# Golden-check utilities (parity: compareCOO, SimSpGEMM.cpp:283-297)
# --------------------------------------------------------------------------


def compare_coo(a: COO, b: COO, eps: float = 1e-6, relative: bool = True) -> bool:
    """Sorted element-wise COO equality; the reference used absolute
    eps=1e-6 (``SimSpGEMM.cpp:283``), we default to relative which is
    stricter for small values and saner for large ones."""
    if a.shape != b.shape or a.nnz != b.nnz:
        return False
    sa, sb = a.sorted_rowmajor(), b.sorted_rowmajor()
    if not (np.array_equal(sa.row, sb.row) and np.array_equal(sa.col, sb.col)):
        return False
    if relative:
        denom = np.maximum(np.abs(sa.val), np.abs(sb.val))
        denom = np.where(denom == 0, 1.0, denom)
        return bool(np.all(np.abs(sa.val - sb.val) / denom <= eps))
    return bool(np.all(np.abs(sa.val - sb.val) <= eps))


def assert_csr_allclose(
    actual: CSR, expected: CSR, rtol: float = 1e-6, atol: float = 1e-6
) -> None:
    """Hard-failing CSR comparison for tests (nnz-exact + value-close)."""
    assert actual.shape == expected.shape, (actual.shape, expected.shape)
    assert actual.nnz == expected.nnz, (actual.nnz, expected.nnz)
    np.testing.assert_array_equal(actual.indptr, expected.indptr)
    np.testing.assert_array_equal(actual.indices, expected.indices)
    np.testing.assert_allclose(actual.data, expected.data, rtol=rtol, atol=atol)
