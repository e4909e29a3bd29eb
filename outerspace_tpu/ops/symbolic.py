"""Symbolic (nnz-sizing) pass: static shapes before numeric work.

SpGEMM's output size is input-dependent, which collides with XLA's
static-shape compilation model. This pass computes, on the host, everything
shape-like about ``C = A @ B`` *before* any device work:

- the exact partial-product (expansion) count
  ``P = Σₑ nnz(B.row(col(e)))`` over nonzeros *e* of A — the device
  multiply phase then runs over a padded static ``P_pad``;
- per-outer-index FLOP counts (the reference's per-task compute metric,
  ``SimOuterSPACE.cpp:176-181``) for the scheduler's load balancing;
- an upper bound on output nnz (``min(P, rows*cols)``).

Padding is bucketed to powers of two so repeated calls at similar sizes
reuse compiled executables instead of recompiling per nnz.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from outerspace_tpu.formats.csr import CSC, CSR


def round_up_bucket(n: int, min_size: int = 256) -> int:
    """Smallest bucket ≥ n from the {2^k, 1.25·2^k, 1.5·2^k, 1.75·2^k}
    grid (≥ min_size) — bounds both recompiles (≤4 buckets per octave) and
    padding waste (≤25%)."""
    n = max(int(n), min_size)
    pow2 = 1 << (n - 1).bit_length()
    for frac in (4, 5, 6, 7):
        cand = (pow2 // 8) * frac
        if cand >= n:
            return cand
    return pow2


@dataclasses.dataclass
class ExpansionPlan:
    """Host-side static plan for one SpGEMM. All arrays are flat,
    device-shippable, and sized by nnz(A) or nnz(B) — not by P."""

    m: int  # rows of C
    n: int  # cols of C
    k: int  # inner dimension
    # Per-nonzero-of-A (CSC order): output row, value, outer index k.
    a_rows: np.ndarray  # int32[nnz_a]
    a_vals: np.ndarray  # f32[nnz_a]
    a_k: np.ndarray  # int32[nnz_a]
    # B in CSR form.
    b_indptr: np.ndarray  # int64[k+1] (int32-safe values)
    b_cols: np.ndarray  # int32[nnz_b]
    b_vals: np.ndarray  # f32[nnz_b]
    # Expansion offsets: partial products of A-nonzero e occupy
    # [offsets[e], offsets[e+1]).
    offsets: np.ndarray  # int64[nnz_a + 1]

    @property
    def expansion_size(self) -> int:
        """Exact partial-product count P (= multiply-phase FLOPs,
        ``SimSpGEMM.cpp:884-891``)."""
        return int(self.offsets[-1])

    @property
    def flops(self) -> int:
        return self.expansion_size

    @property
    def output_nnz_upper_bound(self) -> int:
        return min(self.expansion_size, self.m * self.n)

    def padded_size(self, min_size: int = 256) -> int:
        return round_up_bucket(max(self.expansion_size, 1), min_size)


def expansion_plan(a_csc: CSC, b_csr: CSR) -> ExpansionPlan:
    """Build the symbolic plan for ``C = A @ B`` from CSC(A) and CSR(B)."""
    if a_csc.shape[1] != b_csr.shape[0]:
        raise ValueError(
            f"inner dimensions differ: {a_csc.shape} @ {b_csr.shape}"
        )
    k_dim = a_csc.shape[1]
    a_nnz_per_col = a_csc.major_nnz().astype(np.int64)
    # Outer index of each A nonzero (CSC order → column id repeated).
    a_k = np.repeat(np.arange(k_dim, dtype=np.int32), a_nnz_per_col)
    b_row_nnz = b_csr.major_nnz().astype(np.int64)
    counts = b_row_nnz[a_k]
    offsets = np.zeros(a_k.shape[0] + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    return ExpansionPlan(
        m=a_csc.shape[0],
        n=b_csr.shape[1],
        k=k_dim,
        a_rows=a_csc.indices,
        a_vals=a_csc.data,
        a_k=a_k,
        b_indptr=b_csr.indptr,
        b_cols=b_csr.indices,
        b_vals=b_csr.data,
        offsets=offsets,
    )


def expansion_plan_subset(
    a_csc: CSC, b_csr: CSR, k_subset: np.ndarray
) -> ExpansionPlan:
    """Expansion plan restricted to outer indices in ``k_subset`` (the
    scheduler's light-k residue, ``sched/planner.py``)."""
    k_dim = a_csc.shape[1]
    keep_k = np.zeros(k_dim, dtype=bool)
    keep_k[k_subset] = True
    a_nnz_per_col = a_csc.major_nnz().astype(np.int64)
    a_k = np.repeat(np.arange(k_dim, dtype=np.int32), a_nnz_per_col)
    keep_e = keep_k[a_k]
    a_k = a_k[keep_e]
    b_row_nnz = b_csr.major_nnz().astype(np.int64)
    counts = b_row_nnz[a_k]
    offsets = np.zeros(a_k.shape[0] + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    return ExpansionPlan(
        m=a_csc.shape[0],
        n=b_csr.shape[1],
        k=k_dim,
        a_rows=a_csc.indices[keep_e],
        a_vals=a_csc.data[keep_e],
        a_k=a_k,
        b_indptr=b_csr.indptr,
        b_cols=b_csr.indices,
        b_vals=b_csr.data,
        offsets=offsets,
    )


def per_outer_index_flops(a_csc: CSC, b_csr: CSR) -> np.ndarray:
    """FLOPs contributed by each outer-product index
    (= nnz(col i of A) · nnz(row i of B)) — the skew signal the scheduler
    buckets on (replacing round-robin, ``SimOuterSPACE.cpp:153-174``)."""
    return a_csc.major_nnz().astype(np.int64) * b_csr.major_nnz().astype(
        np.int64
    )
