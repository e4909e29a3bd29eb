"""Graph kernels on repeated SpGEMM: triangle counting + Markov clustering.

``BASELINE.json`` configs[3]: "Graph kernels: triangle counting +
Markov-clustering iterations via repeated A^2". Both are classic
SpGEMM-bound workloads (the OuterSPACE paper's own evaluation suite used
them); they chain the TPU pipeline output back into new plans.
"""

from __future__ import annotations

import numpy as np

from outerspace_tpu.formats.coo import COO
from outerspace_tpu.formats.csr import CSR
from outerspace_tpu.ops.spgemm import spgemm


def triangle_count(adj: COO | CSR, backend: str = "tpu") -> int:
    """Count triangles in an undirected simple graph.

    tri = Σᵢⱼ (A² ∘ A) / 6 for a symmetric 0/1 adjacency without
    self-loops (each triangle counted twice per vertex ordering).
    """
    a = adj if isinstance(adj, CSR) else adj.to_csr()
    # Binarize + symmetrize + drop diagonal.
    coo = a.to_coo()
    keep = coo.row != coo.col
    coo = COO(
        coo.shape,
        coo.row[keep],
        coo.col[keep],
        np.ones(int(keep.sum()), dtype=np.float32),
    )
    sym = COO(
        coo.shape,
        np.concatenate([coo.row, coo.col]),
        np.concatenate([coo.col, coo.row]),
        np.concatenate([coo.val, coo.val]),
    ).deduplicated()
    sym = COO(sym.shape, sym.row, sym.col, np.ones(sym.nnz, dtype=np.float32))
    if backend == "tpu":
        a2 = spgemm(sym, sym)
    else:
        from outerspace_tpu.ops.reference import spgemm_scipy

        a2 = spgemm_scipy(sym, sym)
    # Hadamard with A: sum A²[i,j] over edges (i,j).
    s = a2.to_scipy().tocsr()
    mask = sym.to_scipy().tocsr()
    total = float(s.multiply(mask).sum())
    return int(round(total / 6.0))


def markov_cluster(
    adj: COO | CSR,
    expansion: int = 2,
    inflation: float = 2.0,
    iters: int = 10,
    prune_threshold: float = 1e-4,
    backend: str = "tpu",
) -> CSR:
    """Markov Clustering (MCL): alternate expansion (matrix power via
    repeated SpGEMM) and inflation (elementwise power + column
    renormalisation + pruning) until the flow matrix stabilises.

    Returns the final flow matrix; clusters are the rows with mass
    (attractors).
    """
    coo = adj.to_coo() if not isinstance(adj, COO) else adj
    n = coo.shape[0]
    assert coo.shape[0] == coo.shape[1], "adjacency must be square"
    # Add self loops (standard MCL) and column-normalise.
    m = COO(
        coo.shape,
        np.concatenate([coo.row, np.arange(n, dtype=coo.row.dtype)]),
        np.concatenate([coo.col, np.arange(n, dtype=coo.col.dtype)]),
        np.concatenate([np.abs(coo.val), np.ones(n, dtype=np.float32)]),
    ).deduplicated()
    flow = _col_normalize(m.to_csr())

    def mult(a, b):
        if backend == "tpu":
            return spgemm(a, b)
        from outerspace_tpu.ops.reference import spgemm_scipy

        return spgemm_scipy(a, b)

    for _ in range(iters):
        # Expansion: flow^expansion.
        expanded = flow
        for _ in range(expansion - 1):
            expanded = mult(expanded, flow)
        # Inflation + prune + renormalise (host elementwise).
        c = expanded.to_coo()
        v = np.power(np.maximum(c.val, 0.0), inflation)
        keep = v > prune_threshold
        c = COO(c.shape, c.row[keep], c.col[keep], v[keep])
        new_flow = _col_normalize(c.to_csr())
        if _converged(flow, new_flow):
            flow = new_flow
            break
        flow = new_flow
    return flow


def mcl_clusters(flow: CSR) -> list[np.ndarray]:
    """Extract clusters: attractor rows (nonzero diagonal) and the columns
    attached to them."""
    s = flow.to_scipy().tocsr()
    attractors = np.nonzero(s.diagonal() > 1e-6)[0]
    clusters = []
    seen = set()
    for a in attractors:
        members = s.getrow(a).nonzero()[1]
        key = tuple(sorted(members))
        if key not in seen and len(members):
            seen.add(key)
            clusters.append(np.asarray(members))
    return clusters


def _col_normalize(m: CSR) -> CSR:
    s = m.to_scipy().tocsc()
    sums = np.asarray(s.sum(axis=0)).ravel()
    sums[sums == 0] = 1.0
    d = s.multiply(1.0 / sums).tocsr()
    d.sort_indices()
    return CSR.from_scipy(d.astype(np.float32))


def _converged(a: CSR, b: CSR, tol: float = 1e-6) -> bool:
    if a.nnz != b.nnz or a.shape != b.shape:
        return False
    sa, sb = a.to_scipy(), b.to_scipy()
    return abs(sa - sb).max() <= tol
