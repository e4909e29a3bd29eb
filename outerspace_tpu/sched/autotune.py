"""Cost-model autotuning: per-operand strategy + waste-limit selection.

The reference hard-coded its dispatch (round-robin,
``SimOuterSPACE.cpp:146-174``) and machine constants
(``OuterSPACEConfig``, ``:17-27``). Here the planner *derives* its two
knobs — expand strategy and the tile waste limit — from a calibrated
per-element cost model evaluated on the operands' degree distributions
(all vectorized host math, no device work):

- every stream element that reaches the merge costs ``SORT_NS``
  (the XLA single-key sort + Pallas epilogue, measured ~887 M pairs/s
  on v5e round 2);
- dense-tile expansion costs ``TILE_NS`` per *padded* element
  (streaming Pallas writes, measured on the rmat suite);
- windowed-gather expansion costs ``GATHER_NS`` per element
  (``ops.pallas.gexpand``, measured ~0.3-0.6 ns/product);
- the XLA flat fallback costs ``FLAT_NS`` per element (global gathers,
  measured ~9 ns/product on er100k).

The waste-limit grid search replaces a fixed 2.0 constant: e.g. R-MAT A²
prefers ~1.1 (31% padding) while near-dense operands prefer ≥1.25 —
a fixed threshold loses one or the other. The same totals feed the
strategy choice (tiles-hybrid vs pure gather vs flat), replacing
coverage-threshold heuristics with the actual modeled runtimes.
"""

from __future__ import annotations

import numpy as np

from outerspace_tpu.formats.csr import CSC, CSR
from outerspace_tpu.sched.planner import TILE_A_CLASSES, TILE_B

# ns per element, calibrated on the round-2 v5e bench (see BENCH_r02 and
# ROADMAP.md); relative magnitudes are what matters for the argmin.
SORT_NS = 1.4
TILE_NS = 0.35
GATHER_NS = 0.6
FLAT_NS = 9.0
GATHER_MAX_NB = 256
WASTE_GRID = (1.05, 1.1, 1.15, 1.25, 1.5, 2.0)


def _class_totals(
    na: np.ndarray,
    nb: np.ndarray,
    waste_limit: float,
    rescue_limit: float = 6.0,
    gather_edges: bool = True,
    b_mis: np.ndarray | int = 0,
) -> tuple[int, int, int]:
    """(padded tile stream, gather-served products, flat-served products)
    under the same assignment rules as ``plan_outer_classes``.

    ``gather_edges`` mirrors the planner's trim pass (m·n ≤ 2³²):
    residue rows split into an aligned tile interior + exact gather
    edges, and nothing reaches the flat path. ``b_mis`` is each B row's
    flat-start misalignment mod 128 (0 approximates aligned rows)."""
    prod = na * nb
    nonzero = prod > 0
    assigned = np.zeros(na.shape[0], dtype=bool)
    padded_total = 0
    for ta in TILE_A_CLASSES:
        padded = (-(-na // ta)) * ta * (-(-(nb + b_mis) // TILE_B)) * TILE_B
        ok = nonzero & ~assigned & (padded <= waste_limit * prod)
        padded_total += int(padded[ok].sum())
        assigned |= ok
    gather_p = 0
    if gather_edges:
        # Trim pass: aligned interior → tiles, edges + leftovers → gather.
        rest = nonzero & ~assigned
        interior = np.maximum(
            (nb + b_mis) // TILE_B * TILE_B - ((b_mis + TILE_B - 1) // TILE_B) * TILE_B,
            0,
        )
        edges = np.where(interior > 0, nb - interior, nb)
        tile_part = None
        for ta in TILE_A_CLASSES:
            part = (-(-na // ta)) * ta * interior
            tile_part = part if tile_part is None else np.minimum(tile_part, part)
        cost_trim = tile_part * (TILE_NS + SORT_NS) + na * edges * (
            GATHER_NS + SORT_NS
        )
        cost_gather = prod * (GATHER_NS + SORT_NS)
        do_trim = rest & (interior > 0) & (cost_trim < cost_gather)
        padded_total += int(tile_part[do_trim].sum())
        gather_p += int((na * edges)[do_trim].sum())
        gather_p += int(prod[rest & ~do_trim].sum())
        return padded_total, gather_p, 0
    # rescue pass for window-incompatible k
    need = nonzero & ~assigned & (nb > GATHER_MAX_NB)
    if need.any():
        best = None
        for ta in TILE_A_CLASSES:
            padded = (-(-na // ta)) * ta * (-(-nb // TILE_B)) * TILE_B
            best = padded if best is None else np.minimum(best, padded)
        ok = need & (best <= rescue_limit * prod)
        padded_total += int(best[ok].sum())
        assigned |= ok
    rest = nonzero & ~assigned
    gatherable = rest & (nb <= GATHER_MAX_NB)
    gather_p = int(prod[gatherable].sum())
    flat_p = int(prod[rest & ~gatherable].sum())
    return padded_total, gather_p, flat_p


def modeled_cost_ns(
    na: np.ndarray,
    nb: np.ndarray,
    waste_limit: float,
    gather_edges: bool = True,
) -> float:
    padded, gather_p, flat_p = _class_totals(
        na, nb, waste_limit, gather_edges=gather_edges
    )
    stream = padded + gather_p + flat_p
    return (
        padded * TILE_NS
        + gather_p * GATHER_NS
        + flat_p * FLAT_NS
        + stream * SORT_NS
    )


def autotune(
    a_csc: CSC, b_csr: CSR, waste_grid: tuple[float, ...] = WASTE_GRID
) -> tuple[str, float]:
    """Pick (strategy, waste_limit) by modeled runtime.

    Strategies: "tiles" (hybrid at the best waste limit), "gather"
    (pure windowed-gather + row-split packed keys), "flat".
    """
    na = a_csc.major_nnz().astype(np.int64)
    nb = b_csr.major_nnz().astype(np.int64)
    prod = na * nb
    total = int(prod.sum())
    if total == 0:
        return "flat", waste_grid[0]
    gather_edges = a_csc.shape[0] * b_csr.shape[1] <= 2**32
    b_mis = np.asarray(b_csr.indptr)[:-1].astype(np.int64) % TILE_B
    costs = {
        wl: modeled_cost_ns(na, nb, wl, gather_edges=gather_edges)
        for wl in waste_grid
    }
    wl_best = min(costs, key=costs.get)
    cost_tiles = costs[wl_best]
    padded_best = _class_totals(
        na, nb, wl_best, gather_edges=gather_edges, b_mis=b_mis
    )[0]
    # chunked ranges make every row gather-servable (any m·n via the
    # row-split pipeline), so the pure-gather strategy has no flat part
    cost_gather = total * (GATHER_NS + SORT_NS)
    cost_flat = total * (FLAT_NS + SORT_NS)
    # a hybrid with zero tile work degenerates to the gather pipeline —
    # prefer the real thing (it also row-splits past the 2^32 key space)
    if padded_best == 0 and cost_gather <= cost_tiles:
        return "gather", wl_best
    best = min(
        [("tiles", cost_tiles), ("gather", cost_gather), ("flat", cost_flat)],
        key=lambda t: t[1],
    )[0]
    return best, wl_best
