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

# ns per element, calibrated on v5e hardware with SERIALIZED fori_loop
# chains (each call's input depends on the previous call's output —
# without that, XLA CSE collapses repeated calls and the RPC floor
# pollutes the rate; two earlier calibration rounds fell for it).
# Measured: tile expand ≈ 0.22 µs per grid step nearly independent of
# tile height → per-element cost ~ step/(tile_a·128); windowed gather
# 0.141 ns/product; single-key sort 1.3 ns/pair at ~20M scaling to
# 2.8 ns/pair at 128M (one mid constant here).
SORT_NS = 1.6
TILE_NS = 0.22  # the (8, 128) anchor class; taller classes via tile_ns()
GATHER_NS = 0.15
FLAT_NS = 9.0
GATHER_MAX_NB = 256
WASTE_GRID = (1.05, 1.1, 1.15, 1.25, 1.5, 2.0)

_TILE_NS_CACHE: dict[int, float] = {}


def tile_ns(tile_a: int) -> float:
    """Per-element cost of the dense-tile expand at height ``tile_a``.

    The *relative* cost across tile classes comes from the C++
    discrete-event model (``perf.perfsim.simulate_expand_schedule``:
    the ~200-cycle per-grid-step overhead dominates small steps, so
    taller tiles amortise it over 16x more elements — measured 0.217
    vs 0.017 ns/elem for the (8,128) vs (128,128) classes), anchored
    to the *measured* ``TILE_NS`` of the (8, 128) class so absolute
    magnitudes stay calibrated against real kernels. Falls back to the
    flat constant when the native library isn't built."""
    got = _TILE_NS_CACHE.get(tile_a)
    if got is not None:
        return got
    try:
        from outerspace_tpu.perf.perfsim import (
            available,
            simulate_expand_schedule,
        )

        if not available():
            raise RuntimeError("native perfsim unavailable")

        def _sim_ns(ta: int) -> float:
            class _S:
                ntasks = 512
                tile_a = ta

            sec = simulate_expand_schedule(_S)["seconds"]
            return sec * 1e9 / (512 * ta * TILE_B)

        if tile_a == TILE_A_CLASSES[-1]:
            ns = TILE_NS  # the anchor class is the measured constant
        else:
            ns = TILE_NS * _sim_ns(tile_a) / _sim_ns(TILE_A_CLASSES[-1])
    except Exception:
        ns = TILE_NS
    _TILE_NS_CACHE[tile_a] = ns
    return ns


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
    flat-start misalignment mod 128 (0 approximates aligned rows).

    Returns (per-class padded element counts, gather products, flat
    products); per-class counts let the caller apply the event-model's
    per-class :func:`tile_ns`."""
    prod = na * nb
    nonzero = prod > 0
    assigned = np.zeros(na.shape[0], dtype=bool)
    padded_cls = [0] * len(TILE_A_CLASSES)
    for ci, ta in enumerate(TILE_A_CLASSES):
        # Decision rule mirrors plan_outer_classes exactly (aligned
        # padding, no b_mis) so the waste-grid search optimizes the
        # assignment the planner will actually execute; the *cost*
        # charged is the real staged footprint incl. misalignment.
        padded = (-(-na // ta)) * ta * (-(-nb // TILE_B)) * TILE_B
        cost = (-(-na // ta)) * ta * (-(-(nb + b_mis) // TILE_B)) * TILE_B
        ok = nonzero & ~assigned & (padded <= waste_limit * prod)
        padded_cls[ci] += int(cost[ok].sum())
        assigned |= ok
    gather_p = 0
    if gather_edges:
        # Trim pass — same shared rule as the planner (planner.trim_split)
        from outerspace_tpu.sched.planner import trim_split

        rest = nonzero & ~assigned
        do_trim, tile_ci, tile_part, edges = trim_split(
            na, nb, b_mis, rest, TILE_A_CLASSES
        )
        for ci in range(len(TILE_A_CLASSES)):
            padded_cls[ci] += int(tile_part[do_trim & (tile_ci == ci)].sum())
        gather_p += int((na * edges)[do_trim].sum())
        gather_p += int(prod[rest & ~do_trim].sum())
        return padded_cls, gather_p, 0
    # rescue pass for window-incompatible k
    need = nonzero & ~assigned & (nb > GATHER_MAX_NB)
    if need.any():
        best = None
        best_ci = np.zeros(na.shape[0], dtype=np.int64)
        for ci, ta in enumerate(TILE_A_CLASSES):
            padded = (-(-na // ta)) * ta * (-(-nb // TILE_B)) * TILE_B
            if best is None:
                best = padded
            else:
                better = padded < best
                best = np.where(better, padded, best)
                best_ci = np.where(better, ci, best_ci)
        ok = need & (best <= rescue_limit * prod)
        for ci in range(len(TILE_A_CLASSES)):
            padded_cls[ci] += int(best[ok & (best_ci == ci)].sum())
        assigned |= ok
    rest = nonzero & ~assigned
    gatherable = rest & (nb <= GATHER_MAX_NB)
    gather_p = int(prod[gatherable].sum())
    flat_p = int(prod[rest & ~gatherable].sum())
    return padded_cls, gather_p, flat_p


def modeled_cost_ns(
    na: np.ndarray,
    nb: np.ndarray,
    waste_limit: float,
    gather_edges: bool = True,
    b_mis: np.ndarray | int = 0,
) -> float:
    padded_cls, gather_p, flat_p = _class_totals(
        na, nb, waste_limit, gather_edges=gather_edges, b_mis=b_mis
    )
    stream = sum(padded_cls) + gather_p + flat_p
    return (
        sum(
            p * tile_ns(ta)
            for p, ta in zip(padded_cls, TILE_A_CLASSES)
        )
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
    # The tiled strategy's residue is gather-servable whenever its
    # planner can run packed keys: either globally (m·n ≤ 2³²) or via
    # rebased row parts (every part's local span·n fits u32 —
    # ``ops.spgemm.plan_tiled_parts``). Mirror that rule here so the
    # cost model doesn't charge FLAT_NS for a residue the planner
    # actually serves with the windowed-gather kernel.
    from outerspace_tpu.ops.spgemm import _MAX_PARTS

    mn = a_csc.shape[0] * b_csr.shape[1]
    gather_edges = mn <= 2**32 or (
        b_csr.shape[1] < 2**31 and mn <= _MAX_PARTS * 2**32
    )
    # every cost evaluation models the same machine: real per-row
    # B misalignment everywhere (grid search AND final comparison)
    b_mis = np.asarray(b_csr.indptr)[:-1].astype(np.int64) % TILE_B
    costs = {
        wl: modeled_cost_ns(
            na, nb, wl, gather_edges=gather_edges, b_mis=b_mis
        )
        for wl in waste_grid
    }
    wl_best = min(costs, key=costs.get)
    cost_tiles = costs[wl_best]
    padded_best = sum(
        _class_totals(
            na, nb, wl_best, gather_edges=gather_edges, b_mis=b_mis
        )[0]
    )
    # chunked ranges make every row gather-servable (any m·n via the
    # row-split pipeline), so the pure-gather strategy has no flat
    # part; product-space subtile cuts leave ~1-7% stream padding
    # (measured host fills on the A² suite: 1.007-1.074), charged here
    # as a 4% midpoint
    cost_gather = int(total * 1.04) * (GATHER_NS + SORT_NS)
    cost_flat = total * (FLAT_NS + SORT_NS)
    # a hybrid with zero tile work degenerates to the gather pipeline —
    # prefer the real thing (it also row-splits past the 2^32 key space)
    if padded_best == 0 and cost_gather <= cost_tiles:
        return "gather", wl_best
    # Near-tie band: the model omits real tiled costs it cannot see
    # cheaply (parts pad-to-max merge inflation, the planner's exact
    # class assignment, per-part dispatch profiles), and every measured
    # near-tie resolved in gather's favor on chip — rmat16 modeled
    # tiles by 1.5% but ran 368 ms tiles vs 288 ms gather. Tiles must
    # win by a clear modeled margin to be picked.
    if cost_gather <= cost_tiles * 1.15:
        cost_tiles = float("inf")
    best = min(
        [("tiles", cost_tiles), ("gather", cost_gather), ("flat", cost_flat)],
        key=lambda t: t[1],
    )[0]
    return best, wl_best
