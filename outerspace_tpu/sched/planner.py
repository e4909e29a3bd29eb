"""Static task planning for the TPU SpGEMM kernels.

The reference dispatched multiply/merge tasks round-robin over 256 PEs
(``TaskDispatcherStatic``, ``simulator/SimOuterSPACE.cpp:146-174``) and
simply tolerated nnz² load imbalance (it reported max-over-PE cycles,
``:204-216``). Here the planner is smarter and produces *static* task
tables the kernels consume:

- **Tile classes**: outer-product indices *k* are assigned to the dense
  (tile_a × 128) expand-tile class that minimises padded work, subject to
  a waste limit — tall columns take tall tiles (fewer grid steps ⇒ less
  per-step overhead), short-but-wide ones take (8 × 128), and the skinny
  residue routes to the XLA gather path. On power-law operands >90% of
  the expansion lands in the dense-tile classes.
- **Tile decomposition**: each heavy k becomes a grid of
  (tile_a A-elements × 128 B-elements) tasks with lane/sublane masks —
  the TPU-native analogue of the reference's per-element multiply tasks
  (``MultiplyTask``, ``SimOuterSPACE.cpp:34-38``).

All planning is vectorised numpy; cost is O(nnz + ntasks).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from outerspace_tpu.formats.csr import CSC, CSR

TILE_A = 8  # default sublane tile: A-elements per task
TILE_B = 128  # lane tile: B-elements per task
TILE_A_CLASSES = (128, 32, 8)  # tall-first tile classes for the expand kernel


@dataclasses.dataclass
class OuterProductSchedule:
    """Static task table for one dense-tile expand class plus bookkeeping.

    Task *t* computes the outer product of A-elements
    ``[a_start[t], a_start[t] + tile_a)`` (CSC flat order, masked to
    ``a_len[t]``) with the 128-aligned B-block ``b_block[t]`` of the flat
    CSR arrays, masked to lanes ``[b_lo[t], b_hi[t])``.
    """

    tile_a: int
    # int32[ntasks] each:
    a_start: np.ndarray
    a_len: np.ndarray
    b_block: np.ndarray  # index into b arrays viewed as (-1, 128)
    b_lo: np.ndarray
    b_hi: np.ndarray
    # Pre-gathered A-side slices, shape (ntasks, tile_a):
    a_rows_t: np.ndarray  # int32, output row of each A element
    a_vals_t: np.ndarray  # f32
    # Which outer indices this class covers:
    heavy_k: np.ndarray  # int32[]
    heavy_p: int  # true partial products in this class's stream

    @property
    def ntasks(self) -> int:
        return int(self.a_start.shape[0])

    @property
    def slab_tasks(self) -> int:
        """Tasks per fixed-size kernel call (~2^20 stream elements): the
        expand executable is compiled once per (tile_a, slab) shape and
        reused across every operand and workload."""
        s = max(1 << 20, self.tile_a * TILE_B) // (self.tile_a * TILE_B)
        return max(8, -(-s // 8) * 8)

    @property
    def ntasks_padded(self) -> int:
        """Task count padded to a whole number of slabs (empty tasks emit
        pure sentinel padding); small schedules fall back to one bucketed
        call so tiny operands don't pay a whole slab."""
        if self.ntasks == 0:
            return 0
        if self.ntasks < self.slab_tasks:
            from outerspace_tpu.ops.symbolic import round_up_bucket

            n = round_up_bucket(self.ntasks, min_size=8)
            return -(-n // 8) * 8
        return -(-self.ntasks // self.slab_tasks) * self.slab_tasks

    @property
    def padded_heavy(self) -> int:
        return self.ntasks_padded * self.tile_a * TILE_B


@dataclasses.dataclass
class ClassPlan:
    """Multi-class schedule: one OuterProductSchedule per tile class plus
    the light-k residue handled by the gather path."""

    classes: list[OuterProductSchedule]
    light_k: np.ndarray
    light_p: int

    @property
    def heavy_p(self) -> int:
        return sum(c.heavy_p for c in self.classes)

    @property
    def padded_heavy(self) -> int:
        return sum(c.padded_heavy for c in self.classes)


def _schedule_for_ks(
    a_csc: CSC, b_csr: CSR, ks: np.ndarray, tile_a: int
) -> OuterProductSchedule:
    """Emit the task table for outer indices ``ks`` at tile height
    ``tile_a`` (vectorised)."""
    na = a_csc.major_nnz().astype(np.int64)
    nb = b_csr.major_nnz().astype(np.int64)
    a_ptr = np.asarray(a_csc.indptr)
    b_ptr = np.asarray(b_csr.indptr)
    empty_i = np.zeros(0, dtype=np.int32)
    if ks.shape[0] == 0:
        return OuterProductSchedule(
            tile_a, empty_i, empty_i, empty_i, empty_i, empty_i,
            np.zeros((0, tile_a), np.int32),
            np.zeros((0, tile_a), np.float32),
            ks.astype(np.int32), 0,
        )
    hk = ks.astype(np.int64)
    na_h, nb_h = na[hk], nb[hk]
    nat_h = (-(-na_h // tile_a)).astype(np.int64)
    b_s = b_ptr[hk]
    b_e = b_s + nb_h
    b_blk0 = b_s // TILE_B
    nbt_h = (-(-(b_e - b_blk0 * TILE_B) // TILE_B)).astype(np.int64)

    tasks_per_k = nat_h * nbt_h
    t_off = np.zeros(hk.shape[0] + 1, dtype=np.int64)
    np.cumsum(tasks_per_k, out=t_off[1:])
    ntasks = int(t_off[-1])

    owner = np.repeat(np.arange(hk.shape[0]), tasks_per_k)
    local = np.arange(ntasks) - t_off[owner]
    # B-major order within each k: consecutive tasks share the same
    # B block (the expand kernel's Pallas pipeline then skips re-fetching
    # it), mirroring OuterSPACE's column-reuse rationale (HPCA'18).
    ia = local % nat_h[owner]
    jb = local // nat_h[owner]

    a_start = (a_ptr[hk][owner] + ia * tile_a).astype(np.int64)
    a_len = np.minimum(na_h[owner] - ia * tile_a, tile_a).astype(np.int32)
    b_block = (b_blk0[owner] + jb).astype(np.int32)
    blk_lane0 = b_block.astype(np.int64) * TILE_B
    b_lo = np.maximum(b_s[owner] - blk_lane0, 0).astype(np.int32)
    b_hi = np.minimum(b_e[owner] - blk_lane0, TILE_B).astype(np.int32)

    gather_idx = a_start[:, None] + np.arange(tile_a)[None, :]
    gather_idx = np.minimum(gather_idx, max(a_ptr[-1] - 1, 0))
    a_rows_t = np.asarray(a_csc.indices)[gather_idx].astype(np.int32)
    a_vals_t = np.asarray(a_csc.data)[gather_idx].astype(np.float32)

    prod = (na_h * nb_h).sum()
    return OuterProductSchedule(
        tile_a,
        a_start.astype(np.int32),
        a_len,
        b_block,
        b_lo,
        b_hi,
        a_rows_t,
        a_vals_t,
        ks.astype(np.int32),
        int(prod),
    )


def plan_outer_classes(
    a_csc: CSC,
    b_csr: CSR,
    waste_limit: float = 1.1,
    tile_a_classes: tuple[int, ...] = TILE_A_CLASSES,
    rescue_limit: float = 6.0,
    gather_max_nb: int = 256,
) -> ClassPlan:
    """Assign every outer index to the tile class minimising its padded
    work (subject to ``waste_limit``); leftovers become the light residue.

    Second pass: k's the windowed-gather kernel cannot serve (B row wider
    than its window, ``gather_max_nb``) are *rescued* into their least-bad
    tile class up to ``rescue_limit`` — tile padding flows through the
    ~900 M elem/s sort, while the XLA flat fallback expands at ~10 cycles
    per element, so even heavily padded tiles beat it.
    """
    na = a_csc.major_nnz().astype(np.int64)
    nb = b_csr.major_nnz().astype(np.int64)
    prod = na * nb
    nonzero = prod > 0
    # Tall classes first: per-grid-step overhead dominates the stream
    # cost, so the goal is the FEWEST tasks whose padding stays under the
    # waste limit — not the least padding.
    best_class = np.full(na.shape[0], -1, dtype=np.int64)
    for ci, ta in enumerate(tile_a_classes):
        padded = (
            (-(-na // ta)) * ta * (-(-nb // TILE_B)) * TILE_B
        )
        ok = nonzero & (padded <= waste_limit * prod) & (best_class < 0)
        best_class[ok] = ci
    # Rescue pass: wide-B-row residue picks its minimum-padding class.
    need_rescue = nonzero & (best_class < 0) & (nb > gather_max_nb)
    if need_rescue.any():
        best_pad = np.full(na.shape[0], np.iinfo(np.int64).max)
        best_ci = np.zeros(na.shape[0], dtype=np.int64)
        for ci, ta in enumerate(tile_a_classes):
            padded = (-(-na // ta)) * ta * (-(-nb // TILE_B)) * TILE_B
            better = padded < best_pad
            best_pad = np.where(better, padded, best_pad)
            best_ci = np.where(better, ci, best_ci)
        ok = need_rescue & (best_pad <= rescue_limit * prod)
        best_class[ok] = best_ci[ok]
    classes = []
    for ci, ta in enumerate(tile_a_classes):
        ks = np.nonzero(best_class == ci)[0]
        classes.append(_schedule_for_ks(a_csc, b_csr, ks, ta))
    light_k = np.nonzero(nonzero & (best_class < 0))[0].astype(np.int32)
    light_p = int(prod[light_k].sum()) if light_k.shape[0] else 0
    return ClassPlan(classes, light_k, light_p)


def plan_outer_tiles(
    a_csc: CSC,
    b_csr: CSR,
    waste_limit: float = 1.1,
    tile_a: int = TILE_A,
) -> "OuterProductScheduleLegacy":
    """Single-class planner (kept for tests/compat): (tile_a, 128) tiles
    for heavy k, everything else light."""
    cp = plan_outer_classes(
        a_csc, b_csr, waste_limit=waste_limit, tile_a_classes=(tile_a,)
    )
    sched = cp.classes[0]
    return OuterProductScheduleLegacy(sched, cp.light_k, cp.light_p)


class OuterProductScheduleLegacy:
    """Single-class view exposing the original flat attributes."""

    def __init__(self, sched: OuterProductSchedule, light_k, light_p):
        self._sched = sched
        self.light_k = light_k
        self.light_p = light_p

    def __getattr__(self, name):
        return getattr(self._sched, name)


def class_coverage(
    a_csc: CSC,
    b_csr: CSR,
    waste_limit: float = 1.1,
    tile_a_classes: tuple[int, ...] = TILE_A_CLASSES,
) -> float:
    """Fraction of the expansion work coverable by the dense-tile classes
    under ``waste_limit`` — the shared predicate behind both the class
    planner and the strategy chooser."""
    na = a_csc.major_nnz().astype(np.int64)
    nb = b_csr.major_nnz().astype(np.int64)
    prod = na * nb
    total = prod.sum()
    if total == 0:
        return 0.0
    covered = np.zeros(na.shape[0], dtype=bool)
    for ta in tile_a_classes:
        padded = (-(-na // ta)) * ta * (-(-nb // TILE_B)) * TILE_B
        covered |= (prod > 0) & (padded <= waste_limit * prod)
    return float(prod[covered].sum() / total)


def gather_coverage(a_csc: CSC, b_csr: CSR, max_nb: int = 256) -> float:
    """Fraction of the expansion servable by the windowed-gather kernel
    (B rows ≤ its subtile window; see ``sched.gplanner``)."""
    na = a_csc.major_nnz().astype(np.int64)
    nb = b_csr.major_nnz().astype(np.int64)
    prod = na * nb
    total = prod.sum()
    if total == 0:
        return 0.0
    return float(prod[nb <= max_nb].sum() / total)


def choose_strategy(
    a_csc: CSC,
    b_csr: CSR,
    heavy_fraction_threshold: float = 0.5,
    waste_limit: float = 1.1,
    tile_a_classes: tuple[int, ...] = TILE_A_CLASSES,
) -> str:
    """Pick the expand strategy for these operands.

    ``"tiles"``  — the hybrid: dense-tile Pallas expand for heavy k +
                   windowed-gather residue + XLA flat remainder;
    ``"gather"`` — pure windowed-gather pipeline with row-split packed
                   keys (uniform/low-skew operands; works for any m·n);
    ``"flat"``   — pure XLA gather expand (fallback).

    Decision = the calibrated per-element cost model
    (``sched.autotune``); the threshold knobs are retained for API
    compatibility but the model's argmin wins.
    """
    from outerspace_tpu.sched.autotune import autotune

    del heavy_fraction_threshold, waste_limit, tile_a_classes
    return autotune(a_csc, b_csr)[0]
