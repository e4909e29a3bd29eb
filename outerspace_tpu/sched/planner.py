"""Static task planning for the TPU SpGEMM kernels.

The reference dispatched multiply/merge tasks round-robin over 256 PEs
(``TaskDispatcherStatic``, ``simulator/SimOuterSPACE.cpp:146-174``) and
simply tolerated nnz² load imbalance (it reported max-over-PE cycles,
``:204-216``). Here the planner is smarter and produces *static* task
tables the kernels consume:

- **Heavy/light split**: outer-product indices *k* whose
  ``nnz(colA_k) × nnz(rowB_k)`` tile pads efficiently onto (8, 128)
  register tiles are routed to the Pallas dense-tile expand kernel;
  the skinny residue goes through the XLA gather path. On power-law
  operands >90% of the expansion lands in the dense-tile class.
- **Tile decomposition**: each heavy k becomes a grid of
  (8 A-elements × 128 B-elements) tasks with lane/sublane masks — the
  TPU-native analogue of the reference's per-element multiply tasks
  (``MultiplyTask``, ``SimOuterSPACE.cpp:34-38``).

All planning is vectorised numpy; cost is O(nnz + ntasks).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from outerspace_tpu.formats.csr import CSC, CSR

TILE_A = 8  # sublane tile: A-elements per task
TILE_B = 128  # lane tile: B-elements per task


@dataclasses.dataclass
class OuterProductSchedule:
    """Static task table for the dense-tile expand kernel plus the
    light-k residue.

    Task *t* computes the outer product of A-elements
    ``[a_start[t], a_start[t] + TILE_A)`` (CSC flat order, masked to
    ``a_len[t]``) with the 128-aligned B-block ``b_block[t]`` of the flat
    CSR arrays, masked to lanes ``[b_lo[t], b_hi[t])``.
    """

    # int32[ntasks] each:
    a_start: np.ndarray
    a_len: np.ndarray
    b_block: np.ndarray  # index into b arrays viewed as (-1, 128)
    b_lo: np.ndarray
    b_hi: np.ndarray
    # Pre-gathered A-side slices, shape (ntasks, TILE_A):
    a_rows_t: np.ndarray  # int32, output row of each A element
    a_vals_t: np.ndarray  # f32
    # Which outer indices went to which path:
    heavy_k: np.ndarray  # int32[]
    light_k: np.ndarray  # int32[]
    heavy_p: int  # true partial products in the heavy stream
    light_p: int  # true partial products in the light stream

    @property
    def ntasks(self) -> int:
        return int(self.a_start.shape[0])

    @property
    def padded_heavy(self) -> int:
        return self.ntasks * TILE_A * TILE_B


def plan_outer_tiles(
    a_csc: CSC,
    b_csr: CSR,
    waste_limit: float = 2.0,
    min_products: int = 0,
) -> OuterProductSchedule:
    """Classify outer indices and emit the dense-tile task table.

    An index k is *heavy* when its (TILE_A, TILE_B)-padded tile count
    wastes at most ``waste_limit``× the true product count.
    """
    k_dim = a_csc.shape[1]
    na = a_csc.major_nnz().astype(np.int64)
    nb = b_csr.major_nnz().astype(np.int64)
    prod = na * nb
    na_t = -(-na // TILE_A)  # A-tiles per k
    nb_t = -(-nb // TILE_B)  # B-tiles per k (row-span based, see below)
    padded = na_t * TILE_A * nb_t * TILE_B
    nonzero = prod > 0
    heavy = nonzero & (padded <= waste_limit * prod) & (prod >= min_products)
    light = nonzero & ~heavy
    heavy_k = np.nonzero(heavy)[0].astype(np.int32)
    light_k = np.nonzero(light)[0].astype(np.int32)

    if heavy_k.shape[0] == 0:
        empty_i = np.zeros(0, dtype=np.int32)
        return OuterProductSchedule(
            empty_i, empty_i, empty_i, empty_i, empty_i,
            np.zeros((0, TILE_A), np.int32), np.zeros((0, TILE_A), np.float32),
            heavy_k, light_k, 0, int(prod[light].sum()),
        )

    # --- per-k tile grids, flattened to a task list (vectorised) ---
    hk = heavy_k.astype(np.int64)
    a_ptr = np.asarray(a_csc.indptr)
    b_ptr = np.asarray(b_csr.indptr)
    na_h, nb_h = na[hk], nb[hk]
    nat_h = (-(-na_h // TILE_A)).astype(np.int64)
    # B blocks are 128-aligned windows of the flat CSR arrays covering the
    # row span [s, s+nb): first block floor(s/128), last covering s+nb-1.
    b_s = b_ptr[hk]
    b_e = b_s + nb_h
    b_blk0 = b_s // TILE_B
    nbt_h = (-(-(b_e - b_blk0 * TILE_B) // TILE_B)).astype(np.int64)

    tasks_per_k = nat_h * nbt_h
    t_off = np.zeros(hk.shape[0] + 1, dtype=np.int64)
    np.cumsum(tasks_per_k, out=t_off[1:])
    ntasks = int(t_off[-1])

    # owner[i] = which heavy-k task i belongs to
    owner = np.repeat(np.arange(hk.shape[0]), tasks_per_k)
    local = np.arange(ntasks) - t_off[owner]
    # B-major order within each k: consecutive tasks share the same
    # B block (the expand kernel's Pallas pipeline then skips re-fetching
    # it), mirroring OuterSPACE's column-reuse rationale (HPCA'18).
    ia = local % nat_h[owner]
    jb = local // nat_h[owner]

    a_start = (a_ptr[hk][owner] + ia * TILE_A).astype(np.int64)
    a_len = np.minimum(na_h[owner] - ia * TILE_A, TILE_A).astype(np.int32)
    b_block = (b_blk0[owner] + jb).astype(np.int32)
    blk_lane0 = b_block.astype(np.int64) * TILE_B
    b_lo = np.maximum(b_s[owner] - blk_lane0, 0).astype(np.int32)
    b_hi = np.minimum(b_e[owner] - blk_lane0, TILE_B).astype(np.int32)

    # Pre-gathered A slices (tiny: ntasks × 8), tail-padded with repeats.
    gather_idx = a_start[:, None] + np.arange(TILE_A)[None, :]
    gather_idx = np.minimum(gather_idx, a_ptr[-1] - 1)
    a_rows_t = np.asarray(a_csc.indices)[gather_idx].astype(np.int32)
    a_vals_t = np.asarray(a_csc.data)[gather_idx].astype(np.float32)

    return OuterProductSchedule(
        a_start.astype(np.int32),
        a_len,
        b_block,
        b_lo,
        b_hi,
        a_rows_t,
        a_vals_t,
        heavy_k,
        light_k,
        int(prod[heavy].sum()),
        int(prod[light].sum()),
    )


def choose_strategy(
    a_csc: CSC,
    b_csr: CSR,
    heavy_fraction_threshold: float = 0.5,
) -> str:
    """Pick the expand strategy for these operands.

    ``"tiles"`` — dense-tile Pallas expand for heavy k + gather residue;
    ``"flat"``  — pure XLA gather expand (uniform/sparse operands).
    """
    na = a_csc.major_nnz().astype(np.int64)
    nb = b_csr.major_nnz().astype(np.int64)
    prod = na * nb
    total = prod.sum()
    if total == 0:
        return "flat"
    padded = (-(-na // TILE_A)) * TILE_A * (-(-nb // TILE_B)) * TILE_B
    heavy = (prod > 0) & (padded <= 2 * prod)
    frac = prod[heavy].sum() / total
    return "tiles" if frac >= heavy_fraction_threshold else "flat"
