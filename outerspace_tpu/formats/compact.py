"""Compact (ELL-like) regroupings of compressed matrices.

Two layouts live here:

- ``CompactCOO`` — functional parity with the reference's
  ``CompactCOOMatrix`` / ``csr2compact`` (``common.h:52-56``,
  ``SimSpGEMM.cpp:154-242``): group *j* holds the *j*-th element of every
  row that has at least ``j+1`` nonzeros. The reference used it to feed PEs
  uniform work; on TPU it is mainly a validated interchange format.

- ``BlockELL`` — the TPU-first generalisation: rows are tiled into
  ``block_rows``-high stripes, nonzero column *blocks* are gathered per
  stripe and padded to the per-matrix maximum, yielding fully static shapes
  whose dense blocks tile straight onto the MXU. This is the operand layout
  of the Pallas SpMM kernel (sparse weights × dense activations), replacing
  the simulated L0-cache blocking of the reference
  (``SimOuterSPACE.cpp:727-754``).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from outerspace_tpu.formats.coo import COO, INDEX_DTYPE, VALUE_DTYPE
from outerspace_tpu.formats.csr import CSR


# --------------------------------------------------------------------------
# CompactCOO (reference parity)
# --------------------------------------------------------------------------


@dataclasses.dataclass
class CompactCOO:
    """Column-length-grouped COO.

    ``groups[j]`` is a (rows, cols, vals) triple holding the *j*-th nonzero
    of every row with nnz > j, rows in ascending order — exactly the
    regrouping ``csr2compact`` performs (``SimSpGEMM.cpp:154-219``).
    """

    shape: tuple[int, int]
    groups: list[tuple[np.ndarray, np.ndarray, np.ndarray]]

    @property
    def nnz(self) -> int:
        return int(sum(g[0].shape[0] for g in self.groups))

    @classmethod
    def from_csr(cls, m: CSR) -> "CompactCOO":
        row_nnz = m.major_nnz()
        max_nnz = int(row_nnz.max(initial=0))
        groups = []
        for j in range(max_nnz):
            rows = np.nonzero(row_nnz > j)[0].astype(INDEX_DTYPE)
            idx = np.asarray(m.indptr[rows], dtype=np.int64) + j
            groups.append((rows, m.indices[idx], m.data[idx]))
        return cls(m.shape, groups)

    def to_coo(self) -> COO:
        """Inverse regrouping — reference ``csc2rawcompact`` direction
        (``SimSpGEMM.cpp:221-242``)."""
        if not self.groups:
            e = np.zeros(0, dtype=INDEX_DTYPE)
            return COO(self.shape, e, e, np.zeros(0, dtype=VALUE_DTYPE))
        rows = np.concatenate([g[0] for g in self.groups])
        cols = np.concatenate([g[1] for g in self.groups])
        vals = np.concatenate([g[2] for g in self.groups])
        return COO(self.shape, rows, cols, vals)

    def sanity_check(self, original: CSR, eps: float = 1e-6) -> bool:
        """Round-trip equality with the original — reference
        ``sanityCompactCOO`` (``SimSpGEMM.cpp:299-302``)."""
        from outerspace_tpu.ops.reference import compare_coo

        return compare_coo(self.to_coo(), original.to_coo(), eps=eps)


# --------------------------------------------------------------------------
# BlockELL (TPU-native)
# --------------------------------------------------------------------------


@dataclasses.dataclass
class BlockELL:
    """Padded block-ELL: static-shape block-sparse layout for MXU kernels.

    Attributes:
      shape:        logical (M, N) of the sparse matrix.
      block_shape:  (bm, bn) dense block size; bn should be 128 and bm a
                    multiple of the dtype sublane tile for MXU friendliness.
      block_cols:   int32[num_row_blocks, max_blocks] — column-block index of
                    each stored block, padded with 0.
      block_mask:   bool[num_row_blocks, max_blocks] — validity of each slot.
      blocks:       f32[num_row_blocks, max_blocks, bm, bn] — dense block
                    payloads, zero-padded.
    """

    shape: tuple[int, int]
    block_shape: tuple[int, int]
    block_cols: np.ndarray
    block_mask: np.ndarray
    blocks: np.ndarray

    @property
    def num_row_blocks(self) -> int:
        return int(self.blocks.shape[0])

    @property
    def max_blocks_per_row(self) -> int:
        return int(self.blocks.shape[1])

    @property
    def stored_blocks(self) -> int:
        return int(self.block_mask.sum())

    def density(self) -> float:
        """Fraction of logical block-grid slots that are stored."""
        total = self.num_row_blocks * -(-self.shape[1] // self.block_shape[1])
        return self.stored_blocks / max(total, 1)

    @classmethod
    def from_coo(
        cls,
        coo: COO,
        block_shape: tuple[int, int] = (128, 128),
        pad_blocks_to: int | None = None,
    ) -> "BlockELL":
        bm, bn = block_shape
        m, n = coo.shape
        nrb = -(-m // bm)
        ncb = -(-n // bn)
        rb = coo.row // bm
        cb = coo.col // bn
        # Unique (row-block, col-block) pairs and per-pair element lists.
        key = rb.astype(np.int64) * ncb + cb
        order = np.argsort(key, kind="stable")
        skey = key[order]
        new = np.ones(skey.shape[0], dtype=bool)
        new[1:] = skey[1:] != skey[:-1]
        uniq_key = skey[new]
        ub_rb = (uniq_key // ncb).astype(np.int64)
        ub_cb = (uniq_key % ncb).astype(INDEX_DTYPE)
        counts_per_rb = np.bincount(ub_rb, minlength=nrb)
        max_blocks = int(counts_per_rb.max(initial=0))
        if pad_blocks_to is not None:
            max_blocks = max(max_blocks, pad_blocks_to)
        max_blocks = max(max_blocks, 1)

        block_cols = np.zeros((nrb, max_blocks), dtype=INDEX_DTYPE)
        block_mask = np.zeros((nrb, max_blocks), dtype=bool)
        blocks = np.zeros((nrb, max_blocks, bm, bn), dtype=VALUE_DTYPE)

        # Slot index of each unique block within its row-block.
        seg = np.cumsum(new) - 1  # block id per sorted element
        slot_of_block = np.zeros(uniq_key.shape[0], dtype=np.int64)
        for i in range(nrb):
            sel = np.nonzero(ub_rb == i)[0]
            slot_of_block[sel] = np.arange(sel.shape[0])
            block_cols[i, : sel.shape[0]] = ub_cb[sel]
            block_mask[i, : sel.shape[0]] = True

        erb = ub_rb[seg]
        eslot = slot_of_block[seg]
        elr = (coo.row[order] % bm).astype(np.int64)
        elc = (coo.col[order] % bn).astype(np.int64)
        np.add.at(blocks, (erb, eslot, elr, elc), coo.val[order])
        return cls((m, n), (bm, bn), block_cols, block_mask, blocks)

    def to_dense(self) -> np.ndarray:
        bm, bn = self.block_shape
        m, n = self.shape
        nrb = self.num_row_blocks
        pad = np.zeros((nrb * bm, -(-n // bn) * bn), dtype=VALUE_DTYPE)
        for i in range(nrb):
            for s in range(self.max_blocks_per_row):
                if self.block_mask[i, s]:
                    c = int(self.block_cols[i, s]) * bn
                    pad[i * bm : (i + 1) * bm, c : c + bn] += self.blocks[i, s]
        return pad[:m, :n]

    def to_coo(self) -> COO:
        return COO.from_dense(self.to_dense())
