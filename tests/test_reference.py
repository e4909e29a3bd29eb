"""Golden functional SpGEMM model vs scipy oracle, task extraction, FLOPs."""

import numpy as np

from outerspace_tpu.formats import COO, erdos_renyi
from outerspace_tpu.ops.reference import (
    assert_csr_allclose,
    compare_coo,
    spgemm_flops,
    spgemm_reference,
    spgemm_scipy,
    spgemm_tasks,
)


class TestGoldenModel:
    def test_matches_scipy(self, operand_pair):
        a, b = operand_pair
        ours = spgemm_reference(a, b)
        ref = spgemm_scipy(a, b)
        assert_csr_allclose(ours, ref)

    def test_matches_dense(self, operand_pair):
        a, b = operand_pair
        ours = spgemm_reference(a, b)
        np.testing.assert_allclose(
            ours.to_dense(), a.to_dense() @ b.to_dense(), rtol=1e-5, atol=1e-5
        )

    def test_empty_product(self):
        a = COO((8, 8), [0], [0], [1.0])
        b = COO((8, 8), [7], [7], [1.0])  # col 0 of A meets empty row 0 of B
        c = spgemm_reference(a, b)
        assert c.nnz == 0

    def test_column_ids_correct(self):
        # Regression guard for the reference defect at SimOuterSPACE.cpp:89
        # (stores position k instead of the true column index).
        a = COO((2, 2), [0], [0], [2.0])
        b = COO((2, 3), [0, 0], [1, 2], [3.0, 4.0])
        c = spgemm_reference(a, b)
        cols, vals = c.row_slice(0)
        np.testing.assert_array_equal(cols, [1, 2])
        np.testing.assert_allclose(vals, [6.0, 8.0])

    def test_merge_accumulates_equal_columns(self):
        # Regression guard for the inverted dedup at SimOuterSPACE.cpp:120-125:
        # equal column ids must ACCUMULATE, distinct ones must stay distinct.
        a = COO((1, 2), [0, 0], [0, 1], [1.0, 1.0])
        b = COO((2, 2), [0, 1], [0, 0], [2.0, 3.0])
        c = spgemm_reference(a, b)
        assert c.nnz == 1
        np.testing.assert_allclose(c.data, [5.0])


class TestTasks:
    def test_task_structure(self):
        a = erdos_renyi(32, 32, 0.1, seed=40)
        b = erdos_renyi(32, 32, 0.1, seed=41)
        res = spgemm_tasks(a.to_csc(), b.to_csr())
        # One multiply task per (A element, nonempty B row) pairing.
        a_csc, b_csr = a.to_csc(), b.to_csr()
        expected = 0
        for k in range(32):
            na = int(a_csc.indptr[k + 1] - a_csc.indptr[k])
            nb = int(b_csr.indptr[k + 1] - b_csr.indptr[k])
            if na and nb:
                expected += na
        assert len(res.multiply_tasks) == expected
        # One merge task per nonempty output row.
        nonempty = int((res.c.major_nnz() > 0).sum())
        assert len(res.merge_tasks) == nonempty
        # Task flops add up to the reference FLOP count.
        assert sum(t.flops for t in res.multiply_tasks) == res.flops

    def test_flop_count(self):
        a = erdos_renyi(64, 64, 0.1, seed=42)
        b = erdos_renyi(64, 64, 0.1, seed=43)
        f = spgemm_flops(a.to_csc(), b.to_csr())
        # Σ nnz(col i of A)·nnz(row i of B) (SimSpGEMM.cpp:884-891)
        expect = int(
            np.dot(
                np.bincount(a.col, minlength=64),
                np.bincount(b.row, minlength=64),
            )
        )
        assert f == expect


class TestCompareCOO:
    def test_equal(self):
        a = erdos_renyi(16, 16, 0.2, seed=50)
        assert compare_coo(a, a.sorted_colmajor())

    def test_value_mismatch(self):
        a = COO((4, 4), [1], [1], [1.0])
        b = COO((4, 4), [1], [1], [1.5])
        assert not compare_coo(a, b)

    def test_pattern_mismatch(self):
        a = COO((4, 4), [1], [1], [1.0])
        b = COO((4, 4), [1], [2], [1.0])
        assert not compare_coo(a, b)

    def test_eps_tolerance(self):
        a = COO((4, 4), [1], [1], [1.0])
        b = COO((4, 4), [1], [1], [1.0 + 1e-8])
        assert compare_coo(a, b, eps=1e-6)
