"""Format layer tests: converters vs scipy oracle, mtx round-trips,
compact/block-ELL regroupings, generators."""

import numpy as np
import pytest
import scipy.sparse as sp

from outerspace_tpu.formats import (
    COO,
    CSC,
    CSR,
    BlockELL,
    CompactCOO,
    DuplicateCoordinateError,
    banded,
    erdos_renyi,
    read_mtx,
    rmat,
    write_mtx,
)


def _rand_coo(m, n, density, seed):
    return erdos_renyi(m, n, density, seed=seed)


class TestCOO:
    def test_roundtrip_scipy(self):
        c = _rand_coo(50, 70, 0.1, 0)
        s = c.to_scipy()
        back = COO.from_scipy(s)
        np.testing.assert_allclose(back.to_dense(), c.to_dense())

    def test_dense_roundtrip(self):
        c = _rand_coo(20, 30, 0.2, 1)
        back = COO.from_dense(c.to_dense())
        np.testing.assert_allclose(
            back.sorted_rowmajor().val, c.sorted_rowmajor().val
        )

    def test_transpose(self):
        c = _rand_coo(13, 29, 0.15, 2)
        np.testing.assert_allclose(c.T.to_dense(), c.to_dense().T)

    def test_dupcheck_raises(self):
        c = COO((4, 4), [1, 1], [2, 2], [1.0, 2.0])
        with pytest.raises(DuplicateCoordinateError):
            c.dupcheck()

    def test_dupcheck_clean(self):
        _rand_coo(30, 30, 0.2, 3).dupcheck()

    def test_deduplicated(self):
        c = COO((4, 4), [1, 1, 0], [2, 2, 0], [1.0, 2.0, 5.0])
        d = c.deduplicated()
        assert d.nnz == 2
        np.testing.assert_allclose(d.to_dense()[1, 2], 3.0)

    def test_bounds_check(self):
        with pytest.raises(ValueError):
            COO((4, 4), [4], [0], [1.0])


class TestCSRCSC:
    @pytest.mark.parametrize("seed", range(4))
    def test_csr_matches_scipy(self, seed):
        c = _rand_coo(40, 60, 0.12, seed)
        ours = c.to_csr()
        ref = sp.csr_matrix(c.to_scipy())
        ref.sort_indices()
        np.testing.assert_array_equal(ours.indptr, ref.indptr)
        np.testing.assert_array_equal(ours.indices, ref.indices)
        np.testing.assert_allclose(ours.data, ref.data)

    @pytest.mark.parametrize("seed", range(4))
    def test_csc_matches_scipy(self, seed):
        c = _rand_coo(40, 60, 0.12, seed + 10)
        ours = c.to_csc()
        ref = sp.csc_matrix(c.to_scipy())
        ref.sort_indices()
        np.testing.assert_array_equal(ours.indptr, ref.indptr)
        np.testing.assert_array_equal(ours.indices, ref.indices)
        np.testing.assert_allclose(ours.data, ref.data)

    def test_trailing_empty_rows(self):
        # Reference had an explicit trailing-empty-row fixup
        # (SimSpGEMM.cpp:140-148); make sure indptr covers them.
        c = COO((10, 10), [0], [0], [1.0])
        r = c.to_csr()
        assert r.indptr.shape[0] == 11
        assert r.indptr[-1] == 1

    def test_row_col_slices(self):
        c = _rand_coo(30, 30, 0.2, 5)
        csr, csc = c.to_csr(), c.to_csc()
        d = c.to_dense()
        cols, vals = csr.row_slice(7)
        np.testing.assert_allclose(d[7, cols], vals)
        rows, vals = csc.col_slice(11)
        np.testing.assert_allclose(d[rows, 11], vals)

    def test_csr_csc_roundtrip(self):
        c = _rand_coo(25, 35, 0.15, 6)
        np.testing.assert_allclose(
            c.to_csr().to_csc().to_dense(), c.to_dense()
        )


class TestMTX:
    def test_roundtrip(self, tmp_path):
        c = _rand_coo(33, 44, 0.1, 7)
        p = str(tmp_path / "m.mtx")
        write_mtx(p, c)
        back = read_mtx(p, native=False)
        assert back.shape == c.shape
        np.testing.assert_allclose(
            back.to_dense(), c.to_dense(), rtol=1e-6, atol=1e-6
        )

    def test_matches_scipy_reader(self, tmp_path):
        c = _rand_coo(20, 20, 0.2, 8)
        p = str(tmp_path / "m.mtx")
        write_mtx(p, c)
        import scipy.io

        ref = COO.from_scipy(scipy.io.mmread(p))
        ours = read_mtx(p, native=False)
        np.testing.assert_allclose(
            ours.to_dense(), ref.to_dense(), rtol=1e-6, atol=1e-6
        )

    def test_reads_scipy_written(self, tmp_path):
        # The reference NN pipeline wrote via scipy.io.mmwrite
        # (NN_models/util.py:61-62) — our reader must accept that output.
        import scipy.io

        c = _rand_coo(15, 10, 0.3, 9)
        p = str(tmp_path / "s.mtx")
        scipy.io.mmwrite(p, c.to_scipy())
        ours = read_mtx(p, native=False)
        np.testing.assert_allclose(
            ours.to_dense(), c.to_dense(), rtol=1e-6, atol=1e-6
        )

    def test_pattern_and_symmetric(self, tmp_path):
        p = str(tmp_path / "sym.mtx")
        with open(p, "w") as f:
            f.write("%%MatrixMarket matrix coordinate pattern symmetric\n")
            f.write("3 3 2\n2 1\n3 3\n")
        c = read_mtx(p, native=False)
        d = c.to_dense()
        assert d[1, 0] == 1.0 and d[0, 1] == 1.0 and d[2, 2] == 1.0
        assert c.nnz == 3

    def test_missing_value_defaults_to_one(self, tmp_path):
        # readcoo parity: value field missing → 1.0 (SimSpGEMM.cpp:78-84)
        p = str(tmp_path / "nv.mtx")
        with open(p, "w") as f:
            f.write("% comment\n2 2 2\n1 1\n2 2\n")
        c = read_mtx(p, native=False)
        np.testing.assert_allclose(np.diag(c.to_dense()), [1.0, 1.0])


class TestCompactCOO:
    @pytest.mark.parametrize("seed", range(3))
    def test_roundtrip(self, seed):
        c = _rand_coo(40, 40, 0.15, seed + 20)
        csr = c.to_csr()
        compact = CompactCOO.from_csr(csr)
        assert compact.nnz == csr.nnz
        assert compact.sanity_check(csr)

    def test_group_structure(self):
        # Group j holds the j-th element of rows with nnz > j
        # (csr2compact semantics, SimSpGEMM.cpp:154-219).
        c = COO((3, 5), [0, 0, 0, 1, 2], [1, 2, 4, 0, 3],
                np.arange(1.0, 6.0, dtype=np.float32))
        compact = CompactCOO.from_csr(c.to_csr())
        assert len(compact.groups) == 3
        assert list(compact.groups[0][0]) == [0, 1, 2]  # all rows nonempty
        assert list(compact.groups[1][0]) == [0]
        assert list(compact.groups[2][0]) == [0]


class TestBlockELL:
    @pytest.mark.parametrize("block", [(8, 8), (16, 32)])
    def test_roundtrip(self, block):
        c = _rand_coo(50, 70, 0.1, 30)
        b = BlockELL.from_coo(c, block_shape=block)
        np.testing.assert_allclose(b.to_dense(), c.to_dense())

    def test_static_shapes(self):
        c = _rand_coo(64, 64, 0.05, 31)
        b = BlockELL.from_coo(c, block_shape=(16, 16), pad_blocks_to=4)
        assert b.blocks.shape[1] >= 4
        assert b.blocks.shape[2:] == (16, 16)

    def test_density(self):
        c = banded(64, 1, seed=0)
        b = BlockELL.from_coo(c, block_shape=(16, 16))
        assert 0 < b.density() <= 1


class TestGenerators:
    def test_er_density_and_no_dups(self):
        c = erdos_renyi(100, 100, 0.05, seed=0)
        c.dupcheck()
        assert abs(c.nnz - 500) <= 1

    def test_er_deterministic(self):
        a = erdos_renyi(50, 50, 0.1, seed=7)
        b = erdos_renyi(50, 50, 0.1, seed=7)
        np.testing.assert_array_equal(a.row, b.row)
        np.testing.assert_array_equal(a.val, b.val)

    def test_rmat_skew(self):
        g = rmat(8, edge_factor=8, seed=1)
        g.dupcheck()
        row_nnz = g.to_csr().major_nnz()
        # Power-law: max row is much heavier than the mean.
        assert row_nnz.max() > 4 * max(row_nnz.mean(), 1)

    def test_banded(self):
        c = banded(32, 2)
        d = c.to_dense()
        assert d[0, 3] == 0 and d[5, 5] != 0


class TestSkewSymmetric:
    def _write(self, path):
        with open(path, "w") as f:
            f.write("%%MatrixMarket matrix coordinate real skew-symmetric\n")
            f.write("3 3 2\n2 1 4.0\n3 2 -1.5\n")

    def test_python_reader_sign(self, tmp_path):
        p = str(tmp_path / "skew.mtx")
        self._write(p)
        d = read_mtx(p, native=False).to_dense()
        assert d[1, 0] == 4.0 and d[0, 1] == -4.0
        assert d[2, 1] == -1.5 and d[1, 2] == 1.5

    def test_native_reader_sign(self, tmp_path):
        from outerspace_tpu.runtime.native import native_available

        if not native_available():
            pytest.skip("native lib not built")
        p = str(tmp_path / "skew.mtx")
        self._write(p)
        d = read_mtx(p, native=True).to_dense()
        assert d[1, 0] == 4.0 and d[0, 1] == -4.0

    def test_matches_scipy(self, tmp_path):
        import scipy.io

        p = str(tmp_path / "skew.mtx")
        self._write(p)
        ref = scipy.io.mmread(p).toarray()
        np.testing.assert_allclose(read_mtx(p, native=False).to_dense(), ref)


def test_read_mtx_gz_roundtrip(tmp_path):
    """SuiteSparse ships .mtx.gz — read_mtx decompresses transparently
    (both reader backends go through the same temp-file path)."""
    import gzip
    import shutil

    from outerspace_tpu.formats import read_mtx, write_mtx
    from outerspace_tpu.formats.generators import erdos_renyi

    g = erdos_renyi(40, 40, 0.1, seed=2)
    p = tmp_path / "g.mtx"
    write_mtx(str(p), g)
    pz = tmp_path / "g.mtx.gz"
    with open(p, "rb") as f, gzip.open(pz, "wb") as z:
        shutil.copyfileobj(f, z)
    a = read_mtx(str(p))
    b = read_mtx(str(pz))
    assert a.nnz == b.nnz
    assert np.array_equal(a.row, b.row) and np.array_equal(a.col, b.col)
    assert np.allclose(a.val, b.val)
