"""Device-resident SpGEMM chaining (ops.chain) vs host-loop references."""

import numpy as np
import pytest

import jax.numpy as jnp

from outerspace_tpu.formats import COO, erdos_renyi, rmat
from outerspace_tpu.ops.chain import (
    compact_to_csr_device,
    markov_cluster_device,
    square_device,
)
from outerspace_tpu.ops.reference import assert_csr_allclose, spgemm_scipy
from outerspace_tpu.ops.spgemm import MergedCOO, spgemm_padded, plan_to_device
from outerspace_tpu.ops.symbolic import expansion_plan


def _to_merged(coo: COO) -> MergedCOO:
    c = coo.to_csr().to_coo()  # row-major order
    n = c.shape[0]
    pad = -(-max(c.nnz, 1) // 1024) * 1024
    rows = np.full(pad, n, np.int32)
    cols = np.zeros(pad, np.int32)
    vals = np.zeros(pad, np.float32)
    rows[: c.nnz] = c.row
    cols[: c.nnz] = c.col
    vals[: c.nnz] = c.val
    return MergedCOO(
        c.shape, jnp.asarray(rows), jnp.asarray(cols), jnp.asarray(vals),
        jnp.asarray(rows < n), jnp.int32(c.nnz),
    )


class TestChain:
    def test_compact_to_csr_device(self):
        g = erdos_renyi(100, 100, 0.05, seed=51)
        merged = _to_merged(g)
        rows, cols, vals, indptr, nnz = compact_to_csr_device(
            merged.rows, merged.cols, merged.vals, merged.valid,
            nnz_pad=1024, m=100,
        )
        s = g.to_scipy().tocsr()
        assert int(nnz) == s.nnz
        np.testing.assert_array_equal(
            np.asarray(indptr), s.indptr.astype(np.int32)
        )
        np.testing.assert_array_equal(np.asarray(cols)[: s.nnz], s.indices)

    @pytest.mark.parametrize(
        "gen",
        [
            lambda: erdos_renyi(200, 200, 0.03, seed=52),
            lambda: rmat(7, edge_factor=6, seed=53),
        ],
    )
    def test_square_device(self, gen):
        g = gen()
        merged = _to_merged(g)
        sq = square_device(merged)
        assert_csr_allclose(sq.to_csr(), spgemm_scipy(g, g), rtol=1e-5)

    def test_repeated_squaring(self):
        # A^4 chained entirely on device vs scipy
        g = erdos_renyi(150, 150, 0.02, seed=54)
        merged = _to_merged(g)
        sq = square_device(square_device(merged))
        s = g.to_scipy().tocsr()
        ref = s @ s
        ref = ref @ ref
        ref.sum_duplicates()
        got = sq.to_csr().to_scipy().tocsr()
        assert got.nnz == ref.nnz
        np.testing.assert_allclose(
            got.toarray(), ref.toarray(), rtol=2e-4, atol=1e-5
        )

    def test_mcl_device_matches_host(self):
        from outerspace_tpu.ops.graph import markov_cluster, mcl_clusters

        g = erdos_renyi(120, 120, 0.04, seed=55)
        # host oracle with scipy backend, fixed iterations (no early break
        # at this count), identical knobs
        host = markov_cluster(g, iters=3, backend="scipy")
        dev = markov_cluster(g, iters=3, backend="tpu")
        hs, ds = host.to_scipy().tocsr(), dev.to_scipy().tocsr()
        assert ds.nnz == hs.nnz
        np.testing.assert_allclose(
            ds.toarray(), hs.toarray(), rtol=5e-4, atol=1e-5
        )
