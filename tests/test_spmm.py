"""Block-ELL SpMM kernel vs dense reference (interpret mode on CPU)."""

import numpy as np
import pytest

from outerspace_tpu.formats import COO, BlockELL, erdos_renyi
from outerspace_tpu.ops.pallas.spmm_kernel import spmm


def _sparse_w(m, k, density, seed, block=(8, 128)):
    w = erdos_renyi(m, k, density, seed=seed, values="normal")
    return BlockELL.from_coo(w, block_shape=block), w.to_dense()


class TestSpMM:
    @pytest.mark.parametrize("shape", [(64, 256, 32), (100, 784, 17)])
    def test_matches_dense(self, shape):
        m, k, n = shape
        w_ell, w_dense = _sparse_w(m, k, 0.05, seed=m + k)
        x = np.random.default_rng(0).standard_normal((k, n)).astype(np.float32)
        y = np.asarray(spmm(w_ell, x, interpret=True))
        np.testing.assert_allclose(y, w_dense @ x, rtol=1e-4, atol=1e-4)

    def test_block_sparsity_skipped(self):
        # A W with very few blocks: result must still be exact.
        m, k = 128, 512
        d = np.zeros((m, k), dtype=np.float32)
        d[3:11, 130:140] = 1.5  # one block neighborhood
        d[77, 400] = -2.0
        w = BlockELL.from_coo(COO.from_dense(d), block_shape=(8, 128))
        assert w.stored_blocks <= 6
        x = np.random.default_rng(1).standard_normal((k, 64)).astype(np.float32)
        y = np.asarray(spmm(w, x, interpret=True))
        np.testing.assert_allclose(y, d @ x, rtol=1e-4, atol=1e-4)

    def test_empty_matrix(self):
        w = BlockELL.from_coo(COO((64, 128), [], [], []), block_shape=(8, 128))
        x = np.ones((128, 32), dtype=np.float32)
        y = np.asarray(spmm(w, x, interpret=True))
        np.testing.assert_array_equal(y, np.zeros((64, 32)))

    def test_shape_mismatch_raises(self):
        w, _ = _sparse_w(16, 128, 0.1, seed=3)
        with pytest.raises(ValueError):
            spmm(w, np.ones((64, 4), dtype=np.float32), interpret=True)

    def test_unaligned_n(self):
        # N not a multiple of the tile: padding + crop must be exact.
        w, w_dense = _sparse_w(40, 256, 0.08, seed=4)
        x = np.random.default_rng(2).standard_normal((256, 77)).astype(
            np.float32
        )
        y = np.asarray(spmm(w, x, interpret=True))
        np.testing.assert_allclose(y, w_dense @ x, rtol=1e-4, atol=1e-4)


def test_masked_slots_reuse_neighbor_indices():
    # Masked ELL slots must carry the neighboring valid slot's fetch
    # indices (no index change => the Pallas pipeline issues no DMA).
    import numpy as np

    from outerspace_tpu.formats.coo import COO
    from outerspace_tpu.formats.compact import BlockELL
    from outerspace_tpu.ops.pallas.spmm_kernel import blockell_to_device

    rng = np.random.default_rng(0)
    dense = np.zeros((16, 32), np.float32)
    dense[0, :8] = 1.0          # row block 0: one valid block
    dense[8:, :] = rng.random((8, 32)).astype(np.float32)  # full row
    w = BlockELL.from_coo(COO.from_dense(dense), block_shape=(8, 8))
    dev = blockell_to_device(w)
    meta = np.asarray(dev["meta"]).reshape(w.block_cols.shape[0], -1, 3)
    for rb in range(meta.shape[0]):
        prev = None
        for s in range(meta.shape[1]):
            col, mask, slot = meta[rb, s]
            if mask:
                prev = (col, slot)
            elif prev is not None:
                assert (col, slot) == prev, (rb, s)


def test_sparse_mlp_sharded_serving_matches_single():
    """Data-parallel serving (SparseMLP.sharded): the batch shard_maps
    over a dp mesh with the block-ELL weights replicated, and must be
    bit-identical to the single-device forward (the Pallas SpMM kernel
    cannot be auto-partitioned by XLA — the batch split is explicit)."""
    import jax
    import jax.numpy as jnp

    from outerspace_tpu.nn.models import MLP1
    from outerspace_tpu.nn.prune import prune_params
    from outerspace_tpu.nn.sparse_infer import SparseMLP
    from outerspace_tpu.shard.mesh import make_mesh

    params = MLP1().init(jax.random.PRNGKey(0), jnp.zeros((4, 784)))["params"]
    params = prune_params(params, sparsity_level=0.1)
    m = SparseMLP(params)
    x = np.random.default_rng(0).random((16, 784)).astype(np.float32)
    ref = np.asarray(m(x))
    ndev = len(jax.devices())
    mesh = make_mesh((ndev,), ("dp",))
    got = np.asarray(m.sharded(mesh, axis="dp")(x))
    assert np.array_equal(got, ref)
