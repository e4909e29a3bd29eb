"""TPU SpGEMM path (expand/sort/merge) vs scipy oracle, symbolic pass."""

import numpy as np
import pytest

from outerspace_tpu.formats import COO, erdos_renyi, rmat
from outerspace_tpu.ops.reference import assert_csr_allclose, spgemm_scipy
from outerspace_tpu.ops.spgemm import spgemm, spgemm_padded
from outerspace_tpu.ops.symbolic import (
    expansion_plan,
    per_outer_index_flops,
    round_up_bucket,
)


class TestSymbolic:
    def test_expansion_size_is_flop_count(self, operand_pair):
        a, b = operand_pair
        plan = expansion_plan(a.to_csc(), b.to_csr())
        from outerspace_tpu.ops.reference import spgemm_flops

        assert plan.expansion_size == spgemm_flops(a.to_csc(), b.to_csr())

    def test_per_outer_index_flops(self):
        a = erdos_renyi(32, 32, 0.1, seed=60)
        b = erdos_renyi(32, 32, 0.1, seed=61)
        f = per_outer_index_flops(a.to_csc(), b.to_csr())
        assert f.sum() == expansion_plan(a.to_csc(), b.to_csr()).expansion_size

    def test_bucket_rounding(self):
        assert round_up_bucket(1) == 256
        assert round_up_bucket(256) == 256
        assert round_up_bucket(257) == 320
        assert round_up_bucket(1000) == 1024
        assert round_up_bucket(1025) == 1280
        for n in [7, 300, 5000, 123457]:
            b = round_up_bucket(n)
            assert b >= n and b <= max(2 * n, 256)

    def test_dimension_mismatch_raises(self):
        a = erdos_renyi(8, 8, 0.2, seed=0)
        b = erdos_renyi(9, 9, 0.2, seed=1)
        with pytest.raises(ValueError):
            expansion_plan(a.to_csc(), b.to_csr())


class TestSpGEMM:
    def test_matches_scipy_smoke(self):
        """CI-speed oracle check (the full operand zoo is the slow tier)."""
        a = erdos_renyi(48, 48, 0.08, seed=41)
        b = erdos_renyi(48, 48, 0.08, seed=42)
        assert_csr_allclose(spgemm(a, b), spgemm_scipy(a, b), rtol=1e-5)

    @pytest.mark.slow
    def test_matches_scipy(self, operand_pair):
        a, b = operand_pair
        assert_csr_allclose(spgemm(a, b), spgemm_scipy(a, b))

    def test_empty_product(self):
        a = COO((8, 8), [0], [0], [1.0])
        b = COO((8, 8), [7], [7], [1.0])
        c = spgemm(a, b)
        assert c.nnz == 0 and c.shape == (8, 8)

    def test_accumulation(self):
        # Two partial products land on the same (row, col): must sum.
        a = COO((1, 2), [0, 0], [0, 1], [1.0, 1.0])
        b = COO((2, 2), [0, 1], [0, 0], [2.0, 3.0])
        c = spgemm(a, b)
        assert c.nnz == 1
        np.testing.assert_allclose(c.data, [5.0])

    def test_explicit_padding(self):
        a = erdos_renyi(16, 16, 0.2, seed=70)
        b = erdos_renyi(16, 16, 0.2, seed=71)
        ref = spgemm_scipy(a, b)
        plan = expansion_plan(a.to_csc(), b.to_csr())
        for pad in [plan.expansion_size, plan.padded_size(), 4096]:
            assert_csr_allclose(spgemm(a, b, p_pad=pad), ref)

    @pytest.mark.slow
    def test_packed_and_twokey_agree(self, operand_pair):
        a, b = operand_pair
        ref = spgemm_scipy(a, b)
        assert_csr_allclose(spgemm(a, b, packed=True), ref)
        assert_csr_allclose(spgemm(a, b, packed=False), ref)

    def test_device_compaction(self):
        from outerspace_tpu.ops.spgemm import _compact_device, spgemm_padded

        a = erdos_renyi(32, 32, 0.2, seed=76)
        b = erdos_renyi(32, 32, 0.2, seed=77)
        plan = expansion_plan(a.to_csc(), b.to_csr())
        merged = spgemm_padded(plan)
        r, c, v = _compact_device(
            merged.rows, merged.cols, merged.vals, merged.valid,
            p_pad=int(merged.rows.shape[0]),
        )
        nnz = int(merged.nnz)
        ref = spgemm_scipy(a, b).to_coo().sorted_rowmajor()
        np.testing.assert_array_equal(np.asarray(r)[:nnz], ref.row)
        np.testing.assert_array_equal(np.asarray(c)[:nnz], ref.col)
        np.testing.assert_allclose(
            np.asarray(v)[:nnz], ref.val, rtol=1e-5, atol=1e-6
        )

    def test_padding_too_small_raises(self):
        a = erdos_renyi(32, 32, 0.3, seed=72)
        plan = expansion_plan(a.to_csc(), a.to_csr())
        with pytest.raises(ValueError):
            spgemm_padded(plan, p_pad=max(plan.expansion_size // 2, 1))

    @pytest.mark.slow
    def test_a_squared_chain(self):
        # Repeated squaring (graph-kernel pattern, BASELINE configs[3]).
        g = rmat(5, edge_factor=4, seed=73, values="ones")
        ours = spgemm(spgemm(g, g), g)
        s = g.to_scipy().tocsr()
        ref = spgemm_scipy(COO.from_scipy(s @ s), g)
        assert_csr_allclose(ours, ref, rtol=1e-5)

    @pytest.mark.slow
    def test_rectangular(self):
        a = erdos_renyi(40, 100, 0.05, seed=74)
        b = erdos_renyi(100, 24, 0.1, seed=75)
        assert_csr_allclose(spgemm(a, b), spgemm_scipy(a, b))

    @pytest.mark.slow
    def test_dense_operands(self):
        # Fully dense corner: every (i,k,j) pairing exists.
        rng = np.random.default_rng(0)
        a = COO.from_dense(rng.random((12, 12)).astype(np.float32) + 0.5)
        b = COO.from_dense(rng.random((12, 12)).astype(np.float32) + 0.5)
        assert_csr_allclose(spgemm(a, b), spgemm_scipy(a, b), rtol=1e-4)

    @pytest.mark.slow
    def test_single_entry(self):
        a = COO((4, 4), [2], [3], [2.0])
        b = COO((4, 4), [3], [1], [5.0])
        c = spgemm(a, b)
        assert c.nnz == 1
        cols, vals = c.row_slice(2)
        np.testing.assert_array_equal(cols, [1])
        np.testing.assert_allclose(vals, [10.0])


class TestRound2Guards:
    def test_int32_overflow_guard(self):
        # ADVICE: expansion >= 2^31 must fail loudly, not silently wrap.
        from outerspace_tpu.ops.spgemm import plan_to_device

        a = erdos_renyi(16, 16, 0.3, seed=80)
        plan = expansion_plan(a.to_csc(), a.to_csr())
        plan.offsets = plan.offsets.copy()
        plan.offsets[-1] = 2**31  # forge an over-scale expansion
        with pytest.raises(ValueError, match="int32"):
            plan_to_device(plan)

    def test_max_duplicate_run_pow2(self):
        from outerspace_tpu.ops.spgemm import max_duplicate_run

        a = erdos_renyi(64, 64, 0.2, seed=81)
        plan = expansion_plan(a.to_csc(), a.to_csr())
        r = max_duplicate_run(plan)
        assert r >= 1 and (r & (r - 1)) == 0
        true_max = int(np.bincount(plan.a_rows, minlength=plan.m).max())
        assert r >= true_max

    @pytest.mark.slow
    def test_config_threads_into_spgemm(self):
        from outerspace_tpu.config import Config

        a = erdos_renyi(48, 48, 0.15, seed=82)
        cfg = Config().override(["waste_limit=8.0", "heavy_fraction_threshold=0.0"])
        # Forces the tile strategy via config; result must stay exact.
        c = spgemm(a, a, config=cfg, interpret=True)
        assert_csr_allclose(c, spgemm_scipy(a, a), rtol=1e-5)


class TestBestCheckpoint:
    def test_best_params_match_val_epoch(self):
        # ADVICE(medium): best_params must be the weights that SCORED
        # best_val_acc (captured before that epoch's training), mirroring
        # the reference's val-phase save (main.py:169-172).
        import jax.numpy as jnp

        from outerspace_tpu.nn.train import TrainConfig, evaluate, train
        from outerspace_tpu.nn.models import make_model

        rng = np.random.default_rng(3)
        x = rng.normal(size=(256, 784)).astype(np.float32)
        y = (rng.integers(0, 10, size=256)).astype(np.int32)
        data = {"train": (x, y), "val": (x[:128], y[:128]), "test": (x, y)}
        cfg = TrainConfig(model_type="MLP1", num_epochs=2, batch_size=64)
        res = train(data, cfg, verbose=False)
        model = make_model("MLP1")
        _, acc = evaluate(
            res.best_params, model.apply, *data["val"], cfg.batch_size
        )
        assert abs(acc - res.best_val_acc) < 1e-6


class TestBiasedKeys:
    def test_pack_unpack_roundtrip_extremes(self):
        import jax.numpy as jnp

        from outerspace_tpu.ops.spgemm import (
            pack_key_biased,
            unpack_key_biased,
        )

        m = n = 65536  # m·n = 2^32 exactly (the rmat16 shape)
        rows = jnp.array([0, 0, 1, 32767, 32768, 65535, 65535], jnp.int32)
        cols = jnp.array([0, 1, 0, 65535, 0, 0, 65535], jnp.int32)
        key = pack_key_biased(rows, cols, n)
        # Signed order of biased keys == lexicographic (row, col) order.
        assert bool(jnp.all(key[1:] > key[:-1]))
        r2, c2 = unpack_key_biased(key, n)
        np.testing.assert_array_equal(np.asarray(r2), np.asarray(rows))
        np.testing.assert_array_equal(np.asarray(c2), np.asarray(cols))
        del m

    def test_packed_u32_boundary_shape(self):
        # 65536² output space: previously forced the two-key sort; the
        # biased-u32 packing must handle it exactly, including the
        # (m-1, n-1) corner coordinate.
        m = 65536
        a = COO(
            (m, m),
            [0, 0, m - 1, m - 1, 7, 7],
            [0, m - 1, 0, m - 1, 9, 11],
            [1.0, 2.0, 3.0, 4.0, 5.0, 6.0],
        )
        b = COO(
            (m, m),
            [0, m - 1, m - 1, 9, 11],
            [0, m - 1, 0, m - 1, m - 1],
            [10.0, 20.0, 30.0, 40.0, 50.0],
        )
        for strategy in ("flat", "tiles"):
            c = spgemm(a, b, strategy=strategy, packed=True, interpret=True)
            assert_csr_allclose(c, spgemm_scipy(a, b), rtol=1e-6)

    @pytest.mark.slow
    def test_packed_matches_twokey_rmat(self):
        g = rmat(8, edge_factor=6, seed=90)
        c_packed = spgemm(g, g, strategy="tiles", packed=True, interpret=True)
        c_two = spgemm(g, g, strategy="tiles", packed=False, interpret=True)
        assert_csr_allclose(c_packed, c_two, rtol=1e-6)


@pytest.mark.slow
def test_spgemm_coo_matches_csr_api():
    # slow (~13 s): API-wrapper coverage; the underlying pipeline is
    # scipy-checked by TestSpGEMM in the default profile.
    from outerspace_tpu.formats import erdos_renyi
    from outerspace_tpu.ops.reference import compare_coo, spgemm_scipy
    from outerspace_tpu.ops.spgemm import spgemm_coo

    a = erdos_renyi(120, 120, 0.05, seed=41)
    b = erdos_renyi(120, 120, 0.05, seed=42)
    got = spgemm_coo(a, b)
    assert compare_coo(got, spgemm_scipy(a, b).to_coo(), eps=1e-5)
