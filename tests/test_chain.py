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

    def test_square_device_heavy_column_sizing(self):
        # Regression: P must gather row degrees by each element's COLUMN
        # (the outer index feeding the expansion). A matrix whose heavy
        # row h is referenced by many light rows' (i, h) elements has
        # true P = K·H + H but Σ rownnz(row(e)) = H² + K — the old
        # row-gathered estimate under-sized p_pad ~4x here and the
        # expansion silently truncated.
        n, H, K = 64, 4, 48
        rows = [0] * H + list(range(1, K + 1))
        cols = list(range(1, H + 1)) + [0] * K
        g = COO(
            (n, n),
            np.asarray(rows, np.int64),
            np.asarray(cols, np.int64),
            np.ones(H + K, np.float32),
        )
        merged = _to_merged(g)
        sq = square_device(merged)
        assert_csr_allclose(sq.to_csr(), spgemm_scipy(g, g), rtol=1e-5)

    def test_chain_stats_int32_container(self):
        # Regression (TPU tunnel): int bit patterns bitcast into an f32
        # fetch lane are denormals and flush to zero between device and
        # host. The stats containers must be int32 with the f32 guard
        # bitcast INTO the int lane, never the reverse.
        from outerspace_tpu.ops.chain import (
            _chain_stats_jit,
            _decode_flow_stats,
            _flow_stats_jit,
        )

        g = erdos_renyi(100, 100, 0.05, seed=51)
        merged = _to_merged(g)
        rows, cols, vals, indptr, _ = compact_to_csr_device(
            merged.rows, merged.cols, merged.vals, merged.valid,
            nnz_pad=1024, m=100,
        )
        raw = np.asarray(_chain_stats_jit(rows, cols, indptr, m=100))
        assert raw.dtype == np.int32
        s = g.to_scipy().tocsr()
        deg = np.diff(s.indptr)
        p_true = int(deg[s.tocoo().col].sum())
        assert int(raw[0]) == p_true
        assert int(raw[1]) == int(deg.max())
        assert abs(float(raw[2:3].view(np.float32)[0]) - p_true) <= 1e-3 * p_true

        fraw = _flow_stats_jit(merged.rows, merged.cols, merged.valid, m=100)
        assert np.asarray(fraw).dtype == np.int32
        nnz_h, p_h = _decode_flow_stats(fraw)
        assert nnz_h == s.nnz
        assert abs(p_h - p_true) <= max(1, int(1e-3 * p_true))

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

    @pytest.mark.slow
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

    def test_mcl_stepwise_chain_matches_scipy(self):
        # Direct coverage of the stepwise device chain (the exact
        # fallback behind the one-jit program's ok flag).
        import jax.numpy as jnp

        from outerspace_tpu.formats.coo import COO
        from outerspace_tpu.ops.chain import markov_cluster_device_fused
        from outerspace_tpu.ops.graph import _col_normalize, markov_cluster
        from outerspace_tpu.ops.spgemm import MergedCOO

        g = erdos_renyi(50, 50, 0.08, seed=3)
        ref = markov_cluster(g, iters=3, backend="scipy")
        n = g.shape[0]
        coo = g
        m = COO(
            g.shape,
            np.concatenate([coo.row, np.arange(n, dtype=coo.row.dtype)]),
            np.concatenate([coo.col, np.arange(n, dtype=coo.col.dtype)]),
            np.concatenate([np.abs(coo.val), np.ones(n, np.float32)]),
        ).deduplicated()
        c0 = _col_normalize(m.to_csr()).to_coo()
        pad = -(-max(c0.nnz, 1) // 1024) * 1024
        rows = np.full(pad, n, np.int32)
        cols = np.zeros(pad, np.int32)
        vals = np.zeros(pad, np.float32)
        rows[: c0.nnz] = c0.row
        cols[: c0.nnz] = c0.col
        vals[: c0.nnz] = c0.val
        merged0 = MergedCOO(
            (n, n), jnp.asarray(rows), jnp.asarray(cols),
            jnp.asarray(vals), jnp.asarray(rows < n), jnp.int32(c0.nnz),
        )
        out = markov_cluster_device_fused(merged0, iters=3)
        f = out.to_csr()
        assert f.nnz == ref.nnz
        np.testing.assert_allclose(
            f.to_dense(), ref.to_dense(), rtol=5e-4, atol=1e-5
        )

    @pytest.mark.slow
    def test_mcl_one_jit_program_matches_sizing_pass(self):
        # The second mcl_run through the same prep takes the cached
        # one-jit program; it must agree with the stepwise sizing pass
        # (and with scipy) exactly on structure.
        from outerspace_tpu.formats.coo import COO
        from outerspace_tpu.ops.graph import (
            _col_normalize,
            markov_cluster,
            mcl_prepare,
            mcl_run,
        )

        g = erdos_renyi(40, 40, 0.1, seed=9)
        ref = markov_cluster(g, iters=3, backend="scipy")
        n = g.shape[0]
        coo = g
        m = COO(
            g.shape,
            np.concatenate([coo.row, np.arange(n, dtype=coo.row.dtype)]),
            np.concatenate([coo.col, np.arange(n, dtype=coo.col.dtype)]),
            np.concatenate(
                [np.abs(coo.val), np.ones(n, dtype=np.float32)]
            ),
        ).deduplicated()
        prep = mcl_prepare(_col_normalize(m.to_csr()), iters=3)
        out1 = mcl_run(prep)  # sizing pass
        assert "p_pad" in prep
        out2 = mcl_run(prep)  # cached one-jit program
        assert "program" in prep
        f1, f2 = out1.to_csr(), out2.to_csr()
        assert f1.nnz == f2.nnz == ref.nnz
        np.testing.assert_allclose(
            f2.to_dense(), ref.to_dense(), rtol=5e-4, atol=1e-5
        )

    def _prep_flow(self, g):
        from outerspace_tpu.formats.coo import COO
        from outerspace_tpu.ops.graph import _col_normalize

        n = g.shape[0]
        m = COO(
            g.shape,
            np.concatenate([g.row, np.arange(n, dtype=g.row.dtype)]),
            np.concatenate([g.col, np.arange(n, dtype=g.col.dtype)]),
            np.concatenate([np.abs(g.val), np.ones(n, np.float32)]),
        ).deduplicated()
        return _col_normalize(m.to_csr())

    @pytest.mark.slow
    def test_mcl_per_iteration_schedule_end_to_end(self):
        # the host sizing sweep emits a per-iteration p_pads schedule and
        # the scheduled program matches scipy exactly on structure
        from outerspace_tpu.ops.graph import (
            markov_cluster, mcl_prepare, mcl_run,
        )

        g = rmat(8, edge_factor=8, seed=11)
        ref = markov_cluster(g, iters=4, backend="scipy")
        prep = mcl_prepare(self._prep_flow(g), iters=4)
        out = mcl_run(prep)
        assert prep.get("p_pads") is not None
        assert len(prep["p_pads"]) == 3  # one entry per loop squaring
        f = out.to_csr()
        assert f.nnz == ref.nnz
        np.testing.assert_allclose(
            f.to_dense(), ref.to_dense(), rtol=5e-4, atol=1e-5
        )

    @pytest.mark.slow
    def test_mcl_whole_traced_explicit_schedule_and_guards(self):
        # direct mcl_whole_traced: a hand schedule matches scipy; an
        # elem budget too small for the survivors trips ok=False
        from outerspace_tpu.ops.chain import mcl_whole_traced
        from outerspace_tpu.ops.graph import (
            _host_mcl_sizing, markov_cluster, mcl_prepare,
        )
        from outerspace_tpu.ops.symbolic import round_up_bucket

        g = rmat(8, edge_factor=8, seed=12)
        iters = 3
        ref = markov_cluster(g, iters=iters, backend="scipy")
        flow = self._prep_flow(g)
        prep = mcl_prepare(flow, iters=iters)
        p_list, nnz_list = _host_mcl_sizing(
            flow.to_scipy().tocsr(), 2.0, iters, 1e-4
        )
        elem_pad = round_up_bucket(
            int(1.5 * max(nnz_list)) + 1024, min_size=4096
        )
        p_pads = tuple(
            round_up_bucket(
                max(int(1.5 * p) + 4096, elem_pad), min_size=4096
            )
            for p in p_list[1:]
        )
        nnz_pad = round_up_bucket(
            int(1.5 * nnz_list[-1]) + 256, min_size=1024
        )
        r, c, v, nnz, ok = mcl_whole_traced(
            prep["tplan"], p_pad=max(p_pads), nnz_pad=nnz_pad,
            m=g.shape[0], n_cols=g.shape[0], iters=iters - 1,
            inflation=2.0, threshold=1e-4, elem_pad=elem_pad,
            p_pads=p_pads,
        )
        assert bool(np.asarray(ok))
        n_out = int(np.asarray(nnz))
        assert n_out == ref.nnz
        rr = np.asarray(r)[:n_out]
        cc = np.asarray(c)[:n_out]
        vv = np.asarray(v)[:n_out]
        rs = ref.to_scipy().tocoo()
        np.testing.assert_array_equal(rr, rs.row)
        np.testing.assert_array_equal(cc, rs.col)
        np.testing.assert_allclose(vv, rs.data, rtol=5e-4, atol=1e-5)
        # survivors exceed a deliberately tiny elem budget -> ok False
        assert max(nnz_list) > 4096, "fixture must overflow the budget"
        *_, ok_bad = mcl_whole_traced(
            prep["tplan"], p_pad=max(p_pads), nnz_pad=nnz_pad,
            m=g.shape[0], n_cols=g.shape[0], iters=iters - 1,
            inflation=2.0, threshold=1e-4, elem_pad=4096,
            p_pads=p_pads,
        )
        assert not bool(np.asarray(ok_bad))

    @pytest.mark.slow
    def test_markov_cluster_report_on_fallback(self, monkeypatch):
        # an ok-violation doubles prep budgets for the NEXT call; the
        # report must carry the PRE-run budgets with p_pad=None (the
        # fused-chain model does not describe the stepwise chain that
        # actually ran) and fast_path=False — and the output stays exact
        from outerspace_tpu.ops import graph as G

        g = rmat(8, edge_factor=8, seed=12)
        ref = G.markov_cluster(g, iters=3, backend="scipy")
        orig = G.mcl_prepare

        def sabotaged(flow, **kw):
            prep = orig(flow, **kw)
            prep["elem_pad"] = 4096  # too small for the survivors
            prep["p_pads"] = None    # single-size fast path
            prep["blk_caps"] = None
            prep.pop("program", None)
            return prep

        monkeypatch.setattr(G, "mcl_prepare", sabotaged)
        report: dict = {}
        out = G.markov_cluster(g, iters=3, backend="tpu", report=report)
        assert report["fast_path"] is False
        assert report["p_pad"] is None
        assert out.nnz == ref.nnz
        np.testing.assert_allclose(
            out.to_dense(), ref.to_dense(), rtol=5e-4, atol=1e-5
        )

    @pytest.mark.slow
    def test_mcl_split_tail_matches_single_sort(self):
        # the 8-way split stage-1 compaction (L >= 16*elem_pad) and the
        # single-sort path must produce identical flows
        from outerspace_tpu.ops.chain import (
            _stage1_squaring,
            mcl_whole_traced,
        )
        from outerspace_tpu.ops.graph import (
            _host_mcl_sizing, mcl_prepare,
        )
        from outerspace_tpu.ops.symbolic import round_up_bucket

        # a strong prune threshold makes survivors tiny relative to the
        # stage-1 stream (the split needs L >= 16·elem_pad)
        thr = 5e-3
        g = rmat(10, edge_factor=8, seed=13)
        flow = self._prep_flow(g)
        prep = mcl_prepare(flow, iters=2)
        L = int(_stage1_squaring(prep["tplan"]).rows.shape[0])
        p_list, nnz_list = _host_mcl_sizing(
            flow.to_scipy().tocsr(), 2.0, 2, thr
        )
        elem_small = round_up_bucket(
            max(nnz_list) + 1024, min_size=4096
        )
        if L < 16 * elem_small:
            pytest.skip("stream too short to trigger the split tail")
        outs = []
        for elem_pad in (elem_small, round_up_bucket(L // 2, min_size=4096)):
            p_pads = (
                round_up_bucket(
                    max(int(1.5 * p_list[1]) + 4096, elem_pad),
                    min_size=4096,
                ),
            )
            r, c, v, nnz, ok = mcl_whole_traced(
                prep["tplan"], p_pad=p_pads[0],
                nnz_pad=round_up_bucket(max(nnz_list), min_size=1024),
                m=g.shape[0], n_cols=g.shape[0], iters=1,
                inflation=2.0, threshold=thr, elem_pad=elem_pad,
                p_pads=p_pads,
            )
            assert bool(np.asarray(ok))
            n_out = int(np.asarray(nnz))
            outs.append(
                (np.asarray(r)[:n_out], np.asarray(c)[:n_out],
                 np.asarray(v)[:n_out])
            )
        np.testing.assert_array_equal(outs[0][0], outs[1][0])
        np.testing.assert_array_equal(outs[0][1], outs[1][1])
        np.testing.assert_allclose(outs[0][2], outs[1][2], rtol=1e-6)


class TestBlockCompaction:
    def test_compact_masked_stream_matches_sort(self):
        # the in-block compaction must equal the plain masked sort
        # element-wise whenever every block's survivors fit the cap,
        # and report ok=False (output disregarded) when one doesn't
        from outerspace_tpu.ops.chain import compact_masked_stream
        from outerspace_tpu.ops.spgemm import _I32_MAX

        rng = np.random.default_rng(5)
        L, out_len = 65536 + 4096, 8192  # exercises the L % blk pad
        pos = np.sort(rng.choice(L, size=3000, replace=False))
        keys = np.full(L, _I32_MAX, np.int32)
        uniq = np.unique(
            rng.integers(-(2**31), 2**31 - 2, size=8000)
        )[: pos.size]
        keys[pos] = rng.permutation(uniq).astype(np.int32)
        vals = np.zeros(L, np.float32)
        vals[pos] = rng.random(pos.size, dtype=np.float32)
        per_blk = np.bincount(pos // 8192)
        cap = int(per_blk.max())
        kd, vd = jnp.asarray(keys), jnp.asarray(vals)
        ks, vs = jnp.sort(kd), None
        import jax

        ks_ref, vs_ref = jax.lax.sort(
            (kd, vd), num_keys=1, is_stable=False
        )
        k, v, ok = compact_masked_stream(kd, vd, out_len, cap=cap)
        assert bool(np.asarray(ok))
        np.testing.assert_array_equal(
            np.asarray(k), np.asarray(ks_ref)[:out_len]
        )
        np.testing.assert_array_equal(
            np.asarray(v), np.asarray(vs_ref)[:out_len]
        )
        # out_len beyond the combined short stream: sentinel-padded
        big = 65536
        k2, v2, ok2 = compact_masked_stream(kd, vd, big, cap=cap)
        assert bool(np.asarray(ok2))
        np.testing.assert_array_equal(
            np.asarray(k2), np.asarray(ks_ref)[:big]
        )
        # a violated cap must be reported
        *_, ok_bad = compact_masked_stream(kd, vd, out_len, cap=cap - 1)
        assert not bool(np.asarray(ok_bad))

    def test_host_block_caps_match_device_stage1(self):
        # the host sizing sweep's stage-1 per-block survivor counts are
        # computed by REPLICATING the device stream layout (per-part
        # sorted product ranks); the device's actual masked stream must
        # agree exactly
        import jax
        import jax.numpy as jnp2
        from outerspace_tpu.ops.chain import _stage1_squaring
        from outerspace_tpu.ops.graph import (
            _host_mcl_sizing_full,
            _stage1_stream_layout,
            mcl_prepare,
        )

        g = rmat(8, edge_factor=8, seed=21)
        from outerspace_tpu.ops.graph import _col_normalize
        from outerspace_tpu.formats.coo import COO as _COO

        n = g.shape[0]
        m = _COO(
            g.shape,
            np.concatenate([g.row, np.arange(n, dtype=g.row.dtype)]),
            np.concatenate([g.col, np.arange(n, dtype=g.col.dtype)]),
            np.concatenate([np.abs(g.val), np.ones(n, np.float32)]),
        ).deduplicated()
        flow = _col_normalize(m.to_csr())
        prep = mcl_prepare(flow, iters=2)
        layout = _stage1_stream_layout(prep["tplan"])
        assert layout is not None
        blk = 1024  # small blocks magnify any layout error
        _, _, caps = _host_mcl_sizing_full(
            flow.to_scipy().tocsr(), 2.0, 2, 1e-4,
            stage1_layout=layout, blk=blk,
        )
        sq = _stage1_squaring(prep["tplan"])
        thr_root = np.float32((1e-4) ** 0.5)
        v_raw = np.where(
            np.asarray(sq.valid),
            np.maximum(np.asarray(sq.vals), 0.0), 0.0,
        )
        survive = np.asarray(sq.valid) & (v_raw > thr_root)
        L = survive.shape[0]
        assert L == sum(mp for _, _, mp in layout)
        nb = -(-L // blk)
        padded = np.zeros(nb * blk, bool)
        padded[:L] = survive
        dev_max = int(padded.reshape(nb, blk).sum(axis=1).max())
        assert caps[0] == dev_max
        # loop-squaring caps exist too (entry 1)
        assert caps[1] >= 1

    @pytest.mark.slow
    def test_mcl_blk_caps_end_to_end(self):
        # the sized cap schedule engages (prep carries it), the fast
        # path stays ok, and the flow matches scipy exactly on structure
        from outerspace_tpu.ops.graph import (
            markov_cluster, mcl_prepare, mcl_run,
        )

        # seed distinct from every other mcl_run fixture: the tmp
        # sizing cache persists across test runs, and an entry written
        # by a pre-blk_caps run would legitimately disable the caps
        g = rmat(8, edge_factor=8, seed=22)
        ref = markov_cluster(g, iters=4, backend="scipy")
        prep = mcl_prepare(self_flow(g), iters=4)
        out = mcl_run(prep)
        assert prep.get("blk_caps"), "cap schedule must be sized"
        assert any(prep["blk_caps"]), "at least one squaring capped"
        out2 = mcl_run(prep)  # one-jit cached program, caps engaged
        f = out2.to_csr()
        assert f.nnz == ref.nnz
        np.testing.assert_allclose(
            f.to_dense(), ref.to_dense(), rtol=5e-4, atol=1e-5
        )

    def test_mcl_cap_violation_forces_fallback(self):
        # an absurd 128-cap schedule must trip ok=False, never corrupt
        from outerspace_tpu.ops.chain import mcl_whole_traced
        from outerspace_tpu.ops.graph import (
            _host_mcl_sizing, mcl_prepare,
        )
        from outerspace_tpu.ops.symbolic import round_up_bucket

        g = rmat(8, edge_factor=8, seed=12)
        flow = self_flow(g)
        prep = mcl_prepare(flow, iters=2)
        p_list, nnz_list = _host_mcl_sizing(
            flow.to_scipy().tocsr(), 2.0, 2, 1e-4
        )
        elem_pad = round_up_bucket(
            int(1.5 * max(nnz_list)) + 1024, min_size=4096
        )
        p_pads = (
            round_up_bucket(
                max(int(1.5 * p_list[1]) + 4096, elem_pad),
                min_size=4096,
            ),
        )
        *_, ok_bad = mcl_whole_traced(
            prep["tplan"], p_pad=p_pads[0],
            nnz_pad=round_up_bucket(max(nnz_list), min_size=1024),
            m=g.shape[0], n_cols=g.shape[0], iters=1,
            inflation=2.0, threshold=1e-4, elem_pad=elem_pad,
            p_pads=p_pads, blk_caps=(128, 128),
        )
        assert not bool(np.asarray(ok_bad))


class TestRanksAndFillJoin:
    def test_ranks_in_sorted_matches_searchsorted(self):
        from outerspace_tpu.ops.chain import ranks_in_sorted

        rng = np.random.default_rng(7)
        for _ in range(6):
            # contract domain: unbiased values < 2^31 (i.e. negative
            # biased i32, as the chain's packed keys c*m + KEY_BIAS are)
            data = np.sort(
                rng.integers(-(2**31), -(2**20), size=777).astype(np.int32)
            )
            ns = int(rng.integers(1, 60))
            data[-ns:] = np.int32(2**31 - 1)  # sentinel tail
            probes = np.unique(
                rng.integers(-(2**31), -(2**20), size=123).astype(np.int32)
            )
            want = np.searchsorted(data, probes, side="left")
            got = np.asarray(
                ranks_in_sorted(jnp.asarray(data), jnp.asarray(probes))
            )
            assert (got == want).all()

    def test_column_starts_matches_searchsorted(self):
        from outerspace_tpu.ops.chain import _column_starts
        from outerspace_tpu.ops.spgemm import KEY_BIAS, _I32_MAX

        rng = np.random.default_rng(3)
        m = 64
        cols = np.sort(rng.integers(0, m, size=500))
        rows = rng.integers(0, m, size=500)
        k = np.sort(
            (cols.astype(np.int64) * m + rows + KEY_BIAS).astype(np.int32)
        )
        k = np.concatenate([k, np.full(44, _I32_MAX, np.int32)])
        probes = np.arange(m + 1, dtype=np.int64) * m + KEY_BIAS
        want = np.searchsorted(k, probes.astype(np.int32), side="left")
        got = np.asarray(_column_starts(jnp.asarray(k), m))
        assert (got == want).all()

    def test_column_starts_large_m_fallback(self):
        # m beyond the rank-trick packing guard (m^2 >= 2^31 - 2) must
        # take the searchsorted branch and stay exact.
        from outerspace_tpu.ops.chain import (
            _column_starts,
            _ranks_ok_for_columns,
        )
        from outerspace_tpu.ops.spgemm import KEY_BIAS, _I32_MAX

        m = 50_000
        assert not _ranks_ok_for_columns(m)
        rng = np.random.default_rng(11)
        cols = np.sort(rng.integers(0, m, size=300))
        rows = rng.integers(0, m, size=300)
        k = np.sort(
            (cols.astype(np.int64) * m + rows + KEY_BIAS).astype(np.int32)
        )
        k = np.concatenate([k, np.full(12, _I32_MAX, np.int32)])
        probes = np.arange(m + 1, dtype=np.int64) * m + KEY_BIAS
        want = np.searchsorted(k, probes.astype(np.int32), side="left")
        got = np.asarray(_column_starts(jnp.asarray(k), m))
        assert (got == want).all()

    @pytest.mark.slow
    def test_mcl_fill_join_matches_gather_join(self):
        # The gather-free combined-sort+fill expansion join
        # (_loop_expand_fill; measured −9 ms on the rmat14 MCL program
        # on chip) must agree with the flat-gather join elementwise in
        # structure; values may differ by f32 summation order only.
        # slow (~30 s): the default join path is already scipy-checked
        # by test_mcl_backends_agree / the stepwise-chain tests.
        from outerspace_tpu.ops.chain import mcl_whole_traced
        from outerspace_tpu.ops.gather_pipeline import plan_spgemm_gather
        from outerspace_tpu.ops.graph import _host_mcl_sizing
        from outerspace_tpu.ops.spgemm import plan_tiled_parts
        from outerspace_tpu.ops.symbolic import round_up_bucket
        from outerspace_tpu.sched.planner import choose_strategy

        import scipy.sparse as sp

        g = rmat(9, edge_factor=6, seed=3)
        flow = self_flow(g)
        a_csc = flow.to_csc()
        if choose_strategy(a_csc, flow) == "gather":
            tplan = plan_spgemm_gather(a_csc, flow)
        else:
            tplan = plan_tiled_parts(a_csc, flow)
        n = g.shape[0]
        f = sp.csr_matrix(
            (np.asarray(flow.data, np.float64),
             np.asarray(flow.indices), np.asarray(flow.indptr)),
            shape=(n, n),
        )
        p_list, nnz_list = _host_mcl_sizing(f, 2.0, 3, 1e-4)
        p_pad = round_up_bucket(int(max(p_list) * 1.5), min_size=4096)
        nnz_pad = round_up_bucket(int(max(nnz_list) * 1.5), min_size=1024)
        outs = {}
        for join in ("gather", "fill"):
            r, c, v, nnz, ok = mcl_whole_traced(
                tplan, p_pad=p_pad, nnz_pad=nnz_pad, m=n, n_cols=n,
                iters=3, inflation=2.0, threshold=1e-4, join=join,
            )
            assert bool(np.asarray(ok))
            k = int(np.asarray(nnz))
            outs[join] = (
                np.asarray(r)[:k], np.asarray(c)[:k], np.asarray(v)[:k]
            )
        a, b = outs["gather"], outs["fill"]
        assert a[0].shape == b[0].shape
        assert (a[0] == b[0]).all() and (a[1] == b[1]).all()
        np.testing.assert_allclose(a[2], b[2], rtol=1e-5, atol=1e-9)


def self_flow(g):
    from outerspace_tpu.formats.coo import COO as _COO
    from outerspace_tpu.ops.graph import _col_normalize

    n = g.shape[0]
    m = _COO(
        g.shape,
        np.concatenate([g.row, np.arange(n, dtype=g.row.dtype)]),
        np.concatenate([g.col, np.arange(n, dtype=g.col.dtype)]),
        np.concatenate([np.abs(g.val), np.ones(n, np.float32)]),
    ).deduplicated()
    return _col_normalize(m.to_csr())
