"""Rebased row-partitioned tiled pipeline: m·n > 2³² via part-local keys.

The gather pipeline has always served any m·n by rebasing each row part's
packed keys to its ``row_base`` (``ops/gather_pipeline.py``); these tests
cover the same lift for the TILED strategy (``plan_tiled_parts`` with
``rebased=True``): every part plans on a local-row A slice whose span is
capped at ``2³²//n`` so its biased-u32 key space fits, the merge runs
under the COMMON global-m sentinel (one executable), and a traced
``row_base`` add restores global rows. Without this, skewed operands
past 2³² fell back to the 3-stream two-key sort.
"""

import numpy as np
import pytest

from outerspace_tpu.formats import COO
from outerspace_tpu.ops.reference import assert_csr_allclose, spgemm_scipy
from outerspace_tpu.ops.spgemm import (
    TiledPartsPlan,
    plan_tiled_parts,
    spgemm,
    spgemm_padded_tiled_parts,
)


def _big_shape_pair(seed=0, m=70000, n=70000, k=64, nnz_a=1500, row_nnz_b=20):
    """Random operands with m·n > 2³² but tiny nnz (CPU-friendly)."""
    rng = np.random.default_rng(seed)
    ar = rng.integers(0, m, size=nnz_a)
    ak = rng.integers(0, k, size=nnz_a)
    au = np.unique(ar * np.int64(k) + ak)
    a = COO(
        (m, k),
        (au // k).astype(np.int64),
        (au % k).astype(np.int64),
        rng.standard_normal(au.shape[0]).astype(np.float32),
    )
    bk = np.repeat(np.arange(k), row_nnz_b)
    bc = rng.integers(0, n, size=bk.shape[0])
    bu = np.unique(bk * np.int64(n) + bc)
    b = COO(
        (k, n),
        (bu // n).astype(np.int64),
        (bu % n).astype(np.int64),
        rng.standard_normal(bu.shape[0]).astype(np.float32),
    )
    return a, b


class TestRebasedParts:
    def test_plan_is_rebased_and_span_capped(self):
        a, b = _big_shape_pair()
        plan = plan_tiled_parts(a.to_csc(), b.to_csr())
        assert isinstance(plan, TiledPartsPlan)
        assert plan.rebased
        cap = 2**32 // plan.n
        assert len(plan.parts) >= 2
        for lo, hi, tp in plan.parts:
            assert hi - lo <= cap
            # part plans are LOCAL: their m is the span, keys fit u32
            assert tp.m == hi - lo
            assert tp.m * tp.n <= 2**32

    def test_exact_vs_scipy_and_one_merge_executable(self):
        from outerspace_tpu.ops.spgemm import _merge_stream_jit

        a, b = _big_shape_pair(seed=1)
        # generous budget: tiny imbalanced test streams can bust the
        # commonization guard that real workloads pass at 1-3% inflation
        plan = plan_tiled_parts(a.to_csc(), b.to_csr(), budget=10.0)
        assert isinstance(plan, TiledPartsPlan) and plan.rebased
        assert plan.merge_pad > 0
        _merge_stream_jit.clear_cache()
        merged = spgemm_padded_tiled_parts(plan, interpret=True)
        assert_csr_allclose(
            merged.to_csr(), spgemm_scipy(a, b), rtol=1e-5, atol=1e-6
        )
        # the global-m common sentinel keeps ONE executable across parts
        assert _merge_stream_jit._cache_size() == 1

    def test_spgemm_tiles_strategy_end_to_end(self):
        a, b = _big_shape_pair(seed=2)
        c = spgemm(a, b, strategy="tiles")
        assert_csr_allclose(c, spgemm_scipy(a, b), rtol=1e-5, atol=1e-6)

    def test_packed_false_two_key_fallback_still_rebases(self):
        a, b = _big_shape_pair(seed=3)
        plan = plan_tiled_parts(a.to_csc(), b.to_csr())
        assert isinstance(plan, TiledPartsPlan) and plan.rebased
        merged = spgemm_padded_tiled_parts(plan, packed=False, interpret=True)
        assert_csr_allclose(
            merged.to_csr(), spgemm_scipy(a, b), rtol=1e-5, atol=1e-6
        )

    def test_uncommonized_rebased_parts_exact(self):
        # the mandatory-split fallback when pad-to-max commonization
        # busts the budget: merge_pad=0 → per-part merge signatures
        import dataclasses

        a, b = _big_shape_pair(seed=5)
        plan = plan_tiled_parts(a.to_csc(), b.to_csr(), budget=10.0)
        assert isinstance(plan, TiledPartsPlan) and plan.rebased
        un = dataclasses.replace(plan, merge_pad=0, max_run=0)
        merged = spgemm_padded_tiled_parts(un, interpret=True)
        assert_csr_allclose(
            merged.to_csr(), spgemm_scipy(a, b), rtol=1e-5, atol=1e-6
        )

    @pytest.mark.slow
    def test_bench_dispatch_run_validates_rebased(self):
        import bench
        import scipy.sparse as sp

        from outerspace_tpu.ops.symbolic import expansion_plan

        a, b = _big_shape_pair(seed=4)
        plan = plan_tiled_parts(a.to_csc(), b.to_csr())
        assert isinstance(plan, TiledPartsPlan) and plan.rebased
        flops = expansion_plan(a.to_csc(), b.to_csr()).expansion_size
        run = bench._tiles_parts_run(plan, flops)
        vec = np.asarray(run(2))
        ref = spgemm_scipy(a, b)
        c_ref = sp.csr_matrix(
            (ref.data, ref.indices, ref.indptr), shape=ref.shape
        )
        nnz_ok, val_ok = bench._validate_vec(vec, 2, c_ref)
        assert nnz_ok and val_ok


class TestRebasedCornerRecovery:
    """A part whose local key space is EXACTLY 2³² holds a real product
    at its (span-1, n-1) corner — the sentinel bit pattern. The merge's
    pad-count corner recovery must keep it (same machinery rmat16's
    m·n == 2³² case uses, now per part)."""

    def _pair(self):
        m, n, k = 131072, 65536, 16
        # Second half heavy (every 8 rows), first half light (every 64):
        # the greedy span-capped partitioner then clips the first bound
        # at the 65536-row cap, making part 2 = [65536, m) with span·n
        # exactly 2³² and containing row m-1.
        r1 = np.arange(0, 65536, 64, dtype=np.int64)
        r2 = np.arange(65536, m, 8, dtype=np.int64)
        rows = np.concatenate([r1, r2, [m - 1]])
        cols = np.concatenate(
            [
                (r1 // 64) % k,
                np.arange(r2.shape[0], dtype=np.int64) % k,
                [0],
            ]
        )
        a = COO((m, k), rows, cols, np.ones(rows.shape[0], np.float32))
        bj = np.arange(k, dtype=np.int64)
        b_rows = np.concatenate([bj, [0]])
        b_cols = np.concatenate([(bj * 37) % n, [n - 1]])
        b = COO(
            (k, n), b_rows, b_cols, np.ones(b_rows.shape[0], np.float32)
        )
        return a, b

    @pytest.mark.slow
    def test_corner_product_survives(self):
        a, b = self._pair()
        m, n = a.shape[0], b.shape[1]
        plan = plan_tiled_parts(a.to_csc(), b.to_csr(), nparts=2, budget=10.0)
        assert isinstance(plan, TiledPartsPlan) and plan.rebased
        spans = [(lo, hi) for lo, hi, _ in plan.parts]
        assert any(
            (hi - lo) * n == 2**32 and hi == m for lo, hi in spans
        ), f"no cap-exact tail part in {spans}"
        merged = spgemm_padded_tiled_parts(plan, interpret=True)
        c = merged.to_csr()
        assert_csr_allclose(c, spgemm_scipy(a, b), rtol=1e-6, atol=0)
        # the corner coordinate (m-1, n-1) is a real output element
        last = c.indices[c.indptr[m - 1] : c.indptr[m]]
        assert (n - 1) in last


class TestRebasedGuards:
    def test_huge_n_falls_back_to_two_key(self):
        # n ≥ 2³¹: int32 packing can't hold n — must return the unsplit
        # two-key plan, not crash. Expected product is hand-computed
        # (the scipy oracle is O(n) at this width).
        from outerspace_tpu.ops.spgemm import TiledPlan

        m, n, k = 4, 2**31, 4
        a = COO((m, k), [0, 3], [0, 1], np.ones(2, np.float32))
        b = COO((k, n), [0, 1], [5, n - 2], np.ones(2, np.float32))
        plan = plan_tiled_parts(a.to_csc(), b.to_csr())
        assert isinstance(plan, TiledPlan)
        c = spgemm_padded_tiled_parts(plan, interpret=True).to_csr()
        # C = {(0, 5): 1, (3, n-2): 1}
        assert c.shape == (m, n)
        assert list(np.asarray(c.indptr)) == [0, 1, 1, 1, 2]
        assert list(np.asarray(c.indices)) == [5, n - 2]
        assert np.allclose(np.asarray(c.data), [1.0, 1.0])
