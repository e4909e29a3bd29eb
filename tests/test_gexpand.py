"""Windowed-gather expand kernel vs the XLA flat expand (interpret mode)."""

import numpy as np
import pytest

import jax.numpy as jnp

from outerspace_tpu.formats import erdos_renyi, rmat
from outerspace_tpu.ops.pallas.gexpand import (
    expand_gather_packed,
    gather_plan_to_device,
)
from outerspace_tpu.ops.reference import assert_csr_allclose, spgemm_scipy
from outerspace_tpu.ops.spgemm import (
    _I32_MAX,
    MergedCOO,
    merge_biased_keys,
)
from outerspace_tpu.sched.gplanner import plan_gather_from_csr


def _gexpand_spgemm(a, b, rtol=1e-5):
    """Full SpGEMM where the expand runs through the gather kernel
    (+ XLA flat fallback for window-incompatible elements)."""
    a_csc, b_csr = a.to_csc(), b.to_csr()
    plan, fb_plan = plan_gather_from_csr(a_csc, b_csr)
    assert plan is not None
    dev = gather_plan_to_device(plan)
    keys, vals = expand_gather_packed(
        dev["bases"], dev["table"], dev["a_pack"], dev["b_pack"],
        ngroups=plan.ngroups, interpret=True,
    )
    pad = plan.p_out - plan.p_real
    if fb_plan is not None:
        from outerspace_tpu.ops.spgemm import (
            _expand_light_packed,
            plan_to_device,
        )

        fb_pad = fb_plan.padded_size(min_size=256)
        k2, v2 = _expand_light_packed(
            **plan_to_device(fb_plan), p_pad=fb_pad,
            sentinel_row=plan.m, n_cols=plan.n,
        )
        keys = jnp.concatenate([keys, k2])
        vals = jnp.concatenate([vals, v2])
        pad += fb_pad - fb_plan.expansion_size
    r, c, v, valid, nnz = merge_biased_keys(
        keys, vals, plan.n, plan.m, max_run=None,
        pad_count=jnp.int32(pad), epilogue="xla",
    )
    return MergedCOO((plan.m, plan.n), r, c, v, valid, nnz).to_csr()


@pytest.mark.parametrize(
    "gen",
    [
        lambda: erdos_renyi(400, 400, 0.01, seed=21),
        pytest.param(
            lambda: erdos_renyi(1000, 1000, 0.004, seed=22),
            marks=pytest.mark.slow,
        ),
        pytest.param(
            lambda: rmat(8, edge_factor=4, seed=23),
            marks=pytest.mark.slow,
        ),
        pytest.param(
            lambda: erdos_renyi(300, 500, 0.02, seed=24),
            marks=pytest.mark.slow,
        ),
    ],
)
def test_gexpand_matches_scipy(gen):
    g = gen()
    b = (
        erdos_renyi(g.shape[1], 300, 0.015, seed=99)
        if g.shape[0] != g.shape[1]
        else g
    )
    got = _gexpand_spgemm(g, b)
    assert_csr_allclose(got, spgemm_scipy(g, b), rtol=1e-5)


def test_gexpand_stream_exactness():
    # The gather stream must contain exactly p_real live products.
    g = erdos_renyi(500, 500, 0.008, seed=31)
    a_csc, b_csr = g.to_csc(), g.to_csr()
    plan, fb = plan_gather_from_csr(a_csc, b_csr)
    dev = gather_plan_to_device(plan)
    keys, vals = expand_gather_packed(
        dev["bases"], dev["table"], dev["a_pack"], dev["b_pack"],
        ngroups=plan.ngroups, interpret=True,
    )
    live = int(np.sum(np.asarray(keys) != _I32_MAX))
    assert live == plan.p_real


def test_product_space_cuts_invariants():
    # The planner cuts subtiles at PRODUCT granularity: cuts may land
    # mid-element and a B-bound cut includes the violating element's
    # prefix up to the window edge. Invariants: plans stay within
    # window bounds, p0/plen tile the product space exactly, B anchors
    # never precede the owner element's row, subtile fill beats
    # element-granular cuts (>= ceil-average), and the expanded stream
    # stays exact.
    from outerspace_tpu.sched.gplanner import (
        A_WIN,
        SUB_P,
        plan_gather_from_csr,
    )

    g = rmat(9, edge_factor=16, seed=41)  # skewed: many same-k repeats
    a_csc, b_csr = g.to_csc(), g.to_csr()
    plan, fb = plan_gather_from_csr(a_csc, b_csr)
    assert plan is not None
    tab = plan.table
    plen = tab[:, :, 3].astype(np.int64)
    p0 = tab[:, :, 2].astype(np.int64)
    live = plen > 0
    # exact tiling of the product space: live (p0, plen) runs are
    # disjoint, sorted, and sum to p_real
    order = np.argsort(p0[live])
    p0s, plens = p0[live][order], plen[live][order]
    assert int(plens.sum()) == plan.p_real
    assert np.all(p0s[1:] == p0s[:-1] + plens[:-1])  # gapless cover
    assert int(plens.max()) <= SUB_P
    # subtile fill must beat the old element-granular cuts' measured
    # regime on skewed operands (this operand: >= 95%)
    nsub = int(live.sum())
    assert plens.sum() / (nsub * SUB_P) >= 0.95
    # per-group windows: subtile offsets fit the super-windows
    for gi in range(plan.ngroups):
        for si in range(8):
            if tab[gi, si, 3] == 0:
                continue
            assert 0 <= tab[gi, si, 0] <= 8 * 3 - A_WIN
            assert 0 <= tab[gi, si, 1] <= 8 * 5 - plan.b_win
    # end-to-end exactness of plans with mid-element cuts is covered by
    # test_gexpand_matches_scipy / the pipeline suites (same planner)


@pytest.mark.slow
def test_gexpand_wide_rows_fall_back():
    # A matrix with one B row wider than the (B_WIN-1)*128 window bound:
    # those elements must route to the fallback plan, and the combined
    # result must stay exact.
    from outerspace_tpu.sched.gplanner import B_WIN

    wide = (B_WIN - 1) * 128 + 76  # just past the window bound
    rows = np.concatenate([np.zeros(wide, np.int64), [1, 2, 3]])
    cols = np.concatenate([np.arange(wide), [5, 6, 7]])
    vals = np.ones(wide + 3, np.float32)
    from outerspace_tpu.formats import COO

    b = COO((10, wide + 100), rows, cols, vals)
    a = COO((4, 10), [0, 1, 2, 3], [0, 1, 2, 3], [1.0, 2.0, 3.0, 4.0])
    a_csc, b_csr = a.to_csc(), b.to_csr()
    plan, fb_plan = plan_gather_from_csr(a_csc, b_csr)
    assert fb_plan is not None and fb_plan.expansion_size == wide
    got = _gexpand_spgemm(a, b)
    assert_csr_allclose(got, spgemm_scipy(a, b), rtol=1e-6)


class TestGatherPipeline:
    @pytest.mark.slow
    def test_row_split_big_keyspace(self):
        # m*n = 9e6... use shapes forcing multiple parts with a tiny
        # key_space override via row_partition directly, then the full
        # pipeline on a shape whose m*n exceeds 2^32.
        from outerspace_tpu.ops.gather_pipeline import spgemm_gather
        from outerspace_tpu.sched.gplanner import row_partition

        a = erdos_renyi(3000, 3000, 0.002, seed=41)
        bounds = row_partition(a.to_csc(), a.to_csr(), key_space=2_000_000)
        assert len(bounds) > 2  # genuinely split
        got = spgemm_gather(a, a, interpret=True)
        assert_csr_allclose(got, spgemm_scipy(a, a), rtol=1e-5)

    @pytest.mark.slow
    def test_single_part_pipeline(self):
        from outerspace_tpu.ops.gather_pipeline import spgemm_gather

        a = erdos_renyi(800, 600, 0.01, seed=42)
        b = erdos_renyi(600, 900, 0.008, seed=43)
        got = spgemm_gather(a, b, interpret=True)
        assert_csr_allclose(got, spgemm_scipy(a, b), rtol=1e-5)

    @pytest.mark.slow
    def test_multi_part_forced(self, monkeypatch):
        # Force row splitting in the real pipeline by shrinking the key
        # space, so part concatenation + row rebasing is exercised.
        import outerspace_tpu.ops.gather_pipeline as gpipe
        from outerspace_tpu.ops.gather_pipeline import spgemm_gather
        from outerspace_tpu.sched.gplanner import row_partition as orig

        monkeypatch.setattr(
            gpipe, "row_partition",
            lambda a, b, key_space=2**32: orig(a, b, key_space=500_000),
        )
        a = erdos_renyi(1200, 1100, 0.004, seed=44)
        got = spgemm_gather(a, a.transpose(), interpret=True)
        assert_csr_allclose(
            got, spgemm_scipy(a, a.transpose()), rtol=1e-5
        )

    @pytest.mark.slow
    def test_scanned_runner_matches_dispatch_loop(self, monkeypatch):
        # The lax.scan runner (one executable for ALL commonized parts)
        # must produce the identical stream layout — rows/cols/vals/
        # valid element-wise, not just the merged CSR — as the per-part
        # dispatch loop, since bench checksums are placement-sensitive.
        import outerspace_tpu.ops.gather_pipeline as gpipe
        from outerspace_tpu.ops.gather_pipeline import (
            plan_spgemm_gather,
            spgemm_gather_padded,
        )
        from outerspace_tpu.sched.gplanner import row_partition as orig

        monkeypatch.setattr(
            gpipe, "row_partition",
            lambda a, b, key_space=2**32: orig(a, b, key_space=500_000),
        )
        a = erdos_renyi(1200, 1100, 0.004, seed=44)
        b = a.transpose()
        plan = plan_spgemm_gather(a.to_csc(), b.to_csr())
        assert len(plan.parts) > 1
        scan = spgemm_gather_padded(plan, scanned=True)
        loop = spgemm_gather_padded(plan, scanned=False)
        assert int(scan.nnz) == int(loop.nnz)
        sv, lv = np.asarray(scan.valid), np.asarray(loop.valid)
        np.testing.assert_array_equal(sv, lv)
        np.testing.assert_array_equal(
            np.asarray(scan.rows)[sv], np.asarray(loop.rows)[lv]
        )
        np.testing.assert_array_equal(
            np.asarray(scan.cols)[sv], np.asarray(loop.cols)[lv]
        )
        np.testing.assert_allclose(
            np.asarray(scan.vals)[sv], np.asarray(loop.vals)[lv],
            rtol=1e-6,
        )
        assert_csr_allclose(scan.to_csr(), spgemm_scipy(a, b), rtol=1e-5)

def test_anchored_search_matches_full_window():
    # Shallow-search kernel variants (search_bits < 8, anchored at table
    # lane 6) must produce the IDENTICAL stream as the legacy
    # full-window search — same keys, same values, element-wise — and
    # the planner's width metadata must actually classify some calls
    # shallow on a skewed operand (groups are width-desc ordered so
    # narrow calls cluster at the tail).
    from outerspace_tpu.sched.gplanner import (
        call_search_bits,
        group_slab_layout,
        plan_gather_from_csr,
    )

    g = rmat(9, edge_factor=16, seed=41)
    a_csc, b_csr = g.to_csc(), g.to_csr()
    plan, fb = plan_gather_from_csr(a_csc, b_csr)
    assert plan.group_width is not None
    gw = plan.group_width
    # width-descending group order (padding tail carries 1s)
    assert (gw[:-1] >= gw[1:]).all()
    bits = call_search_bits(gw, plan.ngroups)
    layout = group_slab_layout(plan.ngroups)
    assert len(bits) == len(layout)
    # every call's variant covers its max width
    for (g0, size), b in zip(layout, bits):
        assert int(gw[g0:g0 + size].max(initial=1)) <= (1 << b)
    dev = gather_plan_to_device(plan)

    def run(call_bits):
        ks, vs = [], []
        for (g0, size), b in zip(layout, call_bits):
            k, v = expand_gather_packed(
                dev["bases"][g0 * 2:(g0 + size) * 2],
                dev["table"][g0:g0 + size],
                dev["a_pack"], dev["b_pack"],
                ngroups=size, search_bits=b, interpret=True,
            )
            ks.append(np.asarray(k))
            vs.append(np.asarray(v))
        return np.concatenate(ks), np.concatenate(vs)

    k_fast, v_fast = run(bits)
    k_full, v_full = run((8,) * len(layout))
    np.testing.assert_array_equal(k_fast, k_full)
    np.testing.assert_array_equal(v_fast, v_full)


@pytest.mark.slow
def test_anchored_search_shallow_calls_exist_and_plan_exact():
    # slow (~35 s): shallow-vs-full-window element equality is covered
    # by test_anchored_search_matches_full_window in the default run.
    # An operand whose B rows are wide (few owner elements per
    # 1024-product subtile) must classify at least one slab call
    # shallow, and the full pipeline stays exact vs scipy through the
    # shallow path. (Skew decides this: heavy-B-row regions go narrow,
    # light-row regions wide — rmat14 measures {4: 2, 6: 1, 8: 1},
    # er100k all-8.)
    g = erdos_renyi(400, 400, 0.2, seed=13)
    a, b = g, g.transpose()
    from outerspace_tpu.ops.gather_pipeline import (
        plan_spgemm_gather,
        spgemm_gather_padded,
    )

    plan = plan_spgemm_gather(a.to_csc(), b.to_csr())
    assert any(
        bit < 8 for p_ in plan.parts for bit in (p_.call_bits or ())
    ), "expected at least one shallow-search slab call"
    got = spgemm_gather_padded(plan).to_csr()
    assert_csr_allclose(got, spgemm_scipy(a, b), rtol=1e-5)



def test_native_planner_matches_python():
    # The C++ planner core (csrc/gplan.cpp: rolling-pointer subtile
    # cuts + group packing) must produce BIT-IDENTICAL plans to the
    # Python definition loops it accelerates.
    from outerspace_tpu.runtime import native
    from outerspace_tpu.formats import rmat
    from outerspace_tpu.ops.gather_pipeline import plan_spgemm_gather

    lib = native.load_library()
    if lib is None or not hasattr(lib, "osp_plan_subtiles"):
        pytest.skip("native library not built with the planner core")
    g = rmat(11, edge_factor=8, seed=2)
    a_csc, b_csr = g.to_csc(), g.to_csr()
    pn = plan_spgemm_gather(a_csc, b_csr)
    native._LIB = None  # force the Python fallback loops
    try:
        pp = plan_spgemm_gather(a_csc, b_csr)
    finally:
        native._LIB = lib
    assert len(pn.parts) == len(pp.parts)
    for qa, qb in zip(pn.parts, pp.parts):
        assert (qa.merge_pad, qa.ngroups, qa.call_bits, qa.max_run) == (
            qb.merge_pad, qb.ngroups, qb.call_bits, qb.max_run
        )
        for k in qa.dev:
            xa, xb = np.asarray(qa.dev[k]), np.asarray(qb.dev[k])
            assert xa.shape == xb.shape and (xa == xb).all(), k
