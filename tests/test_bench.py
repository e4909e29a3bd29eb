"""Bench harness contract pieces (bench.py) — CPU-testable invariants.

The bench itself is the TPU driver surface, but its correctness-critical
plumbing — the chain vector layout, checksum validation, and the
gather-plan shape commonization the dispatch sampler relies on — must
hold off-hardware too.
"""

import numpy as np
import pytest

import jax.numpy as jnp

import bench
from outerspace_tpu.formats import rmat


class TestChainVector:
    def test_chain_jit_layout_and_validation(self):
        # a fake pipeline with a known merged stream: the chain must
        # report k·nnz in lane 0 and the f32 checksums bitcast into
        # lanes 1-4, and _validate_vec must accept them
        import scipy.sparse as sp

        rows = np.array([0, 1, 2, 2], np.int32)
        cols = np.array([1, 0, 2, 3], np.int32)
        vals = np.array([1.5, -2.0, 3.0, 0.5], np.float32)
        valid = np.array([True, True, True, False])
        c_ref = sp.coo_matrix(
            (vals[valid], (rows[valid], cols[valid])), shape=(4, 4)
        ).tocsr()

        def make_once(bump_i, bump_f):
            r = jnp.asarray(rows) + bump_i
            v = jnp.asarray(vals) + bump_f
            m = jnp.asarray(valid)
            return (
                jnp.sum(m.astype(jnp.int32)),
                bench._stream_sums(r, jnp.asarray(cols), v, m),
            )

        for k in (1, 3):
            vec = np.asarray(bench._chain_jit(make_once, k)())
            assert vec.shape == (5,) and vec.dtype == np.int32
            nnz_ok, val_ok = bench._validate_vec(vec, k, c_ref)
            assert nnz_ok and val_ok
            # a perturbed reference must fail the checksum compare
            bad = c_ref.copy()
            bad.data = bad.data + 1.0
            nnz_ok, val_ok = bench._validate_vec(vec, k, bad)
            assert nnz_ok and not val_ok
            # nnz mismatch short-circuits
            nnz_ok, _ = bench._validate_vec(vec, k + 1, c_ref)
            assert not nnz_ok


class TestGatherCommonization:
    def test_multi_part_plans_share_one_signature(self):
        # the bench's dispatch sampler assumes every part of a plan hits
        # the same _part_device executable: statics + input shapes equal
        from outerspace_tpu.ops.gather_pipeline import plan_spgemm_gather

        g = rmat(13, edge_factor=8, seed=4)
        plan = plan_spgemm_gather(g.to_csc(), g.to_csr())
        if len(plan.parts) < 2:
            pytest.skip("workload did not row-partition")
        sigs = {
            (
                p.ngroups, p.b_win, p.merge_pad, p.max_run,
                tuple(p.dev["a_pack"].shape),
                tuple(p.dev["b_pack"].shape),
                tuple(p.dev["table"].shape),
                tuple(p.dev["bases"].shape),
            )
            for p in plan.parts
        }
        assert len(sigs) == 1

    @pytest.mark.slow
    def test_commonized_plan_is_exact(self):
        from outerspace_tpu.ops.gather_pipeline import (
            plan_spgemm_gather,
            spgemm_gather_padded,
        )
        from outerspace_tpu.ops.reference import (
            assert_csr_allclose,
            spgemm_scipy,
        )

        g = rmat(13, edge_factor=8, seed=4)
        plan = plan_spgemm_gather(g.to_csc(), g.to_csr())
        out = spgemm_gather_padded(plan)
        assert_csr_allclose(out.to_csr(), spgemm_scipy(g, g), rtol=1e-5)


class TestSizingCache:
    def test_store_lookup_roundtrip_with_schedules(self, tmp_path, monkeypatch):
        from outerspace_tpu.sched import sizing_cache

        monkeypatch.setenv(
            "OUTERSPACE_SIZING_CACHE", str(tmp_path / "c.json")
        )
        key = sizing_cache.workload_key(
            (np.arange(5, dtype=np.int32),), ("t", 1)
        )
        sizes = {
            "p_pad": 4096,
            "nnz_pad": 1024,
            "elem_pad": 4096,
            "p_pads": [8192, 4096, 4096],
        }
        sizing_cache.store(key, sizes)
        got = sizing_cache.lookup(key)
        assert got == sizes
        # a disabled schedule persists as an explicit None marker
        sizing_cache.store(key, dict(sizes, p_pads=None))
        assert sizing_cache.lookup(key)["p_pads"] is None
        # unsupported value types are rejected loudly on store ...
        with pytest.raises(ValueError):
            sizing_cache.store(key, {"p_pad": "huge"})
        # ... and silently dropped on lookup (corrupt file tolerance)
        import json

        path = str(tmp_path / "c.json")
        d = json.load(open(path))
        d[key]["p_pad"] = "corrupt"
        json.dump(d, open(path, "w"))
        got = sizing_cache.lookup(key)
        assert "p_pad" not in got and got["nnz_pad"] == 1024


class TestTunnelProbe:
    def test_probe_lands_within_cap(self, capsys):
        # healthy path: the compile lands inside the cap, the factor is
        # >= 1 and the diagnostic record is emitted
        d = bench._tunnel_probe(cap_s=120.0)
        assert d >= 1.0
        assert "tunnel_probe_compile_s" in capsys.readouterr().err

    def test_probe_capped_does_not_block(self, monkeypatch, capsys):
        # degraded path: the suite must proceed after cap_s with the
        # cap as the degrade seed instead of blocking for the whole
        # bad window (a 411.6 s blocking probe once left 85 s for the
        # entire suite)
        import time as _t

        monkeypatch.setattr(bench, "_sync_scalar", lambda x: _t.sleep(3.0))
        t0 = _t.perf_counter()
        d = bench._tunnel_probe(cap_s=0.3, healthy_s=0.1)
        assert _t.perf_counter() - t0 < 2.5  # returned at the cap
        assert d == pytest.approx(3.0)  # cap_s / healthy_s
        assert "tunnel_probe_inflight_s" in capsys.readouterr().err


class TestHeadline:
    def test_stalled_headline_attributes_stage(self, capsys):
        # the watchdog path names the in-flight stage so a thin capture
        # (total tunnel outage) is attributable from the one JSON line
        import json
        import threading

        bench._stage("rmat16_ef8")
        bench._print_headline([], threading.Event(), stalled=True)
        line = json.loads(capsys.readouterr().out.strip())
        assert line["records"] == 0 and line["value"] == 0.0
        assert line["stalled_in"] == "rmat16_ef8"
        assert line["stalled_for_s"] >= 0.0

    def test_normal_headline_has_no_stall_keys(self, capsys):
        import json
        import threading

        rec = dict(
            name="rmat14_ef8", speedup=20.0, nnz_exact=True,
            values_match=True,
        )
        bench._print_headline([rec], threading.Event())
        line = json.loads(capsys.readouterr().out.strip())
        assert line["records"] == 1 and line["value"] == 20.0
        assert "stalled_in" not in line


class TestSuiteLoop:
    """The r04 suite loop: prefetch-after-samples hook, ahead-only
    headliner reserves, skip bookkeeping — exercised with fake
    prepare/execute so no device or generator work runs."""

    def _patch(self, monkeypatch, deadline_s):
        import time as _t

        order = []
        monkeypatch.setattr(bench, "_tunnel_probe", lambda **k: 1.0)
        monkeypatch.setattr(bench, "_rpc_floor", lambda: 0.03)
        for gen_name in ("rmat", "erdos_renyi", "read_mtx"):
            monkeypatch.setattr(
                f"outerspace_tpu.formats.{gen_name}",
                lambda *a, **k: None,
            )
        monkeypatch.setattr(
            bench, "prepare_spgemm",
            lambda name, g, exact_check=False, force_strategy=None: {
                "name": name, "forced": force_strategy,
            },
        )

        def fake_exec(prep, on_sampled=None):
            if on_sampled is not None:
                on_sampled()
            order.append(prep["name"])
            return dict(
                name=prep["name"], speedup=20.0,
                nnz_exact=True, values_match=True,
            )

        monkeypatch.setattr(bench, "execute_spgemm", fake_exec)
        monkeypatch.setattr(bench, "_T0", _t.perf_counter())
        monkeypatch.setattr(bench, "_DEADLINE_S", deadline_s)
        monkeypatch.setitem(bench._CACHE, "enabled", False)
        monkeypatch.setitem(bench._CACHE, "hit", False)
        return order

    def test_ample_budget_runs_all_workloads(self, monkeypatch, capsys):
        order = self._patch(monkeypatch, deadline_s=10_000.0)
        results = bench.bench_spgemm_suite([])
        names = [r["name"] for r in results]
        assert names[:4] == [
            "rmat14_ef8", "er_100k_d1e-4", "rmat15_ef8", "rmat16_ef8",
        ]
        assert order == names  # every record came through execute

    def test_exhausted_budget_sheds_everything_after_first(
        self, monkeypatch, capsys
    ):
        # the FIRST workload always runs (the headline needs >=1
        # record); with no budget left the rest must emit skip records
        order = self._patch(monkeypatch, deadline_s=0.0)
        results = bench.bench_spgemm_suite([])
        assert [r["name"] for r in results] == ["rmat14_ef8"]
        err = capsys.readouterr().err
        assert err.count('"skipped"') >= 3
