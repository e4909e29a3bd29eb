"""Graph kernels + CLI drivers + config."""

import subprocess
import sys

import numpy as np
import pytest

from outerspace_tpu.config import Config
from outerspace_tpu.formats import COO, erdos_renyi, rmat, write_mtx
from outerspace_tpu.ops.graph import markov_cluster, mcl_clusters, triangle_count


def _triangle_oracle(coo: COO) -> int:
    d = coo.to_dense()
    d = ((d + d.T) != 0).astype(np.float64)
    np.fill_diagonal(d, 0)
    return int(round(np.trace(d @ d @ d) / 6))


class TestGraphKernels:
    @pytest.mark.parametrize("seed", range(3))
    def test_triangle_count(self, seed):
        g = erdos_renyi(60, 60, 0.08, seed=seed)
        assert triangle_count(g) == _triangle_oracle(g)

    def test_triangle_count_rmat(self):
        g = rmat(6, edge_factor=6, seed=9)
        assert triangle_count(g) == _triangle_oracle(g)

    @pytest.mark.parametrize("seed", range(2))
    def test_triangle_count_dense_mxu(self, seed):
        from outerspace_tpu.ops.graph import (
            _symmetrize_simple,
            triangle_count_dense,
        )

        g = erdos_renyi(80, 80, 0.06, seed=seed)
        sym = _symmetrize_simple(g)
        assert triangle_count_dense(sym) == _triangle_oracle(g)

    @pytest.mark.slow
    def test_triangle_strategies_agree(self):
        g = rmat(7, edge_factor=6, seed=3)
        want = _triangle_oracle(g)
        assert triangle_count(g, strategy="dense") == want
        assert triangle_count(g, strategy="sparse") == want

    def test_triangle_strategy_selector(self):
        from outerspace_tpu.ops.graph import (
            _symmetrize_simple,
            _triangle_strategy,
        )

        # Power-law graph at modest n: the MXU route must win.
        sym = _symmetrize_simple(rmat(10, edge_factor=8, seed=1))
        assert _triangle_strategy(sym) == "dense"
        # Past the HBM bitmap envelope: must fall back to sparse.
        big = COO(
            (50_000, 50_000),
            np.array([0, 1]), np.array([1, 2]), np.ones(2, np.float32),
        )
        assert _triangle_strategy(_symmetrize_simple(big)) == "sparse"

    @pytest.mark.slow
    def test_triangle_no_triangles(self):
        # A path graph has zero triangles.
        n = 16
        g = COO((n, n), np.arange(n - 1), np.arange(1, n),
                np.ones(n - 1, np.float32))
        assert triangle_count(g) == 0

    def test_mcl_two_blobs(self):
        # Two disconnected cliques must yield two clusters.
        n = 12
        d = np.zeros((n, n), dtype=np.float32)
        d[:6, :6] = 1.0
        d[6:, 6:] = 1.0
        np.fill_diagonal(d, 0)
        g = COO.from_dense(d)
        flow = markov_cluster(g, iters=8)
        clusters = mcl_clusters(flow)
        assert len(clusters) == 2
        sizes = sorted(len(c) for c in clusters)
        assert sizes == [6, 6]

    def test_mcl_backends_agree(self):
        g = erdos_renyi(24, 24, 0.15, seed=4)
        f1 = markov_cluster(g, iters=4, backend="tpu")
        f2 = markov_cluster(g, iters=4, backend="scipy")
        assert f1.nnz == f2.nnz
        np.testing.assert_allclose(
            f1.to_dense(), f2.to_dense(), rtol=1e-4, atol=1e-5
        )


class TestConfig:
    def test_override(self):
        c = Config().override(["tile_a=16", "waste_limit=3.5"])
        assert c.tile_a == 16 and c.waste_limit == 3.5

    def test_unknown_key_raises(self):
        with pytest.raises(KeyError):
            Config().override(["bogus=1"])

    def test_tuple_override(self):
        c = Config().override(["mesh_shape=2,4"])
        assert c.mesh_shape == (2, 4)


class TestCLI:
    def _run(self, *argv):
        return subprocess.run(
            [sys.executable, "-m", "outerspace_tpu.cli", *argv],
            capture_output=True,
            text=True,
            timeout=600,
            env={
                **__import__("os").environ,
                "JAX_PLATFORMS": "cpu",
                "OUTERSPACE_FORCE_CPU": "1",
            },
        )

    @pytest.mark.slow
    def test_spgemm_cli(self, tmp_path):
        a = erdos_renyi(50, 50, 0.1, seed=1)
        b = erdos_renyi(50, 50, 0.1, seed=2)
        pa, pb = str(tmp_path / "a.mtx"), str(tmp_path / "b.mtx")
        write_mtx(pa, a)
        write_mtx(pb, b)
        out = self._run("spgemm", pa, pb, "--no-transpose")
        assert out.returncode == 0, out.stderr
        assert "GFlops:" in out.stdout and "nnz:" in out.stdout
        # act·Wᵀ contract: default transposes matrix 2.
        out_t = self._run("spgemm", pa, pb)
        assert out_t.returncode == 0, out_t.stderr

    @pytest.mark.slow
    def test_spgemm_cli_writes_result(self, tmp_path):
        from outerspace_tpu.formats import read_mtx
        from outerspace_tpu.ops.reference import spgemm_scipy, compare_coo

        a = erdos_renyi(30, 30, 0.15, seed=3)
        pa = str(tmp_path / "a.mtx")
        po = str(tmp_path / "c.mtx")
        write_mtx(pa, a)
        out = self._run("spgemm", pa, pa, "--no-transpose", "--out", po)
        assert out.returncode == 0, out.stderr
        got = read_mtx(po, native=False)
        ref = spgemm_scipy(a, a).to_coo()
        assert compare_coo(got, ref, eps=1e-5)

    @pytest.mark.slow
    def test_spgemm_cli_sharded_mesh(self, tmp_path):
        # --mesh KX,NY runs the SPMD pipeline under shard_map over a
        # virtual device mesh and must match scipy elementwise.
        from outerspace_tpu.formats import read_mtx
        from outerspace_tpu.ops.reference import spgemm_scipy, compare_coo

        a = erdos_renyi(60, 60, 0.12, seed=6)
        pa = str(tmp_path / "a.mtx")
        po = str(tmp_path / "c.mtx")
        write_mtx(pa, a)
        out = subprocess.run(
            [sys.executable, "-m", "outerspace_tpu.cli", "spgemm",
             pa, pa, "--no-transpose", "--mesh", "2,2", "--out", po],
            capture_output=True, text=True, timeout=600,
            env={
                **__import__("os").environ,
                "JAX_PLATFORMS": "cpu",
                "OUTERSPACE_FORCE_CPU": "1",
                "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
            },
        )
        assert out.returncode == 0, out.stderr
        assert "mesh: 2x2 over 4 devices" in out.stdout
        # dual-model contract for the sharded machine: the plan-aware
        # roofline AND the C++ event model print beside the measurement
        # (SimOuterSPACE.cpp:859-875 always printed both models)
        assert "analytical sharded (roofline):" in out.stdout
        assert "event-model sharded:" in out.stdout
        got = read_mtx(po, native=False)
        ref = spgemm_scipy(a, a).to_coo()
        assert compare_coo(got, ref, eps=1e-5)

    def test_spgemm_cli_mesh_device_mismatch(self, tmp_path):
        a = erdos_renyi(10, 10, 0.2, seed=4)
        pa = str(tmp_path / "a.mtx")
        write_mtx(pa, a)
        out = self._run("spgemm", pa, pa, "--no-transpose",
                        "--mesh", "16,16")
        assert out.returncode == 2
        assert "devices" in out.stderr

    def test_spgemm_cli_mesh_malformed(self, tmp_path, capsys):
        # the natural typo ("2x2", the format the mismatch message
        # itself prints) must take the friendly exit-2 path, not an
        # uncaught ValueError traceback; same for a third dimension.
        # In-process (main() returns the exit code): the validation is
        # pre-compute, so subprocess startup would be all the test paid.
        from outerspace_tpu import cli

        a = erdos_renyi(10, 10, 0.2, seed=4)
        pa = str(tmp_path / "a.mtx")
        write_mtx(pa, a)
        for bad in ("2x2", "2,2,2", "0,4", "-1"):
            rc = cli.main(["spgemm", pa, pa, "--no-transpose",
                           "--mesh", bad])
            err = capsys.readouterr().err
            assert rc == 2, (bad, err)
            assert "bad --mesh" in err, (bad, err)

    def test_spgemm_cli_dim_mismatch(self, tmp_path):
        a = erdos_renyi(10, 20, 0.2, seed=4)
        b = erdos_renyi(30, 30, 0.2, seed=5)
        pa, pb = str(tmp_path / "a.mtx"), str(tmp_path / "b.mtx")
        write_mtx(pa, a)
        write_mtx(pb, b)
        out = self._run("spgemm", pa, pb, "--no-transpose")
        assert out.returncode == 2
        assert "mismatch" in out.stderr

    @pytest.mark.slow
    def test_nn_cli_train_synthetic(self, tmp_path):
        saved = str(tmp_path / "model.pkl")
        out = self._run(
            "nn", "--mode", "train", "--num_epochs", "1",
            "--batch_size", "256", "--data", "synthetic",
            "--saved_model_name", saved,
        )
        assert out.returncode == 0, out.stderr
        assert "test_acc=" in out.stdout
        out2 = self._run(
            "nn", "--mode", "prune", "--data", "synthetic",
            "--load_model_name", saved, "--sparsity_level", "0.2",
        )
        assert out2.returncode == 0, out2.stderr
        assert "nnz=" in out2.stdout

    @pytest.mark.parametrize(
        "name",
        [
            "rmat10_ef8",
            pytest.param("band2048_p5", marks=pytest.mark.slow),
            pytest.param("mesh2d_48", marks=pytest.mark.slow),
        ],
    )
    def test_committed_fixtures_a2(self, name):
        """The committed SuiteSparse-style fixtures (power-law, banded,
        2-D mesh) flow through the file→CSC/CSR→A² path exactly."""
        import os

        from outerspace_tpu.formats import read_mtx
        from outerspace_tpu.ops.reference import spgemm_scipy, assert_csr_allclose
        from outerspace_tpu.ops.spgemm import spgemm

        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "data", "mtx", f"{name}.mtx",
        )
        g = read_mtx(path)
        assert_csr_allclose(spgemm(g, g), spgemm_scipy(g, g), rtol=1e-5)

    def test_graph_cli(self, tmp_path):
        g = erdos_renyi(40, 40, 0.1, seed=6)
        p = str(tmp_path / "g.mtx")
        write_mtx(p, g)
        out = self._run("graph", "triangles", p, "--backend", "scipy")
        assert out.returncode == 0, out.stderr
        assert "triangles:" in out.stdout

    @pytest.mark.slow
    def test_graph_cli_triangles_mesh(self, tmp_path):
        # mesh-composed sharded triangle kernel from the CLI; count
        # must match the scipy backend exactly
        import subprocess as _sp

        g = erdos_renyi(48, 48, 0.12, seed=6)
        p = str(tmp_path / "g.mtx")
        write_mtx(p, g)
        ref = self._run("graph", "triangles", p, "--backend", "scipy")
        assert ref.returncode == 0, ref.stderr
        n_ref = int(ref.stdout.split("triangles:")[1].split("(")[0])
        out = _sp.run(
            [sys.executable, "-m", "outerspace_tpu.cli",
             "graph", "triangles", p, "--mesh", "2,2"],
            capture_output=True, text=True, timeout=600,
            env={
                **__import__("os").environ,
                "JAX_PLATFORMS": "cpu",
                "OUTERSPACE_FORCE_CPU": "1",
                "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
            },
        )
        assert out.returncode == 0, out.stderr
        assert f"triangles (mesh 2x2): {n_ref}" in out.stdout

    def test_graph_cli_mcl_mesh_device_loop(self, tmp_path):
        # --loop device: the WHOLE MCL loop device-resident under
        # shard_map (shard/mcl.py); cluster count must match the host
        # backend on the same mesh
        import subprocess as _sp

        g = erdos_renyi(24, 24, 0.15, seed=4)
        p = str(tmp_path / "g.mtx")
        write_mtx(p, g)
        env = {
            **__import__("os").environ,
            "JAX_PLATFORMS": "cpu",
            "OUTERSPACE_FORCE_CPU": "1",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
        }
        ref = _sp.run(
            [sys.executable, "-m", "outerspace_tpu.cli",
             "graph", "mcl", p, "--mesh", "2,2", "--iters", "3"],
            capture_output=True, text=True, timeout=600, env=env,
        )
        assert ref.returncode == 0, ref.stderr
        n_ref = int(ref.stdout.split("host loop):")[1].split("clusters")[0])
        out = _sp.run(
            [sys.executable, "-m", "outerspace_tpu.cli",
             "graph", "mcl", p, "--mesh", "2,2", "--iters", "3",
             "--loop", "device"],
            capture_output=True, text=True, timeout=600, env=env,
        )
        assert out.returncode == 0, out.stderr
        assert f"mcl (mesh 2x2, device loop): {n_ref} clusters" in out.stdout

    def test_predict_cli_dual_model(self, tmp_path):
        # capacity planning without a device: both models print for an
        # arbitrary mesh size (no device count requirement)
        a = erdos_renyi(40, 40, 0.1, seed=6)
        p = str(tmp_path / "g.mtx")
        write_mtx(p, a)
        out = self._run("predict", p, p, "--no-transpose", "--mesh", "8")
        assert out.returncode == 0, out.stderr
        assert "analytical sharded (roofline):" in out.stdout
        assert "event-model sharded:" in out.stdout
        assert "mesh 8x1" in out.stdout

    def test_predict_cli_bad_mesh(self, tmp_path):
        a = erdos_renyi(10, 10, 0.2, seed=4)
        p = str(tmp_path / "g.mtx")
        write_mtx(p, a)
        out = self._run("predict", p, p, "--mesh", "2x2")
        assert out.returncode == 2
        assert "bad --mesh" in out.stderr
