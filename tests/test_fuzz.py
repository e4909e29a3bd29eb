"""Property-based sweep: random operand configurations through every
SpGEMM strategy vs the scipy oracle. The cheap CPU analogue of the
reference's cross-checking-by-redundancy (it always ran two models)."""

import numpy as np
import pytest

# Fuzzing is the opt-in deep-check tier: ~6 min of interpret-mode
# Pallas on CPU. CI-speed default skips it (conftest slow marker).
pytestmark = pytest.mark.slow

from outerspace_tpu.formats import COO, erdos_renyi, rmat
from outerspace_tpu.ops.reference import assert_csr_allclose, spgemm_scipy
from outerspace_tpu.ops.spgemm import spgemm

RNG = np.random.default_rng(20260816)


def _random_case(i: int):
    kind = i % 4
    seed = 1000 + i
    if kind == 0:  # square ER, varying density
        n = int(RNG.integers(8, 200))
        d = float(RNG.uniform(0.01, 0.4))
        return erdos_renyi(n, n, d, seed=seed), erdos_renyi(
            n, n, d, seed=seed + 1
        )
    if kind == 1:  # rectangular chain
        m, k, n = (int(x) for x in RNG.integers(4, 150, 3))
        return (
            erdos_renyi(m, k, float(RNG.uniform(0.02, 0.3)), seed=seed),
            erdos_renyi(k, n, float(RNG.uniform(0.02, 0.3)), seed=seed + 1),
        )
    if kind == 2:  # power-law squared
        g = rmat(int(RNG.integers(3, 8)), edge_factor=int(RNG.integers(2, 12)),
                 seed=seed)
        return g, g
    # hypersparse / degenerate shapes
    m, n = (int(x) for x in RNG.integers(1, 64, 2))
    k = int(RNG.integers(1, 64))
    nnz_a = int(RNG.integers(0, max(m * k // 4, 1) + 1))
    nnz_b = int(RNG.integers(0, max(k * n // 4, 1) + 1))
    rng = np.random.default_rng(seed)

    def rand_coo(rr, cc, nnz):
        if nnz == 0:
            e = np.zeros(0, np.int32)
            return COO((rr, cc), e, e, np.zeros(0, np.float32))
        lin = rng.choice(rr * cc, size=min(nnz, rr * cc), replace=False)
        return COO(
            (rr, cc),
            (lin // cc).astype(np.int32),
            (lin % cc).astype(np.int32),
            rng.standard_normal(len(lin)).astype(np.float32),
        )

    return rand_coo(m, k, nnz_a), rand_coo(k, n, nnz_b)


@pytest.mark.parametrize("i", range(24))
def test_fuzz_spgemm(i):
    a, b = _random_case(i)
    ref = spgemm_scipy(a, b)
    # rotate strategies across cases: full coverage over the sweep
    # without paying every interpreted pipeline on every case
    strategy = ("flat", "tiles", "gather")[i % 3]
    got = spgemm(a, b, strategy=strategy, interpret=True)
    assert_csr_allclose(got, ref, rtol=2e-5, atol=1e-5)


def _hub_case(seed: int, wide: bool):
    """High-skew operands exercising the trim-and-chunk machinery:
    a few hub columns/rows (B rows far wider than the gather window)
    plus a misaligned light tail."""
    rng = np.random.default_rng(seed)
    k, m, n = 96, 300, 500
    rows_a, cols_a, rows_b, cols_b = [], [], [], []
    for h in rng.choice(k, 4, replace=False):
        na = int(rng.integers(40, 200))
        rr = rng.choice(m, na, replace=False)
        rows_a.append(rr)
        cols_a.append(np.full(na, h))
        nb = int(rng.integers(300, 480)) if wide else int(rng.integers(60, 200))
        cc = rng.choice(n, nb, replace=False)
        rows_b.append(np.full(nb, h))
        cols_b.append(cc)
    # light residue with odd per-row lengths (misaligned flat starts)
    for kk in range(k):
        nb = int(rng.integers(0, 7))
        if nb:
            rows_b.append(np.full(nb, kk))
            cols_b.append(rng.choice(n, nb, replace=False))
        na = int(rng.integers(0, 4))
        if na:
            rows_a.append(rng.choice(m, na, replace=False))
            cols_a.append(np.full(na, kk))

    def build(shape, rr, cc):
        rr = np.concatenate(rr).astype(np.int32)
        cc = np.concatenate(cc).astype(np.int32)
        lin = rr.astype(np.int64) * shape[1] + cc
        _, keep = np.unique(lin, return_index=True)
        return COO(
            shape, rr[keep], cc[keep],
            rng.standard_normal(len(keep)).astype(np.float32),
        )

    return build((m, k), rows_a, cols_a), build((k, n), rows_b, cols_b)


@pytest.mark.parametrize("wide", [False, True])
@pytest.mark.parametrize("strategy", ["tiles", "gather"])
def test_fuzz_trim_and_chunk_hubs(wide, strategy):
    a, b = _hub_case(7 + int(wide), wide)
    got = spgemm(a, b, strategy=strategy, interpret=True)
    assert_csr_allclose(got, spgemm_scipy(a, b), rtol=2e-5, atol=1e-5)


@pytest.mark.parametrize("i", range(24, 32))
def test_fuzz_sharded(i):
    import jax

    from outerspace_tpu.shard import make_mesh, shard_plan, spgemm_sharded
    from outerspace_tpu.shard.spgemm_sharded import sharded_result_to_csr

    a, b = _random_case(i)
    if a.nnz == 0 or b.nnz == 0:
        return
    mesh = make_mesh((8,), ("x",))
    plan = shard_plan(a.to_csc(), b.to_csr(), 8)
    got = sharded_result_to_csr(plan, spgemm_sharded(plan, mesh))
    assert_csr_allclose(got, spgemm_scipy(a, b), rtol=2e-5, atol=1e-5)
