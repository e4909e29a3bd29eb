"""Graph kernels on repeated SpGEMM: triangle counting + Markov clustering.

``BASELINE.json`` configs[3]: "Graph kernels: triangle counting +
Markov-clustering iterations via repeated A^2". Both are classic
SpGEMM-bound workloads (the OuterSPACE paper's own evaluation suite used
them); they chain the TPU pipeline output back into new plans.
"""

from __future__ import annotations

import numpy as np

from outerspace_tpu.formats.coo import COO
from outerspace_tpu.formats.csr import CSR
from outerspace_tpu.ops.spgemm import spgemm


def triangle_count(
    adj: COO | CSR, backend: str = "tpu", strategy: str = "auto"
) -> int:
    """Count triangles in an undirected simple graph.

    tri = Σᵢⱼ (A² ∘ A) / 6 for a symmetric 0/1 adjacency without
    self-loops (each triangle counted twice per vertex ordering).

    ``strategy`` (TPU backend): "dense" routes through the MXU
    (blocked bf16 A·A with fused edge masking — exact for 0/1
    adjacencies, see :func:`triangle_count_dense`), "sparse" through
    the SpGEMM pipeline + edge-bitmap Hadamard, "auto" picks by a
    FLOP/stream cost model (:func:`_triangle_strategy`).
    """
    a = adj if isinstance(adj, CSR) else adj.to_csr()
    sym = _symmetrize_simple(a.to_coo())
    n = sym.shape[1]
    if backend == "tpu" and strategy == "auto":
        strategy = _triangle_strategy(sym)
    if backend == "tpu" and strategy == "dense":
        # A forced dense route must still satisfy the exactness envelope
        # (int32 accumulator bound + HBM size) — fail loudly, never
        # silently wrap (the auto route checks these in the selector).
        if not _dense_triangle_safe(sym):
            raise ValueError(
                "dense triangle route unsafe here (n > 32768 or the "
                "Σ(A²∘A) int32 bound is not provable); use "
                "strategy='sparse' or 'auto'"
            )
        return triangle_count_dense(sym)
    if backend == "tpu" and sym.shape[0] * n < 2**31:
        prep = triangle_prepare(sym)
        return triangle_count_device(prep)
    if backend == "tpu":
        a2 = spgemm(sym, sym)
    else:
        from outerspace_tpu.ops.reference import spgemm_scipy

        a2 = spgemm_scipy(sym, sym)
    # Hadamard with A: sum A²[i,j] over edges (i,j).
    s = a2.to_scipy().tocsr()
    mask = sym.to_scipy().tocsr()
    total = float(s.multiply(mask).sum())
    return int(round(total / 6.0))


def _symmetrize_simple(coo: COO) -> COO:
    """Binarise + symmetrise + drop the diagonal (simple-graph adjacency)."""
    keep = coo.row != coo.col
    coo = COO(
        coo.shape,
        coo.row[keep],
        coo.col[keep],
        np.ones(int(keep.sum()), dtype=np.float32),
    )
    sym = COO(
        coo.shape,
        np.concatenate([coo.row, coo.col]),
        np.concatenate([coo.col, coo.row]),
        np.concatenate([coo.val, coo.val]),
    ).deduplicated()
    return COO(sym.shape, sym.row, sym.col, np.ones(sym.nnz, dtype=np.float32))


def _dense_triangle_safe(sym: COO) -> bool:
    """Exactness envelope of the dense-MXU route: padded bitmap fits HBM
    and Σ(A²∘A) ≤ Σ_edges min(deg_i, deg_j) < 2³¹ (int32 accumulator)."""
    n = max(sym.shape[0], sym.shape[1])
    if -(-n // 256) * 256 > 32768:
        return False
    deg = np.bincount(sym.row, minlength=sym.shape[0]).astype(np.int64)
    return np.minimum(deg[sym.row], deg[sym.col]).sum() < 2**31


def _triangle_strategy(sym: COO) -> str:
    """Pick dense-MXU vs sparse-pipeline triangle counting.

    The dense route does 2·n³ MAC on the MXU (the TPU's 100+ TFLOP/s
    engine); the sparse route streams P = Σ deg² products through the
    expand+sort pipeline at ~2 ns/product on the VPU. For the typical
    power-law graph at n ≤ 2¹⁴ the MXU wins by an order of magnitude
    despite doing 100×+ more FLOPs — that asymmetry IS the TPU design
    point. Dense requires: the padded bitmap fits HBM (n ≤ 32768 →
    ≤ 2 GiB bf16), and the Σ(A²∘A) total provably fits int32 (bounded
    by Σ_edges min(deg_i, deg_j), checked exactly on host).
    """
    if not _dense_triangle_safe(sym):
        return "sparse"
    n = max(sym.shape[0], sym.shape[1])
    n_pad = -(-n // 256) * 256
    deg = np.bincount(sym.row, minlength=sym.shape[0]).astype(np.int64)
    dense_s = 2.0 * float(n_pad) ** 3 / 100e12  # MXU bf16 @ ~50% eff
    sparse_s = float((deg * deg).sum()) * 2.0e-9  # expand+sort+bitmap sum
    return "dense" if dense_s < sparse_s else "sparse"


def triangle_count_dense(sym: COO, block: int = 2048) -> int:
    """Σ(A²∘A)/6 via blocked dense bf16 matmuls on the MXU.

    Exactness: adjacency entries are 0/1 (exact in bf16), each MXU dot
    accumulates ≤ n ≤ 32768 < 2²⁴ unit products in f32 (exact), the
    masked per-entry counts are integers < 2²⁴ (exact f32→int32 cast),
    and the grand total is accumulated in int32 (caller guarantees
    Σ(A²∘A) < 2³¹ via :func:`_triangle_strategy`'s degree bound).

    The adjacency is scattered into the padded dense form *on device*
    from the edge list (the tunnel link is too slow to ship n² bytes);
    A² is never materialised — each row block is matmul'd, masked by
    the same block of A, and reduced in one fused XLA loop body.
    """
    import jax.numpy as jnp

    n = max(sym.shape[0], sym.shape[1])
    n_pad = -(-n // 256) * 256
    block = min(block, n_pad)
    while n_pad % block:
        block //= 2
    total = _tri_dense_jit(
        jnp.asarray(sym.row.astype(np.int32)),
        jnp.asarray(sym.col.astype(np.int32)),
        jnp.int32(0),
        n_pad=n_pad,
        block=block,
    )
    return int(np.asarray(total)) // 6


def _make_tri_dense():
    import functools

    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnames=("n_pad", "block"))
    def tri_dense(rows, cols, bump_i, *, n_pad: int, block: int):
        one = (jnp.int32(1) + bump_i).astype(jnp.bfloat16)
        dense = (
            jnp.zeros((n_pad, n_pad), jnp.bfloat16)
            .at[rows, cols]
            .set(one, mode="drop")
        )

        def body(i, tot):
            blk = jax.lax.dynamic_slice(
                dense, (i * block, 0), (block, n_pad)
            )
            c = jnp.dot(blk, dense, preferred_element_type=jnp.float32)
            masked = c * blk.astype(jnp.float32)
            return tot + jnp.sum(masked.astype(jnp.int32))

        return jax.lax.fori_loop(0, n_pad // block, body, jnp.int32(0))

    return tri_dense


_tri_dense_jit = _make_tri_dense()


def triangle_prepare(sym: COO):
    """Stage the device-resident triangle pipeline: symbolic plan + task
    tables + A's packed keys shipped once. Returns an opaque prep tuple
    for ``triangle_count_device`` (amortised across repeated counts /
    timing reps — transfers over slow links dominate otherwise)."""
    import jax.numpy as jnp

    from outerspace_tpu.ops.spgemm import plan_tiled

    n = sym.shape[1]
    assert sym.shape[0] * n < 2**31, "packed-key path requires m*n < 2^31"
    tplan = plan_tiled(sym.to_csc(), sym.to_csr())
    # Dense edge bitmap: membership becomes a single gather per A²
    # entry instead of a 25-step binary search.
    n_words = -(-n // 32)
    bitmap = _edge_bitmap(sym.row, sym.col, sym.shape[0], n_words)
    bitmap_dev = jnp.asarray(bitmap.view(np.int32))
    return (tplan, bitmap_dev, n, n_words)


def triangle_count_device(prep) -> int:
    """A² (device) + Hadamard-with-A via the edge bitmap (one gather per
    A² entry); only the scalar total crosses back to host."""
    from outerspace_tpu.ops.spgemm import spgemm_padded_tiled

    tplan, bitmap_dev, n, n_words = prep
    merged = spgemm_padded_tiled(tplan)
    total = _tri_sum_jit(
        merged.rows, merged.cols, merged.vals, merged.valid, bitmap_dev,
        n_words=n_words,
    )
    return int(round(float(np.asarray(total)) / 6.0))


def _mcl_setup(coo: COO) -> CSR:
    """MCL preamble shared by every backend: self loops (standard MCL)
    + column normalisation."""
    n = coo.shape[0]
    assert coo.shape[0] == coo.shape[1], "adjacency must be square"
    m = COO(
        coo.shape,
        np.concatenate([coo.row, np.arange(n, dtype=coo.row.dtype)]),
        np.concatenate([coo.col, np.arange(n, dtype=coo.col.dtype)]),
        np.concatenate([np.abs(coo.val), np.ones(n, dtype=np.float32)]),
    ).deduplicated()
    return _col_normalize(m.to_csr())


def _mcl_inflate_prune(
    expanded: CSR, inflation: float, prune_threshold: float
) -> CSR:
    """One MCL inflation step (elementwise power + prune + column
    renormalise), shared by the host-loop backends."""
    c = expanded.to_coo()
    v = np.power(np.maximum(c.val, 0.0), inflation)
    keep = v > prune_threshold
    return _col_normalize(
        COO(c.shape, c.row[keep], c.col[keep], v[keep]).to_csr()
    )


def _edge_bitmap(rows, cols, nrows_pad: int, n_words: int) -> np.ndarray:
    """Dense edge bitmap (1 bit per (i, j)) — membership becomes one
    gather per A² entry; shared by the single-chip and sharded
    triangle kernels."""
    bitmap = np.zeros(nrows_pad * n_words, dtype=np.uint32)
    word = rows.astype(np.int64) * n_words + (cols >> 5)
    bit = np.uint32(1) << (cols.astype(np.uint32) & np.uint32(31))
    np.bitwise_or.at(bitmap, word, bit)
    return bitmap


def _resolve_mesh_dims(mesh, kx, ny, axes):
    """(kx, ny, ax, ay) for a mesh-composed kernel. kx defaults only
    on 1-D meshes — on a multi-axis mesh a flattened kx would be
    sharded over the first axis alone (wrong blocks). Explicit kx/ny
    are validated against the mesh's actual axis sizes so a mismatch
    fails HERE with a clear message, not later inside shard_map with
    an opaque shape/spec error (the CLI validates; the library API
    must too)."""
    if kx is None:
        if len(mesh.axis_names) != 1:
            raise ValueError(
                "multi-axis mesh needs explicit kx/ny (e.g. kx=4, ny=2)"
            )
        kx = int(mesh.shape[mesh.axis_names[0]])
        ny = 1
    if isinstance(axes, str):
        axes = (axes, None)
    ax = axes[0]
    ay = axes[1] if len(axes) > 1 else None
    if ax not in mesh.axis_names:
        raise ValueError(f"mesh has no axis {ax!r} (axes: {mesh.axis_names})")
    if int(mesh.shape[ax]) != kx:
        raise ValueError(
            f"kx={kx} != mesh axis {ax!r} size {int(mesh.shape[ax])}"
        )
    if ny > 1:
        if ay is None or ay not in mesh.axis_names:
            raise ValueError(
                f"ny={ny} needs a second mesh axis (axes: {mesh.axis_names})"
            )
        if int(mesh.shape[ay]) != ny:
            raise ValueError(
                f"ny={ny} != mesh axis {ay!r} size {int(mesh.shape[ay])}"
            )
    return kx, ny, ax, ay


def markov_cluster_sharded(
    adj: COO | CSR,
    mesh,
    axes: tuple[str, str] | str = ("x", "y"),
    kx: int | None = None,
    ny: int = 1,
    expansion: int = 2,
    inflation: float = 2.0,
    iters: int = 10,
    prune_threshold: float = 1e-4,
) -> CSR:
    """Markov clustering with every expansion squaring on the device
    mesh: per iteration the current flow matrix is re-planned on host
    and its power runs as the sharded SPMD program (per-device Pallas
    expand, owner-keyed all_to_all, key-range-partitioned merges —
    ``shard/tiled.py``); inflation, pruning and column renormalisation
    are nnz-scale host elementwise passes between squarings. Matches
    :func:`markov_cluster`'s semantics exactly (same self-loop +
    normalisation preamble, same convergence test); the single-chip
    fused-loop path (``ops/chain.py``) remains the production
    single-device kernel — this is its scale-out counterpart for flow
    matrices larger than one chip's HBM."""
    from outerspace_tpu.shard.tiled import (
        shard_plan_tiled,
        sharded_tiled_to_csr,
        spgemm_sharded_tiled,
    )

    coo = adj.to_coo() if not isinstance(adj, COO) else adj
    kx, ny, ax, ay = _resolve_mesh_dims(mesh, kx, ny, axes)
    flow = _mcl_setup(coo)

    def mult_sharded(a: CSR, b: CSR) -> CSR:
        plan = shard_plan_tiled(a.to_csc(), b, kx=kx, ny=ny)
        out = spgemm_sharded_tiled(
            plan, mesh, axes=ax if ny == 1 else (ax, ay)
        )
        return sharded_tiled_to_csr(plan, out)

    for _ in range(iters):
        expanded = flow
        for _ in range(expansion - 1):
            expanded = mult_sharded(expanded, flow)
        new_flow = _mcl_inflate_prune(expanded, inflation, prune_threshold)
        if _converged(flow, new_flow):
            return new_flow
        flow = new_flow
    return flow


def triangle_count_sharded(
    adj: COO | CSR,
    mesh,
    axes: tuple[str, str] | str = ("x", "y"),
    kx: int | None = None,
    ny: int = 1,
) -> int:
    """Triangle counting over a device mesh: the sharded SpGEMM program
    (per-device Pallas expand, owner-keyed all_to_all, partitioned
    merges — ``shard/tiled.py``) computes A² row-sharded along the k/x
    axis, then a second shard_map stage does the Hadamard-with-A
    membership test AGAINST A'S EDGE BITMAP SHARDED THE SAME WAY — each
    device holds only its own row-range's bitmap slice (the exchange
    already routed every A² entry to its row owner, so membership is a
    purely local gather), and only per-device partial sums cross back.
    Multi-chip composition of the single-chip
    :func:`triangle_count_device`; exact vs the scipy oracle on CPU
    meshes (``tests/test_sharded.py``).
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from outerspace_tpu.shard.tiled import build_sharded_tiled, shard_plan_tiled

    coo = adj if isinstance(adj, COO) else adj.to_coo()
    sym = _symmetrize_simple(coo)
    kx, ny, ax, ay = _resolve_mesh_dims(mesh, kx, ny, axes)
    plan = shard_plan_tiled(sym.to_csc(), sym.to_csr(), kx=kx, ny=ny)
    sharded, args = build_sharded_tiled(
        plan, mesh, axes=ax if ny == 1 else (ax, ay)
    )

    # Edge bitmap sharded by owner-row block along x (each device tests
    # membership only for rows it owns), all columns per slice.
    n = plan.n
    n_words = -(-n // 32)
    rows_pad = plan.kx * plan.rows_per_x
    bitmap = _edge_bitmap(sym.row, sym.col, rows_pad, n_words)
    bm = jnp.asarray(
        bitmap.view(np.int32).reshape(plan.kx, plan.rows_per_x * n_words)
    )

    spec = P(ax, ay) if ny > 1 else P(ax)
    bm_spec = P(ax, None)
    out_spec = P(ax, ay) if ny > 1 else P(ax)
    rows_per_x = plan.rows_per_x

    def local_tri(mr, mc, mv, mvalid, bmv):
        rows = mr.reshape(-1)
        cols = mc.reshape(-1)
        vals = mv.reshape(-1)
        valid = mvalid.reshape(-1)
        base = jax.lax.axis_index(ax).astype(jnp.int32) * jnp.int32(
            rows_per_x
        )
        w_idx = jnp.where(
            valid, (rows - base) * np.int32(n_words) + (cols >> 5), 0
        )
        w = bmv.reshape(-1)[w_idx]
        member = valid & (((w >> (cols & 31)) & 1) != 0)
        s = jnp.sum(jnp.where(member, vals, 0.0))
        return s.reshape((1, 1) if ny > 1 else (1,))

    tri_stage = shard_map(
        local_tri,
        mesh=mesh,
        in_specs=(spec, spec, spec, spec, bm_spec),
        out_specs=out_spec,
        check_rep=False,
    )

    @jax.jit
    def program(*a):
        mr, mc, mv, mvalid, _nnz = sharded(*a[:-1])
        return tri_stage(mr, mc, mv, mvalid, a[-1])

    with mesh:
        partials = program(*args, bm)
    return int(round(float(np.asarray(partials).sum()) / 6.0))


def _make_tri_sum():
    import functools

    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnames=("n_words",))
    def tri_sum(rows, cols, vals, valid, bitmap, *, n_words: int):
        word = jnp.where(valid, rows * np.int32(n_words) + (cols >> 5), 0)
        w = bitmap[word]
        member = valid & (((w >> (cols & 31)) & 1) != 0)
        return jnp.sum(jnp.where(member, vals, 0.0))

    return tri_sum


_tri_sum_jit = _make_tri_sum()


def markov_cluster(
    adj: COO | CSR,
    expansion: int = 2,
    inflation: float = 2.0,
    iters: int = 10,
    prune_threshold: float = 1e-4,
    backend: str = "tpu",
    report: dict | None = None,
) -> CSR:
    """Markov Clustering (MCL): alternate expansion (matrix power via
    repeated SpGEMM) and inflation (elementwise power + column
    renormalisation + pruning) until the flow matrix stabilises.

    Returns the final flow matrix; clusters are the rows with mass
    (attractors).
    """
    coo = adj.to_coo() if not isinstance(adj, COO) else adj
    n = coo.shape[0]
    flow = _mcl_setup(coo)

    if iters <= 0:
        return flow
    # strictly < 2^32: the device chain's CSC-reorder keys cannot
    # represent the (n-1, n-1) corner at exactly 2^32 (the plain A@B
    # pipeline CAN — its merge recovers the corner exactly)
    if backend == "tpu" and expansion == 2 and n * n < 2**32:
        prep = mcl_prepare(
            flow, inflation=inflation, iters=iters,
            prune_threshold=prune_threshold,
        )
        # Snapshot budgets BEFORE the run: mcl_run's ok-violation
        # fallback doubles them for the NEXT call, and the doubled
        # values describe buffers no run used — reporting them would
        # corrupt the analytical-vs-measured cross-check.
        budgets = {k: prep.get(k)
                   for k in ("p_pad", "p_pads", "elem_pad", "nnz_pad")}
        out = mcl_run(prep)
        if report is not None:
            # staged budgets for the caller's analytical cross-check
            # (the graph CLI prints predicted next to measured — the
            # reference's always-print-both-models contract)
            fell_back = prep.get("p_pad") != budgets["p_pad"]
            report.update(
                budgets, iters=iters, fast_path=not fell_back,
            )
            if fell_back:
                # the measured time came from the exact stepwise chain,
                # which the fused-chain model does not describe
                report["p_pad"] = None
        return out.to_csr()

    def mult(a, b):
        if backend == "tpu":
            return spgemm(a, b)
        from outerspace_tpu.ops.reference import spgemm_scipy

        return spgemm_scipy(a, b)

    for _ in range(iters):
        # Expansion: flow^expansion.
        expanded = flow
        for _ in range(expansion - 1):
            expanded = mult(expanded, flow)
        # Inflation + prune + renormalise (host elementwise).
        new_flow = _mcl_inflate_prune(expanded, inflation, prune_threshold)
        if _converged(flow, new_flow):
            return new_flow
        flow = new_flow
    return flow


def mcl_prepare(
    flow: CSR,
    inflation: float = 2.0,
    iters: int = 10,
    prune_threshold: float = 1e-4,
):
    """Stage the device MCL: host-plan the first squaring (by far the
    largest — the flow is host-side at this point anyway) for whichever
    Pallas pipeline the autotuner picks for the flow operand (tiled
    parts for skewed flows, the windowed-gather pipeline for low-skew —
    the latter measured ~35% faster on the rmat14-scale MCL flow).
    Returns an opaque prep consumed by :func:`mcl_run` (amortised
    across repeated runs, like the A² workloads' plans)."""
    from outerspace_tpu.ops.gather_pipeline import plan_spgemm_gather
    from outerspace_tpu.ops.spgemm import plan_tiled_parts
    from outerspace_tpu.sched.planner import choose_strategy

    n = flow.shape[0]
    assert flow.shape[0] == flow.shape[1] and n * n < 2**32
    if iters < 1:
        raise ValueError("mcl_prepare stages >= 1 iteration; iters=0 is a no-op")
    a_csc = flow.to_csc()
    if choose_strategy(a_csc, flow) == "gather":
        tplan = plan_spgemm_gather(a_csc, flow)
    else:
        tplan = plan_tiled_parts(a_csc, flow)
    from outerspace_tpu.sched.sizing_cache import workload_key

    sizing_key = workload_key(
        (np.asarray(flow.indptr), np.asarray(flow.indices)),
        ("mcl", n, float(inflation), int(iters), float(prune_threshold)),
    )
    return {
        "tplan": tplan,
        "n": n,
        "inflation": float(inflation),
        "iters": int(iters),
        "threshold": float(prune_threshold),
        "sizing_key": sizing_key,
        # kept (by reference, no copy) for the host sizing sweep; the
        # scipy CSR is materialized lazily only on the cold path, and
        # the reference is dropped once budgets are resolved
        "flow": flow,
    }


def _host_mcl_sizing(flow_scipy, inflation, iters, threshold):
    """Run the MCL recurrence once in scipy (host, same semantics as the
    device loop: square, prune on unnormalised powered values, column
    normalise) and read every static budget the fused device program
    needs: per-squaring product counts P_i and per-iteration surviving
    nnz. Sub-second at the graph sizes the device chain accepts
    (n² < 2³²) — the budgets get ×1.5 margins and the device ``ok``
    flag still guards exactness (f32 vs f64 prune boundaries can
    differ near the threshold)."""
    p_list, nnz_list, _ = _host_mcl_sizing_full(
        flow_scipy, inflation, iters, threshold
    )
    return p_list, nnz_list


def _host_mcl_sizing_full(
    flow_scipy, inflation, iters, threshold,
    stage1_layout=None, blk: int = 8192,
):
    """:func:`_host_mcl_sizing` plus per-squaring compaction block caps.

    The fused device program's compaction inputs are deterministic in
    the flow matrix: each squaring's merged stream is the product
    multiset sorted by key, so a survivor's slot is the exclusive-cumsum
    rank of its key among all products (duplicates included) — the
    stage-1 stream in ROW-major key order per pipeline part (layout =
    ``[(row_lo, row_hi, merge_pad), ...]``, sentinel pads at each
    part's tail), the loop streams in CSC key order with the pad tail at
    the end. ``caps[i]`` = the max survivors any ``blk``-slot block of
    squaring ``i``'s stream holds (0 where the layout is unknown) —
    the exactness bound :func:`chain.compact_masked_stream` needs.
    Costs one extra pattern-product per squaring (multiplicities);
    still ~seconds at the n² < 2³² sizes this chain accepts."""
    import scipy.sparse as sp

    flow = flow_scipy.tocsr()
    n = flow.shape[0]
    p_list, nnz_list, caps = [], [], []
    for it in range(iters):
        rownnz = np.diff(flow.indptr)
        coo = flow.tocoo()
        p_list.append(int(rownnz[coo.col].sum()))
        sqm = (flow @ flow).tocsr()
        sqm.sort_indices()
        # product multiplicities on the same pattern: how many k's feed
        # each output (r, c) — the sorted-stream rank spacing
        pat = sp.csr_matrix(
            (np.ones(flow.nnz, np.int64), flow.indices, flow.indptr),
            shape=flow.shape,
        )
        cnt = (pat @ pat).tocsr()
        cnt.sort_indices()
        vp_r = np.power(np.maximum(sqm.data, 0.0), inflation)
        keep_r = vp_r > threshold
        if it == 0 and stage1_layout is not None:
            # stage-1: per part, survivors' ranks among the part's
            # row-major-sorted products; blocks over the GLOBAL
            # concatenated stream (offset = Σ previous merge_pads)
            bc = np.zeros(1, np.int64)
            off = 0
            ok_layout = True
            for lo, hi, mp in stage1_layout:
                e0, e1 = cnt.indptr[lo], cnt.indptr[hi]
                mult = cnt.data[e0:e1]
                pos = np.concatenate(
                    [[0], np.cumsum(mult[:-1])]
                ) if e1 > e0 else np.zeros(0, np.int64)
                if e1 > e0 and pos[-1] + mult[-1] > mp:
                    ok_layout = False  # layout mismatch: disable
                    break
                k = keep_r[e0:e1]
                gpos = off + pos[k]
                if gpos.size:
                    b = np.bincount(gpos // blk)
                    if b.size > bc.size:
                        b[: bc.size] += bc
                        bc = b
                    else:
                        bc[: b.size] += b
                off += mp
            caps.append(int(bc.max()) if ok_layout else 0)
        elif it == 0:
            caps.append(0)
        else:
            # loop squaring: stream sorted by CSC key (col·m + row)
            sqc = sqm.tocsc()
            sqc.sort_indices()
            cc = cnt.tocsc()
            cc.sort_indices()
            mult = cc.data
            pos = (
                np.concatenate([[0], np.cumsum(mult[:-1])])
                if mult.size
                else np.zeros(0, np.int64)
            )
            keep_c = np.power(
                np.maximum(sqc.data, 0.0), inflation
            ) > threshold
            gpos = pos[keep_c]
            caps.append(
                int(np.bincount(gpos // blk).max()) if gpos.size else 0
            )
        sq = sqm.tocoo()
        vp = np.power(np.maximum(sq.data, 0.0), inflation)
        keep = vp > threshold
        r, c, v = sq.row[keep], sq.col[keep], vp[keep]
        nnz_list.append(int(keep.sum()))
        cs = np.zeros(n)
        np.add.at(cs, c, v)
        cs[cs == 0] = 1.0
        flow = sp.coo_matrix(
            (v / cs[c], (r, c)), shape=(n, n)
        ).tocsr()
    return p_list, nnz_list, caps


def _stage1_stream_layout(tplan):
    """``[(row_lo, row_hi, merge_pad), ...]`` of the stage-1 merged
    stream's per-part layout (concatenation order), or None when the
    plan shape has no commonized per-part stream (uncommonized tiled
    fallbacks) — the host cap computation then skips stage-1."""
    from outerspace_tpu.ops.gather_pipeline import GatherPipelinePlan
    from outerspace_tpu.ops.spgemm import TiledPartsPlan

    if isinstance(tplan, GatherPipelinePlan):
        return [
            (p.row_base, p.row_base + p.span, p.merge_pad)
            for p in tplan.parts
        ]
    if isinstance(tplan, TiledPartsPlan) and tplan.merge_pad:
        if not (tplan.rebased or tplan.m * tplan.n <= 2**32):
            return None  # two-key merge path: different stream shape
        return [
            (lo, hi, tplan.merge_pad) for lo, hi, _ in tplan.parts
        ]
    return None


def _blk_caps_with_margin(caps):
    """×1.5 + 64 margin (128-aligned, capped at the block size) over the
    host-exact per-block survivor maxima — room for f32-vs-f64 prune
    boundary drift; the device ok flag still guards exactly. 0 stays 0
    (= that squaring keeps the plain sort)."""
    out = []
    for c in caps:
        if not c:
            out.append(0)
        else:
            out.append(min(8192, -(-(int(1.5 * c) + 64) // 128) * 128))
    return tuple(out)


def mcl_size(prep) -> None:
    """Host sizing sweep for a staged MCL (scipy, sub-second): exact
    per-squaring product counts P_i, survivor nnz for EVERY iteration,
    and per-squaring compaction block caps, so the static loop buffers
    fit the measured trajectory (×1.5 margins; the device ok flag
    guards f32-vs-f64 prune boundary drift) instead of one eager device
    squaring + a 4× heuristic. Source of the TWO-PHASE split: P
    collapses as the flow converges (rmat14: 562K → 326K → 43K over the
    loop squarings), so only the first loop squaring runs at the full
    p_pad and the rest share the smaller fori_loop bodies.

    Fills ``prep`` in place and persists the budgets under
    ``prep["sizing_key"]``. Called by :func:`mcl_run` on a cold cache;
    callable directly to (re)generate a cache entry without touching
    the device (e.g. refreshing the committed bench entry after a
    schedule-format change)."""
    from outerspace_tpu.ops.symbolic import round_up_bucket
    from outerspace_tpu.sched import sizing_cache

    tplan = prep["tplan"]
    inflation, iters, threshold = (
        prep["inflation"], prep["iters"], prep["threshold"],
    )
    p_list, nnz_list, raw_caps = _host_mcl_sizing_full(
        prep["flow"].to_scipy().tocsr(), inflation, iters, threshold,
        stage1_layout=_stage1_stream_layout(tplan),
    )
    blk_caps = _blk_caps_with_margin(raw_caps)
    elem_pad = round_up_bucket(
        max(int(1.5 * max(nnz_list)) + 1024, 4096), min_size=4096
    )
    nnz_pad = round_up_bucket(
        max(int(1.5 * nnz_list[-1]) + 256, 1024), min_size=1024
    )
    # per-iteration product buffers for the loop squarings (2..iters)
    p_pads = tuple(
        round_up_bucket(
            max(int(1.5 * p) + 4096, elem_pad, 4096), min_size=4096
        )
        for p in p_list[1:]
    )
    # compile guard: each DISTINCT size compiles its own loop body,
    # so long chains (iters=10 default) quantize to at most 3 sizes
    # — every entry rounds UP to the nearest kept size (never down:
    # budgets may only grow, the ok guard stays sound)
    distinct = sorted(set(p_pads), reverse=True)
    if len(distinct) > 3:
        kept = {distinct[0], distinct[len(distinct) // 2],
                distinct[-1]}
        p_pads = tuple(
            min(s for s in kept if s >= p) for p in p_pads
        )
    # p_pad caps every schedule entry (and is the single size the
    # fallback reuses), so it is the schedule's worst case; the
    # schedule itself may legally bump mid-run (transient growth —
    # each iteration ok-guards its own size)
    p_pad = max(p_pads) if p_pads else elem_pad
    prep["p_pad"], prep["nnz_pad"] = p_pad, nnz_pad
    prep["elem_pad"] = elem_pad
    prep["p_pads"] = p_pads if p_pads else None
    prep["blk_caps"] = blk_caps if any(blk_caps) else None
    prep.pop("flow", None)  # sweep done; drop the reference
    if "sizing_key" in prep:
        sizing_cache.store(
            prep["sizing_key"],
            {"p_pad": prep["p_pad"], "nnz_pad": prep["nnz_pad"],
             "elem_pad": prep["elem_pad"],
             "p_pads": list(p_pads) if p_pads else None,
             "blk_caps": list(blk_caps) if any(blk_caps) else None},
        )


def mcl_run(prep):
    """Run the staged MCL chain as ONE jitted program: tiled first
    squaring + inflation + the remaining iterations' fused fori_loop +
    final device compaction — a single dispatch, one scalar sync.

    The first call runs a stepwise sizing pass to learn the static loop
    buffer sizes (cached in ``prep``); every later call is the one-jit
    fast path. A device ``ok`` flag guards the static budgets — on
    overflow the exact stepwise chain re-runs."""
    import jax
    import jax.numpy as jnp

    from outerspace_tpu.ops.chain import (
        _stage1_squaring,
        inflate_device,
        markov_cluster_device_fused,
        mcl_whole_traced,
    )
    from outerspace_tpu.ops.spgemm import MergedCOO
    from outerspace_tpu.ops.symbolic import round_up_bucket

    tplan = prep["tplan"]
    n = prep["n"]
    inflation, iters, threshold = (
        prep["inflation"], prep["iters"], prep["threshold"],
    )
    from outerspace_tpu.sched import sizing_cache

    if "p_pad" not in prep and "sizing_key" in prep:
        # warm path: budgets learned on a previous process for this
        # exact workload skip the sizing sweep (the ok flag still guards)
        cached = sizing_cache.lookup(prep["sizing_key"])
        if cached and "p_pad" in cached and "nnz_pad" in cached:
            prep["p_pad"] = cached["p_pad"]
            prep["nnz_pad"] = cached["nnz_pad"]
            prep["elem_pad"] = cached.get(
                "elem_pad",
                round_up_bucket(
                    max(4 * cached["nnz_pad"], 4096), min_size=4096
                ),
            )
            pps = cached.get("p_pads")
            # a torn/hand-edited schedule of the wrong length would
            # raise inside the jitted program; corrupt cache must only
            # cost speed, so degrade to the single-size loop instead
            if pps and len(pps) != iters - 1:
                pps = None
            prep["p_pads"] = tuple(pps) if pps else None
            bcs = cached.get("blk_caps")
            # wrong-length cap schedules likewise only cost speed
            # (mcl_whole_traced itself re-checks the loop entries)
            if bcs and len(bcs) != iters:
                bcs = None
            prep["blk_caps"] = tuple(bcs) if bcs else None
            prep["sizing_cached"] = True
            prep.pop("flow", None)  # no sweep needed
    if "p_pad" not in prep:
        mcl_size(prep)

    if "program" not in prep:
        p_pad, nnz_pad = prep["p_pad"], prep["nnz_pad"]

        elem_pad = prep.get("elem_pad")
        p_pads = prep.get("p_pads")
        blk_caps = prep.get("blk_caps")

        @jax.jit
        def program():
            return mcl_whole_traced(
                tplan, p_pad=p_pad, nnz_pad=nnz_pad, m=n, n_cols=n,
                iters=iters - 1, inflation=inflation, threshold=threshold,
                elem_pad=elem_pad, p_pads=p_pads, blk_caps=blk_caps,
            )

        prep["program"] = program
    r, c, v, nnz, ok = prep["program"]()
    if not bool(np.asarray(ok)):
        # Static budgets violated: run the EXACT stepwise chain (its own
        # per-iteration sizing cannot overflow) — bounded, no recursion —
        # and double the budgets so future runs retake the fast path.
        sq = _stage1_squaring(tplan)
        v1, valid1, nnz1 = inflate_device(
            sq.rows, sq.cols, sq.vals, sq.valid,
            m=n, inflation=inflation, threshold=threshold,
        )
        flow1 = MergedCOO(sq.shape, sq.rows, sq.cols, v1, valid1, nnz1)
        out = markov_cluster_device_fused(
            flow1, inflation=inflation, iters=iters - 1,
            prune_threshold=threshold,
        )
        prep["p_pad"] = round_up_bucket(prep["p_pad"] * 2, min_size=4096)
        prep["nnz_pad"] = round_up_bucket(
            max(prep["nnz_pad"] * 2, int(np.asarray(out.nnz))),
            min_size=1024,
        )
        prep["elem_pad"] = round_up_bucket(
            prep.get("elem_pad", prep["nnz_pad"]) * 2, min_size=4096
        )
        # an ok violation means the sized trajectory was wrong — retake
        # the fast path single-size (no per-iteration schedule, no
        # compaction caps) at the doubled budgets rather than trusting
        # the per-phase sizes again
        prep["p_pads"] = None
        prep["blk_caps"] = None
        prep.pop("program", None)
        prep.pop("sizing_cached", None)
        if "sizing_key" in prep:
            sizing_cache.store(
                prep["sizing_key"],
                {"p_pad": prep["p_pad"], "nnz_pad": prep["nnz_pad"],
                 "elem_pad": prep["elem_pad"], "p_pads": None,
                 "blk_caps": None},
            )
        return out
    valid = jnp.arange(r.shape[0], dtype=jnp.int32) < nnz
    return MergedCOO((n, n), r, c, v, valid, nnz)


def mcl_clusters(flow: CSR) -> list[np.ndarray]:
    """Extract clusters: attractor rows (nonzero diagonal) and the columns
    attached to them."""
    s = flow.to_scipy().tocsr()
    attractors = np.nonzero(s.diagonal() > 1e-6)[0]
    clusters = []
    seen = set()
    for a in attractors:
        members = s.getrow(a).nonzero()[1]
        key = tuple(sorted(members))
        if key not in seen and len(members):
            seen.add(key)
            clusters.append(np.asarray(members))
    return clusters


def _col_normalize(m: CSR) -> CSR:
    s = m.to_scipy().tocsc()
    sums = np.asarray(s.sum(axis=0)).ravel()
    sums[sums == 0] = 1.0
    d = s.multiply(1.0 / sums).tocsr()
    d.sort_indices()
    return CSR.from_scipy(d.astype(np.float32))


def _converged(a: CSR, b: CSR, tol: float = 1e-6) -> bool:
    if a.nnz != b.nnz or a.shape != b.shape:
        return False
    sa, sb = a.to_scipy(), b.to_scipy()
    return abs(sa - sb).max() <= tol
