"""Device-resident SpGEMM chaining: A^k, MCL flows — no host round-trips.

The reference's repeated-A² uses (triangle counting, MCL; BASELINE
configs[3]) re-read the merged output into host memory to build the next
operand. Over a slow device link that dominates everything. Here the
whole chain stays on device:

- ``compact_to_csr_device`` — front-compact a ``MergedCOO`` into padded
  CSR-ish arrays (rows/cols/vals row-major + indptr) on device;
- ``spgemm_from_device_csr`` — build the *flat* expansion plan on device
  (CSC reorder via one packed sort, offsets via gathered row degrees +
  cumsum) and run expand+merge. The only host involvement per step is
  fetching two scalars (nnz, P) to pick the next static bucket sizes —
  ~30 ms instead of seconds of array transfer;
- ``inflate_device`` — MCL's inflation/prune/column-normalise as pure
  device elementwise + scatter-add;
- ``markov_cluster_device`` — the full MCL loop chained on device.

Capability matched: the reference's multiply→merge→re-read loop
(``TaskProvider`` reconstruction per squaring) with the host removed
from the data path. Requires m·n < 2^32 (packed CSC-reorder keys; the
graph kernels' regime).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from outerspace_tpu.ops.spgemm import (
    _I32_MAX,
    KEY_BIAS,
    MergedCOO,
    expand_partial_products,
    merge_biased_keys,
    pack_key_biased,
)
from outerspace_tpu.ops.symbolic import round_up_bucket


@functools.partial(jax.jit, static_argnames=("nnz_pad", "m"))
def compact_to_csr_device(rows, cols, vals, valid, *, nnz_pad: int, m: int):
    """Front-compact a padded merged stream (row-major sorted) into
    CSR-ish device arrays. Invalid tail slots: row = m (sentinel)."""
    n_in = rows.shape[0]
    dest = jnp.cumsum(valid.astype(jnp.int32)) - 1
    dest = jnp.where(valid, dest, nnz_pad)  # dropped past the end
    out_r = jnp.full(nnz_pad + 1, m, jnp.int32).at[dest].set(
        jnp.where(valid, rows, m), mode="drop"
    )[:-1]
    out_c = jnp.zeros(nnz_pad + 1, jnp.int32).at[dest].set(
        jnp.where(valid, cols, 0), mode="drop"
    )[:-1]
    out_v = jnp.zeros(nnz_pad + 1, jnp.float32).at[dest].set(
        jnp.where(valid, vals, 0.0), mode="drop"
    )[:-1]
    del n_in
    counts = jnp.zeros(m, jnp.int32).at[out_r].add(
        (out_r < m).astype(jnp.int32), mode="drop"
    )
    indptr = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(counts)]
    )
    nnz = jnp.sum(valid.astype(jnp.int32))
    return out_r, out_c, out_v, indptr, nnz


@functools.partial(
    jax.jit, static_argnames=("p_pad", "m", "n", "max_run")
)
def spgemm_from_device_csr(
    a_rows, a_cols, a_vals, b_rows, b_cols, b_vals, b_indptr, nnz_a,
    *, p_pad: int, m: int, n: int, max_run: int,
):
    """C = A @ B where both operands live on device as compacted padded
    CSR streams (A's k = its column ids, B's rows indexed by b_indptr).
    Everything the host planner normally precomputes is derived on
    device: CSC order by one packed sort, expansion offsets by gathered
    B-row degrees + cumsum."""
    del b_rows
    # ---- A to CSC order: sort by (col, row); invalid tail (row = m)
    # packs to the maximal key and stays at the end ----
    valid_a = a_rows < m
    csc_key = jnp.where(
        valid_a, a_cols * np.int32(m) + a_rows + KEY_BIAS, _I32_MAX
    )
    _, rows_s, cols_s, vals_s = jax.lax.sort(
        (csc_key, a_rows, a_cols, a_vals), num_keys=1, is_stable=False
    )
    valid_s = rows_s < m
    a_k = jnp.where(valid_s, cols_s, 0)
    # ---- expansion offsets: per-element B-row degree, cumsum ----
    deg = b_indptr[a_k + 1] - b_indptr[a_k]
    deg = jnp.where(valid_s, deg, 0)
    offsets = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(deg).astype(jnp.int32)]
    )
    p_total = offsets[-1]
    r, c, v = expand_partial_products(
        jnp.where(valid_s, rows_s, m),
        jnp.where(valid_s, vals_s, 0.0),
        a_k,
        b_indptr,
        b_cols,
        b_vals,
        offsets,
        p_total,
        p_pad,
        m,
    )
    key = jnp.where(
        jnp.arange(p_pad, dtype=jnp.int32) < p_total,
        pack_key_biased(r, c, n),
        _I32_MAX,
    )
    del nnz_a
    return merge_biased_keys(
        key, v, n, m, max_run, pad_count=jnp.int32(p_pad) - p_total
    )


def square_device(merged: MergedCOO) -> MergedCOO:
    """M @ M with M device-resident; the host sees exactly two small
    fetches (nnz, then [P, max-row-nnz]) to size the next static buckets
    — instead of transferring the whole matrix."""
    m, n = merged.shape
    # strictly < 2^32: the device CSC-reorder key (col*m + row) would
    # collide with the int32 sentinel at the (m-1, m-1) corner
    assert m == n and m * n < 2**32
    nnz = int(np.asarray(merged.nnz))
    nnz_pad = round_up_bucket(max(nnz, 1), min_size=1024)
    rows, cols, vals, indptr, _ = compact_to_csr_device(
        merged.rows, merged.cols, merged.vals, merged.valid,
        nnz_pad=nnz_pad, m=m,
    )
    raw = np.asarray(_chain_stats_jit(rows, cols, indptr, m=m))
    p_exact = int(raw[0])
    max_row = int(raw[1])
    p_approx = float(raw[2:3].view(np.float32)[0])
    # the f32 estimate catches int32 wrap of the exact sum (its own
    # error is tiny relative to 2^31), so over-scale inputs fail loudly
    if p_exact < 0 or p_approx >= 2**31 * 0.999:
        raise ValueError(
            f"chained expansion ~{p_approx:.3g} exceeds int32 index space"
        )
    p_pad = round_up_bucket(max(p_exact, 1), min_size=4096)
    r, c, v, valid, out_nnz = spgemm_from_device_csr(
        rows, cols, vals, rows, cols, vals, indptr, merged.nnz,
        p_pad=p_pad, m=m, n=n,
        max_run=1 << (max(max_row, 1) - 1).bit_length(),
    )
    return MergedCOO((m, n), r, c, v, valid, out_nnz)


@functools.partial(jax.jit, static_argnames=("m",))
def _chain_stats_jit(rows, cols, indptr, *, m: int):
    """[P for M@M (exact int32, bit-cast), max nnz per row (int32,
    bit-cast), P again as f32] in one fetchable f32 array. The f32
    channel guards the exact sum against int32 wrap (no int64 on
    device without x64 mode — the old int64 cast silently truncated).

    P gathers row degrees by each element's COLUMN — the outer index k
    that feeds the expansion (P = Σ_e rownnz(col(e))). Gathering by row
    (Σ rownnz(row(e)) = Σ_i rownnz(i)²) is a different number for
    asymmetric operands and under-sizes ``p_pad`` whenever column mass
    sits on heavier rows than row mass.

    The container is int32 with the f32 guard bitcast INTO the int lane
    — NOT int bit patterns bitcast into an f32 array: small ints are f32
    denormals, and the TPU flushes denormals to zero somewhere between
    an f32 stack and the host fetch (measured on the tunnel: int32
    500500 in an f32 lane fetches as 0.0). Integer lanes are exact."""
    deg = indptr[1:] - indptr[:-1]
    contrib = jnp.where(rows < m, deg[jnp.minimum(cols, m - 1)], 0)
    p_i = jnp.sum(contrib)
    return jnp.stack(
        [
            p_i,
            jnp.max(deg),
            jax.lax.bitcast_convert_type(
                jnp.sum(contrib.astype(jnp.float32)), jnp.int32
            ),
        ]
    )


@functools.partial(jax.jit, static_argnames=("m", "inflation", "threshold"))
def inflate_device(rows, cols, vals, valid, *, m, inflation, threshold):
    """MCL inflation on device: elementwise power, prune, column
    normalise (scatter-add column sums)."""
    vp = jnp.power(jnp.maximum(jnp.where(valid, vals, 0.0), 0.0), inflation)
    valid2 = valid & (vp > threshold)
    colsum = jnp.zeros(m, jnp.float32).at[jnp.where(valid2, cols, 0)].add(
        jnp.where(valid2, vp, 0.0), mode="drop"
    )
    colsum = jnp.where(colsum == 0, 1.0, colsum)
    vn = jnp.where(valid2, vp / colsum[cols], 0.0)
    nnz = jnp.sum(valid2.astype(jnp.int32))
    return vn, valid2, nnz


def markov_cluster_device(
    merged0: MergedCOO,
    inflation: float = 2.0,
    iters: int = 10,
    prune_threshold: float = 1e-4,
) -> MergedCOO:
    """The MCL loop with the flow matrix device-resident end to end;
    per iteration the host sees exactly two scalars."""
    flow = merged0
    for _ in range(iters):
        sq = square_device(flow)
        v2, valid2, _ = inflate_device(
            sq.rows, sq.cols, sq.vals, sq.valid,
            m=flow.shape[0], inflation=inflation,
            threshold=prune_threshold,
        )
        nnz2 = jnp.sum(valid2.astype(jnp.int32))
        flow = MergedCOO(
            sq.shape, sq.rows, sq.cols, v2, valid2, nnz2
        )
    return flow


@functools.partial(
    jax.jit,
    static_argnames=(
        "p_pad", "elem_pad", "m", "n", "iters", "inflation", "threshold"
    ),
)
def _mcl_fused_jit(
    kcsc, vals,
    *, p_pad: int, elem_pad: int, m: int, n: int, iters: int,
    inflation: float, threshold: float,
):
    """The whole MCL loop as ONE ``lax.fori_loop`` program: every
    iteration re-uses fixed ``p_pad``-sized buffers, so there are ZERO
    host syncs between iterations (vs two per squaring in the stepwise
    chain — each sync pays the ~30 ms tunnel RPC floor). State is the
    CSC-resident (packed keys, values) pair — see :func:`_mcl_iteration`.
    A device-side ``ok`` flag records whether any iteration's true
    expansion exceeded the static budget; the host checks it once at the
    end and falls back to the stepwise chain (exactness is never
    silently lost)."""
    del n
    def body(_, state):
        return _mcl_iteration(
            state, p_pad=p_pad, elem_pad=elem_pad, m=m,
            inflation=inflation, threshold=threshold,
        )

    starts0 = _column_starts(kcsc, m)
    state = jax.lax.fori_loop(
        0, iters, body, (kcsc, vals, starts0, jnp.bool_(True))
    )
    return state


def _csc_colnorm_sorted(kcol, vp, m: int, starts_ext=None):
    """Per-column survivor totals over a stream whose column keys
    ``kcol`` (biased ``col + KEY_BIAS``) are sorted ascending, broadcast
    back to every slot: one segmented-sum pass (the merge epilogue with
    ``n_cols=1``) + an m-probe searchsorted colsum table + the exact
    bitcast-diff cumsum broadcast. No L-sized scatter or gather.

    ``starts_ext`` (int32[m+1], the column start positions — equal to
    ``searchsorted(kcol, arange(m+1)+KEY_BIAS, left)``) makes this
    search-free: the searchsorted probes are the iteration's single
    biggest fixed cost (~1.7 ms per m-probe search on chip, independent
    of the product stream), so callers that already hold the positions
    — the fused MCL loop threads them through its carry, where the
    colnorm positions of iteration i's output ARE iteration i+1's
    column pointers — must pass them instead of re-searching."""
    from outerspace_tpu.ops.spgemm import (
        _segment_broadcast_bits,
        merge_epilogue,
    )

    L = kcol.shape[0]
    col_of, _, col_tot, tot_valid, _ = merge_epilogue(
        kcol, vp, 1, m, None, pad_count=jnp.int32(0)
    )
    if starts_ext is None:
        # column probes are ≤ m ≪ 2³¹ so the rank-trick packing always
        # holds here (measured ~5× cheaper than the probe chain)
        starts_ext = ranks_in_sorted(
            kcol, jnp.arange(m + 1, dtype=jnp.int32) + KEY_BIAS
        ).astype(jnp.int32)
    pos = jnp.clip(starts_ext[1:] - 1, 0, L - 1)
    # one packed-row gather instead of three at the same indices (TPU
    # random access is charged per accessed row, not per field)
    packed = jnp.stack(
        [
            col_of,
            tot_valid.astype(jnp.int32),
            jax.lax.bitcast_convert_type(col_tot, jnp.int32),
        ],
        axis=1,
    )[pos]
    hit = (packed[:, 1] != 0) & (
        packed[:, 0] == jnp.arange(m, dtype=jnp.int32)
    )
    colsum = jnp.where(
        hit,
        jax.lax.bitcast_convert_type(packed[:, 2], jnp.float32),
        1.0,
    )
    colsum = jnp.where(colsum == 0, 1.0, colsum)
    return jax.lax.bitcast_convert_type(
        _segment_broadcast_bits(
            jax.lax.bitcast_convert_type(colsum, jnp.int32),
            starts_ext[:m], L,
        ),
        jnp.float32,
    )


def compact_masked_stream(key, val, out_len: int, *, cap: int, blk: int = 8192):
    """Sparse-survivor compaction: the first ``out_len`` slots of the
    masked ``(key, val)`` stream in ascending key order (sentinel
    ``_I32_MAX`` = masked; real keys must be unique, as post-epilogue
    segment heads are).

    MCL compaction inputs are ~1% survivors in a multi-M-slot stream, so
    instead of one full-depth comparator network over L (or the 8-split
    variant) this runs a BATCHED in-block sort — ``(L/blk, blk)`` along
    the last axis, a log²(blk)-stage network instead of log²(L) — then
    slices each block to its first ``cap`` slots and finishes with ONE
    full sort of the ~L·cap/blk remainder. Exact iff every blk-block
    holds ≤ cap survivors — returned as the device ``ok`` flag (callers
    fold it into their budget guards; caps come from the host sizing
    sweep, which replicates the device stream layout exactly). Measured
    at the rmat14 MCL stage-1 scale (18.35M slots, 150K survivors,
    blk=8192): 10.6-12.5 ms vs the 8-split sort's 21.0 ms.

    The reference's merge PEs never pay this at all (per-row streaming,
    ``SimOuterSPACE.cpp:554-606``); on TPU compaction is sort-shaped
    (see the random-access law in :func:`mcl_whole_traced`), so the win
    is making the dominant sort shallow."""
    L = key.shape[0]
    nb = -(-L // blk)
    pad = nb * blk - L
    if pad:
        key = jnp.concatenate([key, jnp.full(pad, _I32_MAX, jnp.int32)])
        val = jnp.concatenate([val, jnp.zeros(pad, jnp.float32)])
    kb = key.reshape(nb, blk)
    vb = val.reshape(nb, blk)
    ok = (
        jnp.max(jnp.sum((kb != _I32_MAX).astype(jnp.int32), axis=-1))
        <= cap
    )
    ks, vs = jax.lax.sort((kb, vb), num_keys=1, is_stable=False)
    kc, vc = jax.lax.sort(
        (ks[:, :cap].reshape(-1), vs[:, :cap].reshape(-1)),
        num_keys=1,
        is_stable=False,
    )
    short = nb * cap
    if short >= out_len:
        return kc[:out_len], vc[:out_len], ok
    ext = out_len - short
    return (
        jnp.concatenate([kc, jnp.full(ext, _I32_MAX, jnp.int32)]),
        jnp.concatenate([vc, jnp.zeros(ext, jnp.float32)]),
        ok,
    )


def ranks_in_sorted(sorted_keys: jax.Array, probes: jax.Array) -> jax.Array:
    """``searchsorted(sorted_keys, probes, side="left")`` as two short
    sorts instead of a binary-search probe chain.

    TPU binary searches pay the full random-access price per PROBE STEP
    (measured: an m+1-probe searchsorted into a 196K sorted stream costs
    2-8 ms on chip; this trick runs the same ranks in 0.40 ms): probes
    and data merge into one stream keyed ``2u`` (probes) / ``2u+1``
    (data) in unsigned key space, one 1-stream sort interleaves them,
    and a second masked 2-stream sort compacts the probes' positions to
    the front — ``rank(probe_i) = position_i - i``.

    Requirements (callers guard statically): ``probes`` strictly
    ascending with unbiased values < 2³¹ - 2 (the ·2 packing must not
    wrap); ``sorted_keys`` ascending. Data keys with unbiased value
    ≥ 2³¹ - 1 (incl. the ``_I32_MAX`` sentinel) rank after every legal
    probe, so they are pinned at the unsigned max — exact."""
    npb = probes.shape[0]
    ku = jax.lax.bitcast_convert_type(sorted_keys, jnp.uint32) ^ np.uint32(
        2**31
    )
    pu = jax.lax.bitcast_convert_type(probes, jnp.uint32) ^ np.uint32(2**31)
    dk = jnp.where(
        ku < np.uint32(2**31 - 1),
        ku * np.uint32(2) + np.uint32(1),
        np.uint32(2**32 - 1),
    )
    comb = jnp.concatenate([pu * np.uint32(2), dk])
    cs = jax.lax.sort(comb)
    pos = jnp.arange(comb.shape[0], dtype=jnp.int32)
    mk = jnp.where(
        (cs & np.uint32(1)) == 0, cs, np.uint32(2**32 - 1)
    )
    _, pos2 = jax.lax.sort((mk, pos), num_keys=1, is_stable=False)
    return pos2[:npb] - jnp.arange(npb, dtype=jnp.int32)


def _ranks_ok_for_columns(m: int) -> bool:
    """Static guard for :func:`ranks_in_sorted` with the chain's column
    probes ``c·m + KEY_BIAS`` (c = 0..m): the max unbiased probe m² must
    survive the ·2 packing."""
    return m * m < 2**31 - 2


def _column_starts(kstream: jax.Array, m: int) -> jax.Array:
    """Column start positions (int32[m+1]) of a stream sorted by the
    packed CSC key ``col·m + row + KEY_BIAS`` — ``searchsorted`` ranks
    of the column probes, via :func:`ranks_in_sorted` when the packing
    guard allows (20× cheaper on chip), else the probe chain."""
    probes = (
        jnp.arange(m + 1, dtype=jnp.int32) * np.int32(m) + KEY_BIAS
    )
    if _ranks_ok_for_columns(m):
        return ranks_in_sorted(kstream, probes).astype(jnp.int32)
    return jnp.searchsorted(kstream, probes, side="left").astype(jnp.int32)


def _fill_pack_ok(elem_pad: int, m: int) -> bool:
    """Static guard for the sort+fill join: product keys
    ``j·(m+1) + c + 1`` (j < elem_pad, c < m), table keys ``q·(m+1)``,
    and the pin key must all fit u32 with strict headroom."""
    return elem_pad * (m + 1) < 2**32 - 4 * (m + 1)


def _loop_expand_fill(
    kcsc, vals, col_f, valid_f, jb_f, offsets, p_clamped,
    *, p_pad: int, elem_pad: int, m: int, fill_passes: int,
):
    """Gather-free expansion join: the products' B-side fetch
    ``stream[j]`` becomes ONE combined sort + a last-observation fill.

    The flat expand's per-product random gather is the fused MCL loop's
    dominant cost (measured 10.7 ms of a 15.3 ms iteration at 917K
    products — TPU random access is charged per accessed row). Instead:

    - products are created by ONE packed segment broadcast: the u32 key
      ``j·(m+1) + c_f + 1`` is affine in p within each element's segment
      (slope m+1), so one bitcast-diff cumsum carries BOTH the flat
      stream position j and the output column — plus one f32 lane for
      the element value (the 3-lane broadcast the gather path pays runs
      scatters per lane, ~1.7 ms each on chip);
    - every stream position q contributes a TABLE slot keyed
      ``q·(m+1)`` (≡ 0 mod m+1 — product keys are ≡ c+1 ∈ [1, m]),
      carrying the stream's (row, value) at q;
    - ONE 3-stream sort of the p_pad+elem_pad stream interleaves each
      table slot immediately before its products (keys are exact, no
      tie: table < products of the same j < next table);
    - a log₂-pass last-observation fill propagates (row_q, val_q) into
      the product slots — shift/select passes only, measured 0.3 ms.

    Returns (merge_key, v) UNSORTED at length p_pad + elem_pad: product
    slots carry the packed output key ``c_f·m + row + KEY_BIAS`` and
    a_val·val_q; table and padding slots are sentinels."""
    from outerspace_tpu.ops.spgemm import _segment_broadcast_bits

    mp1 = np.uint32(m + 1)
    pin = np.uint32(((2**32 - 1 - m) // (m + 1)) * (m + 1) + m)
    starts = offsets[:-1]
    p = jnp.arange(p_pad, dtype=jnp.int32)
    w = (
        (jb_f.astype(jnp.uint32) - starts.astype(jnp.uint32)) * mp1
        + jnp.where(valid_f, col_f, 0).astype(jnp.uint32)
        + np.uint32(1)
    )
    key1 = (
        jax.lax.bitcast_convert_type(
            _segment_broadcast_bits(
                jax.lax.bitcast_convert_type(w, jnp.int32), starts, p_pad
            ),
            jnp.uint32,
        )
        + p.astype(jnp.uint32) * mp1
    )
    aval_bits = _segment_broadcast_bits(
        jax.lax.bitcast_convert_type(vals, jnp.int32), starts, p_pad
    )
    prod_valid = p < p_clamped
    prod_key = jnp.where(prod_valid, key1, pin)
    prod_f32 = jnp.where(
        prod_valid,
        jax.lax.bitcast_convert_type(aval_bits, jnp.float32),
        0.0,
    )
    # table slots: stream position q carries (row_q, val_q)
    q = jnp.arange(elem_pad, dtype=jnp.uint32)
    tbl_key = q * mp1
    ku_s = jax.lax.bitcast_convert_type(kcsc, jnp.uint32) ^ np.uint32(2**31)
    tbl_row = (ku_s % np.uint32(m)).astype(jnp.int32)
    comb_key = jnp.concatenate([prod_key, tbl_key])
    comb_i32 = jnp.concatenate([jnp.zeros(p_pad, jnp.int32), tbl_row])
    comb_f32 = jnp.concatenate([prod_f32, vals])
    sk, si, sf = jax.lax.sort(
        (comb_key, comb_i32, comb_f32), num_keys=1, is_stable=False
    )
    # last-observation fill of (row, val) from table slots into products
    is_table = (sk % mp1) == 0
    fill_i = jnp.where(is_table, si, 0)
    fill_f = jnp.where(is_table, sf, 0.0)
    seen = is_table
    d = 1
    for _ in range(fill_passes):
        pi = jnp.concatenate([jnp.zeros(d, jnp.int32), fill_i[:-d]])
        pf = jnp.concatenate([jnp.zeros(d, jnp.float32), fill_f[:-d]])
        ps = jnp.concatenate([jnp.zeros(d, bool), seen[:-d]])
        fill_i = jnp.where(seen, fill_i, pi)
        fill_f = jnp.where(seen, fill_f, pf)
        seen = seen | ps
        d *= 2
    is_prod = (~is_table) & (sk != pin)
    c_f_p = (sk % mp1).astype(jnp.int32) - 1
    out_key = jnp.where(
        is_prod, c_f_p * np.int32(m) + fill_i + KEY_BIAS, _I32_MAX
    )
    v = jnp.where(is_prod, sf * fill_f, 0.0)
    return out_key, v


def _mcl_iteration(
    state, *, p_pad, elem_pad, m, inflation, threshold, blk_cap=None,
    join="auto",
):
    """One MCL iteration (square + inflate) on fixed p_pad buffers.

    The flow stays in ONE order — CSC, as a (packed biased key
    ``col·m + row``, value) stream, compacted with a sentinel tail — for
    the whole loop, which cuts the per-iteration sort count from three
    (compaction, CSC reorder, merge) to TWO 2-stream sorts:

    - the expansion is *role-flipped*: the outer loop runs over the
      stream's elements f = (k, c) directly (any order works), each
      paired with CSC column k of the same stream — so one CSC stream
      serves both operand sides and no CSR view is ever built. The
      per-element segment length is the CSC column degree, and the
      inner gathers read (row, val) from the same stream;
    - the merge sorts by C's CSC key (``colC·m + rowC`` — any total
      order groups duplicates), so the output is already in the loop's
      resident order;
    - column sums for the inflation are a segmented sum over the
      already-sorted stream (no 16k-bin scatter-add), and the
      post-prune compaction is the second 2-stream sort.

    Scatter-free and gather-light throughout: coordinates live packed
    in the key (unpacked arithmetically), so the sorts move 2 streams
    instead of 4. The ELEMENT arrays live at ``elem_pad`` (the nnz
    budget, ~20-50× smaller than the ``p_pad`` product stream) — the
    expansion's per-element scatters and offset cumsums cost O(nnz),
    not O(p_pad); only the product-stream passes are p_pad-sized
    (measured: carrying elements at p_pad made each iteration
    ~70 ms on 917K buffers — scatter/gather-bound, not sort-bound).

    ``join`` selects the expansion's B-side fetch: "gather" is the flat
    per-product random gather (measured 10.7 ms of a 15.3 ms iteration
    at 917K products — the TPU random-access law's full price); "fill"
    is the gather-free combined-sort + last-observation-fill join
    (:func:`_loop_expand_fill`); "auto" picks fill whenever the key
    packing fits u32 (:func:`_fill_pack_ok`).

    The state carries ``starts_ext`` (int32[m+1]): the CSC column start
    positions of the resident stream. The iteration runs exactly ONE
    rank pass over the NEXT stream (after the compaction sort) — as two
    short sorts, :func:`ranks_in_sorted`, not an m+1-probe binary
    search (measured 0.4 vs 2.1 ms) — serving the colnorm AND, via the
    carry, the next iteration's indptr."""
    kcsc, vals, starts_ext, ok = state  # compacted CSC elems [elem_pad]
    idx = jnp.arange(p_pad, dtype=jnp.int32)
    ku = jax.lax.bitcast_convert_type(kcsc, jnp.uint32) ^ np.uint32(2**31)
    col_f = (ku // np.uint32(m)).astype(jnp.int32)
    row_f = (ku % np.uint32(m)).astype(jnp.int32)
    valid_f = kcsc != _I32_MAX
    # CSC column pointers: the carried positions (no search).
    indptr = starts_ext
    col_deg = indptr[1:] - indptr[:-1]
    # Element f = (k=row_f, c=col_f) pairs with CSC column row_f.
    a_k = jnp.where(valid_f, row_f, 0)
    deg = jnp.where(valid_f, col_deg[jnp.minimum(a_k, m - 1)], 0)
    offsets = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(deg).astype(jnp.int32)]
    )
    p_total = offsets[-1]
    # Overflow-proof budget check: the int32 cumsum wraps for true
    # P ≥ 2³¹ and could land back inside [0, p_pad]; an independent f32
    # total (error ≪ 2³¹ at any realistic P) catches the wrap, so the
    # ``ok`` fallback really is exact — the stepwise path it replaces
    # computed P on host in int64.
    p_f = jnp.sum(deg.astype(jnp.float32))
    ok = (
        ok
        & (p_total >= 0)
        & (p_total <= p_pad)
        & (p_f <= jnp.float32(p_pad) * 1.001 + 1024.0)
        & (jnp.abs(p_f - p_total.astype(jnp.float32))
           <= 0.01 * p_f + 1024.0)
    )
    p_clamped = jnp.clip(p_total, 0, p_pad)
    if join not in ("auto", "fill", "gather"):
        raise ValueError(
            f"join={join!r}: expected 'auto', 'fill', or 'gather'"
        )
    if join == "auto":
        join = "fill" if _fill_pack_ok(elem_pad, m) else "gather"
    if join == "fill":
        # ---- gather-free join: packed creation broadcast + combined
        # sort + last-observation fill (see _loop_expand_fill); the
        # merge stream grows by the elem_pad table slots (sentinels) ----
        fill_passes = max(
            1, int(np.ceil(np.log2(min(elem_pad, p_pad) + 1)))
        )
        key, v = _loop_expand_fill(
            kcsc, vals, col_f, valid_f, indptr[a_k], offsets, p_clamped,
            p_pad=p_pad, elem_pad=elem_pad, m=m, fill_passes=fill_passes,
        )
        stream_pad = p_pad + elem_pad
    else:
        # ---- role-flipped expand: broadcast (col_f, val_f), gather
        # (row_j, val_j) from the SAME stream's CSC columns ----
        c_bcast, r_gath, v = expand_partial_products(
            jnp.where(valid_f, col_f, m),
            jnp.where(valid_f, vals, 0.0),
            a_k, indptr, row_f, vals, offsets, p_clamped, p_pad, m,
        )
        # C's CSC key: colC·m + rowC — duplicates adjacent after one
        # sort, and the merged output lands directly in resident order.
        key = jnp.where(
            idx < p_clamped, pack_key_biased(c_bcast, r_gath, m), _I32_MAX
        )
        stream_pad = p_pad
    key_s, v_s = jax.lax.sort((key, v), num_keys=1, is_stable=False)
    from outerspace_tpu.ops.spgemm import merge_epilogue

    _, _, v2, valid2, _ = merge_epilogue(
        key_s, v_s, m, m, None,
        pad_count=jnp.int32(stream_pad) - p_clamped,
    )
    # ---- inflation / prune on the sorted stream, then compact FIRST
    # (the second 2-stream sort) and column-normalise at ELEM scale:
    # the survivor set is the same either side of the compaction, so
    # normalising the compacted stream is exact — and the segmented
    # colsum pass runs over elem_pad instead of p_pad (measured 4.9 ms
    # at 917K vs ~1 ms at 164K on chip) ----
    # prune on RAW merged values (v^p > t ⟺ v > t^(1/p), v ≥ 0, p > 0):
    # the p_pad-sized transcendental is deferred past the compaction
    # and runs at elem scale on survivors only
    thr_root = np.float32(float(threshold) ** (1.0 / float(inflation)))
    v2r = jnp.where(valid2, jnp.maximum(v2, 0.0), 0.0)
    survive = valid2 & (v2r > thr_root)
    ckey2 = jnp.where(survive, key_s, _I32_MAX)
    nnz_next = jnp.sum(survive.astype(jnp.int32))
    ok = ok & (nnz_next <= elem_pad)
    if blk_cap:
        k_next, vp_next, ok_cap = compact_masked_stream(
            ckey2, jnp.where(survive, v2r, 0.0), elem_pad, cap=blk_cap
        )
        ok = ok & ok_cap
    else:
        k_next, vp_next = jax.lax.sort(
            (ckey2, jnp.where(survive, v2r, 0.0)),
            num_keys=1, is_stable=False,
        )
        k_next, vp_next = k_next[:elem_pad], vp_next[:elem_pad]
    vp_next = jnp.power(vp_next, np.float32(inflation))
    ku2 = jax.lax.bitcast_convert_type(k_next, jnp.uint32) ^ np.uint32(2**31)
    kcol = (ku2 // np.uint32(m)).astype(jnp.int32) + KEY_BIAS
    # THE iteration's one rank pass: column positions of the new stream
    # (packed-key probes c·m land at the same positions as column
    # probes c since row < m), shared by the colnorm and — via the
    # carry — the next iteration's indptr. Two short sorts instead of
    # the m+1-probe binary search (measured 0.4 vs 2.1 ms in-iteration).
    starts_next = _column_starts(k_next, m)
    colsum_bc = _csc_colnorm_sorted(kcol, vp_next, m, starts_next)
    valid_next = k_next != _I32_MAX
    v_next = jnp.where(valid_next, vp_next / colsum_bc, 0.0)
    return (k_next, v_next, starts_next, ok)


def _stage1_squaring(tplan):
    """Run the MCL chain's first squaring over whichever host plan the
    autotuner picked for the flow operand — the row-partitioned tiled
    plan (skewed flows) or the pure windowed-gather pipeline (low-skew;
    measured faster on the rmat14-scale MCL flow: the A² records show
    the gather pipeline at 23.7 vs 36.5 ms/op on that shape)."""
    from outerspace_tpu.ops.gather_pipeline import (
        GatherPipelinePlan,
        spgemm_gather_padded,
    )
    from outerspace_tpu.ops.spgemm import spgemm_padded_tiled_parts

    if isinstance(tplan, GatherPipelinePlan):
        return spgemm_gather_padded(tplan)
    return spgemm_padded_tiled_parts(tplan)


def mcl_whole_traced(
    tplan, *, p_pad: int, nnz_pad: int, m: int, n_cols: int, iters: int,
    inflation: float, threshold: float, elem_pad: int | None = None,
    p_pads: tuple[int, ...] | None = None,
    blk_caps: tuple[int, ...] | None = None,
    join: str = "auto",
):
    """The ENTIRE staged MCL as one traceable program: tiled first
    squaring (Pallas expand over the host plan) + inflation + compaction
    into the small static loop buffers + the remaining iterations'
    fori_loop + final compaction — callers jit-close over the plan, so a
    run is a single dispatch with one scalar sync. Returns
    (rows[nnz_pad], cols, vals, nnz, ok); ``ok`` guards every static
    budget (compaction overflow ⇒ caller falls back to the exact
    stepwise chain).

    ``p_pads`` (static, one entry per loop iteration) schedules PER-
    ITERATION product buffers: MCL product counts collapse as the flow
    converges (measured rmat14: P = 562K → 326K → 43K over the loop
    squarings), so each iteration runs at a buffer sized by the host
    sweep for ITS squaring instead of all sharing the worst case.
    Consecutive equal sizes share one ``fori_loop`` body (one compile
    per distinct size); the loop state is elem_pad-sized throughout, so
    phases compose with no re-staging, and each iteration's true P
    stays ok-guarded.

    ``blk_caps`` (static): per-squaring max-survivors-per-8192-block
    bounds from the host sizing sweep — entry 0 for the stage-1
    compaction, entries 1.. for the loop iterations (0 = no bound ⇒
    that compaction keeps the plain full sort). A bound routes the
    compaction through :func:`compact_masked_stream` (measured ~2×
    faster at stage-1 scale); its per-block guard folds into ``ok``,
    so a mis-sized cap degrades to the exact fallback, never to a
    wrong answer."""
    from outerspace_tpu.ops.spgemm import (
        merge_epilogue,
        unpack_key_biased,
    )

    sq = _stage1_squaring(tplan)
    L = sq.rows.shape[0]
    # ---- inflation with ONE L-sized pass: prune first on the
    # unnormalised powered values (the reference/scipy semantics — the
    # prune decision does not need column sums), then a single masked
    # CSC-key 2-stream sort BOTH compacts the survivors to the front
    # AND delivers the loop's resident CSC order, so the stream can be
    # sliced straight into the small element buffers and everything
    # after (column-normalise included) runs at elem scale. Cheaper
    # compactions were hunted and lost on chip at rmat14's ~10M-slot
    # stage-1 stream: TPU random access costs ~9-14 ns/element
    # REGARDLESS of operand size (even a 20K-entry cumsum table is not
    # kept hot), so every gather/scatter/searchsorted-based scheme —
    # rank-gather (94 ms), monotone-dest scatter (131 ms), scatter-idx
    # + gather (89 ms), block-sort + block-table search (104 ms) —
    # loses to the one 45 ms sort. What made the old tail slow was not
    # this sort but the column-normalise it ran at L scale; that now
    # costs one elem-scale segmented pass. ----
    # Prune on RAW merged values via the monotone-equivalent threshold:
    # v^p > t  ⟺  v > t^(1/p) for v ≥ 0, p > 0 — so the L-sized
    # transcendental pass (power over the whole padded product stream)
    # is deferred past the compaction and runs at ELEM scale on
    # survivors only (~1% of L here). The f64 host constant is also
    # strictly closer to the f64 reference semantics than comparing an
    # f32-rounded power against t.
    assert inflation > 0.0
    thr_root = np.float32(float(threshold) ** (1.0 / float(inflation)))
    v_raw = jnp.where(sq.valid, jnp.maximum(sq.vals, 0.0), 0.0)
    survive = sq.valid & (v_raw > thr_root)
    kcsc = jnp.where(
        survive, sq.cols * np.int32(m) + sq.rows + KEY_BIAS, _I32_MAX
    )
    if elem_pad is None:
        # MCL flows transiently GROW before converging (squaring
        # densifies faster than pruning thins for the first iterations),
        # so the per-iteration element budget needs margin over the
        # FINAL nnz budget; the ok flag still guards it exactly.
        elem_pad = round_up_bucket(4 * nnz_pad, min_size=4096)
    elem_pad = min(max(elem_pad, nnz_pad), p_pad)
    nnz1 = jnp.sum(survive.astype(jnp.int32))
    # truncation guard: slicing the sorted stream(s) to elem_pad may
    # only drop sentinel slots, never real survivors (per-split slices
    # are safe under the SAME guard: each split's survivors ≤ nnz1)
    ok = nnz1 <= elem_pad
    cap1 = blk_caps[0] if blk_caps else 0
    n_split = 8 if L >= 16 * elem_pad else 1
    if cap1 and L >= 16 * elem_pad:
        # sized in-block compaction (see compact_masked_stream): the
        # host sweep bounded every 8192-block's survivors, so the
        # CSC-reorder sort runs a blk-deep network + one short combine
        kp, vp, ok_cap = compact_masked_stream(
            kcsc, v_raw, elem_pad, cap=cap1
        )
        ok = ok & ok_cap
    elif n_split > 1:
        # comparator networks scale ~log²n, so 8 short sorts + one
        # elem-scale combine beat the monolith (measured at rmat14's
        # 10M-slot stream: 41.6 vs 52.6 ms)
        C = -(-L // n_split)
        pad = n_split * C - L
        if pad:
            kcsc = jnp.concatenate(
                [kcsc, jnp.full(pad, _I32_MAX, jnp.int32)]
            )
            v_raw = jnp.concatenate([v_raw, jnp.zeros(pad, jnp.float32)])
        parts_k, parts_v = [], []
        for s in range(n_split):
            ks, vs = jax.lax.sort(
                (kcsc[s * C:(s + 1) * C], v_raw[s * C:(s + 1) * C]),
                num_keys=1, is_stable=False,
            )
            parts_k.append(ks[: min(elem_pad, C)])
            parts_v.append(vs[: min(elem_pad, C)])
        kc_cat = jnp.concatenate(parts_k)
        vp_cat = jnp.concatenate(parts_v)
        kc_full, vp_full = jax.lax.sort(
            (kc_cat, vp_cat), num_keys=1, is_stable=False
        )
        kp, vp = kc_full[:elem_pad], vp_full[:elem_pad]
    else:
        kc_full, vp_full = jax.lax.sort(
            (kcsc, v_raw), num_keys=1, is_stable=False
        )
        if L >= elem_pad:
            kp, vp = kc_full[:elem_pad], vp_full[:elem_pad]
        else:
            ext = elem_pad - L
            kp = jnp.concatenate(
                [kc_full, jnp.full(ext, _I32_MAX, jnp.int32)]
            )
            vp = jnp.concatenate([vp_full, jnp.zeros(ext, jnp.float32)])
    valid1 = kp != _I32_MAX
    # deferred inflation: the compacted stream carries RAW merged
    # values; the transcendental runs here at elem scale (the prune
    # above used the monotone-equivalent raw threshold)
    vp = jnp.where(
        valid1, jnp.power(jnp.maximum(vp, 0.0), np.float32(inflation)), 0.0
    )
    colu, _ = unpack_key_biased(kp, m)  # key = col·m + row
    kcol = colu.astype(jnp.int32) + KEY_BIAS  # sorted too
    # One search serves the stage-1 colnorm AND seeds the loop carry's
    # column positions (packed-key probes c·m land at the same stream
    # positions as column probes c).
    starts1 = _column_starts(kp, m)
    colsum_bc = _csc_colnorm_sorted(kcol, vp, m, starts1)
    vnp_ = jnp.where(valid1, vp / colsum_bc, 0.0)

    state = (kp, vnp_, starts1, ok)
    if p_pads is None:
        p_pads = (p_pad,) * iters
    if len(p_pads) != iters:
        raise ValueError(
            f"p_pads has {len(p_pads)} entries for {iters} iterations"
        )
    # per-iteration compaction caps (entry 0 was stage-1's); absent or
    # wrong-length schedules disable the bound (plain sorts) — a cap
    # schedule is an optimization, never a correctness input
    iter_caps = (
        blk_caps[1:]
        if blk_caps and len(blk_caps) == iters + 1
        else (0,) * iters
    )
    # run-length segments of equal (size, cap): one fori body compile
    # each
    i = 0
    while i < iters:
        j = i
        while (
            j < iters
            and p_pads[j] == p_pads[i]
            and iter_caps[j] == iter_caps[i]
        ):
            j += 1
        seg_p_pad = max(min(p_pads[i], p_pad), elem_pad)

        def body(_, state, _pp=seg_p_pad, _cap=iter_caps[i]):
            return _mcl_iteration(
                state, p_pad=_pp, elem_pad=elem_pad, m=m,
                inflation=inflation, threshold=threshold, blk_cap=_cap,
                join=join,
            )

        if j - i == 1:
            state = body(0, state)
        else:
            state = jax.lax.fori_loop(0, j - i, body, state)
        i = j
    k_out, v_out, _, ok = state
    valid = k_out != _I32_MAX
    nnz = jnp.sum(valid.astype(jnp.int32))
    ok = ok & (nnz <= nnz_pad)
    # ---- one row-major sort for the outward-facing CSR contract ----
    cols_o, rows_o = unpack_key_biased(k_out, m)
    krow = jnp.where(
        valid, rows_o * np.int32(n_cols) + cols_o + KEY_BIAS, _I32_MAX
    )
    k_r, v_r = jax.lax.sort((krow, v_out), num_keys=1, is_stable=False)
    r2, c2 = unpack_key_biased(k_r[:nnz_pad], n_cols)
    valid_o = k_r[:nnz_pad] != _I32_MAX
    r2 = jnp.where(valid_o, r2, m)
    c2 = jnp.where(valid_o, c2, 0)
    return r2, c2, jnp.where(valid_o, v_r[:nnz_pad], 0.0), nnz, ok


@functools.partial(jax.jit, static_argnames=("m",))
def _flow_stats_jit(rows, cols, valid, *, m: int):
    """[nnz (exact int32 — a float cast would be lossy above 2²⁴ and
    the validity mask built from it must be exact), P of M@M (f32 for
    bucket sizing only, bitcast INTO the int32 lane — the fused loop's
    ``ok`` flag guards exactness against that approximation)] in one
    int32 fetch; decode with :func:`_decode_flow_stats`. Int32 is the
    container because f32 lanes flush denormal bit patterns to zero on
    the TPU (see :func:`_chain_stats_jit`)."""
    deg = jnp.zeros(m, jnp.float32).at[jnp.where(valid, rows, 0)].add(
        valid.astype(jnp.float32), mode="drop"
    )
    p = jnp.sum(jnp.where(valid, deg[jnp.minimum(cols, m - 1)], 0.0))
    return jnp.stack(
        [
            jnp.sum(valid.astype(jnp.int32)),
            jax.lax.bitcast_convert_type(p, jnp.int32),
        ]
    )


def _decode_flow_stats(stats_dev) -> tuple[int, int]:
    raw = np.asarray(stats_dev)
    return int(raw[0]), int(raw[1:2].view(np.float32)[0])


def markov_cluster_device_fused(
    merged0: MergedCOO,
    inflation: float = 2.0,
    iters: int = 10,
    prune_threshold: float = 1e-4,
    headroom: float = 1.5,
) -> MergedCOO:
    """MCL with two host syncs for the whole run (sizing stats before,
    nnz after). The static product budget is the first-squaring P
    (computed on device, fetched as one scalar pair) times ``headroom``
    — inflation pruning shrinks the flow after the first squaring, so
    later iterations fit the same buffers in practice; the device ``ok``
    flag triggers an exact stepwise fallback if one ever does not."""
    m, n = merged0.shape
    # strictly < 2^32: the device CSC-reorder key (col*m + row) would
    # collide with the int32 sentinel at the (m-1, m-1) corner
    assert m == n and m * n < 2**32
    if iters <= 0:
        return merged0
    nnz0, p1 = _decode_flow_stats(
        _flow_stats_jit(merged0.rows, merged0.cols, merged0.valid, m=m)
    )
    p_budget = int(p1 * headroom) + 4096
    if p_budget >= 2**31:
        return markov_cluster_device(
            merged0, inflation=inflation, iters=iters,
            prune_threshold=prune_threshold,
        )
    # Fit the input stream into the loop buffers: device-compact it
    # first when its (possibly huge, e.g. a prior tiled squaring's)
    # padding exceeds the loop budget.
    n_in = int(merged0.rows.shape[0])
    nnz_pad0 = round_up_bucket(max(nnz0, 1), min_size=1024)
    if n_in > max(p_budget, nnz_pad0):
        n_in = min(nnz_pad0, n_in)
        r0, c0, v0 = _slice_compact_jit(
            merged0.rows, merged0.cols, merged0.vals, merged0.valid,
            p_pad=int(merged0.rows.shape[0]), nnz_pad=n_in,
        )
        valid0 = jnp.arange(n_in, dtype=jnp.int32) < nnz0
        merged0 = MergedCOO(
            (m, n), r0, c0, v0, valid0, jnp.int32(nnz0)
        )
    p_pad = round_up_bucket(max(p_budget, n_in, 4096), min_size=4096)
    # 4x margin over the entry nnz: flows transiently grow (see
    # mcl_whole_traced); the ok flag guards, stepwise fallback is exact.
    elem_pad = min(
        round_up_bucket(max(4 * nnz0, 4096), min_size=4096),
        p_pad,
    )
    # Enter the loop's CSC-resident (key, value) form: pack + one sort.
    kcsc0, vals0 = _to_csc_state_jit(
        merged0.rows, merged0.cols, merged0.vals, merged0.valid,
        p_pad=elem_pad, m=m,
    )
    k_out, v_out, _, ok = _mcl_fused_jit(
        kcsc0, vals0,
        p_pad=p_pad, elem_pad=elem_pad, m=m, n=n, iters=iters,
        inflation=float(inflation), threshold=float(prune_threshold),
    )
    if not bool(np.asarray(ok)):  # budget exceeded: exact stepwise path
        return markov_cluster_device(
            merged0, inflation=inflation, iters=iters,
            prune_threshold=prune_threshold,
        )
    # Convert back to the row-major MergedCOO contract + slice on device
    # before anything is fetched: the final flow is tiny relative to the
    # loop buffers, and the tunnel link moves ~MB/s.
    nnz = int(np.asarray(jnp.sum((k_out != _I32_MAX).astype(jnp.int32))))
    nnz_pad = min(round_up_bucket(max(nnz, 1), min_size=1024), p_pad)
    r2, c2, v2 = _from_csc_state_jit(
        k_out, v_out, m=m, n=n, nnz_pad=nnz_pad
    )
    valid2 = jnp.arange(nnz_pad, dtype=jnp.int32) < nnz
    return MergedCOO((m, n), r2, c2, v2, valid2, jnp.int32(nnz))


@functools.partial(jax.jit, static_argnames=("p_pad", "m"))
def _to_csc_state_jit(rows, cols, vals, valid, *, p_pad: int, m: int):
    """Pack a masked COO stream into the loop's CSC-resident state:
    (sorted biased ``col·m + row`` keys with sentinel tail, values),
    sliced/padded to ``p_pad``. Sorts BEFORE slicing, so truncation can
    only drop sentinel slots (caller guarantees nnz <= p_pad)."""
    n_in = rows.shape[0]
    key = jnp.where(
        valid, cols * np.int32(m) + rows + KEY_BIAS, _I32_MAX
    )
    v = jnp.where(valid, vals, 0.0)
    key, v = jax.lax.sort((key, v), num_keys=1, is_stable=False)
    if n_in < p_pad:
        key = jnp.concatenate(
            [key, jnp.full(p_pad - n_in, _I32_MAX, jnp.int32)]
        )
        v = jnp.concatenate([v, jnp.zeros(p_pad - n_in, jnp.float32)])
    else:
        key, v = key[:p_pad], v[:p_pad]
    return key, v


@functools.partial(jax.jit, static_argnames=("m", "n", "nnz_pad"))
def _from_csc_state_jit(kcsc, vals, *, m: int, n: int, nnz_pad: int):
    """CSC-resident state back to row-major compacted (rows, cols, vals)."""
    from outerspace_tpu.ops.spgemm import unpack_key_biased

    valid = kcsc != _I32_MAX
    cols_o, rows_o = unpack_key_biased(kcsc, m)
    krow = jnp.where(
        valid, rows_o * np.int32(n) + cols_o + KEY_BIAS, _I32_MAX
    )
    k_r, v_r = jax.lax.sort((krow, vals), num_keys=1, is_stable=False)
    r2, c2 = unpack_key_biased(k_r[:nnz_pad], n)
    valid_o = k_r[:nnz_pad] != _I32_MAX
    return (
        jnp.where(valid_o, r2, m),
        jnp.where(valid_o, c2, 0),
        jnp.where(valid_o, v_r[:nnz_pad], 0.0),
    )


@functools.partial(jax.jit, static_argnames=("p_pad", "nnz_pad"))
def _slice_compact_jit(rows, cols, vals, valid, *, p_pad: int, nnz_pad: int):
    from outerspace_tpu.ops.spgemm import _compact_device

    cr, cc, cv = _compact_device(rows, cols, vals, valid, p_pad=p_pad)
    return cr[:nnz_pad], cc[:nnz_pad], cv[:nnz_pad]
