"""TPU SpGEMM: outer-product multiply phase + sort/segment-scan merge phase.

The reference's simulated pipeline (``SimOuterSPACE.cpp``) maps to three
device stages, all static-shape and jit-compiled:

1. **multiply/expand** — every nonzero *e* of A (CSC order) is paired with
   all of row ``col(e)`` of B, materialising ``P`` partial products
   ``(out_row, out_col, a_val·b_val)``. The simulated 256 multiplier PEs
   (``PEMultiplier``, ``SimOuterSPACE.cpp:501-552``) become one vectorised
   program over the padded expansion index space. Per-segment broadcasts
   (owning A-nonzero → every partial-product slot) are done with an exact
   *bitcast-diff + wraparound-cumsum* trick instead of P-sized gathers:
   int32 addition is modular, so scattering value *diffs* at segment starts
   and cumsumming reconstructs the exact bit pattern — this turns five
   O(P) gathers into two cheap cumsums; only the B-side lookups remain
   true gathers.
2. **merge/sort** — partial products sort by output coordinate. When
   ``m·n ≤ 2^32`` the (row, col) pair packs into one *biased-uint32*
   int32 key (``row·n + col - 2^31`` with wraparound: signed int32 order
   equals unsigned order of ``row·n + col``), giving the cheapest
   single-key two-operand sort; only larger shapes fall back to a two-key
   variadic sort. Packed streams are **sentinel-free**: padding slots
   replicate a real in-stream coordinate with value 0 (a no-op under
   accumulation), so every slot is a genuine coordinate and validity is
   just run-last-ness. This replaces the per-row concat+sort of the merge
   PEs (``PEMerger``, ``SimOuterSPACE.cpp:554-606``): on a TPU one large
   sort beats many tiny ones.
3. **merge/accumulate** — duplicate coordinates are summed with a
   Hillis–Steele *segmented* inclusive scan (log₂ P shift/select passes —
   contiguous vector ops, no scatter), keeping the last element of every
   run. Fixes the reference's inverted dedup (``SimOuterSPACE.cpp:120-125``).

Everything runs on padded buffers sized by the symbolic pass
(``ops/symbolic.py``); invalid tail slots carry a sentinel that sorts past
every real coordinate. Results stay on device as masked padded COO
(``MergedCOO``); compaction to host CSR is a separate step so chained
device-resident pipelines never pay for it.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from outerspace_tpu.formats.coo import COO, INDEX_DTYPE, VALUE_DTYPE
from outerspace_tpu.formats.csr import CSC, CSR
from outerspace_tpu.ops.symbolic import ExpansionPlan, expansion_plan

_I32_MAX = np.int32(2**31 - 1)
# Biased-uint32 key packing: key = row·n + col - 2^31 with int32
# wraparound. Signed int32 order of the biased key == unsigned uint32
# order of row·n + col, so one int32 sort covers every m·n ≤ 2^32.
KEY_BIAS = np.int32(-(2**31))


def pack_key_biased(rows: jax.Array, cols: jax.Array, n_cols: int) -> jax.Array:
    """Pack (row, col) into one biased-uint32 int32 sort key (m·n ≤ 2^32)."""
    return rows * np.int32(n_cols) + cols + KEY_BIAS


def unpack_key_biased(key: jax.Array, n_cols: int):
    """Inverse of :func:`pack_key_biased` (uint32 div/mod)."""
    ku = jax.lax.bitcast_convert_type(key, jnp.uint32) ^ np.uint32(2**31)
    row = (ku // np.uint32(n_cols)).astype(jnp.int32)
    col = (ku % np.uint32(n_cols)).astype(jnp.int32)
    return row, col


# --------------------------------------------------------------------------
# Expand (multiply phase)
# --------------------------------------------------------------------------


def _segment_broadcast_bits(per_segment: jax.Array, starts: jax.Array, p_pad: int):
    """Broadcast ``per_segment[e]`` (any 32-bit payload, given as int32 bit
    patterns) to every position of segment ``e``, where segment *e* spans
    ``[starts[e], starts[e+1])`` of a length-``p_pad`` stream.

    Exactness: int32 addition is mod 2³², so cumsum of scattered diffs
    telescopes to the original bit pattern; zero-length segments cancel.
    """
    diffs = jnp.concatenate([per_segment[:1], per_segment[1:] - per_segment[:-1]])
    d = jnp.zeros(p_pad, dtype=jnp.int32).at[starts].add(diffs, mode="drop")
    return jnp.cumsum(d)


def expand_partial_products(
    a_rows: jax.Array,  # int32[nnz_a]  output row of each A nonzero (CSC order)
    a_vals: jax.Array,  # f32[nnz_a]
    a_k: jax.Array,  # int32[nnz_a]   outer index (column of A) of each nonzero
    b_indptr: jax.Array,  # int32[k+1]
    b_cols: jax.Array,  # int32[nnz_b]
    b_vals: jax.Array,  # f32[nnz_b]
    offsets: jax.Array,  # int32[nnz_a+1]  expansion offsets
    p_total: jax.Array,  # int32 scalar: true P (≤ p_pad)
    p_pad: int,
    sentinel_row: int,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Multiply phase over a static index space [0, p_pad)."""
    p = jnp.arange(p_pad, dtype=jnp.int32)
    starts = offsets[:-1]
    # Owning-segment broadcasts (exact, gather-free).
    row = _segment_broadcast_bits(a_rows, starts, p_pad)
    aval_bits = _segment_broadcast_bits(
        jax.lax.bitcast_convert_type(a_vals, jnp.int32), starts, p_pad
    )
    a_val = jax.lax.bitcast_convert_type(aval_bits, jnp.float32)
    # j = position into B's flat arrays: affine in p within each segment.
    jb = b_indptr[a_k] - starts  # int32[nnz_a], per-segment shift
    j = _segment_broadcast_bits(jb, starts, p_pad) + p
    valid = p < p_total
    j_safe = jnp.where(valid, j, 0)
    out_row = jnp.where(valid, row, sentinel_row).astype(jnp.int32)
    # ONE packed-pair gather instead of two: TPU gathers are charged
    # per accessed row (~9-14 ns regardless of row width), so fetching
    # (b_col, b_val) as one (nnz_b, 2) row halves the expand's random-
    # access bill (measured 12.7 → 2.6 ms per 917K-product pass on
    # chip); the (nnz_b, 2) pack itself is one contiguous write.
    b_pair = jnp.stack(
        [b_cols, jax.lax.bitcast_convert_type(b_vals, jnp.int32)], axis=1
    )
    pair = b_pair[j_safe]
    out_col = pair[:, 0]
    b_val = jax.lax.bitcast_convert_type(pair[:, 1], jnp.float32)
    val = jnp.where(valid, a_val * b_val, 0.0)
    return out_row, out_col, val


# --------------------------------------------------------------------------
# Merge (sort + segmented accumulate)
# --------------------------------------------------------------------------


def _shift_right(x: jax.Array, d: int, fill) -> jax.Array:
    return jnp.concatenate([jnp.full((d,), fill, dtype=x.dtype), x[:-d]])


def segmented_sum_sorted(
    vals: jax.Array, first: jax.Array, max_run: int | None = None
) -> tuple[jax.Array, jax.Array]:
    """Per-run inclusive sums of ``vals`` where runs start at ``first``;
    returns (scanned vals, is_last mask). Hillis–Steele doubling: log₂ of
    the longest run in shift/select/add passes — all contiguous vector
    work. ``max_run`` (host-known upper bound on duplicates per output
    coordinate, ≤ max nnz per row of A) truncates the pass count.
    """
    n = vals.shape[0]
    limit = n if max_run is None else min(max(int(max_run), 1), n)
    flag = first
    d = 1
    while d < limit:
        prev_v = _shift_right(vals, d, 0.0)
        prev_f = _shift_right(flag, d, True)
        vals = vals + jnp.where(flag, 0.0, prev_v)
        flag = flag | prev_f
        d *= 2
    is_last = jnp.concatenate([first[1:], jnp.ones(1, dtype=jnp.bool_)])
    return vals, is_last


def merge_packed_keys(
    key: jax.Array,
    vals: jax.Array,
    n_cols: int,
    sentinel_row: int,
    max_run: int | None = None,
):
    """Merge a stream of already-packed int32 keys (``row·n + col``,
    sentinel = INT32_MAX): sort, segmented-scan accumulate, unpack."""
    # Unstable sort is ~1.4x faster on TPU; stability only permutes the
    # float accumulation order within equal keys (tolerance-covered).
    key, vals = jax.lax.sort((key, vals), num_keys=1, is_stable=False)
    first = jnp.concatenate(
        [jnp.ones(1, dtype=jnp.bool_), key[1:] != key[:-1]]
    )
    summed, is_last = segmented_sum_sorted(vals, first, max_run)
    valid_out = is_last & (key != _I32_MAX)
    out_row = jnp.where(valid_out, key // np.int32(n_cols), sentinel_row)
    out_col = jnp.where(valid_out, key % np.int32(n_cols), 0)
    out_val = jnp.where(valid_out, summed, 0.0)
    nnz = jnp.sum(valid_out.astype(jnp.int32))
    return out_row, out_col, out_val, valid_out, nnz


def merge_packed(
    rows: jax.Array,
    cols: jax.Array,
    vals: jax.Array,
    n_cols: int,
    sentinel_row: int,
    max_run: int | None = None,
):
    """Merge via a single packed int32 key — requires m·n < 2³¹
    (legacy sentinel-keyed variant; the main pipeline uses
    :func:`merge_biased_keys`)."""
    valid = rows < sentinel_row
    key = jnp.where(valid, rows * np.int32(n_cols) + cols, _I32_MAX)
    return merge_packed_keys(key, vals, n_cols, sentinel_row, max_run)


def _scan_kernel_applicable(n: int) -> bool:
    """The Pallas epilogue needs a pow2 chunk divisor ≥ 1024."""
    return (n & -n) >= 1024 and n >= 4096


def merge_biased_keys(
    key: jax.Array,
    vals: jax.Array,
    n_cols: int,
    sentinel_row: int,
    max_run: int | None = None,
    pad_count: jax.Array | int = 0,
    epilogue: str | None = None,
    interpret: bool = False,
):
    """Merge a stream of biased-uint32 packed keys
    (:func:`pack_key_biased`): sort, segmented-scan accumulate, unpack.

    Padding slots carry the sentinel ``INT32_MAX`` with value 0. At
    m·n = 2^32 exactly, the real corner coordinate (m-1, n-1) *is* the
    sentinel bit pattern; it is recovered exactly: its run total is an
    order-invariant masked sum (immune to ``max_run`` truncation — the
    sentinel run can exceed any duplicate bound), and it is real iff the
    stream holds more sentinel slots than the ``pad_count`` known padding
    slots. For m·n < 2^32 no real key reaches the sentinel and this
    reduces to plain discard-the-padding.

    ``epilogue``: "pallas" fuses everything after the sort into one
    HBM pass (``ops.pallas.scan``); "xla" keeps the shift/select passes;
    None auto-picks pallas on a TPU backend when the shape allows.
    """
    key, vals = jax.lax.sort((key, vals), num_keys=1, is_stable=False)
    return merge_epilogue(
        key, vals, n_cols, sentinel_row, max_run,
        pad_count=pad_count, epilogue=epilogue, interpret=interpret,
    )


def merge_epilogue(
    key: jax.Array,
    vals: jax.Array,
    n_cols: int,
    sentinel_row: int,
    max_run: int | None = None,
    pad_count: jax.Array | int = 0,
    epilogue: str | None = None,
    interpret: bool = False,
):
    """Everything after the sort: segmented accumulate + unpack +
    validity/nnz over an ALREADY-SORTED biased-key stream (also usable
    standalone for any sorted segmented-sum, e.g. MCL's per-column
    totals with ``n_cols=1``)."""
    n = key.shape[0]
    if epilogue is None:
        epilogue = (
            "pallas"
            if jax.default_backend() == "tpu" and _scan_kernel_applicable(n)
            else "xla"
        )
    if epilogue == "pallas":
        from outerspace_tpu.ops.pallas.scan import merge_epilogue_scan

        return merge_epilogue_scan(
            key, vals, jnp.asarray(pad_count, jnp.int32),
            n_cols=n_cols, sentinel_row=sentinel_row, max_run=max_run,
            interpret=interpret,
        )
    first = jnp.concatenate(
        [jnp.ones(1, dtype=jnp.bool_), key[1:] != key[:-1]]
    )
    summed, is_last = segmented_sum_sorted(vals, first, max_run)
    is_sent = key == _I32_MAX
    corner_sum = jnp.sum(jnp.where(is_sent, vals, 0.0))
    corner_real = jnp.sum(is_sent.astype(jnp.int32)) > pad_count
    summed = jnp.where(is_sent, corner_sum, summed)
    valid_out = is_last & (~is_sent | corner_real)
    row, col = unpack_key_biased(key, n_cols)
    out_row = jnp.where(valid_out, row, sentinel_row)
    out_col = jnp.where(valid_out, col, 0)
    out_val = jnp.where(valid_out, summed, 0.0)
    nnz = jnp.sum(valid_out.astype(jnp.int32))
    return out_row, out_col, out_val, valid_out, nnz


def merge_twokey(
    rows: jax.Array,
    cols: jax.Array,
    vals: jax.Array,
    sentinel_row: int,
    max_run: int | None = None,
):
    """Merge via a two-key variadic sort — general shapes."""
    rows, cols, vals = jax.lax.sort(
        (rows, cols, vals), num_keys=2, is_stable=False
    )
    first = jnp.concatenate(
        [
            jnp.ones(1, dtype=jnp.bool_),
            (rows[1:] != rows[:-1]) | (cols[1:] != cols[:-1]),
        ]
    )
    summed, is_last = segmented_sum_sorted(vals, first, max_run)
    valid_out = is_last & (rows < sentinel_row)
    out_row = jnp.where(valid_out, rows, sentinel_row)
    out_col = jnp.where(valid_out, cols, 0)
    out_val = jnp.where(valid_out, summed, 0.0)
    nnz = jnp.sum(valid_out.astype(jnp.int32))
    return out_row, out_col, out_val, valid_out, nnz


# --------------------------------------------------------------------------
# Whole-pipeline jit
# --------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=("p_pad", "sentinel_row", "n_cols", "packed", "max_run"),
)
def _spgemm_device(
    a_rows,
    a_vals,
    a_k,
    b_indptr,
    b_cols,
    b_vals,
    offsets,
    p_total,
    *,
    p_pad: int,
    sentinel_row: int,
    n_cols: int,
    packed: bool,
    max_run: int | None = None,
):
    r, c, v = expand_partial_products(
        a_rows, a_vals, a_k, b_indptr, b_cols, b_vals, offsets, p_total,
        p_pad, sentinel_row,
    )
    if packed:
        valid = jnp.arange(p_pad, dtype=jnp.int32) < p_total
        key = jnp.where(valid, pack_key_biased(r, c, n_cols), _I32_MAX)
        return merge_biased_keys(
            key, v, n_cols, sentinel_row, max_run,
            pad_count=np.int32(p_pad) - p_total,
        )
    return merge_twokey(r, c, v, sentinel_row, max_run)


@functools.partial(jax.jit, static_argnames=("p_pad",))
def _compact_device(rows, cols, vals, valid, *, p_pad: int):
    """Front-compact masked merge output on device (3 scatters)."""
    dest = jnp.cumsum(valid.astype(jnp.int32)) - 1
    dest = jnp.where(valid, dest, p_pad - 1)
    out_r = jnp.full(p_pad, _I32_MAX, jnp.int32).at[dest].set(
        jnp.where(valid, rows, _I32_MAX)
    )
    out_c = jnp.zeros(p_pad, jnp.int32).at[dest].set(jnp.where(valid, cols, 0))
    out_v = jnp.zeros(p_pad, jnp.float32).at[dest].set(
        jnp.where(valid, vals, 0.0)
    )
    return out_r, out_c, out_v


# --------------------------------------------------------------------------
# Host-facing API
# --------------------------------------------------------------------------


@dataclasses.dataclass
class MergedCOO:
    """Device-resident merged result: padded, row-major sorted, masked."""

    shape: tuple[int, int]
    rows: jax.Array  # int32[p_pad], sentinel where ~valid
    cols: jax.Array
    vals: jax.Array
    valid: jax.Array  # bool[p_pad]
    nnz: jax.Array  # int32 scalar

    def to_csr(self) -> CSR:
        """Fetch to host and build an exact-nnz CSR."""
        rows = np.asarray(self.rows)
        cols = np.asarray(self.cols)
        vals = np.asarray(self.vals)
        valid = np.asarray(self.valid)
        rows, cols, vals = rows[valid], cols[valid], vals[valid]
        counts = np.bincount(rows, minlength=self.shape[0])
        indptr = np.zeros(self.shape[0] + 1, dtype=np.int64)
        np.cumsum(counts, out=indptr[1:])
        return CSR(self.shape, indptr, cols, vals)

    def to_coo(self) -> COO:
        c = self.to_csr()
        return c.to_coo()


def max_duplicate_run(plan: ExpansionPlan) -> int:
    """Host bound on duplicates per output coordinate — at most the max
    nnz of any output row of A — rounded up to a power of two so the
    segmented scan's (static) pass count caches across similar operands.
    Pass-count equivalence: ceil(log2(r)) == ceil(log2(next_pow2(r)))."""
    if plan.a_rows.shape[0] == 0:
        return 1
    r = int(np.bincount(plan.a_rows, minlength=plan.m).max(initial=1))
    return 1 << (max(r, 1) - 1).bit_length()


def plan_to_device(plan: ExpansionPlan) -> dict[str, jax.Array]:
    """Ship a symbolic plan's arrays to the default device (int32-narrowed).

    Raises if the expansion exceeds the int32 index space the device
    pipeline is built on (ADVICE: fail loudly instead of silently wrong).
    """
    if plan.expansion_size >= 2**31:
        raise ValueError(
            f"expansion size {plan.expansion_size} exceeds int32 index "
            "space; shard the operands (shard/spgemm_sharded.py)"
        )
    return dict(
        a_rows=jnp.asarray(plan.a_rows, dtype=jnp.int32),
        a_vals=jnp.asarray(plan.a_vals, dtype=jnp.float32),
        a_k=jnp.asarray(plan.a_k, dtype=jnp.int32),
        b_indptr=jnp.asarray(plan.b_indptr, dtype=jnp.int32),
        b_cols=jnp.asarray(plan.b_cols, dtype=jnp.int32),
        b_vals=jnp.asarray(plan.b_vals, dtype=jnp.float32),
        offsets=jnp.asarray(plan.offsets, dtype=jnp.int32),
        p_total=jnp.asarray(plan.expansion_size, dtype=jnp.int32),
    )


def can_pack(plan: ExpansionPlan) -> bool:
    """Biased-uint32 packing covers every m·n ≤ 2^32 (e.g. 65536²)."""
    return plan.m * plan.n <= 2**32


def spgemm_padded(
    plan: ExpansionPlan,
    p_pad: int | None = None,
    device_args: dict | None = None,
    packed: bool | None = None,
    max_run: int | None = None,
) -> MergedCOO:
    """Run SpGEMM on device; returns the padded device-resident result.

    ``max_run`` bounds duplicates per output coordinate (defaults to the
    exact host bound): it truncates the segmented scan's pass count.
    """
    if p_pad is None:
        p_pad = plan.padded_size()
    if plan.expansion_size > p_pad:
        raise ValueError(
            f"p_pad={p_pad} smaller than expansion size {plan.expansion_size}"
        )
    if packed is None:
        packed = can_pack(plan)
    if max_run is None:
        max_run = max_duplicate_run(plan)
    dev = device_args if device_args is not None else plan_to_device(plan)
    rows, cols, vals, valid, nnz = _spgemm_device(
        **dev,
        p_pad=int(p_pad),
        sentinel_row=int(plan.m),
        n_cols=int(plan.n),
        packed=bool(packed),
        max_run=int(max_run),
    )
    return MergedCOO((plan.m, plan.n), rows, cols, vals, valid, nnz)


# --------------------------------------------------------------------------
# Tiled strategy: Pallas dense-tile expand for heavy k + gather residue
# --------------------------------------------------------------------------


@dataclasses.dataclass
class TiledPlan:
    """Host-side plan for the scheduler-split (Pallas + gather) pipeline.

    ``device_args["classes"]`` holds one staged task table per tile class
    (``sched.planner.TILE_A_CLASSES``); ``device_args["light"]`` the
    gather-path residue plan.
    """

    m: int
    n: int
    class_plan: "object"  # sched.planner.ClassPlan
    light_plan: ExpansionPlan | None
    light_pad: int
    device_args: dict
    # Host bound on duplicates per output coordinate (max nnz per A row):
    # truncates the segmented scan's pass count.
    max_run: int | None = None
    # Windowed-gather residue (``ops.pallas.gexpand``): exact-P expansion
    # of the light k's the dense tiles would pad away; the remaining
    # window-incompatible elements stay in ``light_plan`` (XLA flat).
    gather_ngroups: int = 0
    gather_p_out: int = 0
    gather_p_real: int = 0
    # B-window (in 128-blocks) the gather residue planned with; selects
    # the gexpand kernel variant, so it must travel with the plan.
    gather_b_win: int = 0
    # per-slab-call owner-search depth (gplanner.call_search_bits)
    gather_call_bits: tuple[int, ...] | None = None

    @property
    def padded_total(self) -> int:
        return (
            self.class_plan.padded_heavy + self.light_pad + self.gather_p_out
        )


def plan_tiled(
    a_csc: CSC,
    b_csr: CSR,
    interpret: bool = False,
    waste_limit: float | None = None,
) -> TiledPlan:
    """Build the hybrid (tiles + gather residue + flat remainder) plan;
    ``waste_limit=None`` lets the cost model pick it per operand."""
    from outerspace_tpu.ops.symbolic import expansion_plan_subset
    from outerspace_tpu.ops.pallas.expand import schedule_to_device
    from outerspace_tpu.sched.planner import plan_outer_classes

    if waste_limit is None:
        from outerspace_tpu.sched.autotune import autotune

        waste_limit = autotune(a_csc, b_csr)[1]
    cp = plan_outer_classes(a_csc, b_csr, waste_limit=waste_limit)
    dev = {
        "classes": [
            schedule_to_device(c, b_csr.indices, b_csr.data)
            if c.ntasks > 0
            else None
            for c in cp.classes
        ]
    }
    light_plan = None
    light_pad = 0
    gather_ngroups = gather_p_out = gather_p_real = gather_b_win = 0
    gather_call_bits = None
    m, n = a_csc.shape[0], b_csr.shape[1]
    if m * n <= 2**32 and (
        cp.light_k.shape[0] > 0 or cp.edge_k.shape[0] > 0
    ):
        # Route the whole residue through the windowed-gather kernel
        # (exact P): light k's as whole rows (chunked past the window
        # bound) plus the partial edge blocks of trimmed k's. Nothing
        # is left for the XLA flat path.
        from outerspace_tpu.ops.pallas.gexpand import gather_plan_to_device
        from outerspace_tpu.sched.gplanner import plan_gather_ranges

        b_ptr = np.asarray(b_csr.indptr).astype(np.int64)
        nbv = b_csr.major_nnz().astype(np.int64)
        lk = cp.light_k.astype(np.int64)
        lk = lk[nbv[lk] > 0]
        gplan = plan_gather_ranges(
            a_csc,
            np.concatenate([lk, cp.edge_k]),
            np.concatenate([b_ptr[lk], cp.edge_jb]),
            np.concatenate([nbv[lk], cp.edge_len]),
            np.asarray(b_csr.indices),
            np.asarray(b_csr.data),
            m,
            n,
        )
        if gplan is not None:
            from outerspace_tpu.sched.gplanner import call_search_bits

            dev["gather"] = gather_plan_to_device(gplan)
            gather_ngroups = gplan.ngroups
            gather_p_out = gplan.p_out
            gather_p_real = gplan.p_real
            gather_b_win = gplan.b_win
            gather_call_bits = call_search_bits(
                gplan.group_width, gplan.ngroups
            )
    elif cp.light_k.shape[0] > 0 and cp.light_p > 0:
        light_plan = expansion_plan_subset(a_csc, b_csr, cp.light_k)
        if light_plan is not None:
            # 1024-multiple: class streams already are, so the whole
            # merged stream keeps the pow2 chunk divisor the Pallas
            # epilogue needs.
            light_pad = (
                -(-light_plan.padded_size(min_size=1024) // 1024) * 1024
            )
            dev["light"] = plan_to_device(light_plan)
    a_row_nnz_max = int(
        np.bincount(a_csc.indices, minlength=a_csc.shape[0]).max(initial=1)
    )
    # Power-of-two so the merge jit's static pass count caches across
    # operands (pass-count equivalent: ceil(log2) is unchanged).
    a_row_nnz_max = 1 << (max(a_row_nnz_max, 1) - 1).bit_length()
    return TiledPlan(
        a_csc.shape[0], b_csr.shape[1], cp, light_plan, light_pad, dev,
        max_run=a_row_nnz_max,
        gather_ngroups=gather_ngroups,
        gather_p_out=gather_p_out,
        gather_p_real=gather_p_real,
        gather_b_win=gather_b_win,
        gather_call_bits=gather_call_bits,
    )


def _class_slab_calls(sched, dev, fn, interpret, **kw):
    """Fixed-shape slab calls over the padded task table, plus one
    bucketed tail call (executables shared across operands; see
    OuterProductSchedule.slab_layout)."""
    outs = []
    for s0, size in sched.slab_layout:
        outs.append(
            fn(
                jax.lax.slice(
                    dev["tasks"], (s0 * 4,), ((s0 + size) * 4,)
                ),
                dev["a_rows_t"][s0 : s0 + size],
                dev["a_vals_t"][s0 : s0 + size],
                dev["b_cols_blk"],
                dev["b_vals_blk"],
                ntasks=size,
                tile_a=sched.tile_a,
                interpret=interpret,
                **kw,
            )
        )
    return outs


def tiled_expand_packed(
    tplan: TiledPlan, interpret: bool = False
) -> tuple[list, list, int]:
    """The packed expand stage of the tiled pipeline: tile-class slab
    calls + windowed-gather residue + light-path remainder.

    Returns ``(keys_l, vals_l, pad_count)`` — the packed-key/value
    stream pieces plus the exact count of sentinel padding slots across
    them. Factored out of :func:`spgemm_padded_tiled` so a dispatch
    sampler can jit this cheap glue once per part while every part of a
    row-partitioned plan shares the ONE slow-to-compile sort+merge
    executable (:func:`_merge_stream_jit`)."""
    from outerspace_tpu.ops.pallas.expand import expand_tiles_packed

    sentinel = int(tplan.m)
    n_cols = int(tplan.n)
    keys_l, vals_l = [], []
    class_devs = [
        (sched, dev)
        for sched, dev in zip(
            tplan.class_plan.classes, tplan.device_args["classes"]
        )
        if dev is not None
    ]
    for sched, dev in class_devs:
        for k, v in _class_slab_calls(
            sched, dev, expand_tiles_packed, interpret, n_cols=n_cols
        ):
            keys_l.append(k)
            vals_l.append(v)
    if tplan.gather_ngroups:
        from outerspace_tpu.ops.pallas.gexpand import expand_gather_slabbed

        gk, gv = expand_gather_slabbed(
            tplan.device_args["gather"], tplan.gather_ngroups,
            b_win=tplan.gather_b_win, interpret=interpret,
            call_bits=tplan.gather_call_bits,
        )
        keys_l.extend(gk)
        vals_l.extend(gv)
    if tplan.light_plan is not None:
        k, v = _expand_light_packed(
            **tplan.device_args["light"],
            p_pad=int(tplan.light_pad),
            sentinel_row=sentinel,
            n_cols=n_cols,
        )
        keys_l.append(k)
        vals_l.append(v)
    return keys_l, vals_l, tiled_pad_count(tplan)


def tiled_pad_count(tplan: TiledPlan) -> int:
    """Exact count of sentinel padding slots in the packed expand
    stream (pure plan arithmetic, no tracing): tile-class padding +
    gather subtile tails + light-path tail. The ONE source of truth —
    ``pad_count`` drives the merge epilogue's corner recovery, so any
    caller re-deriving it by hand risks silent nnz corruption."""
    pad_count = sum(
        sched.padded_heavy - sched.heavy_p
        for sched, dev in zip(
            tplan.class_plan.classes, tplan.device_args["classes"]
        )
        if dev is not None
    )
    pad_count += tplan.gather_p_out - tplan.gather_p_real
    if tplan.light_plan is not None:
        pad_count += tplan.light_pad - tplan.light_plan.expansion_size
    return pad_count


def spgemm_padded_tiled(
    tplan: TiledPlan,
    packed: bool | None = None,
    interpret: bool = False,
    merge_pad: int | None = None,
    common_max_run: int | None = None,
    merge_sentinel: int | None = None,
) -> MergedCOO:
    """Expand via Pallas dense tiles (+ gather residue), then merge.

    ``merge_pad``/``common_max_run``/``merge_sentinel``: plan-level
    COMMON merge statics (``TiledPartsPlan``) — the expanded stream pads
    to ``merge_pad`` with sentinel slots (counted into ``pad_count``,
    exact) and the sort+epilogue runs as ONE shared executable across
    all parts of a row-partitioned plan instead of one slow-to-compile
    program per part. ``merge_sentinel`` overrides the merge stage's
    invalid-row label (a REBASED parts plan passes the global m so the
    shared executable doesn't fork on each part's local span; rows are
    only a label — validity is carried by the mask). Packed keys only
    (parts exist only when each part's key space fits u32)."""
    if jax.default_backend() == "cpu":
        interpret = True  # Pallas kernels only run interpreted off-TPU
    from outerspace_tpu.ops.pallas.expand import expand_tiles_coords

    if packed is None:
        packed = tplan.m * tplan.n <= 2**32
    if merge_pad is not None and not packed:
        raise ValueError(
            "merge_pad (the shared-merge-executable path) needs packed "
            "keys; row-partitioned plans only exist when the (possibly "
            "part-local) key space fits u32"
        )
    sentinel = int(tplan.m)
    m_sent = int(merge_sentinel) if merge_sentinel is not None else sentinel
    n_cols = int(tplan.n)
    class_devs = [
        (sched, dev)
        for sched, dev in zip(
            tplan.class_plan.classes, tplan.device_args["classes"]
        )
        if dev is not None
    ]
    if (
        not class_devs
        and tplan.light_plan is None
        and not tplan.gather_ngroups
    ):
        z = jnp.zeros(1, jnp.int32)
        return MergedCOO(
            (tplan.m, tplan.n),
            jnp.full(1, _I32_MAX, jnp.int32),
            z,
            jnp.zeros(1, jnp.float32),
            jnp.zeros(1, jnp.bool_),
            jnp.zeros((), jnp.int32),
        )

    def _class_slabs(sched, dev, fn, **kw):
        return _class_slab_calls(sched, dev, fn, interpret, **kw)

    if packed:
        keys_l, vals_l, pad_count = tiled_expand_packed(
            tplan, interpret=interpret
        )
        if merge_pad is not None:
            stream_len = sum(k.shape[0] for k in keys_l)
            if merge_pad < stream_len:
                raise ValueError(
                    f"merge_pad={merge_pad} < part stream {stream_len}"
                )
            pad_count += merge_pad - stream_len
            key, vals = _concat_pad_packed_jit(
                tuple(keys_l), tuple(vals_l), merge_pad=merge_pad
            )
            r, c, v, valid, nnz = _merge_stream_jit(
                key, vals, jnp.int32(pad_count),
                n_cols=n_cols, sentinel_row=m_sent,
                max_run=(
                    common_max_run
                    if common_max_run is not None
                    else tplan.max_run
                ),
            )
        else:
            r, c, v, valid, nnz = _merge_packed_keys_jit(
                tuple(keys_l), tuple(vals_l), jnp.int32(pad_count),
                n_cols=n_cols, sentinel_row=m_sent, max_run=tplan.max_run,
            )
    else:
        rows_l, cols_l, vals_l = [], [], []
        for sched, dev in class_devs:
            for rr, cc, vv in _class_slabs(
                sched, dev, expand_tiles_coords, sentinel_row=sentinel
            ):
                rows_l.append(rr)
                cols_l.append(cc)
                vals_l.append(vv)
        if tplan.gather_ngroups:
            # gexpand emits packed keys; unpack for the two-key sort
            # (the gather plan only exists when m·n ≤ 2^32).
            if tplan.m * tplan.n == 2**32:
                raise ValueError(
                    "packed=False with a gather residue cannot recover "
                    "the (m-1, n-1) corner at m*n == 2^32; use the packed "
                    "merge (default)"
                )
            from outerspace_tpu.ops.pallas.gexpand import (
                expand_gather_slabbed,
            )

            gk, gv = expand_gather_slabbed(
                tplan.device_args["gather"], tplan.gather_ngroups,
                b_win=tplan.gather_b_win, interpret=interpret,
                call_bits=tplan.gather_call_bits,
            )
            for k, v in zip(gk, gv):
                gr, gc = unpack_key_biased(k, n_cols)
                live = k != _I32_MAX
                rows_l.append(jnp.where(live, gr, sentinel))
                cols_l.append(jnp.where(live, gc, 0))
                vals_l.append(v)
        if tplan.light_plan is not None:
            rr, cc, vv = _expand_light(
                **tplan.device_args["light"],
                p_pad=int(tplan.light_pad),
                sentinel_row=sentinel,
            )
            rows_l.append(rr)
            cols_l.append(cc)
            vals_l.append(vv)
        r, c, v, valid, nnz = _merge_twokey_multi_jit(
            tuple(rows_l), tuple(cols_l), tuple(vals_l),
            sentinel_row=sentinel, max_run=tplan.max_run,
        )
    return MergedCOO((tplan.m, tplan.n), r, c, v, valid, nnz)


@functools.partial(jax.jit, static_argnames=("p_pad", "sentinel_row"))
def _expand_light(
    a_rows, a_vals, a_k, b_indptr, b_cols, b_vals, offsets, p_total,
    *, p_pad: int, sentinel_row: int,
):
    return expand_partial_products(
        a_rows, a_vals, a_k, b_indptr, b_cols, b_vals, offsets, p_total,
        p_pad, sentinel_row,
    )


@functools.partial(
    jax.jit, static_argnames=("p_pad", "sentinel_row", "n_cols")
)
def _expand_light_packed(
    a_rows, a_vals, a_k, b_indptr, b_cols, b_vals, offsets, p_total,
    *, p_pad: int, sentinel_row: int, n_cols: int,
):
    r, c, v = expand_partial_products(
        a_rows, a_vals, a_k, b_indptr, b_cols, b_vals, offsets, p_total,
        p_pad, sentinel_row,
    )
    valid = jnp.arange(p_pad, dtype=jnp.int32) < p_total
    return jnp.where(valid, pack_key_biased(r, c, n_cols), _I32_MAX), v


@functools.partial(jax.jit, static_argnames=("merge_pad",))
def _concat_pad_packed_jit(keys_t, vals_t, *, merge_pad: int):
    """Concatenate packed part streams and sentinel-pad to the plan's
    common ``merge_pad``. Deliberately a SEPARATE executable from the
    merge: this glue is cheap to compile per part (concats only) while
    the sort+epilogue it feeds compiles once for the whole plan."""
    key = jnp.concatenate(keys_t) if len(keys_t) > 1 else keys_t[0]
    vals = jnp.concatenate(vals_t) if len(vals_t) > 1 else vals_t[0]
    extra = merge_pad - key.shape[0]
    if extra:
        key = jnp.concatenate([key, jnp.full(extra, _I32_MAX, jnp.int32)])
        vals = jnp.concatenate([vals, jnp.zeros(extra, jnp.float32)])
    return key, vals


@functools.partial(
    jax.jit, static_argnames=("n_cols", "sentinel_row", "max_run")
)
def _merge_stream_jit(
    key, vals, pad_count, *, n_cols: int, sentinel_row: int, max_run: int
):
    """Sort + merge one packed stream — the ONE shared slow-to-compile
    executable of a row-partitioned tiled plan (signature: merge_pad
    via the input shape, plus the common statics)."""
    return merge_biased_keys(
        key, vals, n_cols, sentinel_row, max_run, pad_count=pad_count
    )


@functools.partial(
    jax.jit, static_argnames=("n_cols", "sentinel_row", "max_run")
)
def _merge_packed_keys_jit(
    keys_t, vals_t, pad_count,
    *, n_cols: int, sentinel_row: int, max_run: int | None
):
    key = jnp.concatenate(keys_t) if len(keys_t) > 1 else keys_t[0]
    vals = jnp.concatenate(vals_t) if len(vals_t) > 1 else vals_t[0]
    return merge_biased_keys(
        key, vals, n_cols, sentinel_row, max_run, pad_count=pad_count
    )


@functools.partial(
    jax.jit, static_argnames=("sentinel_row", "max_run")
)
def _merge_twokey_multi_jit(
    rows_t, cols_t, vals_t, *, sentinel_row: int, max_run: int | None
):
    rows = jnp.concatenate(rows_t) if len(rows_t) > 1 else rows_t[0]
    cols = jnp.concatenate(cols_t) if len(cols_t) > 1 else cols_t[0]
    vals = jnp.concatenate(vals_t) if len(vals_t) > 1 else vals_t[0]
    return merge_twokey(rows, cols, vals, sentinel_row, max_run)


# --------------------------------------------------------------------------
# Row-partitioned tiled pipeline: P independent (expand + sort + merge)
# parts over contiguous output-row ranges
# --------------------------------------------------------------------------


@dataclasses.dataclass
class TiledPartsPlan:
    """P-way output-row partition of the tiled pipeline.

    The sort is the pipeline ceiling (ROADMAP: 60-90% of every A²
    workload) and its cost carries a real log²-factor, so sorting P
    streams of L/P beats one of L by ~(1 - (k-log₂P)²/k²). The naive
    row split was measured-and-rejected in round 3 (per-(k, part) tile
    re-padding: >10⁹ extra elements on rmat16) — here each part is
    planned by the FULL trim-and-chunk planner on its row-sliced A, so
    boundary fragments route to the exact-P windowed-gather kernel and
    the extra stream stays near zero (guarded by a padded-total budget
    at plan time). Keys stay global (m·n ≤ 2³²); parts cover ascending
    row ranges, so the concatenated merged parts are globally row-major
    among valid slots — the same ``MergedCOO`` contract.

    Reference mapping: the row ranges are the output-row ownership the
    merge PEs had (``SimOuterSPACE.cpp:554-606``), now applied on one
    chip to shorten the sort network.
    """

    m: int
    n: int
    parts: list  # [(row_lo, row_hi, TiledPlan)]
    # COMMON merge-stage statics across parts: every part's expanded
    # stream pads (sentinel tail) to ``merge_pad`` and merges with the
    # max ``max_run``, so the sort+epilogue — the slow-to-compile
    # program — is ONE executable per plan instead of one per part
    # (measured pad-to-max inflation: 1.0-2.6% on rmat14/15; the
    # per-part expand glue keeps its own cheap jit). 0 = uncommonized
    # (hand-built plans); ``spgemm_padded_tiled_parts`` then falls back
    # to the per-part merge signature.
    merge_pad: int = 0
    max_run: int = 0
    # Rebased parts: each part's TiledPlan was planned on a LOCAL-row A
    # slice (``_slice_a_rows(..., local=True)``), so its packed keys
    # live in the part's span·n space — this lifts the single-key fast
    # path to any m·n (the two-key 3-stream sort is only a fallback).
    # The merge runs with the COMMON global-m sentinel (one executable);
    # global rows are restored by a traced ``row_base`` add after.
    rebased: bool = False

    @property
    def padded_total(self) -> int:
        if self.merge_pad:
            return self.merge_pad * len(self.parts)
        return sum(p.padded_total for _, _, p in self.parts)


def row_products(a_csc: CSC, b_csr: CSR) -> np.ndarray:
    """Products per output row: Σ over A elements e of nnz_B(k(e))."""
    nb = b_csr.major_nnz().astype(np.int64)
    a_k = np.repeat(
        np.arange(a_csc.shape[1], dtype=np.int64),
        a_csc.major_nnz().astype(np.int64),
    )
    return np.bincount(
        np.asarray(a_csc.indices, dtype=np.int64),
        weights=nb[a_k].astype(np.float64),
        minlength=a_csc.shape[0],
    ).astype(np.int64)


def _slice_a_rows(a_csc: CSC, lo: int, hi: int, local: bool = False) -> CSC:
    """A restricted to output rows [lo, hi). By default the slice keeps
    the SAME shape (global row ids → global keys). With ``local=True``
    rows rebase to ``row - lo`` and the shape shrinks to ``(hi-lo, k)``,
    so downstream packed keys live in the part-local ``span·n`` space —
    the key-space lift for m·n > 2³² (mirrors the gather pipeline's
    ``row_base``). CSC columns are row-sorted, so the selection keeps
    per-column contiguity. O(nnz)."""
    rows = np.asarray(a_csc.indices)
    sel = (rows >= lo) & (rows < hi)
    a_k = np.repeat(
        np.arange(a_csc.shape[1], dtype=np.int64),
        a_csc.major_nnz().astype(np.int64),
    )
    indptr = np.zeros(a_csc.shape[1] + 1, dtype=np.int64)
    np.cumsum(
        np.bincount(a_k[sel], minlength=a_csc.shape[1]), out=indptr[1:]
    )
    out_rows = rows[sel]
    shape = a_csc.shape
    if local:
        out_rows = out_rows - np.asarray(lo, dtype=out_rows.dtype)
        shape = (hi - lo, a_csc.shape[1])
    return CSC(shape, indptr, out_rows, np.asarray(a_csc.data)[sel])


def default_part_count(
    padded_total: int, min_part_stream: int = 2 << 20
) -> int:
    """Row-part count for a padded stream: one part per
    ~``min_part_stream`` elements, pow2. The cap was 4 when every part
    compiled its own sort program (8 parts ballooned compiles 1233 s vs
    27.6 s on a degraded day for a ~2 ms gain on rmat14); with the
    plan-shared merge executable the extra parts only add cheap expand
    jits, so streams past ~64M padded elements (where the sort's log
    factor is steep: measured 2.07 ns/pair @ 32M vs ~1.7 @ 16M) go to
    8. rmat14/15 stay at 4 — their 8-way pad-to-max inflation
    (+10%/+7%) eats the shorter-sort win."""
    cap = 8 if padded_total >= (64 << 20) else 4
    nparts = int(min(cap, max(1, padded_total // min_part_stream)))
    return 1 << (nparts - 1).bit_length() if nparts > 1 else 1


def _bounds_span_capped(
    rp: np.ndarray, nparts: int, span_cap: int
) -> np.ndarray:
    """Contiguous product-balanced row bounds with every span ≤
    ``span_cap``: greedy walk toward the remaining-product-even target,
    clipped to the cap (so rebased parts always fit their key space;
    low-density stretches just yield extra parts)."""
    cum = np.zeros(rp.shape[0] + 1, dtype=np.float64)
    np.cumsum(rp, out=cum[1:])
    total = cum[-1]
    m = rp.shape[0]
    bounds = [0]
    while bounds[-1] < m:
        lo = bounds[-1]
        remaining = max(1, nparts - (len(bounds) - 1))
        target = cum[lo] + (total - cum[lo]) / remaining
        hi = int(np.searchsorted(cum, target, side="left"))
        hi = max(hi, lo + 1)
        # absorb the zero-product run following hi (free rows): without
        # this, empty tails creep 1 row/part and explode the part count
        hi = int(np.searchsorted(cum, cum[hi], side="right")) - 1
        hi = min(max(hi, lo + 1), lo + span_cap, m)
        bounds.append(hi)
    return np.asarray(bounds, dtype=np.int64)


_MAX_PARTS = 64  # runaway guard for extreme aspect ratios


def plan_tiled_parts(
    a_csc: CSC,
    b_csr: CSR,
    waste_limit: float | None = None,
    nparts: int | None = None,
    min_part_stream: int = 2 << 20,
    budget: float = 1.12,
) -> "TiledPartsPlan | TiledPlan":
    """Plan the row-partitioned tiled pipeline; falls back to the single
    ``TiledPlan`` when partitioning doesn't pay (small streams, or the
    per-part planner's padded total exceeds ``budget``× the unsplit
    plan's — the fragmentation guard, retried at halved part counts).

    For m·n > 2³² the partition is MANDATORY and parts plan on
    local-row A slices (rebased keys): each part's span is capped at
    ``2³²//n`` so its packed-key space fits, lifting the single-key
    sort to any output shape (the unsplit two-key 3-stream sort remains
    only as the last-resort fallback, with a relaxed budget — it moves
    1.5× the sort traffic over the FULL stream).

    Measured (v5e, 16.8M pairs): 8 sequential 1-D pair-sorts of L/8 run
    at 1.52 ns/pair vs 2.35 for one L-sort — a 35% cut of the dominant
    cost; batched 2-D [P, L/P] sorts are SLOWER than one 1-D sort, so
    each part keeps its own 1-D sort call."""
    base = plan_tiled(a_csc, b_csr, waste_limit=waste_limit)
    m, n = a_csc.shape[0], b_csr.shape[1]
    rebased = m * n > 2**32
    span_cap = (2**32 // n) if n else m
    min_parts = 1
    if rebased:
        if span_cap < 1 or n >= 2**31:
            # n alone (nearly) exceeds the key space — int32 packing
            # arithmetic can't even hold n; two-key fallback.
            return base
        min_parts = -(-m // span_cap)
        if min_parts > _MAX_PARTS:
            return base
        # Rebasing is worth a looser fragmentation budget than an
        # optional split: the alternative is the two-key merge.
        budget = max(budget, 1.5)
    if nparts is None:
        nparts = default_part_count(base.padded_total, min_part_stream)
    nparts = max(nparts, min_parts)
    if nparts <= 1:
        return base
    from outerspace_tpu.shard.mesh import balanced_contiguous_partition

    if waste_limit is None:
        from outerspace_tpu.sched.autotune import autotune

        waste_limit = autotune(a_csc, b_csr)[1]
    rp = row_products(a_csc, b_csr).astype(np.float64)
    while nparts >= max(min_parts, 2):
        if rebased:
            bounds = _bounds_span_capped(rp, nparts, span_cap)
            if bounds.shape[0] - 1 > _MAX_PARTS:
                return base
        else:
            bounds = balanced_contiguous_partition(rp, nparts)
        parts = []
        for lo, hi in zip(bounds[:-1], bounds[1:]):
            lo, hi = int(lo), int(hi)
            if hi <= lo:
                continue
            a_p = _slice_a_rows(a_csc, lo, hi, local=rebased)
            if a_p.nnz == 0:
                continue
            parts.append(
                (lo, hi, plan_tiled(a_p, b_csr, waste_limit=waste_limit))
            )
        if len(parts) > 1 or (rebased and parts):
            # Common merge statics: the guard charges the COMMONIZED
            # total (every part sorts merge_pad slots), so an accepted
            # split never hides pad-to-max inflation.
            merge_pad = -(-max(p.padded_total for _, _, p in parts)
                          // 4096) * 4096
            max_run = max(p.max_run or 1 for _, _, p in parts)
            split = TiledPartsPlan(
                m, n, parts, merge_pad=merge_pad, max_run=max_run,
                rebased=rebased,
            )
            # Fragmentation guard: the split must not inflate the stream.
            if split.padded_total <= budget * max(base.padded_total, 1):
                return split
            if rebased and nparts // 2 < min_parts:
                # No legal smaller split exists. Before conceding to the
                # two-key fallback, drop the pad-to-max commonization
                # (merge_pad=0 → per-part merge signatures, exact
                # padding): imbalanced mandatory splits can inflate the
                # commonized total far past the real stream, while the
                # per-part compile diversity only matters at scales
                # where the inflation is 1-3% anyway.
                uncommon = TiledPartsPlan(m, n, parts, rebased=True)
                if uncommon.padded_total <= budget * max(
                    base.padded_total, 1
                ):
                    return uncommon
                return base
        nparts //= 2
    return base


@functools.partial(jax.jit, static_argnames=("sentinel_row",))
def _rebase_rows_jit(rows, valid, row_base, *, sentinel_row: int):
    """Part-local merged rows → global: add the part's traced
    ``row_base`` where valid, re-label invalid slots with the global
    sentinel (one executable for every part of every rebased plan)."""
    return jnp.where(valid, rows + row_base, np.int32(sentinel_row))


def spgemm_padded_tiled_parts(
    plan: "TiledPartsPlan | TiledPlan",
    packed: bool | None = None,
    interpret: bool = False,
) -> MergedCOO:
    """Run the (possibly row-partitioned, possibly key-rebased) tiled
    pipeline."""
    if isinstance(plan, TiledPlan):
        return spgemm_padded_tiled(plan, packed=packed, interpret=interpret)
    rows_l, cols_l, vals_l, valid_l = [], [], [], []
    nnz = jnp.zeros((), jnp.int32)
    # The shared merge executable is a packed-key feature; an explicit
    # packed=False caller keeps the per-part two-key merge. Rebased
    # plans pack by construction (each part's local key space fits u32).
    packed_eff = (
        (plan.rebased or plan.m * plan.n <= 2**32)
        if packed is None
        else packed
    )
    mp = (plan.merge_pad or None) if packed_eff else None
    mr = (plan.max_run or None) if packed_eff else None
    # One common merge sentinel across rebased parts (per-part local
    # spans would fork the shared executable on a cosmetic static).
    ms = plan.m if (plan.rebased and packed_eff) else None
    for lo, _, tp in plan.parts:
        # packed=None resolves per part (a rebased part's LOCAL key
        # space fits u32 by construction, so it packs).
        part = spgemm_padded_tiled(
            tp, packed=packed, interpret=interpret,
            merge_pad=mp, common_max_run=mr, merge_sentinel=ms,
        )
        rows = part.rows
        if plan.rebased:
            rows = _rebase_rows_jit(
                rows, part.valid, jnp.int32(lo), sentinel_row=plan.m
            )
        rows_l.append(rows)
        cols_l.append(part.cols)
        vals_l.append(part.vals)
        valid_l.append(part.valid)
        nnz = nnz + part.nnz
    cat = lambda xs: jnp.concatenate(xs) if len(xs) > 1 else xs[0]  # noqa: E731
    return MergedCOO(
        (plan.m, plan.n),
        cat(rows_l), cat(cols_l), cat(vals_l), cat(valid_l), nnz,
    )


def spgemm(
    a: COO | CSR | CSC,
    b: COO | CSR | CSC,
    p_pad: int | None = None,
    packed: bool | None = None,
    strategy: str = "auto",
    interpret: bool = False,
    config=None,
) -> CSR:
    """C = A @ B on TPU; returns a host CSR with exact nnz.

    ``strategy``: "auto" lets the scheduler pick; "flat" forces the XLA
    gather pipeline; "tiles" forces the Pallas dense-tile expand;
    "gather" forces the row-split windowed-gather Pallas pipeline
    (``ops.gather_pipeline``).
    A caller-pinned ``p_pad`` implies the flat pipeline (tile padding is
    structural and cannot honor an arbitrary size).
    ``config``: an ``outerspace_tpu.config.Config`` whose ``waste_limit``
    and ``heavy_fraction_threshold`` steer the scheduler (the CLI's
    ``--set key=value`` lands here).
    End-to-end: symbolic plan (host) → expand+sort+merge (device) →
    compaction to CSR (host fetch).
    """
    from outerspace_tpu.config import DEFAULT

    cfg = config if config is not None else DEFAULT
    # Pallas kernels only run interpreted off-TPU (tests, CPU users).
    if jax.default_backend() == "cpu":
        interpret = True
    a_csc = a if isinstance(a, CSC) else a.to_csc()
    b_csr = b if isinstance(b, CSR) else b.to_csr()
    plan = expansion_plan(a_csc, b_csr)
    if plan.expansion_size == 0:
        return CSR(
            (plan.m, plan.n),
            np.zeros(plan.m + 1, dtype=np.int64),
            np.zeros(0, dtype=INDEX_DTYPE),
            np.zeros(0, dtype=VALUE_DTYPE),
        )
    if strategy == "auto":
        from outerspace_tpu.sched.planner import choose_strategy

        strategy = "flat" if p_pad is not None else choose_strategy(
            a_csc,
            b_csr,
            heavy_fraction_threshold=cfg.heavy_fraction_threshold,
            waste_limit=cfg.waste_limit,
        )
    if strategy in ("tiles", "gather") and p_pad is not None:
        raise ValueError(
            "p_pad is only honored by the flat strategy; tile/gather "
            "padding is structural (use strategy='flat' or drop p_pad)"
        )
    if strategy == "tiles":
        tplan = plan_tiled_parts(a_csc, b_csr, waste_limit=cfg.waste_limit)
        return spgemm_padded_tiled_parts(
            tplan, packed=packed, interpret=interpret
        ).to_csr()
    if strategy == "gather":
        from outerspace_tpu.ops.gather_pipeline import spgemm_gather

        return spgemm_gather(a_csc, b_csr, interpret=interpret)
    return spgemm_padded(plan, p_pad, packed=packed).to_csr()


def spgemm_coo(a, b, p_pad: int | None = None) -> COO:
    return spgemm(a, b, p_pad=p_pad).to_coo()
