"""Windowed-gather expand kernel: exact-P multiply phase for low-skew k.

Counterpart of the dense-tile expand (``ops.pallas.expand``) for outer
indices whose (nnz_A(k) × nnz_B(k)) tiles would pad away the win: instead
of dense tiles, each grid step resolves 8×1024 consecutive partial
products with VMEM-local single-vreg gathers over small aligned windows
(see ``sched.gplanner`` for the windowing argument and constraints).
Output is the packed (biased-uint32 key, value) stream of the merge phase
— **zero padding** beyond the ≤SUB_P tail of each subtile.

Per subtile: an 8-step in-register binary search over the window's
product-prefix array finds each slot's owning A-element (exploiting that
the prefix is strictly increasing), then four owner-indexed gathers fetch
(row, a_val, jb, cum) and two j-indexed gathers fetch (b_col, b_val).

Reference capability matched: the multiply PEs' element streaming
(``PEMultiplier``, ``SimOuterSPACE.cpp:501-552``) at full VPU width
without the ~10 cycle/element cost of global XLA gathers.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from outerspace_tpu.sched.gplanner import (
    A_WIN,
    B_WIN,
    GROUP_SUBS,
    SUB_P,
    SUPER_A,
    SUPER_B,
    GatherPlan,
)

_I32_MAX = np.int32(2**31 - 1)
_KEY_BIAS = np.int32(-(2**31))
_BLK = 128


def _win_gather(win_rows, idx):
    """Gather ``win_rows`` (list of (8?,128) lane-vectors as (1,128) or
    (128,) arrays broadcastable to idx's shape) at flat indices ``idx`` ∈
    [0, len*128): single-vreg take_along_axis per 128-lane piece + select."""
    out = None
    lane = idx & (_BLK - 1)
    blk = idx >> 7
    for i, w in enumerate(win_rows):
        wb = jnp.broadcast_to(w.reshape(1, _BLK), idx.shape)
        g = jnp.take_along_axis(wb, lane, axis=1)
        out = g if out is None else jnp.where(blk == i, g, out)
    return out


def _expand_gather_kernel(
    bases_ref,  # SMEM int32[ngroups*2]: (a_base8, b_base8)
    tab_ref,  # VMEM int32[1, GROUP_SUBS, 128] per-subtile table
    *refs,  # SUPER_A a-refs (1,8,4,128), SUPER_B b-refs (1,8,2,128),
    # okey/oval outputs, then 6 scratch buffers (see pallas_call below)
    b_win: int,
    search_bits: int = 8,
):
    a_refs = refs[:SUPER_A]
    b_refs = refs[SUPER_A : SUPER_A + SUPER_B]
    okey_ref, oval_ref = refs[SUPER_A + SUPER_B : SUPER_A + SUPER_B + 2]
    s_row, s_aval, s_jb, s_cum, s_bcol, s_bval = refs[
        SUPER_A + SUPER_B + 2 :
    ]
    g = pl.program_id(0)
    b_super_blk = bases_ref[g * 2 + 1] * 8  # absolute block of b_refs[0]
    # Stage the super-windows field-major in scratch so subtile windows
    # become dynamically-offset *ref* slices (Mosaic has no dynamic_slice
    # on values).
    for fi, ref in enumerate((s_row, s_aval, s_jb, s_cum)):
        ref[:] = jnp.concatenate(
            [ar[0, :, fi, :] for ar in a_refs], axis=0
        )
    for fi, ref in enumerate((s_bcol, s_bval)):
        ref[:] = jnp.concatenate(
            [br[0, :, fi, :] for br in b_refs], axis=0
        )
    n_cols = tab_ref[0, 0, 5]
    sub_i = jax.lax.broadcasted_iota(jnp.int32, (8, _BLK), 0)
    lane_i = jax.lax.broadcasted_iota(jnp.int32, (8, _BLK), 1)
    slot = sub_i * _BLK + lane_i  # 0..1023

    for s in range(GROUP_SUBS):
        r_a = tab_ref[0, s, 0]
        r_b = tab_ref[0, s, 1]
        p0 = tab_ref[0, s, 2]
        plen = tab_ref[0, s, 3]

        awin = [
            (
                s_row[pl.ds(r_a, A_WIN), :],
                s_aval[pl.ds(r_a, A_WIN), :],
                s_jb[pl.ds(r_a, A_WIN), :],
                s_cum[pl.ds(r_a, A_WIN), :],
            )
        ][0]
        bwin = (
            s_bcol[pl.ds(r_b, b_win), :],
            s_bval[pl.ds(r_b, b_win), :],
        )
        cum_w = [awin[3][i] for i in range(A_WIN)]
        p = p0 + slot

        # Binary search: largest candidate e with cum[e] <= p. cum is
        # strictly increasing (zero-product elements are excluded by
        # the planner). The search is the kernel's dominant SERIAL
        # dependency chain (measured ~0.16 ms per step per 448-group
        # part), so when the planner certifies every subtile in this
        # call spans ≤ 2^search_bits owners, the search anchors at the
        # subtile's first owner offset (table lane 6, cum[aoff] ≤ p0 ≤
        # p) and runs search_bits steps instead of the full-window 8;
        # anchored probes stay in-window (aoff < 128, span ≤ 64 < 128
        # for the shallow variants, window = A_WIN·128 = 256).
        if search_bits >= 8:
            ow = jnp.zeros((8, _BLK), jnp.int32)
        else:
            ow = jnp.full((8, _BLK), tab_ref[0, s, 6], jnp.int32)
        for bit in range(search_bits - 1, -1, -1):
            probe = ow + (1 << bit)
            v = _win_gather(cum_w, probe)
            ow = jnp.where(v <= p, probe, ow)

        row = _win_gather([awin[0][i] for i in range(A_WIN)], ow)
        aval = pltpu.bitcast(
            _win_gather([awin[1][i] for i in range(A_WIN)], ow), jnp.float32
        )
        jbase = _win_gather([awin[2][i] for i in range(A_WIN)], ow)
        cum_e = _win_gather(cum_w, ow)

        jloc = jbase + (p - cum_e) - (b_super_blk + r_b) * _BLK
        jloc = jnp.clip(jloc, 0, b_win * _BLK - 1)
        bcol = _win_gather([bwin[0][i] for i in range(b_win)], jloc)
        bval = pltpu.bitcast(
            _win_gather([bwin[1][i] for i in range(b_win)], jloc), jnp.float32
        )

        live = slot < plen
        key = jnp.where(
            live, row * n_cols + bcol + _KEY_BIAS, _I32_MAX
        )
        val = jnp.where(live, aval * bval, 0.0)
        okey_ref[0, s * 8 : (s + 1) * 8, :] = key
        oval_ref[0, s * 8 : (s + 1) * 8, :] = val


def _clamp_spec(side: str, ref_i: int, nblocks8: int, nfields: int):
    col = 0 if side == "a" else 1

    def index_map(g, bases):
        base = bases[g * 2 + col]
        return (jnp.minimum(base + ref_i, nblocks8 - 1), 0, 0, 0)

    return pl.BlockSpec(
        (1, 8, nfields, _BLK), index_map, memory_space=pltpu.VMEM
    )


@functools.partial(
    jax.jit,
    static_argnames=("ngroups", "b_win", "search_bits", "interpret"),
)
def expand_gather_packed(
    bases: jax.Array,  # int32[ngroups*2]
    table: jax.Array,  # int32[ngroups, GROUP_SUBS, 128]
    a_pack: jax.Array,  # int32[NAB/8, 8, 4, 128]
    b_pack: jax.Array,  # int32[NBB/8, 8, 2, 128]
    *,
    ngroups: int,
    b_win: int = B_WIN,
    search_bits: int = 8,
    interpret: bool = False,
):
    """Returns flat (keys, vals) of length ngroups·GROUP_SUBS·SUB_P."""
    nab8 = a_pack.shape[0]
    nbb8 = b_pack.shape[0]
    rows_out = GROUP_SUBS * 8
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ngroups,),
        in_specs=[
            pl.BlockSpec(
                (1, GROUP_SUBS, _BLK),
                lambda g, bases: (g, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ]
        + [_clamp_spec("a", i, nab8, 4) for i in range(SUPER_A)]
        + [_clamp_spec("b", i, nbb8, 2) for i in range(SUPER_B)],
        out_specs=[
            pl.BlockSpec(
                (1, rows_out, _BLK),
                lambda g, bases: (g, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ]
        * 2,
        scratch_shapes=[pltpu.VMEM((8 * SUPER_A, _BLK), jnp.int32)] * 4
        + [pltpu.VMEM((8 * SUPER_B, _BLK), jnp.int32)] * 2,
    )
    keys, vals = pl.pallas_call(
        functools.partial(
            _expand_gather_kernel, b_win=b_win, search_bits=search_bits
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((ngroups, rows_out, _BLK), jnp.int32),
            jax.ShapeDtypeStruct((ngroups, rows_out, _BLK), jnp.float32),
        ],
        interpret=interpret,
    )(bases, table, *([a_pack] * SUPER_A), *([b_pack] * SUPER_B))
    n = ngroups * rows_out * _BLK
    return keys.reshape(n), vals.reshape(n)


def expand_gather_slabbed(
    dev: dict, ngroups: int, b_win: int = B_WIN, interpret: bool = False,
    call_bits: tuple[int, ...] | None = None,
):
    """Run the gather expand as fixed-shape slab calls (whole
    ``GROUP_SLAB`` slabs plus {slab/2, slab/4} coarse tails — see
    ``gplanner.group_slab_layout``) so executables are compiled once
    and reused across operands; returns lists of (keys, vals) streams.

    ``call_bits``: per-call owner-search depth from
    ``gplanner.call_search_bits`` (None ⇒ the legacy full-window 8);
    must align with the slab layout for ``ngroups``."""
    from outerspace_tpu.sched.gplanner import group_slab_layout

    layout = group_slab_layout(ngroups)
    if call_bits is None:
        call_bits = (8,) * len(layout)
    assert len(call_bits) == len(layout)
    keys_l, vals_l = [], []
    for (g0, size), bits in zip(layout, call_bits):
        k, v = expand_gather_packed(
            jax.lax.slice(dev["bases"], (g0 * 2,), ((g0 + size) * 2,)),
            jax.lax.slice(
                dev["table"], (g0, 0, 0),
                (g0 + size, dev["table"].shape[1], dev["table"].shape[2]),
            ),
            dev["a_pack"],
            dev["b_pack"],
            ngroups=size,
            b_win=b_win,
            search_bits=bits,
            interpret=interpret,
        )
        keys_l.append(k)
        vals_l.append(v)
    return keys_l, vals_l


def gather_plan_to_host(
    plan: GatherPlan,
    ngroups_pad: int | None = None,
    nab8_pad: int | None = None,
    nbb8_pad: int | None = None,
) -> dict[str, np.ndarray]:
    """A GatherPlan's kernel arrays as host arrays (packs reshaped to
    8-block refs). Explicit pad targets (≥ the natural sizes) let the
    sharded path stack per-device plans to one common shape: padding
    groups are all-zero table rows (plen = 0 ⇒ pure sentinel output),
    padding pack blocks are zeros (reads are clamped in-bounds).

    READ-ONLY RESULT: in the no-pad case ``a_pack``/``b_pack`` are
    reshape *views aliasing* ``plan.a_pack``/``plan.b_pack`` (copying
    the multi-MB packs cost ~1.2 s of the rmat16 plan); the views are
    returned with ``writeable = False`` so an accidental in-place write
    raises instead of silently corrupting the GatherPlan."""
    nab8 = plan.a_pack.shape[0] // 8
    nbb8 = plan.b_pack.shape[0] // 8
    g = plan.ngroups
    if ngroups_pad is None:
        ngroups_pad = g
    if nab8_pad is None:
        nab8_pad = nab8
    if nbb8_pad is None:
        nbb8_pad = nbb8
    if ngroups_pad < g or nab8_pad < nab8 or nbb8_pad < nbb8:
        raise ValueError("pad targets must cover the natural sizes")
    table = np.zeros((ngroups_pad, GROUP_SUBS, _BLK), np.int32)
    table[:g] = plan.table
    table[:, :, 5] = plan.n  # n_cols broadcast into the table
    bases = np.zeros((ngroups_pad, 2), np.int32)
    bases[:g] = plan.bases
    # packs: reshape is a view; only COPY when padding is requested (the
    # single-chip path never pads — zero-init + full copy of the multi-MB
    # packs was ~1.2 s of the rmat16 plan)
    a_view = plan.a_pack.reshape(nab8, 8, 4, _BLK)
    if nab8_pad == nab8:
        a_pack = a_view
        a_pack.flags.writeable = False
    else:
        a_pack = np.zeros((nab8_pad, 8, 4, _BLK), np.int32)
        a_pack[:nab8] = a_view
    b_view = plan.b_pack.reshape(nbb8, 8, 2, _BLK)
    if nbb8_pad == nbb8:
        b_pack = b_view
        b_pack.flags.writeable = False
    else:
        b_pack = np.zeros((nbb8_pad, 8, 2, _BLK), np.int32)
        b_pack[:nbb8] = b_view
    return dict(
        bases=bases.reshape(-1),
        table=table,
        a_pack=a_pack,
        b_pack=b_pack,
    )


def gather_plan_to_device(plan: GatherPlan) -> dict[str, jax.Array]:
    """Ship a GatherPlan's arrays (a/b packs reshaped to 8-block refs).
    One batched device_put for all four arrays (per-array puts serialize
    the tunnel round-trips on TPU)."""
    host = gather_plan_to_host(plan)
    return jax.device_put(host)
