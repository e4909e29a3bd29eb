"""Chained-timing micro-benchmarks for the TPU primitive rates the
planners and cost models cite.

The reference calibrated nothing (its constants are compile-time,
``SimOuterSPACE.cpp:17-27``); this framework's planners consume MEASURED
rates (sort ns/pair bands, the random-access law, scatter-broadcast
per-lane cost, the two-sort rank pass). Those measurements have two
sharp edges on the tunneled TPU, both encoded here so every future
number is collected the same way:

- ``jax.block_until_ready`` does not block through the tunnel and each
  scalar sync pays a ~25-35 ms RPC floor → every measurement chains K
  iterations of the primitive inside ONE ``lax.fori_loop`` program per
  sync and subtracts a separately measured floor;
- XLA CSE collapses repeated identical calls → every iteration's input
  is perturbed through an opaque runtime zero derived from the carry.

Run as a module for the JSON table::

    python -m outerspace_tpu.perf.microbench            # default sizes
    python -m outerspace_tpu.perf.microbench --small    # CPU/CI sizes

Measured on one v5e (2026-08, tunneled; see ROADMAP round-9): 2-stream
sort 0.77 ms @ 917K / 1.33 ms @ 1.11M, 3-stream 2.1 ms @ 1.11M,
scatter-broadcast ~1.7 ms per 196K→917K lane (XLA does NOT fuse
same-index scatters), pair-gather 16.3 ms per 917K uniform-random
fetches from a 196K×2 table (sorted indices do NOT help; single-lane
6.6 ms), LOCF fill (18 passes, 2 lanes) 0.28 ms, two-sort rank pass
0.40 ms vs 2.1-7.8 ms for an m+1-probe searchsorted. Round-10: the
single-lane u64 packed sort is 22% slower than the 2-lane (u32, f32)
sort (1.15 vs 0.94 ns/pair @ 4.2M) — emulated 64-bit comparators lose
more than the dropped value lane saves, so the merge stays 2-lane.
"""

from __future__ import annotations

import time

import numpy as np


def rpc_floor(reps: int = 5) -> float:
    """Per-sync link latency: scalar-add fetch, min over reps."""
    import jax
    import jax.numpy as jnp

    s = jax.jit(lambda x: x + 1.0)
    z = jnp.zeros(())
    float(np.asarray(s(z)))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(np.asarray(s(z)))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def chain_time(step, state0, *, k: int = 20, reps: int = 3,
               floor: float | None = None) -> float:
    """Seconds per ``step`` application: ``lax.fori_loop`` of K steps
    per sync, floor-subtracted, min over reps.

    ``step``: state -> state (same pytree structure/shapes). It MUST
    thread its inputs through the carry (or perturb them with an opaque
    zero from the carry) so XLA cannot CSE the chain into one call.
    ``state0``: initial carry. Sync fetches the first leaf's first
    element."""
    import jax

    if floor is None:
        floor = rpc_floor()
    prog = jax.jit(
        lambda st: jax.lax.fori_loop(0, k, lambda i, s: step(s), st)
    )

    def sync(st):
        leaf = jax.tree_util.tree_leaves(st)[0]
        return float(np.asarray(leaf.reshape(-1)[0]).astype(np.float64))

    sync(prog(state0))  # compile + warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(prog(state0))
        ts.append(time.perf_counter() - t0)
    return (min(ts) - floor) / k


def opaque_zero(x):
    """A runtime 0 XLA cannot fold: min(sum(x), 0) for non-negative x
    summaries — derive per-iteration perturbations from the carry."""
    import jax.numpy as jnp

    return jnp.minimum(jnp.sum(x).astype(jnp.int32), 0)


# ---------------------------------------------------------------------
# primitive suite
# ---------------------------------------------------------------------


def suite(p: int = 917_504, e: int = 196_608, m: int = 16_384,
          k: int = 20, seed: int = 0) -> dict[str, float]:
    """Measure the planner-cited primitive rates at product-stream size
    ``p`` and element/table size ``e``; returns {name: seconds/op}."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    floor = rpc_floor()
    out: dict[str, float] = {"rpc_floor_s": floor}

    kP = jnp.asarray(rng.integers(0, 2**30, size=p).astype(np.int32))
    vP = jnp.asarray(rng.random(p).astype(np.float32))
    seg = jnp.asarray(
        np.sort(rng.choice(p, size=e, replace=False)).astype(np.int32)
    )
    jr = jnp.asarray(rng.integers(0, e, size=p).astype(np.int32))
    js = jnp.asarray(np.sort(np.asarray(jr)))
    ti = jnp.asarray(rng.integers(0, m, size=e).astype(np.int32))
    tf = jnp.asarray(rng.random(e).astype(np.float32))

    def sort2(st):
        a, v = st
        ks, vs = jax.lax.sort(
            (a + opaque_zero(a), v), num_keys=1, is_stable=False
        )
        return (ks, vs)

    out["sort2_p"] = chain_time(sort2, (kP, vP), k=k, floor=floor)

    # Epilogue-only merge of an ALREADY-SORTED stream — what a kx=1
    # sharded mesh runs after the exchange (the received buffer is one
    # sorted run, so merge_biased_keys' sort is skipped). Compare with
    # sort2_p: the difference is what the sort-skip saves per pass.
    from outerspace_tpu.ops.spgemm import merge_epilogue

    kS = jnp.sort(kP)

    def epi(st):
        acc = st[0]
        mr, mc, mv, mvalid, nnz = merge_epilogue(
            kS + opaque_zero(acc), vP, n_cols=1 << 15,
            sentinel_row=1 << 15, max_run=8, pad_count=0,
        )
        return (acc + nnz + mr[0],)

    out["merge_epilogue_sorted_p"] = chain_time(
        epi, (jnp.zeros((), jnp.int32),), k=k, floor=floor
    )

    # Single-lane u64 packed sort (key<<32 | val bits) — the one lane
    # layout not covered by the earlier negative results. Measured on
    # v5e (2026-08, 4.2M pairs): 1.15 ns/pair vs 0.94 for the 2-lane
    # (u32, f32) sort — 22% SLOWER; 64-bit comparators are emulated as
    # 32-bit word pairs on the VPU, costing more than the second
    # value-lane permutation saves. Recorded so the merge keeps the
    # 2-lane layout on evidence, not assumption.
    with jax.enable_x64():
        pk = jnp.asarray(
            (np.asarray(rng.integers(0, 2**30, size=p), np.uint64)
             << np.uint64(32))
            | rng.random(p, dtype=np.float32).view(np.uint32).astype(
                np.uint64
            )
        )

        def sort1(st):
            (a,) = st
            ks = jax.lax.sort(
                (a ^ opaque_zero(a).astype(a.dtype),),
                num_keys=1, is_stable=False,
            )[0]
            return (ks,)

        out["sort1_u64_p"] = chain_time(sort1, (pk,), k=k, floor=floor)

    def scat1(st):
        acc = st[0]
        d = jnp.zeros(p, jnp.int32).at[seg + opaque_zero(acc)].add(
            jnp.ones(e, jnp.int32), mode="drop"
        )
        return (acc + d,)

    out["scatter_bcast_lane"] = chain_time(
        scat1, (jnp.zeros(p, jnp.int32),), k=k, floor=floor
    )

    def gpair(idx):
        def f(st):
            acc = st[0]
            pair = jnp.stack(
                [ti, jax.lax.bitcast_convert_type(tf, jnp.int32)], axis=1
            )
            g = pair[jnp.clip(idx + opaque_zero(acc), 0, e - 1)]
            return (acc + g[:, 0] + g[:, 1],)

        return f

    out["pair_gather_random"] = chain_time(
        gpair(jr), (jnp.zeros(p, jnp.int32),), k=k, floor=floor
    )
    out["pair_gather_sorted"] = chain_time(
        gpair(js), (jnp.zeros(p, jnp.int32),), k=k, floor=floor
    )

    # contiguous-bucket slice fill (the sharded exchange pattern): the
    # per-destination dynamic_slice copy that replaced jnp.take fills —
    # measure it beside the gathers so the ~stream-rate vs
    # ~15 ns/element contrast stays a recorded fact
    from outerspace_tpu.shard.spgemm_sharded import _slice_fill_buckets

    ndst = 8
    cap = max(256, (p // ndst) // 256 * 256 + 256)
    fstarts = jnp.asarray(
        np.linspace(0, max(p - cap, 0), ndst).astype(np.int32)
    )
    fends = jnp.minimum(fstarts + cap - 7, p)

    def sfill(st):
        acc = st[0]
        sk, sv = _slice_fill_buckets(
            fstarts + opaque_zero(acc), fends, cap, ndst,
            (kP, jnp.int32(0)), (vP, jnp.float32(0.0)),
        )
        return (acc + sk.sum(),)

    out["slice_fill_buckets"] = chain_time(
        sfill, (jnp.zeros((), jnp.int32),), k=k, floor=floor
    )

    def g1(st):
        acc = st[0]
        return (acc + ti[jnp.clip(jr + opaque_zero(acc), 0, e - 1)],)

    out["i32_gather_random"] = chain_time(
        g1, (jnp.zeros(p, jnp.int32),), k=k, floor=floor
    )

    def two_g1(st):
        acc = st[0]
        i = jnp.clip(jr + opaque_zero(acc), 0, e - 1)
        return (acc + ti[i] + jax.lax.bitcast_convert_type(tf, jnp.int32)[i],)

    out["two_single_gathers_random"] = chain_time(
        two_g1, (jnp.zeros(p, jnp.int32),), k=k, floor=floor
    )

    # two-sort rank pass vs the probe chain (m+1 probes into sorted e)
    from outerspace_tpu.ops.chain import ranks_in_sorted
    from outerspace_tpu.ops.spgemm import KEY_BIAS

    kE = jnp.asarray(
        np.sort(rng.integers(0, m * m, size=e)).astype(np.int64).astype(
            np.int32
        )
        + KEY_BIAS
    )
    probes = jnp.arange(m + 1, dtype=jnp.int32) * np.int32(m) + KEY_BIAS

    def ss(st):
        acc = st[0]
        r = jnp.searchsorted(
            kE, probes + opaque_zero(acc), side="left"
        ).astype(jnp.int32)
        return (acc + r,)

    out["searchsorted_probes"] = chain_time(
        ss, (jnp.zeros(m + 1, jnp.int32),), k=k, floor=floor
    )

    def rk(st):
        acc = st[0]
        r = ranks_in_sorted(kE, probes + opaque_zero(acc))
        return (acc + r,)

    out["rank_trick_probes"] = chain_time(
        rk, (jnp.zeros(m + 1, jnp.int32),), k=k, floor=floor
    )
    return out


def main(argv=None) -> int:
    import argparse
    import json

    ap = argparse.ArgumentParser(prog="outerspace_tpu.perf.microbench")
    ap.add_argument("--small", action="store_true",
                    help="CPU/CI sizes (fast, rates not meaningful)")
    ap.add_argument("--p", type=int, default=None)
    ap.add_argument("--e", type=int, default=None)
    ap.add_argument("--k", type=int, default=None)
    a = ap.parse_args(argv)
    if a.small:
        p, e, m, k = 16_384, 4_096, 512, 3
    else:
        p, e, m, k = 917_504, 196_608, 16_384, 20
    res = suite(p=a.p or p, e=a.e or e, m=m, k=a.k or k)
    print(json.dumps({kk: round(vv, 6) for kk, vv in res.items()}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
