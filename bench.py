"""Benchmark driver: SpGEMM A² suite on TPU vs the CPU reference.

Prints ONE JSON line to stdout:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
Per-workload details go to stderr.

The headline metric is the median wall-clock speedup of the TPU SpGEMM
device pipeline over the CPU reference on A-squared workloads — the
BASELINE.json north star: ">=10x CPU-reference wall-clock with nnz-exact
outputs". "CPU reference" is the reference's own outer-product pipeline
(TaskProvider multiply+merge, SimOuterSPACE.cpp:29-144) as a correct,
-O3 C++ program (csrc/ref_spgemm.cpp); the speedup against scipy's
csr_matmat (Gustavson) is reported alongside for transparency.

Timing methodology: operands are staged on device once (as a production
pipeline would hold them). The tunneled device link has a ~30 ms RPC
floor and `jax.block_until_ready` does not block, so each timed sample
runs K=4 *chained* full pipelines per scalar-fetch sync, subtracts the
separately-measured per-sync floor (reported as ``rpc_floor_s`` in every
record), and divides by K: the chain passes a provably-opaque zero
(min(nnz, 0)) from each iteration into the next iteration's kernel
inputs, so XLA cannot CSE the repeats — every sample is K genuinely
executed expand+sort+merge pipelines.
Correctness is validated outside the timed region: nnz-exact plus
order-invariant placement-sensitive checksums per workload, and one full
element-wise comparison on the .mtx fixture workload (small enough to
fetch over the slow tunnel).

CPU baselines run on a background thread overlapping the TPU compiles
(scipy/C++ release the GIL), which is how all four workloads + NN +
triangles fit the driver's deadline.
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import threading
import time

import numpy as np

_T0 = time.perf_counter()
# soft deadline: workload shedding aims here; the watchdog in main()
# guarantees the headline even if a degraded-tunnel compile blows
# through it (the driver's hard kill is ~595 s)
_DEADLINE_S = float(os.environ.get("OUTERSPACE_BENCH_DEADLINE", "545"))
_CHAIN_K = 4
# progress marker read by the watchdog headline: on a stalled run
# (a blocked remote compile cannot be aborted from Python) the headline
# names the stage that was in flight, so a thin capture is attributable
# to tunnel health at that exact point rather than left ambiguous
_STAGE = {"now": "init", "since": _T0}


def _stage(name: str) -> None:
    _STAGE["now"] = name
    _STAGE["since"] = time.perf_counter()


def _time_left() -> float:
    return _DEADLINE_S - (time.perf_counter() - _T0)


def _emit(rec: dict) -> None:
    """Print one stderr record, stamped with the suite wall clock so a
    capture shows where the deadline went (compiles and uploads that no
    per-field timer covers are the difference between records)."""
    rec["at_s"] = round(time.perf_counter() - _T0, 1)
    print(json.dumps(rec), file=sys.stderr, flush=True)


def _sync_scalar(x) -> float:
    return float(np.asarray(x))


_FLOOR_S = None

# Persistent XLA compilation cache: compiled executables (including
# their Mosaic kernels) keyed by HLO + compile options, stored in the
# repo and COMMITTED, so every later bench run deserializes instead of
# recompiling. Measured over the tunnel: the 131072-element sort probe
# compiles in 74 s cold (a mildly degraded day) and 0.7 s from cache; a
# Pallas kernel 42 s cold, 0.6 s cached. This is what makes the capture
# degradation-proof — the r03 capture lost 4 of 5 A² workloads to ONE
# 343 s remote compile that this cache reduces to ~seconds. All bench
# programs are deterministic (plans are pure host math, the autotuner
# is a cost model, operands are seeded), so HLO is byte-stable across
# rounds and the committed entries keep hitting.
_XLA_CACHE_DIR = os.environ.get("OUTERSPACE_XLA_CACHE") or os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "data", "xla_cache"
)
_CACHE = {"enabled": False, "hit": False, "entries": 0}


def _enable_compile_cache() -> bool:
    """Point JAX's persistent compilation cache at the committed repo
    dir. Gated off the CPU backend (tests and CPU dry-runs would bloat
    the committed dir with entries the TPU driver never reads) unless
    the user points OUTERSPACE_XLA_CACHE somewhere explicitly."""
    import jax

    try:
        if (
            jax.default_backend() == "cpu"
            and "OUTERSPACE_XLA_CACHE" not in os.environ
        ):
            return False
        os.makedirs(_XLA_CACHE_DIR, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", _XLA_CACHE_DIR)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        _CACHE["enabled"] = True
        _CACHE["entries"] = len(os.listdir(_XLA_CACHE_DIR))
        return True
    except Exception:
        return False


def _rpc_floor() -> float:
    """Measured per-sync RPC latency of the tunneled device link
    (~25-30 ms — fetching even one scalar pays it). Each timed sample
    below is one sync around a K-op chain, so per-op device time is
    (sample - floor) / K; reported alongside raw in every record."""
    global _FLOOR_S
    if _FLOOR_S is None:
        import jax.numpy as jnp

        x = jnp.int32(1)
        _sync_scalar(x)  # connection warm-up
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            _sync_scalar(jnp.int32(1) + x)
            ts.append(time.perf_counter() - t0)
        _FLOOR_S = min(ts)
    return _FLOOR_S


def _per_op(ts: list[float], k: int) -> float:
    """Floor-corrected per-op device seconds from K-chained samples;
    clamped so a sample at/below the floor still reports a positive
    bound (the chain itself proves device work happened)."""
    best = min(ts)
    return max(best - _rpc_floor(), best * 0.05) / k


def _sample_chain(run_sync, k: int, reps: int = 3):
    """Timed samples of an already-warm K-chained runner (call it once
    before this for compile+warm); returns (per-op seconds, raw
    samples) — the shared sampler behind the NN/graph records."""
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        run_sync()
        ts.append(time.perf_counter() - t0)
    return _per_op(ts, k), ts


def _cache_key_canary() -> None:
    """Diagnostic record for cache-key drift, and the proof of its root
    cause: XLA-level debug locations are canonicalized out of the cache
    key (the sort canary's key survives source edits that shift its own
    line), but a Pallas kernel's Mosaic payload inside tpu_custom_call
    embeds ITS OWN serialized source locations, opaque to the
    canonicalizer — so every Pallas-bearing program re-keys whenever
    the kernel-defining or call-path source lines shift. Verified live
    in r04: an edit above the canaries changed the pallas key and not
    the sort key. Consequence: on a FROZEN tree (driver conditions) all
    keys are stable and the committed cache hits; mid-development edits
    re-key the Pallas programs, which is why the dir keeps two
    generations. This record lets any future drift be checked against
    the module-bytes hash vs the full key (module stable + key moved ⇒
    backend/options changed; module moved ⇒ source lines shifted)."""
    # The canary leans on jax._src private modules whose layout moves
    # across releases; import each one separately so a future upgrade
    # degrades the diagnostic with a record NAMING the broken symbol
    # instead of an anonymous error (the broad except below would
    # otherwise swallow which import failed).
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    _priv = {}
    for mod, name in (
        ("jax._src.cache_key", "_ck"),
        ("jax._src.compiler", "_jc"),
        ("jax._src.xla_bridge", "_xb"),
        ("jax._src.interpreters.mlir", "_mlir"),
    ):
        try:
            import importlib

            _priv[name] = importlib.import_module(mod)
        except Exception as e:
            print(
                json.dumps({
                    "cache_key_canary_error":
                        f"private module {mod} unavailable "
                        f"(jax {jax.__version__}): {str(e)[:80]}"
                }),
                file=sys.stderr, flush=True,
            )
            return
    _ck, _jc, _xb, _mlir = (
        _priv["_ck"], _priv["_jc"], _priv["_xb"], _priv["_mlir"]
    )
    try:
        backend = _xb.get_backend()
        devices = np.array([[jax.devices()[0]]])

        import hashlib

        def key_of(fn, *args):
            lowered = jax.jit(fn).lower(*args)
            module = lowered.compiler_ir("stablehlo")
            opts = _jc.get_compile_options(
                num_replicas=1, num_partitions=1,
                device_assignment=devices,
            )
            full = _ck.get(module, devices, opts, backend)
            # split the key: module bytes vs everything else — a
            # drifted full key with a stable module hash implicates
            # backend/options, a drifted module hash implicates
            # lowering nondeterminism
            mod_h = hashlib.sha256(
                _mlir.module_to_bytecode(module)
            ).hexdigest()[:16]
            return {"key": full, "module": mod_h}

        sort_key = key_of(
            lambda a: jax.lax.sort((a, a), num_keys=1)[0][-1],
            jnp.arange(4096, dtype=jnp.int32),
        )

        def _pk(x_ref, o_ref):
            o_ref[...] = x_ref[...] * 2.0

        pallas_key = key_of(
            lambda x: pl.pallas_call(
                _pk,
                out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            )(x),
            jnp.ones((8, 128), jnp.float32),
        )
        print(
            json.dumps({
                "cache_key_canary": {
                    "sort": sort_key,
                    "pallas": pallas_key,
                    "platform_version": str(
                        getattr(backend, "platform_version", "?")
                    )[:80],
                    "jax": jax.__version__,
                }
            }),
            file=sys.stderr, flush=True,
        )
    except Exception as e:  # diagnostics only — never block the suite
        print(json.dumps({"cache_key_canary_error": str(e)[:150]}),
              file=sys.stderr, flush=True)


def _tunnel_probe(cap_s: float = 90.0, healthy_s: float = 12.0) -> float:
    """Tunnel-health probe: one tiny jit compile (~10 s healthy, minutes
    degraded) seeds the workload-shedding degrade factor and leaves a
    diagnostic stderr record so a thin capture is attributable to tunnel
    health, not the framework.

    Runs in a daemon thread with a bounded wait: on a healthy day it
    lands well inside the cap and nothing changes, but a blocking probe
    can eat most of the budget by itself on a degraded day (captured
    live: a 411.6 s probe left 85 s for the whole suite while the very
    next workload compile took a healthy 19.3 s — the bad window was
    transient and the probe absorbed all of it). Past the cap the suite
    proceeds with the cap as the degrade seed; the probe record is
    emitted whenever the compile actually lands (or as
    ``tunnel_probe_inflight_s`` at cap time).

    The FIRST DEVICE CONTACT (tunnel handshake + a trivial program) is
    warmed and reported SEPARATELY before the timed compile: measured
    live at ~60 s on a slow evening while the very same session's
    compiles ran 14-20 s — attributing that to the probe capped it at
    the old 45 s bound and disabled the committed cache exactly when it
    would have helped (the r05 regeneration runs caught this). The cap
    is 90 s so only a genuinely wedged tunnel trips the disable."""
    import threading

    import jax
    import jax.numpy as jnp

    probe: dict = {"s": None, "contact": None}

    def probe_fn():
        tc = time.perf_counter()
        _sync_scalar(jnp.ones((), jnp.float32) + 1.0)
        probe["contact"] = time.perf_counter() - tc
        t0 = time.perf_counter()
        _sync_scalar(
            jax.jit(
                lambda a: jax.lax.sort((a, a), num_keys=1)[0][-1]
            )(jnp.arange(131072, dtype=jnp.int32))
        )
        probe["s"] = time.perf_counter() - t0
        rec = {
            "tunnel_probe_compile_s": round(probe["s"], 1),
            "device_contact_s": round(probe["contact"], 1),
        }
        if _CACHE["enabled"]:
            # A cache hit is an executable LOAD, not a compile: the
            # serialized binary ships over the tunnel's slow data path
            # (~1 MB/s), so a hit still takes seconds (measured: 0.4 s
            # standalone, up to ~20 s as the process's first device
            # contact). The threshold only needs to separate hits from
            # DEGRADED cold compiles (minutes) — a <25 s probe means
            # compile costs are cheap this run either way, so pricing
            # them at the cache-hit rate is safe even on a miss.
            _CACHE["hit"] = probe["s"] < 25.0 and _CACHE["entries"] > 0
            rec["xla_cache_entries"] = _CACHE["entries"]
            rec["xla_cache_hit"] = _CACHE["hit"]
        print(json.dumps(rec), file=sys.stderr, flush=True)

    th = threading.Thread(target=probe_fn, daemon=True)
    th.start()
    th.join(timeout=cap_s)
    if probe["s"] is None:
        print(
            json.dumps({"tunnel_probe_inflight_s": cap_s}),
            file=sys.stderr, flush=True,
        )
        if _CACHE["enabled"] and not os.environ.get(
            "OUTERSPACE_KEEP_CACHE"
        ):
            # A capped probe means the cache did NOT save this run —
            # the entries are stale, or the day is degraded enough that
            # even loads crawl. Fall back to cold-compile shedding and
            # stop cache WRITES too (an unstable-key day would otherwise
            # append a fresh generation of multi-MB entries to the
            # committed dir). jax_enable_compilation_cache is the knob
            # that is honored after the cache is initialized — updating
            # jax_compilation_cache_dir at this point is ignored
            # (observed live: the "disabled" run kept writing entries).
            # OUTERSPACE_KEEP_CACHE=1 skips the disable: the
            # REGENERATION workflow (cold run into a fresh dir that
            # becomes the one committed generation) wants every write
            # even when the probe rides a degraded window.
            try:
                jax.config.update("jax_enable_compilation_cache", False)
                _CACHE["enabled"] = False
                print(json.dumps({"xla_cache_disabled": "probe_capped"}),
                      file=sys.stderr, flush=True)
            except Exception:
                pass
    if _CACHE["hit"]:
        return 1.0
    return max(1.0, (probe["s"] or cap_s) / healthy_s)


def _time_host(fn, reps: int = 3):
    t0 = time.perf_counter()
    fn()
    first = time.perf_counter() - t0
    if first > 20.0:
        return first
    if first > 3.0:
        t0 = time.perf_counter()
        fn()
        return min(first, time.perf_counter() - t0)
    ts = [first]
    for _ in range(reps - 1):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def _cpu_baselines_async(g):
    """scipy + C++ reference timings on a background thread (overlaps the
    TPU compiles; both baselines release the GIL)."""
    out = {}

    def work():
        s = g.to_scipy().tocsr()
        s.sort_indices()
        out["t_scipy"] = _time_host(lambda: s @ s)
        c_ref = s @ s
        c_ref.sum_duplicates()
        c_ref.sort_indices()
        out["c_ref"] = c_ref
        from outerspace_tpu.runtime.native import ref_spgemm_native

        a_csc0, b_csr0 = g.to_csc(), g.to_csr()
        if ref_spgemm_native(a_csc0, b_csr0) is not None:
            out["t_cpu"] = _time_host(
                lambda: ref_spgemm_native(a_csc0, b_csr0), reps=2
            )
        else:
            out["t_cpu"] = out["t_scipy"]

    th = threading.Thread(target=work, daemon=True)
    th.start()
    return th, out


def _chain_k(flops: int) -> int:
    """Chain length per sync: the ~30 ms RPC floor needs amortizing only
    when the pipeline itself is fast; long chains quadruple XLA compile
    time on huge programs for no benefit. Tiny workloads (the .mtx
    fixture) keep a short chain too — they exist for file-path and
    exactness validation, not throughput, and the floor is subtracted
    anyway; a degraded tunnel day once spent 143 s compiling the
    fixture's 4-chain and squeezed out the NN/MCL benches."""
    if flops < 1e6:
        return 2
    if flops < 3e7:
        return _CHAIN_K
    if flops < 8e7:
        return 2
    return 1


def _chain_jit(make_once, k):
    """Chain K pipelines per sync; the fetched vector carries the chained
    nnz (int32, exact) plus the LAST iteration's validation checksums
    (f32 bitcast into the int32 lanes — int containers survive the
    tunnel, f32 lanes flush small-int denormals). Folding the checksums
    into the chain means validation needs NO second full-pipeline
    executable — previously each workload silently paid a ~60-80 s
    Mosaic recompile for an unchained validation run."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run():
        nnz = jnp.int32(0)
        sums = jnp.zeros(4, jnp.float32)
        for _ in range(k):
            bump_i = jnp.minimum(nnz, 0)  # 0 at runtime, opaque to XLA
            bump_f = bump_i.astype(jnp.float32)
            n_i, sums = make_once(bump_i, bump_f)
            nnz = nnz + n_i
        return jnp.concatenate(
            [nnz[None], jax.lax.bitcast_convert_type(sums, jnp.int32)]
        )

    return run


def _stream_sums(rows, cols, vals, valid):
    """Order-invariant placement-sensitive checksums of a masked COO
    stream (the device half of ``_validate``)."""
    import jax.numpy as jnp

    v = jnp.where(valid, vals, 0.0)
    r = jnp.where(valid, rows, 0)
    c = jnp.where(valid, cols, 0)
    return jnp.stack(
        [
            jnp.sum(v, dtype=jnp.float32),
            jnp.sum(jnp.abs(v), dtype=jnp.float32),
            jnp.sum(r * v, dtype=jnp.float32),
            jnp.sum(c * v, dtype=jnp.float32),
        ]
    )


def _bump_tiled(tplan, bump_i, bump_f):
    """Thread the chain dependency into every expand kernel's inputs."""
    src = tplan.device_args
    dev = {
        "classes": [
            dict(d, a_vals_t=d["a_vals_t"] + bump_f) if d is not None else None
            for d in src["classes"]
        ]
    }
    if "gather" in src:
        dev["gather"] = dict(src["gather"], bases=src["gather"]["bases"] + bump_i)
    if "light" in src:
        dev["light"] = dict(src["light"], a_vals=src["light"]["a_vals"] + bump_f)
    return dataclasses.replace(tplan, device_args=dev)


def _tiles_parts_run(tplan, flops):
    """Dispatch-loop sampler for a row-partitioned tiled plan (the
    gather branch's pattern): per part one cheap expand jit feeding the
    plan-shared ``_merge_stream_jit`` — a monolithic chain jit inlined
    k·nparts structurally-identical giant sorts (the dominant cold-
    bench compile cost), while here the sort program compiles ONCE per
    workload. Parts keep GLOBAL rows, so checksums add across parts.
    Separate executions cannot be CSE'd; the bump argument just keeps
    the expand inputs traced. Returns ``run(k=None)`` producing the
    ``_chain_jit`` fetch layout [k·nnz, 4 × f32-bitcast checksums]."""
    import jax
    import jax.numpy as jnp

    from outerspace_tpu.ops.spgemm import (
        _concat_pad_packed_jit,
        _merge_stream_jit,
        tiled_expand_packed,
        tiled_pad_count,
    )

    interp = jax.default_backend() == "cpu"
    mp, mrun = tplan.merge_pad, tplan.max_run
    m_rows, n_c = tplan.m, tplan.n
    # Rebased plans merge part-local keys under the COMMON global-m
    # sentinel; the traced row_base add restores global rows for the
    # checksums (0 for classic global-key plans — same executable).
    rebased = getattr(tplan, "rebased", False)

    def _mk_expand(tp):
        @jax.jit
        def f(bump_i, bump_f):
            tpb = _bump_tiled(tp, bump_i, bump_f)
            keys_l, vals_l, _ = tiled_expand_packed(tpb, interpret=interp)
            return _concat_pad_packed_jit(
                tuple(keys_l), tuple(vals_l), merge_pad=mp
            )
        return f

    part_fns = [_mk_expand(tp) for _, _, tp in tplan.parts]
    # pad_count = library truth (tiled_pad_count) + the pad-to-merge_pad
    # tail; it drives the merge epilogue's corner recovery, so it must
    # never be re-derived by hand here
    part_pads = [
        mp - tp.padded_total + tiled_pad_count(tp)
        for _, _, tp in tplan.parts
    ]

    @jax.jit
    def _postm(r, c, v, valid, pn, row_base):
        rg = jnp.where(valid, r + row_base, 0)
        return pn, _stream_sums(rg, c, v, valid)

    row_bases = [lo if rebased else 0 for lo, _, _ in tplan.parts]

    def run(k=None):
        kk = _chain_k(flops) if k is None else k
        pns, sums_l = [], []
        for _ in range(kk):
            for f, padc, rb in zip(part_fns, part_pads, row_bases):
                key, val = f(jnp.int32(0), jnp.float32(0.0))
                out = _merge_stream_jit(
                    key, val, jnp.int32(padc),
                    n_cols=n_c, sentinel_row=m_rows, max_run=mrun,
                )
                pn, s = _postm(*out, jnp.int32(rb))
                pns.append(pn)
                sums_l.append(s)
        nnz = jnp.sum(jnp.stack(pns))
        sums = jnp.sum(jnp.stack(sums_l[-len(part_fns):]), axis=0)
        return jnp.concatenate(
            [nnz[None], jax.lax.bitcast_convert_type(sums, jnp.int32)]
        )

    return run


def _validate_vec(vec, k, c_ref):
    """nnz-exact + checksum validation from a fetched chain vector
    (``_chain_jit`` layout: [k·nnz, 4 × f32-bitcast checksums])."""
    nnz_ok = int(vec[0]) == k * c_ref.nnz
    if not nnz_ok:
        return False, False
    dev_sums = np.asarray(vec[1:5]).view(np.float32).astype(np.float64)
    co = c_ref.tocoo()
    host_sums = np.array(
        [
            c_ref.data.sum(dtype=np.float64),
            np.abs(c_ref.data).sum(dtype=np.float64),
            (co.row * c_ref.data).sum(dtype=np.float64),
            (co.col * c_ref.data).sum(dtype=np.float64),
        ]
    )
    return True, bool(np.allclose(dev_sums, host_sums, rtol=3e-3, atol=1e-2))


def prepare_spgemm(name, g, exact_check=False, force_strategy=None):
    """Host-side stage of one A² workload: launch the CPU-baseline
    thread, choose the strategy, build the plan and the jitted runner
    closures. Triggers NO device compile (jit is lazy), so the suite
    prefetches the NEXT workload's prepare on a thread inside the
    CURRENT workload's remote-compile wait."""
    import jax
    import jax.numpy as jnp

    from outerspace_tpu.ops.spgemm import plan_tiled, spgemm_padded_tiled
    from outerspace_tpu.sched.planner import choose_strategy

    th, cpu = _cpu_baselines_async(g)
    a_csc, b_csr = g.to_csc(), g.to_csr()
    t0 = time.perf_counter()
    c0 = time.thread_time()
    strategy = force_strategy or choose_strategy(a_csc, b_csr)
    make_once = None  # branches without a dispatch-loop `run` set this
    if strategy == "flat":
        # XLA-only pipeline: used by the small .mtx fixture so it doesn't
        # add Mosaic compiles of fixture-sized kernel shapes to the suite.
        from outerspace_tpu.ops.spgemm import (
            max_duplicate_run,
            plan_to_device,
            spgemm_padded,
        )
        from outerspace_tpu.ops.symbolic import expansion_plan

        plan = expansion_plan(a_csc, b_csr)
        p_pad = plan.padded_size()
        flops = plan.expansion_size
        dev = plan_to_device(plan)
        mr = max_duplicate_run(plan)

        def make_once(bump_i, bump_f):
            d = dict(dev, a_vals=dev["a_vals"] + bump_f)
            m = spgemm_padded(plan, p_pad, device_args=d, max_run=mr)
            return m.nnz, _stream_sums(m.rows, m.cols, m.vals, m.valid)

        def merged_fn():
            return spgemm_padded(plan, p_pad, device_args=dev, max_run=mr)

    elif strategy == "gather":
        from outerspace_tpu.ops.gather_pipeline import (
            _part_device,
            plan_spgemm_gather,
            spgemm_gather_padded,
        )

        plan = plan_spgemm_gather(a_csc, b_csr)
        p_pad = plan.padded_total
        flops = plan.flops

        # NO monolithic chain jit here: the planner commonizes part
        # shapes, so every part (and every chain iteration) reuses the
        # ONE jitted ``_part_device`` executable — a monolith inlining
        # the parts compiles N structurally-identical giant sorts and
        # was the dominant cold-bench cost (rmat16's never survived a
        # captured run). Dispatches are async, so the device pipelines
        # parts back-to-back (the one-dispatch lax.scan runner was
        # measured 33% SLOWER — carry-serialized parts + per-iteration
        # dynamic-slices of the stacked operands; see
        # gather_pipeline._parts_scan_device). The sampler syncs once
        # on the fetched vector, and separate executions cannot be
        # CSE'd, so no bump threading is needed.
        @jax.jit
        def _post(r, c, v, valid, pn, row_base):
            # part rows are part-relative: lift to global for the
            # placement-sensitive checksums (as spgemm_gather_padded
            # does when materializing); row_base is traced so ONE
            # executable serves every part
            rg = jnp.where(valid, r + row_base, 0)
            return pn, _stream_sums(rg, c, v, valid)

        def run(k=None):
            kk = _chain_k(flops) if k is None else k
            nparts = len(plan.parts)
            pns, sums_l = [], []
            for _ in range(kk):
                for p in plan.parts:
                    dev = dict(p.dev)
                    dev["p_real_total"] = jnp.int32(p.p_real)
                    out = _part_device(
                        dev, ngroups=p.ngroups, b_win=p.b_win,
                        merge_pad=p.merge_pad, call_bits=p.call_bits,
                        n_cols=plan.n,
                        sentinel_row=plan.m, max_run=p.max_run,
                    )
                    pn, s = _post(*out, jnp.int32(p.row_base))
                    pns.append(pn)
                    sums_l.append(s)
            nnz = jnp.sum(jnp.stack(pns))
            # separate executions cannot be DCE'd, so any chain
            # iteration's checksums are the answer — use the last
            sums = jnp.sum(jnp.stack(sums_l[-nparts:]), axis=0)
            return jnp.concatenate(
                [nnz[None], jax.lax.bitcast_convert_type(sums, jnp.int32)]
            )

        def merged_fn():
            return spgemm_gather_padded(plan)

    else:
        from outerspace_tpu.ops.spgemm import (
            TiledPartsPlan,
            plan_tiled_parts,
            spgemm_padded_tiled_parts,
        )

        tplan = plan_tiled_parts(a_csc, b_csr)
        p_pad = tplan.padded_total
        from outerspace_tpu.ops.symbolic import expansion_plan

        flops = expansion_plan(a_csc, b_csr).expansion_size

        if isinstance(tplan, TiledPartsPlan) and tplan.merge_pad:
            # dispatch loop replaces the chain jit (make_once stays None)
            run = _tiles_parts_run(tplan, flops)

        elif isinstance(tplan, TiledPartsPlan):
            # uncommonized parts plan (rebased fallback): chain the
            # whole-plan runner instead of the shared-merge dispatcher
            def make_once(bump_i, bump_f):
                parts = [
                    (lo, hi, _bump_tiled(tp, bump_i, bump_f))
                    for lo, hi, tp in tplan.parts
                ]
                m = spgemm_padded_tiled_parts(
                    dataclasses.replace(tplan, parts=parts)
                )
                return m.nnz, _stream_sums(
                    m.rows, m.cols, m.vals, m.valid
                )

        else:
            def make_once(bump_i, bump_f):
                m = spgemm_padded_tiled(_bump_tiled(tplan, bump_i, bump_f))
                return m.nnz, _stream_sums(
                    m.rows, m.cols, m.vals, m.valid
                )

        def merged_fn():
            return spgemm_padded_tiled_parts(tplan)

    t_plan = time.perf_counter() - t0
    # Thread CPU time beside wall: on this 1-core box the plan phase
    # timeshares with the baseline threads (and, when prefetched, with
    # the previous workload's samples), so wall overstates the
    # planner's cost by the contention factor — rmat16's planner is
    # ~0.8 s warm / ~1.4 s cold of actual CPU (measured idle) while
    # its in-record wall can read 5-9 s.
    t_plan_cpu = time.thread_time() - c0
    k = _chain_k(flops)
    # gather and row-partitioned tiles define their own dispatch-loop run
    if strategy != "gather" and make_once is not None:
        run = _chain_jit(make_once, k)
    return dict(
        name=name, g=g, strategy=strategy, run=run, merged_fn=merged_fn,
        flops=flops, p_pad=p_pad, k=k, th=th, cpu=cpu, t_plan=t_plan,
        t_plan_cpu=t_plan_cpu, exact_check=exact_check,
    )


def execute_spgemm(prep: dict, on_sampled=None) -> dict:
    """Device stage of one A² workload: compile + warm, timed samples,
    validation against the (already overlapped) CPU baselines.

    ``on_sampled`` fires right AFTER the timed samples: the suite hooks
    the next workload's prefetch there, so its host planning + plan
    device transfers overlap this workload's validation/baseline-join
    and the next compile — but never the timed samples themselves
    (a concurrent multi-MB plan upload on the shared tunnel data path
    would contaminate them)."""
    name, g, run, k = prep["name"], prep["g"], prep["run"], prep["k"]
    th, cpu, flops = prep["th"], prep["cpu"], prep["flops"]
    t0 = time.perf_counter()
    vec = np.asarray(run())  # compile + warm (one 5-lane fetch = 1 RPC)
    t_compile = time.perf_counter() - t0
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        vec = np.asarray(run())
        ts.append(time.perf_counter() - t0)
    t_tpu = _per_op(ts, k)
    if on_sampled is not None:
        on_sampled()

    th.join(timeout=max(_time_left() - 30, 5))
    c_ref = cpu.get("c_ref")
    if c_ref is None:  # baseline thread still running out of budget
        return dict(name=name, error="cpu baseline timeout")

    nnz_ok, val_ok = _validate_vec(vec, k, c_ref)
    exact_ok = None
    if prep["exact_check"] and nnz_ok:
        # full fetch: only for the small fixture (the one extra compile
        # of an unchained pipeline is fixture-sized, XLA-only)
        got = prep["merged_fn"]().to_csr()
        ref = c_ref
        exact_ok = bool(
            np.array_equal(got.indptr, ref.indptr)
            and np.array_equal(got.indices, ref.indices)
            and np.allclose(got.data, ref.data, rtol=1e-5, atol=1e-6)
        )

    rec = dict(
        name=name,
        strategy=prep["strategy"],
        # plan times EARLY in the line: r04's big-workload records lost
        # them to tail truncation in the driver capture
        t_plan_s=round(prep["t_plan"], 4),
        t_plan_cpu_s=round(prep["t_plan_cpu"], 4),
        nnz_in=g.nnz,
        nnz_out=int(c_ref.nnz),
        flops=int(flops),
        p_pad=int(prep["p_pad"]),
        t_cpu_ref_s=round(cpu["t_cpu"], 5),
        t_scipy_s=round(cpu["t_scipy"], 5),
        t_tpu_s=round(t_tpu, 5),
        rpc_floor_s=round(_rpc_floor(), 4),
        t_compile_s=round(t_compile, 1),
        speedup=round(cpu["t_cpu"] / t_tpu, 3),
        speedup_vs_scipy=round(cpu["t_scipy"] / t_tpu, 3),
        tpu_gflops=round(flops / t_tpu / 1e9, 3),
        tpu_mnnz_per_s=round(c_ref.nnz / t_tpu / 1e6, 1),
        nnz_exact=nnz_ok,
        values_match=val_ok,
    )
    if exact_ok is not None:
        rec["elementwise_exact"] = exact_ok
    return rec


def bench_one_spgemm(name, g, exact_check=False, force_strategy=None):
    """One A² workload end-to-end; returns the result record."""
    return execute_spgemm(
        prepare_spgemm(
            name, g, exact_check=exact_check, force_strategy=force_strategy
        )
    )


def bench_spgemm_suite(results: list | None = None) -> list[dict]:
    from outerspace_tpu.formats import erdos_renyi, read_mtx, rmat

    fixture = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "data", "mtx",
        "rmat10_ef8.mtx",
    )
    workloads = [
        # headline workloads first, small→large (the first pays the
        # slab-shared kernel compiles that rmat15/16 then reuse); the
        # .mtx fixture runs LAST — it shares no executables with the
        # tiled suite, and on degraded-tunnel days (remote compiles
        # arbitrarily ~10x slower) it must never be the one workload
        # that eats the deadline and leaves the headline 1-sampled
        ("rmat14_ef8", lambda: rmat(14, edge_factor=8, seed=1), False, None),
        ("er_100k_d1e-4",
         lambda: erdos_renyi(100_000, 100_000, 1e-4, seed=3), False, None),
        ("rmat15_ef8", lambda: rmat(15, edge_factor=8, seed=2), False, None),
        ("rmat16_ef8", lambda: rmat(16, edge_factor=8, seed=5), False, None),
    ]
    if os.path.exists(fixture):
        # file-based A² (BASELINE configs[0] stand-in) + the one full
        # element-wise validation of a hardware run (XLA-only path: no
        # fixture-sized Mosaic compiles)
        workloads.append(
            ("mtx_rmat10_a2", lambda: read_mtx(fixture), True, "flat")
        )
    # records append into the caller's list when given (the watchdog
    # reads it concurrently to report completed records on a hang)
    if results is None:
        results = []
    # Two-part healthy-day wall-cost priors per workload:
    # (compile seconds, everything-else seconds). The compile part
    # scales with the probe's degrade factor — and collapses to ~15%
    # when the committed compilation cache is hitting (deserialization
    # + executable load are all that's left); the rest is RPC/host
    # bound and scales with the measured tunnel floor instead.
    est_base = {
        "rmat14_ef8": (45.0, 30.0),
        "er_100k_d1e-4": (20.0, 20.0),
        "rmat15_ef8": (25.0, 30.0),
        "rmat16_ef8": (35.0, 55.0),
        "mtx_rmat10_a2": (35.0, 25.0),
    }
    _stage("tunnel_probe")
    degrade = _tunnel_probe()
    run_scale = max(1.0, _rpc_floor() / 0.045)

    def est(wname, dg):
        c, r = est_base.get(wname, (45.0, 45.0))
        # a cache hit replaces the compile with an executable LOAD over
        # the tunnel's data path (~40-50% of the healthy compile time),
        # which degrades with tunnel bandwidth like the rest of the
        # run-bound work — so it scales with run_scale, not the
        # compile-degrade factor
        cd = 0.45 * run_scale if _CACHE["hit"] else dg
        return c * cd + r * run_scale

    # Degraded cold-cache day: force ONE compile family across the A²
    # headliners. The autotuner picks gather for rmat14 (a real ~2x win
    # on tiles on healthy days), but its Mosaic compiles seed nothing
    # for the tiles-strategy rmat15/16 behind it; at >3x compile
    # degrade the suite can afford roughly one compile family, so it
    # spends it on the one that amortizes across the most records.
    # (only under the driver's deadline: a user-extended deadline means
    # the budget is explicit and the suite should run — and cache — the
    # healthy-day strategy choices)
    force_map = {}
    if (
        degrade > 3.0
        and not _CACHE["hit"]
        and "OUTERSPACE_BENCH_DEADLINE" not in os.environ
    ):
        force_map["rmat14_ef8"] = "tiles"
        _emit({"degraded_mode": "one_compile_family",
               "degrade": round(degrade, 1)})

    # rmat16 is a headline deliverable: every earlier workload holds
    # its estimated cost in reserve so the er100k/fixture records can
    # never be the reason rmat16 goes uncaptured (r01-r03 all shipped
    # without it). MCL's reserve lives in main()'s aux gates; on warm-
    # cache days its cost is ~30 s and always fits.
    headliners = ("rmat14_ef8", "rmat15_ef8", "rmat16_ef8")
    workload_index = {w[0]: j for j, w in enumerate(workloads)}
    skipped_names: set[str] = set()
    prepped: dict[str, object] = {}
    pf_thread = None

    def _prefetch(wname, gen, exact, forced_s):
        try:
            prepped[wname] = prepare_spgemm(
                wname, gen(), exact_check=exact, force_strategy=forced_s
            )
        except Exception as e:  # surfaced when the workload executes
            prepped[wname] = e

    for i, (name, gen, exact, forced) in enumerate(workloads):
        forced = force_map.get(name, forced)
        aux_reserve = 60.0 if _CACHE["hit"] else 80.0
        # reserve only for headliners still AHEAD in the order (a
        # passed-over one can never run — holding its phantom cost
        # would shed workloads that fit)
        rem = sum(
            est(h, degrade) for h in headliners
            if workload_index.get(h, -1) > i
        )
        if results and _time_left() < est(name, degrade) + rem + aux_reserve:
            print(json.dumps({"skipped": name, "reason": "deadline"}),
                  file=sys.stderr, flush=True)
            skipped_names.add(name)
            prepped.pop(name, None)
            continue
        _w0 = time.perf_counter()
        _stage(name)
        try:
            if pf_thread is not None:
                pf_thread.join()
                pf_thread = None
            for s in skipped_names:  # drop preps that landed post-skip
                prepped.pop(s, None)
            prep = prepped.pop(name, None)
            if prep is None:
                prep = prepare_spgemm(
                    name, gen(), exact_check=exact, force_strategy=forced
                )
            if isinstance(prep, Exception):
                raise prep

            # overlap the NEXT workload's host plan + CPU baselines +
            # plan transfers with THIS workload's validation and the
            # next compile — started only AFTER the timed samples (a
            # concurrent plan upload would contaminate them)
            def _start_next(i=i):
                nonlocal pf_thread
                if i + 1 < len(workloads):
                    nname, ngen, nexact, nforced = workloads[i + 1]
                    pf_thread = threading.Thread(
                        target=_prefetch,
                        args=(nname, ngen, nexact,
                              force_map.get(nname, nforced)),
                        daemon=True,
                    )
                    pf_thread.start()

            rec = execute_spgemm(prep, on_sampled=_start_next)
        except Exception as e:  # pragma: no cover - report and continue
            rec = dict(name=name, error=str(e)[:300])
        results.append(rec)
        cost = time.perf_counter() - _w0
        if not _CACHE["hit"]:
            # most-recent compile-degrade ratio, not a ratchet: a
            # one-off overshoot on the first workload must not
            # permanently inflate estimates
            c, r = est_base.get(name, (45.0, 45.0))
            degrade = max(1.0, (cost - r * run_scale) / c)
        _emit(rec)
    return results


def bench_nn_inference() -> dict:
    """Sparse-MLP inference (BASELINE configs[2]): pruned weights, the
    act·Wᵀ chain through the TPU SpMM pipeline vs the same chain on the
    scipy CPU oracle, with 1e-6-level parity checked."""
    import jax
    import jax.numpy as jnp

    from outerspace_tpu.nn.data import find_mnist_dir, load_mnist, synthetic_mnist
    from outerspace_tpu.nn.models import MLP1
    from outerspace_tpu.nn.prune import prune_params
    from outerspace_tpu.nn.sparse_infer import (
        SparseMLP,
        mlp_forward_dense,
        mlp_forward_spgemm,
    )

    data = load_mnist() if find_mnist_dir() else synthetic_mnist(2048)
    x = data["test"][0][:1024].reshape(-1, 784).astype(np.float32)
    # Prefer the committed TRAINED extreme-sparsity artifact (MLP1w
    # pruned to exactly 1% nnz per fc kernel + finetuned, 0.9770 test —
    # the reference's prune0p01 workload); fall back to a pruned random
    # init when the artifact is absent.
    art = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "data",
        "saved_weights", "MLP1w", "prune0p01_finetuned.pkl",
    )
    if os.path.exists(art):
        from outerspace_tpu.nn.train import load_params

        params = load_params(art)
        weights_tag = "MLP1w_prune0p01_finetuned"
    else:
        params = MLP1().init(
            jax.random.PRNGKey(0), jnp.zeros((4, 784))
        )["params"]
        params = prune_params(params, sparsity_level=0.1)
        weights_tag = "synthetic_init_pruned10"
    model = SparseMLP(params)
    xd = jnp.asarray(x)
    # K=64 bounds the floor-correction error: at ~2 ms/op the sample is
    # ~130 ms + the ~30 ms floor, so a floor drift of even 5 ms moves
    # the per-op figure by <4% (the r03 record's K=20 was measured 14x
    # below the floor, leaving the 102x claim unboundable)
    K = 64

    @jax.jit
    def run_k():
        tot = jnp.float32(0)
        xx = xd
        for _ in range(K):
            out = model(xx)
            tot = tot + jnp.sum(out)
            xx = xd + jnp.minimum(tot, 0.0)  # opaque zero: defeat CSE
        return tot

    _sync_scalar(run_k())  # compile + warm
    t_tpu, ts = _sample_chain(lambda: _sync_scalar(run_k()), K)
    t_cpu = _time_host(lambda: mlp_forward_spgemm(params, x, "scipy"), reps=3)
    dense = mlp_forward_dense(params, x)
    got = np.asarray(model(xd))
    err = float(np.max(np.abs(got - dense)) / max(np.max(np.abs(dense)), 1e-9))
    spread = (max(ts) - min(ts)) / max(min(ts), 1e-9)
    floor_frac = _rpc_floor() / max(min(ts), 1e-9)
    rec = dict(
        name="sparse_mlp_infer_b1024_spmm",
        weights=weights_tag,
        t_tpu_s=round(t_tpu, 5),
        rpc_floor_s=round(_rpc_floor(), 4),
        # measurement provenance: K ops per sync, all raw samples, their
        # spread, and the floor's share of a sample — enough to bound
        # the floor-correction error from the record alone
        chain_k=K,
        chain_samples_s=[round(t, 4) for t in ts],
        chain_spread=round(spread, 3),
        floor_frac=round(floor_frac, 3),
        floor_sensitive=bool(floor_frac > 0.5 and spread > 0.2),
        t_cpu_s=round(t_cpu, 5),
        speedup=round(t_cpu / t_tpu, 3),
        max_rel_err_vs_dense=err,
        parity_1e6=bool(err < 1e-6 * 10),
    )
    _emit(rec)
    return rec


def bench_lenet_inference() -> dict:
    """Sparse-LeNet inference on chip — the reference's flagship story
    (NN conv/fc layers as sparse GEMMs, ``get_mtx_files.py:117-133``)
    benched end-to-end: the committed pruned+finetuned LeNet artifact
    (conv 25% / fc 10% nnz), convs im2col-lowered inside ONE jitted
    device program with block-ELL weights on the MXU SpMM kernel, vs
    the same chain on the scipy CPU oracle. Parity vs the dense flax
    forward at the reference's 1e-6 eps (``SimSpGEMM.cpp:283``); a
    sub-batch additionally runs the full sparse×sparse SpGEMM pipeline
    (``lenet_forward_spgemm``) on chip as a second parity witness."""
    import jax
    import jax.numpy as jnp

    from outerspace_tpu.nn.data import find_mnist_dir, load_mnist, synthetic_mnist
    from outerspace_tpu.nn.models import LeNet
    from outerspace_tpu.nn.sparse_infer import (
        SparseLeNet,
        lenet_forward_spgemm,
    )
    from outerspace_tpu.nn.train import load_params

    art = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "data",
        "saved_weights", "LeNet", "pruned_finetuned",
    )
    if not os.path.exists(art):
        rec = dict(name="sparse_lenet_infer", error="artifact missing")
        _emit(rec)
        return rec
    params = load_params(art)
    data = load_mnist() if find_mnist_dir() else synthetic_mnist(512)
    x = data["test"][0][:256].reshape(-1, 28, 28, 1).astype(np.float32)
    model = SparseLeNet(params)
    xd = jnp.asarray(x)
    K = 8

    @jax.jit
    def run_k():
        tot = jnp.float32(0)
        xx = xd
        for _ in range(K):
            out = model._forward(xx)
            tot = tot + jnp.sum(out)
            xx = xd + jnp.minimum(tot, 0.0)  # opaque zero: defeat CSE
        return tot

    _sync_scalar(run_k())  # compile + warm
    t_tpu, ts = _sample_chain(lambda: _sync_scalar(run_k()), K)
    t_cpu = _time_host(
        lambda: lenet_forward_spgemm(params, x, backend="scipy"), reps=2
    )
    # dense oracle at HIGHEST matmul precision (default conv precision
    # quantizes to bf16, which would hide real kernel errors behind a
    # ~1e-3 noise floor)
    with jax.default_matmul_precision("float32"):
        dense = np.asarray(LeNet().apply({"params": params}, xd)[0])
    got = np.asarray(model(xd))
    err = float(np.max(np.abs(got - dense)) / max(np.max(np.abs(dense)), 1e-9))
    rec = dict(
        name="sparse_lenet_infer_b256",
        weights="LeNet_pruned_finetuned",
        t_tpu_s=round(t_tpu, 5),
        rpc_floor_s=round(_rpc_floor(), 4),
        chain_k=K,
        chain_samples_s=[round(t, 4) for t in ts],
        t_cpu_s=round(t_cpu, 5),
        speedup=round(t_cpu / t_tpu, 3),
        max_rel_err_vs_dense=err,
        parity_1e6=bool(err < 1e-6 * 10),
    )
    # Second witness when budget allows: the sparse×sparse SpGEMM
    # pipeline (every layer act·Wᵀ through plan+expand+sort+merge on
    # chip) on a sub-batch, vs the same dense oracle.
    if _time_left() > 60:
        try:
            sp8 = lenet_forward_spgemm(params, x[:8], backend="tpu")
            e8 = float(
                np.max(np.abs(sp8 - dense[:8]))
                / max(np.max(np.abs(dense[:8])), 1e-9)
            )
            rec["spgemm_path_rel_err"] = e8
            rec["spgemm_path_parity_1e6"] = bool(e8 < 1e-6 * 10)
        except Exception as e:  # parity witness must not kill the record
            rec["spgemm_path_error"] = str(e)[:200]
    _emit(rec)
    return rec


def bench_triangles() -> dict:
    """Triangle counting via A² (BASELINE configs[3]); the whole count
    runs as one chained jit on the strategy the cost model picks
    (dense-MXU blocked A·A at this scale; the SpGEMM pipeline +
    edge-bitmap Hadamard past the dense envelope)."""
    import jax
    import jax.numpy as jnp

    from outerspace_tpu.formats import rmat
    from outerspace_tpu.ops.graph import (
        _symmetrize_simple,
        _tri_dense_jit,
        _tri_sum_jit,
        _triangle_strategy,
        triangle_count,
        triangle_prepare,
    )
    from outerspace_tpu.ops.spgemm import spgemm_padded_tiled

    g = rmat(13, edge_factor=8, seed=4)
    sym = _symmetrize_simple(g)
    strategy = _triangle_strategy(sym)
    K = 4

    if strategy == "dense":
        n = max(sym.shape)
        n_pad = -(-n // 256) * 256
        rows = jnp.asarray(sym.row.astype(np.int32))
        cols = jnp.asarray(sym.col.astype(np.int32))

        @jax.jit
        def run_k():
            tot = jnp.int32(0)
            for _ in range(K):
                bump_i = jnp.minimum(tot, 0)  # opaque zero: defeat CSE
                tot = tot + _tri_dense_jit(
                    rows, cols, bump_i, n_pad=n_pad, block=2048
                )
            return tot

    else:
        prep = triangle_prepare(sym)
        tplan, bitmap_dev, n, n_words = prep

        @jax.jit
        def run_k():
            tot = jnp.float32(0)
            for _ in range(K):
                bump_f = jnp.minimum(tot, 0.0)
                bump_i = bump_f.astype(jnp.int32)
                m = spgemm_padded_tiled(_bump_tiled(tplan, bump_i, bump_f))
                tot = tot + _tri_sum_jit(
                    m.rows, m.cols, m.vals, m.valid, bitmap_dev,
                    n_words=n_words,
                )
            return tot

    total = _sync_scalar(run_k())  # compile + warm
    n_tpu = int(round(total / K / 6.0))
    t_tpu, _ts = _sample_chain(lambda: _sync_scalar(run_k()), K)
    t_cpu = _time_host(lambda: triangle_count(g, backend="scipy"), reps=2)
    n_cpu = triangle_count(g, backend="scipy")
    rec = dict(
        name="triangles_rmat13",
        strategy=strategy,
        triangles=n_tpu,
        t_tpu_s=round(t_tpu, 5),
        rpc_floor_s=round(_rpc_floor(), 4),
        t_cpu_s=round(t_cpu, 5),
        speedup=round(t_cpu / t_tpu, 3),
        counts_match=bool(n_tpu == n_cpu),
    )
    _emit(rec)
    return rec


def bench_mcl(scale: int = 14) -> dict:
    """Markov clustering (BASELINE configs[3] part 2): the staged device
    chain — tiled first squaring + fused fori_loop iterations — as ONE
    jitted program per run vs the scipy host loop. Static loop sizes
    come from the persisted sizing cache (``sched.sizing_cache``, keyed
    by workload hash) — warm cache skips the ~150 s sizing-pass compile;
    cold cache runs the sizing pass and writes it back. The device
    ``ok`` flag still guards the budgets with an exact fallback; the
    record reports whether the one-jit fast path was actually timed.

    ``scale=15`` is the headline-multiplier record (VERDICT r4 weak #1:
    the scipy gap WIDENS with scale — the fused chain amortizes its
    fixed passes, ~31× at rmat15 vs ~9× at rmat14)."""
    import numpy as np

    from outerspace_tpu.formats import rmat
    from outerspace_tpu.formats.coo import COO
    from outerspace_tpu.ops.graph import (
        _col_normalize,
        markov_cluster,
        mcl_clusters,
        mcl_prepare,
        mcl_run,
    )

    g = rmat(scale, edge_factor=8, seed=7)
    n = g.shape[0]
    m = COO(
        g.shape,
        np.concatenate([g.row, np.arange(n, dtype=g.row.dtype)]),
        np.concatenate([g.col, np.arange(n, dtype=g.col.dtype)]),
        np.concatenate([np.abs(g.val), np.ones(n, dtype=np.float32)]),
    ).deduplicated()
    t0 = time.perf_counter()
    prep = mcl_prepare(_col_normalize(m.to_csr()), iters=4)
    t_plan = time.perf_counter() - t0
    out = mcl_run(prep)  # compile + warm (sizing pass if cache cold)
    budgets = (prep.get("p_pad"), prep.get("nnz_pad"))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = mcl_run(prep)
        ts.append(time.perf_counter() - t0)
    t_tpu = _per_op(ts, 1)
    # fast path = the one-jit program survived every timed run (an
    # ok-flag fallback drops "program" and doubles the budgets)
    fast_path = "program" in prep and (
        budgets == (prep.get("p_pad"), prep.get("nnz_pad"))
    )
    t_cpu = _time_host(
        lambda: markov_cluster(g, iters=4, backend="scipy"), reps=2
    )
    f_cpu = markov_cluster(g, iters=4, backend="scipy")
    f_tpu = out.to_csr()
    rec = dict(
        name=f"mcl_rmat{scale}_4iter",
        t_tpu_s=round(t_tpu, 5),
        rpc_floor_s=round(_rpc_floor(), 4),
        t_cpu_s=round(t_cpu, 5),
        t_plan_s=round(t_plan, 3),
        speedup=round(t_cpu / t_tpu, 3),
        fast_path=bool(fast_path),
        sizing_cached=bool(prep.get("sizing_cached", False)),
        nnz_match=bool(f_tpu.nnz == f_cpu.nnz),
        clusters_match=bool(
            len(mcl_clusters(f_tpu)) == len(mcl_clusters(f_cpu))
        ),
    )
    _emit(rec)
    return rec


def bench_sharded(scale: int = 13, seed: int = 7, k_ops: int = 10) -> dict:
    """The SPMD sharded-tiled pipeline on a (1,1) mesh — the one real
    chip runs the full multi-chip program (per-device Pallas expand,
    local owner-bucket sort, slice-fill exchange buffers, all_to_all,
    key-range-partitioned merges), so the exchange machinery's overhead
    vs the single-chip pipeline is measured on hardware every round.
    The reference's whole point is the multiply→merge DRAM exchange
    (``SimOuterSPACE.cpp:721-857``); this is its device-mesh analogue
    under ``shard_map``.

    ``scale=16`` (seed 5, the headline rmat16 operand) hits m·n = 2³²
    exactly, so the plan auto-engages REBASED per-(owner, chunk)-bucket
    keys — the largest headliner running the flagship Pallas sharded
    program (VERDICT r4 missing #1; measured 380 ms/op at the auto
    chunks=2, compile ~17 s)."""
    import jax

    from outerspace_tpu.formats import rmat
    from outerspace_tpu.ops.reference import spgemm_scipy
    from outerspace_tpu.shard import make_mesh
    from outerspace_tpu.shard.tiled import build_sharded_tiled, shard_plan_tiled

    g = rmat(scale, edge_factor=8, seed=seed)
    t0 = time.perf_counter()
    c0 = time.thread_time()
    plan = shard_plan_tiled(g.to_csc(), g.to_csr(), kx=1, ny=1)
    t_plan = time.perf_counter() - t0
    t_plan_cpu = time.thread_time() - c0
    mesh = make_mesh((1,), ("x",))
    fn, args = build_sharded_tiled(plan, mesh, axes="x")
    K = k_ops
    with mesh:
        jfn = jax.jit(fn)
        t0 = time.perf_counter()
        out = jfn(*args)
        nnz_tpu = int(np.asarray(out[4]).sum())  # compile + warm
        t_compile = time.perf_counter() - t0
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(K):
                out = jfn(*args)
            _sync_scalar(np.asarray(out[4]).ravel()[0])
            ts.append(time.perf_counter() - t0)
    t_tpu = _per_op(ts, K)
    # one scipy product serves baseline timing AND the nnz oracle (at
    # rmat16 scale a second rep would cost ~10 s of budget)
    t0 = time.perf_counter()
    c_ref = spgemm_scipy(g, g)
    t_cpu = time.perf_counter() - t0
    rec = dict(
        name=f"sharded_rmat{scale}_1x1",
        t_plan_s=round(t_plan, 3),
        t_plan_cpu_s=round(t_plan_cpu, 3),
        t_tpu_s=round(t_tpu, 5),
        rpc_floor_s=round(_rpc_floor(), 4),
        t_compile_s=round(t_compile, 1),
        t_scipy_s=round(t_cpu, 5),
        speedup_vs_scipy=round(t_cpu / t_tpu, 3),
        rebase=bool(plan.rebase),
        chunks=plan.chunks,
        merge_parts=plan.merge_parts,
        capacity=plan.capacity,
        nnz_exact=bool(nnz_tpu == c_ref.nnz),
    )
    _emit(rec)
    return rec


def bench_structured(fname: str) -> dict:
    """Structured-operand A² tail records (VERDICT r4 weak #2): banded
    and 2-D-mesh operands exercise the planner's dense tile classes at
    high fill and the low-skew gather path in ways R-MAT/ER don't.
    Fixture-scale, forced onto the XLA flat path (no Mosaic compiles),
    element-wise exact vs scipy — they can never displace the
    headliners (tail gates in main). Reference: configs[0]'s
    "SuiteSparse .mtx" intent — real matrices are structured."""
    from outerspace_tpu.formats import read_mtx

    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "data", "mtx", fname
    )
    name = fname.replace(".mtx", "") + "_a2"
    rec = bench_one_spgemm(
        name, read_mtx(path), exact_check=True, force_strategy="flat"
    )
    _emit(rec)
    return rec


_HEADLINE_LOCK = threading.Lock()


def _print_headline(results, done_evt, stalled: bool = False) -> None:
    with _HEADLINE_LOCK:
        if done_evt.is_set():
            return
        done_evt.set()
    good = [r for r in results if "error" not in r]
    ok = bool(good) and all(
        r["nnz_exact"] and r["values_match"] for r in good
    )
    # headline over the four A² workloads; the tiny .mtx fixture exists
    # for the file path + element-wise validation, not throughput
    speedups = [
        r["speedup"] for r in good if not r["name"].startswith("mtx_")
    ] or [r["speedup"] for r in good]
    median = float(np.median(speedups)) if speedups else 0.0
    value = median if ok else 0.0
    line = {
        "metric": "spgemm_a2_median_speedup_vs_cpu_reference",
        "value": round(value, 3),
        "unit": "x",
        "vs_baseline": round(value, 3),
        "records": len(good),
    }
    if stalled:
        # watchdog path: the run hung inside a remote compile — name
        # the in-flight stage so the capture attributes itself (a
        # total tunnel outage stalls in "tunnel_probe" with 0 records)
        line["stalled_in"] = _STAGE["now"]
        line["stalled_for_s"] = round(time.perf_counter() - _STAGE["since"], 1)
    print(json.dumps(line), flush=True)


def main() -> None:
    # LAST-RESORT WATCHDOG: a blocked remote compile cannot be aborted
    # from Python, so a degraded-tunnel workload that hangs after its
    # deadline check passes would ride straight into the driver's hard
    # process kill and lose the headline. Shortly before that kill the
    # watchdog prints the headline from whatever records completed and
    # exits; the ``done`` event keeps the ONE-json-line contract when
    # the normal path got there first.
    _enable_compile_cache()
    _cache_key_canary()
    results: list[dict] = []
    done = threading.Event()
    # the 578 s cap encodes the DRIVER's ~595 s hard kill; a user who
    # extends the soft deadline explicitly runs without that kill, so
    # the watchdog scales with their deadline instead of truncating it
    watchdog_at = (
        _DEADLINE_S + 30.0
        if "OUTERSPACE_BENCH_DEADLINE" in os.environ
        else min(_DEADLINE_S + 30.0, 578.0)
    )

    def _watchdog():
        remaining = watchdog_at - (time.perf_counter() - _T0)
        if remaining > 0 and not done.wait(timeout=remaining):
            _print_headline(results, done, stalled=True)
            os._exit(0)

    threading.Thread(target=_watchdog, daemon=True).start()
    # the suite appends into the SHARED list so the watchdog reports
    # records completed before a mid-suite hang, not an empty list
    bench_spgemm_suite(results)
    # the contract line depends only on the A² suite — print it BEFORE
    # the auxiliary benches so a hard process timeout mid-aux (degraded-
    # tunnel compiles can eat minutes) can never lose the headline
    _print_headline(results, done)
    try:
        # the MCL program's cold compile is ~115 s (three loop-body
        # sizes + the split tail) — but on a warm compilation cache it
        # loads in ~30-60 s (the 43 MB executable rides the tunnel's
        # data path), so the gate adapts; MCL runs right after the
        # cheap NN record because it is a headline deliverable
        # (BASELINE configs[3]) that r01-r03 kept losing to the deadline
        mcl_gate = 70 if _CACHE["hit"] else 130
        mcl15_gate = 90 if _CACHE["hit"] else 160
        for gate, name, fn in (
            (45, "sparse_mlp_infer_b1024_spmm", bench_nn_inference),
            (mcl_gate, "mcl_rmat14_4iter", bench_mcl),
            # the headline-multiplier MCL record (~31x scipy at rmat15 —
            # the fused chain amortizes its fixed passes with scale)
            (mcl15_gate, "mcl_rmat15_4iter", lambda: bench_mcl(15)),
            # the largest headliner through the flagship sharded
            # program (auto-REBASED keys at m*n = 2^32)
            (100, "sharded_rmat16_1x1",
             lambda: bench_sharded(16, seed=5, k_ops=3)),
            (40, "triangles_rmat13", bench_triangles),
            # structured-operand records: banded + 2-D mesh (cheap
            # flat-path programs — ahead of the two records below whose
            # warm cost is dominated by multi-MB executable LOADS, so a
            # slow-tunnel evening sheds at most those two)
            (25, "band2048_p5_a2",
             lambda: bench_structured("band2048_p5.mtx")),
            (25, "mesh2d_48_a2",
             lambda: bench_structured("mesh2d_48.mtx")),
            (60, "sparse_lenet_infer_b256", bench_lenet_inference),
            (40, "sharded_rmat13_1x1", bench_sharded),
        ):
            if _time_left() > gate:
                _stage(name)
                fn()
            else:
                print(
                    json.dumps({"skipped": name, "reason": "deadline"}),
                    file=sys.stderr, flush=True,
                )
    except Exception as e:  # auxiliary benches must not kill the run
        print(json.dumps({"aux_bench_error": str(e)[:300]}), file=sys.stderr)


if __name__ == "__main__":
    main()
