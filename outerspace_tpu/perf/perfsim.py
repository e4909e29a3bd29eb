"""ctypes wrapper for the C++ discrete-event TPU performance model.

See ``csrc/perfsim.cpp`` — the native re-design of the reference's
cycle-accurate simulator (``SimCycle.h`` + ``SimOuterSPACE.cpp:240-857``).
Consumed by (a) the CLI's dual-model report, cross-checked against the
analytical roofline the same way the reference always printed both models
(``SimOuterSPACE.cpp:859-875``), and (b) the scheduler: the per-class
relative tile costs it predicts drive ``sched.autotune.tile_ns``
(anchored to the measured (8, 128)-class constant), which the planner's
trim pass and the waste-limit grid search consult.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_TRIED = False


def _lib_path() -> str:
    return os.path.abspath(
        os.path.join(os.path.dirname(__file__), "..", "csrc", "libouterspace.so")
    )


def build_native(force: bool = False) -> bool:
    """Build libouterspace.so with make; returns availability.

    Always invokes make (the Makefile's ``$(TARGET): $(SOURCES)`` rule
    makes a fresh build a no-op) so a stale prebuilt .so can never
    shadow newer csrc sources — a stale lib would make feature probes
    (``hasattr(lib, 'osp_sim_merge')`` etc.) silently disable newer
    entry points. If make is unavailable, an existing .so is still
    accepted (callers probe per-symbol availability)."""
    path = _lib_path()
    csrc = os.path.dirname(path)
    cmd = ["make", "-C", csrc] + (["--always-make"] if force else [])
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
    except (subprocess.CalledProcessError, FileNotFoundError):
        return os.path.exists(path) and not force
    return os.path.exists(path)


def load(build: bool = True):
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if build:
        build_native()  # no-op when the .so is newer than the sources
    if not os.path.exists(_lib_path()):
        return None
    lib = ctypes.CDLL(_lib_path())
    lib.osp_sim_kernel.restype = ctypes.c_int64
    lib.osp_sim_kernel.argtypes = [
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_double),
    ]
    lib.osp_sim_kernel_uniform.restype = ctypes.c_int64
    lib.osp_sim_kernel_uniform.argtypes = [
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_double),
    ]
    lib.osp_sim_fifo_selftest.restype = ctypes.c_int
    lib.osp_sim_fifo_selftest.argtypes = []
    if hasattr(lib, "osp_sim_arbiter_selftest"):
        lib.osp_sim_arbiter_selftest.restype = ctypes.c_int
        lib.osp_sim_arbiter_selftest.argtypes = []
    if hasattr(lib, "osp_sim_set_stats_dump"):
        lib.osp_sim_set_stats_dump.restype = None
        lib.osp_sim_set_stats_dump.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int64,
        ]
    if hasattr(lib, "osp_sim_kernel_cached"):
        lib.osp_sim_kernel_cached.restype = ctypes.c_int64
        lib.osp_sim_kernel_cached.argtypes = [
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int,
            ctypes.c_int64,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_double),
        ]
    if hasattr(lib, "osp_sim_merge"):
        lib.osp_sim_merge.restype = ctypes.c_int64
        lib.osp_sim_merge.argtypes = [
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_double),
        ]
    if hasattr(lib, "osp_sim_sharded"):
        lib.osp_sim_sharded.restype = ctypes.c_int64
        lib.osp_sim_sharded.argtypes = [
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_double,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_double),
        ]
    if hasattr(lib, "osp_sim_sort_cycles"):
        lib.osp_sim_sort_cycles.restype = ctypes.c_int64
        lib.osp_sim_sort_cycles.argtypes = [ctypes.c_int64]
    if hasattr(lib, "osp_sim_ici_selftest"):
        lib.osp_sim_ici_selftest.restype = ctypes.c_int
        lib.osp_sim_ici_selftest.argtypes = []
    if hasattr(lib, "osp_sim_rowbuffer_selftest"):
        lib.osp_sim_rowbuffer_selftest.restype = ctypes.c_int
        lib.osp_sim_rowbuffer_selftest.argtypes = []
    if hasattr(lib, "osp_sim_set_config"):
        lib.osp_sim_set_config.restype = None
        lib.osp_sim_set_config.argtypes = [ctypes.POINTER(ctypes.c_double)]
    if hasattr(lib, "osp_sim_get_config"):
        lib.osp_sim_get_config.restype = None
        lib.osp_sim_get_config.argtypes = [ctypes.POINTER(ctypes.c_double)]
        # snapshot the library's built-in CALIBRATED defaults at load
        # time (before any set_config) — the C++ SimConfig literals are
        # the single source of truth, nothing is duplicated here
        vals = (ctypes.c_double * len(_CFG_KEYS))()
        lib.osp_sim_get_config(vals)
        CALIBRATED_CONFIG.update(
            {k: float(vals[i]) for i, k in enumerate(_CFG_KEYS)}
        )
    _LIB = lib
    return lib


# Chip-spec machine values (v5e): the analytical roofline's
# speed-of-light numbers. The library's built-in default is instead the
# CALIBRATED machine (see csrc/perfsim.cpp SimConfig — serialized-chain
# kernel measurements: ~470 GB/s large-block Pallas streams, ~200-cycle
# per-grid-step overhead); CALIBRATED_CONFIG is snapshotted from the
# library at load time, so set_config(**CALIBRATED_CONFIG) restores the
# C++ defaults exactly.
SPEC_CONFIG = dict(hbm_bytes_per_cycle=871.0, grid_overhead=10)
CALIBRATED_CONFIG: dict[str, float] = {}
_CFG_KEYS = (
    "hbm_bytes_per_cycle",
    "hbm_channels",
    "hbm_latency",
    "dma_max_outstanding",
    "vpu_lanes",
    "mxu_ops_per_cycle",
    "grid_overhead",
    "sort_pairs_per_cycle",
    # DRAM row-buffer state (ramulator's role in the reference,
    # SimOuterSPACE.cpp:608-719): open-row hit vs row-miss first-beat
    # latency per (channel, bank) — the mechanism behind the measured
    # ~14 ns/elem random-access vs stream-rate sequential asymmetry
    "hbm_row_bytes",
    "hbm_banks",
    "hbm_row_hit",
    "hbm_row_miss",
)


def set_config(**kw) -> None:
    """Override event-model machine constants at runtime (unset keys keep
    their current values). E.g. ``set_config(**SPEC_CONFIG)`` switches
    from the calibrated tunnel-slice machine to chip-spec bandwidth."""
    lib = load()
    if lib is None or not hasattr(lib, "osp_sim_set_config"):
        raise RuntimeError("native perfsim not built (make -C csrc)")
    vals = (ctypes.c_double * len(_CFG_KEYS))(*[-1.0] * len(_CFG_KEYS))
    for i, k in enumerate(_CFG_KEYS):
        if k in kw:
            vals[i] = float(kw[k])
    unknown = set(kw) - set(_CFG_KEYS)
    if unknown:
        raise ValueError(f"unknown config keys: {sorted(unknown)}")
    lib.osp_sim_set_config(vals)


def available() -> bool:
    return load() is not None


def simulate_kernel(
    in_bytes: np.ndarray,
    out_bytes: np.ndarray,
    flops: np.ndarray,
    use_mxu: bool = False,
) -> tuple[int, float]:
    """Simulate a kernel with per-task byte/flop profiles.

    Returns (cycles, compute_utilization).
    """
    lib = load()
    if lib is None:
        raise RuntimeError("native perfsim not built (make -C csrc)")
    ib = np.ascontiguousarray(in_bytes, dtype=np.int64)
    ob = np.ascontiguousarray(out_bytes, dtype=np.int64)
    fl = np.ascontiguousarray(flops, dtype=np.int64)
    n = ib.shape[0]
    util = ctypes.c_double(0.0)
    cycles = lib.osp_sim_kernel(
        n,
        ib.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ob.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        fl.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        1 if use_mxu else 0,
        ctypes.byref(util),
    )
    return int(cycles), float(util.value)


def simulate_expand_schedule(sched, clock_hz: float = 0.94e9) -> dict:
    """Predict the dense-tile expand kernel's runtime from its task table
    (the scheduler's cost model for tile-size decisions).

    Byte model (calibrated round 3): each task reads its A slice plus
    ~1/8 of an (8, 128) B group (the B-major task order re-uses the
    fetched group across the ~8 tasks sharing it) and writes the packed
    (key, value) streams at 8 B per element."""
    from outerspace_tpu.sched.planner import TILE_B

    n = sched.ntasks
    if n == 0:
        return dict(cycles=0, seconds=0.0, util=0.0)
    tile_a = getattr(sched, "tile_a", 8)
    in_bytes = np.full(n, (tile_a * 8) + TILE_B * 8, dtype=np.int64)
    out_bytes = np.full(n, tile_a * TILE_B * 8, dtype=np.int64)
    flops = np.full(n, tile_a * TILE_B, dtype=np.int64)
    cycles, util = simulate_kernel(in_bytes, out_bytes, flops)
    return dict(cycles=cycles, seconds=cycles / clock_hz, util=util)


def simulate_kernel_cached(
    in_bytes: np.ndarray,
    out_bytes: np.ndarray,
    flops: np.ndarray,
    b_blocks: np.ndarray,
    cache_slots: int = 16,
    line_bytes: int = 8 * 128 * 8,
    use_mxu: bool = False,
) -> dict:
    """Simulate a kernel whose per-task B-group goes through a timed
    blocking-miss LRU VMEM cache (the reference's timed ``Cache``,
    ``SimOuterSPACE.cpp:278-359``, re-homed: lines are (8, 128) B-groups
    resident in VMEM). ``in_bytes`` is the A-side traffic only — the
    B-side is charged by the cache on each miss.

    Returns dict(cycles, util, hits, misses).
    """
    lib = load()
    if lib is None or not hasattr(lib, "osp_sim_kernel_cached"):
        raise RuntimeError("native perfsim not built (make -C csrc)")
    ib = np.ascontiguousarray(in_bytes, dtype=np.int64)
    ob = np.ascontiguousarray(out_bytes, dtype=np.int64)
    fl = np.ascontiguousarray(flops, dtype=np.int64)
    bb = np.ascontiguousarray(b_blocks, dtype=np.int64)
    stats = (ctypes.c_double * 10)(*([0.0] * 10))
    cycles = lib.osp_sim_kernel_cached(
        ib.shape[0],
        ib.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ob.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        fl.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        bb.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        int(cache_slots),
        int(line_bytes),
        1 if use_mxu else 0,
        stats,
    )
    return dict(
        cycles=int(cycles),
        util=float(stats[0]),
        hits=int(stats[1]),
        misses=int(stats[2]),
        # crossbar arbitration fairness (per requester port:
        # in_dma / out_dma / vmem_cache) — SimOuterSPACE.cpp:361-430
        hbm_grants=(int(stats[3]), int(stats[4]), int(stats[5])),
        hbm_stalls=(int(stats[6]), int(stats[7]), int(stats[8])),
        hbm_contended=int(stats[9]),
    )


def simulate_expand_cached(
    sched, cache_slots: int = 16, clock_hz: float = 0.94e9
) -> dict:
    """Cached-pipeline prediction over a REAL task table: the per-task
    ``b_block`` stream from the scheduler (B-major order) drives the
    block cache, so the prediction reflects the actual VMEM residency
    the Pallas pipeline gets from that ordering — the event-model
    counterpart of the offline Belady/LRU residency study
    (``sched/policies.py``)."""
    from outerspace_tpu.sched.planner import TILE_B

    n = sched.ntasks
    if n == 0:
        return dict(cycles=0, seconds=0.0, util=0.0, hits=0, misses=0)
    tile_a = getattr(sched, "tile_a", 8)
    in_bytes = np.full(n, tile_a * 8, dtype=np.int64)
    out_bytes = np.full(n, tile_a * TILE_B * 8, dtype=np.int64)
    flops = np.full(n, tile_a * TILE_B, dtype=np.int64)
    b_blocks = np.asarray(sched.b_block, dtype=np.int64) // 8
    out = simulate_kernel_cached(
        in_bytes, out_bytes, flops, b_blocks, cache_slots=cache_slots
    )
    out["seconds"] = out["cycles"] / clock_hz
    return out


def simulate_merge_parts(
    pair_counts,
    out_bytes=None,
    clock_hz: float = 0.94e9,
) -> dict:
    """Cycle-stepped MERGE-phase prediction: one row-partition part per
    task, each a padded (key, value) pair stream pulled from HBM, sorted
    by the comparison-network SortUnit (stages = log2(L)^2 at the
    calibrated pair-stage rate), swept by the VPU epilogue and written
    back — the event-model counterpart of
    ``roofline.predict_merge_time``, with NO block cache in the wiring
    (the reference's merge machine dropped its L0 caches between phases,
    SimOuterSPACE.cpp:800-857).

    ``pair_counts`` is the per-part padded stream length;``out_bytes``
    defaults to the full stream (8 B/pair) as the upper bound when the
    merged nnz is unknown. Returns dict(cycles, seconds, sort_util,
    sort_busy_cycles, total_stages).
    """
    lib = load()
    if lib is None or not hasattr(lib, "osp_sim_merge"):
        raise RuntimeError("native perfsim not built (make -C csrc)")
    pc = np.ascontiguousarray(pair_counts, dtype=np.int64)
    if out_bytes is None:
        ob = pc * 8
    else:
        ob = np.ascontiguousarray(out_bytes, dtype=np.int64)
    if ob.shape != pc.shape:
        raise ValueError("out_bytes must match pair_counts in shape")
    stats = (ctypes.c_double * 3)(0.0, 0.0, 0.0)
    cycles = lib.osp_sim_merge(
        pc.shape[0],
        pc.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ob.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        stats,
    )
    return dict(
        cycles=int(cycles),
        seconds=int(cycles) / clock_hz,
        sort_util=float(stats[0]),
        sort_busy_cycles=int(stats[1]),
        total_stages=int(stats[2]),
    )


def simulate_sharded_pipeline(
    ndev: int,
    expand_cycles,
    sort_pairs,
    xfer_bytes,
    merge_pairs,
    merge_out_bytes=None,
    merge_sort_skip: bool = False,
    ici_bw_bytes: float = 4.5e10,
    clock_hz: float = 0.94e9,
) -> dict:
    """Event-model the SPMD sharded SpGEMM program (raw-arrays entry).

    ``expand_cycles``/``sort_pairs``: int64[ndev]; ``xfer_bytes``:
    int64[nchunks, ndev, ndev]; ``merge_pairs``/``merge_out_bytes``:
    int64[ndev, nchunks, merge_parts]. See ``csrc/perfsim.cpp
    simulate_sharded`` — the cycle-level counterpart of
    ``roofline.predict_spgemm_time(ndev=...)``, closing the round-3 gap
    (the reference cycle-simulated its entire parallel machine,
    ``SimOuterSPACE.cpp:721-857``; both models now exist for multi-chip
    and cross-check each other as the reference ran analytical beside
    cycle-accurate, ``:859-875``)."""
    lib = load()
    if lib is None or not hasattr(lib, "osp_sim_sharded"):
        raise RuntimeError("native perfsim not built (make -C csrc)")
    ec = np.ascontiguousarray(expand_cycles, dtype=np.int64)
    sp = np.ascontiguousarray(sort_pairs, dtype=np.int64)
    xb = np.ascontiguousarray(xfer_bytes, dtype=np.int64)
    mp = np.ascontiguousarray(merge_pairs, dtype=np.int64)
    if merge_out_bytes is None:
        mo = mp * 8
    else:
        mo = np.ascontiguousarray(merge_out_bytes, dtype=np.int64)
    if ec.shape != (ndev,):
        raise ValueError("expand_cycles must be int64[ndev]")
    if sp.shape != (ndev,):
        raise ValueError("sort_pairs must be int64[ndev]")
    if xb.ndim != 3 or xb.shape[1:] != (ndev, ndev):
        raise ValueError("xfer_bytes must be [nchunks, ndev, ndev]")
    nchunks = xb.shape[0]
    if mp.ndim != 3 or mp.shape[:2] != (ndev, nchunks):
        raise ValueError("merge_pairs must be [ndev, nchunks, parts]")
    merge_parts = mp.shape[2]
    if mo.shape != mp.shape:
        raise ValueError("merge_out_bytes must match merge_pairs in shape")
    p64 = ctypes.POINTER(ctypes.c_int64)
    stats = (ctypes.c_double * 4)(*([0.0] * 4))
    cycles = lib.osp_sim_sharded(
        int(ndev),
        ec.ctypes.data_as(p64),
        sp.ctypes.data_as(p64),
        int(nchunks),
        xb.ctypes.data_as(p64),
        int(merge_parts),
        mp.ctypes.data_as(p64),
        mo.ctypes.data_as(p64),
        float(ici_bw_bytes / clock_hz),
        1 if merge_sort_skip else 0,
        stats,
    )
    return dict(
        cycles=int(cycles),
        seconds=int(cycles) / clock_hz,
        expand_sort_cycles=int(stats[0]),
        exchange_done_cycles=int(stats[1]),
        max_link_busy=int(stats[2]),
        ici_hop_bytes=int(stats[3]),
    )


def simulate_sharded_tiled(
    plan, ici_bw_bytes: float = 4.5e10, clock_hz: float = 0.94e9
) -> dict:
    """Event-model a ``shard.tiled.ShardedTiledPlan``: per-device expand
    cycles from the commonized class task tables + gather groups (each
    device runs identical padded shapes by construction), the local
    owner-bucketing sort of the padded stream, the per-(chunk, src, dst)
    capacity buckets over the ICI ring, and ``merge_parts`` key-range
    merges per chunk (sort-skipped on kx = 1, as the real program
    does). ``ny`` columns run independent identical x-rings, so one
    ring IS the model."""
    from outerspace_tpu.sched.gplanner import GROUP_SUBS, SUB_P, SUPER_A, SUPER_B
    from outerspace_tpu.sched.planner import TILE_B as _TB

    ndev = plan.kx

    def _expand_cycles(class_T, tile_as, ngroups):
        cyc = 0
        for T, ta in zip(class_T, tile_as):
            if T:
                ib = np.full(T, ta * 8 + _TB * 8, dtype=np.int64)
                ob = np.full(T, ta * _TB * 8, dtype=np.int64)
                fl = np.full(T, ta * _TB, dtype=np.int64)
                cyc += simulate_kernel(ib, ob, fl)[0]
        if ngroups:
            g = int(ngroups)
            in_b = (
                SUPER_A * 8 * 4 * 128 + SUPER_B * 8 * 2 * 128 + 8 * 128
            ) * 4
            ib = np.full(g, in_b, dtype=np.int64)
            ob = np.full(g, GROUP_SUBS * SUB_P * 8, dtype=np.int64)
            fl = np.full(g, GROUP_SUBS * SUB_P, dtype=np.int64)
            cyc += simulate_kernel(ib, ob, fl)[0]
        return cyc

    if getattr(plan, "rebase", False):
        # Rebased plans run kx·chunks per-bucket expands and SORTS (the
        # one global-key sort is replaced by shorter per-bucket sorts);
        # charge each bucket's sort with the same formula the sharded
        # machine applies (osp_sim_sort_cycles) and fold it into the
        # front phase, leaving sort_pairs = 0.
        from outerspace_tpu.shard.tiled import _bucket_stream_len

        exp_cycles = 0
        for bk in plan.buckets:
            exp_cycles += _expand_cycles(
                bk["class_T"], bk["tile_as"], bk["ngroups"]
            )
            exp_cycles += sort_cycles(
                max(_bucket_stream_len(bk), plan.capacity)
            )
        expand = np.full(ndev, exp_cycles, dtype=np.int64)
        sort_pairs = np.zeros(ndev, dtype=np.int64)
    else:
        exp_cycles = _expand_cycles(plan.class_T, plan.tile_as, plan.ngroups)
        expand = np.full(ndev, exp_cycles, dtype=np.int64)
        sort_pairs = np.full(ndev, plan.stream_len, dtype=np.int64)
    xfer = np.full(
        (plan.chunks, ndev, ndev), int(plan.capacity) * 8, dtype=np.int64
    )
    mp = np.full(
        (ndev, plan.chunks, plan.merge_parts),
        int(plan.kx) * int(plan.mcap),
        dtype=np.int64,
    )
    out = simulate_sharded_pipeline(
        ndev, expand, sort_pairs, xfer, mp,
        merge_sort_skip=(plan.kx == 1),
        ici_bw_bytes=ici_bw_bytes, clock_hz=clock_hz,
    )
    out["expand_cycles_per_dev"] = int(exp_cycles)
    return out


def simulate_mcl_sharded_iteration(
    plan, ici_bw_bytes: float = 4.5e10, clock_hz: float = 0.94e9
) -> dict:
    """Event-model one iteration of the device-resident sharded MCL
    loop (``shard/mcl.py``): the expand→sort→exchange→merge phase runs
    through the sharded-pipeline machine (ICI ring, barriers), the
    inflate/colnorm + CSC-re-shard tail is charged closed-form (two
    sort stages + the second exchange's ring bytes + the ~13 cyc/elem
    random-gather law for the flat expand and the colsum gather).
    Roofline counterpart: ``roofline.predict_mcl_sharded_iteration``."""
    ndev = plan.kx
    gather_cyc = 13  # ~14 ns/elem at 0.94 GHz — the random-access law
    exp = np.full(ndev, int(plan.p_pad) * gather_cyc, dtype=np.int64)
    sort_pairs = np.full(ndev, int(plan.p_pad), dtype=np.int64)
    xfer = np.full((1, ndev, ndev), int(plan.cap) * 8, dtype=np.int64)
    merged = ndev * int(plan.cap)
    mp = np.full((ndev, 1, 1), merged, dtype=np.int64)
    out = simulate_sharded_pipeline(
        ndev, exp, sort_pairs, xfer, mp,
        merge_sort_skip=False,
        ici_bw_bytes=ici_bw_bytes, clock_hz=clock_hz,
    )
    ici_per_cycle = ici_bw_bytes / clock_hz
    hops = (
        sum(min(h, ndev - h) for h in range(1, ndev)) if ndev > 1 else 0
    )
    tail = (
        merged * gather_cyc  # colsum gather
        + sort_cycles(merged)  # column-major re-sort
        + sort_cycles(int(plan.na))  # A-side CSC sort
        + int(int(plan.ecap) * 8 * hops / 2.0 / ici_per_cycle)
        + (
            int(plan.m * 4 * 2 * (ndev - 1) / ndev / ici_per_cycle)
            if ndev > 1
            else 0
        )
    )
    cycles = int(out["cycles"]) + tail
    return dict(
        cycles=cycles,
        seconds=cycles / clock_hz,
        pipeline_cycles=int(out["cycles"]),
        tail_cycles=int(tail),
    )


def sort_cycles(pairs: int) -> int:
    """The sharded machine's sort-stage charge for one stream of
    ``pairs`` (comparison-network stages + 2 HBM passes + grid
    overhead) under the current config — used to fold rebased plans'
    per-bucket sorts into the front phase."""
    lib = load()
    if lib is None or not hasattr(lib, "osp_sim_sort_cycles"):
        raise RuntimeError("native perfsim not built")
    return int(lib.osp_sim_sort_cycles(int(pairs)))


def ici_selftest() -> int:
    lib = load()
    if lib is None or not hasattr(lib, "osp_sim_ici_selftest"):
        raise RuntimeError("native perfsim not built")
    return int(lib.osp_sim_ici_selftest())


def rowbuffer_selftest() -> int:
    """0 = the gather-vs-stream asymmetry emerges from the row-buffer
    mechanism: random 16 B fetches land in the measured 11-17
    cycles/element band, sequential ones ride open rows ≥2x faster,
    and large streams achieve ≥70% of the bandwidth roof."""
    lib = load()
    if lib is None or not hasattr(lib, "osp_sim_rowbuffer_selftest"):
        raise RuntimeError("native perfsim not built")
    return int(lib.osp_sim_rowbuffer_selftest())


def fifo_selftest() -> int:
    lib = load()
    if lib is None:
        raise RuntimeError("native perfsim not built")
    return int(lib.osp_sim_fifo_selftest())


def set_stats_dump(path: str | None, interval: int) -> bool:
    """Enable the reference-style periodic per-module stats dumps
    (every ``interval`` simulated cycles, appended to ``path``; None →
    stderr; interval <= 0 disables). Returns False if the native lib is
    unavailable. Parity: SimOuterSPACE.cpp:775-780 printed every module
    every 100k cycles."""
    lib = load()
    if lib is None or not hasattr(lib, "osp_sim_set_stats_dump"):
        return False
    lib.osp_sim_set_stats_dump(
        path.encode() if path else None, int(interval)
    )
    return True
