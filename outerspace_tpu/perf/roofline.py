"""Analytical TPU roofline for the SpGEMM pipeline.

Parity with the reference's analytical model (``SimOuterSPACE.cpp:
176-238``), re-derived for a real TPU:

- reference: per-task cycles = max(compute, DRAM-bytes · PEs / BW)
  (``analyzeCycles``, ``:198-202``), phase total = max over PEs of its
  round-robin share (``:204-232``).
- here: per-phase seconds = max(FLOP time on the VPU/MXU, bytes / HBM BW),
  with byte counts from the *actual* padded buffer sizes the kernels move,
  and a multi-chip mode that takes the max over the FLOP-balanced k-slices
  plus the ICI all-to-all volume (replacing crossbar/DRAM contention).

The model is deliberately closed-form: the C++ discrete-event simulator
(``csrc/perfsim.cpp``) covers the queueing effects this ignores. Both
exist to sanity-check measured kernel times — the same cross-checking-by-
redundancy role the two models played in the reference (it always printed
both, ``SimOuterSPACE.cpp:859-875``).
"""

from __future__ import annotations

import dataclasses
import math


@dataclasses.dataclass(frozen=True)
class TPUConfig:
    """Hardware constants (defaults: one TPU v5e chip).

    Plays the role of the reference's compile-time ``OuterSPACEConfig``
    (``SimOuterSPACE.cpp:17-27``), but as a runtime dataclass.
    """

    hbm_bw_bytes: float = 819e9  # HBM bandwidth, bytes/s
    vpu_flops: float = 2.45e12 / 2  # f32 VPU ops/s (8x128 lanes @ 940MHz x 8 ALUs / 2)
    mxu_flops_f32: float = 4.9e13  # f32-precision MXU FLOP/s (3-pass)
    mxu_flops_bf16: float = 1.97e14  # bf16 MXU FLOP/s
    ici_bw_bytes: float = 4.5e10  # per-link ICI bandwidth, bytes/s
    vmem_bytes: int = 128 * 1024 * 1024 // 8  # 16 MB
    clock_hz: float = 0.94e9

    def time(self, flops: float, bytes_moved: float, unit: str = "vpu") -> float:
        rate = {
            "vpu": self.vpu_flops,
            "mxu": self.mxu_flops_f32,
            "mxu_bf16": self.mxu_flops_bf16,
        }[unit]
        return max(flops / rate, bytes_moved / self.hbm_bw_bytes)


# Bytes per partial product in the expanded stream: row + col + val (int32,
# int32, f32).
STREAM_BYTES = 12


def predict_multiply_time(
    padded_products: int,
    nnz_a: int,
    nnz_b: int,
    cfg: TPUConfig = TPUConfig(),
) -> float:
    """Expand-phase roofline: reads A and B flat arrays once (plus block
    re-reads, ignored), writes the full partial-product stream.

    Reference analogue: ``analyzeMultiplyTask`` counted result + colA +
    rowB bytes, 64B-aligned (``SimOuterSPACE.cpp:176-181``).
    """
    bytes_moved = (
        padded_products * STREAM_BYTES  # stream write
        + nnz_a * 8
        + nnz_b * 8  # operand reads
    )
    flops = padded_products  # one multiply per product
    return cfg.time(flops, bytes_moved, "vpu")


def predict_merge_time(
    padded_products: int,
    cfg: TPUConfig = TPUConfig(),
    sort_impl: str = "xla_bitonic",
    parts: int = 1,
) -> float:
    """Merge-phase roofline.

    The reference's merge model was quadratic in merge ways
    (``analyzeMergeTask``, ``SimOuterSPACE.cpp:183-196``) because its PEs
    re-scanned inputs per way; a sort-based merge is O(P log² P) bitonic
    (XLA) or O(P · passes) radix (the planned Pallas kernel).

    ``parts``: the row-partitioned pipeline sorts ``parts`` independent
    streams of P/parts — the bitonic stage count drops with the shorter
    length (the measured log factor: 2.07 ns/pair @ 32M vs ~1.7 @ 16M),
    so the prediction is ``parts ×`` the per-part time.
    """
    if parts > 1:
        per = -(-padded_products // parts)
        return parts * predict_merge_time(per, cfg, sort_impl)
    n = max(padded_products, 2)
    if sort_impl == "xla_bitonic":
        stages = (math.ceil(math.log2(n)) ** 2 + math.ceil(math.log2(n))) // 2
        # Each stage streams the (key, val) pairs once; XLA keeps ~8
        # stages in VMEM per HBM round trip (empirical fudge).
        hbm_passes = max(stages / 8.0, 1.0)
    elif sort_impl == "radix8":
        hbm_passes = 8.0
    else:
        raise ValueError(sort_impl)
    sort_bytes = n * 8 * 2 * hbm_passes
    # Segmented scan: log2(n) shift passes over (val, flag).
    scan_bytes = n * 5 * 2 * math.ceil(math.log2(n))
    flops = n * math.ceil(math.log2(n))
    return cfg.time(flops, sort_bytes + scan_bytes, "vpu")


def predict_sort_time(
    n_pairs: int, cfg: TPUConfig = TPUConfig()
) -> float:
    """Sort-only roofline (the merge model minus its scan epilogue):
    the sharded pipeline's LOCAL owner-bucketing sort before the
    exchange (``shard/tiled.py``), which kx ≥ 2 meshes pay on top of
    the post-exchange merge."""
    n = max(n_pairs, 2)
    stages = (math.ceil(math.log2(n)) ** 2 + math.ceil(math.log2(n))) // 2
    hbm_passes = max(stages / 8.0, 1.0)
    return cfg.time(
        n * math.ceil(math.log2(n)), n * 8 * 2 * hbm_passes, "vpu"
    )


def predict_spgemm_time(
    padded_products: int,
    nnz_a: int,
    nnz_b: int,
    cfg: TPUConfig = TPUConfig(),
    ndev: int = 1,
    per_device_products: list[int] | None = None,
) -> float:
    """Whole-pipeline roofline; multi-chip takes the max over k-slices
    plus the all-to-all stream crossing ICI once (the reference took max
    over PEs of their round-robin share, ``SimOuterSPACE.cpp:204-232``)."""
    if ndev == 1:
        return predict_multiply_time(
            padded_products, nnz_a, nnz_b, cfg
        ) + predict_merge_time(padded_products, cfg)
    per_dev = per_device_products or [padded_products // ndev] * ndev
    worst = max(per_dev)
    t = predict_multiply_time(worst, nnz_a // ndev + 1, nnz_b, cfg)
    # Local owner-bucketing sort before the exchange (the kx ≥ 2
    # sharded pipeline sorts twice: send-side bucketing + post-exchange
    # merge; a 1-device k-axis skips the merge sort instead).
    t += predict_sort_time(worst, cfg)
    t += worst * STREAM_BYTES / cfg.ici_bw_bytes  # all-to-all exchange
    t += predict_merge_time(worst, cfg)
    return t


def predict_sharded_tiled(plan, cfg: TPUConfig = TPUConfig()) -> float:
    """Plan-aware multi-chip roofline for a
    ``shard.tiled.ShardedTiledPlan``: charges the REAL per-device stream
    sizes — the commonized padded expand stream, the capacity-padded
    exchange buckets, the mcap-padded merge parts — i.e. the same work
    the device program executes and the C++ event model
    (``perfsim.simulate_sharded_tiled``) clocks, so the two multi-chip
    models cross-check each other on identical workload numbers with
    independent timing machinery (the reference ran its analytical model
    beside the cycle-accurate one the same way,
    ``SimOuterSPACE.cpp:859-875``). The generic
    :func:`predict_spgemm_time` ``ndev`` path stays as the plan-free
    estimate; this one is what the CLI prints for ``--mesh`` runs."""
    kx = plan.kx
    # expand + local owner-bucketing sort of the padded stream; REBASED
    # plans (m·n ≥ 2³²) sort per (owner, chunk) bucket instead of once
    # globally — charge each bucket's shorter sort (the log-factor win
    # the row-partition measurements established)
    t = predict_multiply_time(plan.stream_len, 0, 0, cfg)
    if getattr(plan, "rebase", False):
        from outerspace_tpu.shard.tiled import _bucket_stream_len

        for bk in plan.buckets:
            t += predict_sort_time(
                max(_bucket_stream_len(bk), plan.capacity), cfg
            )
    else:
        t += predict_sort_time(plan.stream_len, cfg)
    if kx > 1:
        # ring all_to_all of the per-(src, dst) capacity buckets:
        # shortest-path hop-bytes spread over the 2·kx directional links
        hops = sum(min(h, kx - h) for h in range(1, kx))  # per source
        link_bytes = plan.chunks * plan.capacity * 8 * hops / 2.0
        t += link_bytes / cfg.ici_bw_bytes
    # post-exchange merges: chunks × merge_parts streams of kx·mcap
    per = max(kx * plan.mcap, 2)
    n_streams = plan.chunks * plan.merge_parts
    if kx == 1:
        # sort-skip (the stream arrives sorted): epilogue-only passes
        lg = math.ceil(math.log2(per))
        t += n_streams * cfg.time(per * lg, per * 5 * 2 * lg, "vpu")
    else:
        t += n_streams * predict_merge_time(per, cfg)
    return t


def predict_mcl_sharded_iteration(plan, cfg: TPUConfig = TPUConfig()) -> float:
    """Per-iteration roofline of the device-resident sharded MCL loop
    (``shard/mcl.py``): flat pair-gather expand (the measured ~14 ns/elem
    random-access law), local owner-bucketing sort, exchange over the
    ICI ring, biased-key merge, inflate/colnorm passes (dense column-sum
    + psum + one random gather per element), and the CSC re-shard (two
    sorts + the second all_to_all). The event-model counterpart is
    ``perf.perfsim.simulate_mcl_sharded_iteration``; both exist so the
    loop's measured per-iteration time has the same dual-model
    cross-check as every other pipeline (the reference printed
    analytical beside cycle-accurate, ``SimOuterSPACE.cpp:859-875``)."""
    GATHER_NS = 14e-9
    kx = plan.kx
    merged = kx * plan.cap
    hops = sum(min(h, kx - h) for h in range(1, kx)) if kx > 1 else 0
    t = plan.p_pad * GATHER_NS  # flat expand: one pair gather/product
    t += predict_sort_time(plan.p_pad, cfg)  # owner-bucketing sort
    if kx > 1:
        t += plan.cap * 8 * hops / 2.0 / cfg.ici_bw_bytes
    t += predict_merge_time(merged, cfg)
    # inflate/prune/colnorm: ~4 elementwise passes + the dense column
    # sum (scatter + psum ring) + one colsum gather per element
    t += cfg.time(merged * 4, merged * 5 * 4, "vpu")
    t += merged * GATHER_NS
    if kx > 1:
        t += plan.m * 4 * 2 * (kx - 1) / kx / cfg.ici_bw_bytes
    # CSC re-shard: column-major re-sort, exchange, A-side sort
    t += predict_sort_time(merged, cfg)
    if kx > 1:
        t += plan.ecap * 8 * hops / 2.0 / cfg.ici_bw_bytes
    t += predict_sort_time(plan.na, cfg)
    return t


def predict_mcl_time(
    p_stage1: int,
    p_pads: list[int] | tuple[int, ...],
    elem_pad: int,
    nnz_stage1_stream: int | None = None,
    cfg: TPUConfig = TPUConfig(),
    stage1_parts: int = 1,
) -> float:
    """Analytical model of the fused MCL chain (``ops/chain.py``):
    stage-1 squaring (the full A² roofline over its padded stream) + the
    stage-1 masked compaction (one batched in-block sort pass over the
    merged stream) + per-iteration loop costs from the measured
    sort-band structure — the combined expansion sort at
    ``p_pad + elem_pad``, the merge sort, the epilogue/compaction
    passes, and the two-sort rank pass (all sort-shaped; see the
    random-access law in ``ops/chain.py:mcl_whole_traced``).

    Closed-form cross-check only — printed by the graph CLI next to the
    measured time, the reference's always-print-both-models contract
    (``SimOuterSPACE.cpp:859-875``)."""
    L1 = nnz_stage1_stream or p_stage1
    if stage1_parts > 1:
        t = predict_multiply_time(p_stage1, elem_pad, elem_pad, cfg)
        t += predict_merge_time(p_stage1, cfg, parts=stage1_parts)
    else:
        t = predict_spgemm_time(p_stage1, elem_pad, elem_pad, cfg)
    # stage-1 compaction: one blk-deep batched sort pass over the merged
    # stream (log²(8192) stages, VMEM-resident) + the short combine sort
    t += cfg.time(L1 * 13, L1 * 8 * 2 * 2.0, "vpu")
    for pp in p_pads:
        lc = pp + elem_pad
        # combined expansion sort (3 streams) + merge sort (2 streams)
        t += predict_merge_time(lc, cfg) * 1.5 + predict_merge_time(lc, cfg)
        # compaction block pass + rank pass + elem-scale tails
        t += cfg.time(lc * 13, lc * 8 * 2 * 2.0, "vpu")
        t += cfg.time(elem_pad * 20, elem_pad * 8 * 2 * 4.0, "vpu")
    return t


def achieved_fraction(measured_s: float, predicted_s: float) -> float:
    """Roofline attainment: predicted / measured (1.0 = at the roof)."""
    return predicted_s / max(measured_s, 1e-12)
