"""Command-line drivers.

Subcommands:

- ``spgemm A.mtx B.mtx``   — the reference simulator's CLI contract
  (``./simulator A.mtx B.mtx``, ``SimSpGEMM.cpp:819-999``): transposes
  matrix 2 so the product is ``M1 · M2ᵀ``, prints the multiply FLOP count
  Σᵢ nnzc(i)·nnzr(i) and GFLOP/s — except the "machine" is a real TPU,
  and alongside the measured time it prints the analytical roofline
  prediction (the reference always printed both of its models,
  ``SimOuterSPACE.cpp:859-875``).
- ``nn --mode {train,prune,finetune,eval,pf,export}`` — the NN pipeline
  CLI (``NN_models/main.py:244-315``), including the prune→finetune
  compound mode ``pf``.
- ``graph {triangles,mcl} G.mtx`` — graph kernels via repeated A².
- ``bench`` — the benchmark suite (same as ``python bench.py``).

Usage: ``python -m outerspace_tpu.cli <subcommand> ...``
"""

from __future__ import annotations

import argparse
import os
import sys
import time

# The axon TPU plugin overrides JAX_PLATFORMS at interpreter startup; honor
# an explicit CPU request (tests, machines without the tunnel) via the
# config knob, which wins if applied before first backend use.
if os.environ.get("OUTERSPACE_FORCE_CPU") or os.environ.get(
    "JAX_PLATFORMS", ""
).strip() == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")


def cmd_spgemm(args) -> int:
    from outerspace_tpu.config import DEFAULT
    from outerspace_tpu.formats import read_mtx
    from outerspace_tpu.ops.reference import spgemm_flops
    from outerspace_tpu.ops.spgemm import spgemm
    from outerspace_tpu.ops.symbolic import expansion_plan

    cfg = DEFAULT.override(args.set or [])

    m1 = read_mtx(args.matrix1)
    m2 = read_mtx(args.matrix2)
    if not args.no_transpose:
        m2 = m2.transpose()  # reference transposes matrix 2 (:852-857)
    a_csc, b_csr = m1.to_csc(), m2.to_csr()
    if a_csc.shape[1] != b_csr.shape[0]:
        print(
            f"dimension mismatch: {a_csc.shape} @ {b_csr.shape}",
            file=sys.stderr,
        )
        return 2
    from outerspace_tpu.perf.roofline import (
        predict_merge_time,
        predict_multiply_time,
    )

    if args.mesh:
        # Sharded SPMD path (BASELINE configs[4]): 2-D (kx × ny)
        # partition of the outer-product index space over the available
        # devices, ICI all-to-all of partial products keyed by
        # output-row owner, local Pallas expand + merge per device. On
        # a 1-chip/CPU host, request virtual devices with
        # XLA_FLAGS=--xla_force_host_platform_device_count=N.
        return _cmd_spgemm_sharded(args, a_csc, b_csr)

    flops = spgemm_flops(a_csc, b_csr)
    plan = expansion_plan(a_csc, b_csr)
    p_pad = plan.padded_size()
    roof_mult = predict_multiply_time(p_pad, m1.nnz, m2.nnz)
    from outerspace_tpu.ops.spgemm import default_part_count
    from outerspace_tpu.sched.autotune import autotune

    # Resolve strategy + waste limit once up front and thread them
    # through the config, so the spgemm calls, the merge-part
    # prediction and the event-model report below all reuse one
    # cost-model evaluation.
    strat_auto, wl_auto = autotune(a_csc, b_csr)
    if cfg.waste_limit is None:
        import dataclasses as _dc

        cfg = _dc.replace(cfg, waste_limit=wl_auto)
    # the merge sort runs row-partitioned; predict with the parts of
    # the pipeline the call will actually route to (the gather
    # partitioner targets ~3.7M pairs/part; the tiled one is pow2)
    strat = strat_auto if args.strategy in (None, "auto") else args.strategy
    if strat == "gather":
        from outerspace_tpu.sched.gplanner import perf_part_count

        merge_parts = perf_part_count(plan.expansion_size)
    else:
        merge_parts = default_part_count(p_pad)
    roof_merge = predict_merge_time(p_pad, parts=merge_parts)
    # Warm-up (compile), then measure.
    c = spgemm(a_csc, b_csr, strategy=args.strategy, config=cfg)
    t0 = time.perf_counter()
    c = spgemm(a_csc, b_csr, strategy=args.strategy, config=cfg)
    elapsed = time.perf_counter() - t0
    print(f"C shape: {c.shape}, nnz: {c.nnz}")
    print(f"multiply flops: {flops}")
    # Both performance models, as the reference printed analytical AND
    # cycle-accurate per phase (SimOuterSPACE.cpp:859-875).
    print(f"analytical multiply (roofline): {roof_mult * 1e3:.3f} ms")
    print(f"analytical merge (roofline):    {roof_merge * 1e3:.3f} ms")
    try:
        from outerspace_tpu.perf.perfsim import (
            available,
            simulate_expand_cached,
        )
        from outerspace_tpu.sched.planner import plan_outer_classes

        if available():
            cp = plan_outer_classes(
                a_csc, b_csr, waste_limit=cfg.waste_limit
            )
            # Cached-pipeline event model over the real task tables: the
            # B-major ordering's VMEM residency shows up as the hit rate
            # (the reference's per-module printStats reported the same
            # miss-rate figure, SimOuterSPACE.cpp:335-337).
            cyc = hits = misses = 0
            for cl in cp.classes:
                if not cl.ntasks:
                    continue
                pred = simulate_expand_cached(cl)
                cyc += pred["seconds"]
                hits += pred["hits"]
                misses += pred["misses"]
            rate = hits / max(hits + misses, 1)
            print(
                f"event-model multiply:           {cyc * 1e3:.3f} ms "
                f"(VMEM B-group hit rate {rate:.0%})"
            )
            # Event-model merge: the same row-partition part split the
            # pipeline merges with, each part one padded pair stream
            # through the cache-less sort wiring (the reference ran
            # simulateOuterSPACEMerge beside its analytical merge,
            # SimOuterSPACE.cpp:868-871; its merge machine had no
            # caches, :800-857). Output bytes from the measured nnz.
            from outerspace_tpu.perf.perfsim import simulate_merge_parts

            base, rem = divmod(p_pad, merge_parts)
            part_lens = [
                base + (1 if i < rem else 0) for i in range(merge_parts)
            ]
            onnz = int(c.nnz)
            out_b = [8 * (onnz // merge_parts + 1)] * merge_parts
            mpred = simulate_merge_parts(part_lens, out_b)
            print(
                f"event-model merge:              "
                f"{mpred['seconds'] * 1e3:.3f} ms "
                f"(parts={merge_parts}, sort util "
                f"{mpred['sort_util']:.0%})"
            )
    except Exception:
        pass
    print(f"measured (end-to-end): {elapsed * 1e3:.3f} ms")
    print(f"GFlops: {flops / elapsed / 1e9:.4f}")
    if args.out:
        from outerspace_tpu.formats import write_mtx

        write_mtx(args.out, c)
        print(f"wrote {args.out}")
    return 0


def cmd_nn(args) -> int:
    import jax

    from outerspace_tpu.nn.data import (
        find_mnist_dir,
        load_mnist,
        synthetic_mnist,
    )
    from outerspace_tpu.nn.models import make_model
    from outerspace_tpu.nn.prune import prune_params, sparsity_report
    from outerspace_tpu.nn.train import (
        TrainConfig,
        evaluate,
        finetune,
        load_params,
        save_params,
        save_training_stats,
        train,
    )

    data = (
        load_mnist()
        if (args.data == "mnist" and find_mnist_dir())
        else synthetic_mnist(n=4096)
    )
    cfg = TrainConfig(
        model_type=args.model_type,
        num_epochs=args.num_epochs,
        batch_size=args.batch_size,
        lr=args.lr,
        lr_schedule=args.lr_schedule,
        augment=args.augment,
        l2reg=args.l2reg,
    )
    params = load_params(args.load_model_name) if args.load_model_name else None

    def report_eval(p, tag):
        model = make_model(args.model_type)
        loss, acc = evaluate(p, model.apply, *data["test"], cfg.batch_size)
        print(f"{tag}: test_loss={loss:.4f} test_acc={acc:.4f}")

    if args.mode == "train":
        res = train(data, cfg, init_params=params)
        report_eval(res.best_params, "trained")
        if args.saved_model_name:
            save_params(args.saved_model_name, res.best_params)
            save_training_stats(args.saved_model_name + ".stats", res.history)
            from outerspace_tpu.nn.train import plot_training_stats

            for p in plot_training_stats(args.saved_model_name, res.history):
                print(f"  wrote {p}")
    elif args.mode == "eval":
        assert params is not None, "--load_model_name required"
        report_eval(params, "eval")
    elif args.mode == "prune":
        assert params is not None, "--load_model_name required"
        pruned = prune_params(params, args.sparsity_level)
        for name, (nnz, numel, frac) in sparsity_report(pruned).items():
            print(f"  {name}: nnz={nnz}/{numel} ({frac:.4f})")
        report_eval(pruned, "pruned")
        if args.saved_model_name:
            save_params(args.saved_model_name, pruned)
    elif args.mode == "finetune":
        assert params is not None, "--load_model_name required"
        res = finetune(data, cfg, params)
        report_eval(res.best_params, "finetuned")
        if args.saved_model_name:
            save_params(args.saved_model_name, res.best_params)
    elif args.mode == "pf":
        # prune → finetune with evals in between (main.py:299-309).
        res = train(data, cfg, init_params=params)
        report_eval(res.best_params, "trained")
        pruned = prune_params(res.best_params, args.sparsity_level)
        report_eval(pruned, "pruned")
        ft = finetune(data, cfg, pruned)
        report_eval(ft.best_params, "finetuned")
        if args.saved_model_name:
            save_params(args.saved_model_name, ft.best_params)
    elif args.mode == "export":
        assert params is not None, "--load_model_name required"
        from outerspace_tpu.nn.export import export_lenet, export_mlp1

        x = data["test"][0][: args.batch_size]
        exporter = (
            export_lenet if args.model_type == "LeNet" else export_mlp1
        )
        files = exporter(params, x, args.save_dir)
        for k, v in files.items():
            print(f"  {k}: {v}")
    else:
        print(f"unknown mode {args.mode}", file=sys.stderr)
        return 2
    return 0


def _parse_mesh(mesh_arg, ndev: int) -> tuple[int, int] | None:
    """Validate a ``KX[,NY]`` mesh flag against the device count;
    prints the friendly diagnostic and returns None on any problem
    (shared by ``spgemm --mesh`` and ``graph triangles --mesh`` so the
    two cannot drift — e.g. the natural '2x2' typo must take the
    exit-2 path everywhere, not an uncaught traceback)."""
    try:
        dims = [int(x) for x in str(mesh_arg).split(",")]
    except ValueError:
        dims = []
    if not 1 <= len(dims) <= 2 or any(d < 1 for d in dims):
        print(
            f"bad --mesh {mesh_arg!r}: expected KX or KX,NY "
            "(positive integers, e.g. --mesh 4,2)",
            file=sys.stderr,
        )
        return None
    kx = dims[0]
    ny = dims[1] if len(dims) > 1 else 1
    if kx * ny != ndev:
        print(
            f"mesh {kx}x{ny} != {ndev} devices (set "
            "XLA_FLAGS=--xla_force_host_platform_device_count=N for a "
            "virtual mesh)",
            file=sys.stderr,
        )
        return None
    return kx, ny


def _cmd_spgemm_sharded(args, a_csc, b_csr) -> int:
    """``spgemm --mesh KX[,NY]``: the multi-chip pipeline end to end —
    plan, run under shard_map over a (kx × ny) device mesh, assemble,
    and report. The multiply→merge exchange (the machine's whole point
    in the reference, ``SimOuterSPACE.cpp:721-857``) rides
    ``lax.all_to_all`` with exact host-planned receive capacities."""
    import jax

    from outerspace_tpu.ops.reference import spgemm_flops
    from outerspace_tpu.shard.mesh import make_mesh
    from outerspace_tpu.shard.tiled import (
        shard_plan_tiled,
        sharded_tiled_to_csr,
        spgemm_sharded_tiled,
    )

    parsed = _parse_mesh(args.mesh, len(jax.devices()))
    if parsed is None:
        return 2
    kx, ny = parsed
    ndev = kx * ny
    flops = spgemm_flops(a_csc, b_csr)
    t0 = time.perf_counter()
    plan = shard_plan_tiled(
        a_csc, b_csr, kx=kx, ny=ny,
        exchange_chunks=max(int(args.chunks or 1), 1),
        merge_parts=args.merge_parts,
    )
    t_plan = time.perf_counter() - t0
    mesh = make_mesh((kx, ny), ("x", "y"))
    out = spgemm_sharded_tiled(plan, mesh)  # compile + warm
    t0 = time.perf_counter()
    out = spgemm_sharded_tiled(plan, mesh)
    elapsed = time.perf_counter() - t0
    c = sharded_tiled_to_csr(plan, out)
    print(f"C shape: {c.shape}, nnz: {c.nnz}")
    print(f"multiply flops: {flops}")
    print(f"mesh: {kx}x{ny} over {ndev} devices; plan {t_plan:.2f}s")
    # Dual-model report for the SHARDED machine (the reference always
    # printed analytical beside cycle-accurate, SimOuterSPACE.cpp:859-
    # 875): the plan-aware roofline and the C++ event model (ICI ring +
    # barrier + per-device merge engines) charge the same plan streams
    # with independent machinery; the measured (1,1) hardware record
    # sits between them (roofline 6.3 / measured 9.0 / event 13.0 ms on
    # rmat13).
    from outerspace_tpu.perf.roofline import predict_sharded_tiled

    print(
        f"analytical sharded (roofline):  "
        f"{predict_sharded_tiled(plan) * 1e3:.3f} ms"
    )
    try:
        from outerspace_tpu.perf.perfsim import (
            available,
            simulate_sharded_tiled,
        )

        if available():
            ev = simulate_sharded_tiled(plan)
            exch = ev["exchange_done_cycles"] - ev["expand_sort_cycles"]
            print(
                f"event-model sharded:            "
                f"{ev['seconds'] * 1e3:.3f} ms "
                f"(front {ev['expand_sort_cycles']} cyc, "
                f"exchange {max(exch, 0)} cyc, "
                f"max link busy {ev['max_link_busy']} cyc)"
            )
    except Exception as e:  # model failure must not kill the run
        print(f"event-model sharded:            unavailable ({e})")
    print(
        f"measured (sharded, warm): {elapsed * 1e3:.3f} ms "
        f"({flops / max(elapsed, 1e-12) / 1e9:.3f} GFLOP/s)"
    )
    if args.out:
        from outerspace_tpu.formats import write_mtx

        write_mtx(args.out, c.to_coo())
        print(f"wrote {args.out}")
    return 0


def cmd_graph(args) -> int:
    from outerspace_tpu.formats import read_mtx
    from outerspace_tpu.ops.graph import markov_cluster, mcl_clusters, triangle_count

    g = read_mtx(args.matrix)
    mesh = None
    if getattr(args, "mesh", None):
        # mesh-composed kernels: the sharded SPMD program per squaring
        import jax

        from outerspace_tpu.shard.mesh import make_mesh

        # --mesh selects the sharded SPMD path, which cannot honor a
        # backend/strategy override — error rather than silently run
        # the device path under a '--backend scipy' the user asked for
        if args.backend != "tpu" or args.strategy != "auto":
            print(
                "error: --mesh runs the sharded device path; it cannot "
                "be combined with --backend/--strategy overrides",
                file=sys.stderr,
            )
            return 2
        parsed = _parse_mesh(args.mesh, len(jax.devices()))
        if parsed is None:
            return 2
        kx, ny = parsed
        mesh = make_mesh((kx, ny), ("x", "y"))
    if args.kernel == "triangles":
        if mesh is not None:
            from outerspace_tpu.ops.graph import triangle_count_sharded

            t0 = time.perf_counter()
            n = triangle_count_sharded(
                g, mesh, axes=("x", "y"), kx=kx, ny=ny
            )
            dt = time.perf_counter() - t0
            print(f"triangles (mesh {kx}x{ny}): {n} ({dt * 1e3:.1f} ms)")
            return 0
        t0 = time.perf_counter()
        n = triangle_count(g, backend=args.backend, strategy=args.strategy)
        dt = time.perf_counter() - t0
        print(f"triangles: {n} ({dt * 1e3:.1f} ms)")
    elif mesh is not None:
        t0 = time.perf_counter()
        if args.loop == "device":
            # whole loop device-resident (shard/mcl.py): one sizing
            # pass before, one fetch after, zero host planning between
            # iterations (exact fallback on budget overflow)
            from outerspace_tpu.shard.mcl import (
                markov_cluster_sharded_device,
            )

            flow = markov_cluster_sharded_device(
                g, mesh, axes=("x", "y"), kx=kx, ny=ny, iters=args.iters
            )
        else:
            from outerspace_tpu.ops.graph import markov_cluster_sharded

            flow = markov_cluster_sharded(
                g, mesh, axes=("x", "y"), kx=kx, ny=ny, iters=args.iters
            )
        clusters = mcl_clusters(flow)
        dt = time.perf_counter() - t0
        print(
            f"mcl (mesh {kx}x{ny}, {args.loop} loop): "
            f"{len(clusters)} clusters ({dt * 1e3:.1f} ms)"
        )
    else:
        report: dict = {}
        t0 = time.perf_counter()
        flow = markov_cluster(
            g, iters=args.iters, backend=args.backend, report=report
        )
        clusters = mcl_clusters(flow)
        dt = time.perf_counter() - t0
        # the reference always printed its analytical model next to the
        # cycle model (SimOuterSPACE.cpp:859-875); mirror that for the
        # fused-chain kernel when the staged budgets are known
        if report.get("p_pad"):
            from outerspace_tpu.perf.roofline import predict_mcl_time

            pred = predict_mcl_time(
                report["p_pad"],
                report.get("p_pads")
                or (report["p_pad"],) * max(report["iters"] - 1, 0),
                report.get("elem_pad") or report["nnz_pad"],
            )
            print(f"analytical model: {pred * 1e3:.1f} ms")
        elif report.get("fast_path") is False:
            # sizing-budget violation: the measured time came from the
            # exact stepwise chain, which the fused-chain model does
            # not describe — no prediction rather than a wrong one
            print("analytical model: n/a (stepwise fallback ran)")
        print(f"mcl: {len(clusters)} clusters ({dt * 1e3:.1f} ms)")
    return 0


def cmd_predict(args) -> int:
    """``predict A.mtx B.mtx --mesh KX[,NY]``: dual-model runtime
    prediction for C = M1·M2ᵀ over a device mesh with NO device work —
    the plan-aware roofline (``roofline.predict_sharded_tiled``) and
    the C++ event model (``perfsim.simulate_sharded_tiled``) over the
    real sharded plan, the capacity-planning face of ``docs/
    SCALING.md``. The measured (1,1) hardware record sits between the
    two models (roofline 6.3 / measured 9.0 / event 13.0 ms on the
    rmat13 A² record), so read them as a bracket. Any mesh size may be
    modeled — no devices are required."""
    from outerspace_tpu.formats import read_mtx
    from outerspace_tpu.ops.reference import spgemm_flops
    from outerspace_tpu.perf.roofline import predict_sharded_tiled
    from outerspace_tpu.shard.tiled import shard_plan_tiled

    m1 = read_mtx(args.matrix1)
    m2 = read_mtx(args.matrix2)
    if not args.no_transpose:
        m2 = m2.transpose()  # reference transposes matrix 2 (:852-857)
    a_csc, b_csr = m1.to_csc(), m2.to_csr()
    if a_csc.shape[1] != b_csr.shape[0]:
        print(
            f"dimension mismatch: {a_csc.shape} @ {b_csr.shape}",
            file=sys.stderr,
        )
        return 2
    try:
        dims = [int(x) for x in str(args.mesh).split(",")]
    except ValueError:
        dims = []
    if not 1 <= len(dims) <= 2 or any(d < 1 for d in dims):
        print(f"bad --mesh {args.mesh!r}: expected KX or KX,NY",
              file=sys.stderr)
        return 2
    kx = dims[0]
    ny = dims[1] if len(dims) > 1 else 1
    plan = shard_plan_tiled(a_csc, b_csr, kx=kx, ny=ny)
    print(f"multiply flops: {spgemm_flops(a_csc, b_csr)}")
    mode = "rebased per-bucket keys" if plan.rebase else "global keys"
    print(f"mesh {kx}x{ny} ({mode}): per-device stream "
          f"{plan.stream_len}, "
          f"exchange capacity {plan.capacity} x{plan.chunks} chunk(s), "
          f"merge {plan.merge_parts} part(s) x {plan.kx * plan.mcap}")
    print(
        f"analytical sharded (roofline):  "
        f"{predict_sharded_tiled(plan) * 1e3:.3f} ms"
    )
    try:
        from outerspace_tpu.perf.perfsim import (
            available,
            simulate_sharded_tiled,
        )

        if available():
            ev = simulate_sharded_tiled(plan)
            print(
                f"event-model sharded:            "
                f"{ev['seconds'] * 1e3:.3f} ms "
                f"(front {ev['expand_sort_cycles']} cyc, "
                f"max link busy {ev['max_link_busy']} cyc)"
            )
        else:
            print("event-model sharded:            unavailable "
                  "(build csrc)")
    except Exception as e:  # model failure must not kill the report
        print(f"event-model sharded:            unavailable ({e})")
    return 0


def cmd_bench(args) -> int:
    # bench.py lives at the repo root, one level above the package.
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if repo_root not in sys.path:
        sys.path.insert(0, repo_root)
    import bench

    bench.main()
    return 0


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="outerspace_tpu")
    sub = parser.add_subparsers(dest="command", required=True)

    p = sub.add_parser("spgemm", help="C = M1 · M2ᵀ from .mtx operands")
    p.add_argument("matrix1")
    p.add_argument("matrix2")
    p.add_argument("--strategy", default="auto",
                   choices=["auto", "flat", "tiles", "gather"])
    p.add_argument("--no-transpose", action="store_true",
                   help="compute M1 · M2 instead of M1 · M2ᵀ")
    p.add_argument("--out", default=None, help="write result .mtx here")
    p.add_argument("--mesh", default=None, metavar="KX[,NY]",
                   help="run the sharded SPMD pipeline over a KXxNY "
                        "device mesh (kx*ny must equal the device count)")
    p.add_argument("--chunks", type=int, default=1,
                   help="sharded exchange chunks (>1 overlaps all_to_all "
                        "with merge compute on multi-chip meshes)")
    p.add_argument("--merge-parts", type=int, default=None,
                   dest="merge_parts",
                   help="key-range parts per sharded chunk merge "
                        "(default: auto, ~2M pairs/part; 1 on a "
                        "1-device k-axis where the merge skips its sort)")
    p.add_argument("--set", action="append", metavar="KEY=VALUE",
                   help="override a Config field (e.g. --set waste_limit=3.0)")
    p.set_defaults(fn=cmd_spgemm)

    p = sub.add_parser("nn", help="NN pipeline (train/prune/finetune/eval/pf)")
    p.add_argument("--mode", required=True,
                   choices=["train", "prune", "finetune", "eval", "pf", "export"])
    p.add_argument("--model_type", default="MLP1",
                   choices=["MLP1", "MLP1w", "LeNet"])
    p.add_argument("--num_epochs", type=int, default=5)
    p.add_argument("--batch_size", type=int, default=512)
    p.add_argument("--sparsity_level", type=float, default=0.1)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--lr_schedule", default="const",
                   choices=["const", "cosine"])
    p.add_argument("--augment", action="store_true",
                   help="random +-2px shift augmentation (small-split aid)")
    p.add_argument("--l2reg", action="store_true")
    p.add_argument("--load_model_name", default=None)
    p.add_argument("--saved_model_name", default=None)
    p.add_argument("--save_dir", default="mtx_out")
    p.add_argument("--data", default="mnist", choices=["mnist", "synthetic"])
    p.set_defaults(fn=cmd_nn)

    p = sub.add_parser("graph", help="graph kernels via repeated A²")
    p.add_argument("kernel", choices=["triangles", "mcl"])
    p.add_argument("matrix")
    p.add_argument("--backend", default="tpu", choices=["tpu", "scipy"])
    p.add_argument(
        "--strategy",
        default="auto",
        choices=["auto", "dense", "sparse"],
        help="triangles only: dense-MXU vs sparse-pipeline A² "
        "(auto = cost model)",
    )
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--mesh", default=None, metavar="KX[,NY]",
                   help="run the mesh-composed sharded kernel over a "
                        "(kx × ny) device mesh (triangles and mcl)")
    p.add_argument(
        "--loop",
        default="host",
        choices=["host", "device"],
        help="mcl --mesh only: 'device' keeps the WHOLE loop resident "
        "on the mesh (shard/mcl.py — no host planning between "
        "iterations); 'host' re-plans each squaring",
    )
    p.set_defaults(fn=cmd_graph)

    p = sub.add_parser(
        "predict",
        help="dual-model A·Bᵀ runtime prediction (no device needed)",
    )
    p.add_argument("matrix1")
    p.add_argument("matrix2")
    p.add_argument("--no-transpose", action="store_true",
                   help="predict M1·M2 instead of the default M1·M2ᵀ")
    p.add_argument("--mesh", default="1", metavar="KX[,NY]",
                   help="mesh sizes to model, e.g. 4 or 4,2 (repeatable "
                        "via comma-free list: --mesh 1 --mesh 4 not "
                        "supported; pass one)")
    p.set_defaults(fn=cmd_predict)

    p = sub.add_parser("bench", help="benchmark suite (one JSON line)")
    p.set_defaults(fn=cmd_bench)

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
