"""Unified runtime configuration with CLI overrides.

The reference split its configuration between compile-time constants
(``OuterSPACEConfig``, ``SimOuterSPACE.cpp:17-27``), a ramulator INI file
(``HBM-config.cfg`` — including the case-mismatch landmine at
``SimOuterSPACE.cpp:691``), and argparse flags (``NN_models/main.py:
246-254``). Here it is one dataclass; the ``spgemm`` CLI exposes
``--set key=value`` overrides that thread into the scheduler
(``ops.spgemm.spgemm(config=...)``).
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass
class Config:
    # Kernel tiling
    tile_a: int = 8
    tile_b: int = 128
    spmm_tn: int = 128
    # Scheduler (waste_limit None = per-operand cost-model autotune,
    # sched/autotune.py)
    waste_limit: float | None = None
    heavy_fraction_threshold: float = 0.5
    pad_min_size: int = 256
    # Mesh
    mesh_shape: tuple = ()
    mesh_axes: tuple = ("x",)
    # Benchmark selection
    bench_workloads: tuple = ("rmat14_ef8", "rmat15_ef8", "er_100k_d1e-4")
    bench_reps: int = 5
    # Numerics
    rtol: float = 1e-6

    def override(self, assignments: list[str]) -> "Config":
        """Apply ``key=value`` strings (CLI ``--set``)."""
        out = dataclasses.replace(self)
        for a in assignments:
            key, _, value = a.partition("=")
            if not hasattr(out, key):
                raise KeyError(f"unknown config key {key!r}")
            current = getattr(out, key)
            if current is None:
                try:
                    parsed = float(value)
                except ValueError:
                    parsed = value
                setattr(out, key, parsed)
                continue
            if isinstance(current, bool):
                parsed = value.lower() in ("1", "true", "yes")
            elif isinstance(current, int):
                parsed = int(value)
            elif isinstance(current, float):
                parsed = float(value)
            elif isinstance(current, tuple):
                parsed = tuple(
                    int(v) if v.isdigit() else v
                    for v in value.split(",")
                    if v
                )
            else:
                parsed = value
            setattr(out, key, parsed)
        return out


DEFAULT = Config()
