"""Host-side static task planner (replaces the reference's round-robin
``TaskDispatcherStatic``, ``simulator/SimOuterSPACE.cpp:146-174``)."""

from outerspace_tpu.sched.planner import (  # noqa: F401
    OuterProductSchedule,
    choose_strategy,
    plan_outer_tiles,
)
