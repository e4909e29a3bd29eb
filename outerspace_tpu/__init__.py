"""outerspace_tpu — a TPU-native outer-product SpGEMM framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
anneouyang/OuterSPACE reference (a C++ cycle simulator of the OuterSPACE
accelerator, HPCA'18, fed by a PyTorch prune-and-export pipeline):

- ``formats``  — sparse containers (COO/CSR/CSC/Compact/BlockELL), Matrix
  Market I/O, synthetic generators (reference: ``simulator/common.h``,
  ``simulator/SimSpGEMM.cpp:55-242``).
- ``ops``      — the SpGEMM pipeline itself: a correct functional golden
  model, a symbolic nnz-sizing pass, and the TPU multiply/merge path
  (reference: ``simulator/SimOuterSPACE.cpp:29-144`` TaskProvider).
- ``sched``    — host-side static task planner (reference: round-robin
  ``TaskDispatcherStatic``, ``simulator/SimOuterSPACE.cpp:146-174``).
- ``shard``    — multi-chip partitioning over a ``jax.sharding.Mesh`` with
  ICI collectives (replaces the simulated 16-tile/crossbar fabric).
- ``nn``       — MLP/LeNet train → prune → finetune → export pipeline
  (reference: ``NN_models/``), inference chained through the sparse kernels.
- ``perf``     — analytical roofline + discrete-event TPU performance model
  (reference: ``simulator/SimOuterSPACE.cpp:176-238`` analytical model and
  the SimCycle/SimCache cycle-accurate machinery).
"""

__version__ = "0.1.0"

from outerspace_tpu.formats import COO, CSR, CSC, read_mtx, write_mtx  # noqa: F401
