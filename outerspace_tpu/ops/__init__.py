"""Compute ops: golden reference, symbolic sizing, TPU SpGEMM/SpMM paths."""

from outerspace_tpu.ops.reference import (  # noqa: F401
    compare_coo,
    spgemm_flops,
    spgemm_reference,
    spgemm_scipy,
    spgemm_tasks,
)
from outerspace_tpu.ops.spgemm import (  # noqa: F401
    MergedCOO,
    spgemm,
    spgemm_coo,
    spgemm_padded,
    spgemm_padded_tiled,
)
from outerspace_tpu.ops.symbolic import expansion_plan  # noqa: F401
