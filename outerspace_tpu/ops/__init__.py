"""Compute ops: golden reference, symbolic sizing, TPU SpGEMM/SpMM paths."""

from outerspace_tpu.ops.reference import (  # noqa: F401
    compare_coo,
    spgemm_flops,
    spgemm_reference,
    spgemm_scipy,
    spgemm_tasks,
)
