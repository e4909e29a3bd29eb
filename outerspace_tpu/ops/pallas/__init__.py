"""Pallas TPU kernels for the hot ops (expand, merge, SpMM)."""
