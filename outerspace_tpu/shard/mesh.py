"""Mesh helpers: device meshes for the sharded kernels and NN training."""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh


def make_mesh(
    shape: tuple[int, ...] | None = None,
    axis_names: tuple[str, ...] = ("x",),
    devices=None,
) -> Mesh:
    """Build a Mesh over available devices.

    Default: 1-D over all devices. For NN training use e.g.
    ``make_mesh((dp, tp), ("dp", "tp"))``.
    """
    devices = devices if devices is not None else jax.devices()
    if shape is None:
        shape = (len(devices),)
    if int(np.prod(shape)) != len(devices):
        raise ValueError(
            f"mesh shape {shape} != device count {len(devices)}"
        )
    arr = np.array(devices).reshape(shape)
    return Mesh(arr, axis_names)


def balanced_contiguous_partition(
    weights: np.ndarray, parts: int
) -> np.ndarray:
    """Boundaries of a contiguous partition of ``weights`` into ``parts``
    with approximately equal weight — the scheduler's answer to the
    reference's round-robin dispatch (``SimOuterSPACE.cpp:153-174``),
    which simply ate the nnz² imbalance.

    Returns int64[parts + 1] boundaries over ``len(weights)`` items.
    """
    n = len(weights)
    total = float(weights.sum())
    cum = np.concatenate([[0.0], np.cumsum(weights, dtype=np.float64)])
    targets = np.linspace(0, total, parts + 1)
    bounds = np.searchsorted(cum, targets[1:-1], side="left")
    bounds = np.concatenate([[0], bounds, [n]]).astype(np.int64)
    return np.maximum.accumulate(bounds)  # monotone even for zero-weight
