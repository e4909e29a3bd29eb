"""Magnitude pruning + sparsity utilities.

Parity with the reference (``NN_models/sparse_util.py:5-30`` and the
``prune`` mode, ``NN_models/main.py:191-238``): per-layer global magnitude
pruning — threshold = quantile(|W|, 1 - level), weights below it zeroed —
with separate default levels for fc (0.1) and conv (0.25) kernels, and the
(nnz, numel, fraction) sparsity reporting the reference printed per layer.
Masks operate on Flax param pytrees; only ``kernel`` leaves are pruned
(the reference pruned nn.Linear/Conv2d weights, never biases).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def get_sparsity(w) -> tuple[int, int, float]:
    """(nnz, numel, nnz/numel) — reference ``get_sparsity``
    (``sparse_util.py:5-7``, post sign-flip: reports the NONZERO frac)."""
    w = np.asarray(w)
    nnz = int(np.count_nonzero(w))
    return nnz, w.size, nnz / max(w.size, 1)


def prune_threshold(w, sparsity_level: float) -> float:
    """|W| quantile such that ~``sparsity_level`` of entries survive
    (reference ``get_prune_threshold``, ``sparse_util.py:9-10``)."""
    return float(np.quantile(np.abs(np.asarray(w)), 1.0 - sparsity_level))


def _is_kernel(path: tuple) -> bool:
    return any(getattr(k, "key", None) == "kernel" for k in path)


def _is_conv_kernel(w) -> bool:
    return np.asarray(w).ndim == 4


def prune_params(
    params: Any,
    sparsity_level: float = 0.1,
    conv_sparsity_level: float | None = 0.25,
) -> Any:
    """Magnitude-prune every kernel leaf to the target nonzero fraction.

    fc kernels → ``sparsity_level``; conv kernels → ``conv_sparsity_level``
    (reference defaults: fc 0.1, conv 0.25, ``main.py:219-238``).
    """

    def prune_leaf(path, w):
        if not _is_kernel(path):
            return w
        level = (
            conv_sparsity_level
            if (_is_conv_kernel(w) and conv_sparsity_level is not None)
            else sparsity_level
        )
        thr = prune_threshold(w, level)
        return w * (jnp.abs(w) > thr)

    return jax.tree_util.tree_map_with_path(prune_leaf, params)


def nonzero_masks(params: Any) -> Any:
    """Boolean masks of surviving weights — the finetune grad mask
    (reference masks grads of zeroed weights, ``main.py:146-160``)."""

    def mask_leaf(path, w):
        if not _is_kernel(path):
            return jnp.ones_like(w, dtype=bool)
        return w != 0

    return jax.tree_util.tree_map_with_path(mask_leaf, params)


def apply_grad_mask(grads: Any, masks: Any) -> Any:
    return jax.tree_util.tree_map(
        lambda g, m: g * m.astype(g.dtype), grads, masks
    )


def sparsity_report(params: Any) -> dict[str, tuple[int, int, float]]:
    """Per-leaf (nnz, numel, fraction) — reference
    ``print_weight_sparsity`` (``sparse_util.py:24-30``)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    out = {}
    for path, w in flat:
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        out[name] = get_sparsity(w)
    return out


def zero_small_weights(params: Any, threshold: float = 1e-2) -> Any:
    """Zero |w| < threshold in kernel leaves — the exporter's cleanup pass
    (reference ``get_mtx_files.py:31-35``)."""

    def leaf(path, w):
        if not _is_kernel(path):
            return w
        return w * (jnp.abs(w) >= threshold)

    return jax.tree_util.tree_map_with_path(leaf, params)
