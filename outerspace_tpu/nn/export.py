"""Workload export: pruned weights + activations → .mtx SpGEMM operands.

Parity with the reference exporter (``NN_models/get_mtx_files.py``):
- zero tiny weights (|w| < 1e-2) before export (``:31-35``);
- run ONE test batch capturing input / intermediate activations / logits
  (``:19-73``);
- write every kernel as ``.mtx``; conv kernels reshaped to
  (out, in·k·k) (``:109-112``);
- conv *inputs* lowered to 2-D via im2col so every layer becomes a GEMM
  (reference used ``nn.Unfold`` k5/p2 then k5/p0, ``:117-133``); here
  im2col is ``jax.lax.conv_general_dilated_patches`` — the XLA-native
  unfold.

Layer contract (identical to the reference driver pairing,
``SimSpGEMM.cpp:852-857``): ``act_i.mtx × layer_weight.mtx`` computes
``act @ Wᵀ``.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from outerspace_tpu.formats import COO, write_mtx
from outerspace_tpu.nn.models import make_model
from outerspace_tpu.nn.prune import zero_small_weights


def im2col(x: jax.Array, kernel: int, padding: int) -> jax.Array:
    """Unfold NHWC images into (N·out_h·out_w, k·k·C) patch rows.

    Column ordering matches the conv kernel reshape below so that
    ``patches @ W_2dᵀ`` equals the convolution — the exact property the
    reference relied on (``get_mtx_files.py:117-133``).
    """
    n = x.shape[0]
    patches = jax.lax.conv_general_dilated_patches(
        x,
        filter_shape=(kernel, kernel),
        window_strides=(1, 1),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        # identity-kernel conv: HIGHEST makes the extraction bit-exact
        # (default precision quantizes the patches to bf16 on TPU/CPU,
        # which would cap NN-chain parity at ~1e-3 instead of 1e-6)
        precision=jax.lax.Precision.HIGHEST,
    )  # (N, out_h, out_w, C*k*k) with feature order (C, kh, kw)
    return patches.reshape(n * patches.shape[1] * patches.shape[2], -1)


def im2col_np(x: np.ndarray, kernel: int, padding: int) -> np.ndarray:
    """Pure-numpy :func:`im2col` with the identical (C, kh, kw) feature
    order — the CPU oracle path must not touch the device (the jnp
    version would silently run on the tunneled TPU and pollute CPU
    baseline timings with device round-trips)."""
    x = np.asarray(x)
    n, _, _, c = x.shape
    xp = np.pad(x, ((0, 0), (padding, padding), (padding, padding), (0, 0)))
    win = np.lib.stride_tricks.sliding_window_view(
        xp, (kernel, kernel), axis=(1, 2)
    )  # (n, out_h, out_w, C, kh, kw) — already (C, kh, kw) order
    oh, ow = win.shape[1], win.shape[2]
    return np.ascontiguousarray(
        win.reshape(n * oh * ow, c * kernel * kernel)
    )


def conv_kernel_to_2d(w: np.ndarray) -> np.ndarray:
    """Flax conv kernel (kh, kw, in, out) → (out, in·kh·kw) rows matching
    ``conv_general_dilated_patches``'s (C, kh, kw) feature order."""
    kh, kw, cin, cout = w.shape
    return np.transpose(np.asarray(w), (3, 2, 0, 1)).reshape(cout, cin * kh * kw)


def dense_kernel_to_2d(w: np.ndarray) -> np.ndarray:
    """Flax dense kernel (in, out) → (out, in) — torch Linear layout, so
    ``act @ Wᵀ`` semantics match the reference exports."""
    return np.asarray(w).T


def _save(path: str, arr: np.ndarray, tol: float = 0.0) -> None:
    write_mtx(path, COO.from_dense(np.asarray(arr, dtype=np.float32), tol=tol))


def export_mlp1(
    params, x_batch: np.ndarray, save_dir: str, weight_zero_tol: float = 1e-2
) -> dict[str, str]:
    """Export MLP1 weights + one batch of activations as .mtx files.

    Files (reference naming, ``get_mtx_files.py:86-95``):
      act_0 (input), act_1, act_2, logits; fc{1,2,3}_weight.
    """
    os.makedirs(save_dir, exist_ok=True)
    params = zero_small_weights(params, weight_zero_tol)
    # Infer hidden widths from the params so the wide MLP1w variant
    # (the reference's earlier 784-1000-1000-10 architecture) exports
    # through the same path.
    from outerspace_tpu.nn.models import MLP1

    dense = sorted(k for k in params.keys() if k.startswith("Dense"))
    hidden = tuple(
        int(params[k]["kernel"].shape[1]) for k in dense[:-1]
    )
    model = MLP1(hidden=hidden)
    x = jnp.asarray(x_batch).reshape(x_batch.shape[0], -1)
    logits, (a1, a2) = model.apply({"params": params}, x)
    files = {}
    layers = sorted(k for k in params.keys() if k.startswith("Dense"))
    for i, layer in enumerate(layers):
        p = os.path.join(save_dir, f"fc{i + 1}_weight.mtx")
        _save(p, dense_kernel_to_2d(params[layer]["kernel"]))
        files[f"fc{i + 1}_weight"] = p
    for name, arr in [
        ("act_0", x),
        ("act_1", a1),
        ("act_2", a2),
        ("logits", logits),
    ]:
        p = os.path.join(save_dir, f"{name}.mtx")
        _save(p, np.asarray(arr))
        files[name] = p
    return files


def export_lenet(
    params, x_batch: np.ndarray, save_dir: str, weight_zero_tol: float = 1e-2
) -> dict[str, str]:
    """Export LeNet conv (im2col-lowered) + fc layers as .mtx GEMM pairs.

    Per reference (``get_mtx_files.py:98-133``): conv1 input im2col'd with
    k5/p2, conv2 input (pool1 output) with k5/p0; conv kernels reshaped to
    (out, in·k·k); fc layers exported directly.
    """
    os.makedirs(save_dir, exist_ok=True)
    params = zero_small_weights(params, weight_zero_tol)
    model = make_model("LeNet")
    x = jnp.asarray(x_batch)
    logits, acts = model.apply({"params": params}, x)
    conv1_out, pool1, conv2_out, pool2, flat, fc1_out, fc2_out = acts

    if x.ndim == 2:
        x = x.reshape(-1, 28, 28, 1)
    elif x.ndim == 3:
        x = x[..., None]
    files = {}
    # conv layers as GEMMs: im2col(input) @ W2dᵀ
    conv_layers = sorted(k for k in params.keys() if k.startswith("Conv"))
    conv_inputs = [im2col(x, 5, 2), im2col(pool1, 5, 0)]
    for i, (layer, inp) in enumerate(zip(conv_layers, conv_inputs)):
        wp = os.path.join(save_dir, f"conv{i + 1}_weight.mtx")
        ap = os.path.join(save_dir, f"conv{i + 1}_input.mtx")
        _save(wp, conv_kernel_to_2d(params[layer]["kernel"]))
        _save(ap, np.asarray(inp))
        files[f"conv{i + 1}_weight"] = wp
        files[f"conv{i + 1}_input"] = ap
    # fc layers
    fc_layers = sorted(k for k in params.keys() if k.startswith("Dense"))
    fc_inputs = [flat, fc1_out, fc2_out]
    for i, (layer, inp) in enumerate(zip(fc_layers, fc_inputs)):
        wp = os.path.join(save_dir, f"fc{i + 1}_weight.mtx")
        ap = os.path.join(save_dir, f"fc{i + 1}_input.mtx")
        _save(wp, dense_kernel_to_2d(params[layer]["kernel"]))
        _save(ap, np.asarray(inp))
        files[f"fc{i + 1}_weight"] = wp
        files[f"fc{i + 1}_input"] = ap
    p = os.path.join(save_dir, "logits.mtx")
    _save(p, np.asarray(logits))
    files["logits"] = p
    return files
