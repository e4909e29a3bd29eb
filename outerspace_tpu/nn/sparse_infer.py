"""Sparse inference: the pruned-NN forward pass through the SpGEMM/SpMM
TPU kernels.

This is the end-to-end bridge the reference only modeled: instead of
exporting .mtx files into a cycle simulator, the pruned layers execute on
real hardware —

- ``spgemm`` path: both activation and weight as sparse operands,
  ``act @ Wᵀ`` per layer through the outer-product pipeline (what
  ``./simulator act_i.mtx fcN_weight.mtx`` simulated,
  ``SimSpGEMM.cpp:852-857``);
- ``spmm`` path: block-ELL weights × dense activations on the MXU
  (the production-shaped kernel for structured NN sparsity).

Both paths must match the dense forward at 1e-6 relative tolerance
(the reference's eps, ``SimSpGEMM.cpp:283``).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from outerspace_tpu.formats import COO, BlockELL
from outerspace_tpu.nn.export import dense_kernel_to_2d
from outerspace_tpu.ops.reference import spgemm_scipy
from outerspace_tpu.ops.spgemm import spgemm


def _relu(x: np.ndarray) -> np.ndarray:
    return np.maximum(x, 0.0)


def mlp_forward_dense(params, x: np.ndarray) -> np.ndarray:
    """Plain dense forward (oracle)."""
    h = x.reshape(x.shape[0], -1)
    layers = sorted(k for k in params.keys() if k.startswith("Dense"))
    for i, layer in enumerate(layers):
        w = np.asarray(params[layer]["kernel"])
        b = np.asarray(params[layer]["bias"])
        h = h @ w + b
        if i < len(layers) - 1:
            h = _relu(h)
    return h


def mlp_forward_spgemm(
    params, x: np.ndarray, backend: str = "tpu"
) -> np.ndarray:
    """Forward pass where every ``act @ Wᵀ`` runs as sparse × sparse
    SpGEMM (activations are post-ReLU sparse, weights pruned).

    ``backend``: "tpu" = the Pallas/XLA pipeline; "scipy" = CPU oracle.
    """
    mult = spgemm if backend == "tpu" else spgemm_scipy
    h = np.asarray(x, dtype=np.float32).reshape(x.shape[0], -1)
    layers = sorted(k for k in params.keys() if k.startswith("Dense"))
    for i, layer in enumerate(layers):
        w2d = dense_kernel_to_2d(params[layer]["kernel"])  # (out, in)
        b = np.asarray(params[layer]["bias"])
        act = COO.from_dense(h)
        wt = COO.from_dense(w2d).transpose()  # (in, out) = Wᵀ operand
        prod = mult(act, wt).to_dense()  # act @ Wᵀ... shape (batch, out)
        h = prod + b
        if i < len(layers) - 1:
            h = _relu(h)
    return h


def mlp_forward_spmm(
    params, x: np.ndarray, interpret: bool = False
) -> np.ndarray:
    """Forward pass with block-ELL sparse weights × dense activations on
    the MXU: ``h' = (W_blockell @ hᵀ)ᵀ + b``."""
    if jax.default_backend() == "cpu":
        interpret = True  # Pallas only runs interpreted off-TPU
    h = jnp.asarray(x, dtype=jnp.float32).reshape(x.shape[0], -1)
    layers = sorted(k for k in params.keys() if k.startswith("Dense"))
    from outerspace_tpu.ops.pallas.spmm_kernel import spmm

    for i, layer in enumerate(layers):
        w2d = dense_kernel_to_2d(params[layer]["kernel"])  # (out, in)
        b = jnp.asarray(params[layer]["bias"])
        w_ell = BlockELL.from_coo(COO.from_dense(w2d), block_shape=(8, 128))
        h = spmm(w_ell, h.T, interpret=interpret).T + b
        if i < len(layers) - 1:
            h = jnp.maximum(h, 0.0)
    return np.asarray(h)


def lenet_forward_spgemm(
    params, x: np.ndarray, backend: str = "tpu"
) -> np.ndarray:
    """LeNet forward with every layer lowered to sparse GEMM: conv layers
    run as im2col(input) @ Wᵀ (exactly the lowering the reference exported
    for its simulator, ``get_mtx_files.py:117-133``), fc layers as
    act @ Wᵀ — all through the SpGEMM pipeline.
    """
    from outerspace_tpu.nn.export import conv_kernel_to_2d, im2col_np

    mult = spgemm if backend == "tpu" else spgemm_scipy

    def sp_mm(dense_act: np.ndarray, w2d: np.ndarray) -> np.ndarray:
        act = COO.from_dense(np.asarray(dense_act, dtype=np.float32))
        wt = COO.from_dense(w2d).transpose()
        return mult(act, wt).to_dense()

    x = np.asarray(x, dtype=np.float32)
    if x.ndim == 2:
        x = x.reshape(-1, 28, 28, 1)
    elif x.ndim == 3:
        x = x[..., None]
    n = x.shape[0]

    # Host orchestration (im2col, pooling) is pure numpy: only the
    # sp_mm GEMMs touch the device on the "tpu" backend, and the
    # "scipy" oracle never does (a jnp im2col would silently run on
    # the tunneled TPU inside CPU baseline timings).
    def maxpool2(h):
        return h.reshape(
            h.shape[0], h.shape[1] // 2, 2, h.shape[2] // 2, 2, -1
        ).max(axis=(2, 4))

    conv_layers = sorted(k for k in params.keys() if k.startswith("Conv"))
    fc_layers = sorted(k for k in params.keys() if k.startswith("Dense"))

    # conv1 (k5, pad 2) → relu → pool
    p1 = im2col_np(x, 5, 2)
    w1 = conv_kernel_to_2d(params[conv_layers[0]]["kernel"])
    b1 = np.asarray(params[conv_layers[0]]["bias"])
    h = np.maximum(sp_mm(p1, w1) + b1, 0.0).reshape(n, 28, 28, 6)
    h = maxpool2(h)  # (n, 14, 14, 6)
    # conv2 (k5, valid) → relu → pool
    p2 = im2col_np(h, 5, 0)
    w2 = conv_kernel_to_2d(params[conv_layers[1]]["kernel"])
    b2 = np.asarray(params[conv_layers[1]]["bias"])
    h = np.maximum(sp_mm(p2, w2) + b2, 0.0).reshape(n, 10, 10, 16)
    h = maxpool2(h)  # (n, 5, 5, 16)
    h = h.reshape(n, -1)  # 400
    for i, layer in enumerate(fc_layers):
        w2d = dense_kernel_to_2d(params[layer]["kernel"])
        b = np.asarray(params[layer]["bias"])
        h = sp_mm(h, w2d) + b
        if i < len(fc_layers) - 1:
            h = _relu(h)
    return h


class SparseLeNet:
    """Device-resident sparse LeNet: every layer im2col-lowered to a
    GEMM (the reference's lowering for its simulator workloads,
    ``get_mtx_files.py:117-133``) with the pruned weights staged once as
    block-ELL operands on the MXU SpMM kernel — im2col, SpMM, bias,
    ReLU and the pools all run inside ONE jitted program, the serving
    path the reference's per-layer ``act_i.mtx × weight.mtx``
    simulations stood for."""

    def __init__(self, params, interpret: bool = False, tn: int = 128):
        from outerspace_tpu.nn.export import conv_kernel_to_2d, im2col
        from outerspace_tpu.ops.pallas.spmm_kernel import (
            blockell_to_device,
            spmm_blockell_device,
        )

        if jax.default_backend() == "cpu":
            interpret = True  # Pallas only runs interpreted off-TPU
        self._interpret = interpret
        self._tn = tn

        def stage(w2d, bias):
            w_ell = BlockELL.from_coo(
                COO.from_dense(np.asarray(w2d, np.float32)),
                block_shape=(8, 128),
            )
            return dict(
                dev=blockell_to_device(w_ell),
                out_dim=w2d.shape[0],
                in_dim=w2d.shape[1],
                bias=jnp.asarray(bias),
            )

        conv_names = sorted(k for k in params if k.startswith("Conv"))
        fc_names = sorted(k for k in params if k.startswith("Dense"))
        self.conv1 = stage(
            conv_kernel_to_2d(params[conv_names[0]]["kernel"]),
            params[conv_names[0]]["bias"],
        )
        self.conv2 = stage(
            conv_kernel_to_2d(params[conv_names[1]]["kernel"]),
            params[conv_names[1]]["bias"],
        )
        self.fcs = [
            stage(dense_kernel_to_2d(params[n]["kernel"]), params[n]["bias"])
            for n in fc_names
        ]
        conv1, conv2, fcs = self.conv1, self.conv2, self.fcs

        def sp_layer(layer, act):  # (rows, in_dim) → (rows, out_dim)
            rows = act.shape[0]
            k_pad = -(-layer["in_dim"] // 128) * 128
            n_pad = -(-rows // tn) * tn
            hp = jnp.zeros((k_pad, n_pad), jnp.float32)
            hp = hp.at[: act.shape[1], :rows].set(act.T)
            y = spmm_blockell_device(
                layer["dev"]["meta"], layer["dev"]["blocks"], hp,
                tn=tn, interpret=interpret,
            )
            return y[: layer["out_dim"], :rows].T + layer["bias"][None, :]

        def pool2(h):
            n, hh, ww, c = h.shape
            return jnp.max(
                h.reshape(n, hh // 2, 2, ww // 2, 2, c), axis=(2, 4)
            )

        def forward(x):
            n = x.shape[0]
            x = x.reshape(n, 28, 28, 1)
            p1 = im2col(x, 5, 2)  # (n·784, 25)
            h = jnp.maximum(sp_layer(conv1, p1), 0.0)
            h = pool2(h.reshape(n, 28, 28, 6))  # (n, 14, 14, 6)
            p2 = im2col(h, 5, 0)  # (n·100, 150)
            h = jnp.maximum(sp_layer(conv2, p2), 0.0)
            h = pool2(h.reshape(n, 10, 10, 16)).reshape(n, -1)  # (n, 400)
            for li, layer in enumerate(fcs):
                h = sp_layer(layer, h)
                if li < len(fcs) - 1:
                    h = jnp.maximum(h, 0.0)
            return h

        self._forward = jax.jit(forward)

    def __call__(self, x) -> jnp.ndarray:
        x = jnp.asarray(x, dtype=jnp.float32)
        if x.ndim == 2:
            x = x.reshape(x.shape[0], 28, 28, 1)
        elif x.ndim == 3:
            x = x[..., None]
        return self._forward(x)


class SparseMLP:
    """Production-shaped sparse MLP: block-ELL weights staged on device
    once, whole forward chained through the MXU SpMM kernel under one
    jit — the serving path the reference's act·Wᵀ simulations stood for.
    """

    def __init__(self, params, interpret: bool = False, tn: int = 128):
        from outerspace_tpu.ops.pallas.spmm_kernel import (
            blockell_to_device,
            spmm_blockell_device,
        )

        if jax.default_backend() == "cpu":
            interpret = True  # Pallas only runs interpreted off-TPU
        self._interpret = interpret
        self._tn = tn
        self._spmm = spmm_blockell_device
        self.layers = []
        for name in sorted(k for k in params.keys() if k.startswith("Dense")):
            w2d = dense_kernel_to_2d(params[name]["kernel"])  # (out, in)
            w_ell = BlockELL.from_coo(
                COO.from_dense(w2d), block_shape=(8, 128)
            )
            dev = blockell_to_device(w_ell)
            self.layers.append(
                dict(
                    dev=dev,
                    out_dim=w2d.shape[0],
                    in_dim=w2d.shape[1],
                    bias=jnp.asarray(params[name]["bias"]),
                )
            )

        layers = self.layers
        spmm_dev = self._spmm

        def forward(x):  # shapes static per jit cache entry
            batch = x.shape[0]
            n_pad = -(-batch // tn) * tn
            h = x.T  # (features, batch)
            for li, layer in enumerate(layers):
                k_pad = -(-layer["in_dim"] // 128) * 128
                hp = jnp.zeros((k_pad, n_pad), jnp.float32)
                hp = hp.at[: h.shape[0], :batch].set(h)
                y = spmm_dev(
                    layer["dev"]["meta"],
                    layer["dev"]["blocks"],
                    hp,
                    tn=tn,
                    interpret=interpret,
                )
                h = y[: layer["out_dim"], :batch] + layer["bias"][:, None]
                if li < len(layers) - 1:
                    h = jnp.maximum(h, 0.0)
            return h.T

        self._forward_py = forward
        self._forward = jax.jit(forward)

    def __call__(self, x) -> jnp.ndarray:
        x = jnp.asarray(x, dtype=jnp.float32).reshape(x.shape[0], -1)
        return self._forward(x)

    def sharded(self, mesh, axis: str = "dp"):
        """Data-parallel serving entry: returns a jitted callable that
        shard_maps the forward over ``axis`` of ``mesh`` — each device
        runs the MXU SpMM kernels on its batch shard with the block-ELL
        weights replicated (a Pallas custom call cannot be
        auto-partitioned by XLA, so the batch split must be explicit).
        The batch must divide the axis size. Multi-chip counterpart of
        the single-chip serving path the bench times."""
        from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P

        fwd = jax.jit(
            shard_map(
                self._forward_py, mesh=mesh,
                in_specs=P(axis), out_specs=P(axis),
                check_rep=False,
            )
        )

        def run(x):
            x = jnp.asarray(x, dtype=jnp.float32).reshape(x.shape[0], -1)
            return fwd(x)

        return run
