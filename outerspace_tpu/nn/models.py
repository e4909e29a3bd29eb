"""MLP1 and LeNet in Flax — shape-parity with the reference models.

Reference (``NN_models/models.py``):
- ``MLP1``: 784 → 100 → 100 → 10, ReLU; forward returns
  ``(logits, (x1, x2))`` — the two hidden activations — so the export
  pipeline can dump sparse post-ReLU activations (``models.py:6-31``).
- ``LeNet``: conv(1→6, k5, pad 2) + maxpool2, conv(6→16, k5, valid) +
  maxpool2, fc 400→120→84→10; forward returns logits plus all seven
  intermediate activations (``models.py:35-84``).

Differences from the reference are deliberate TPU-isms: NHWC layout
(TPU-native convolution layout) instead of NCHW, and a single
``(logits, activations)`` tuple interface for both models.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


class MLP1(nn.Module):
    """784-100-100-10 ReLU MLP returning (logits, hidden activations)."""

    hidden: Sequence[int] = (100, 100)
    n_classes: int = 10

    @nn.compact
    def __call__(self, x):
        x = x.reshape((x.shape[0], -1))
        acts = []
        for h in self.hidden:
            x = nn.relu(nn.Dense(h)(x))
            acts.append(x)
        logits = nn.Dense(self.n_classes)(x)
        return logits, tuple(acts)


class LeNet(nn.Module):
    """LeNet-5 variant returning (logits, 7 intermediate activations).

    Activation tuple mirrors the reference's capture points
    (``models.py:53-84``): conv1-out, pool1-out, conv2-out, pool2-out,
    flat, fc1-out, fc2-out.
    """

    n_classes: int = 10

    @nn.compact
    def __call__(self, x):
        if x.ndim == 2:  # flat 784 input
            x = x.reshape((x.shape[0], 28, 28, 1))
        elif x.ndim == 3:
            x = x[..., None]
        acts = []
        x = nn.relu(nn.Conv(6, (5, 5), padding=((2, 2), (2, 2)))(x))
        acts.append(x)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        acts.append(x)
        x = nn.relu(nn.Conv(16, (5, 5), padding="VALID")(x))
        acts.append(x)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        acts.append(x)
        x = x.reshape((x.shape[0], -1))  # 5*5*16 = 400
        acts.append(x)
        x = nn.relu(nn.Dense(120)(x))
        acts.append(x)
        x = nn.relu(nn.Dense(84)(x))
        acts.append(x)
        logits = nn.Dense(self.n_classes)(x)
        return logits, tuple(acts)


def make_model(model_type: str):
    if model_type == "MLP1":
        return MLP1()
    if model_type == "MLP1w":
        # The reference's earlier 784-1000-1000-10 variant — the
        # architecture behind its shipped extreme-sparsity artifact
        # (saved_weights/MLP1/prune0p01_l2reg/log.txt: every fc kernel
        # pruned to 1.00% nnz, 0.9741 test; the log's fc2 is 1000x1000).
        return MLP1(hidden=(1000, 1000))
    if model_type == "LeNet":
        return LeNet()
    raise ValueError(f"unknown model type {model_type!r}")


def activation_sparsity(acts) -> list[float]:
    """Fraction of nonzero entries per activation — the reference printed
    this during forward passes (``models.py:20-27``)."""
    return [float(jnp.mean((a != 0).astype(jnp.float32))) for a in acts]
