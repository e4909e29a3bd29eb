"""MNIST data loading (idx files) with a deterministic synthetic fallback.

The reference used torchvision MNIST with a deterministic 45k/5k/10k split
at seed 42 (``NN_models/dataloaders.py:6-15``). This environment has no
network egress and the reference tree ships only the *test* split
(``t10k-images-idx3-ubyte.gz`` + labels, with the train images stripped —
``.MISSING_LARGE_BLOBS``), so:

- ``load_mnist`` reads any idx files found (searching the reference's
  ``data/MNIST/raw`` layout too) and splits whatever is available
  deterministically (default 80/10/10 at seed 42);
- ``synthetic_mnist`` generates procedurally-rendered digit-like images
  (deterministic), used by tests and as the no-data fallback.
"""

from __future__ import annotations

import gzip
import os
import struct

import numpy as np

_SEARCH_DIRS = [
    os.environ.get("OUTERSPACE_MNIST_DIR", ""),
    os.path.join(os.path.dirname(__file__), "..", "..", "data", "MNIST", "raw"),
    "/root/reference/NN_models/data/MNIST/raw",
]


def _open_maybe_gz(path: str):
    if os.path.exists(path):
        return open(path, "rb")
    if os.path.exists(path + ".gz"):
        return gzip.open(path + ".gz", "rb")
    raise FileNotFoundError(path)


def _read_idx_images(path: str) -> np.ndarray:
    with _open_maybe_gz(path) as f:
        magic, n, rows, cols = struct.unpack(">IIII", f.read(16))
        assert magic == 2051, f"bad magic {magic} in {path}"
        data = np.frombuffer(f.read(n * rows * cols), dtype=np.uint8)
    return data.reshape(n, rows, cols).astype(np.float32) / 255.0


def _read_idx_labels(path: str) -> np.ndarray:
    with _open_maybe_gz(path) as f:
        magic, n = struct.unpack(">II", f.read(8))
        assert magic == 2049, f"bad magic {magic} in {path}"
        return np.frombuffer(f.read(n), dtype=np.uint8).astype(np.int32)


def find_mnist_dir() -> str | None:
    for d in _SEARCH_DIRS:
        if d and os.path.exists(os.path.join(d, "t10k-labels-idx1-ubyte")):
            return d
        if d and os.path.exists(os.path.join(d, "t10k-labels-idx1-ubyte.gz")):
            return d
    return None


def load_mnist(
    data_dir: str | None = None,
    splits: tuple[float, float, float] = (0.8, 0.1, 0.1),
    seed: int = 42,
) -> dict[str, tuple[np.ndarray, np.ndarray]]:
    """Load whatever MNIST idx files exist; returns {train, val, test}.

    Pools all available (image, label) pairs, then splits deterministically
    (reference: fixed-seed random_split, ``dataloaders.py:9-11``).
    """
    data_dir = data_dir or find_mnist_dir()
    if data_dir is None:
        raise FileNotFoundError(
            "no MNIST idx files found; use synthetic_mnist() instead"
        )
    images, labels = [], []
    for img, lab in [
        ("train-images-idx3-ubyte", "train-labels-idx1-ubyte"),
        ("t10k-images-idx3-ubyte", "t10k-labels-idx1-ubyte"),
    ]:
        try:
            x = _read_idx_images(os.path.join(data_dir, img))
            y = _read_idx_labels(os.path.join(data_dir, lab))
            images.append(x)
            labels.append(y)
        except FileNotFoundError:
            continue
    if not images:
        raise FileNotFoundError(f"no readable MNIST pairs under {data_dir}")
    x = np.concatenate(images)
    y = np.concatenate(labels)
    rng = np.random.default_rng(seed)
    perm = rng.permutation(x.shape[0])
    x, y = x[perm], y[perm]
    n = x.shape[0]
    n_tr = int(splits[0] * n)
    n_va = int(splits[1] * n)
    return {
        "train": (x[:n_tr], y[:n_tr]),
        "val": (x[n_tr : n_tr + n_va], y[n_tr : n_tr + n_va]),
        "test": (x[n_tr + n_va :], y[n_tr + n_va :]),
    }


def synthetic_mnist(
    n: int = 4096, seed: int = 0
) -> dict[str, tuple[np.ndarray, np.ndarray]]:
    """Procedural digit-like 28×28 images: each class is a fixed stroke
    pattern plus noise — learnable by a small net, fully deterministic."""
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, 10, n).astype(np.int32)
    base = np.zeros((10, 28, 28), dtype=np.float32)
    proto_rng = np.random.default_rng(1234)
    for c in range(10):
        # Random strokes per class prototype.
        for _ in range(4 + c % 3):
            r0, c0 = proto_rng.integers(4, 24, 2)
            dr, dc = proto_rng.integers(-3, 4, 2)
            for t in range(8):
                rr = np.clip(r0 + t * dr // 2, 0, 27)
                cc = np.clip(c0 + t * dc // 2, 0, 27)
                base[c, rr, cc] = 1.0
    x = base[labels]
    x = x + 0.1 * rng.standard_normal(x.shape).astype(np.float32)
    x = np.clip(x, 0.0, 1.0)
    n_tr, n_va = int(0.8 * n), int(0.1 * n)
    return {
        "train": (x[:n_tr], labels[:n_tr]),
        "val": (x[n_tr : n_tr + n_va], labels[n_tr : n_tr + n_va]),
        "test": (x[n_tr + n_va :], labels[n_tr + n_va :]),
    }


def batches(x: np.ndarray, y: np.ndarray, batch_size: int, seed: int = 0):
    """Shuffled full batches (drops the ragged tail, keeping shapes
    static for jit — the TPU equivalent of drop_last)."""
    rng = np.random.default_rng(seed)
    perm = rng.permutation(x.shape[0])
    nb = x.shape[0] // batch_size
    for i in range(nb):
        idx = perm[i * batch_size : (i + 1) * batch_size]
        yield x[idx], y[idx]
