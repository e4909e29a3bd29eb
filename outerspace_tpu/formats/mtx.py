"""Matrix Market (.mtx) reader / writer.

Behavioral parity with the reference reader ``readcoo``
(``simulator/SimSpGEMM.cpp:55-100``): ``%`` comment lines skipped, header
``NRow NCol NNZ``, 1-based → 0-based indices, a missing value field defaults
to 1.0 (pattern matrices), and ``symmetric`` headers mirror off-diagonal
entries. The writer matches the ``scipy.io.mmwrite`` output the reference's
NN pipeline produced (``NN_models/util.py:61-62``).

A native C++ fast path (``outerspace_tpu/csrc/mtx_reader.cpp``) is used when
the shared library is built; the pure-Python path is the fallback oracle.
"""

from __future__ import annotations

import os

import numpy as np

from outerspace_tpu.formats.coo import COO, INDEX_DTYPE, VALUE_DTYPE


def _read_mtx_python(path: str, expand_symmetric: bool = True) -> COO:
    rows: list[int] = []
    cols: list[int] = []
    vals: list[float] = []
    symmetric = False
    skew = False
    pattern = False
    header_seen = False
    nrow = ncol = nnz = 0
    with open(path, "r") as f:
        first = f.readline()
        if first.startswith("%%MatrixMarket"):
            tokens = first.lower().split()
            skew = "skew-symmetric" in tokens
            symmetric = skew or "symmetric" in tokens
            pattern = "pattern" in tokens
        else:
            f.seek(0)
        for line in f:
            line = line.strip()
            if not line or line.startswith("%"):
                continue
            parts = line.split()
            if not header_seen:
                nrow, ncol, nnz = int(parts[0]), int(parts[1]), int(parts[2])
                header_seen = True
                continue
            r = int(parts[0]) - 1
            c = int(parts[1]) - 1
            v = float(parts[2]) if (len(parts) > 2 and not pattern) else 1.0
            rows.append(r)
            cols.append(c)
            vals.append(v)
            if symmetric and expand_symmetric and r != c:
                rows.append(c)
                cols.append(r)
                vals.append(-v if skew else v)
    if not header_seen:
        raise ValueError(f"{path}: no Matrix Market size header found")
    del nnz
    return COO(
        (nrow, ncol),
        np.asarray(rows, dtype=INDEX_DTYPE),
        np.asarray(cols, dtype=INDEX_DTYPE),
        np.asarray(vals, dtype=VALUE_DTYPE),
    )


def read_mtx(path: str, expand_symmetric: bool = True, native: bool = True) -> COO:
    """Read a Matrix Market file into COO.

    Tries the native C++ reader first (if built), falling back to the
    pure-Python implementation. ``.mtx.gz`` files (SuiteSparse ships
    compressed) are transparently decompressed through the Python
    reader.
    """
    if path.endswith(".gz"):
        import gzip
        import shutil
        import tempfile

        # decompress once to a temp file so either reader can stream it
        # (copyfileobj streams with constant memory — a multi-GB
        # SuiteSparse matrix must not materialize as one bytes object);
        # the finally also covers a corrupt/truncated .gz failing
        # mid-copy, so a partial temp file never leaks
        tmp = None
        try:
            with gzip.open(path, "rb") as src, tempfile.NamedTemporaryFile(
                suffix=".mtx", delete=False
            ) as dst:
                tmp = dst.name
                shutil.copyfileobj(src, dst)
            return read_mtx(
                tmp, expand_symmetric=expand_symmetric, native=native
            )
        finally:
            if tmp is not None:
                os.unlink(tmp)
    if native:
        try:
            from outerspace_tpu.runtime.native import read_mtx_native

            out = read_mtx_native(path, expand_symmetric=expand_symmetric)
            if out is not None:
                return out
        except Exception:
            pass
    return _read_mtx_python(path, expand_symmetric=expand_symmetric)


def write_mtx(path: str, m, comment: str | None = None) -> None:
    """Write a COO/CSR/CSC matrix as a general real coordinate .mtx file."""
    coo = m if isinstance(m, COO) else m.to_coo()
    coo = coo.sorted_colmajor()  # scipy/mmwrite emit column-major order
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w") as f:
        f.write("%%MatrixMarket matrix coordinate real general\n")
        if comment:
            for line in comment.splitlines():
                f.write(f"% {line}\n")
        f.write(f"{coo.shape[0]} {coo.shape[1]} {coo.nnz}\n")
        for r, c, v in zip(coo.row, coo.col, coo.val):
            f.write(f"{int(r) + 1} {int(c) + 1} {float(v):.9g}\n")
