"""Sparse format layer (L0): containers, conversions, I/O, generators."""

from outerspace_tpu.formats.coo import (  # noqa: F401
    COO,
    DuplicateCoordinateError,
    INDEX_DTYPE,
    VALUE_DTYPE,
)
from outerspace_tpu.formats.csr import CSR, CSC  # noqa: F401
from outerspace_tpu.formats.compact import BlockELL, CompactCOO  # noqa: F401
from outerspace_tpu.formats.mtx import read_mtx, write_mtx  # noqa: F401
from outerspace_tpu.formats.generators import (  # noqa: F401
    banded,
    erdos_renyi,
    rmat,
)
