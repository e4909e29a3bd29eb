"""ctypes loader for the native library (``libouterspace.so``).

The native pieces mirror where the reference was C++ (its entire simulator,
``simulator/*.cpp``): here the C++ carries the *runtime* — a fast Matrix
Market parser and the discrete-event TPU performance model — while all
TPU compute is JAX/XLA/Pallas. Everything degrades gracefully to pure
Python when the library has not been built (``make -C outerspace_tpu/csrc``).
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False


def _lib_path() -> str:
    return os.path.join(os.path.dirname(__file__), "..", "csrc", "libouterspace.so")


def load_library():
    """Load (and cache) the native library; returns None if unavailable."""
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = os.path.abspath(_lib_path())
    try:
        # Refresh a stale .so (no-op when newer than the sources) so a
        # prebuilt lib never shadows newer csrc entry points — the
        # hasattr probes below would silently disable them otherwise.
        import subprocess

        subprocess.run(
            ["make", "-C", os.path.dirname(path)],
            check=False, capture_output=True, text=True,
        )
    except (OSError, FileNotFoundError):
        pass
    if not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
        lib.osp_mtx_read.restype = ctypes.c_void_p
        lib.osp_mtx_read.argtypes = [ctypes.c_char_p, ctypes.c_int]
        lib.osp_mtx_nrows.restype = ctypes.c_longlong
        lib.osp_mtx_nrows.argtypes = [ctypes.c_void_p]
        lib.osp_mtx_ncols.restype = ctypes.c_longlong
        lib.osp_mtx_ncols.argtypes = [ctypes.c_void_p]
        lib.osp_mtx_nnz.restype = ctypes.c_longlong
        lib.osp_mtx_nnz.argtypes = [ctypes.c_void_p]
        lib.osp_mtx_copy.restype = None
        lib.osp_mtx_copy.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.osp_mtx_free.restype = None
        lib.osp_mtx_free.argtypes = [ctypes.c_void_p]
        try:
            # planner core (gplan.cpp) — absent in older built libs;
            # callers probe with hasattr and fall back to Python
            c_ll = ctypes.c_longlong
            p_ll = ctypes.POINTER(c_ll)
            lib.osp_plan_subtiles.restype = c_ll
            lib.osp_plan_subtiles.argtypes = (
                [p_ll] * 3 + [c_ll] * 6 + [p_ll] * 3
            )
            lib.osp_pack_groups.restype = c_ll
            lib.osp_pack_groups.argtypes = (
                [p_ll] * 2 + [c_ll] * 6
                + [ctypes.POINTER(ctypes.c_int32)]
            )
        except AttributeError:
            pass
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def native_available() -> bool:
    return load_library() is not None


def read_mtx_native(path: str, expand_symmetric: bool = True):
    """Parse a .mtx file with the C++ reader; None if the lib is absent."""
    lib = load_library()
    if lib is None:
        return None
    handle = lib.osp_mtx_read(path.encode(), 1 if expand_symmetric else 0)
    if not handle:
        raise IOError(f"native mtx reader failed on {path}")
    try:
        nr = lib.osp_mtx_nrows(handle)
        nc = lib.osp_mtx_ncols(handle)
        nnz = lib.osp_mtx_nnz(handle)
        rows = np.empty(nnz, dtype=np.int32)
        cols = np.empty(nnz, dtype=np.int32)
        vals = np.empty(nnz, dtype=np.float32)
        lib.osp_mtx_copy(
            handle,
            rows.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            cols.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            vals.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
    finally:
        lib.osp_mtx_free(handle)
    from outerspace_tpu.formats.coo import COO

    return COO((int(nr), int(nc)), rows, cols, vals)


def ref_spgemm_native(a_csc, b_csr):
    """C = A @ B via the native CPU reference pipeline (the reference's
    outer-product algorithm, corrected — ``csrc/ref_spgemm.cpp``).
    Returns a host CSR, or None if the native lib is absent."""
    lib = load_library()
    if lib is None:
        return None
    if not hasattr(lib, "_ref_configured"):
        lib.osp_ref_spgemm.restype = ctypes.c_void_p
        lib.osp_ref_spgemm.argtypes = [
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.osp_ref_nnz.restype = ctypes.c_int64
        lib.osp_ref_nnz.argtypes = [ctypes.c_void_p]
        lib.osp_ref_copy.restype = None
        lib.osp_ref_copy.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
        ]
        lib.osp_ref_free.restype = None
        lib.osp_ref_free.argtypes = [ctypes.c_void_p]
        lib._ref_configured = True
    m, k = a_csc.shape
    n = b_csr.shape[1]
    ai = np.ascontiguousarray(a_csc.indptr, dtype=np.int64)
    ar = np.ascontiguousarray(a_csc.indices, dtype=np.int32)
    av = np.ascontiguousarray(a_csc.data, dtype=np.float32)
    bi = np.ascontiguousarray(b_csr.indptr, dtype=np.int64)
    bc = np.ascontiguousarray(b_csr.indices, dtype=np.int32)
    bv = np.ascontiguousarray(b_csr.data, dtype=np.float32)
    h = lib.osp_ref_spgemm(
        m, n, k,
        ai.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ar.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        av.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        bi.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        bc.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        bv.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if not h:
        return None
    try:
        nnz = lib.osp_ref_nnz(h)
        indptr = np.empty(m + 1, dtype=np.int64)
        cols = np.empty(nnz, dtype=np.int32)
        vals = np.empty(nnz, dtype=np.float32)
        lib.osp_ref_copy(
            h,
            indptr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            cols.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            vals.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
    finally:
        lib.osp_ref_free(h)
    from outerspace_tpu.formats.csr import CSR

    return CSR((m, n), indptr, cols, vals)
