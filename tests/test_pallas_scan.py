"""Pallas merge-epilogue scan kernel vs the XLA reference epilogue."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from outerspace_tpu.ops.pallas.scan import merge_epilogue_scan
from outerspace_tpu.ops.spgemm import (
    _I32_MAX,
    merge_biased_keys,
    pack_key_biased,
)


def _xla_epilogue(key, vals, n_cols, sentinel_row, max_run, pad_count):
    """merge_biased_keys minus its sort (inputs already sorted)."""
    return merge_biased_keys(
        jnp.asarray(key), jnp.asarray(vals), n_cols, sentinel_row,
        max_run, pad_count=jnp.int32(pad_count),
    )


def _make_stream(n, n_cols, m, pad, seed, max_dup=6, corner=False):
    """Sorted biased-key stream with duplicate runs + sentinel padding."""
    rng = np.random.default_rng(seed)
    real = n - pad
    # Unique coordinates (duplicate runs stay <= max_dup <= max_run; longer
    # runs would make max_run truncation legitimately undefined).
    space = m * n_cols
    assert space >= real, "key space must exceed stream length"
    coords = rng.choice(space, size=real, replace=False)
    dups = rng.integers(1, max_dup + 1, size=real)
    flat = np.repeat(coords.astype(np.int64), dups)[:real]
    if corner:
        flat[-3:] = m * n_cols - 1  # the (m-1, n-1) corner coordinate
    flat.sort()
    biased = (flat - 2**31).astype(np.int64).astype(np.int32)
    key = np.concatenate(
        [biased, np.full(pad, _I32_MAX, np.int32)]
    )
    key.sort()
    vals = rng.normal(size=n).astype(np.float32)
    vals[key == _I32_MAX] = 0.0
    if corner:
        # real corner values live among the sentinel slots: re-randomize
        # three of them (unstable-sort interleave is arbitrary anyway)
        sent_idx = np.nonzero(key == _I32_MAX)[0]
        vals[sent_idx[:3]] = rng.normal(size=3).astype(np.float32)
    return key, vals


CASES = [
    dict(n=4096, n_cols=500, m=400, pad=700, seed=0),
    dict(n=8192, n_cols=65536, m=65536, pad=100, seed=1),
    dict(n=8192, n_cols=65536, m=65536, pad=97, seed=2, corner=True),
    dict(n=2048, n_cols=370, m=290, pad=0, seed=3),
    dict(n=2048, n_cols=37, m=29, pad=2048, seed=4),  # all padding
]


@pytest.mark.parametrize("case", CASES)
def test_scan_matches_xla_epilogue(case):
    corner = case.pop("corner", False)
    key, vals = _make_stream(**case, corner=corner)
    n_cols, m, pad = case["n_cols"], case["m"], case["pad"]
    max_run = 8
    got = merge_epilogue_scan(
        jnp.asarray(key), jnp.asarray(vals), jnp.int32(pad),
        n_cols=n_cols, sentinel_row=m, max_run=max_run, interpret=True,
    )
    exp = _xla_epilogue(key, vals, n_cols, m, max_run, pad)
    for g, e, name in zip(got, exp, ["rows", "cols", "vals", "valid", "nnz"]):
        g, e = np.asarray(g), np.asarray(e)
        if name == "vals":
            np.testing.assert_allclose(g, e, rtol=1e-5, atol=1e-6, err_msg=name)
        else:
            np.testing.assert_array_equal(g, e, err_msg=name)


def test_scan_long_run_spanning_chunks():
    # One run longer than a whole chunk cannot arise for real keys
    # (max_run-bounded) but the carry must still chain exactly across
    # chunk boundaries for runs crossing them.
    n, n_cols, m = 4096, 1000, 1000
    rng = np.random.default_rng(7)
    # runs of length 1..5 crossing the 1024-chunk boundary by construction
    flat = np.repeat(np.arange(1500, dtype=np.int64) * 661 % (n_cols * m),
                     rng.integers(1, 6, size=1500))[:n]
    assert flat.shape[0] == n
    flat.sort()
    key = (flat - 2**31).astype(np.int64).astype(np.int32)
    vals = rng.normal(size=n).astype(np.float32)
    got = merge_epilogue_scan(
        jnp.asarray(key), jnp.asarray(vals), jnp.int32(0),
        n_cols=n_cols, sentinel_row=m, max_run=8, interpret=True,
    )
    exp = _xla_epilogue(key, vals, n_cols, m, 8, 0)
    np.testing.assert_array_equal(np.asarray(got[4]), np.asarray(exp[4]))
    np.testing.assert_allclose(
        np.asarray(got[2]), np.asarray(exp[2]), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(got[3]), np.asarray(exp[3]))


def test_merge_biased_keys_pallas_epilogue_end_to_end():
    # Full merge (sort + pallas epilogue) against the XLA epilogue on an
    # unsorted stream, exercised through the public merge entry point.
    rng = np.random.default_rng(11)
    n, n_cols, m = 8192, 3000, 2500
    coords = rng.choice(n_cols * m, size=4500, replace=False).astype(np.int64)
    flat = np.repeat(coords, rng.integers(1, 5, size=4500))[:n - 128]
    assert flat.shape[0] == n - 128
    key = np.concatenate(
        [(flat - 2**31).astype(np.int64).astype(np.int32),
         np.full(128, _I32_MAX, np.int32)]
    )
    perm = rng.permutation(n)
    key = key[perm]
    vals = rng.normal(size=n).astype(np.float32)
    vals[key == _I32_MAX] = 0.0
    args = (jnp.asarray(key), jnp.asarray(vals), n_cols, m, 8)
    got = merge_biased_keys(*args, pad_count=jnp.int32(128),
                            epilogue="pallas", interpret=True)
    exp = merge_biased_keys(*args, pad_count=jnp.int32(128), epilogue="xla")
    for g, e, name in zip(got, exp, ["rows", "cols", "vals", "valid", "nnz"]):
        g, e = np.asarray(g), np.asarray(e)
        if name == "vals":
            np.testing.assert_allclose(g, e, rtol=1e-5, atol=1e-6, err_msg=name)
        else:
            np.testing.assert_array_equal(g, e, err_msg=name)
