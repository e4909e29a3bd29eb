"""Persisted sizing cache: learned static buffer budgets keyed by workload.

Device chains with static shapes (the one-jit MCL, ``ops.chain``) learn
their loop-buffer budgets from a sizing pass whose XLA compiles can cost
minutes on a cold process. The budgets depend only on the workload
(operand structure + chain parameters), so they are cached in a small
JSON file keyed by a content hash — a warm cache skips the sizing pass
entirely and the first call goes straight to the one-jit program.

The reference had no analogue (its simulator re-derived everything per
run); this is the TPU-native answer to static-shape compilation cost.
Writes are best-effort (a read-only checkout silently degrades to the
sizing pass); the device ``ok`` flag downstream still guards every
cached budget with an exact fallback, so a stale or corrupt cache can
never produce wrong results — only a slower first run.
"""

from __future__ import annotations

import hashlib
import json
import os
import tempfile

import numpy as np

_ENV = "OUTERSPACE_SIZING_CACHE"


def cache_path() -> str:
    """Cache file location: ``$OUTERSPACE_SIZING_CACHE`` or
    ``<repo>/data/sizing_cache.json`` next to the package."""
    p = os.environ.get(_ENV)
    if p:
        return p
    pkg_root = os.path.dirname(os.path.dirname(os.path.dirname(__file__)))
    return os.path.join(pkg_root, "data", "sizing_cache.json")


def workload_key(arrays: tuple, params: tuple) -> str:
    """Content hash over operand structure + chain parameters.

    ``arrays``: numpy arrays whose bytes define the workload (e.g. CSR
    indptr/indices); values are included when passed. ``params``: the
    chain's scalar knobs (iters, inflation, threshold, ...).
    """
    h = hashlib.sha256()
    for a in arrays:
        a = np.ascontiguousarray(a)
        h.update(str(a.dtype).encode())
        h.update(str(a.shape).encode())
        h.update(a.tobytes())
    h.update(repr(params).encode())
    return h.hexdigest()[:24]


def _load() -> dict:
    try:
        with open(cache_path()) as f:
            d = json.load(f)
        return d if isinstance(d, dict) else {}
    except (OSError, ValueError):
        return {}


# keys that may legitimately hold None (an explicitly disabled
# per-iteration schedule); a None in any OTHER key is corruption and
# must be dropped so the sizing pass re-runs — the module contract is
# that a corrupt cache only ever costs speed, never a crash
_NONE_OK = frozenset({"p_pads", "blk_caps"})


def _coerce(k, v):
    """Sizing values are ints, int lists (per-iteration schedules), or —
    for schedule keys only — None; anything else is rejected."""
    if v is None:
        return None if k in _NONE_OK else _reject()
    if isinstance(v, bool):
        return _reject()
    if isinstance(v, int):
        return v
    if isinstance(v, list) and all(
        isinstance(x, int) and not isinstance(x, bool) for x in v
    ):
        return [int(x) for x in v]
    return _reject()


def _reject():
    raise ValueError("unsupported sizing value")


def lookup(key: str) -> dict | None:
    """Return the cached sizing dict for ``key`` (ints, int lists, or
    None markers), or None."""
    got = _load().get(key)
    if not isinstance(got, dict):
        return None
    out = {}
    for k, v in got.items():
        try:
            out[k] = _coerce(k, v)
        except ValueError:
            continue
    return out


def store(key: str, sizes: dict) -> None:
    """Best-effort atomic write of ``sizes`` under ``key``."""
    path = cache_path()
    try:
        d = _load()
        d[key] = {k: _coerce(k, v) for k, v in sizes.items()}
        os.makedirs(os.path.dirname(path), exist_ok=True)
        fd, tmp = tempfile.mkstemp(
            dir=os.path.dirname(path), suffix=".tmp"
        )
        with os.fdopen(fd, "w") as f:
            json.dump(d, f, indent=0, sort_keys=True)
        os.replace(tmp, path)
    except OSError:
        pass
