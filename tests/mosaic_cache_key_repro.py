"""Minimal standalone repro: Pallas/Mosaic cache keys are source-LINE
sensitive; plain XLA programs' keys are not.

Context (root cause of this repo's committed-compilation-cache churn,
diagnosed live by ``bench._cache_key_canary`` across rounds 3-4): the
JAX persistent compilation cache canonicalizes XLA-level debug
locations out of the cache key, so a plain ``lax.sort`` program keyed
at line 10 and the same program keyed at line 50 hash identically. A
Pallas kernel, however, lowers to a ``tpu_custom_call`` whose
``backend_config`` carries the SERIALIZED MOSAIC MODULE — and that
payload embeds its own source locations, opaque bytes to the
canonicalizer. Shift the kernel's ``def`` line by one and the whole
cache key moves, orphaning every cached executable that contains the
kernel. For a repo that commits its compilation cache (slow remote
compiles), every kernel-file edit silently invalidates multi-MB
entries.

Upstream-facing summary: ``jax._src.cache_key`` should canonicalize
(or hash out) location info inside serialized Mosaic payloads the same
way it strips StableHLO locations — e.g. by asking Mosaic for a
location-stripped serialization, or hashing the payload with its
`loc(...)` operands masked. Until then, any persistent-cache user of
Pallas pays a full recompile per source shift.

This script is the self-contained demonstration (run on a TPU backend;
Mosaic lowering does not exist on CPU):

    python tests/mosaic_cache_key_repro.py

It builds the SAME two programs twice — once with the defining source
shifted down 10 lines (via ``compile`` of an identical string padded
with newlines) — and prints each program's cache key and module hash:

    sort   : key stable under the shift  (expected)
    pallas : key DRIFTS under the shift  (the bug)

Exit 0 when the asymmetry reproduces, 2 when it does not (i.e. a JAX
upgrade fixed it — then the committed-cache GC machinery in bench.py
can be retired), 3 when the backend cannot lower Mosaic (not a TPU).
"""

from __future__ import annotations

import hashlib
import sys

_SRC = '''
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...] * 2.0


def make_pallas():
    def f(x):
        return pl.pallas_call(
            _kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        )(x)
    return f


def make_sort():
    def f(a):
        return jax.lax.sort((a, a), num_keys=1)[0][-1]
    return f
'''


def _build(shift: int):
    ns: dict = {}
    code = compile("\n" * shift + _SRC, "<mosaic_cache_key_repro>", "exec")
    exec(code, ns)
    return ns["make_sort"](), ns["make_pallas"]()


def _key_of(fn, *args):
    import jax
    import numpy as np
    from jax._src import cache_key as _ck
    from jax._src import compiler as _jc
    from jax._src import xla_bridge as _xb
    from jax._src.interpreters import mlir as _mlir

    backend = _xb.get_backend()
    devices = np.array([[jax.devices()[0]]])
    lowered = jax.jit(fn).lower(*args)
    module = lowered.compiler_ir("stablehlo")
    opts = _jc.get_compile_options(
        num_replicas=1, num_partitions=1, device_assignment=devices
    )
    full = _ck.get(module, devices, opts, backend)
    mod_h = hashlib.sha256(
        _mlir.module_to_bytecode(module)
    ).hexdigest()[:16]
    return full, mod_h


def main() -> int:
    import jax
    import jax.numpy as jnp

    print(f"jax {jax.__version__}, backend {jax.default_backend()}, "
          f"platform_version "
          f"{str(getattr(jax.devices()[0].client, 'platform_version', '?'))[:60]}")
    xs = jnp.arange(4096, dtype=jnp.int32)
    xp = jnp.ones((8, 128), jnp.float32)
    try:
        sort0, pallas0 = _build(0)
        sort1, pallas1 = _build(10)
        ks0 = _key_of(sort0, xs)
        ks1 = _key_of(sort1, xs)
        kp0 = _key_of(pallas0, xp)
        kp1 = _key_of(pallas1, xp)
    except Exception as e:
        print(f"cannot lower/keys unavailable here: {e}")
        return 3
    print(f"sort   key shift0={ks0[0][:16]} shift10={ks1[0][:16]} "
          f"module {ks0[1]}/{ks1[1]}")
    print(f"pallas key shift0={kp0[0][:16]} shift10={kp1[0][:16]} "
          f"module {kp0[1]}/{kp1[1]}")
    sort_stable = ks0[0] == ks1[0]
    pallas_drifts = kp0[0] != kp1[0]
    if sort_stable and pallas_drifts:
        print("REPRODUCED: plain-XLA key stable under a 10-line source "
              "shift; Pallas key drifts (Mosaic payload embeds source "
              "locations the cache-key canonicalizer cannot strip).")
        return 0
    print("NOT reproduced (sort_stable=%s pallas_drifts=%s) — if on a "
          "TPU backend, the upstream behavior may have been fixed."
          % (sort_stable, pallas_drifts))
    return 2


if __name__ == "__main__":
    sys.exit(main())
