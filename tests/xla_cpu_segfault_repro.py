"""Minimal repro hunt for the upstream XLA-CPU backend_compile segfault.

Context: the full ~350-test suite deterministically segfaults when run
in ONE process (XLA CPU crashes inside backend_compile after ~300 prior
compiles; the same test passes standalone; reproduced with the
persistent compilation cache on and off). `tests/run_full_suite.sh`
works around it with per-file processes. This script reduces the
trigger to its skeleton: compile N DISTINCT small programs back to back
on the CPU backend and report how far it gets.

Standalone diagnostic, NOT a test (it exists to crash):

    JAX_PLATFORMS=cpu python tests/xla_cpu_segfault_repro.py [N]

Exit 0 = no crash after N compiles (default 600); a segfault kills the
process mid-count, and the last printed count is the repro threshold.
Each program is made unique by an arithmetic constant so every
iteration is a genuine backend_compile, and the mix (sort + reduce +
gather) mirrors what the test files actually compile. ``--pallas``
additionally interleaves a distinct interpret-mode Pallas program per
iteration.

Findings (this round's runs): 600 plain compiles do NOT crash, and 400
compiles with Pallas interleaved do NOT crash either — the suite's
trigger additionally involves its heavier programs (multi-megabyte
sort/scan buffers across many shapes), so the reduction is narrowed to
"compile count alone is insufficient; program size/mix matters". The
operational workaround remains ``run_full_suite.sh``'s per-file
processes (362/362 green).
"""

from __future__ import annotations

import sys


def main(n: int = 600, pallas: bool = False) -> int:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    for i in range(n):
        k = i + 2

        def prog(x, _k=k):
            s = jax.lax.sort((x + _k, x * 2), num_keys=1)[0]
            g = jnp.take(s, jnp.clip(x % _k, 0, x.shape[0] - 1))
            return jnp.sum(g, dtype=jnp.int64) + jnp.max(s)

        out = jax.jit(prog)(jnp.arange(256 + (i % 7), dtype=jnp.int32))
        _ = int(out)
        if pallas:
            # interleave a distinct interpret-mode Pallas program per
            # iteration — the suite's slow tests compile hundreds of
            # these, and the crash only reproduces with them in the mix
            from jax.experimental import pallas as pl

            def kern(x_ref, o_ref, _k=k):
                o_ref[...] = x_ref[...] * 2.0 + float(_k)

            @jax.jit
            def pprog(x):
                return pl.pallas_call(
                    kern,
                    out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
                    interpret=True,
                )(x)

            _ = float(
                jnp.sum(pprog(jnp.ones((8, 128), jnp.float32)))
            )
        if (i + 1) % 50 == 0:
            print(f"{i + 1} compiles OK", flush=True)
    print(f"no crash after {n} distinct compiles (pallas={pallas})")
    return 0


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--pallas"]
    sys.exit(
        main(
            int(args[0]) if args else 600,
            pallas="--pallas" in sys.argv,
        )
    )
