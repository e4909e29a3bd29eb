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
gather) mirrors what the test files actually compile. If this skeleton
does not crash on its own, the reduction continues by appending the
Pallas interpret-mode programs the slow tests build (the operational
workaround meanwhile is run_full_suite.sh's per-file processes).
"""

from __future__ import annotations

import sys


def main(n: int = 600) -> int:
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
        if (i + 1) % 50 == 0:
            print(f"{i + 1} compiles OK", flush=True)
    print(f"no crash after {n} distinct compiles")
    return 0


if __name__ == "__main__":
    sys.exit(main(int(sys.argv[1]) if len(sys.argv) > 1 else 600))
