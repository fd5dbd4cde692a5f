"""Minimal repro: XLA:CPU segfault under accumulated single-process JIT state.

Symptom (jax/jaxlib 0.9.0, Linux x86-64, 1-core container): a pytest run
that compiles several hundred DISTINCT XLA:CPU executables in one process
segfaults during a later large grad-graph compile (~180 tests in for this
repo's suite), while every module passes in isolation. Clearing compiled
executables between modules (tests/conftest.py::_clear_jax_caches_between_
modules) makes the suite stable; DINOMC_NO_CACHE_CLEAR=1 restores the
crash for investigation.

This script reproduces the shape of that workload without pytest: it
compiles a stream of distinct value_and_grad programs (unique static
shapes force fresh compilations) and never clears caches. On the affected
setup it dies with SIGSEGV (rc -11) partway through; with --clear-every N
(the conftest mitigation) it runs to completion.

Usage:
    JAX_PLATFORMS=cpu python scripts/repro_xlacpu_segfault.py [--programs 600]
    JAX_PLATFORMS=cpu python scripts/repro_xlacpu_segfault.py --clear-every 40

Disposition note (2026-08-20): upstream filing is not possible from this
container (no network egress); the repro is pinned here instead. Root
cause is in XLA:CPU/LLVM-ORC JIT resource accumulation, not in this
repo's code: the crash site is inside compilation (not execution), is
load-order dependent, and disappears when live executables are bounded.
The per-module cache clear in tests/conftest.py is the production
mitigation and costs ~8% suite wall time (recompiled fixtures).
"""

import argparse
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--programs", type=int, default=600,
                    help="distinct grad programs to compile")
    ap.add_argument("--clear-every", type=int, default=0,
                    help="jax.clear_caches() every N programs (0 = never; "
                         "the conftest mitigation uses per-module ~ 20-40)")
    ap.add_argument("--width", type=int, default=96,
                    help="base layer width (bigger = fewer programs needed)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")

    def make_program(i: int):
        """A distinct-shaped 3-layer MLP grad program per i."""
        w = args.width + (i % 17)  # unique static shapes => fresh compile
        h = args.width + ((i * 7) % 23)

        def loss(params, x):
            a = jnp.tanh(x @ params["w0"])
            b = jax.nn.gelu(a @ params["w1"])
            return jnp.sum((b @ params["w2"]) ** 2)

        key = jax.random.PRNGKey(i)
        k0, k1, k2, kx = jax.random.split(key, 4)
        params = {
            "w0": jax.random.normal(k0, (w, h)) * 0.1,
            "w1": jax.random.normal(k1, (h, h)) * 0.1,
            "w2": jax.random.normal(k2, (h, 4)) * 0.1,
        }
        x = jax.random.normal(kx, (8, w))
        return jax.jit(jax.value_and_grad(loss)), params, x

    for i in range(args.programs):
        fn, params, x = make_program(i)
        val, grads = fn(params, x)
        float(val)  # force execution
        if i % 25 == 0:
            print(f"compiled+ran program {i}", flush=True)
        if args.clear_every and i and i % args.clear_every == 0:
            jax.clear_caches()
    print("completed without crash")
    return 0


if __name__ == "__main__":
    sys.exit(main())
