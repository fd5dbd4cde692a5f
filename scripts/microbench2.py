"""Micro-benchmarks 2: gelu variants, LN cost, remat policies."""

import sys
import time
import dataclasses

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")


def timeit(fn, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn()
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    return (time.perf_counter() - t0) / iters


def main():
    B, N, D = 64, 785, 384
    M = B * N
    dt = jnp.bfloat16
    k = jax.random.PRNGKey(0)
    a = jax.random.normal(k, (M, D), dt)
    w = jax.random.normal(k, (D, 4 * D), dt)
    w2 = jax.random.normal(k, (4 * D, D), dt)

    def chain(act):
        @jax.jit
        def f(a, w, w2):
            def body(x, _):
                return act(x @ w) @ w2, None

            out, _ = jax.lax.scan(body, a, None, length=12)
            return out

        return f

    for name, act in [
        ("erf gelu", lambda y: jax.nn.gelu(y, approximate=False)),
        ("tanh gelu", lambda y: jax.nn.gelu(y, approximate=True)),
        ("erf gelu f32", lambda y: jax.nn.gelu(y.astype(jnp.float32), approximate=False).astype(jnp.bfloat16)),
        ("identity", lambda y: y),
    ]:
        f = chain(act)
        t = timeit(lambda: f(a, w, w2))
        print(f"mlp x12 {name:14s}: {t*1e3:7.2f} ms")

    # LayerNorm cost x24
    from dinomc_tpu.models.vit import layer_norm

    tokens = jax.random.normal(k, (B, N, D), dt)
    sc = jnp.ones((D,))
    bi = jnp.zeros((D,))

    @jax.jit
    def ln24(x):
        def body(x, _):
            return layer_norm(x, sc, bi, 1e-6), None

        out, _ = jax.lax.scan(body, x, None, length=24)
        return out

    t = timeit(lambda: ln24(tokens))
    print(f"LN x24:              {t*1e3:7.2f} ms")

    # remat policy comparison on full blocks
    from dinomc_tpu.models.vit import vit_small, init_vit, _scan_blocks

    cfg = vit_small(patch_size=8, img_size=224)
    params = init_vit(jax.random.PRNGKey(0), cfg)

    for label, cfg_i in [
        ("full remat", cfg),
        ("no remat", dataclasses.replace(cfg, remat=False)),
    ]:
        @jax.jit
        def g(params, tokens, cfg_i=cfg_i):
            def loss(p):
                out, _ = _scan_blocks(p, tokens, cfg_i, None, True, False)
                return jnp.sum(out.astype(jnp.float32) ** 2)

            return jax.grad(loss)(params)

        try:
            t = timeit(lambda: g(params, tokens), iters=10)
            print(f"12 blocks f+b {label}: {t*1e3:7.2f} ms")
        except Exception as e:
            print(f"12 blocks f+b {label}: FAILED {str(e)[:120]}")


if __name__ == "__main__":
    main()
