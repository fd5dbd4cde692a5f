"""Pure-GEMM probe: does merging per-bucket M into one GEMM help when the
per-bucket programs run back-to-back in ONE jit (as the real step does)?

The r3 probe measured SEPARATE jits per M (6.3 -> 35.6 TF/s going
7.9k -> 56k). But inside one program XLA pipelines consecutive small GEMMs'
weight loads and HBM traffic, so the realizable merge gain may be far
smaller. This measures a 12-layer qkv/proj/fc1/fc2 chain (ViT-S shapes):
  split : each layer applies its 4 GEMMs to every bucket separately
  merged: each layer applies its 4 GEMMs to the concatenated (M, D) stream
with identical math (row-independent), no attention, no slicing.
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

D, L = 384, 12
B = 10
BUCKETS = [2 * B * 785, B * 530, B * 401, B * 325, B * 226, B * 170, B * 101]


def make_params(key):
    ks = jax.random.split(key, 4)
    s = lambda *sh: jax.random.normal(ks[0], sh, jnp.bfloat16) * 0.02
    return {
        "qkv": s(L, D, 3 * D), "proj": s(L, D, D),
        "fc1": s(L, D, 4 * D), "fc2": s(L, 4 * D, D),
    }


def layer(x, p):
    q = x @ p["qkv"]
    x = x + q[..., :D] @ p["proj"]
    h = jax.nn.gelu(x @ p["fc1"], approximate=True)
    return x + h @ p["fc2"]


def chain(x, params):
    def body(x, p):
        return layer(x, p), None
    y, _ = jax.lax.scan(body, x, params)
    return y


@jax.jit
def run_split(xs, params):
    return jnp.stack([chain(x, params)[0, 0].astype(jnp.float32)
                      for x in xs]).sum()


@jax.jit
def run_merged(xm, params):
    return chain(xm, params)[0, 0].astype(jnp.float32)


def timeit(fn, *args, n=10):
    float(fn(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        float(out)
        best = min(best, (time.perf_counter() - t0) / n)
    return best * 1e3


@jax.jit
def run_one(x, params):
    return chain(x, params)[0, 0].astype(jnp.float32)


def main():
    key = jax.random.PRNGKey(0)
    params = make_params(key)
    xs = [jax.random.normal(jax.random.fold_in(key, i), (m, D), jnp.bfloat16)
          for i, m in enumerate(BUCKETS)]
    xm = jnp.concatenate(xs, axis=0)
    M = sum(BUCKETS)
    flops = 2 * M * L * (D * 3 * D + D * D + D * 4 * D + 4 * D * D)

    t_split = timeit(run_split, xs, params)
    t_merged = timeit(run_merged, xm, params)

    # r3-probe conditions: one dispatch per bucket (separate jit calls) —
    # each dependent chain serializes alone and pays relay dispatch per
    # bucket. This is the configuration that made small-M look 2-5x slower.
    def sep(xs, params):
        return jnp.stack([run_one(x, params) for x in xs]).sum()

    t_sep = timeit(sep, xs, params)

    print(f"M total {M}  model TFLOPs/pass {flops/1e12:.3f}")
    print(f"separate jits (7 dispatches)     : {t_sep:7.2f} ms  "
          f"{flops/t_sep/1e9:6.1f} TF/s")
    print(f"split  (7 bucket chains, one jit): {t_split:7.2f} ms  "
          f"{flops/t_split/1e9:6.1f} TF/s")
    print(f"merged (one {M}-row chain)       : {t_merged:7.2f} ms  "
          f"{flops/t_merged/1e9:6.1f} TF/s")


if __name__ == "__main__":
    main()
