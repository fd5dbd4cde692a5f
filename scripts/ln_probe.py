"""Probe: is a bandwidth-lean LayerNorm worth anything on this chip?

After the r5 BatchNorm lever (one fused read for both moments, normalize
folded to a bf16 x*a+b) bought +8.6% on RN50 and +6.8% on WRN
(docs/performance.md), LayerNorm is the one elementwise-norm form still
using the classic two-pass f32 shape (mean, then var, then f32 normalize
-> cast). The ViT step books LN at 3.3 ms of 89.4 (step_dissect, B=10),
and the max-save remat policy recomputes every LN in the backward, so the
true exposure is larger. This probe times chained LNs (forward and
fwd+bwd) in both forms at the bench operating shapes:

  - ViT-S/8 global crop: (10*785, 384)
  - Swin-T stage 1:      (16*3136, 96)   (highest token count, thinnest D)
  - XCiT p8 global:      (16*784, 384)

Chains of 24 (12 blocks x 2 norms) amortize relay dispatch latency the
same way swin_kernel_micro does; single-call timings at these sizes are
dispatch-dominated.
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")


def timeit(fn, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn()
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters


def ln_classic(x, scale, bias, eps):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * scale + bias
    return y.astype(x.dtype)


def ln_lean(x, scale, bias, eps):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    mean2 = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
    var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
    a = jax.lax.rsqrt(var + eps) * scale
    b = bias - mean * a
    return (x * a.astype(x.dtype) + b.astype(x.dtype)).astype(x.dtype)


def chain(fn, depth):
    def run(x, scale, bias):
        def body(t, _):
            return fn(t, scale, bias, 1e-6), None

        out, _ = jax.lax.scan(body, x, None, length=depth)
        return out

    return jax.jit(run)


def chain_grad(fn, depth):
    def run(x, scale, bias):
        def loss(x):
            def body(t, _):
                return fn(t, scale, bias, 1e-6), None

            out, _ = jax.lax.scan(body, x, None, length=depth)
            return jnp.sum(out.astype(jnp.float32) ** 2)

        return jax.grad(loss)(x)

    return jax.jit(run)


def main():
    depth = 24
    shapes = [
        ("vit-global (7850, 384)", (7850, 384)),
        ("swin-s1 (50176, 96)", (50176, 96)),
        ("xcit-p8 (12544, 384)", (12544, 384)),
    ]
    k = jax.random.PRNGKey(0)
    for name, (m, d) in shapes:
        x = jax.random.normal(k, (m, d), jnp.bfloat16)
        scale = jnp.ones((d,), jnp.float32)
        bias = jnp.zeros((d,), jnp.float32)

        # numerics check vs classic f32 form
        ya = ln_classic(x, scale, bias, 1e-6).astype(jnp.float32)
        yb = ln_lean(x, scale, bias, 1e-6).astype(jnp.float32)
        err = float(jnp.max(jnp.abs(ya - yb)))

        rows = {}
        for label, fn in [("classic", ln_classic), ("lean", ln_lean)]:
            f = chain(fn, depth)
            g = chain_grad(fn, depth)
            tf = timeit(lambda: f(x, scale, bias))
            tg = timeit(lambda: g(x, scale, bias), iters=10)
            rows[label] = (tf, tg)
        cf, cg = rows["classic"]
        lf, lg = rows["lean"]
        print(
            f"{name}: classic fwd {cf*1e3:6.3f} ms  f+b {cg*1e3:6.3f} | "
            f"lean fwd {lf*1e3:6.3f} ({cf/lf:4.2f}x)  f+b {lg*1e3:6.3f} "
            f"({cg/lg:4.2f}x) | max abs err {err:.2e}"
        )


if __name__ == "__main__":
    main()
