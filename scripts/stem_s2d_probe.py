"""Probe: space-to-depth rewrite of the ResNet stem on TPU.

The classic MLPerf-era TPU optimization turns the 7x7/s2 stem conv on 3
input channels (2.3% MXU lane occupancy on the contraction) into a 4x4/s1
conv on a 2x2-space-to-depth'd 12-channel input. Verified numerically
exact here (max abs err 1.4e-6 f32), then timed at the DINO-MC bench crop
set (B=24, 2x224 globals + 6 locals), fwd+bwd:

    7x7/s2 direct : 4.25 ms
    s2d + 4x4/s1  : 5.00 ms        (v5e, 2026-08-21)

REFUTED on this chip: XLA:TPU's conv lowering already handles the
thin-input stem well, and the whole stem is ~7% of the 61 ms RN50 step —
the RN50-vs-WRN MFU gap (0.254 vs 0.469, docs/performance.md) is the
narrow early-stage channel widths of the architecture itself.

Run: python scripts/stem_s2d_probe.py
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp


def main():
    k = jax.random.normal(jax.random.PRNGKey(0), (7, 7, 3, 64), jnp.float32) * 0.1
    B = 24
    sizes = [(2 * B, 224)] + [(B, s) for s in (184, 164, 144, 124, 104, 84)]
    xs = [
        jax.random.uniform(
            jax.random.fold_in(jax.random.PRNGKey(1), i), (b, s, s, 3),
            jnp.float32,
        )
        for i, (b, s) in enumerate(sizes)
    ]

    def old_stem(k, xs):
        tot = 0.0
        for x in xs:
            y = jax.lax.conv_general_dilated(
                x.astype(jnp.bfloat16), k.astype(jnp.bfloat16), (2, 2),
                [(3, 3), (3, 3)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            tot = tot + y.astype(jnp.float32).sum()
        return tot

    def s2d_stem(k, xs):
        # kernel 7->8 with a leading zero row/col, regrouped to (4,4,12,64)
        k8 = jnp.pad(k, ((1, 0), (1, 0), (0, 0), (0, 0)))
        ks = (
            k8.reshape(4, 2, 4, 2, 3, 64)
            .transpose(0, 2, 1, 3, 4, 5)
            .reshape(4, 4, 12, 64)
            .astype(jnp.bfloat16)
        )
        tot = 0.0
        for x in xs:
            Ho = -(-x.shape[1] // 2)
            xp = jnp.pad(
                x,
                ((0, 0), (4, 4 + x.shape[1] % 2), (4, 4 + x.shape[2] % 2),
                 (0, 0)),
            )
            b, H, W, C = xp.shape
            xsd = (
                xp.reshape(b, H // 2, 2, W // 2, 2, C)
                .transpose(0, 1, 3, 2, 4, 5)
                .reshape(b, H // 2, W // 2, 4 * C)
            )
            y = jax.lax.conv_general_dilated(
                xsd.astype(jnp.bfloat16), ks, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )[:, :Ho, :Ho]
            tot = tot + y.astype(jnp.float32).sum()
        return tot

    # numeric equivalence at one size (f32)
    ref = jax.lax.conv_general_dilated(
        xs[1][:2], k, (2, 2), [(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    k8 = jnp.pad(k, ((1, 0), (1, 0), (0, 0), (0, 0)))
    ks = (
        k8.reshape(4, 2, 4, 2, 3, 64).transpose(0, 2, 1, 3, 4, 5)
        .reshape(4, 4, 12, 64)
    )
    x = xs[1][:2]
    xp = jnp.pad(x, ((0, 0), (4, 4), (4, 4), (0, 0)))
    b, H, W, C = xp.shape
    xsd = (
        xp.reshape(b, H // 2, 2, W // 2, 2, C).transpose(0, 1, 3, 2, 4, 5)
        .reshape(b, H // 2, W // 2, 4 * C)
    )
    out = jax.lax.conv_general_dilated(
        xsd, ks, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )[:, : ref.shape[1], : ref.shape[2]]
    print("equivalence max abs err:", float(jnp.abs(ref - out).max()))

    def timeit(fn, n=10):
        g = jax.jit(jax.grad(fn))
        out = g(k, xs)
        float(out.reshape(-1)[0])
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(n):
                out = g(k, xs)
            float(out.reshape(-1)[0])
            best = min(best, (time.perf_counter() - t0) / n)
        return best * 1e3

    print(f"stem fwd+bwd all crops  7x7s2: {timeit(old_stem):6.2f} ms")
    print(f"stem fwd+bwd all crops  s2d  : {timeit(s2d_stem):6.2f} ms")


if __name__ == "__main__":
    main()
