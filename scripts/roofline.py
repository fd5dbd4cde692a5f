"""Matmul roofline probe at DINO-MC's actual shapes (real chip).

Prints device kind and achieved TFLOP/s for the ViT-S hot matmul shapes,
to quantify remaining headroom vs the full-step throughput.
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")


def bench_matmul(M, K, N, iters=30):
    a = jax.random.normal(jax.random.PRNGKey(0), (M, K), jnp.bfloat16)
    b = jax.random.normal(jax.random.PRNGKey(1), (K, N), jnp.bfloat16)

    @jax.jit
    def f(a, b):
        return a @ b

    out = f(a, b)
    float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(a, b)
    float(jnp.sum(out.astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / iters
    return 2 * M * K * N / dt / 1e12


def main():
    d = jax.devices()[0]
    print("device:", d.device_kind, d.platform)
    B, N = 32, 785
    shapes = [
        ("qkv global (B*N,384)x(384,1152)", B * N, 384, 1152),
        ("proj (B*N,384)x(384,384)", B * N, 384, 384),
        ("mlp fc1 (B*N,384)x(384,1536)", B * N, 384, 1536),
        ("mlp fc2 (B*N,1536)x(1536,384)", B * N, 1536, 384),
        ("head last (256,256)x(256,65536)", 256, 256, 65536),
        ("big square (8192,8192)x(8192,8192)", 8192, 8192, 8192),
    ]
    for name, M, K, Nn in shapes:
        tf = bench_matmul(M, K, Nn)
        print(f"{name:42s} {tf:7.1f} TF/s")


if __name__ == "__main__":
    main()
