"""Attention kernel variants bench: find headroom beyond the current
head-sliced fused kernel (39 TF/s at B=64, N=785->896, h=6, d=64)."""

import functools
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

LANE = 128
LOG2E = 1.4426950408889634


def timeit(fn, iters=30, warmup=3):
    for _ in range(warmup):
        out = fn()
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters


def _spec(Np, lanes):
    return pl.BlockSpec((1, Np, lanes), lambda b, f: (b, 0, f), memory_space=pltpu.VMEM)


# --- v0: current production kernel ---------------------------------------
from dinomc_tpu.ops.pallas.attention import _fused_attention


# --- v1: exp2 with folded scale -------------------------------------------
def _kern_exp2(q_ref, k_ref, v_ref, o_ref, *, scale, n_valid, d, heads):
    for j in range(heads):
        sl = slice(j * d, (j + 1) * d)
        q = q_ref[0][:, sl]
        k = k_ref[0][:, sl]
        v = v_ref[0][:, sl]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * (scale * LOG2E)
        if n_valid < s.shape[-1]:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < n_valid, s, -1e30)
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp2(s)
        p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(q.dtype)
        o_ref[0, :, sl] = jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(o_ref.dtype)


# --- v2: stage all heads' scores first (scheduler freedom) ----------------
def _kern_staged(q_ref, k_ref, v_ref, o_ref, *, scale, n_valid, d, heads):
    ss = []
    for j in range(heads):
        sl = slice(j * d, (j + 1) * d)
        s = jax.lax.dot_general(
            q_ref[0][:, sl], k_ref[0][:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * (scale * LOG2E)
        if n_valid < s.shape[-1]:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < n_valid, s, -1e30)
        ss.append(s)
    ps = []
    for s in ss:
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp2(s)
        ps.append((e / jnp.sum(e, axis=-1, keepdims=True)))
    for j, p in enumerate(ps):
        sl = slice(j * d, (j + 1) * d)
        o_ref[0, :, sl] = jax.lax.dot_general(
            p.astype(q_ref.dtype), v_ref[0][:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)


# --- v3: whole-batch-row grid over B only, all 6 heads per program --------
def _kern_allheads(q_ref, k_ref, v_ref, o_ref, *, scale, n_valid, d, nheads):
    for j in range(nheads):
        sl = slice(j * d, (j + 1) * d)
        q = q_ref[0][:, sl]
        k = k_ref[0][:, sl]
        v = v_ref[0][:, sl]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * (scale * LOG2E)
        if n_valid < s.shape[-1]:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < n_valid, s, -1e30)
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp2(s)
        p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(q.dtype)
        o_ref[0, :, sl] = jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(o_ref.dtype)


# --- v5: staged with plain exp --------------------------------------------
def _kern_staged_exp(q_ref, k_ref, v_ref, o_ref, *, scale, n_valid, d, heads):
    ss = []
    for j in range(heads):
        sl = slice(j * d, (j + 1) * d)
        s = jax.lax.dot_general(
            q_ref[0][:, sl], k_ref[0][:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        if n_valid < s.shape[-1]:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < n_valid, s, -1e30)
        ss.append(s)
    ps = []
    for s in ss:
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        ps.append(e / jnp.sum(e, axis=-1, keepdims=True))
    for j, p in enumerate(ps):
        sl = slice(j * d, (j + 1) * d)
        o_ref[0, :, sl] = jax.lax.dot_general(
            p.astype(q_ref.dtype), v_ref[0][:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)


# --- v4: bf16 exp ---------------------------------------------------------
def _kern_bf16exp(q_ref, k_ref, v_ref, o_ref, *, scale, n_valid, d, heads):
    for j in range(heads):
        sl = slice(j * d, (j + 1) * d)
        q = q_ref[0][:, sl]
        k = k_ref[0][:, sl]
        v = v_ref[0][:, sl]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * (scale * LOG2E)
        if n_valid < s.shape[-1]:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < n_valid, s, -1e30)
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp2(s.astype(jnp.bfloat16))
        denom = jnp.sum(e.astype(jnp.float32), axis=-1, keepdims=True)
        p = (e.astype(jnp.float32) / denom).astype(q.dtype)
        o_ref[0, :, sl] = jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(o_ref.dtype)


def run_variant(name, kern_fn, q, k, v, scale, n_valid, d, lanes):
    B, Np, F = q.shape
    heads = lanes // d
    kern = functools.partial(kern_fn, scale=scale, n_valid=n_valid, d=d, heads=heads) \
        if "allheads" not in name else functools.partial(
            kern_fn, scale=scale, n_valid=n_valid, d=d, nheads=F // d)
    grid = (B, F // lanes)

    f = jax.jit(lambda q, k, v: pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid=grid,
        in_specs=[_spec(Np, lanes)] * 3,
        out_specs=_spec(Np, lanes),
    )(q, k, v))
    t = timeit(lambda: f(q, k, v))
    fl = 4 * B * (F // d) * Np * Np * d
    print(f"{name:24s}: {t*1e3:7.3f} ms  {fl/t/1e12:6.1f} TF/s")
    return f


def main():
    B, N, h, d = 64, 785, 6, 64
    Np = 896
    F = h * d
    k0 = jax.random.PRNGKey(0)
    q = jax.random.normal(k0, (B, Np, F), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (B, Np, F), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, Np, F), jnp.bfloat16)
    scale = 0.125

    # v0 production
    f0 = jax.jit(lambda q, k, v: _fused_attention(q, k, v, scale, N, d))
    t = timeit(lambda: f0(q, k, v))
    fl = 4 * B * h * Np * Np * d
    print(f"{'v0 production':24s}: {t*1e3:7.3f} ms  {fl/t/1e12:6.1f} TF/s")
    o0 = f0(q, k, v)

    f1 = run_variant("v1 exp2", _kern_exp2, q, k, v, scale, N, d, LANE)
    f2 = run_variant("v2 staged", _kern_staged, q, k, v, scale, N, d, LANE)
    f3 = run_variant("v3 allheads", _kern_allheads, q, k, v, scale, N, d, F)
    f4 = run_variant("v4 bf16exp", _kern_bf16exp, q, k, v, scale, N, d, LANE)

    f5 = run_variant("v5 staged+exp", _kern_staged_exp, q, k, v, scale, N, d, LANE)

    # scan x12 to amortize dispatch
    def scan12(f):
        @jax.jit
        def g(q, k, v):
            def body(x, _):
                return f(x, k, v).astype(x.dtype), None
            out, _ = jax.lax.scan(body, q, None, length=12)
            return out
        return g

    for name, f in [("v0", f0), ("v2", f2), ("v5", f5)]:
        g = scan12(f)
        t = timeit(lambda: g(q, k, v), iters=10)
        fl = 12 * 4 * B * h * Np * Np * d
        print(f"scan12 {name:17s}: {t*1e3:7.3f} ms  {fl/t/1e12:6.1f} TF/s")

    import numpy as np
    for name, f in [("v1", f1), ("v2", f2), ("v3", f3), ("v4", f4), ("v5", f5)]:
        o = f(q, k, v)
        err = float(jnp.max(jnp.abs(o.astype(jnp.float32) - o0.astype(jnp.float32))))
        print(f"  max|{name}-v0| = {err:.5f}")


if __name__ == "__main__":
    main()
