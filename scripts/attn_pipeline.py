"""Query-chunked software-pipelined attention variants (VERDICT r02 #4).

The production fused kernel (ops/pallas/attention.py) stages per-head
phases (all scores -> all softmaxes -> all PV matmuls) inside one grid
program; docs/performance.md measures it at ~21% effective matmul
utilization — the N^2 softmax VPU phases serialize against the two small
MXU matmuls. These variants chop the query dimension into chunks and emit
the (score -> softmax -> PV) chain per (head, chunk) task in a skewed
order, giving the Mosaic list scheduler 2-3 independent chains at every
point so chunk t's VPU softmax can overlap chunk t+1's MXU score matmul
and chunk t-1's PV matmul.

Correctness: `python scripts/attn_pipeline.py --check` (CPU interpret).
Bench (real chip): `python scripts/attn_pipeline.py` — fwd and 12-layer
scan timings per variant at the bench operating shapes.
"""

import argparse
import functools
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

LANE = 128
INTERPRET = False  # set True for CPU correctness checks


def timeit(fn, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn()
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters


def _spec(Np):
    return pl.BlockSpec((1, Np, LANE), lambda b, f: (b, 0, f),
                        memory_space=pltpu.VMEM)


def _col_mask(s, n_valid, row0, boundary):
    """Mask padded key columns (and cross-segment blocks when packing)."""
    if n_valid >= s.shape[-1] and not boundary:
        return s
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    mask = col < n_valid
    if boundary:
        row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + row0
        mask &= (col < boundary) == (row < boundary)
    return jnp.where(mask, s, -1e30)


def _chunked_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, n_valid, d, heads,
                    chunk, skew, boundary=0):
    """(head, query-chunk) tasks; ``skew`` = pipeline depth offset.

    skew=0 emits each task's score/softmax/PV back-to-back (scheduler must
    find overlap on its own); skew=1 emits s(t+1) before p(t) before
    o(t-1) — an explicit 2-deep software pipeline.
    """
    Np = q_ref.shape[1]
    nch = Np // chunk
    tasks = [(j, c) for j in range(heads) for c in range(nch)]
    sl = [slice(j * d, (j + 1) * d) for j in range(heads)]
    n = len(tasks)
    s_buf, p_buf = {}, {}

    def emit_s(t):
        j, c = tasks[t]
        q = q_ref[0][c * chunk : (c + 1) * chunk, sl[j]]
        k = k_ref[0][:, sl[j]]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        s_buf[t] = _col_mask(s, n_valid, c * chunk, boundary)

    def emit_p(t):
        s = s_buf.pop(t)
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        p_buf[t] = e / jnp.sum(e, axis=-1, keepdims=True)

    def emit_o(t):
        j, c = tasks[t]
        p = p_buf.pop(t).astype(q_ref.dtype)
        o_ref[0, c * chunk : (c + 1) * chunk, sl[j]] = jax.lax.dot_general(
            p, v_ref[0][:, sl[j]], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)

    for t in range(n + 2 * skew) if skew else range(n):
        if skew:
            if t < n:
                emit_s(t)
            if skew <= t < n + skew:
                emit_p(t - skew)
            if 2 * skew <= t:
                emit_o(t - 2 * skew)
        else:
            emit_s(t)
            emit_p(t)
            emit_o(t)


def chunked_attention(q, k, v, scale, n_valid, d, chunk=128, skew=1,
                      boundary=0, interpret=None):
    if interpret is None:
        interpret = INTERPRET
    B, Np, F = q.shape
    heads = F // d
    kern = functools.partial(
        _chunked_kernel, scale=scale, n_valid=n_valid, d=d,
        heads=LANE // d, chunk=chunk, skew=skew, boundary=boundary,
    )
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid=(B, F // LANE),
        in_specs=[_spec(Np)] * 3,
        out_specs=_spec(Np),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * B * heads * Np * Np * d,
            bytes_accessed=4 * B * Np * F * 2,
            transcendentals=B * heads * Np * Np,
        ),
    )(q, k, v)


def _chunked_bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref,
                        *, scale, n_valid, d, heads, chunk, skew, boundary=0):
    """Chunked backward: recompute probs per (head, query-chunk), then the
    five gradient matmuls; dK/dV accumulate across a head's chunks in f32
    VMEM. Skewed emission overlaps chunk t's softmax recompute (VPU) with
    chunk t-1's gradient matmuls (MXU)."""
    Np = q_ref.shape[1]
    nch = Np // chunk
    sl = [slice(j * d, (j + 1) * d) for j in range(heads)]
    tasks = [(j, c) for j in range(heads) for c in range(nch)]
    n = len(tasks)
    p_buf, dkv_acc = {}, {}

    def emit_p(t):
        j, c = tasks[t]
        q = q_ref[0][c * chunk : (c + 1) * chunk, sl[j]]
        k = k_ref[0][:, sl[j]]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        s = _col_mask(s, n_valid, c * chunk, boundary)
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        row0 = c * chunk
        if n_valid < Np and row0 + chunk > n_valid:
            # padded query rows would inject garbage into dK/dV
            row = jax.lax.broadcasted_iota(jnp.int32, p.shape, 0) + row0
            p = jnp.where(row < n_valid, p, 0.0)
        p_buf[t] = p

    def emit_grads(t):
        j, c = tasks[t]
        cs = slice(c * chunk, (c + 1) * chunk)
        q = q_ref[0][cs, sl[j]]
        k = k_ref[0][:, sl[j]]
        v = v_ref[0][:, sl[j]]
        do = do_ref[0][cs, sl[j]]
        p = p_buf.pop(t)
        pb = p.astype(q.dtype)
        dv = jax.lax.dot_general(
            pb, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        delta = jnp.sum(p * dp, axis=-1, keepdims=True)
        ds = (p * (dp - delta) * scale).astype(q.dtype)
        dq = jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dk = jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dq_ref[0, cs, sl[j]] = dq.astype(dq_ref.dtype)
        if c == 0:
            dkv_acc[j] = (dk, dv)
        else:
            dkv_acc[j] = (dkv_acc[j][0] + dk, dkv_acc[j][1] + dv)
        if c == nch - 1:
            dk_a, dv_a = dkv_acc.pop(j)
            dk_ref[0, :, sl[j]] = dk_a.astype(dk_ref.dtype)
            dv_ref[0, :, sl[j]] = dv_a.astype(dv_ref.dtype)

    for t in range(n + skew) if skew else range(n):
        if skew:
            if t < n:
                emit_p(t)
            if t >= skew:
                emit_grads(t - skew)
        else:
            emit_p(t)
            emit_grads(t)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8))
def chunked_mha(q, k, v, scale, n_valid, d, chunk=128, skew=1, boundary=0):
    return chunked_attention(q, k, v, scale, n_valid, d, chunk, skew, boundary)


def _chunked_mha_fwd(q, k, v, scale, n_valid, d, chunk, skew, boundary):
    return chunked_mha(q, k, v, scale, n_valid, d, chunk, skew, boundary), (q, k, v)


def _chunked_mha_bwd(scale, n_valid, d, chunk, skew, boundary, res, do):
    q, k, v = res
    B, Np, F = q.shape
    heads = F // d
    kern = functools.partial(
        _chunked_bwd_kernel, scale=scale, n_valid=n_valid, d=d,
        heads=LANE // d, chunk=chunk, skew=skew, boundary=boundary,
    )
    dq, dk, dv = pl.pallas_call(
        kern,
        out_shape=[jax.ShapeDtypeStruct(q.shape, q.dtype)] * 3,
        grid=(B, F // LANE),
        in_specs=[_spec(Np)] * 4,
        out_specs=[_spec(Np)] * 3,
        interpret=INTERPRET,
        cost_estimate=pl.CostEstimate(
            flops=10 * B * heads * Np * Np * d,
            bytes_accessed=7 * B * Np * F * 2,
            transcendentals=B * heads * Np * Np,
        ),
    )(q, k, v, do.astype(q.dtype))
    return dq, dk, dv


chunked_mha.defvjp(_chunked_mha_fwd, _chunked_mha_bwd)


# ---------------------------------------------------------------- check --
def dense_ref(q, k, v, scale, n_valid, d, boundary=0):
    B, Np, F = q.shape
    h = F // d
    qh = q.reshape(B, Np, h, d).astype(jnp.float32)
    kh = k.reshape(B, Np, h, d).astype(jnp.float32)
    vh = v.reshape(B, Np, h, d).astype(jnp.float32)
    s = jnp.einsum("bnhd,bmhd->bhnm", qh, kh) * scale
    col = jnp.arange(Np)[None, :]
    mask = col < n_valid
    if boundary:
        row = jnp.arange(Np)[:, None]
        mask = mask & ((col < boundary) == (row < boundary))
    s = jnp.where(mask[None, None], s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhnm,bmhd->bnhd", p, vh.astype(p.dtype))
    return o.reshape(B, Np, F)


def check():
    key = jax.random.PRNGKey(0)
    B, N, d = 2, 256, 64
    F = 128
    for n_valid, boundary in [(256, 0), (200, 0), (256, 144), (220, 144)]:
        kq, kk, kv = jax.random.split(key, 3)
        q = jax.random.normal(kq, (B, N, F), jnp.float32)
        k = jax.random.normal(kk, (B, N, F), jnp.float32)
        v = jax.random.normal(kv, (B, N, F), jnp.float32)
        ref = dense_ref(q, k, v, 0.125, n_valid, d, boundary)[:, :n_valid]
        for chunk in (64, 128):
            for skew in (0, 1, 2):
                out = chunked_attention(
                    q, k, v, 0.125, n_valid, d, chunk=chunk, skew=skew,
                    boundary=boundary, interpret=True,
                )[:, :n_valid]
                err = float(jnp.max(jnp.abs(out - ref)))
                tag = f"n_valid={n_valid} boundary={boundary} chunk={chunk} skew={skew}"
                assert err < 2e-5, f"{tag}: err {err}"
                print(f"ok  {tag}  max|err| {err:.2e}")

        # gradients (interpret): chunked bwd vs dense-reference vjp
        def loss_ref(q, k, v):
            return jnp.sum(
                dense_ref(q, k, v, 0.125, n_valid, d, boundary)[:, :n_valid] ** 2
            )

        def loss_chunked(q, k, v):
            out = chunked_mha(q, k, v, 0.125, n_valid, d, 128, 1, boundary)
            return jnp.sum(out[:, :n_valid] ** 2)

        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        g_chk = jax.grad(loss_chunked, argnums=(0, 1, 2))(q, k, v)
        for name, a, b in zip("qkv", g_ref, g_chk):
            err = float(jnp.max(jnp.abs(a - b)))
            assert err < 5e-5, f"d{name} n_valid={n_valid} b={boundary}: {err}"
            print(f"ok  d{name} n_valid={n_valid} boundary={boundary} "
                  f"max|err| {err:.2e}")
    print("all checks passed")


# ---------------------------------------------------------------- bench --
def bench():
    from dinomc_tpu.ops.pallas.attention import _fused_attention

    B, N, h, d = 20, 785, 6, 64  # bench operating point: global views, B=10
    Np, F = 896, 768  # padded (6*64=384 -> 3 lane-blocks of 2 heads)
    Fp = ((h * d + LANE - 1) // LANE) * LANE
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, Np, Fp), jnp.bfloat16)
    k = jax.random.normal(kk, (B, Np, Fp), jnp.bfloat16)
    v = jax.random.normal(kv, (B, Np, Fp), jnp.bfloat16)
    scale = d**-0.5

    # NOTE: wrapping the kernels in a 12-layer ``lax.scan`` stalls the axon
    # relay's remote-compile service outright (>25 min, no result — the
    # same failure mode bench.py documents for fori_loop probes). Instead:
    # unrolled straight-line chains of L dependent kernel calls per jit
    # (o has q's shape, so o_t feeds q_{t+1}) — same amortization of
    # dispatch, loop-free HLO the relay can compile.
    L = 4
    flopsL = L * 4 * B * h * N * N * d

    def run(name, fn):
        f = jax.jit(fn)
        dt = timeit(lambda: f(q, k, v))
        print(f"{name:28s} {dt*1e3:7.2f} ms  ({flopsL/dt/1e12:5.1f} TF/s "
              f"over {L} layers)", flush=True)
        return dt

    def chainL(single):
        def g(q, k, v):
            for _ in range(L):
                q = single(q, k, v)
            return q
        return g

    print(f"shapes: B={B} N={N} (pad {Np}) h={h} d={d}  chain L={L}")
    run("v0 production", chainL(
        lambda q, k, v: _fused_attention(q, k, v, scale, N, d, 0)))
    for chunk, skew in ((128, 0), (128, 1), (128, 2), (448, 1), (448, 2)):
        run(f"chunked c={chunk} skew={skew}", chainL(
            lambda q, k, v, c=chunk, s=skew: chunked_attention(
                q, k, v, scale, N, d, chunk=c, skew=s)))

    # fwd+bwd: what the train step actually pays (bwd FLOPs = 2.5x fwd)
    def gradL(single):
        def g(q, k, v):
            def loss(q, k, v):
                x = q
                for _ in range(L):
                    x = single(x, k, v)
                return jnp.sum(x.astype(jnp.float32) ** 2)
            return jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
        return g

    fb_flopsL = L * (4 + 10) * B * h * N * N * d

    def run_fb(name, fn):
        f = jax.jit(fn)
        dt = timeit(lambda: f(q, k, v))
        print(f"{name:28s} {dt*1e3:7.2f} ms  ({fb_flopsL/dt/1e12:5.1f} TF/s "
              f"f+b over {L} layers)", flush=True)
        return dt

    run_fb("v0 production f+b", gradL(
        lambda q, k, v: _fused_attention(q, k, v, scale, N, d, 0)))
    for chunk, skew in ((128, 0), (128, 1), (448, 1)):
        run_fb(f"chunked f+b c={chunk} s={skew}", gradL(
            lambda q, k, v, c=chunk, s=skew: chunked_mha(
                q, k, v, scale, N, d, c, s, 0)))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true")
    args = ap.parse_args()
    if args.check:
        jax.config.update("jax_platforms", "cpu")
        INTERPRET = True
        check()
    else:
        bench()
