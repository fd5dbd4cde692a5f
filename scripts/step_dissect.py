"""Attribute the student fwd+bwd's wall time to its pieces (real chip).

Times the bench-config student 8-crop forward+backward, then re-times it
with one piece at a time stubbed out (attention -> identity, layernorm ->
identity, DropPath off, locals/globals only) — the delta attributes wall
time to that piece. Stubs change numerics, not shapes; timing-only.

Usage: python scripts/step_dissect.py [B] [policy]
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")


def timeit(fn, iters=10, warmup=2):
    for _ in range(warmup):
        out = fn()
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters


def main():
    from dinomc_tpu.models import vit as vit_mod
    from dinomc_tpu.ops import attention as attn_mod
    from dinomc_tpu.ops.augment import MultiCropConfig, multicrop_augment
    from dinomc_tpu.train.dino_trainer import (
        DinoConfig,
        init_dino_train_state,
        _forward_crops,
    )

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    policy = sys.argv[2] if len(sys.argv) > 2 else "qkv+attn+mlp"
    cfg = DinoConfig(
        arch="vit_small", patch_size=8, out_dim=65536, niter_per_ep=100,
        remat_policy=policy,
    )
    state = init_dino_train_state(jax.random.PRNGKey(0), cfg)
    head_cfg = cfg.head_config()
    enc_s = cfg.encoder(student=True)

    raw = jax.random.uniform(jax.random.PRNGKey(1), (B, 256, 256, 3))
    g, locals_ = jax.block_until_ready(
        multicrop_augment(jax.random.PRNGKey(3), raw, MultiCropConfig())
    )

    def make_fb(globals_in, locals_in):
        @jax.jit
        def f(params):
            def loss_fn(p):
                out, _ = _forward_crops(
                    p, {}, globals_in, locals_in, enc_s, head_cfg,
                    jax.random.PRNGKey(0), True, cfg.crop_packing,
                )
                return jnp.sum(out.astype(jnp.float32) ** 2)

            return jax.grad(loss_fn)(params)

        return lambda: f(state.student)

    def run(label, globals_in=g, locals_in=locals_):
        jax.clear_caches()
        t = timeit(make_fb(globals_in, locals_in))
        print(f"{label:34s} {t*1e3:8.2f} ms")
        return t

    t_full = run("full student f+b")
    t_glob = run("globals only", g, ())
    t_loc = t_full - t_glob  # locals attribution by difference

    # attention -> identity (skip qkv attention math, keep projections)
    orig_mha = attn_mod.mha
    attn_mod.mha = lambda q, k, v, scale=None, **kw: q
    t_noattn = run("attention stubbed to identity")
    attn_mod.mha = orig_mha

    # layernorm -> scale+bias only (skip mean/var VPU work)
    orig_ln = vit_mod.layer_norm
    vit_mod.layer_norm = lambda x, s, b, eps: x * s.astype(x.dtype) + b.astype(x.dtype)
    t_noln = run("layernorm stubbed to affine")
    vit_mod.layer_norm = orig_ln

    # DropPath off (deterministic student)
    orig_dp = vit_mod._drop_path
    vit_mod._drop_path = lambda x, keep, mask, boundary=0: x
    t_nodp = run("droppath stubbed out")
    vit_mod._drop_path = orig_dp

    # head -> mean of features (isolate the 65536-wide head + its backward)
    import dinomc_tpu.train.dino_trainer as tr

    orig_head = tr.dino_head_forward
    tr.dino_head_forward = lambda p, f, c: f
    t_nohead = run("DINO head stubbed out")
    tr.dino_head_forward = orig_head

    print()
    print(f"attention cost:  {(t_full - t_noattn)*1e3:7.2f} ms")
    print(f"layernorm cost:  {(t_full - t_noln)*1e3:7.2f} ms")
    print(f"droppath cost:   {(t_full - t_nodp)*1e3:7.2f} ms")
    print(f"head cost:       {(t_full - t_nohead)*1e3:7.2f} ms")
    print(f"globals part:    {t_glob*1e3:7.2f} ms; locals part (diff): {t_loc*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
