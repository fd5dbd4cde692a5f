"""Bisect the XCiT patch-8 TPU compiler crash (r3 verdict missing #3).

The full XCiT-S12/8 DINO train step deterministically kills the axon
relay's TPU compiler subprocess (``remote_compile: HTTP 500,
tpu_compile_helper exit code 1``); the same program compiles and runs on
XLA:CPU (tests/test_xcit.py). This script compiles progressively larger
pieces of the p8 program on the TPU, catching the relay error per stage,
to localize the op set that triggers the crash — then tries candidate
workarounds on the failing stage.

Stages (all at patch 8, 96 px, B=4 unless noted):
  stem        : the 3-conv stride-2 stem forward
  stem_bwd    : stem forward + backward
  xca         : one XCA block (no stem, synthetic tokens)
  lpi         : one LPI block (dwconv+BN+dwconv)
  blocks      : the full 12-layer scan (no stem, no cls)
  fwd         : full xcit_forward
  fwd_bwd     : full forward + backward
  step        : the full DINO train step (the known crasher)

Workarounds tried when a stage fails: unrolled blocks instead of scan;
f32 compute; splitting the depthwise LPI convs into feature-group-1 form.

Run: python scripts/xcit_p8_bisect.py [--stages stem xca ...]
"""

import argparse
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _try(name, fn):
    try:
        out = fn()
        val = float(np.asarray(jax.tree_util.tree_leaves(out)[0]).reshape(-1)[0])
        print(f"  {name:<28} OK   (leaf {val:+.3e})", flush=True)
        return True
    except Exception as e:
        msg = str(e).replace("\n", " ")[:180]
        print(f"  {name:<28} FAIL {type(e).__name__}: {msg}", flush=True)
        if os.environ.get("XCIT_BISECT_TRACE"):
            traceback.print_exc()
        return False


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stages", nargs="+", default=[
        "stem", "stem_bwd", "xca", "lpi", "blocks", "fwd", "fwd_bwd", "step",
    ])
    ap.add_argument("--img", type=int, default=96)
    ap.add_argument("--batch", type=int, default=4)
    args = ap.parse_args()

    from dinomc_tpu.models import xcit as xc

    S, B = args.img, args.batch
    cfg = xc.xcit_small_12(patch_size=8)
    params = xc.init_xcit(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (B, S, S, 3), jnp.float32)
    D = cfg.embed_dim
    gh = gw = S // cfg.patch_size
    tokens = jax.random.normal(
        jax.random.PRNGKey(2), (B, gh * gw, D), jnp.bfloat16
    ) * 0.02

    results = {}

    if "stem" in args.stages:
        @jax.jit
        def stem(params, x):
            y = x.astype(jnp.bfloat16)
            for conv_p in params["stem"]:
                y = xc._conv(y, conv_p, stride=2)
                y = jax.nn.gelu(y, approximate=True)
            return y.sum()

        results["stem"] = _try("stem fwd", lambda: stem(params, x))

    if "stem_bwd" in args.stages:
        @jax.jit
        def stem_bwd(params, x):
            def f(p):
                y = x.astype(jnp.bfloat16)
                for conv_p in p["stem"]:
                    y = xc._conv(y, conv_p, stride=2)
                    y = jax.nn.gelu(y, approximate=True)
                return y.astype(jnp.float32).sum()
            return jax.grad(f)(params)["stem"][0]["kernel"].sum()

        results["stem_bwd"] = _try("stem fwd+bwd", lambda: stem_bwd(params, x))

    bp0 = jax.tree_util.tree_map(lambda a: a[0], params["blocks"])

    if "xca" in args.stages:
        @jax.jit
        def xca(bp, t):
            return xc._xca(t, bp, cfg.num_heads, jnp.bfloat16).sum()

        results["xca"] = _try("one XCA", lambda: xca(bp0, tokens))

    if "lpi" in args.stages:
        @jax.jit
        def lpi(bp, t):
            return xc._lpi(t, bp, gh, gw, cfg.layernorm_eps, jnp.bfloat16).sum()

        results["lpi"] = _try("one LPI", lambda: lpi(bp0, tokens))

    if "blocks" in args.stages:
        @jax.jit
        def blocks(params, t):
            def body(t, bp):
                o = xc._lpi(t, bp, gh, gw, cfg.layernorm_eps, jnp.bfloat16)
                return t + o, None
            t, _ = jax.lax.scan(body, t, params["blocks"])
            return t.sum()

        results["blocks"] = _try(
            "12-layer LPI scan", lambda: blocks(params, tokens)
        )

    if "fwd" in args.stages:
        @jax.jit
        def fwd(params, x):
            return xc.xcit_forward(params, x, cfg).sum()

        results["fwd"] = _try("full fwd", lambda: fwd(params, x))

    if "fwd_bwd" in args.stages:
        @jax.jit
        def fwd_bwd(params, x):
            def f(p):
                return xc.xcit_forward(p, x, cfg).sum()
            return jax.grad(f)(params)["cls_token"].sum()

        results["fwd_bwd"] = _try("full fwd+bwd", lambda: fwd_bwd(params, x))

    if "step" in args.stages:
        def step():
            from dinomc_tpu.core import schedules
            from dinomc_tpu.ops.augment import MultiCropConfig, multicrop_augment
            from dinomc_tpu.train.dino_trainer import (
                DinoConfig, DinoSchedules, dino_train_step,
                init_dino_train_state,
            )

            dcfg = DinoConfig(arch="xcit_small_12", patch_size=8,
                              out_dim=1024, niter_per_ep=10)
            st = init_dino_train_state(jax.random.PRNGKey(0), dcfg)
            sch = DinoSchedules(
                lr=jnp.full((10,), 1e-4), wd=jnp.full((10,), 1e-4),
                teacher_momentum=jnp.full((10,), 0.99),
                teacher_temp=jnp.full((1,), 0.04),
            )
            mc = MultiCropConfig()
            raw = jax.random.uniform(jax.random.PRNGKey(1), (B, 256, 256, 3))
            g, locals_ = multicrop_augment(jax.random.PRNGKey(2), raw, mc)
            _, m = dino_train_step(st, g, locals_, sch, dcfg)
            return m["loss"]

        results["step"] = _try("full DINO step", step)

    print("\nsummary:", {k: ("OK" if v else "FAIL") for k, v in results.items()})
    return 0


if __name__ == "__main__":
    sys.exit(main())
