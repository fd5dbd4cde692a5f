"""Per-stage stub-out dissection of the ResNet-50 DINO student — closing
the r4 verdict's "RN50's 0.254 MFU is attributed on the strength of a
stem-only probe" gap.

Methodology (scripts/step_dissect.py family): time the full student
fwd+bwd over all 7 multi-crop programs (train-mode BN, the SyncBN-step
workload), then re-time with one component stubbed to a cheap
shape-preserving op; the difference is that component's wall share
(stub-out books co-scheduled time to the stubbed op — shares can
overstate; same caveat as the other dissections).

Components:
  stem        : 7x7/s2 conv+BN+ReLU -> strided slice + channel tile
  layer1..4   : every bottleneck of that stage -> strided slice + tile
  bn+relu     : all BatchNorms -> identity (convs kept)
  downsample  : the 1x1 shortcut convs -> strided slice + tile

Run: python scripts/rn50_dissect.py [--batch 24] [--arch resnet50]
"""

import argparse
import os
import sys
import time
from unittest import mock

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from dinomc_tpu.models import layers as L
from dinomc_tpu.models import resnet as rn


def timeit(fn, *args, n=10, windows=3):
    out = fn(*args)
    float(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])
    best = float("inf")
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        float(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])
        best = min(best, (time.perf_counter() - t0) / n)
    return best * 1e3


def _cheap(x, stride, out_c):
    y = x[:, ::stride, ::stride, :]
    reps = -(-out_c // y.shape[-1])
    return (jnp.tile(y, (1, 1, 1, reps))[..., :out_c] * 0.01).astype(x.dtype)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=24)
    ap.add_argument("--arch", default="resnet50",
                    choices=["resnet50", "wide_resnet50_2"])
    args = ap.parse_args()
    B = args.batch

    cfg = getattr(rn, args.arch)()
    params, state = rn.init_resnet(jax.random.PRNGKey(0), cfg)
    key = jax.random.PRNGKey(1)
    sizes = [(2 * B, 224)] + [(B, s) for s in (184, 164, 144, 124, 104, 84)]
    xs = [jax.random.uniform(jax.random.fold_in(key, i), (b, s, s, 3))
          for i, (b, s) in enumerate(sizes)]

    def full(params, state, xs):
        return sum(
            rn.resnet_forward(params, state, x, cfg, train=True)[0]
            .astype(jnp.float32).sum()
            for x in xs
        )

    base = timeit(jax.jit(jax.grad(full)), params, state, xs)
    print(f"{args.arch} student fwd+bwd (all crops, train-BN): "
          f"{base:7.2f} ms", flush=True)

    orig_block = rn._bottleneck
    orig_conv_bn = rn._conv_bn
    width = 2 if args.arch == "wide_resnet50_2" else 1

    def stage_stub(target_planes):
        def stub(p, s, x, train, stride):
            planes = p["conv1"]["conv"]["kernel"].shape[-1]
            if planes != target_planes * width:
                return orig_block(p, s, x, train, stride)
            return _cheap(x, stride, p["conv3"]["conv"]["kernel"].shape[-1]), s
        return stub

    def stem_stub(p, s, x, train, stride=1, relu=True, padding="SAME"):
        if x.shape[-1] == 3 and stride == 2:  # the 7x7 stem only
            return _cheap(x, 2, p["conv"]["kernel"].shape[-1]), s
        return orig_conv_bn(p, s, x, train, stride, relu, padding)

    def bn_stub(p, s, y, train):
        return y, s

    def down_stub(p, s, x, train, stride):
        ns = {}
        y, ns["conv1"] = rn._conv_bn(p["conv1"], s["conv1"], x, train)
        y, ns["conv2"] = rn._conv_bn(
            p["conv2"], s["conv2"], y, train, stride=stride, padding=1)
        y, ns["conv3"] = rn._conv_bn(p["conv3"], s["conv3"], y, train,
                                     relu=False)
        if "down" in p:
            sc = _cheap(x, stride, y.shape[-1])
            ns["down"] = s["down"]
        else:
            sc = x
        return jax.nn.relu(y + sc), ns

    rows = [
        ("stem", mock.patch.object(rn, "_conv_bn", stem_stub)),
        ("layer1 (64w)", mock.patch.object(rn, "_bottleneck", stage_stub(64))),
        ("layer2 (128w)", mock.patch.object(rn, "_bottleneck", stage_stub(128))),
        ("layer3 (256w)", mock.patch.object(rn, "_bottleneck", stage_stub(256))),
        ("layer4 (512w)", mock.patch.object(rn, "_bottleneck", stage_stub(512))),
        ("bn (all)", mock.patch.object(L, "bn_apply", bn_stub)),
        ("downsample convs", mock.patch.object(rn, "_bottleneck", down_stub)),
    ]
    for name, ctx in rows:
        with ctx:
            t = timeit(jax.jit(jax.grad(full)), params, state, xs)
        print(f"  - {name:<17} stubbed: {t:7.2f} ms  "
              f"(component ~{base - t:6.2f} ms, {100*(base-t)/base:4.1f}%)",
              flush=True)


if __name__ == "__main__":
    main()
