"""Analytic FLOP model for the DINO-MC training step — the basis of the
MFU number ``bench.py`` reports.

Conventions (stated so the number is auditable):

* **Model FLOPs, not hardware FLOPs**: rematerialisation recompute is NOT
  counted (the standard MFU convention, per the PaLM appendix definition).
  The augmentation chain, layernorms, softmaxes, GELUs, residual adds and
  the DINO loss itself are also excluded — they are bandwidth-bound
  elementwise work, < 1% of matmul FLOPs at these shapes.
* A matmul of (m, k) x (k, n) costs ``2*m*k*n``.
* Backward of a matmul costs 2x its forward (dX and dW each cost one
  forward-sized matmul), so a fwd+bwd pass is 3x forward FLOPs.
* Token counts follow the reference ViT (utils/vision_transformer.py:
  196-207): ``floor(size/patch)**2`` patch tokens + 1 CLS.

Peak: TPU v5e = 197 TFLOP/s bf16 (public spec). The compute dtype of every
hot matmul in the step is bf16 (DinoConfig.compute_dtype default).
"""

from typing import Sequence

TPU_PEAK_FLOPS = {
    # bf16 peak matmul throughput, public chip specs
    "v4": 275e12,
    "v5e": 197e12,
    "v5p": 459e12,
    "v6e": 918e12,
}


def vit_tokens(img_size: int, patch_size: int) -> int:
    return (img_size // patch_size) ** 2 + 1


def vit_forward_flops(
    n_tokens: int,
    embed_dim: int,
    depth: int,
    patch_size: int,
    mlp_ratio: int = 4,
    in_chans: int = 3,
) -> int:
    """Matmul FLOPs of one ViT forward on a single image of ``n_tokens``.

    Per block: qkv (2*N*D*3D) + scores (2*N*N*D) + attn@V (2*N*N*D)
    + proj (2*N*D*D) + mlp (2 * 2*N*D*rD)  =  (8 + 4*r)*N*D^2 + 4*N^2*D.
    Patch embed: the stride-p conv = one (N-1, p*p*C) x (p*p*C, D) matmul.
    """
    n, d = n_tokens, embed_dim
    per_block = (8 + 4 * mlp_ratio) * n * d * d + 4 * n * n * d
    patch_embed = 2 * (n - 1) * (patch_size * patch_size * in_chans) * d
    return depth * per_block + patch_embed


def dino_head_forward_flops(
    embed_dim: int,
    hidden_dim: int = 2048,
    bottleneck_dim: int = 256,
    out_dim: int = 65536,
) -> int:
    """3-layer MLP + weight-normed last layer (vision_transformer.py:260-294),
    per image (the head sees one CLS vector per crop)."""
    return 2 * (
        embed_dim * hidden_dim
        + hidden_dim * hidden_dim
        + hidden_dim * bottleneck_dim
        + bottleneck_dim * out_dim
    )


def dino_step_flops_per_image(
    embed_dim: int = 384,
    depth: int = 12,
    patch_size: int = 8,
    global_size: int = 224,
    local_sizes: Sequence[int] = (184, 164, 144, 124, 104, 84),
    out_dim: int = 65536,
) -> int:
    """Model FLOPs of ONE image's share of a DINO-MC train step.

    teacher: forward only, 2 global crops (main_dino_mc.py:373).
    student: forward + backward (3x fwd) on 2 globals + all locals (:374).
    EMA/optimizer/clip are elementwise — excluded.
    """

    def fwd(size: int) -> int:
        return vit_forward_flops(
            vit_tokens(size, patch_size), embed_dim, depth, patch_size
        ) + dino_head_forward_flops(embed_dim, out_dim=out_dim)

    teacher = 2 * fwd(global_size)
    student = 3 * (2 * fwd(global_size) + sum(fwd(s) for s in local_sizes))
    return teacher + student


def mfu(img_per_sec: float, flops_per_image: int, peak_flops: float) -> float:
    return img_per_sec * flops_per_image / peak_flops


# ---------------------------------------------------------------------------
# Arch-agnostic FLOP counting by walking the jaxpr (r3 verdict #2: the
# analytic model above covers only the ViT shape; conv/Swin/XCiT rows need
# a FLOP model too or their img/s numbers are unfalsifiable as good-or-bad).
#
# Why not XLA's HloCostAnalysis: it counts a `lax.scan` body ONCE, not
# x trip-count (measured: 0.089x the analytic ViT number — exactly the
# 12-layer scan undercount), and its number includes elementwise ops the
# MFU convention excludes. Walking the jaxpr counts dot_general /
# conv_general_dilated only — the convention stated at the top of this
# file — with loop bodies multiplied by their trip counts.
# ---------------------------------------------------------------------------


def _dot_flops(eqn) -> int:
    (lhs, rhs) = (v.aval for v in eqn.invars[:2])
    (lc, rc), (lb, rb) = eqn.params["dimension_numbers"]
    k = 1
    for d in lc:
        k *= lhs.shape[d]
    b = 1
    for d in lb:
        b *= lhs.shape[d]
    m = 1
    for d in range(len(lhs.shape)):
        if d not in lc and d not in lb:
            m *= lhs.shape[d]
    n = 1
    for d in range(len(rhs.shape)):
        if d not in rc and d not in rb:
            n *= rhs.shape[d]
    return 2 * b * m * n * k


def _conv_flops(eqn) -> int:
    rhs = eqn.invars[1].aval
    out = eqn.outvars[0].aval
    dn = eqn.params["dimension_numbers"]
    groups = eqn.params.get("feature_group_count", 1)
    k_spatial = 1
    for d in dn.rhs_spec[2:]:
        k_spatial *= rhs.shape[d]
    c_in = rhs.shape[dn.rhs_spec[1]]  # already per-group
    n_out = 1
    for s in out.shape:
        n_out *= s
    return 2 * n_out * k_spatial * c_in


def _count_jaxpr(jaxpr) -> int:
    total = 0
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name == "dot_general":
            total += _dot_flops(eqn)
        elif name == "conv_general_dilated":
            total += _conv_flops(eqn)
        elif name == "scan":
            total += eqn.params["length"] * _count_jaxpr(
                eqn.params["jaxpr"].jaxpr
            )
        elif name == "while":
            # bounded only if the body runs once per iteration; models here
            # don't use while loops on the FLOP path — count body once
            total += _count_jaxpr(eqn.params["body_jaxpr"].jaxpr)
        elif name == "cond":
            total += max(
                _count_jaxpr(b.jaxpr) for b in eqn.params["branches"]
            )
        else:
            # recurse into any wrapped sub-jaxpr (pjit, remat/checkpoint,
            # custom_vjp/jvp, closed_call...). pallas_call's kernel jaxpr is
            # deliberately NOT descended into: count attention via the
            # 'dense' impl instead (encoder_fwd_flops_per_image does).
            if name == "pallas_call":
                continue
            for v in eqn.params.values():
                if hasattr(v, "jaxpr"):
                    j = v.jaxpr if hasattr(v.jaxpr, "eqns") else v
                    total += _count_jaxpr(j)
                elif hasattr(v, "eqns"):
                    total += _count_jaxpr(v)
    return total


def count_matmul_flops(fn, *args) -> int:
    """Matmul/conv model FLOPs of ``fn(*args)`` (2*m*k*n per dot, 2x MACs
    per conv), loop bodies multiplied by trip count, elementwise excluded."""
    import jax

    return _count_jaxpr(jax.make_jaxpr(fn)(*args).jaxpr)


def encoder_fwd_flops_per_image(
    arch: str,
    img_size: int,
    patch_size: int = 16,
    out_dim: int = 65536,
) -> int:
    """One image's forward FLOPs through encoder + DINO head at one crop
    size, counted from the compiled HLO (any registered arch)."""
    import jax.numpy as jnp

    from dinomc_tpu.models.dino_head import (
        DINOHeadConfig, dino_head_forward, init_dino_head,
    )
    from dinomc_tpu.models.encoders import EncoderConfig

    import jax

    enc = EncoderConfig(
        arch=arch, patch_size=patch_size, img_size=img_size,
        compute_dtype=jnp.float32, attn_impl="dense",
    )
    hcfg = DINOHeadConfig(in_dim=enc.embed_dim, out_dim=out_dim,
                          compute_dtype=jnp.float32)
    B = 2  # batch amortizes per-image constants; BN stats need B >= 2
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        params, state = enc.init(jax.random.PRNGKey(0))
        head = init_dino_head(jax.random.PRNGKey(1), hcfg)
        x = jnp.zeros((B, img_size, img_size, 3), jnp.float32)

        def fwd(params, head, state, x):
            f, _ = enc.apply(params, state, x, train=enc.has_bn)
            return dino_head_forward(head, f, hcfg)

        total = count_matmul_flops(fwd, params, head, state, x)
    return total // B


def arch_step_flops_per_image(
    arch: str,
    patch_size: int = 16,
    global_size: int = 224,
    local_sizes: Sequence[int] = (184, 164, 144, 124, 104, 84),
    out_dim: int = 65536,
) -> int:
    """Model FLOPs of ONE image's share of the DINO-MC train step for ANY
    encoder arch (same convention as ``dino_step_flops_per_image``:
    teacher fwd on 2 globals + student 3x fwd on all crops; optimizer/EMA
    elementwise excluded; remat recompute not counted)."""

    def fwd(size: int) -> int:
        return encoder_fwd_flops_per_image(arch, size, patch_size, out_dim)

    g = fwd(global_size)
    teacher = 2 * g
    student = 3 * (2 * g + sum(fwd(s) for s in local_sizes))
    return teacher + student
