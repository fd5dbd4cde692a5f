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
