"""Checkpoint-import parity: a torch ViT oracle (same math as the reference
timm-derived ViT) is exported to a state dict, imported via
ckpt/torch_import.py, and the JAX forward must match the torch forward."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn

from dinomc_tpu.ckpt import torch_import
from dinomc_tpu.models.vit import ViTConfig, vit_forward, vit_intermediate_layers


class TorchBlock(nn.Module):
    def __init__(self, d, h):
        super().__init__()
        self.norm1 = nn.LayerNorm(d, eps=1e-6)
        self.attn = nn.ModuleDict(
            {"qkv": nn.Linear(d, 3 * d), "proj": nn.Linear(d, d)}
        )
        self.norm2 = nn.LayerNorm(d, eps=1e-6)
        self.mlp = nn.ModuleDict(
            {"fc1": nn.Linear(d, 4 * d), "fc2": nn.Linear(4 * d, d)}
        )
        self.h = h

    def forward(self, x):
        B, N, D = x.shape
        y = self.norm1(x)
        qkv = self.attn["qkv"](y).reshape(B, N, 3, self.h, D // self.h)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        scale = 1.0 / math.sqrt(D // self.h)
        attn = torch.einsum("bnhd,bmhd->bhnm", q, k) * scale
        attn = attn.softmax(-1)
        out = torch.einsum("bhnm,bmhd->bnhd", attn, v).reshape(B, N, D)
        x = x + self.attn["proj"](out)
        y = self.norm2(x)
        y = self.mlp["fc2"](nn.functional.gelu(self.mlp["fc1"](y)))
        return x + y


class TorchViT(nn.Module):
    def __init__(self, patch=4, d=32, depth=3, h=2, img=16):
        super().__init__()
        self.patch_embed = nn.ModuleDict(
            {"proj": nn.Conv2d(3, d, kernel_size=patch, stride=patch)}
        )
        n = (img // patch) ** 2
        self.cls_token = nn.Parameter(torch.randn(1, 1, d) * 0.02)
        self.pos_embed = nn.Parameter(torch.randn(1, n + 1, d) * 0.02)
        self.blocks = nn.ModuleList([TorchBlock(d, h) for _ in range(depth)])
        self.norm = nn.LayerNorm(d, eps=1e-6)

    def forward(self, x):
        B = x.shape[0]
        t = self.patch_embed["proj"](x).flatten(2).transpose(1, 2)
        t = torch.cat([self.cls_token.expand(B, -1, -1), t], dim=1)
        t = t + self.pos_embed
        for blk in self.blocks:
            t = blk(t)
        t = self.norm(t)
        return t[:, 0]


def _state_dict_flat(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


def test_torch_vit_import_forward_parity():
    torch.manual_seed(0)
    model = TorchViT().eval()
    sd = _state_dict_flat(model)
    params = torch_import.vit_params_from_torch(
        {k: np.asarray(v) for k, v in sd.items()}, depth=3
    )
    params = jax.tree_util.tree_map(jnp.asarray, params)

    cfg = ViTConfig(
        patch_size=4, embed_dim=32, depth=3, num_heads=2, img_size=16,
        compute_dtype=jnp.float32, gelu_approx=False,
    )
    x = np.random.RandomState(0).randn(2, 16, 16, 3).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.tensor(x).permute(0, 3, 1, 2)).numpy()
    ours = np.asarray(vit_forward(params, jnp.asarray(x), cfg))
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_torch_import_via_pth_file(tmp_path):
    """Full path: torch.save with a 'teacher' key + module./backbone. prefixes
    -> load_dino_backbone (utils/utils.py:75-119 semantics)."""
    torch.manual_seed(1)
    model = TorchViT().eval()
    wrapped = {
        "teacher": {
            "module.backbone." + k: v for k, v in model.state_dict().items()
        },
        "student": {"dummy": torch.zeros(1)},
        "epoch": 299,
    }
    path = str(tmp_path / "checkpoint.pth")
    torch.save(wrapped, path)

    params = torch_import.load_dino_backbone(path, checkpoint_key="teacher", depth=3)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    cfg = ViTConfig(
        patch_size=4, embed_dim=32, depth=3, num_heads=2, img_size=16,
        compute_dtype=jnp.float32, gelu_approx=False,
    )
    x = np.random.RandomState(1).randn(1, 16, 16, 3).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.tensor(x).permute(0, 3, 1, 2)).numpy()
    ours = np.asarray(vit_forward(params, jnp.asarray(x), cfg))
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_dino_head_import():
    """Weight-norm mapping: torch weight_g/(norm of weight_v) semantics."""
    torch.manual_seed(2)
    lin = nn.Linear(16, 64, bias=False)
    wn = nn.utils.weight_norm(lin)
    wn.weight_g.data.fill_(1.0)
    mlp0 = nn.Linear(8, 16)
    sd = {
        "mlp.0.weight": mlp0.weight.detach().numpy(),
        "mlp.0.bias": mlp0.bias.detach().numpy(),
        "last_layer.weight_g": wn.weight_g.detach().numpy(),
        "last_layer.weight_v": wn.weight_v.detach().numpy(),
    }
    params = torch_import.dino_head_params_from_torch(sd)
    assert params["mlp_0"]["kernel"].shape == (8, 16)
    assert params["last_layer"]["v"].shape == (16, 64)
    assert params["last_layer"]["g"].shape == (64,)

    from dinomc_tpu.models.dino_head import DINOHeadConfig, dino_head_forward

    cfg = DINOHeadConfig(
        in_dim=8, out_dim=64, hidden_dim=16, bottleneck_dim=16, nlayers=1,
        compute_dtype=jnp.float32,
    )
    # nlayers=1: single mlp layer 8->16 (bottleneck), then weight-norm 16->64
    x = np.random.RandomState(3).randn(4, 8).astype(np.float32)
    out = dino_head_forward(params, jnp.asarray(x), cfg)

    with torch.no_grad():
        tx = torch.tensor(x)
        y = mlp0(tx)
        y = nn.functional.normalize(y, dim=-1)
        ref = wn(y).numpy()
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)
