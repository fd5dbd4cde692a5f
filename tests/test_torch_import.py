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


def test_linear_probe_weights_import(tmp_path):
    """load_linear_probe_weights: ckpt['state_dict'] + module. prefix ->
    transposed (w, b) matching torch nn.Linear logits
    (load_pretrained_linear_weights, utils/utils.py:125-142)."""
    torch.manual_seed(3)
    lin = nn.Linear(16, 5)
    ckpt = {
        "state_dict": {
            "module.linear.weight": lin.weight.detach(),
            "module.linear.bias": lin.bias.detach(),
        },
        "epoch": 99,
    }
    path = str(tmp_path / "linear.pth")
    torch.save(ckpt, path)

    w, b = torch_import.load_linear_probe_weights(path)
    assert w.shape == (16, 5) and b.shape == (5,)
    x = np.random.RandomState(0).randn(4, 16).astype(np.float32)
    with torch.no_grad():
        ref = lin(torch.tensor(x)).numpy()
    np.testing.assert_allclose(x @ w + b, ref, atol=1e-6)


class _TorchBottleneck(nn.Module):
    """torchvision Bottleneck with matching child names (conv1/bn1/.../downsample)."""

    def __init__(self, inplanes, width, outplanes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, width, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(width)
        self.conv2 = nn.Conv2d(width, width, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(width)
        self.conv3 = nn.Conv2d(width, outplanes, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(outplanes)
        self.relu = nn.ReLU()
        self.downsample = downsample

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return self.relu(y + idt)


class _TorchMiniResNet(nn.Module):
    """torchvision-format ResNet with 1 block per stage (state-dict naming
    identical to torchvision resnet50 so resnet_params_from_torch applies)."""

    def __init__(self, wpg=64, num_classes=7):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU()
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        inplanes = 64
        for stage in range(4):
            planes = 64 * 2 ** stage
            width = planes * wpg // 64
            out = planes * 4
            stride = 1 if stage == 0 else 2
            down = nn.Sequential(
                nn.Conv2d(inplanes, out, 1, stride, bias=False),
                nn.BatchNorm2d(out),
            )
            setattr(self, f"layer{stage + 1}",
                    nn.Sequential(_TorchBottleneck(inplanes, width, out, stride, down)))
            inplanes = out
        self.fc = nn.Linear(2048, num_classes)

    def forward(self, x):
        y = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        for stage in range(4):
            y = getattr(self, f"layer{stage + 1}")(y)
        y = y.mean(dim=(2, 3))
        return self.fc(y)


def test_resnet_import_forward_parity():
    """torchvision-format ResNet state dict -> our functional tree: eval-mode
    logits match torch (load_pretrained_weights for convnet DINO ckpts,
    utils/utils.py:75-119 + main_dino_mc.py:223-229)."""
    from dinomc_tpu.models import resnet as rn

    torch.manual_seed(5)
    model = _TorchMiniResNet()
    # make BN running stats non-trivial, then freeze them
    with torch.no_grad():
        model.train()
        model(torch.randn(4, 3, 64, 64))
        model.eval()

    sd = _state_dict_flat(model)
    params, state = torch_import.resnet_params_from_torch(sd, stage_sizes=(1, 1, 1, 1))
    params = jax.tree_util.tree_map(jnp.asarray, params)
    state = jax.tree_util.tree_map(jnp.asarray, state)

    cfg = rn.ResNetConfig(stage_sizes=(1, 1, 1, 1), num_classes=7,
                          compute_dtype=jnp.float32)
    x = np.random.RandomState(6).randn(2, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.tensor(x).permute(0, 3, 1, 2)).numpy()
    ours, _ = rn.resnet_forward(params, state, jnp.asarray(x), cfg, train=False)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-4)


def test_load_convnet_backbone_via_pth(tmp_path):
    """Full path: MultiCropWrapper-style 'teacher' dict with module.backbone.
    prefixes and no fc -> load_convnet_backbone."""
    torch.manual_seed(7)
    model = _TorchMiniResNet()
    sd = {k: v for k, v in model.state_dict().items() if not k.startswith("fc.")}
    wrapped = {"teacher": {"module.backbone." + k: v for k, v in sd.items()}}
    path = str(tmp_path / "rn.pth")
    torch.save(wrapped, path)
    # stage_sizes defaults to (3,4,6,3); this mini ckpt has 1 block/stage
    s = torch_import.load_torch_state_dict(path, "teacher")
    params, state = torch_import.resnet_params_from_torch(s, stage_sizes=(1, 1, 1, 1))
    assert "fc" not in params
    assert params["stem"]["conv"]["kernel"].shape == (7, 7, 3, 64)
    assert state["layer4"][0]["conv3"]["bn"]["var"].shape == (2048,)


class _TorchWindowAttn(nn.Module):
    def __init__(self, dim, heads, window):
        super().__init__()
        self.qkv = nn.Linear(dim, 3 * dim)
        self.proj = nn.Linear(dim, dim)
        self.relative_position_bias_table = nn.Parameter(
            torch.randn((2 * window - 1) ** 2, heads) * 0.02
        )
        self.heads, self.window = heads, window

    def forward(self, win, mask):  # win: (nB, ww, C)
        from dinomc_tpu.models.swin import _rel_index

        nB, ww, C = win.shape
        hd = C // self.heads
        qkv = self.qkv(win).reshape(nB, ww, 3, self.heads, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        logits = torch.einsum("bnhd,bmhd->bhnm", q, k) / hd ** 0.5
        idx = torch.tensor(_rel_index(self.window))
        logits = logits + self.relative_position_bias_table[idx].permute(2, 0, 1)[None]
        if mask is not None:  # (nW, ww, ww)
            nW = mask.shape[0]
            logits = logits.reshape(nB // nW, nW, self.heads, ww, ww) + mask[:, None]
            logits = logits.reshape(nB, self.heads, ww, ww)
        attn = torch.softmax(logits, dim=-1)
        out = torch.einsum("bhnm,bmhd->bnhd", attn, v).reshape(nB, ww, C)
        return self.proj(out)


class _TorchSwinBlock(nn.Module):
    def __init__(self, dim, heads, window):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-5)
        self.attn = _TorchWindowAttn(dim, heads, window)
        self.norm2 = nn.LayerNorm(dim, eps=1e-5)
        self.mlp = nn.Sequential(
            nn.Linear(dim, 4 * dim), nn.GELU(), nn.Identity(), nn.Linear(4 * dim, dim)
        )

    def forward(self, x, shift):  # x: (B, H, W, C), divisible by window
        from dinomc_tpu.models.swin import _shift_mask

        B, H, W, C = x.shape
        w = self.attn.window
        y = self.norm1(x)
        mask = None
        if shift > 0:
            y = torch.roll(y, (-shift, -shift), dims=(1, 2))
            mask = torch.tensor(_shift_mask(H, W, w, shift))
        win = y.reshape(B, H // w, w, W // w, w, C).permute(0, 1, 3, 2, 4, 5)
        win = win.reshape(-1, w * w, C)
        win = self.attn(win, mask)
        y = win.reshape(B, H // w, W // w, w, w, C).permute(0, 1, 3, 2, 4, 5)
        y = y.reshape(B, H, W, C)
        if shift > 0:
            y = torch.roll(y, (shift, shift), dims=(1, 2))
        x = x + y
        return x + self.mlp(self.norm2(x))


class _TorchMerge(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.norm = nn.LayerNorm(4 * dim, eps=1e-5)
        self.reduction = nn.Linear(4 * dim, 2 * dim, bias=False)

    def forward(self, x):
        cat = torch.cat(
            [x[:, 0::2, 0::2], x[:, 1::2, 0::2], x[:, 0::2, 1::2], x[:, 1::2, 1::2]],
            dim=-1,
        )
        return self.reduction(self.norm(cat))


class _TorchMiniSwin(nn.Module):
    """torchvision swin_t state-dict naming (features.0 patch embed,
    features.{2s+1} blocks, features.{2s+2} merge, final norm)."""

    def __init__(self, dim=8, depths=(2, 1), heads=(2, 4), window=2, patch=2):
        super().__init__()
        f0 = nn.Sequential(
            nn.Conv2d(3, dim, patch, patch), nn.Identity(), nn.LayerNorm(dim, eps=1e-5)
        )
        mods = [f0]
        d = dim
        for s, depth in enumerate(depths):
            mods.append(nn.Sequential(*[
                _TorchSwinBlock(d, heads[s], window) for _ in range(depth)
            ]))
            if s < len(depths) - 1:
                mods.append(_TorchMerge(d))
                d *= 2
        self.features = nn.Sequential(*mods)
        self.norm = nn.LayerNorm(d, eps=1e-5)
        self.window = window
        self.depths = depths

    def forward(self, x):  # (B, 3, H, W)
        t = self.features[0][0](x).permute(0, 2, 3, 1)  # (B, gh, gw, C)
        t = self.features[0][2](t)
        for s in range(len(self.depths)):
            for b, blk in enumerate(self.features[2 * s + 1]):
                shift = 0 if b % 2 == 0 else self.window // 2
                if min(t.shape[1], t.shape[2]) <= self.window:
                    shift = 0
                t = blk(t, shift)
            if s < len(self.depths) - 1:
                t = self.features[2 * s + 2](t)
        t = self.norm(t)
        return t.mean(dim=(1, 2))


def test_swin_import_forward_parity():
    """torchvision-format swin state dict -> our tree: pooled embeddings
    match torch incl. a shifted-window block and a patch merge."""
    from dinomc_tpu.models.swin import SwinConfig, swin_forward

    torch.manual_seed(11)
    model = _TorchMiniSwin().eval()
    sd = _state_dict_flat(model)
    params = torch_import.swin_params_from_torch(sd, depths=(2, 1))
    params = jax.tree_util.tree_map(jnp.asarray, params)

    cfg = SwinConfig(
        patch_size=2, embed_dim=8, depths=(2, 1), num_heads=(2, 4), window=2,
        compute_dtype=jnp.float32, gelu_approx=False,
    )
    x = np.random.RandomState(13).randn(2, 8, 8, 3).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.tensor(x).permute(0, 3, 1, 2)).numpy()
    ours = np.asarray(swin_forward(params, jnp.asarray(x), cfg))
    np.testing.assert_allclose(ours, ref, atol=2e-4)
