"""Torch oracle for the FULL reference DINO training step.

A compact, self-contained torch transcription of the reference's exact
training-step composition — used by tests/test_step_oracle.py to prove that
``dinomc_tpu.train.dino_trainer.dino_train_step`` reproduces the reference
end to end (not just piecewise):

  * multi-crop bucketed forward      — ``utils/utils.py:611-646`` (MultiCropWrapper)
  * ViT w/ bicubic pos-embed interp  — ``utils/vision_transformer.py:174-194``
  * weight-normed DINOHead           — ``utils/vision_transformer.py:257-294``
  * DINOLoss + center EMA            — ``main_dino_mc.py:419-473``
  * two param groups (wd / no-wd)    — ``utils/utils.py:649-660``
  * per-tensor grad clip             — ``utils/utils.py:145-154``
  * last-layer grad cancel           — ``utils/utils.py:157-162``
  * AdamW / SGD / LARS step          — ``main_dino_mc.py:283-289``, ``utils/utils.py:570-608``
  * teacher EMA                      — ``main_dino_mc.py:403-406``

Everything here is an independent re-implementation from the reference's
observed behavior (world_size == 1: the DDP allreduce and the center
``dist.all_reduce`` are identities over a full batch — which is exactly the
"SyncBN / DDP-equivalent" semantics the SPMD path must match on a
batch-sharded mesh).
"""

from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


# ---------------------------------------------------------------------------
# ViT backbone (state-dict naming identical to the reference / timm layout so
# ckpt.torch_import.vit_params_from_torch maps it directly)
# ---------------------------------------------------------------------------


class OracleBlock(nn.Module):
    def __init__(self, d: int, h: int):
        super().__init__()
        self.norm1 = nn.LayerNorm(d, eps=1e-6)
        self.attn = nn.ModuleDict({"qkv": nn.Linear(d, 3 * d), "proj": nn.Linear(d, d)})
        self.norm2 = nn.LayerNorm(d, eps=1e-6)
        self.mlp = nn.ModuleDict({"fc1": nn.Linear(d, 4 * d), "fc2": nn.Linear(4 * d, d)})
        self.h = h

    def forward(self, x):
        B, N, D = x.shape
        y = self.norm1(x)
        qkv = self.attn["qkv"](y).reshape(B, N, 3, self.h, D // self.h)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        a = torch.einsum("bnhd,bmhd->bhnm", q, k) / math.sqrt(D // self.h)
        a = a.softmax(-1)
        out = torch.einsum("bhnm,bmhd->bnhd", a, v).reshape(B, N, D)
        x = x + self.attn["proj"](out)
        y = self.norm2(x)
        return x + self.mlp["fc2"](F.gelu(self.mlp["fc1"](y)))


class OracleViT(nn.Module):
    """Multi-resolution ViT: pos embeddings interpolated with the reference's
    scale_factor=(g+0.1)/g0 bicubic (``vision_transformer.py:174-194``)."""

    def __init__(self, patch=4, d=32, depth=3, h=2, img=16):
        super().__init__()
        self.patch = patch
        self.patch_embed = nn.ModuleDict(
            {"proj": nn.Conv2d(3, d, kernel_size=patch, stride=patch)}
        )
        g0 = img // patch
        self.g0 = g0
        self.cls_token = nn.Parameter(torch.randn(1, 1, d) * 0.02)
        self.pos_embed = nn.Parameter(torch.randn(1, g0 * g0 + 1, d) * 0.02)
        self.blocks = nn.ModuleList([OracleBlock(d, h) for _ in range(depth)])
        self.norm = nn.LayerNorm(d, eps=1e-6)

    def _pos(self, g: int, dim: int):
        if g == self.g0:
            return self.pos_embed
        patch_pos = self.pos_embed[:, 1:].reshape(1, self.g0, self.g0, dim)
        patch_pos = F.interpolate(
            patch_pos.permute(0, 3, 1, 2),
            scale_factor=(g + 0.1) / self.g0,
            mode="bicubic",
        )
        assert patch_pos.shape[-1] == g
        patch_pos = patch_pos.permute(0, 2, 3, 1).reshape(1, g * g, dim)
        return torch.cat([self.pos_embed[:, :1], patch_pos], dim=1)

    def forward(self, x):  # (B, 3, S, S)
        B, _, S, _ = x.shape
        t = self.patch_embed["proj"](x).flatten(2).transpose(1, 2)
        t = torch.cat([self.cls_token.expand(B, -1, -1), t], dim=1)
        t = t + self._pos(S // self.patch, t.shape[-1])
        for blk in self.blocks:
            t = blk(t)
        return self.norm(t)[:, 0]


# ---------------------------------------------------------------------------
# Mini ResNet with BN (torchvision state-dict naming for resnet_params_from_torch)
# ---------------------------------------------------------------------------


class OracleBottleneck(nn.Module):
    def __init__(self, c_in, width, c_out, stride=1, down=None):
        super().__init__()
        self.conv1 = nn.Conv2d(c_in, width, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(width)
        self.conv2 = nn.Conv2d(width, width, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(width)
        self.conv3 = nn.Conv2d(width, c_out, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(c_out)
        self.downsample = down

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        y = F.relu(self.bn1(self.conv1(x)))
        y = F.relu(self.bn2(self.conv2(y)))
        return F.relu(self.bn3(self.conv3(y)) + idt)


class OracleResNet(nn.Module):
    """1 bottleneck per stage; forward returns pooled (B, 2048) features
    (the MultiCropWrapper nukes ``fc`` — ``utils/utils.py:622-624``)."""

    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        c_in = 64
        for stage in range(4):
            planes = 64 * 2**stage
            c_out = planes * 4
            stride = 1 if stage == 0 else 2
            down = nn.Sequential(
                nn.Conv2d(c_in, c_out, 1, stride, bias=False), nn.BatchNorm2d(c_out)
            )
            setattr(
                self,
                f"layer{stage + 1}",
                nn.Sequential(OracleBottleneck(c_in, planes, c_out, stride, down)),
            )
            c_in = c_out

    def forward(self, x):
        y = self.maxpool(F.relu(self.bn1(self.conv1(x))))
        for stage in range(4):
            y = getattr(self, f"layer{stage + 1}")(y)
        return y.mean(dim=(2, 3))


# ---------------------------------------------------------------------------
# DINOHead + MultiCropWrapper + DINOLoss
# ---------------------------------------------------------------------------


class OracleDINOHead(nn.Module):
    """3-layer MLP -> L2 normalize -> weight-normed linear
    (``vision_transformer.py:257-294``); ``weight_g`` filled with 1 and
    frozen when norm_last_layer."""

    def __init__(self, in_dim, out_dim, hidden=2048, bottleneck=256, norm_last_layer=True):
        super().__init__()
        self.mlp = nn.Sequential(
            nn.Linear(in_dim, hidden),
            nn.GELU(),
            nn.Linear(hidden, hidden),
            nn.GELU(),
            nn.Linear(hidden, bottleneck),
        )
        self.last_layer = nn.utils.weight_norm(nn.Linear(bottleneck, out_dim, bias=False))
        self.last_layer.weight_g.data.fill_(1.0)
        if norm_last_layer:
            self.last_layer.weight_g.requires_grad = False

    def forward(self, x):
        x = self.mlp(x)
        x = F.normalize(x, dim=-1, p=2)
        return self.last_layer(x)


def multicrop_forward(backbone, head, crops):
    """Reference MultiCropWrapper.forward (``utils/utils.py:627-646``): one
    backbone pass per run of consecutive same-resolution crops, features
    concatenated in crop order, one head pass."""
    feats = []
    i = 0
    while i < len(crops):
        j = i
        while j < len(crops) and crops[j].shape[-1] == crops[i].shape[-1]:
            j += 1
        feats.append(backbone(torch.cat(crops[i:j], dim=0)))
        i = j
    return head(torch.cat(feats, dim=0))


def dino_loss_torch(student_out, teacher_out, center, n_crops, n_globals,
                    teacher_temp, student_temp=0.1, center_momentum=0.9):
    """Reference DINOLoss.forward + update_center (``main_dino_mc.py:438-473``)
    at world_size == 1. Returns (loss, new_center)."""
    s = (student_out / student_temp).chunk(n_crops)
    q = F.softmax((teacher_out.detach() - center) / teacher_temp, dim=-1).chunk(n_globals)
    total, n_terms = 0.0, 0
    for iq in range(n_globals):
        for v in range(n_crops):
            if v == iq:
                continue
            total = total + torch.sum(-q[iq] * F.log_softmax(s[v], dim=-1), dim=-1).mean()
            n_terms += 1
    loss = total / n_terms
    with torch.no_grad():
        batch_center = teacher_out.detach().mean(dim=0, keepdim=True)
        new_center = center * center_momentum + batch_center * (1 - center_momentum)
    return loss, new_center


# ---------------------------------------------------------------------------
# optimizer plumbing
# ---------------------------------------------------------------------------


def params_groups(model):
    """``utils/utils.py:649-660``: biases and 1-D params un-regularized;
    requires_grad=False params excluded entirely."""
    reg, not_reg = [], []
    for name, p in model.named_parameters():
        if not p.requires_grad:
            continue
        (not_reg if name.endswith(".bias") or p.ndim == 1 else reg).append(p)
    return [{"params": reg}, {"params": not_reg, "weight_decay": 0.0}]


def clip_gradients(model, clip):
    """Per-tensor clip (``utils/utils.py:145-154``)."""
    for _, p in model.named_parameters():
        if p.grad is not None:
            norm = p.grad.data.norm(2)
            coef = clip / (norm + 1e-6)
            if coef < 1:
                p.grad.data.mul_(coef)


def cancel_gradients_last_layer(epoch, model, freeze_last_layer):
    if epoch >= freeze_last_layer:
        return
    for n, p in model.named_parameters():
        if "last_layer" in n:
            p.grad = None


class OracleLARS(torch.optim.Optimizer):
    """Reference LARS (``utils/utils.py:570-608``): wd + eta trust-ratio
    adaptation applied only to ndim != 1 params, heavy-ball momentum."""

    def __init__(self, params, lr=0.0, weight_decay=0.0, momentum=0.9, eta=0.001):
        super().__init__(params, dict(lr=lr, weight_decay=weight_decay,
                                      momentum=momentum, eta=eta))

    @torch.no_grad()
    def step(self):
        for g in self.param_groups:
            for p in g["params"]:
                if p.grad is None:
                    continue
                dp = p.grad
                if p.ndim != 1:
                    dp = dp.add(p, alpha=g["weight_decay"])
                    pn, un = torch.norm(p), torch.norm(dp)
                    q = torch.where(
                        pn > 0.0,
                        torch.where(un > 0.0, g["eta"] * pn / un, torch.ones_like(pn)),
                        torch.ones_like(pn),
                    )
                    dp = dp.mul(q)
                st = self.state[p]
                if "mu" not in st:
                    st["mu"] = torch.zeros_like(p)
                st["mu"].mul_(g["momentum"]).add_(dp)
                p.add_(st["mu"], alpha=-g["lr"])


def make_optimizer(name, groups):
    if name == "adamw":
        return torch.optim.AdamW(groups)
    if name == "sgd":
        return torch.optim.SGD(groups, lr=0.0, momentum=0.9)
    if name == "lars":
        return OracleLARS(groups)
    raise ValueError(name)


# ---------------------------------------------------------------------------
# the full reference step (``main_dino_mc.py:356-416``)
# ---------------------------------------------------------------------------


class OracleDino:
    """Holds student/teacher MultiCropWrapper pairs + loss state and applies
    the reference's train_one_epoch inner-loop body step by step."""

    def __init__(self, backbone_fn, embed_dim, out_dim, optimizer="adamw",
                 clip_grad=3.0, freeze_last_layer=1, n_globals=2,
                 norm_last_layer=True, center_momentum=0.9, student_temp=0.1):
        torch.manual_seed(0)
        self.student_bb, self.teacher_bb = backbone_fn(), backbone_fn()
        self.student_head = OracleDINOHead(embed_dim, out_dim, norm_last_layer=norm_last_layer)
        self.teacher_head = OracleDINOHead(embed_dim, out_dim)
        # teacher starts as a copy of the student (main_dino_mc.py:262-265)
        self.teacher_bb.load_state_dict(self.student_bb.state_dict())
        self.teacher_head.load_state_dict(self.student_head.state_dict())
        for p in list(self.teacher_bb.parameters()) + list(self.teacher_head.parameters()):
            p.requires_grad = False
        self.center = torch.zeros(1, out_dim)
        self.out_dim = out_dim
        self.n_globals = n_globals
        self.clip_grad = clip_grad
        self.freeze_last_layer = freeze_last_layer
        self.center_momentum = center_momentum
        self.student_temp = student_temp
        self._student = nn.ModuleDict({"backbone": self.student_bb, "head": self.student_head})
        self.optimizer = make_optimizer(optimizer, params_groups(self._student))

    def state_dicts(self, which: str = "student"):
        bb = self.student_bb if which == "student" else self.teacher_bb
        head = self.student_head if which == "student" else self.teacher_head
        return (
            {f"backbone.{k}": v for k, v in bb.state_dict().items()}
            | {f"head.{k}": v for k, v in head.state_dict().items()}
        )

    def loss_and_grads(self, crops_np, teacher_temp):
        """One forward/backward only — no optimizer, no state mutation.
        Returns (loss, {param_name: grad ndarray}) for raw-gradient parity."""
        crops = [torch.tensor(np.moveaxis(c, -1, 1)).contiguous() for c in crops_np]
        teacher_out = multicrop_forward(
            self.teacher_bb, self.teacher_head, crops[: self.n_globals]
        )
        student_out = multicrop_forward(self.student_bb, self.student_head, crops)
        loss, _ = dino_loss_torch(
            student_out, teacher_out, self.center, len(crops), self.n_globals,
            teacher_temp, self.student_temp, self.center_momentum,
        )
        self._student.zero_grad(set_to_none=True)
        loss.backward()
        grads = {
            n: p.grad.detach().numpy().copy()
            for n, p in self._student.named_parameters()
            if p.grad is not None
        }
        return float(loss.detach()), grads

    def step(self, crops_np, it, epoch, lr, wd, ema_m, teacher_temp):
        """One reference train step. crops_np: list of (B, S, S, 3) float32
        numpy arrays, globals first. Returns the loss value."""
        crops = [torch.tensor(np.moveaxis(c, -1, 1)).contiguous() for c in crops_np]
        for i, group in enumerate(self.optimizer.param_groups):
            group["lr"] = lr
            if i == 0:
                group["weight_decay"] = wd

        teacher_out = multicrop_forward(
            self.teacher_bb, self.teacher_head, crops[: self.n_globals]
        )
        student_out = multicrop_forward(self.student_bb, self.student_head, crops)
        loss, self.center = dino_loss_torch(
            student_out, teacher_out, self.center, len(crops), self.n_globals,
            teacher_temp, self.student_temp, self.center_momentum,
        )

        self.optimizer.zero_grad(set_to_none=True)
        loss.backward()
        if self.clip_grad:
            clip_gradients(self._student, self.clip_grad)
        cancel_gradients_last_layer(epoch, self._student, self.freeze_last_layer)
        self.optimizer.step()

        with torch.no_grad():
            for pq, pk in zip(
                list(self.student_bb.parameters()) + list(self.student_head.parameters()),
                list(self.teacher_bb.parameters()) + list(self.teacher_head.parameters()),
            ):
                pk.mul_(ema_m).add_((1 - ema_m) * pq.detach())
        return float(loss.detach())
