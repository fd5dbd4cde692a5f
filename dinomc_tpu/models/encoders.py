"""Encoder registry: one interface over ViT / ResNet-50 / WRN-50-2 / Swin-T.

The reference instantiates backbones by name and sniffs the embedding dim
from the fc/head weight shape (``main_dino_mc.py:209-229``,
``main_eurosat.py:32-48``). Here each architecture exposes
``init(key) -> (params, state)`` and
``apply(params, state, x, train, rng) -> (embeddings, new_state)`` where
``state`` is the (possibly empty) BatchNorm running-stats tree — so the
DINO/classification trainers are architecture-agnostic. BN batch stats
reduce globally under SPMD (SyncBN parity, ``main_dino_mc.py:250-252``).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from dinomc_tpu.models import resnet as rn
from dinomc_tpu.models import swin as sw
from dinomc_tpu.models import vit as vt
from dinomc_tpu.models import xcit as xc

Params = Any


@dataclasses.dataclass(frozen=True)
class EncoderConfig:
    arch: str  # vit_tiny|vit_small|vit_base|resnet50|wide_resnet50_2|swin_t
    patch_size: int = 16  # ViT only
    img_size: int = 224
    drop_path_rate: float = 0.0  # ViT student only
    remat_policy: str = "attn"  # ViT only; see models/vit.ViTConfig
    # bf16 is the TPU training default; float32 is used by the torch-oracle
    # parity tests (tests/test_step_oracle.py) and strict-import paths.
    compute_dtype: Any = jnp.bfloat16
    gelu_approx: bool = True  # ViT/Swin/XCiT; False = exact erf (torch parity)
    # ViT attention dispatch (models/vit.ViTConfig.attn_impl): 'auto' picks
    # the Pallas kernels on TPU; 'dense' forces the XLA einsum form (used
    # by the FLOP counter, whose jaxpr walk cannot see into pallas_call)
    attn_impl: str = "auto"

    @property
    def is_vit(self) -> bool:
        return self.arch.startswith("vit_")

    @property
    def has_bn(self) -> bool:
        return self.arch in ("resnet50", "wide_resnet50_2", "resnet_test")

    @property
    def supports_packing(self) -> bool:
        """ViT only: plain global attention packs losslessly with a
        block-diagonal mask. Convnets/Swin/XCiT have spatial ops (conv,
        shifted windows, LPI) that would mix packed crops."""
        return self.is_vit

    @property
    def embed_dim(self) -> int:
        if self.is_vit:
            return {
                "vit_tiny": 192, "vit_small": 384, "vit_base": 768, "vit_test": 32,
            }[self.arch]
        if self.has_bn:
            return 2048
        if self.arch == "swin_t":
            return 768
        if self.arch.startswith("xcit"):
            return {"xcit_small_12": 384, "xcit_medium_24": 512}[self.arch]
        raise ValueError(self.arch)

    def _vit_cfg(self) -> vt.ViTConfig:
        return vt.VIT_FACTORIES[self.arch](
            patch_size=self.patch_size,
            img_size=self.img_size,
            drop_path_rate=self.drop_path_rate,
            remat_policy=self.remat_policy,
            compute_dtype=self.compute_dtype,
            gelu_approx=self.gelu_approx,
            attn_impl=self.attn_impl,
        )

    def _rn_cfg(self) -> rn.ResNetConfig:
        return rn.RESNET_FACTORIES[self.arch](compute_dtype=self.compute_dtype)

    def init(self, key: jax.Array) -> Tuple[Params, Params]:
        if self.is_vit:
            return vt.init_vit(key, self._vit_cfg()), {}
        if self.has_bn:
            return rn.init_resnet(key, self._rn_cfg())
        if self.arch == "swin_t":
            return sw.init_swin(key, self._swin_cfg()), {}
        if self.arch.startswith("xcit"):
            return xc.init_xcit(key, self._xcit_cfg()), {}
        raise ValueError(self.arch)

    def _swin_cfg(self) -> sw.SwinConfig:
        return sw.swin_t(
            compute_dtype=self.compute_dtype,
            drop_path_rate=self.drop_path_rate,
            gelu_approx=self.gelu_approx,
        )

    def _xcit_cfg(self) -> "xc.XCiTConfig":
        return xc.XCIT_FACTORIES[self.arch](
            patch_size=self.patch_size,
            compute_dtype=self.compute_dtype,
            drop_path_rate=self.drop_path_rate,
            gelu_approx=self.gelu_approx,
        )

    def apply(
        self,
        params: Params,
        state: Params,
        x: jnp.ndarray,
        train: bool = False,
        rng: Optional[jax.Array] = None,
    ) -> Tuple[jnp.ndarray, Params]:
        """x (B, H, W, 3) -> (B, embed_dim) float32 embeddings."""
        if self.is_vit:
            out = vt.vit_forward(params, x, self._vit_cfg(), rng, not train)
            return out, state
        if self.has_bn:
            return rn.resnet_forward(params, state, x, self._rn_cfg(), train)
        if self.arch == "swin_t":
            return sw.swin_forward(
                params, x, self._swin_cfg(), not train, rng
            ), state
        if self.arch.startswith("xcit"):
            return xc.xcit_forward(
                params, x, self._xcit_cfg(), rng, not train
            ), state
        raise ValueError(self.arch)

    def apply_multi(
        self,
        params: Params,
        state: Params,
        xs,
        train: bool = False,
        rng: Optional[jax.Array] = None,
    ):
        """ANY number of crop batches in ONE merged-GEMM forward (ViT
        only): exactly ``apply`` per batch, but qkv/proj/MLP run as single
        large-M GEMMs over the concatenated token stream
        (``models/vit.vit_forward_multi``). Returns (list_of_feats, state)."""
        if not self.supports_packing:
            raise ValueError(f"{self.arch} does not support bucket merging")
        feats = vt.vit_forward_multi(params, xs, self._vit_cfg(), rng, not train)
        return list(feats), state

    def apply_packed(
        self,
        params: Params,
        state: Params,
        xa: jnp.ndarray,
        xb: jnp.ndarray,
        train: bool = False,
        rng: Optional[jax.Array] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, Params]:
        """Two crop batches in ONE packed forward (ViT only): exactly
        ``apply(xa)`` + ``apply(xb)`` but half the kernel launches."""
        if not self.supports_packing:
            raise ValueError(f"{self.arch} does not support crop packing")
        fa, fb = vt.vit_forward_packed(
            params, xa, xb, self._vit_cfg(), rng, not train
        )
        return fa, fb, state


ENCODER_ARCHS = (
    "vit_tiny", "vit_small", "vit_base", "resnet50", "wide_resnet50_2",
    "swin_t", "xcit_small_12", "xcit_medium_24",
)
