"""Torch checkpoint EXPORT: param trees -> reference-format .pth files.

Round-trip property: export then re-import through the (torch-oracle-
verified) ``ckpt/torch_import`` mappings must reproduce the original tree
exactly — so anything the reference's ``load_pretrained_weights`` does with
our exported files matches what this framework computes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # torch round-trip export of full encoders

from dinomc_tpu.ckpt import torch_export, torch_import


def _trees_equal(a, b):
    la, ta = jax.tree_util.tree_flatten(a)
    lb, tb = jax.tree_util.tree_flatten(b)
    assert ta == tb, f"structure mismatch:\n{ta}\nvs\n{tb}"
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-6)


def test_vit_export_roundtrip():
    from dinomc_tpu.models.vit import init_vit, vit_tiny

    cfg = vit_tiny(patch_size=8, img_size=32)
    params = init_vit(jax.random.PRNGKey(0), cfg)
    sd = torch_export.vit_state_dict(params)
    back = torch_import.vit_params_from_torch(sd, depth=cfg.depth)
    _trees_equal(params, back)


def test_dino_head_export_roundtrip():
    from dinomc_tpu.models.dino_head import DINOHeadConfig, init_dino_head

    cfg = DINOHeadConfig(in_dim=32, hidden_dim=48, bottleneck_dim=16, out_dim=64)
    params = init_dino_head(jax.random.PRNGKey(1), cfg)
    sd = torch_export.dino_head_state_dict(params)
    # torch Sequential indices must skip the GELU slots (0, 2, 4).
    assert {k for k in sd if k.startswith("mlp.")} == {
        "mlp.0.weight", "mlp.0.bias", "mlp.2.weight", "mlp.2.bias",
        "mlp.4.weight", "mlp.4.bias",
    }
    assert sd["last_layer.weight_g"].shape == (64, 1)
    back = torch_import.dino_head_params_from_torch(sd)
    _trees_equal(params, back)


def test_resnet_export_roundtrip():
    from dinomc_tpu.models.resnet import init_resnet, resnet50

    params, state = init_resnet(jax.random.PRNGKey(2), resnet50())
    sd = torch_export.resnet_state_dict(params, state)
    bp, bs = torch_import.resnet_params_from_torch(sd)
    _trees_equal(params, bp)
    _trees_equal(state, bs)


def test_swin_export_roundtrip():
    from dinomc_tpu.models.swin import init_swin, swin_t

    params = init_swin(jax.random.PRNGKey(3), swin_t())
    sd = torch_export.swin_state_dict(params)
    back = torch_import.swin_params_from_torch(sd)
    _trees_equal(params, back)


def test_export_dino_checkpoint_reference_layout(tmp_path):
    """The full pretrain export reads back through the reference's loading
    convention: 'teacher' key -> strip prefixes -> backbone tree; and the
    student carries DDP's module. prefix (main_dino_mc.py:333-343)."""
    import torch

    from dinomc_tpu.train.dino_trainer import DinoConfig, init_dino_train_state

    cfg = DinoConfig(arch="vit_tiny", patch_size=8, out_dim=64,
                     global_crop_size=32)
    state = init_dino_train_state(jax.random.PRNGKey(4), cfg)
    out = str(tmp_path / "dino.pth")
    torch_export.export_dino_checkpoint(
        out, "vit_tiny",
        student=state.student, teacher=state.teacher,
        epoch=7, center=state.center,
    )

    raw = torch.load(out, map_location="cpu", weights_only=False)
    assert raw["epoch"] == 7
    assert all(k.startswith("module.") for k in raw["student"])
    assert raw["dino_loss"]["center"].shape == (1, 64)

    back = torch_import.load_dino_backbone(out, "teacher", depth=12)
    _trees_equal(state.teacher["backbone"], back)
    # student side loads the same way under its DDP prefix
    back_s = torch_import.load_dino_backbone(out, "student", depth=12)
    _trees_equal(state.student["backbone"], back_s)


def test_export_backbone_and_convert_cli(tmp_path):
    """orbax train-state dir -> convert_ckpt CLI -> .pth that the import
    path (cli.common.load_pretrained_backbone) accepts."""
    from dinomc_tpu.ckpt.orbax_io import save_pytree
    from dinomc_tpu.cli import convert_ckpt as mod
    from dinomc_tpu.train.dino_trainer import DinoConfig, init_dino_train_state

    cfg = DinoConfig(arch="vit_tiny", patch_size=8, out_dim=64,
                     global_crop_size=32)
    state = init_dino_train_state(jax.random.PRNGKey(5), cfg)
    ckpt_dir = str(tmp_path / "ckpts" / "42")
    save_pytree(ckpt_dir, state)

    out = str(tmp_path / "export.pth")
    p = mod.get_args_parser()
    args = p.parse_args(["--ckpt", str(tmp_path / "ckpts"), "--out", out])
    args.arch = "vit_tiny"
    mod.run(args)

    back = torch_import.load_dino_backbone(out, "teacher", depth=12)
    _trees_equal(state.teacher["backbone"], back)

    # backbone-only export of the student tower
    out2 = str(tmp_path / "student_backbone.pth")
    args2 = p.parse_args([
        "--ckpt", str(tmp_path / "ckpts"), "--out", out2,
        "--what", "backbone", "--source", "student",
        "--checkpoint_key", "teacher",
    ])
    args2.arch = "vit_tiny"
    mod.run(args2)
    back2 = torch_import.load_dino_backbone(out2, "teacher", depth=12)
    _trees_equal(state.student["backbone"], back2)


def test_export_convnet_dino_checkpoint(tmp_path):
    """ResNet DINO export carries BN running stats both towers."""
    from dinomc_tpu.train.dino_trainer import DinoConfig, init_dino_train_state

    cfg = DinoConfig(arch="resnet50", out_dim=64, global_crop_size=32)
    state = init_dino_train_state(jax.random.PRNGKey(6), cfg)
    out = str(tmp_path / "rn50.pth")
    torch_export.export_dino_checkpoint(
        out, "resnet50",
        student=state.student, teacher=state.teacher,
        student_state=state.student_state, teacher_state=state.teacher_state,
        epoch=1, center=state.center,
    )
    sd = torch_import.load_torch_state_dict(out, "teacher")
    bp, bs = torch_import.resnet_params_from_torch(sd)
    _trees_equal(state.teacher["backbone"], bp)
    _trees_equal(state.teacher_state, bs)


def test_upernet_export_import_roundtrip():
    """Native UPerNet <-> mmseg UPerNetDinoMC state-dict keys, both ways."""
    from dinomc_tpu.models.upernet import UPerNetConfig, init_upernet

    cfg = UPerNetConfig(num_classes=6, arch="vit_tiny", patch_size=8,
                        channels=32, aux_channels=16)
    params, state = init_upernet(jax.random.PRNGKey(7), cfg)
    sd = torch_export.upernet_state_dict(params, state)

    # mmseg naming spot checks (networks.py:244-317 config -> mmseg modules)
    for k in [
        "backbone.vit.blocks.0.attn.qkv.weight",
        "backbone.vit.patch_embed.proj.weight",
        "decode_head.psp_modules.0.1.conv.weight",
        "decode_head.psp_modules.3.1.bn.running_var",
        "decode_head.bottleneck.conv.weight",
        "decode_head.lateral_convs.2.bn.weight",
        "decode_head.fpn_convs.0.conv.weight",
        "decode_head.fpn_bottleneck.conv.weight",
        "decode_head.conv_seg.bias",
        "auxiliary_head.convs.0.conv.weight",
        "auxiliary_head.conv_seg.weight",
    ]:
        assert k in sd, k
    # ConvModule convs are bias-free (BN follows); conv_seg keeps its bias
    assert "decode_head.bottleneck.conv.bias" not in sd
    assert sd["decode_head.conv_seg.weight"].shape == (6, 32, 1, 1)

    bp, bs = torch_import.upernet_params_from_torch(sd)
    _trees_equal(params, bp)
    _trees_equal(state, bs)


def test_upernet_export_roundtrip_with_neck():
    from dinomc_tpu.models.upernet import UPerNetConfig, init_upernet

    cfg = UPerNetConfig(num_classes=4, arch="vit_tiny", patch_size=8,
                        channels=16, aux_channels=8, use_fpn_neck=True)
    params, state = init_upernet(jax.random.PRNGKey(8), cfg)
    sd = torch_export.upernet_state_dict(params, state)
    assert "neck.lateral_convs.0.conv.weight" in sd
    assert "neck.fpn_convs.3.conv.bias" in sd
    bp, bs = torch_import.upernet_params_from_torch(sd)
    _trees_equal(params, bp)
    _trees_equal(state, bs)


def test_seg_checkpoint_file_roundtrip(tmp_path):
    """export_seg_checkpoint writes the reference trainer's layout
    (train_dino_mc_seg.py:190-197) and load_upernet_checkpoint reads it."""
    import torch

    from dinomc_tpu.models.upernet import UPerNetConfig, init_upernet

    cfg = UPerNetConfig(num_classes=6, arch="vit_tiny", patch_size=8,
                        channels=32, aux_channels=16)
    params, state = init_upernet(jax.random.PRNGKey(9), cfg)
    out = str(tmp_path / "seg.pth")
    torch_export.export_seg_checkpoint(out, params, state, epoch=3,
                                       best_miou=0.5)
    raw = torch.load(out, map_location="cpu", weights_only=False)
    assert raw["epoch"] == 3 and raw["best_miou"] == 0.5
    assert "model_state_dict" in raw

    bp, bs = torch_import.load_upernet_checkpoint(out)
    _trees_equal(params, bp)
    _trees_equal(state, bs)


def test_cls_export_import_roundtrip_vit():
    """Fine-tuned classifier export: ViT backbone + 'head' linear
    (vision_transformer.py:159 naming)."""
    from dinomc_tpu.train.cls_trainer import ClsConfig, init_cls_train_state

    cfg = ClsConfig(arch="vit_tiny", patch_size=8, num_classes=10)
    state = init_cls_train_state(jax.random.PRNGKey(10), cfg)
    sd = torch_export.cls_state_dict("vit_tiny", state.params)
    assert sd["head.weight"].shape == (10, 192)
    params, _ = torch_import.cls_params_from_torch(sd, "vit_tiny")
    _trees_equal(state.params, params)


def test_cls_checkpoint_file_roundtrip_resnet(tmp_path):
    """ResNet classifier checkpoint in the reference main_eurosat.py layout,
    with the classifier at 'fc' and BN running stats carried through."""
    import torch

    from dinomc_tpu.train.cls_trainer import ClsConfig, init_cls_train_state

    cfg = ClsConfig(arch="resnet50", num_classes=5)
    state = init_cls_train_state(jax.random.PRNGKey(11), cfg)
    out = str(tmp_path / "luc_checkpoint_best.pth.tar")
    torch_export.export_cls_checkpoint(
        out, "resnet50", state.params, state.bn_state, epoch=2, best_acc=77.5
    )
    raw = torch.load(out, map_location="cpu", weights_only=False)
    assert raw["epoch"] == 2 and raw["best_acc"] == 77.5
    assert "fc.weight" in raw["state_dict"]

    params, bn = torch_import.load_cls_checkpoint(out, "resnet50")
    _trees_equal(state.params, params)
    _trees_equal(state.bn_state, bn)
