"""FLOP-model sanity: hand-derived golden values for the MFU accounting
(dinomc_tpu/utils/flops.py), so bench.py's MFU number stays auditable."""

from dinomc_tpu.utils import flops


def test_vit_tokens():
    assert flops.vit_tokens(224, 8) == 785
    assert flops.vit_tokens(84, 8) == 101  # floor(84/8)=10 -> 10^2+1


def test_vit_forward_flops_golden():
    # Single block, N=10, D=4, patch 2, mlp_ratio 4:
    # (8+16)*10*16 + 4*100*4 = 3840 + 1600 = 5440
    # patch embed: 2*9*(2*2*3)*4 = 864
    got = flops.vit_forward_flops(10, 4, depth=1, patch_size=2)
    assert got == 5440 + 864


def test_head_flops_golden():
    # 2*(2*8 + 8*8 + 8*4 + 4*16) = 2*176 = 352
    got = flops.dino_head_forward_flops(2, hidden_dim=8, bottleneck_dim=4, out_dim=16)
    assert got == 352


def test_step_flops_matches_verdict_estimate():
    # The independently-derived estimate in VERDICT.md is ~615 GFLOPs/img
    # for the flagship ViT-S/8 step; the model must land in that ballpark.
    f = flops.dino_step_flops_per_image()
    assert 5.8e11 < f < 6.6e11


def test_step_composition():
    # teacher = 2 fwd(224); student = 3*(2 fwd(224) + sum fwd(locals))
    def fwd(s):
        return flops.vit_forward_flops(
            flops.vit_tokens(s, 8), 384, 12, 8
        ) + flops.dino_head_forward_flops(384)

    locals_ = (184, 164, 144, 124, 104, 84)
    expect = 2 * fwd(224) + 3 * (2 * fwd(224) + sum(fwd(s) for s in locals_))
    assert flops.dino_step_flops_per_image() == expect


def test_mfu():
    assert flops.mfu(100.0, 1e12, 2e14) == 0.5
