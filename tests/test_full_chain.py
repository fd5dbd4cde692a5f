"""Full-chain workflow wiring (scripts/full_chain.py): pretrain ->
backbone .pth export -> decoder-only seg fine-tune (torch-import path) ->
tiled inference + stitched mIoU, on a tiny synthetic world.

Quality (the mIoU bar + pretrained-beats-random margin) is asserted by the
script's default-size run on real hardware (docs/performance.md records
the numbers); this test proves every stage composes.
"""

import json
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow  # runs 4 CLI stages end to end (~5 min CPU)

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_full_chain_smoke(tmp_path):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    out = subprocess.run(
        [sys.executable, os.path.join(_REPO, "scripts", "full_chain.py"),
         "--workdir", str(tmp_path), "--smoke",
         "--pretrain_steps", "2", "--pretrain_batch", "8",
         "--seg_epochs", "1", "--scenes", "4", "--corpus", "16",
         "--scene_size", "128", "--seg_image_size", "64",
         "--arch", "vit_tiny", "--patch_size", "16"],
        capture_output=True, text=True, timeout=560, env=env, cwd=_REPO,
    )
    assert out.returncode == 0, out.stdout[-3000:] + out.stderr[-3000:]
    with open(tmp_path / "full_chain.json") as f:
        result = json.load(f)
    # wiring contract: every stage produced a number
    assert 0.0 <= result["value"] <= 1.0
    assert "val_miou_pretrained" in result and "val_miou_random_control" in result
    # the margin instrument (dense linear probe) ran for both backbones
    assert "probe_miou_pretrained" in result and "probe_miou_random" in result
    import numpy as np

    # the smoke path runs pretrain (no --reuse), so the loss must be real;
    # guard against the --reuse null so a stale workdir fails cleanly
    assert result["pretrain_loss"] is not None and np.isfinite(
        result["pretrain_loss"]
    )
    # artifacts of each stage exist
    assert os.path.exists(tmp_path / "teacher.pth")
    assert os.path.isdir(tmp_path / "seg_pretrained" / "checkpoints")
