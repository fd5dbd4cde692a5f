"""End-to-end CLI smoke tests: every training entry point runs a couple of
optimizer steps on its built-in synthetic dataset (no downloads, CPU mesh).

This is the wiring-level coverage the reference lacked entirely (SURVEY.md
§4): argparse -> data -> mesh placement -> jitted step -> checkpoint/log
paths, per workload.
"""

import sys

import jax
import pytest

pytestmark = pytest.mark.slow  # end-to-end CLI train loops


@pytest.fixture(autouse=True)
def _fresh_jax_caches():
    """Each CLI test jits large unique programs (full train steps over
    several crop sets / shard_map meshes) with no reuse across tests.
    XLA:CPU has been observed to abort mid-suite from accumulated LLVM JIT
    state (conftest clears only between modules); clearing per test inside
    this heaviest module bounds it."""
    yield
    jax.clear_caches()


def _args(mod, overrides):
    p = mod.get_args_parser()
    args = p.parse_args([])
    for k, v in overrides.items():
        assert hasattr(args, k), f"unknown arg {k}"
        setattr(args, k, v)
    return args


def test_train_dino_cli(tmp_path):
    from dinomc_tpu.cli import train_dino as mod

    args = _args(mod, dict(
        arch="vit_tiny", patch_size=16, out_dim=128,
        batch_size_per_gpu=1, epochs=1, max_steps=2,
        local_crops_number=2, size_crops=[96, 64],
        warmup_epochs=0, output_dir=str(tmp_path),
        image_size=128, print_freq=1, num_workers=0,
    ))
    loss = mod.train_dino(args)
    assert loss == loss  # finite / not NaN


def test_train_dino_cli_model_parallel(tmp_path):
    """Same entry point with the tensor-parallel 'model' axis enabled."""
    from dinomc_tpu.cli import train_dino as mod

    args = _args(mod, dict(
        arch="vit_tiny", patch_size=16, out_dim=128,
        batch_size_per_gpu=1, epochs=1, max_steps=1,
        local_crops_number=2, size_crops=[96, 64],
        warmup_epochs=0, output_dir=str(tmp_path),
        image_size=128, print_freq=1, num_workers=0,
        model_parallel=2,
    ))
    loss = mod.train_dino(args)
    assert loss == loss


def test_train_dino_cli_temporal(tmp_path):
    """DINO-TP mode: (B, 4, H, W, 3) temporal batches, view transpose and
    photometric pre-augmentation inside the jit (batch_first path)."""
    from dinomc_tpu.cli import train_dino as mod

    args = _args(mod, dict(
        arch="vit_tiny", patch_size=16, out_dim=128,
        batch_size_per_gpu=1, epochs=1, max_steps=1,
        local_crops_number=2, size_crops=[96, 64],
        warmup_epochs=0, output_dir=str(tmp_path),
        image_size=128, print_freq=1, num_workers=0,
        data_mode="tp",
    ))
    loss = mod.train_dino(args)
    assert loss == loss


def test_train_dino_cli_bands(tmp_path):
    """Multispectral pretraining: --bands B4 B3 B2 over a SeCo-layout tree
    of uint16 per-band tifs (reference main_dino_mc.py --bands; data path
    dino_dataset.py:69-87), end to end through the jitted step."""
    import os

    import numpy as np
    from PIL import Image

    # >= 8 locations: the test mesh has 8 virtual devices, so the global
    # batch is 8 and a smaller corpus yields zero full batches
    data = tmp_path / "seco"
    rng = np.random.RandomState(0)
    for loc in range(8):
        for t in range(2):
            d = data / f"{loc:03d}" / f"t{t}"
            os.makedirs(d)
            for b in ("B2", "B3", "B4"):
                Image.fromarray(
                    rng.randint(0, 160, (128, 128)).astype(np.uint16), mode="I;16"
                ).save(d / f"{b}.tif")

    from dinomc_tpu.cli import train_dino as mod

    args = _args(mod, dict(
        arch="vit_tiny", patch_size=16, out_dim=128,
        batch_size_per_gpu=1, epochs=1, max_steps=1,
        local_crops_number=2, size_crops=[96, 64],
        warmup_epochs=0, output_dir=str(tmp_path / "out"),
        image_size=128, print_freq=1, num_workers=0,
        data_path=str(data), bands=["B4", "B3", "B2"],
    ))
    loss = mod.train_dino(args)
    assert loss == loss


def test_train_dino_cli_packed(tmp_path):
    """Packed-shard data path: pack a tiny PNG tree, train from the packed
    dir (uint8 to device, f32 conversion inside the augment jit)."""
    import os

    import numpy as np
    from PIL import Image

    from dinomc_tpu.data.packed import pack_dataset

    src = tmp_path / "src"
    rng = np.random.RandomState(0)
    for loc in range(8):  # 8 groups >= the 8-device global batch
        d = src / f"loc{loc}"
        os.makedirs(d)
        for t in range(2):
            Image.fromarray(
                rng.randint(0, 255, (128, 128, 3), np.uint8)
            ).save(d / f"t{t}.png")
    pk = tmp_path / "packed"
    pack_dataset(str(src), str(pk), size=128)

    from dinomc_tpu.cli import train_dino as mod

    args = _args(mod, dict(
        arch="vit_tiny", patch_size=16, out_dim=128,
        batch_size_per_gpu=1, epochs=1, max_steps=1,
        local_crops_number=2, size_crops=[96, 64],
        warmup_epochs=0, output_dir=str(tmp_path / "out"),
        image_size=128, print_freq=1, num_workers=0,
        data_path=str(pk),
    ))
    loss = mod.train_dino(args)
    assert loss == loss


def test_train_dino_cli_grad_accum(tmp_path):
    """Gradient accumulation: 2 microbatches per optimizer step."""
    from dinomc_tpu.cli import train_dino as mod

    args = _args(mod, dict(
        arch="vit_tiny", patch_size=16, out_dim=128,
        batch_size_per_gpu=2, epochs=1, max_steps=1,
        local_crops_number=2, size_crops=[96, 64],
        warmup_epochs=0, output_dir=str(tmp_path),
        image_size=128, print_freq=1, num_workers=0,
        grad_accum_steps=2,
    ))
    loss = mod.train_dino(args)
    assert loss == loss


def test_eurosat_cli(tmp_path):
    from dinomc_tpu.cli import eurosat as mod

    args = _args(mod, dict(
        arch="vit_tiny", patch_size=16, epochs=1, max_steps=2,
        batch_size_per_gpu=2, output_dir=str(tmp_path), print_freq=1,
    ))
    acc = mod.run(args)
    assert 0.0 <= acc <= 100.0


def test_bigearthnet_cli(tmp_path):
    from dinomc_tpu.cli import bigearthnet as mod

    args = _args(mod, dict(
        arch="vit_tiny", patch_size=16, epochs=1, max_steps=2,
        batch_size_per_gpu=2, image_size=64, output_dir=str(tmp_path),
        print_freq=1,
    ))
    m = mod.run(args)
    assert 0.0 <= m <= 100.0


def test_oscd_cli(tmp_path):
    from dinomc_tpu.cli import oscd as mod

    args = _args(mod, dict(
        epochs=1, max_steps=2, batch_size=4, output_dir=str(tmp_path),
        print_freq=1, panel_samples=3,
    ))
    f1 = mod.run(args)
    assert 0.0 <= f1 <= 100.0
    # per-epoch (img1|img2|gt|pred) panels — reference main_oscd.py:54-78
    panels = sorted((tmp_path / "panels" / "epoch_000").glob("*.png"))
    assert len(panels) == 3
    assert all(p.stat().st_size > 0 for p in panels)


def test_oscd_eval_batches_cover_every_sample():
    """Regression (r4 advisor): with trim=False the final partial batch must
    be yielded — previously up to global_batch-1 tail samples were silently
    dropped from the F1 computation whenever len(val) wasn't a multiple of
    the global batch."""
    import numpy as np

    from dinomc_tpu.cli.oscd import iter_index_batches

    # 23 samples, global batch 8 (n_dev 4): eval must see all 23.
    chunks = list(iter_index_batches(np.arange(23), 8, 4, False, 0, trim=False))
    assert [len(c) for c in chunks] == [8, 8, 7]
    assert sorted(np.concatenate(chunks).tolist()) == list(range(23))
    # train (trim=True): full batches only, each an n_dev multiple
    chunks = list(iter_index_batches(np.arange(23), 8, 4, False, 0, trim=True))
    assert [len(c) for c in chunks] == [8, 8]
    # train set smaller than one global batch still yields a (trimmed) batch
    chunks = list(iter_index_batches(np.arange(6), 8, 4, False, 0, trim=True))
    assert [len(c) for c in chunks] == [4]


def test_train_seg_cli(tmp_path):
    from dinomc_tpu.cli import train_seg as mod

    args = _args(mod, dict(
        arch="vit_tiny", patch_size=16, image_size=64, epochs=1,
        max_steps=2, batch_size=2, output_dir=str(tmp_path), print_freq=1,
    ))
    miou = mod.train_seg(args)
    assert 0.0 <= miou <= 100.0


def test_evaluate_stitched_cli(tmp_path):
    """Tiled inference + stitched eval + reference-format logit export, with
    the sequence-parallel backbone enabled."""
    import json
    import os

    from dinomc_tpu.cli import evaluate_stitched as mod

    args = _args(mod, dict(
        arch="vit_tiny", patch_size=16, model_size=64, grid=[2, 2],
        export_logits_dir=str(tmp_path / "logits"), limit=1, seq_parallel=2,
    ))
    scores = mod.run(args)
    assert 0.0 <= scores["miou"] <= 1.0
    meta = json.load(open(tmp_path / "logits" / "patches_metadata.json"))
    assert len(meta) == 4  # 2x2 grid of one image
    assert len([f for f in os.listdir(tmp_path / "logits") if f.endswith(".npy")]) == 4


def test_predict_cli(tmp_path):
    import numpy as np
    from PIL import Image

    from dinomc_tpu.cli import predict as mod

    img_path = str(tmp_path / "img.png")
    Image.fromarray(
        (np.random.RandomState(0).rand(96, 128, 3) * 255).astype("uint8")
    ).save(img_path)
    p = mod.get_args_parser()
    args = p.parse_args(["--image", img_path])
    for k, v in dict(
        arch="vit_tiny", patch_size=16, model_size=64,
        out=str(tmp_path / "pred.png"), figure=str(tmp_path / "fig.png"),
    ).items():
        setattr(args, k, v)
    pred = mod.run(args)
    assert pred.shape == (96, 128)
    assert (tmp_path / "pred.png").exists()
    assert (tmp_path / "fig.png").exists()


def test_train_seg_cli_seq_parallel(tmp_path):
    """Seg training with the ViT token axis sharded over 'seq' (ring
    attention), backbone trainable so grads flow through the ppermute ring.

    Runs as a REAL subprocess CLI invocation: (a) it exercises the actual
    ``python -m`` entry point, and (b) this is the largest shard_map grad
    compile in the suite — in-process it reliably aborts XLA:CPU from
    accumulated LLVM JIT state at the end of this (heaviest) module, even
    with per-test cache clearing.

    Uses a 4-device (data=1, seq=4) mesh rather than the suite's usual 8:
    with data>1 the SPMD partitioner inserts a data<->seq resharding
    all-to-all alongside the ring ppermute, and XLA:CPU's in-process
    communicator can rendezvous those two collectives in divergent order
    across device threads on an oversubscribed host (observed hard
    deadlock at nproc=1) — a CPU-runtime race, not a sharding bug; the
    data>1 case is covered on the real collective path by
    __graft_entry__.dryrun_multichip.

    On a single-core host the rendezvous is additionally subject to
    XLA:CPU's deadlock-detection timeout: with N device threads time-shared
    on one core under concurrent suite load, a thread can miss the
    rendezvous window and the runtime SIGABRTs the process. Observed
    in-suite at nproc=1 with seq=4 while the same invocation passes in
    isolation. Mitigation: seq=2 on 1-core hosts (the ring ppermute +
    grad accumulation across shards is shard-count-generic, and test_sp.py
    covers 4- and 8-shard rings in-process) and a retry when the subprocess
    dies by SIGNAL — a runtime crash, never a product assertion (Python
    failures exit with a positive code and fail immediately)."""
    import os
    import subprocess

    seq = 2 if (os.cpu_count() or 1) == 1 else 4
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={seq}"
    ).strip()
    cmd = [sys.executable, "-m", "dinomc_tpu.cli.train_seg",
           "--arch", "vit_tiny", "--patch_size", "16", "--image_size", "64",
           "--epochs", "1", "--max_steps", "2", "--batch_size", "2",
           "--output_dir", str(tmp_path), "--print_freq", "1",
           "--seq_parallel", str(seq), "--train_backbone", "true"]
    cwd = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for attempt in range(3):
        proc = subprocess.run(
            cmd, capture_output=True, text=True, env=env, timeout=900, cwd=cwd,
        )
        if proc.returncode >= 0:  # clean exit or Python-level failure
            break
    assert proc.returncode == 0, f"CLI failed:\n{proc.stdout}\n{proc.stderr}"
    assert "best mIoU" in proc.stdout


def test_eurosat_cli_resume_and_evaluate(tmp_path, capsys):
    """Second run in the same output_dir resumes from the saved checkpoint
    (restart_from_checkpoint parity, main_eurosat.py:109-114), and
    --evaluate restores the fine-tuned full model (main_eurosat.py:71-80)."""
    from dinomc_tpu.cli import eurosat as mod

    common = dict(
        arch="vit_tiny", patch_size=16, epochs=2, max_steps=2,
        batch_size_per_gpu=2, output_dir=str(tmp_path), print_freq=1,
    )
    mod.run(_args(mod, common))
    capsys.readouterr()
    mod.run(_args(mod, common))
    assert "resumed from checkpoint" in capsys.readouterr().out

    acc = mod.run(_args(mod, dict(common, evaluate=True)))
    assert 0.0 <= acc <= 100.0


def test_attention_video_cli(tmp_path):
    """Frames-folder -> attention video (GIF fallback when cv2 is absent),
    random weights, tiny ViT."""
    import numpy as np
    from PIL import Image

    from dinomc_tpu.cli import attention_video as mod

    frames_dir = tmp_path / "frames"
    frames_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(3):
        Image.fromarray(
            rng.integers(0, 255, (40, 40, 3), dtype=np.uint8)
        ).save(frames_dir / f"f_{i:03d}.png")

    p = mod.get_args_parser()
    args = p.parse_args(["--input_path", str(frames_dir)])
    for k, v in dict(
        arch="vit_tiny", patch_size=16, image_size=32,
        output_path=str(tmp_path / "attn.mp4"),
        fps=2, batch_size=2,
    ).items():
        setattr(args, k, v)
    out = mod.run(args)
    import os

    assert os.path.exists(out) and os.path.getsize(out) > 0


def test_oscd_cli_city_split(tmp_path):
    """Real OSCD layouts split by the official city lists (no tile leakage
    between train and val)."""
    import numpy as np
    from PIL import Image

    from dinomc_tpu.cli import oscd as mod

    root = tmp_path / "oscd"
    for city in ["beirut", "paris", "brasilia"]:
        d = root / city
        d.mkdir(parents=True)
        rng = np.random.default_rng(abs(hash(city)) % 2**31)
        for name in ["t1.png", "t2.png", "cm.png"]:
            arr = (rng.random((192, 192, 3)) * 255).astype(np.uint8)
            if name == "cm.png":
                arr = (arr[..., 0] > 128).astype(np.uint8) * 255
            Image.fromarray(arr).save(d / name)

    args = _args(mod, dict(
        data_path=str(root), epochs=1, max_steps=1, batch_size=2,
        output_dir=str(tmp_path / "out"),
    ))
    f1 = mod.run(args)
    assert f1 == f1  # ran to completion; beirut+paris train, brasilia val


def test_predict_cli_torch_seg_checkpoint(tmp_path):
    """A reference-format seg .pth (mmseg UPerNetDinoMC state dict) loads
    straight into the predict CLI via --ckpt."""
    import jax
    import numpy as np
    from PIL import Image

    from dinomc_tpu.ckpt.torch_export import export_seg_checkpoint
    from dinomc_tpu.cli import predict as mod
    from dinomc_tpu.models.upernet import UPerNetConfig, init_upernet

    cfg = UPerNetConfig(num_classes=8, arch="vit_tiny", patch_size=16,
                        channels=32, aux_channels=16)
    params, state = init_upernet(jax.random.PRNGKey(0), cfg)
    pth = str(tmp_path / "seg.pth")
    export_seg_checkpoint(pth, params, state, epoch=1)

    img_path = str(tmp_path / "img.png")
    Image.fromarray(
        (np.random.RandomState(1).rand(80, 80, 3) * 255).astype("uint8")
    ).save(img_path)
    p = mod.get_args_parser()
    args = p.parse_args(["--image", img_path])
    for k, v in dict(
        arch="vit_tiny", patch_size=16, model_size=64, ckpt=pth,
        out=str(tmp_path / "pred.png"),
    ).items():
        setattr(args, k, v)
    pred = mod.run(args)
    assert pred.shape == (80, 80)
    assert (tmp_path / "pred.png").exists()


def test_eurosat_cli_evaluate_torch_checkpoint(tmp_path, capsys):
    """--evaluate with a reference-format fine-tuned .pth.tar (full model
    incl. classifier) scores it directly, no orbax run needed."""
    import jax as _jax

    from dinomc_tpu.ckpt.torch_export import export_cls_checkpoint
    from dinomc_tpu.cli import eurosat as mod
    from dinomc_tpu.train.cls_trainer import ClsConfig, init_cls_train_state

    cfg = ClsConfig(arch="vit_tiny", patch_size=16, num_classes=10)
    state = init_cls_train_state(_jax.random.PRNGKey(3), cfg)
    pth = str(tmp_path / "luc_checkpoint_best.pth.tar")
    export_cls_checkpoint(pth, "vit_tiny", state.params, epoch=1, best_acc=10.0)

    args = _args(mod, dict(
        arch="vit_tiny", patch_size=16, batch_size_per_gpu=2,
        output_dir=str(tmp_path), evaluate=True, pretrained_weights=pth,
    ))
    acc = mod.run(args)
    assert 0.0 <= acc <= 100.0
    assert "loaded fine-tuned torch model" in capsys.readouterr().out


def test_oscd_learning_script_smoke(tmp_path):
    """scripts/oscd_learning.py wiring: world build (change pairs on disk
    in OSCD city layout), both fine-tune legs, trajectory artifact."""
    import json
    import os
    import subprocess
    import sys as _sys

    _REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [_sys.executable, os.path.join(_REPO, "scripts", "oscd_learning.py"),
         "--workdir", str(tmp_path), "--cities", "2", "--val_cities", "1",
         "--scene", "288", "--epochs", "2", "--batch_size", "2",
         "--backbone", "resnet_test", "--pretrain_steps", "0", "--smoke"],
        capture_output=True, text=True, timeout=560, env=env, cwd=_REPO,
    )
    assert out.returncode == 0, out.stdout[-3000:] + out.stderr[-3000:]
    with open(tmp_path / "oscd_learning.json") as f:
        result = json.load(f)
    assert len(result["trajectory_f1_pretrained"]) == 2
    assert "f1_random_control" in result
    # the world is on disk in OSCD city layout
    assert os.path.exists(tmp_path / "oscd" / "syncity_000" / "cm.png")
