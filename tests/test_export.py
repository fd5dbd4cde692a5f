"""Serving-export tests (jax.export round trip) + TensorBoard logger gate."""

import jax
import jax.numpy as jnp
import numpy as np

from dinomc_tpu.ckpt import export as ex

import pytest

pytestmark = pytest.mark.slow  # seg/cls model export integration


def test_export_roundtrip_simple(tmp_path):
    w = jnp.asarray(np.random.RandomState(0).randn(8, 4).astype(np.float32))

    def fn(x):
        return jnp.tanh(x @ w)

    path = str(tmp_path / "fn.stablehlo")
    size = ex.export_fn(fn, (jnp.zeros((2, 8)),), path)
    assert size > 0
    call = ex.load_exported(path)
    x = jnp.asarray(np.random.RandomState(1).randn(2, 8).astype(np.float32))
    np.testing.assert_allclose(np.asarray(call(x)), np.asarray(fn(x)), atol=1e-6)


def test_export_seg_model(tmp_path):
    from dinomc_tpu.models.upernet import UPerNetConfig
    from dinomc_tpu.train.seg_trainer import SegConfig, init_seg_train_state

    cfg = SegConfig(model=UPerNetConfig(num_classes=3, arch="vit_tiny", patch_size=8))
    state = init_seg_train_state(jax.random.PRNGKey(0), cfg)
    path = str(tmp_path / "seg.stablehlo")
    size = ex.export_seg_model(
        state.params, state.bn_state, cfg, path, image_size=32, batch=1
    )
    assert size > 0
    call = ex.load_exported(path)
    out = call(jnp.ones((1, 32, 32, 3)))
    assert out.shape == (1, 32, 32, 3)


def test_tensorboard_logger_gated(tmp_path):
    from dinomc_tpu.utils.logging import TensorBoardLogger

    tb = TensorBoardLogger(str(tmp_path / "tb"))
    # must not raise whether or not tensorboard is installed
    tb.scalar("loss", 1.0, 0)
    tb.image("img", np.zeros((4, 4, 3), np.float32), 0)
    tb.close()


def test_wandb_logger_gated():
    from dinomc_tpu.utils.logging import WandbLogger

    # disabled: never touches wandb
    wb = WandbLogger("proj", enabled=False)
    assert not wb.active
    wb.log({"x": 1.0}, step=0)
    wb.finish()
    # enabled but wandb unavailable/unconfigured: silently inactive
    wb = WandbLogger("proj", name="run", config={"a": 1}, enabled=True)
    wb.log({"x": 1.0}, step=0)
    wb.finish()
