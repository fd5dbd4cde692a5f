"""dinomc_tpu — TPU-native DINO-MC framework for aerial imagery.

Public API is organized by subpackage (import lazily to keep CLI startup
light):

  core/        mesh + sharding, schedules, workspace config
  models/      vit, xcit, resnet, swin, dino_head, upernet, siamese, encoders
  ops/         on-device augmentation, spatial warps, attention (+ pallas)
  objectives/  dino, segmentation/classification losses
  train/       dino/seg/cls/oscd trainers + optim
  data/        datasets, loaders, patching, native IO
  eval/        metrics, knn, linear probe, retrieval, tiled inference
  ckpt/        orbax IO, torch import
  parallel/    multi-host helpers
  utils/       logging, visualization, video, profiling
"""

__version__ = "0.1.0"

__all__ = [
    "core", "models", "ops", "objectives", "train", "data", "eval", "ckpt",
    "parallel", "utils", "cli",
]
