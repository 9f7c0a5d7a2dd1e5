"""dualpixelface_tpu — a TPU-native framework for dual-pixel facial depth & normal estimation.

A ground-up JAX/Flax/pjit/Pallas re-design with the capabilities of the ECCV'22
DualPixelFace reference framework (MinJunKang/DualPixelFace): a config-driven
training/eval stack with a model zoo (StereoDPNet, PSMNet, DPNet, StereoNet,
NNet, BTS), plug-in dataloader/loss/metric registries, DP geometry utilities,
and TPU-native deformable-3D-convolution kernels.

Layout (outermost to innermost):
  cli/       command-line entry (train / test / demo)
  config/    4-layer JSON config merge -> typed attribute tree
  data/      host-side data pipeline (FaceDP reader, synthetic twin, prefetch)
  models/    model zoo registry (Flax modules + per-model config.json)
  losses/    loss registry (smoothl1, silog, cosine, folded)
  metrics/   metric registry (absolute_dp, affine_dp, normal_dp)
  ops/       NN blocks, ASM sub-pixel shift, cost volumes, Pallas kernels
  parallel/  device mesh + sharding helpers (data-parallel over ICI)
  train/     train state, pjit'd train/eval steps, checkpointing, loop
  utils/     logging, workspace management, small table printer
"""

__version__ = "0.1.0"
