"""Pallas TPU kernels — the framework's native-kernel tier.

Where the reference ships C++/CUDA extensions (the dcn3d "D3D" module,
SURVEY.md §2.8), the TPU-native equivalent is a Pallas kernel; pure-JAX
reference implementations live next to each kernel for correctness tests and
CPU fallback.
"""
from dualpixelface_tpu.ops.kernels.fused_softargmin import fused_softargmin
