"""STEREODPNET_PLUS — the TPU-native fast variant of StereoDPNet.

The reference reserves `src/model/stereodpnet_plus/` as an empty stub
(0-byte mainmodel/modules, '{}' config); per ROADMAP.md this build makes it
the named home of the TPU-only improvements, as a config-specialization of
the same architecture (identical parameter tree — checkpoints interchange
freely with `stereodpnet`):

  * `deform_impl='pallas'` — the windowed Mosaic deformable-conv gather
    (ops/kernels/deform_fused.py, one-hot-matmul sampling);
  * `fused_regression=true` — the Pallas fused softargmin
    (ops/kernels/fused_softargmin.py), which never materializes the x64
    upsampled logit/probability volumes (eval/serving path);
  * bf16-friendly defaults (precision handled by the trainer policy).

config.json carries stereodpnet's full model config with the fast-path flags
set, loaded through the same 4-layer merge the reference uses.
"""
from __future__ import annotations

from dualpixelface_tpu.models import register_model
from dualpixelface_tpu.models.stereodpnet.mainmodel import STEREODPNET


@register_model("stereodpnet_plus")
class STEREODPNET_PLUS(STEREODPNET):
    """Same Flax module tree as STEREODPNET (parameters interchange);
    only the compute-path selection differs via config defaults."""
