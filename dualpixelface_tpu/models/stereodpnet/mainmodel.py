"""StereoDPNet — the paper's flagship model (ECCV'22).

Parity target: ref `src/model/stereodpnet/mainmodel.py:21-176`:
DPBlock-FPN feature extraction at 1/4 res -> ASM sub-pixel shifted concat
cost volume over `level` disparity planes -> PSMNet 3-hourglass 3-D
aggregation with 3 classifiers + trilinear x4 upsample -> soft-argmin over
4*level bins -> ANM normal branch on the pre-classifier volume.

Outputs: pred_depth [B, n, H, W], prob_depth [B, n, 4*level, H, W],
pred_normal [B, 1, H, W, 3] (channels-last), ref_feature [B, H/4, W/4].
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from dualpixelface_tpu.models import register_model
from dualpixelface_tpu.models.base import select_ref_target
from dualpixelface_tpu.models.stereodpnet.modules import ASMCostVolume, FeatureExtraction
from dualpixelface_tpu.models.stereodpnet.normal_module import ANM
from dualpixelface_tpu.ops.aggregation import PSMNetHGAggregation
from dualpixelface_tpu.ops.cost_volume import regression_disparities, soft_argmin


@register_model("stereodpnet")
class STEREODPNET(nn.Module):
    option: object

    @nn.compact
    def __call__(self, batch: dict, train: bool = False) -> dict:
        opt = self.option.model
        mindisp, maxdisp, level = opt.mindisp, opt.maxdisp, opt.level
        disparities = regression_disparities(mindisp, maxdisp, level, 4)

        feature_extraction = FeatureExtraction(self.option, name="feature_extraction")
        ref_img, tar_img = select_ref_target(batch, self.option)
        # both views through ONE batched tower call (identical weights) —
        # better MXU shapes and half the fixed per-call cost vs the
        # reference's two sequential calls (ref mainmodel.py:86-87).
        # Deviation (documented): train-mode BN batch statistics pool both
        # views instead of being computed per call — same class as the
        # global-batch SyncBN deviation (COMPONENTS.md 2.9); eval is exact.
        b = ref_img.shape[0]
        both_fea = feature_extraction(
            jnp.concatenate([ref_img, tar_img], axis=0), train
        )  # [2B, H/4, W/4, C]
        ref_fea, tar_fea = both_fea[:b], both_fea[b:]

        # remat: the ASM attention otherwise saves its [B*D, 3, H/4, W/4, C]
        # activations per conv for the backward — several GB at the 768x576
        # train crop. Policy 'convs' (default) saves ONLY the mask-head conv
        # inputs/outputs (checkpoint_name tags in ops/asm.py, ~0.5 GB at the
        # b2 768x576 train crop) so the backward re-runs none of the four
        # convs per direction; in the exact/flat attention paths the
        # remaining recompute is purely elementwise (in fast_attention mode
        # the backward additionally re-runs the subpixel phase-shift matmuls
        # applied to x and mask[:, 0] downstream of the tagged values).
        # 'none' is the full-recompute policy (the round-3 behavior).
        # NOTE: read at TRACE time — changing the env var after the first
        # jit compile has no effect (consistent with the other DPFACE_*
        # kernel knobs).
        import os

        remat_save = os.environ.get(
            "DPFACE_ASM_REMAT_SAVE", opt.get("asm_remat_save", "convs")
        )
        if remat_save not in ("convs", "none"):
            raise ValueError(
                f"asm_remat_save/DPFACE_ASM_REMAT_SAVE must be 'convs' or "
                f"'none', got {remat_save!r}"
            )
        policy = (
            jax.checkpoint_policies.save_only_these_names(
                "asm_head_in", "asm_conv0_out", "asm_mask_out"
            )
            if remat_save == "convs"
            else None
        )
        cost = nn.remat(ASMCostVolume, static_argnums=(3,), policy=policy)(
            self.option, mindisp, maxdisp, name="cost_volume"
        )(ref_fea, tar_fea, train)  # [B, D, H/4, W/4, 2C]

        # Pallas fused path: skip materializing the x64 full-res logit/prob
        # volumes — the kernel reads coarse logits and writes disparity
        # directly (prob_depth is then not produced).
        fused = bool(opt.get("fused_regression", False))
        # resident D-packed aggregation: 'off'/'dres'/'full'
        # (ops/aggregation.py docstring); legacy bool agg_dres_dpack maps to
        # 'dres'. DEFAULT 'full' — an exact reparametrization (same params,
        # outputs, BN stats; tests/test_s2d.py) that won every round-5
        # on-chip A/B: fwd 41.38 -> 45.17 pairs/s, train 9.07 -> 9.84
        # (docs/PERFORMANCE.md round 5); falls back per-shape when D doesn't
        # support the pack factor.
        dpk = opt.get("agg_dpack", None)
        if dpk is None:
            dpk = "dres" if opt.get("agg_dres_dpack", False) else "full"
        cost_logits, cost_feats = PSMNetHGAggregation(
            opt.inplanes, upsample=not fused,
            dfold=opt.get("agg_dfold", "out"),
            dpack_mode=str(dpk),
            name="aggregation"
        )(cost, train)  # n x [B, 4D, H, W] (or coarse), n x [B, D, H/4, W/4, C]

        disp_out, prob_out = [], []
        for logits in cost_logits:
            if fused:
                from dualpixelface_tpu.ops.kernels import fused_softargmin

                disp_out.append(fused_softargmin(logits, disparities, factor=4))
            else:
                d, p = soft_argmin(logits, disparities)
                disp_out.append(d)
                prob_out.append(p)

        normal = None
        off1 = off2 = None
        if opt.predict_normal:
            normals, off1s, off2s = ANM(self.option, mindisp, maxdisp, name="normal_estimator")(
                [cost_feats[0]], [disp_out[0]], batch, train
            )
            normal = jnp.stack(normals, axis=1)  # [B, 1, H, W, 3]
            off1, off2 = off1s[0], off2s[0]

        results = {
            "pred_depth": jnp.stack(disp_out, axis=1),
            "prob_depth": jnp.stack(prob_out, axis=1) if prob_out else None,
            "pred_normal": normal,
            "ref_feature": jnp.max(ref_fea, axis=-1),
        }
        if opt.get("return_offsets", False):
            # deform offset diagnostics (offset-magnitude evidence for the
            # windowed Pallas aperture, docs/PERFORMANCE.md round 3)
            results["anm_offset1"] = off1
            results["anm_offset2"] = off2
        return results
