#!/usr/bin/env python
"""Per-stage forward ablation of StereoDPNet at the reference crop.

Times (honest scalar-readback barriers, docs/PERFORMANCE.md methodology):
  * full forward (depth + normal), depth-only (ANM DCE'd)
  * feature extraction (x2 views), ASM cost volume, 3-D aggregation,
    fused regression, ANM — each stage jitted alone with real inputs
so the deltas isolate the 768x576 batch-4 bf16 bottleneck.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp

from bench import BATCH, HEIGHT, WIDTH, _build, make_bench_batch
from dualpixelface_tpu.ops.precision import cast_floating


def timeit(fn, *args, warmup=2, iters=8):
    for _ in range(warmup):
        float(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    float(out)
    return (time.perf_counter() - t0) / iters


def main():
    import os

    stages_only = bool(os.environ.get("STAGES_ONLY"))
    opt, model, variables, device = _build()
    batch = jax.device_put(
        jax.tree_util.tree_map(jnp.asarray, make_bench_batch(BATCH, HEIGHT, WIDTH)),
        device,
    )
    jax.block_until_ready((variables, batch))
    n = BATCH

    def run(consume):
        @jax.jit
        def fwd(variables, batch):
            v = cast_floating(variables, jnp.bfloat16)
            b = cast_floating(batch, jnp.bfloat16)
            r = model.apply(v, b, train=False)
            return consume(r).astype(jnp.float32)

        return timeit(fwd, variables, batch)

    if not stages_only:
        t_full = run(lambda r: jnp.sum(r["pred_depth"]) + jnp.sum(r["pred_normal"]))
        t_depth = run(lambda r: jnp.sum(r["pred_depth"]))
        print(f"full fwd:    {t_full*1e3:8.1f} ms  ({n/t_full:6.1f} pairs/s)")
        print(f"depth-only:  {t_depth*1e3:8.1f} ms  ({n/t_depth:6.1f} pairs/s)")
        print(f"ANM delta:   {(t_full-t_depth)*1e3:8.1f} ms")

    # ---- stage-wise with intermediate capture ------------------------------
    from flax.core import freeze

    mo = opt.model

    def sub(name):
        out = {}
        for col, tree in variables.items():
            if name in tree:
                out[col] = tree[name]
        return freeze(out)

    from dualpixelface_tpu.models.base import select_ref_target
    from dualpixelface_tpu.models.stereodpnet.modules import (
        ASMCostVolume,
        FeatureExtraction,
    )
    from dualpixelface_tpu.models.stereodpnet.normal_module import ANM
    from dualpixelface_tpu.ops.aggregation import PSMNetHGAggregation
    from dualpixelface_tpu.ops.cost_volume import regression_disparities
    from dualpixelface_tpu.ops.kernels import fused_softargmin

    fe = FeatureExtraction(opt)
    cvm = ASMCostVolume(opt, mo.mindisp, mo.maxdisp)
    agg = PSMNetHGAggregation(mo.inplanes, upsample=False)
    anm = ANM(opt, mo.mindisp, mo.maxdisp)
    disparities = regression_disparities(mo.mindisp, mo.maxdisp, mo.level, 4)

    v_fe = cast_floating(sub("feature_extraction"), jnp.bfloat16)
    v_cv = cast_floating(sub("cost_volume"), jnp.bfloat16)
    v_ag = cast_floating(sub("aggregation"), jnp.bfloat16)
    v_anm = cast_floating(sub("normal_estimator"), jnp.bfloat16)
    bb = cast_floating(batch, jnp.bfloat16)

    ref_img, tar_img = select_ref_target(bb, opt)

    f_feat1 = jax.jit(lambda v, x: fe.apply(v, x, False))
    feat_r = jax.block_until_ready(f_feat1(v_fe, ref_img))
    feat_t = jax.block_until_ready(f_feat1(v_fe, tar_img))
    t_feat = timeit(lambda v: jnp.sum(f_feat1(v, ref_img)) + jnp.sum(f_feat1(v, tar_img)), v_fe)

    f_cv = jax.jit(lambda v, a, b2: cvm.apply(v, a, b2, False))
    cost = jax.block_until_ready(f_cv(v_cv, feat_r, feat_t))
    t_cv = timeit(lambda v: jnp.sum(f_cv(v, feat_r, feat_t)), v_cv)

    f_ag = jax.jit(lambda v, c: agg.apply(v, c, False))
    logits, feats = jax.block_until_ready(f_ag(v_ag, cost))
    t_ag = timeit(lambda v: sum(jnp.sum(l) for l in f_ag(v, cost)[0]), v_ag)

    f_reg = jax.jit(lambda l: fused_softargmin(l, disparities, factor=4))
    disp0 = jax.block_until_ready(f_reg(logits[0]))
    t_reg = timeit(lambda l: jnp.sum(f_reg(l)), logits[0])

    f_anm = jax.jit(
        lambda v, cf, d, b2: anm.apply(v, [cf], [d], b2, False)[0][0]
    )
    jax.block_until_ready(f_anm(v_anm, feats[0], disp0, bb))
    t_anm = timeit(lambda v: jnp.sum(f_anm(v, feats[0], disp0, bb)), v_anm)

    print(f"features x2: {t_feat*1e3:8.1f} ms")
    print(f"cost volume: {t_cv*1e3:8.1f} ms")
    print(f"aggregation: {t_ag*1e3:8.1f} ms")
    print(f"regression:  {t_reg*1e3:8.1f} ms  (x{len(logits)} at eval=1)")
    print(f"ANM stage:   {t_anm*1e3:8.1f} ms")
    print(f"sum stages:  {(t_feat+t_cv+t_ag+t_reg+t_anm)*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
