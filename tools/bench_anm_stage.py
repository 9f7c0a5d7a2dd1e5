#!/usr/bin/env python
"""Split the ANM stage at 768x576 b4 bf16: sample+grid+concat, each deform
conv (+BN/relu), the 2-D n_convs tail + upsample. Relay floor ~3 ms each.

Profiles the SERVING deform path (deform_impl=pallas) by default — the model
default is the exact packed8, whose unbounded gather at this scale OOMs a
16 GB chip at init. Pass --deform_impl packed8 to profile the exact path at
a scale that fits (or accept the OOM on bigger chips); the flag switches
both the profiled convs and the init recipe.
"""
from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from dualpixelface_tpu.config import Configuration
from dualpixelface_tpu.models.stereodpnet.normal_module import (
    ANM,
    grid_maker_3d,
    sample_with_sort,
)
from dualpixelface_tpu.ops.cost_volume import costrange as make_costrange
from dualpixelface_tpu.ops.precision import cast_floating
from dualpixelface_tpu.ops.resize import downsample2d_nearest


def timeit(fn, *args, warmup=2, iters=10):
    for _ in range(warmup):
        float(jnp.sum(fn(*args).astype(jnp.float32)))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--deform_impl", default="pallas",
                    choices=("pallas", "packed8", "packed", "simple"))
    args = ap.parse_args()

    cfg = Configuration("train_synthetic_stereodpnet", make_workspace=False)
    # default: the SERVING deform path; the model default is the exact
    # packed8 (round-3 flip), whose unbounded gather at this scale is an
    # init-time OOM on a 16 GB chip — see bench.py:measure_train_step
    cfg.data["model"]["deform_impl"] = args.deform_impl
    opt = cfg.get_config()
    rng = np.random.default_rng(0)
    b, d, hq, wq, c = 4, 8, 192, 144, 32
    cost = jnp.asarray(rng.standard_normal((b, d, hq, wq, 2 * c)), jnp.bfloat16)
    disp = jnp.asarray(rng.uniform(-4, 12, (b, 4 * hq, 4 * wq)), jnp.bfloat16)
    batch = {
        "K": jnp.asarray(
            np.tile(np.array([[[7400.0, 0, 288], [0, 7400.0, 384], [0, 0, 1]]],
                             np.float32), (b, 1, 1))),
        "abvalue": jnp.asarray(np.tile([[32.98, -26996.49]], (b, 1)), np.float32),
    }
    anm = ANM(opt, opt.model.mindisp, opt.model.maxdisp)
    # init on CPU at a small spatial size with the XLA twin (params are
    # shape-agnostic and the trees match; Pallas doesn't lower on CPU)
    init_cfg = Configuration("train_synthetic_stereodpnet", make_workspace=False)
    init_cfg.data["model"]["deform_impl"] = "packed8"
    init_opt = init_cfg.get_config()
    init_anm = ANM(init_opt, init_opt.model.mindisp, init_opt.model.maxdisp)
    # DPFACE_TARGET=tpu (documented AOT override) would win over the
    # default-device context in tpu_lowering() and send the per-site pallas
    # offset-head conv to Mosaic on CPU — drop it for the init only
    import os
    _tgt = os.environ.pop("DPFACE_TARGET", None)
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        sc = jnp.zeros((b, d, 24, 24, 2 * c), jnp.bfloat16)
        sd = jnp.zeros((b, 96, 96), jnp.bfloat16)
        sb = jax.tree_util.tree_map(
            lambda a: jax.device_put(a, cpu), batch
        )
        vs = init_anm.init(jax.random.PRNGKey(0), [sc], [sd], sb, False)
    if _tgt is not None:
        os.environ["DPFACE_TARGET"] = _tgt
    vs = jax.device_put(cast_floating(vs, jnp.bfloat16), jax.devices()[0])

    cr = make_costrange(opt.model.mindisp, opt.model.maxdisp, opt.model.level)

    @jax.jit
    def stage_sample(cost, disp, batch):
        dq = downsample2d_nearest(disp[..., None], 4)[..., 0] * 0.25
        cost_s, dr = sample_with_sort(cost, dq, cr, opt.model.dsample_num)
        coordV = grid_maker_3d(batch["K"], dr, batch["abvalue"])
        return jnp.concatenate([cost_s, coordV.astype(cost_s.dtype)], axis=-1)

    t_sample = timeit(stage_sample, cost, disp, batch)
    fv = stage_sample(cost, disp, batch)
    print(f"sample+grid+concat: {t_sample*1e3:7.2f} ms  fv={fv.shape} {fv.dtype}")

    from dualpixelface_tpu.ops.deform_conv3d import DeformConvPack3D

    dc = DeformConvPack3D(2 * c, (3, 3, 3), 1, 1, impl=args.deform_impl)
    dvs = cast_floating(dc.init(jax.random.PRNGKey(1), fv), jnp.bfloat16)
    f_dc = jax.jit(lambda v, x: dc.apply(v, x)[0])
    t_dc1 = timeit(f_dc, dvs, fv)
    print(f"deform pack (67ch in): {t_dc1*1e3:7.2f} ms")
    fv2 = f_dc(dvs, fv)
    dc2 = DeformConvPack3D(2 * c, (3, 3, 3), 1, 1, impl=args.deform_impl)
    dvs2 = cast_floating(dc2.init(jax.random.PRNGKey(2), fv2), jnp.bfloat16)
    t_dc2 = timeit(jax.jit(lambda v, x: dc2.apply(v, x)[0]), dvs2, fv2)
    print(f"deform pack (64ch in): {t_dc2*1e3:7.2f} ms")

    # full ANM for the total
    f_anm = jax.jit(lambda v, c_, d_, b_: anm.apply(v, [c_], [d_], b_, False)[0][0])
    t_anm = timeit(f_anm, vs, cost, disp, batch)
    print(f"full ANM:           {t_anm*1e3:7.2f} ms")
    print(f"tail (residual):    {(t_anm - t_sample - t_dc1 - t_dc2)*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
