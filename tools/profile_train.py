#!/usr/bin/env python
"""Profile the full StereoDPNet train step (fwd+bwd+adam, bf16) at the bench
shape and print the top HLO ops by device time — the measured basis for the
train-step perf work (VERDICT r3 item 2; the AOT estimates are untrustworthy
for the training graph, docs/PERFORMANCE.md round 3).

Usage: python tools/profile_train.py [outdir]
"""
from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from profile_forward import summarize  # noqa: E402


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("--") \
        else "/tmp/prof_train"
    import jax
    import jax.numpy as jnp

    from bench import HEIGHT, TRAIN_BATCH, WIDTH, _enable_compile_cache, make_bench_batch
    from dualpixelface_tpu.config import Configuration
    from dualpixelface_tpu.losses import loss_selector
    from dualpixelface_tpu.models import model_selector
    from dualpixelface_tpu.train.state import create_train_state
    from dualpixelface_tpu.train.steps import make_train_step

    _enable_compile_cache()
    cfg = Configuration("train_synthetic_stereodpnet", make_workspace=False)
    cfg.data["model"]["deform_impl"] = "pallas"
    cfg.data["model"]["fused_regression"] = True
    cfg.data["model"]["tower_s2d"] = "full"  # mirror bench.measure_train_step
    opt = cfg.get_config()
    model = model_selector(opt)
    batch = jax.tree_util.tree_map(
        jnp.asarray, make_bench_batch(TRAIN_BATCH, HEIGHT, WIDTH)
    )
    init_cfg = Configuration("train_synthetic_stereodpnet", make_workspace=False)
    init_cfg.data["model"]["deform_impl"] = "packed8"
    init_cfg.data["model"]["fused_regression"] = False
    init_model = model_selector(init_cfg.get_config())
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        small = jax.tree_util.tree_map(
            jnp.asarray, make_bench_batch(TRAIN_BATCH, 96, 96)
        )
        state = create_train_state(init_model, opt, small, steps_per_epoch=100)
    state = jax.device_put(state, jax.devices()[0])
    step = make_train_step(model, loss_selector(opt), jnp.bfloat16)

    state, losses = step(state, batch)
    float(losses["final_loss"])  # compile + barrier
    with jax.profiler.trace(outdir):
        for _ in range(3):
            state, losses = step(state, batch)
        float(losses["final_loss"])
    summarize(outdir, top=50)


if __name__ == "__main__":
    main()
