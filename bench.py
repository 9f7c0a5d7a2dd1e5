#!/usr/bin/env python
"""Benchmark: StereoDPNet forward throughput — DP pairs/sec/chip.

North-star metric from BASELINE.md: the reference repo publishes no numbers
(README has none, no benchmarks/ dir), so `vs_baseline` is reported against
the driver's north-star target of >= 5x an estimated single-GPU PyTorch
forward throughput. The estimate REF_GPU_PAIRS_PER_SEC is derived from the
reference training envelope (StereoDPNet, batch 4, 768x576 crops, CUDA
10.1-era GPU): ~4 fwd pairs/sec. vs_baseline = measured / (5 * estimate), so
1.0 == the 5x-per-chip target met.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import time

REF_GPU_PAIRS_PER_SEC = 4.0
TARGET = 5.0 * REF_GPU_PAIRS_PER_SEC

BATCH = 4
HEIGHT, WIDTH = 384, 288  # factor-96 crop like the FaceDP pipeline
WARMUP = 2
ITERS = 20


def make_bench_batch(b, h, w):
    import numpy as np

    rng = np.random.default_rng(0)
    depth = rng.uniform(800, 1200, (b, h, w)).astype(np.float32)
    ab = np.tile(np.array([[32.98, -26996.49]], np.float32), (b, 1))
    return {
        "left": rng.standard_normal((b, h, w, 3)).astype(np.float32),
        "right": rng.standard_normal((b, h, w, 3)).astype(np.float32),
        "center": rng.standard_normal((b, h, w, 3)).astype(np.float32),
        "depth": depth,
        "mask": np.ones((b, h, w), np.float32),
        "K": np.tile(
            np.array([[[7400.0, 0, w / 2], [0, 7400.0, h / 2], [0, 0, 1]]], np.float32),
            (b, 1, 1),
        ),
        "abvalue": ab,
    }


def main():
    import jax
    import jax.numpy as jnp

    from dualpixelface_tpu.config import Configuration
    from dualpixelface_tpu.models import model_selector

    cfg = Configuration("train_synthetic_stereodpnet", make_workspace=False)
    # bench policy: bf16 compute + Pallas fused regression (the production
    # eval path; parity with the unfused path is covered by tests)
    cfg.data["model"]["fused_regression"] = True
    opt = cfg.get_config()
    model = model_selector(opt)

    # init on CPU at a small spatial size (params are shape-agnostic, and the
    # unfused twin has an identical param tree — fused_regression only changes
    # the regression compute, not parameters), then transfer
    init_cfg = Configuration("train_synthetic_stereodpnet", make_workspace=False)
    init_model = model_selector(init_cfg.get_config())
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        small = jax.tree_util.tree_map(jnp.asarray, make_bench_batch(1, 96, 96))
        variables = init_model.init(jax.random.PRNGKey(0), small, train=False)
    device = jax.devices()[0]
    variables = jax.device_put(variables, device)
    batch = jax.device_put(
        jax.tree_util.tree_map(jnp.asarray, make_bench_batch(BATCH, HEIGHT, WIDTH)), device
    )
    jax.block_until_ready((variables, batch))

    from dualpixelface_tpu.ops.precision import cast_floating

    @jax.jit
    def fwd(variables, batch):
        v = cast_floating(variables, jnp.bfloat16)
        b = cast_floating(batch, jnp.bfloat16)
        results = model.apply(v, b, train=False)
        # consume EVERY model output (depth + normal) so XLA cannot
        # dead-code-eliminate branches; scalar return forces completion via
        # host readback (the only reliable barrier on tunneled backends where
        # block_until_ready can return at dispatch)
        total = jnp.sum(results["pred_depth"])
        if results.get("pred_normal") is not None:
            total = total + jnp.sum(results["pred_normal"])
        return total.astype(jnp.float32)

    for _ in range(WARMUP):
        float(fwd(variables, batch))

    t0 = time.perf_counter()
    out = None
    for _ in range(ITERS):
        out = fwd(variables, batch)
    float(out)  # drains the in-order execution queue
    dt = time.perf_counter() - t0

    pairs_per_sec = BATCH * ITERS / dt
    print(
        json.dumps(
            {
                "metric": "stereodpnet_fwd_dp_pairs_per_sec_per_chip",
                "value": round(pairs_per_sec, 3),
                "unit": "pairs/s",
                "vs_baseline": round(pairs_per_sec / TARGET, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
