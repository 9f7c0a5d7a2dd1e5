#!/usr/bin/env python
"""Benchmark: StereoDPNet throughput at the reference's training crop.

Resolution: 768x576 (the reference's hard_crop,
`/root/reference/dataloader/preprocess/config_train.json`), batch 4
(`config_/train_faceDP.json`), ALL model outputs consumed (depth + normal).

Baseline derivation (the reference repo publishes no numbers — BASELINE.md):
the forward costs 392.2 GFLOP/pair at 768x576 (measured via XLA cost
analysis of the reference-equivalent compute graph, fp32, unbounded deform).
The reference envelope is torch 1.5/fp32 on CUDA 10.1-era hardware (RTX
2080 Ti class, 13.45 TFLOP/s fp32 peak). Sustained utilization for THIS
model is well below clean-ResNet levels: cuDNN 3-D convs (~20-30% of peak),
a python-looped 8-plane cost volume with per-plane FFTs, the latency-bound
dcn3d CUDA gather, and PL DataParallel overhead — 25% of peak is a generous
estimate. Anchor:

    13.45e12 * 0.25 / 392.2e9 = 8.6 DP pairs/s (GPU forward)

North star (BASELINE.json) is >=5x that per chip: TARGET = 42.9 pairs/s.
`vs_baseline` = measured / TARGET, so 1.0 == the 5x-per-GPU target met at
the reference's own resolution. The JSON also reports the train-step
throughput and the derivation inputs so the anchor can be re-derived.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""
from __future__ import annotations

import json
import time

FLOPS_PER_PAIR = 392.2e9        # XLA cost analysis, fwd @768x576 fp32
GPU_PEAK_FP32 = 13.45e12        # RTX 2080 Ti class (CUDA 10.1 era)
GPU_UTIL = 0.25                 # documented estimate, see module docstring
REF_GPU_PAIRS_PER_SEC = GPU_PEAK_FP32 * GPU_UTIL / FLOPS_PER_PAIR  # ~8.6
TARGET = 5.0 * REF_GPU_PAIRS_PER_SEC

BATCH = 4
HEIGHT, WIDTH = 768, 576        # reference hard_crop (factor-96 multiples)
WARMUP = 2
ITERS = 10
TRAIN_BATCH = 2                 # fwd+bwd at full res fits 16 GB at batch 2
TRAIN_ITERS = 5


def make_bench_batch(b, h, w):
    import numpy as np

    rng = np.random.default_rng(0)
    depth = rng.uniform(800, 1200, (b, h, w)).astype(np.float32)
    ab = np.tile(np.array([[32.98, -26996.49]], np.float32), (b, 1))
    disp = (ab[:, 1:2, None] / depth + ab[:, 0:1, None]).astype(np.float32)
    return {
        "left": rng.standard_normal((b, h, w, 3)).astype(np.float32),
        "right": rng.standard_normal((b, h, w, 3)).astype(np.float32),
        "center": rng.standard_normal((b, h, w, 3)).astype(np.float32),
        "depth": depth,
        "mask": np.ones((b, h, w), np.float32),
        "disp": disp,
        "idepth": (depth.max() / depth).astype(np.float32),
        "normal": rng.standard_normal((b, h, w, 3)).astype(np.float32),
        "K": np.tile(
            np.array([[[7400.0, 0, w / 2], [0, 7400.0, h / 2], [0, 0, 1]]], np.float32),
            (b, 1, 1),
        ),
        "abvalue": ab,
    }


def _build(fused=True):
    import jax
    import jax.numpy as jnp

    from dualpixelface_tpu.config import Configuration
    from dualpixelface_tpu.models import model_selector

    cfg = Configuration("train_synthetic_stereodpnet", make_workspace=False)
    # production eval path: bf16 + Pallas fused regression + Pallas deform
    cfg.data["model"]["fused_regression"] = fused
    cfg.data["model"]["deform_impl"] = "pallas"
    opt = cfg.get_config()
    model = model_selector(opt)

    # init on CPU at a small size (params are shape-agnostic; the fused /
    # pallas twins have identical param trees), then transfer
    init_cfg = Configuration("train_synthetic_stereodpnet", make_workspace=False)
    init_cfg.data["model"]["deform_impl"] = "packed8"
    init_model = model_selector(init_cfg.get_config())
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        small = jax.tree_util.tree_map(jnp.asarray, make_bench_batch(1, 96, 96))
        variables = init_model.init(jax.random.PRNGKey(0), small, train=False)
    device = jax.devices()[0]
    return opt, model, jax.device_put(variables, device), device


REPS_PER_DISPATCH = 8  # forwards chained inside one executable


def measure_forward(opt, model, variables, device):
    """Steady-state serving throughput: REPS_PER_DISPATCH forwards are
    chained inside ONE executable (inputs perturbed per rep so XLA cannot
    CSE them), timed over ITERS dispatches with a scalar readback barrier.

    Chaining matters on this host: the tunneled TPU backend adds a measured
    ~20-30 ms of per-dispatch overhead that a production serving loop
    (continuous batches on a local chip) would not pay; single-dispatch
    timing would attribute it to the model."""
    import jax
    import jax.numpy as jnp

    from dualpixelface_tpu.ops.precision import cast_floating

    batch = jax.device_put(
        jax.tree_util.tree_map(jnp.asarray, make_bench_batch(BATCH, HEIGHT, WIDTH)),
        device,
    )
    jax.block_until_ready((variables, batch))

    @jax.jit
    def fwd(variables, batch):
        v = cast_floating(variables, jnp.bfloat16)
        b = cast_floating(batch, jnp.bfloat16)
        total = jnp.float32(0)
        for i in range(REPS_PER_DISPATCH):
            bi = dict(b)
            bi["left"] = b["left"] + jnp.bfloat16(i)
            results = model.apply(v, bi, train=False)
            # consume EVERY output so XLA cannot DCE the normal branch
            total = total + jnp.sum(results["pred_depth"]).astype(jnp.float32)
            if results.get("pred_normal") is not None:
                total = total + jnp.sum(results["pred_normal"]).astype(jnp.float32)
        return total

    for _ in range(WARMUP):
        float(fwd(variables, batch))
    t0 = time.perf_counter()
    out = None
    for _ in range(ITERS):
        out = fwd(variables, batch)
    float(out)
    dt = time.perf_counter() - t0
    return BATCH * REPS_PER_DISPATCH * ITERS / dt


def measure_train_step(opt):
    """Full train step (fwd+bwd+adam, bf16, cross-replica BN) at the
    reference crop, batch 2; the deform convs differentiate through the
    fused Pallas backward (kernels/deform_fused.py)."""
    import jax
    import jax.numpy as jnp

    from dualpixelface_tpu.config import Configuration
    from dualpixelface_tpu.losses import loss_selector
    from dualpixelface_tpu.models import model_selector
    from dualpixelface_tpu.train.state import create_train_state
    from dualpixelface_tpu.train.steps import make_train_step

    # training path: unfused regression (fused_softargmin is an eval/serving
    # kernel with no VJP); Pallas deform conv differentiates via its
    # custom_vjp
    cfg = Configuration("train_synthetic_stereodpnet", make_workspace=False)
    cfg.data["model"]["deform_impl"] = "pallas"
    opt = cfg.get_config()
    model = model_selector(opt)
    batch = jax.tree_util.tree_map(
        jnp.asarray, make_bench_batch(TRAIN_BATCH, HEIGHT, WIDTH)
    )
    state = create_train_state(model, opt, batch, steps_per_epoch=100)
    step = make_train_step(model, loss_selector(opt), jnp.bfloat16)
    state, losses = step(state, batch)
    float(losses["final_loss"])  # compile + barrier
    t0 = time.perf_counter()
    for _ in range(TRAIN_ITERS):
        state, losses = step(state, batch)
    float(losses["final_loss"])
    return TRAIN_BATCH * TRAIN_ITERS / (time.perf_counter() - t0)


def _build_plus():
    """stereodpnet_plus: the TPU-native serving configuration (identical
    param tree; fast_attention + the documented fast-path deviations)."""
    import jax
    import jax.numpy as jnp

    from dualpixelface_tpu.config import Configuration
    from dualpixelface_tpu.models import model_selector

    cfg = Configuration("train_synthetic_stereodpnet_plus", make_workspace=False)
    cfg.data["model"]["fused_regression"] = True
    cfg.data["model"]["deform_impl"] = "pallas"
    opt = cfg.get_config()
    model = model_selector(opt)
    init_cfg = Configuration("train_synthetic_stereodpnet_plus", make_workspace=False)
    init_cfg.data["model"]["deform_impl"] = "packed8"
    # the Pallas kernels cannot trace on the CPU init device; both fast
    # paths are param-free, so init with them off (identical param tree)
    init_cfg.data["model"]["fused_regression"] = False
    init_model = model_selector(init_cfg.get_config())
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        small = jax.tree_util.tree_map(jnp.asarray, make_bench_batch(1, 96, 96))
        variables = init_model.init(jax.random.PRNGKey(0), small, train=False)
    device = jax.devices()[0]
    return opt, model, jax.device_put(variables, device), device


def main():
    opt, model, variables, device = _build()
    pairs_per_sec = measure_forward(opt, model, variables, device)
    try:
        train_pairs = measure_train_step(opt)
    except Exception:
        train_pairs = None
    try:
        plus_pairs = measure_forward(*_build_plus())
    except Exception:
        plus_pairs = None
    print(
        json.dumps(
            {
                "metric": "stereodpnet_fwd_dp_pairs_per_sec_per_chip_768x576",
                "value": round(pairs_per_sec, 3),
                "unit": "pairs/s",
                "vs_baseline": round(pairs_per_sec / TARGET, 3),
                "resolution": f"{HEIGHT}x{WIDTH}",
                "batch": BATCH,
                "train_step_pairs_per_sec_b2": (
                    round(train_pairs, 3) if train_pairs else None
                ),
                "stereodpnet_plus_fwd_pairs_per_sec": (
                    round(plus_pairs, 3) if plus_pairs else None
                ),
                "anchor_gpu_pairs_per_sec": round(REF_GPU_PAIRS_PER_SEC, 2),
                "anchor_flops_per_pair": FLOPS_PER_PAIR,
                "anchor_gpu_util": GPU_UTIL,
            }
        )
    )


if __name__ == "__main__":
    main()
