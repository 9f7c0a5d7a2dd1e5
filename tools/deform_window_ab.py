#!/usr/bin/env python
"""Evidence for the windowed (+-3 voxel) Pallas deform-conv aperture.

Trains StereoDPNet on SyntheticDP with the reference's UNBOUNDED sampling
semantics ('packed8', matching the dcn3d CUDA trilinear gather), then:

  1. logs the trained offset-magnitude distribution of both ANM deform convs
     (per component d/h/w: p50 / p95 / p99 / max) — how far a trained model
     actually samples from the output voxel;
  2. A/Bs the SAME trained checkpoint under impl='packed8' (unbounded) vs
     impl='pallas' (windowed): held-out depth RMSE, normal mean angle, and
     the direct output deltas.

If the deltas are inside the 0.5% parity budget (BASELINE.md), the windowed
default for `stereodpnet` is justified and documented; otherwise the default
must flip to 'packed8' (VERDICT round 2, item 3).

Round-5 serving contract mode (`--clamp`): train with the straight-through
offset clamp (`deform_offset_clamp`, the stereodpnet_plus serving config) —
the predicted offsets are clamped to the Pallas kernel's +-AP aperture
IN-GRAPH, so windowed and unbounded sampling see identical offsets and the
A/B deltas must be float-noise, for ANY checkpoint trained this way. Add
`--save_ckpt PATH` to persist the trained {params, batch_stats} (flax
msgpack) so a pinned slow test can re-verify the contract on a cached
plateau checkpoint without re-training (tests/test_serving_parity.py).

Usage: python tools/deform_window_ab.py [--steps 300] [--hw 192] [--batch 4]
                                        [--clamp] [--save_ckpt PATH]
Prints one JSON line with everything.
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--hw", type=int, default=192)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--eval_batches", type=int, default=4)
    ap.add_argument("--clamp", action="store_true",
                    help="train+eval with deform_offset_clamp (serving config)")
    ap.add_argument("--save_ckpt", default="",
                    help="write the trained {params,batch_stats} msgpack here")
    ap.add_argument("--train_impl", default="packed8",
                    choices=["packed8", "pallas"],
                    help="deform impl used for TRAINING (with --clamp the two "
                         "are identical by construction; pallas is faster on "
                         "the TPU)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update(
        "jax_compilation_cache_dir",
        str(Path(__file__).resolve().parent.parent / ".jax_cache"),
    )

    from dualpixelface_tpu.config import Configuration
    from dualpixelface_tpu.data.loader_selector import loader_selector
    from dualpixelface_tpu.data.pipeline import DataPipeline, numeric_batch
    from dualpixelface_tpu.losses import loss_selector
    from dualpixelface_tpu.models import model_selector
    from dualpixelface_tpu.train.state import create_train_state
    from dualpixelface_tpu.train.steps import make_train_step

    def build_opt(impl, return_offsets=False):
        cfg = Configuration(
            "train_synthetic_stereodpnet", make_workspace=False,
            overrides=dict(batch_size=args.batch, init_lr=1e-4),
        )
        cfg.data["dataset"]["height"] = args.hw
        cfg.data["dataset"]["width"] = args.hw
        cfg.data["dataset"]["train_samples"] = args.batch * 8
        cfg.data["dataset"]["test_samples"] = args.batch * args.eval_batches
        cfg.data["crop_aug"]["soft_crop"]["crop_factor"] = 32
        cfg.data["model"]["deform_impl"] = impl
        cfg.data["model"]["fused_regression"] = False
        if args.clamp:
            cfg.data["model"]["deform_offset_clamp"] = True
        if return_offsets:
            cfg.data["model"]["return_offsets"] = True
        return cfg.get_config()

    # ---- train (default: the UNBOUNDED reference semantics; --clamp: the
    # serving contract, where the impl choice is provably irrelevant) ----
    opt = build_opt(args.train_impl if args.clamp else "packed8")
    model = model_selector(opt)
    ds = loader_selector(opt, training=True)
    pipe = DataPipeline(ds, batch_size=args.batch, shuffle=True, seed=1,
                        num_workers=2, drop_last=True)
    first = None
    for b in pipe:
        first = jax.tree_util.tree_map(jnp.asarray, numeric_batch(b))
        break
    state = create_train_state(model, opt, first, steps_per_epoch=max(len(pipe), 1))
    step = make_train_step(model, loss_selector(opt), jnp.bfloat16)

    t0 = time.time()
    losses = []
    n = 0
    while n < args.steps:
        pipe.set_epoch(n)
        for b in pipe:
            if n >= args.steps:
                break
            state, out = step(state, jax.tree_util.tree_map(jnp.asarray, numeric_batch(b)))
            n += 1
            if n % 50 == 0 or n == 1:
                losses.append(round(float(out["final_loss"]), 4))
                print(f"# step {n}: loss {losses[-1]} ({time.time()-t0:.0f}s)",
                      file=sys.stderr, flush=True)

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    if args.save_ckpt:
        import flax.serialization

        host_vars = jax.tree_util.tree_map(
            lambda x: np.asarray(x, np.float32), variables
        )
        Path(args.save_ckpt).parent.mkdir(parents=True, exist_ok=True)
        with open(args.save_ckpt, "wb") as f:
            f.write(flax.serialization.to_bytes(host_vars))
        print(f"# checkpoint -> {args.save_ckpt} "
              f"({Path(args.save_ckpt).stat().st_size / 1e6:.1f} MB)",
              file=sys.stderr, flush=True)

    # ---- held-out eval batches ----
    eval_opt = build_opt("packed8")
    eval_ds = loader_selector(eval_opt, training=False)
    eval_pipe = DataPipeline(eval_ds, batch_size=args.batch, shuffle=False,
                             seed=2, num_workers=2, drop_last=True)
    eval_batches = [jax.tree_util.tree_map(jnp.asarray, numeric_batch(b)) for b in eval_pipe]
    eval_batches = eval_batches[: args.eval_batches]

    def forward(impl):
        m = model_selector(build_opt(impl, return_offsets=True))
        fn = jax.jit(lambda v, b: m.apply(v, b, train=False))
        return [fn(variables, b) for b in eval_batches]

    res_un = forward("packed8")
    res_wi = forward("pallas")

    # ---- offset statistics (unbounded impl = the true sampling demand) ----
    stats = {}
    for key in ("anm_offset1", "anm_offset2"):
        comps = {0: "d", 1: "h", 2: "w"}
        if any(r.get(key) is None for r in res_un):
            raise SystemExit(
                f"{key} is None — the A/B needs use_deform=true and "
                "predict_normal=true in the model config (offsets are only "
                "produced by the deformable ANM path)"
            )
        off = np.concatenate(
            [np.asarray(r[key], np.float32).reshape(-1, 27, 3) for r in res_un]
        )
        for ci, cname in comps.items():
            a = np.abs(off[..., ci]).ravel()
            stats[f"{key}_{cname}"] = {
                "p50": round(float(np.percentile(a, 50)), 4),
                "p95": round(float(np.percentile(a, 95)), 4),
                "p99": round(float(np.percentile(a, 99)), 4),
                "max": round(float(a.max()), 4),
            }

    # ---- A/B metrics ----
    from dualpixelface_tpu.ops.geometry import disp2depth

    def metrics(results):
        rmses, angs = [], []
        for r, b in zip(results, eval_batches):
            mask = np.asarray(b["mask"]) > 0.5
            pred = np.asarray(disp2depth(r["pred_depth"][:, -1:], b["abvalue"]))[:, 0]
            gt = np.asarray(b["depth"])
            rmses.append(float(np.sqrt((((pred - gt) ** 2)[mask]).mean())))
            n_p = np.asarray(r["pred_normal"][:, 0], np.float32)
            n_g = np.asarray(b["normal"], np.float32)
            n_p = n_p / (np.linalg.norm(n_p, axis=-1, keepdims=True) + 1e-8)
            n_g = n_g / (np.linalg.norm(n_g, axis=-1, keepdims=True) + 1e-8)
            cos = np.clip((n_p * n_g).sum(-1), -1, 1)
            angs.append(float(np.degrees(np.arccos(cos))[mask].mean()))
        return float(np.mean(rmses)), float(np.mean(angs))

    rmse_un, ang_un = metrics(res_un)
    rmse_wi, ang_wi = metrics(res_wi)

    # direct output deltas between the impls on identical inputs/weights
    d_depth = float(
        np.mean([
            np.abs(np.asarray(a["pred_depth"]) - np.asarray(b_["pred_depth"])).max()
            for a, b_ in zip(res_un, res_wi)
        ])
    )
    d_norm = float(
        np.mean([
            np.abs(np.asarray(a["pred_normal"]) - np.asarray(b_["pred_normal"])).max()
            for a, b_ in zip(res_un, res_wi)
        ])
    )

    out = {
        "steps": args.steps,
        "hw": args.hw,
        "clamp": args.clamp,
        "train_impl": args.train_impl if args.clamp else "packed8",
        "train_loss_curve": losses,
        "offset_abs_stats": stats,
        "eval_depth_rmse_unbounded": round(rmse_un, 3),
        "eval_depth_rmse_windowed": round(rmse_wi, 3),
        "depth_rmse_rel_delta": round(abs(rmse_wi - rmse_un) / max(rmse_un, 1e-9), 5),
        "eval_normal_deg_unbounded": round(ang_un, 3),
        "eval_normal_deg_windowed": round(ang_wi, 3),
        "normal_deg_abs_delta": round(abs(ang_wi - ang_un), 4),
        "max_abs_depth_output_delta": round(d_depth, 6),
        "max_abs_normal_output_delta": round(d_norm, 6),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
