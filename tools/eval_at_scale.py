#!/usr/bin/env python
"""Drive the eval path at the reference's full eval shape once.

Runs `eval_synthetic_stereodpnet` (mode=test: config -> synthetic pipeline ->
sharded batches -> forward -> metric tables -> visualizer) with the dataset
synthesized at >= the reference's 768x576 center-crop eval shape
(`/root/reference/dataloader/preprocess/config_test.json` hard_crop),
proving the eval flow fits device memory and runs beyond toy sizes.

By default this exercises `stereodpnet`'s EXACT path (packed8 deform,
unfused regression — the model's config defaults). Pass
`--deform_impl pallas --fused_regression` to drive the serving fast paths
instead (what `stereodpnet_plus` and bench.py run).

Prints the metric tables and total/steady-state wall time. Record the result
in docs/PERFORMANCE.md (VERDICT r2 item 7).

Usage: python tools/eval_at_scale.py [--height 768] [--width 576] [--samples 8]
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=768)
    ap.add_argument("--width", type=int, default=576)
    ap.add_argument("--samples", type=int, default=8)
    ap.add_argument("--config", default="eval_synthetic_stereodpnet")
    ap.add_argument("--deform_impl", default=None,
                    help="override model deform_impl (e.g. pallas|packed8)")
    ap.add_argument("--fused_regression", action="store_true",
                    help="enable the Pallas fused softargmin (serving fast path)")
    args = ap.parse_args()

    from dualpixelface_tpu.config import Configuration
    from dualpixelface_tpu.train import Trainer

    cfg = Configuration(args.config, workspace="eval_at_scale")
    # synthesize at full size; the center_crop eval transform then yields the
    # reference's 768x576 eval crop exactly
    cfg.data["dataset"]["height"] = args.height
    cfg.data["dataset"]["width"] = args.width
    cfg.data["dataset"]["test_samples"] = args.samples
    if args.deform_impl:
        cfg.data["model"]["deform_impl"] = args.deform_impl
    if args.fused_regression:
        cfg.data["model"]["fused_regression"] = True
    opt = cfg.get_config()

    t0 = time.perf_counter()
    trainer = Trainer(opt)
    results = trainer.test()
    dt = time.perf_counter() - t0
    print(f"# eval_at_scale: {args.samples} samples @ {args.height}x{args.width} "
          f"crop, total wall {dt:.1f}s (includes compile)")
    if isinstance(results, dict):
        for k, v in results.items():
            print(f"{k}: {v}")


if __name__ == "__main__":
    main()
