#!/usr/bin/env python
"""Deformable-conv3d smoke/benchmark tool.

The TPU-native analog of the reference's manual extension harness
(`src/module/dcn3d/test.py`: random inputs, forward+backward, shape prints,
gradcheck): runs all gather implementations at ANM scale, times them with an
honest host-readback barrier, checks cross-implementation agreement, and
verifies gradients flow.

  python tools/bench_deform_conv.py [--shape B D H W CIN COUT]
"""
from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import argparse
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", nargs=6, type=int, default=[2, 4, 96, 72, 35, 64],
                    metavar=("B", "D", "H", "W", "CIN", "COUT"))
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()
    b, d, h, w, cin, cout = args.shape

    import numpy as np
    import jax
    import jax.numpy as jnp

    from dualpixelface_tpu.ops.deform_conv3d import deform_conv3d

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, d, h, w, cin)).astype(np.float32))
    off = jnp.asarray(rng.standard_normal((b, d, h, w, 81)).astype(np.float32))
    wgt = jnp.asarray(rng.standard_normal((3, 3, 3, cin, cout)).astype(np.float32) * 0.1)

    outs = {}
    for impl in ("simple", "packed", "packed8"):
        f = jax.jit(lambda x_, o_: jnp.sum(deform_conv3d(x_, o_, wgt, None, impl=impl)))
        s = float(f(x, off))  # compile + warm
        t0 = time.perf_counter()
        acc = None
        for _ in range(args.iters):
            acc = f(x, off)
        s = float(acc)  # host readback drains the queue (honest barrier)
        dt = (time.perf_counter() - t0) / args.iters
        outs[impl] = s
        print(f"{impl:8s}: {dt * 1000:8.2f} ms/iter   checksum {s:.4f}")

    vals = list(outs.values())
    assert all(abs(v - vals[0]) / (abs(vals[0]) + 1e-6) < 1e-3 for v in vals), outs
    print("all implementations agree")

    g = jax.jit(jax.grad(lambda o_: jnp.sum(deform_conv3d(x, o_, wgt, None) ** 2)))
    go = g(off)
    print(f"offset grad: finite={bool(jnp.isfinite(go).all())} "
          f"max|g|={float(jnp.abs(go).max()):.4f}")


if __name__ == "__main__":
    main()
