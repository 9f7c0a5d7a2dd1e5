#!/usr/bin/env python
"""A/B the two kd-folding layouts of _DSliceConv3D on device.

Shapes of interest (768x576 ANM pipeline):
  * offset head: [4, 4, 192, 144, 67] -> 81  (3*Co = 243 channel groups in
    the "out" fold — the relayout copies visible in the round-3 HLO dump)
  * hourglass   : [4, 8, 192, 144, 32] -> 32 (3*Co = 96, fits one lane tile)

Timing: chained R reps inside one jit (inputs perturbed per rep so XLA
cannot CSE), marginal over R to cancel dispatch overhead (~20-30 ms on the
tunneled backend — docs/PERFORMANCE.md methodology).
"""
from __future__ import annotations

import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from dualpixelface_tpu.ops.blocks import _DSliceConv3D


def timeit(fn, *args, iters=10):
    out = fn(*args)
    float(jax.tree_util.tree_leaves(out)[0].sum())  # warm + barrier
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jax.tree_util.tree_leaves(out)[0].sum())
    return (time.perf_counter() - t0) / iters * 1e3


def bench(shape, co, dfold, reps=8, dtype=jnp.bfloat16, strides=(1, 1, 1),
          module="raw"):
    b, d, h, w, c = shape
    if module == "convbn":
        # the full eval serving chain: conv + BN(+relu) as XLA fuses it
        from dualpixelface_tpu.ops.blocks import ConvBN3D
        from dualpixelface_tpu.ops.precision import cast_floating

        inner = ConvBN3D(co, 3, strides[0], 1, relu=True, dfold=dfold)
        mod = type("M", (), {})()  # tiny adapter exposing .init/.apply
        mod.init = lambda k, x_: cast_floating(
            inner.init(k, x_, train=False), jnp.bfloat16
        )
        mod.apply = lambda v, x_: inner.apply(v, x_, train=False)
    else:
        mod = _DSliceConv3D(co, strides=strides, dfold=dfold)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal(shape), dtype
    )
    var = mod.init(jax.random.PRNGKey(0), jnp.zeros(shape, dtype))

    @jax.jit
    def chained(x):
        def body(carry, i):
            y = mod.apply(var, carry + i.astype(dtype) * 1e-3)
            # keep shapes compatible for the scan carry: reduce back to x
            return carry + y.mean() * 0, y.mean()
        _, outs = jax.lax.scan(body, x, jnp.arange(reps))
        return outs.sum()

    ms = timeit(chained, x)
    per = ms / reps
    print(f"  dfold={dfold!r}: {ms:8.2f} ms / {reps} reps = {per:6.2f} ms/conv",
          flush=True)
    return per


# every _DSliceConv3D call site at the 768x576 b4 bench shape (level 8,
# inplanes 32): the aggregation tower's stride-1 convs + the ANM offset
# heads. Stride-2 sites are listed for the XLA fold only (the Pallas
# stride-2 parity-extraction form Mosaic-compiles pathologically slowly —
# ops/blocks.py:146-150).
SITES = [
    # label,                shape (b, d, h, w, cin), cout, strides
    ("offset-head 67->81", (4, 4, 192, 144, 67), 81, (1, 1, 1)),
    ("offset-head 64->81", (4, 4, 192, 144, 64), 81, (1, 1, 1)),
    ("dres0_0    64->32", (4, 8, 192, 144, 64), 32, (1, 1, 1)),
    ("dres*      32->32", (4, 8, 192, 144, 32), 32, (1, 1, 1)),
    ("hg conv2   64->64", (4, 4, 96, 72, 64), 64, (1, 1, 1)),
    ("hg conv4   64->64", (4, 2, 48, 36, 64), 64, (1, 1, 1)),
    ("classif    32->1 ", (4, 8, 192, 144, 32), 1, (1, 1, 1)),
    ("hg conv1 s2 32->64", (4, 8, 192, 144, 32), 64, (2, 2, 2)),
    ("hg conv3 s2 64->64", (4, 4, 96, 72, 64), 64, (2, 2, 2)),
]


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--site", default=None,
                    help="comma-separated substring filter on site labels")
    ap.add_argument("--folds", default="out,taps,cpack",
                    help="comma-separated dfold variants (out/taps/cpack; the "
                         "retired Pallas kernels live in tools/attic)")
    ap.add_argument("--module", default="raw", choices=("raw", "convbn"),
                    help="'convbn' benches the full eval ConvBN3D(relu) chain")
    args = ap.parse_args()
    wanted = args.site.split(",") if args.site else None

    print(f"devices: {jax.devices()}")
    for label, shape, co, strides in SITES:
        if wanted and not any(s in label for s in wanted):
            continue
        print(label, flush=True)
        for dfold in args.folds.split(","):
            bench(shape, co, dfold, strides=strides, module=args.module)


if __name__ == "__main__":
    main()
