#!/usr/bin/env python
"""Micro-probe: where do the hourglass conv milliseconds go?

Times, at the 768x576 b4 bench shapes (bf16):
  * the bare 2-D conv the 'out' dslice fold runs ([B*D, H, W, C] -> 3*Co)
  * the same contraction as explicit im2col + one dot (GEMM ceiling check)
  * a pure GEMM of identical MACs (the MXU ceiling for this problem)
  * the full _DSliceConv3D 'out' fold (conv + pad + D-shift adds)
so the conv-vs-adds split is measured, not guessed.

Methodology: chained reps in one jit (inputs perturbed per rep), scalar
readback barrier — docs/PERFORMANCE.md.
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=10):
    out = fn(*args)
    float(jax.tree_util.tree_leaves(out)[0].sum())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jax.tree_util.tree_leaves(out)[0].sum())
    return (time.perf_counter() - t0) / iters * 1e3


def chained(fn, reps=8):
    @jax.jit
    def run(x, *rest):
        def body(carry, i):
            y = fn(carry + i.astype(carry.dtype) * 1e-3, *rest)
            return carry, jnp.sum(y, dtype=jnp.float32)
        _, outs = jax.lax.scan(body, x, jnp.arange(reps))
        return outs.sum()
    return run, reps


def probe_conv2d(label, n, h, w, c, co, reps=8, dtype=jnp.bfloat16,
                 ksize=3, dilation=1, skip_im2col=False):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((n, h, w, c)), dtype)
    k = jnp.asarray(rng.standard_normal((ksize, ksize, c, co)) * 0.1, dtype)
    flops = 2 * n * h * w * ksize * ksize * c * co
    pad = dilation * (ksize - 1) // 2

    def conv(x_, k_):
        return jax.lax.conv_general_dilated(
            x_, k_, (1, 1), [(pad, pad), (pad, pad)],
            rhs_dilation=(dilation, dilation),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=dtype,
        )

    run, reps_ = chained(conv)
    ms = timeit(run, x, k) / reps_
    print(f"{label:34s} conv2d    {ms:7.3f} ms  {flops/ms/1e9:7.1f} GF/ms "
          f"({flops/ms*1e3/197e12*100:5.1f}% of 197T)")
    if skip_im2col or ksize != 3 or dilation != 1:
        return

    def im2col_dot(x_, k_):
        xp = jnp.pad(x_, ((0, 0), (1, 1), (1, 1), (0, 0)))
        cols = jnp.concatenate(
            [xp[:, i : i + h, j : j + w, :] for i in range(3) for j in range(3)],
            axis=-1,
        ).reshape(n * h * w, 9 * c)
        return jax.lax.dot_general(
            cols, k_.reshape(9 * c, co), (((1,), (0,)), ((), ())),
            preferred_element_type=dtype,
        )

    run, reps_ = chained(im2col_dot)
    ms = timeit(run, x, k) / reps_
    print(f"{label:34s} im2col+dot{ms:7.3f} ms  {flops/ms/1e9:7.1f} GF/ms")


def probe_gemm(label, m, k, n, reps=8, dtype=jnp.bfloat16):
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.standard_normal((m, k)), dtype)
    b = jnp.asarray(rng.standard_normal((k, n)), dtype)
    flops = 2 * m * k * n

    def gemm(a_, b_):
        return jax.lax.dot_general(
            a_, b_, (((1,), (0,)), ((), ())), preferred_element_type=dtype
        )

    run, reps_ = chained(gemm)
    ms = timeit(run, a, b) / reps_
    print(f"{label:34s} gemm      {ms:7.3f} ms  {flops/ms/1e9:7.1f} GF/ms "
          f"({flops/ms*1e3/197e12*100:5.1f}% of 197T)")


def probe_dslice(label, b, d, h, w, c, co, reps=8, dtype=jnp.bfloat16):
    from dualpixelface_tpu.ops.blocks import _DSliceConv3D

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((b, d, h, w, c)), dtype)
    mod = _DSliceConv3D(co, dfold="out")
    var = mod.init(jax.random.PRNGKey(0), jnp.zeros_like(x))
    flops = 2 * b * d * h * w * 27 * c * co

    run, reps_ = chained(lambda x_: mod.apply(var, x_))
    ms = timeit(run, x) / reps_
    print(f"{label:34s} dslice-out{ms:7.3f} ms  {flops/ms/1e9:7.1f} GF/ms "
          f"({flops/ms*1e3/197e12*100:5.1f}% of 197T)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--part", default="all",
                    choices=("all", "conv", "gemm", "dslice", "s2d"))
    args = ap.parse_args()
    jax.config.update(
        "jax_compilation_cache_dir",
        str(Path(__file__).resolve().parent.parent / ".jax_cache"),
    )
    print(f"devices: {jax.devices()}")

    if args.part in ("all", "gemm"):
        # identical MACs to the dres 32->32 fold conv: [32*192*144, 288] x [288, 96]
        probe_gemm("dres GEMM twin 884736x288x96", 32 * 192 * 144, 288, 96)
        probe_gemm("square GEMM 4096^3", 4096, 4096, 4096)
    if args.part in ("all", "conv"):
        probe_conv2d("dres fold conv 32x192x144 c32->96", 32, 192, 144, 32, 96)
        probe_conv2d("dres0_0 fold conv c64->96", 32, 192, 144, 64, 96)
        probe_conv2d("tower conv 8x384x288 c32->32", 8, 384, 288, 32, 32)
        # channel-packing ceiling probes: same voxel*channel volume as the
        # dres sites but with 128/192 lanes — is the low MFU an input-lane
        # starvation problem (then D-into-C packing pays) or systemic?
        probe_conv2d("cpack probe 8x192x144 c128->128", 8, 192, 144, 128, 128)
        probe_conv2d("cpack halo probe c192->128", 8, 192, 144, 192, 128)
        probe_conv2d("wide-N probe 32x192x144 c32->256", 32, 192, 144, 32, 256)
    if args.part in ("all", "dslice"):
        probe_dslice("dres* full dslice 32->32", 4, 8, 192, 144, 32, 32)
    if args.part in ("all", "s2d"):
        # tower space-to-depth candidates (b4 forward = 8 tower images).
        # Fine baselines: what the stem/block1 convs cost today at 384x288
        # C=32, incl. the dilation-3/5 branches; s2d forms: the same math as
        # ONE coarse 192x144 conv at 128 channels (3x3 for s1/d1 fine convs
        # at 25% weight density, 5x5 for d=3 at 9%, 7x7 for d=5 at 4.6%).
        probe_conv2d("fine 3x3 d1 8x384x288 c32->32", 8, 384, 288, 32, 32,
                     skip_im2col=True)
        probe_conv2d("fine 3x3 d3 8x384x288 c32->32", 8, 384, 288, 32, 32,
                     dilation=3)
        probe_conv2d("fine 3x3 d5 8x384x288 c32->32", 8, 384, 288, 32, 32,
                     dilation=5)
        probe_conv2d("s2d 3x3 8x192x144 c128->128", 8, 192, 144, 128, 128,
                     skip_im2col=True)
        probe_conv2d("s2d 5x5 8x192x144 c128->128", 8, 192, 144, 128, 128,
                     ksize=5)
        probe_conv2d("s2d 7x7 8x192x144 c128->128", 8, 192, 144, 128, 128,
                     ksize=7)
        probe_conv2d("s2d conv4 3x3 c128->32", 8, 192, 144, 128, 32,
                     skip_im2col=True)


if __name__ == "__main__":
    main()
