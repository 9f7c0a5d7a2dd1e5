#!/usr/bin/env python
"""Micro-bench FeatureExtraction pieces at the 768x576 shapes (bf16).
Relay floor is ~3 ms per timing — read deltas, not absolutes.
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from dualpixelface_tpu.ops.blocks import ConvBN, DepthwiseSeparableConv
from dualpixelface_tpu.ops.precision import cast_floating


def timeit(fn, *args, warmup=2, iters=10):
    for _ in range(warmup):
        float(jnp.sum(fn(*args).astype(jnp.float32)))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters


def bench_mod(name, mod, x):
    vs = cast_floating(mod.init(jax.random.PRNGKey(0), x, False), jnp.bfloat16)
    fn = jax.jit(lambda v, a: mod.apply(v, a, False))
    dt = timeit(fn, vs, x)
    print(f"{name:40s} {dt*1e3:7.2f} ms")


def main():
    rng = np.random.default_rng(0)
    half = jnp.asarray(rng.standard_normal((4, 384, 288, 32)), jnp.bfloat16)
    q = jnp.asarray(rng.standard_normal((4, 192, 144, 32)), jnp.bfloat16)
    q96 = jnp.asarray(rng.standard_normal((4, 192, 144, 96)), jnp.bfloat16)
    img = jnp.asarray(rng.standard_normal((4, 768, 576, 3)), jnp.bfloat16)

    bench_mod("stem conv 3->32 s2 @768", ConvBN(32, 3, 2, 1, 1), img)
    bench_mod("conv 32->32 @384 (half)", ConvBN(32, 3, 1, 1, 1), half)
    bench_mod("conv 32->32 @192 dil1", ConvBN(32, 3, 1, None, 1), q)
    bench_mod("conv 32->32 @192 dil3", ConvBN(32, 3, 1, None, 3), q)
    bench_mod("conv 32->32 @192 dil5", ConvBN(32, 3, 1, None, 5), q)
    bench_mod("conv 96->32 @192", ConvBN(32, 3, 1, 1, 1), q96)
    bench_mod("conv4 s2 dil2 32->32 @384", ConvBN(32, 3, 2, None, 2), half)
    bench_mod("dwsep 32 @192", DepthwiseSeparableConv(32, 3, 1), q)


if __name__ == "__main__":
    main()
