#!/usr/bin/env python
"""Micro-bench aggregation sub-ops at the 768x576 quarter-res shapes (bf16):
dense banded conv, stride-2 3-D conv, transposed 3-D conv, cout=1 classifier.
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from dualpixelface_tpu.ops.blocks import ConvBN3D, TConvBN3D, he_normal_out


def timeit(fn, *args, warmup=2, iters=10):
    for _ in range(warmup):
        float(jnp.sum(fn(*args).astype(jnp.float32)))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters


def bench_mod(name, mod, x, train=False):
    vs = mod.init(jax.random.PRNGKey(0), x, train)
    from dualpixelface_tpu.ops.precision import cast_floating

    vs = cast_floating(vs, jnp.bfloat16)
    fn = jax.jit(lambda v, a: mod.apply(v, a, train))
    dt = timeit(fn, vs, x)
    print(f"{name:34s} {dt*1e3:7.2f} ms")
    return dt


def main():
    rng = np.random.default_rng(0)
    b, d, h, w, c = 4, 8, 192, 144, 32

    x_full = jnp.asarray(rng.standard_normal((b, d, h, w, c)), jnp.bfloat16)
    x_half = jnp.asarray(
        rng.standard_normal((b, d // 2, h // 2, w // 2, 2 * c)), jnp.bfloat16
    )
    x_2c = jnp.asarray(rng.standard_normal((b, d, h, w, 2 * c)), jnp.bfloat16)

    bench_mod("banded ConvBN3D 64->32 full", ConvBN3D(c, 3, 1, 1), x_2c)
    bench_mod("banded ConvBN3D 32->32 full", ConvBN3D(c, 3, 1, 1), x_full)
    bench_mod("stride2 ConvBN3D 32->64", ConvBN3D(2 * c, 3, 2, 1), x_full)
    bench_mod("stride2 ConvBN3D 64->64 (half)", ConvBN3D(2 * c, 3, 2, 1), x_half)
    bench_mod("TConvBN3D 64->64 (half->full?)", TConvBN3D(2 * c), x_half)
    bench_mod("TConvBN3D 64->32 (half)", TConvBN3D(c), x_half)

    class Classifier(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            return nn.Conv(1, (3, 3, 3), padding=[(1, 1)] * 3, use_bias=False,
                           kernel_init=he_normal_out)(x)

    bench_mod("classifier conv 32->1 full", Classifier(), x_full)


if __name__ == "__main__":
    main()
