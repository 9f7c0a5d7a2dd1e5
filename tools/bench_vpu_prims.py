#!/usr/bin/env python
"""Microbench the VPU primitives the fused deform kernel depends on:
  * dynamic_gather (take_along_axis along 128 lanes) throughput, fp32 + bf16
  * in-kernel minor-dims transpose [8x16, C] -> [C, 128] throughput
  * in-kernel MXU dot [M, K] x [K, N] at the fused-kernel shapes
All at VMEM-resident shapes, amortized over a grid.
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GRID = 4096
REPS = 8  # gathers per block per rep set


def timeit(fn, *args, warmup=2, iters=10):
    # tunneled backend: block_until_ready can return at dispatch; a scalar
    # readback through the in-order queue is the only true barrier
    for _ in range(warmup):
        float(jnp.sum(fn(*args)[0, 0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out[0, 0].astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters


def gather_bench(rows, dtype):
    # Mosaic's dynamic_gather requires index bitwidth == data bitwidth
    itype = jnp.int32 if dtype == jnp.float32 else jnp.int16

    def kern(tab_ref, idx_ref, out_ref):
        acc = jnp.zeros((rows, 128), dtype)
        for r in range(REPS):
            idx = jnp.broadcast_to(idx_ref[0, r : r + 1, :], (rows, 128))
            acc = acc + jnp.take_along_axis(tab_ref[0], idx, axis=-1)
        out_ref[0] = acc

    tab = jnp.asarray(np.random.randn(GRID, rows, 128), dtype)
    idx = jnp.asarray(np.random.randint(0, 128, (GRID, REPS, 128)), itype)
    fn = jax.jit(
        lambda t, i: pl.pallas_call(
            kern,
            grid=(GRID,),
            in_specs=[
                pl.BlockSpec((1, rows, 128), lambda g: (g, 0, 0)),
                pl.BlockSpec((1, REPS, 128), lambda g: (g, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, rows, 128), lambda g: (g, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((GRID, rows, 128), dtype),
        )(t, i)
    )
    dt = timeit(fn, tab, idx)
    elems = GRID * REPS * rows * 128
    print(f"gather {dtype.__name__}[{rows},128] x{REPS}: {dt*1e3:6.2f} ms "
          f"-> {elems/dt/1e9:7.1f} G elem/s")


def transpose_bench(dtype):
    # [128, 80] -> [80, 128] per step, REPS steps per block
    def kern(x_ref, out_ref):
        acc = jnp.zeros((80, 128), dtype)
        for r in range(REPS):
            acc = acc + x_ref[0, r].T
        out_ref[0] = acc

    x = jnp.asarray(np.random.randn(GRID, REPS, 128, 80), dtype)
    fn = jax.jit(
        lambda t: pl.pallas_call(
            kern,
            grid=(GRID,),
            in_specs=[pl.BlockSpec((1, REPS, 128, 80), lambda g: (g, 0, 0, 0))],
            out_specs=pl.BlockSpec((1, 80, 128), lambda g: (g, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((GRID, 80, 128), dtype),
        )(t)
    )
    dt = timeit(fn, x)
    elems = GRID * REPS * 128 * 80
    print(f"transpose {dtype.__name__}[128,80]->[80,128] x{REPS}: {dt*1e3:6.2f} ms "
          f"-> {elems/dt/1e9:7.1f} G elem/s")


def dot_bench(m, k, n, dtype):
    def kern(a_ref, b_ref, out_ref):
        out_ref[0] = jax.lax.dot_general(
            a_ref[0], b_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    a = jnp.asarray(np.random.randn(GRID, m, k), dtype)
    b = jnp.asarray(np.random.randn(GRID, k, n), dtype)
    fn = jax.jit(
        lambda a_, b_: pl.pallas_call(
            kern,
            grid=(GRID,),
            in_specs=[
                pl.BlockSpec((1, m, k), lambda g: (g, 0, 0)),
                pl.BlockSpec((1, k, n), lambda g: (g, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, m, n), lambda g: (g, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((GRID, m, n), jnp.float32),
        )(a_, b_)
    )
    dt = timeit(fn, a, b)
    fl = 2 * GRID * m * k * n
    print(f"dot {dtype.__name__} [{m},{k}]x[{k},{n}]: {dt*1e3:6.2f} ms "
          f"-> {fl/dt/1e12:6.1f} TFLOP/s")


if __name__ == "__main__":
    gather_bench(320, jnp.float32)
    gather_bench(320, jnp.bfloat16)
    gather_bench(160, jnp.float32)
    transpose_bench(jnp.float32)
    transpose_bench(jnp.bfloat16)
    dot_bench(128, 2240, 64, jnp.float32)
    dot_bench(128, 2240, 64, jnp.bfloat16)
    dot_bench(32, 2240, 64, jnp.bfloat16)
