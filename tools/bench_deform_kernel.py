#!/usr/bin/env python
"""Bare fused-deform-kernel timing at the 768x576 ANM shape (bf16).

One process = one variant (the DPFACE_DEFORM_TSRC choice is baked at trace
time and jax caches executables by avals): run once per variant, e.g.

  DPFACE_DEFORM_TSRC=slice  python tools/bench_deform_kernel.py
  DPFACE_DEFORM_TSRC=concat python tools/bench_deform_kernel.py

Methodology: chained reps in one jit (offsets perturbed per rep), scalar
readback barrier (docs/PERFORMANCE.md).
"""
from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    jax.config.update(
        "jax_compilation_cache_dir",
        str(Path(__file__).resolve().parent.parent / ".jax_cache"),
    )
    from dualpixelface_tpu.ops.kernels.deform_fused import deform_conv3d_fused

    b, d, h, w, cin, cout = 4, 4, 192, 144, 67, 64
    reps, iters = 8, 8
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, d, h, w, cin)), jnp.bfloat16)
    off = jnp.asarray(rng.standard_normal((b, d, h, w, 81)) * 0.5, jnp.bfloat16)
    wgt = jnp.asarray(rng.standard_normal((3, 3, 3, cin, cout)) * 0.1, jnp.bfloat16)

    @jax.jit
    def run(x, off, wgt):
        def body(carry, i):
            o = off + i.astype(off.dtype) * 1e-3
            y = deform_conv3d_fused(x, o, wgt, None)
            return carry, jnp.sum(y, dtype=jnp.float32)

        _, outs = jax.lax.scan(body, 0.0, jnp.arange(reps))
        return outs.sum()

    float(run(x, off, wgt))  # compile + warm
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = run(x, off, wgt)
    float(out)
    ms = (time.perf_counter() - t0) / iters / reps * 1e3
    variant = os.environ.get("DPFACE_DEFORM_TSRC", "slice")
    kv = os.environ.get("DPFACE_DEFORM_KV", "v5")
    probe = os.environ.get("DPFACE_DEFORM_PROBE", "")
    tag = f"kv={kv} tsrc={variant}" + (f" probe={probe}" if probe else "")
    print(f"{tag}: {ms:7.2f} ms/conv  (shape {b}x{d}x{h}x{w} {cin}->{cout} bf16)")


if __name__ == "__main__":
    main()
