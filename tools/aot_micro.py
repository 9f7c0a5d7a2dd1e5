#!/usr/bin/env python
"""Micro AOT A/B: compile a single module/op for TPU (no device) and report
the compiler's own cost model (summed `estimated_cycles` from the optimized
HLO's backend configs) — a fast, deterministic ranking signal for layout
variants while the tunnel is down. Calibrate against real measurements
before trusting absolute numbers (docs/PERFORMANCE.md).

Usage:
  python tools/aot_micro.py dslice        # dfold out/in at offset-head + hourglass shapes
  python tools/aot_micro.py tconv        # _PackedTConv3D vs plain ConvTranspose
"""
from __future__ import annotations

import os
import re
import sys
from pathlib import Path

os.environ["DPFACE_TARGET"] = "tpu"
os.environ.setdefault("JAX_PLATFORMS", "cpu")

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_platforms", "cpu")

from jax.experimental import topologies
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

GHZ = 0.94  # v5e


def sharding():
    topo = topologies.get_topology_desc(
        platform="tpu", topology_name="v5e:1x1",
        chips_per_host_bounds=(1, 1, 1), num_slices=1,
    )
    return NamedSharding(Mesh(np.array(topo.devices), ("d",)), P())


def estimated_ms(compiled, detail=False):
    txt = compiled.as_text()
    total = 0
    kinds = {}
    for line in txt.splitlines():
        m = re.search(r'"estimated_cycles":"(\d+)"', line)
        if not m:
            continue
        cyc = int(m.group(1))
        total += cyc
        km = re.search(r"= \S+ (\w[\w\-]*)\(", line)
        k = km.group(1) if km else "?"
        kinds[k] = kinds.get(k, 0) + cyc
    if detail:
        for k, v in sorted(kinds.items(), key=lambda kv: -kv[1]):
            print(f"      {v/GHZ/1e6:7.3f} ms  {k}")
    return total / GHZ / 1e6


def compile_fn(fn, *shapes, detail=False):
    s = sharding()
    structs = [jax.ShapeDtypeStruct(sh, dt, sharding=s) for sh, dt in shapes]
    compiled = jax.jit(fn).lower(*structs).compile()
    return estimated_ms(compiled, detail=detail)


def ab_dslice():
    from dualpixelface_tpu.ops.blocks import _DSliceConv3D

    for label, shape, co in [
        ("offset-head 67->81", (4, 4, 192, 144, 67), 81),
        ("hourglass   32->32", (4, 8, 192, 144, 32), 32),
        ("hourglass   64->64 s2", (4, 8, 192, 144, 64), 64),
    ]:
        print(label)
        strides = (2, 2, 2) if label.endswith("s2") else (1, 1, 1)
        # the rejected formulations (in/out2/kdsum/bgc) were pruned from
        # _DSliceConv3D after losing 1.4-2.6x here (docs/PERFORMANCE.md)
        for dfold in ("out",):
            mod = _DSliceConv3D(co, strides=strides, dfold=dfold)
            var = mod.init(
                jax.random.PRNGKey(0), jnp.zeros((1,) + shape[1:], jnp.bfloat16)
            )

            def f(x, v=var, m=mod):
                return m.apply(v, x)

            ms = compile_fn(f, (shape, jnp.bfloat16))
            print(f"   dfold={dfold!r}: {ms:7.3f} ms (compiler estimate)")


def ab_tconv():
    from flax import linen as nn

    from dualpixelface_tpu.ops.blocks import _PackedTConv3D

    shape, co = (4, 8, 192, 144, 64), 64
    print(f"tconv {shape} -> x2, co={co}")
    mod = _PackedTConv3D(co)
    var = mod.init(jax.random.PRNGKey(0), jnp.zeros((1,) + shape[1:], jnp.bfloat16))

    def f(x):
        return mod.apply(var, x)

    print(f"   packed : {compile_fn(f, (shape, jnp.bfloat16), detail=True):7.3f} ms")

    ref = nn.ConvTranspose(
        co, kernel_size=(3, 3, 3), strides=(2, 2, 2),
        padding=[(1, 1)] * 3, transpose_kernel=True,
    )
    rvar = ref.init(jax.random.PRNGKey(0), jnp.zeros((1,) + shape[1:], jnp.bfloat16))

    def g(x):
        return ref.apply(rvar, x)

    print(f"   xla-t3d: {compile_fn(g, (shape, jnp.bfloat16)):7.3f} ms")


if __name__ == "__main__":
    what = sys.argv[1] if len(sys.argv) > 1 else "dslice"
    if what in ("dslice", "all"):
        ab_dslice()
    if what in ("tconv", "all"):
        ab_tconv()
