#!/usr/bin/env python
"""AOT-compile the production graphs with the REAL TPU compiler — no TPU
attached.

libtpu ships in this image, so `jax.experimental.topologies` can build a
v5e topology descriptor and `jax.jit(...).lower(...).compile()` runs the
full XLA:TPU + Mosaic pipeline on the CPU host. That gives, without the
(tunneled, sometimes wedged) device:

  * a hard check that every Pallas kernel LOWERS for TPU (Mosaic errors
    surface here, not at first device use);
  * `memory_analysis()` — does the 768x576 train step fit 16 GB HBM;
  * `cost_analysis()` — flops / bytes-accessed for variant A/Bs;
  * the optimized HLO text — where the layout copies are
    (`--dump-hlo out.txt`, grep for `copy` / `transpose` fusions).

DPFACE_TARGET=tpu is exported before the model imports so kernel dispatch
(`ops/target.py`) takes the Mosaic path during tracing.

Usage:
  python tools/aot_analyze.py [forward|train|plus|all] [--dump-hlo DIR]
"""
from __future__ import annotations

import os
import sys
import time
from pathlib import Path

os.environ["DPFACE_TARGET"] = "tpu"
os.environ.setdefault("JAX_PLATFORMS", "cpu")

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # the axon plugin overrides env

from jax.experimental import topologies  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

BATCH, HEIGHT, WIDTH = 4, 768, 576
TRAIN_BATCH = 2
HBM_BYTES = 16 * 1024**3  # v5e


def _topo_sharding():
    topo = topologies.get_topology_desc(
        platform="tpu", topology_name="v5e:1x1",
        chips_per_host_bounds=(1, 1, 1), num_slices=1,
    )
    mesh = Mesh(np.array(topo.devices), ("d",))
    return NamedSharding(mesh, P())


def _shape_pytree(tree, sharding):
    def to_struct(x):
        if hasattr(x, "shape") and hasattr(x, "dtype"):
            return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=sharding)
        x = jnp.asarray(x)
        return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=sharding)

    return jax.tree_util.tree_map(to_struct, tree)


def _report(name, compiled, dump_dir=None):
    ca = compiled.cost_analysis() or {}
    ma = compiled.memory_analysis()
    gb = 1024**3
    print(f"== {name}")
    print(f"   flops            : {ca.get('flops', float('nan')):.3e}")
    print(f"   bytes accessed   : {ca.get('bytes accessed', float('nan')):.3e}")
    if ma is not None:
        peak = (ma.argument_size_in_bytes + ma.output_size_in_bytes
                + ma.temp_size_in_bytes)
        print(f"   HBM args/out/temp: {ma.argument_size_in_bytes/gb:.2f} / "
              f"{ma.output_size_in_bytes/gb:.2f} / {ma.temp_size_in_bytes/gb:.2f} GiB"
              f"  (sum {peak/gb:.2f} GiB vs 16 GiB)")
    txt = compiled.as_text()
    ncopy = txt.count(" copy(")
    ntrans = txt.count(" transpose(")
    print(f"   HLO ops          : copy x{ncopy}, transpose x{ntrans}, "
          f"total chars {len(txt)}")
    if dump_dir:
        out = Path(dump_dir) / f"{name}.hlo.txt"
        out.parent.mkdir(parents=True, exist_ok=True)
        out.write_text(txt)
        print(f"   HLO dumped       : {out}")


def build(config_name="train_synthetic_stereodpnet", fast=True):
    from dualpixelface_tpu.config import Configuration
    from dualpixelface_tpu.models import model_selector

    cfg = Configuration(config_name, make_workspace=False)
    if fast:
        cfg.data["model"]["fused_regression"] = True
        cfg.data["model"]["deform_impl"] = "pallas"
    overrides = os.environ.get("DPFACE_AOT_MODEL_OVERRIDES")
    if overrides:
        import json

        cfg.data["model"].update(json.loads(overrides))
    opt = cfg.get_config()
    return opt, model_selector(opt)


def bench_batch(b, h, w):
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    import bench

    return bench.make_bench_batch(b, h, w)


def param_shapes(model, opt, config_name):
    """Abstract param tree via eval_shape of an exact-twin init (no Mosaic
    at init time, identical tree)."""
    from dualpixelface_tpu.config import Configuration
    from dualpixelface_tpu.models import model_selector

    icfg = Configuration(config_name, make_workspace=False)
    icfg.data["model"]["deform_impl"] = "packed8"
    icfg.data["model"]["fused_regression"] = False
    imodel = model_selector(icfg.get_config())
    batch = jax.tree_util.tree_map(jnp.asarray, bench_batch(1, 96, 96))
    return jax.eval_shape(
        lambda b: imodel.init(jax.random.PRNGKey(0), b, train=False), batch
    )


def analyze_forward(dump_dir, config="train_synthetic_stereodpnet", label="forward"):
    opt, model = build(config)
    s = _topo_sharding()
    vshapes = _shape_pytree(param_shapes(model, opt, config), s)
    bshapes = _shape_pytree(bench_batch(BATCH, HEIGHT, WIDTH), s)

    def fwd(variables, batch):
        # mirror bench.py's serving program: bf16 weights/inputs in-jit
        from dualpixelface_tpu.ops.precision import cast_floating

        v = cast_floating(variables, jnp.bfloat16)
        b = cast_floating(batch, jnp.bfloat16)
        out = model.apply(v, b, train=False)
        return sum(jnp.sum(x.astype(jnp.float32)) for x in out.values() if x is not None)

    t0 = time.perf_counter()
    compiled = jax.jit(fwd).lower(vshapes, bshapes).compile()
    print(f"   ({label} compile {time.perf_counter() - t0:.0f}s)")
    _report(f"{label}_{HEIGHT}x{WIDTH}_b{BATCH}", compiled, dump_dir)


def analyze_train(dump_dir):
    from dualpixelface_tpu.losses import loss_selector
    from dualpixelface_tpu.train.state import create_train_state
    from dualpixelface_tpu.train.steps import make_train_step

    config = "train_synthetic_stereodpnet"
    opt, model = build(config)
    s = _topo_sharding()

    batch = bench_batch(TRAIN_BATCH, HEIGHT, WIDTH)
    imodel = build(config, fast=False)[1]
    small = jax.tree_util.tree_map(jnp.asarray, bench_batch(TRAIN_BATCH, 96, 96))
    state_shapes = jax.eval_shape(
        lambda b: create_train_state(imodel, opt, b, steps_per_epoch=100), small
    )
    step = make_train_step(model, loss_selector(opt), jnp.bfloat16)
    t0 = time.perf_counter()
    compiled = (
        jax.jit(step)
        .lower(_shape_pytree(state_shapes, s), _shape_pytree(batch, s))
        .compile()
    )
    print(f"   (train compile {time.perf_counter() - t0:.0f}s)")
    _report(f"train_{HEIGHT}x{WIDTH}_b{TRAIN_BATCH}", compiled, dump_dir)


def main():
    what = sys.argv[1] if len(sys.argv) > 1 else "forward"
    dump_dir = None
    if "--dump-hlo" in sys.argv:
        dump_dir = sys.argv[sys.argv.index("--dump-hlo") + 1]
    if what in ("forward", "all"):
        analyze_forward(dump_dir)
    if what in ("plus", "all"):
        analyze_forward(dump_dir, "train_synthetic_stereodpnet_plus", "plus")
    if what in ("train", "all"):
        analyze_train(dump_dir)


if __name__ == "__main__":
    main()
