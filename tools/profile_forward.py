#!/usr/bin/env python
"""Profile the full StereoDPNet forward at the bench shape and print the
top HLO ops by device time (parsed from the jax.profiler trace event json).

Usage: python tools/profile_forward.py [outdir]
"""
from __future__ import annotations

import glob
import gzip
import json
import sys
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def summarize(logdir, top=40):
    paths = glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True)
    assert paths, f"no trace under {logdir}"
    path = max(paths, key=lambda p: Path(p).stat().st_mtime)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]
    # device-side complete events: pick pids whose process name mentions TPU/device
    pid_names = {}
    tid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e["pid"], e["tid"])] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "/device" in n.lower()}
    by_op = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        tname = tid_names.get((e["pid"], e["tid"]), "")
        if "step" in tname.lower():
            continue  # step markers, not ops
        dur = e.get("dur", 0) / 1e3  # ms
        by_op[e.get("name", "?")] += dur
        total += dur
    print(f"# trace: {path}")
    print(f"# total device op time: {total:.1f} ms (all reps)")
    for name, ms in sorted(by_op.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{ms:9.2f} ms  {100*ms/max(total,1e-9):5.1f}%  {name[:110]}")


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("--") \
        else "/tmp/prof_fwd"
    import jax
    import jax.numpy as jnp

    from bench import BATCH, HEIGHT, WIDTH, _build, make_bench_batch
    from dualpixelface_tpu.ops.precision import cast_floating

    opt, model, variables, device = _build()
    batch = jax.device_put(
        jax.tree_util.tree_map(jnp.asarray, make_bench_batch(BATCH, HEIGHT, WIDTH)),
        device,
    )
    jax.block_until_ready((variables, batch))

    @jax.jit
    def fwd(variables, batch):
        v = cast_floating(variables, jnp.bfloat16)
        b = cast_floating(batch, jnp.bfloat16)
        r = model.apply(v, b, train=False)
        return (jnp.sum(r["pred_depth"]) + jnp.sum(r["pred_normal"])).astype(jnp.float32)

    for _ in range(2):
        float(fwd(variables, batch))
    with jax.profiler.trace(outdir):
        for _ in range(3):
            out = fwd(variables, batch)
        float(out)
    summarize(outdir)


if __name__ == "__main__":
    main()
