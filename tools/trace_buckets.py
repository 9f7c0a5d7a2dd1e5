#!/usr/bin/env python
"""Bucket a jax.profiler device trace by op kind and (when the event carries
HLO source metadata) by model stage — the measured basis for the copy-bucket
work (docs/PERFORMANCE.md round 4 train-step profile).

Usage: python tools/trace_buckets.py /tmp/prof_train_r4b [--top 30]
"""
from __future__ import annotations

import argparse
import glob
import gzip
import json
import re
from collections import defaultdict
from pathlib import Path


def load_events(logdir):
    paths = glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True)
    assert paths, f"no trace under {logdir}"
    path = max(paths, key=lambda p: Path(p).stat().st_mtime)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]
    pid_names = {}
    tid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e["pid"], e["tid"])] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items() if "TPU" in n or "/device" in n.lower()}
    out = []
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        tname = tid_names.get((e["pid"], e["tid"]), "")
        if "step" in tname.lower():
            continue
        out.append(e)
    return path, out


KIND_RE = [
    ("copy", re.compile(r"^copy")),
    ("conv", re.compile(r"convolution|_conv3d_call|conv_general")),
    ("deform", re.compile(r"_fused_call|_fused_bwd_call")),
    ("softargmin", re.compile(r"softargmin")),
    ("dot", re.compile(r"^dot|gemm")),
    ("reduce", re.compile(r"reduce")),
    ("scatter/pad", re.compile(r"scatter|pad_add|^pad")),
    ("fusion", re.compile(r"fusion")),
]


def kind_of(name):
    for k, rx in KIND_RE:
        if rx.search(name):
            return k
    return "other"


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("logdir", nargs="?", default="/tmp/prof_train_r4b")
    ap.add_argument("--top", type=int, default=25, help="copy rows to print")
    ns = ap.parse_args()
    logdir, top = ns.logdir, ns.top
    path, events = load_events(logdir)
    total = 0.0
    by_kind = defaultdict(float)
    by_stage = defaultdict(float)
    copies = defaultdict(lambda: [0.0, None])
    skipped_outer = 0.0
    for e in events:
        name = e.get("name", "?")
        dur = e.get("dur", 0) / 1e3
        if name.startswith("jit_") or name.startswith("tpu_"):
            skipped_outer += dur
            continue  # outer program envelope double-counts its ops
        total += dur
        k = kind_of(name)
        by_kind[k] += dur
        args = e.get("args", {}) or {}
        meta = " ".join(str(v) for v in args.values())
        m = re.search(r"(feature_extraction|cost_volume|aggregation|"
                      r"normal_estimator|attention|opt_update|adam)", meta)
        stage = m.group(1) if m else "?"
        by_stage[(stage, k)] += dur
        if k == "copy" or (k == "fusion" and "copy" in meta.lower()):
            ent = copies[name]
            ent[0] += dur
            if ent[1] is None and meta.strip():
                ent[1] = meta[:200]
    print(f"# {path}")
    print(f"# device op time (outer envelopes excluded): {total:.1f} ms (all reps)")
    print(f"# outer program envelopes skipped: {skipped_outer:.1f} ms")
    print("\n## by kind")
    for k, ms in sorted(by_kind.items(), key=lambda kv: -kv[1]):
        print(f"{ms:9.2f} ms {100 * ms / total:5.1f}%  {k}")
    stages = defaultdict(float)
    for (stage, k), ms in by_stage.items():
        stages[stage] += ms
    if any(s != "?" for s in stages):
        print("\n## by stage (from HLO metadata when present)")
        for s, ms in sorted(stages.items(), key=lambda kv: -kv[1]):
            print(f"{ms:9.2f} ms {100 * ms / total:5.1f}%  {s}")
    print("\n## top copies")
    for name, (ms, meta) in sorted(copies.items(), key=lambda kv: -kv[1][0])[:top]:
        print(f"{ms:9.2f} ms  {name[:60]}")
        if meta:
            print(f"            {meta[:180]}")


if __name__ == "__main__":
    main()
