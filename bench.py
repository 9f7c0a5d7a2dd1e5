#!/usr/bin/env python
"""Benchmark: StereoDPNet throughput at the reference's training crop.

Resolution: 768x576 (the reference's hard_crop,
`/root/reference/dataloader/preprocess/config_train.json`), batch 4
(`config_/train_faceDP.json`), ALL model outputs consumed (depth + normal).

Baseline derivation (the reference repo publishes no numbers — BASELINE.md):
the forward costs 392.2 GFLOP/pair at 768x576 (measured via XLA cost
analysis of the reference-equivalent compute graph, fp32, unbounded deform).
The reference envelope is torch 1.5/fp32 on CUDA 10.1-era hardware (RTX
2080 Ti class, 13.45 TFLOP/s fp32 peak). Sustained utilization for THIS
model is well below clean-ResNet levels: cuDNN 3-D convs (~20-30% of peak),
a python-looped 8-plane cost volume with per-plane FFTs, the latency-bound
dcn3d CUDA gather, and PL DataParallel overhead — 25% of peak is a generous
estimate. Anchor:

    13.45e12 * 0.25 / 392.2e9 = 8.6 DP pairs/s (GPU forward)

North star (BASELINE.json) is >=5x that per chip: TARGET = 42.9 pairs/s.
`vs_baseline` = measured / TARGET, so 1.0 == the 5x-per-GPU target met at
the reference's own resolution.

Driver-budget design (round-3, after the round-2 rc=124 timeout):
  * the JAX persistent compilation cache is enabled (`.jax_cache/`), so any
    rerun on this host is warm;
  * the chained forward reps run under `lax.scan` — ONE compiled body
    instead of REPS inlined copies, cutting cold compile time several-fold;
  * the headline JSON line is printed (and flushed) IMMEDIATELY after the
    forward measurement; the train-step and stereodpnet_plus extras follow
    in the same process, and the merged JSON is re-emitted last;
  * the whole measurement runs as a WORKER subprocess under a jax-free
    SUPERVISOR (this file, no args): the supervisor streams the worker's
    lines through, and at BENCH_DEADLINE_S (default 480 s) kills the worker,
    re-prints the last JSON line seen, and exits 0. A hung compile anywhere
    in the worker can cost the extras, never the artifact or the exit code.
    If the worker never emits a headline at all (a wedged tunnel claim can
    hang jax.devices() indefinitely), the supervisor falls back to the last
    successful measurement persisted on this host (.bench_last.json),
    marked `"stale": true` so the record is honest about its provenance.
    (An in-process watchdog thread was tried first: XLA compiles can hold
    the GIL for minutes, so no Python thread/signal is guaranteed to run.)
    Set BENCH_FAST=1 to skip the extras; `bench.py --extra train|exact|plus`
    runs one extra alone. The exact extra reports the reference-exact
    semantics (unbounded packed8 deform + exact attention + unfused
    regression) so the headline JSON carries both the serving fast-path AND
    the exact-path number (VERDICT r4 item 4). The probe_ms/session_drift
    fields normalize backend drift across sessions (item 5).
"""
from __future__ import annotations

import json
import os
import sys
import time

T_START = time.perf_counter()
DEADLINE_S = float(os.environ.get("BENCH_DEADLINE_S", "480"))

FLOPS_PER_PAIR = 392.2e9        # XLA cost analysis, fwd @768x576 fp32
GPU_PEAK_FP32 = 13.45e12        # RTX 2080 Ti class (CUDA 10.1 era)
GPU_UTIL = 0.25                 # documented estimate, see module docstring
REF_GPU_PAIRS_PER_SEC = GPU_PEAK_FP32 * GPU_UTIL / FLOPS_PER_PAIR  # ~8.6
TARGET = 5.0 * REF_GPU_PAIRS_PER_SEC

BATCH = int(os.environ.get("BENCH_BATCH", "4"))
HEIGHT, WIDTH = 768, 576        # reference hard_crop (factor-96 multiples)
WARMUP = 2
ITERS = 10
TRAIN_BATCH = 2                 # fwd+bwd at full res fits 16 GB at batch 2
TRAIN_ITERS = 5
REPS_PER_DISPATCH = 8           # forwards chained (lax.scan) per dispatch

# Session-drift probe (VERDICT r4 item 5): a fixed [4096]^2 bf16 matmul
# chain whose time depends only on backend/tunnel conditions, never on this
# repo's code. PROBE_REF_MS is the reference session's measurement
# (2026-08-19 late-night session, the same session that recorded the round-5
# A/Bs; measured 18.10-18.95 over repeated runs, median-ish 18.5);
# session_drift = probe_ms / PROBE_REF_MS, so a reader can tell backend
# drift from code change when comparing rounds (the observed
# session-to-session spread is ~6% — larger than round margins).
PROBE_REF_MS = 18.5
PROBE_N = 4096
PROBE_REPS = 16


# trace-time kernel knobs and their "not set / default" sentinel: any other
# value marks the run as an A/B VARIANT (labeled in the headline, never
# persisted as the supervisor's stale fallback)
_VARIANT_VARS = (
    ("DPFACE_DSLICE_FOLD", "out"),
    ("DPFACE_AGG_DPACK", ""),
    ("DPFACE_PRELU", "where"),
    ("DPFACE_TOWER_S2D", ""),
    ("DPFACE_ATTN_LAYOUT", ""),
    ("DPFACE_EXACT_ATTN", ""),
    ("DPFACE_ASM_REMAT_SAVE", ""),
    ("DPFACE_ASM_HEAD_S2D", ""),
)


def _dfold_env():
    """Non-default kernel-env overrides, if any (A/B runs in the battery)."""
    parts = []
    for var, default in _VARIANT_VARS:
        v = os.environ.get(var, default)
        if v != default:
            parts.append(f"{var}={v}")
    return ",".join(parts)


def _enable_compile_cache():
    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


def _remaining():
    return DEADLINE_S - (time.perf_counter() - T_START)


def make_bench_batch(b, h, w):
    import numpy as np

    rng = np.random.default_rng(0)
    depth = rng.uniform(800, 1200, (b, h, w)).astype(np.float32)
    ab = np.tile(np.array([[32.98, -26996.49]], np.float32), (b, 1))
    disp = (ab[:, 1:2, None] / depth + ab[:, 0:1, None]).astype(np.float32)
    return {
        "left": rng.standard_normal((b, h, w, 3)).astype(np.float32),
        "right": rng.standard_normal((b, h, w, 3)).astype(np.float32),
        "center": rng.standard_normal((b, h, w, 3)).astype(np.float32),
        "depth": depth,
        "mask": np.ones((b, h, w), np.float32),
        "disp": disp,
        "idepth": (depth.max() / depth).astype(np.float32),
        "normal": rng.standard_normal((b, h, w, 3)).astype(np.float32),
        "K": np.tile(
            np.array([[[7400.0, 0, w / 2], [0, 7400.0, h / 2], [0, 0, 1]]], np.float32),
            (b, 1, 1),
        ),
        "abvalue": ab,
    }


def measure_probe():
    """Backend drift probe: ms per dispatch of PROBE_REPS chained bf16
    [PROBE_N]^2 matmuls (inputs perturbed per rep so nothing CSEs). Code-
    independent by construction — any change in this number between sessions
    is tunnel/backend drift, not repo changes."""
    import jax
    import jax.numpy as jnp

    a = jnp.ones((PROBE_N, PROBE_N), jnp.bfloat16) * 0.01
    b = jnp.eye(PROBE_N, dtype=jnp.bfloat16)

    @jax.jit
    def run(a, b):
        def body(x, i):
            return jnp.dot(x + i.astype(jnp.bfloat16), b), ()

        out, _ = jax.lax.scan(body, a, jnp.arange(PROBE_REPS, dtype=jnp.int32))
        return jnp.sum(out.astype(jnp.float32))

    float(run(a, b))  # compile + barrier
    float(run(a, b))
    t0 = time.perf_counter()
    n = 4
    for _ in range(n):
        out = run(a, b)
    float(out)
    return (time.perf_counter() - t0) / n * 1000.0


def _build(config_name="train_synthetic_stereodpnet", mode="serving"):
    import jax
    import jax.numpy as jnp

    from dualpixelface_tpu.config import Configuration
    from dualpixelface_tpu.models import model_selector

    cfg = Configuration(config_name, make_workspace=False)
    if mode == "serving":
        # production eval path: bf16 + Pallas fused regression + Pallas
        # deform + hoisted attention head (fast_attention — promoted to the
        # serving default in round 4: the stereodpnet_plus receipt test
        # bounds its deviation inside the parity budget,
        # tests/test_stereodpnet.py)
        cfg.data["model"]["fused_regression"] = True
        cfg.data["model"]["deform_impl"] = "pallas"
        cfg.data["model"]["fast_attention"] = True
        # the serving contract (round 5): offsets clamped in-graph to the
        # kernel's +-AP aperture, so the windowed kernel is exact by
        # construction on clamp-trained checkpoints
        # (tests/test_serving_parity.py pins it on a plateau checkpoint)
        cfg.data["model"]["deform_offset_clamp"] = True
    else:  # "exact": the reference-exact semantics (stereodpnet defaults —
        # unbounded packed8 deform, exact attention, unfused regression;
        # /root/reference/src/module/dcn3d/src/cuda/deform_im2col_cuda.cuh:27-72).
        # Chunk the packed8 gather so the [B, 8*Cin, N*K] pre-reduce fits
        # 16 GB at the b4 768x576 headline shape (the round-4 OOM).
        assert mode == "exact", mode
        cfg.data["model"]["deform_gather_chunks"] = 8
    # per-site dslice folds (taps at the co=1 classifier heads, out
    # elsewhere), selected on-chip 2026-08-19 — docs/PERFORMANCE.md round 4
    cfg.data["model"]["agg_dfold"] = "auto"
    # resident D-packed aggregation, FULL extent (model default; exact
    # reparametrization). Round-5 same-session A/B at b4 768x576:
    # off 41.38 / dres 43.74 / full 45.17 pairs/s
    cfg.data["model"]["agg_dpack"] = "full"
    # space-to-depth tower, HALF extent (stem + block1; exact
    # reparametrization, ops/s2d.py). Same-session forward A/B at b4
    # 768x576: off 40.85 / half 40.83 / full 40.11 pairs/s — the packed
    # 1/4+1/8 regions lose on the forward, so serving keeps 'half'
    cfg.data["model"]["tower_s2d"] = "half"
    opt = cfg.get_config()
    model = model_selector(opt)

    # init on CPU at a small size (params are shape-agnostic; the fused /
    # pallas twins have identical param trees), then transfer
    init_cfg = Configuration(config_name, make_workspace=False)
    init_cfg.data["model"]["deform_impl"] = "packed8"
    init_cfg.data["model"]["fused_regression"] = False
    init_model = model_selector(init_cfg.get_config())
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        small = jax.tree_util.tree_map(jnp.asarray, make_bench_batch(1, 96, 96))
        variables = init_model.init(jax.random.PRNGKey(0), small, train=False)
    device = jax.devices()[0]
    return opt, model, jax.device_put(variables, device), device


def measure_forward(opt, model, variables, device):
    """Steady-state serving throughput: REPS_PER_DISPATCH forwards are
    chained inside ONE executable via `lax.scan` (every floating camera view
    is perturbed per rep, so no iteration can be CSE'd and the full two-tower
    feature extraction runs each rep), timed over ITERS dispatches with a
    scalar readback barrier.

    Chaining matters on this host: the tunneled TPU backend adds a measured
    ~20-30 ms of per-dispatch overhead that a production serving loop
    (continuous batches on a local chip) would not pay; single-dispatch
    timing would attribute it to the model."""
    import jax
    import jax.numpy as jnp

    from dualpixelface_tpu.ops.precision import cast_floating

    batch = jax.device_put(
        jax.tree_util.tree_map(jnp.asarray, make_bench_batch(BATCH, HEIGHT, WIDTH)),
        device,
    )
    jax.block_until_ready((variables, batch))

    @jax.jit
    def fwd(variables, batch):
        v = cast_floating(variables, jnp.bfloat16)
        b = cast_floating(batch, jnp.bfloat16)

        def body(total, i):
            bi = dict(b)
            # perturb EVERY floating input consumed by the model so no
            # subgraph (either feature tower, the volumes) repeats across reps
            eps = i.astype(jnp.bfloat16)
            for k in ("left", "right", "center"):
                bi[k] = b[k] + eps
            results = model.apply(v, bi, train=False)
            # consume EVERY output so XLA cannot DCE the normal branch
            total = total + jnp.sum(results["pred_depth"]).astype(jnp.float32)
            if results.get("pred_normal") is not None:
                total = total + jnp.sum(results["pred_normal"]).astype(jnp.float32)
            return total, ()

        total, _ = jax.lax.scan(
            body, jnp.float32(0), jnp.arange(REPS_PER_DISPATCH, dtype=jnp.int32)
        )
        return total

    for _ in range(WARMUP):
        float(fwd(variables, batch))
    t0 = time.perf_counter()
    out = None
    for _ in range(ITERS):
        out = fwd(variables, batch)
    float(out)
    dt = time.perf_counter() - t0
    return BATCH * REPS_PER_DISPATCH * ITERS / dt


def measure_train_step():
    """Full train step (fwd+bwd+adam, bf16, cross-replica BN) at the
    reference crop, batch 2; the deform convs differentiate through the
    fused Pallas backward (kernels/deform_fused.py)."""
    import jax
    import jax.numpy as jnp

    from dualpixelface_tpu.config import Configuration
    from dualpixelface_tpu.losses import loss_selector
    from dualpixelface_tpu.models import model_selector
    from dualpixelface_tpu.train.state import create_train_state
    from dualpixelface_tpu.train.steps import make_train_step

    cfg = Configuration("train_synthetic_stereodpnet", make_workspace=False)
    cfg.data["model"]["deform_impl"] = "pallas"
    # round 3: fused_softargmin now has a Pallas backward (custom_vjp), so
    # training also skips the x64 full-res logit/prob materialization
    cfg.data["model"]["fused_regression"] = True
    # exact s2d tower, FULL pyramid extent (the backward doubles the conv
    # work, so the packed interblocks pay off in training where they lose
    # on the forward): same-session train A/B half 8.16 / full 8.47 pairs/s
    cfg.data["model"]["tower_s2d"] = "full"
    # resident D-packed aggregation (model default 'full'): round-5 train
    # A/B off 9.065 / dres 9.625 / full 9.844 pairs/s
    cfg.data["model"]["agg_dpack"] = "full"
    opt = cfg.get_config()
    model = model_selector(opt)
    batch = jax.tree_util.tree_map(
        jnp.asarray, make_bench_batch(TRAIN_BATCH, HEIGHT, WIDTH)
    )
    # init on CPU at a small spatial size (params are shape-agnostic) — a
    # full-res init program is minutes of avoidable compile on this host.
    # The XLA twins (packed8 / unfused) share the param tree, so init with
    # them: the Pallas kernels don't lower on CPU.
    init_cfg = Configuration("train_synthetic_stereodpnet", make_workspace=False)
    init_cfg.data["model"]["deform_impl"] = "packed8"
    init_cfg.data["model"]["fused_regression"] = False
    init_model = model_selector(init_cfg.get_config())
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        small = jax.tree_util.tree_map(
            jnp.asarray, make_bench_batch(TRAIN_BATCH, 96, 96)
        )
        state = create_train_state(init_model, opt, small, steps_per_epoch=100)
    state = jax.device_put(state, jax.devices()[0])
    step = make_train_step(model, loss_selector(opt), jnp.bfloat16)
    state, losses = step(state, batch)
    float(losses["final_loss"])  # compile + barrier
    t0 = time.perf_counter()
    for _ in range(TRAIN_ITERS):
        state, losses = step(state, batch)
    float(losses["final_loss"])
    return TRAIN_BATCH * TRAIN_ITERS / (time.perf_counter() - t0)


def _run_extra(kind):
    """Run one extra measurement in THIS process and print its JSON line."""
    _enable_compile_cache()
    if kind == "train":
        value = measure_train_step()
    elif kind == "plus":
        value = measure_forward(*_build("train_synthetic_stereodpnet_plus"))
    elif kind == "exact":
        value = measure_forward(*_build(mode="exact"))
    else:  # pragma: no cover - CLI guard
        raise SystemExit(f"unknown extra {kind!r}")
    print(json.dumps({"extra": kind, "value": round(value, 3)}), flush=True)


def _merged_line(headline, extras):
    merged = dict(headline)
    merged["train_step_pairs_per_sec_b2"] = extras.get("train")
    merged["stereodpnet_exact_fwd_pairs_per_sec"] = extras.get("exact")
    merged["stereodpnet_plus_fwd_pairs_per_sec"] = extras.get("plus")
    return json.dumps(merged)


def _worker():
    _enable_compile_cache()
    # drift probe FIRST: its number must reflect the same session conditions
    # as the measurements that follow, and it doubles as a cheap tunnel
    # liveness check before the expensive model build
    probe_ms = measure_probe()
    opt, model, variables, device = _build()
    pairs_per_sec = measure_forward(opt, model, variables, device)
    del variables  # free HBM before the extras re-build

    headline = {
        "metric": "stereodpnet_fwd_dp_pairs_per_sec_per_chip_768x576",
        "value": round(pairs_per_sec, 3),
        "unit": "pairs/s",
        "vs_baseline": round(pairs_per_sec / TARGET, 3),
        "resolution": f"{HEIGHT}x{WIDTH}",
        "batch": BATCH,
        # the measured program is the production SERVING configuration
        # (windowed Pallas deform + fused regression — stereodpnet_plus's
        # fast paths); `stereodpnet`'s own default is the exact unbounded
        # packed8 semantics (README deviations, deform_window_ab.py)
        "config": "serving fast paths (deform_impl=pallas, deform_offset_clamp, fused_regression, fast_attention, agg_dfold=auto, agg_dpack=full, tower_s2d=half)"
        + (f" +{_dfold_env()}" if _dfold_env() else ""),
        "anchor_gpu_pairs_per_sec": round(REF_GPU_PAIRS_PER_SEC, 2),
        "anchor_flops_per_pair": FLOPS_PER_PAIR,
        "anchor_gpu_util": GPU_UTIL,
        # backend drift vs the reference session (1.0 = same speed; >1.0 =
        # this session is SLOWER — divide pairs/s by it to normalize)
        "probe_ms": round(probe_ms, 2),
        "session_drift": round(probe_ms / PROBE_REF_MS, 3),
    }
    # land the headline NOW — extras below must not be able to lose it
    print(json.dumps(headline), flush=True)

    # soft budgets (measured warm costs ~150-200 s / ~100 s): skip an extra
    # the budget can't fit so the worker exits CLEANLY — the supervisor's
    # kill is a last resort (an uncleanly killed client can wedge the
    # tunnel's chip claim for ~10 min)
    extras = {}
    if os.environ.get("BENCH_FAST", "0") != "1":
        if _remaining() > 240:
            try:
                extras["train"] = round(measure_train_step(), 3)
            except Exception as e:  # noqa: BLE001 — never kill the headline
                print(f"# train-step extra failed: {e!r}", file=sys.stderr)
        if _remaining() > 150:
            try:
                extras["exact"] = round(measure_forward(*_build(mode="exact")), 3)
            except Exception as e:  # noqa: BLE001
                print(f"# exact-path extra failed: {e!r}", file=sys.stderr)
        if _remaining() > 100:
            try:
                extras["plus"] = round(
                    measure_forward(*_build("train_synthetic_stereodpnet_plus")), 3
                )
            except Exception as e:  # noqa: BLE001
                print(f"# stereodpnet_plus extra failed: {e!r}", file=sys.stderr)

    print(_merged_line(headline, extras), flush=True)


def _host_fingerprint() -> str:
    """Identity of THIS host, stamped into .bench_last.json: the stale
    fallback must never serve a number measured on a different machine
    (VERDICT r3 item 4 — the file is also untracked from git)."""
    import platform

    machine_id = ""
    try:
        with open("/etc/machine-id") as f:
            machine_id = f.read().strip()
    except OSError:
        pass
    return f"{platform.node()}:{machine_id}"


def _supervise():
    """jax-free deadline enforcement: stream the worker's stdout, and at the
    deadline kill it and re-print the last JSON line so the artifact tail is
    always a parseable headline."""
    import subprocess
    import threading

    here = os.path.dirname(os.path.abspath(__file__))
    last_path = os.path.join(here, ".bench_last.json")
    proc = subprocess.Popen(
        [sys.executable, "-u", os.path.abspath(__file__), "--worker"],
        stdout=subprocess.PIPE, text=True, cwd=here,
    )
    json_lines = []

    def _pump():
        for line in proc.stdout:
            print(line, end="", flush=True)
            try:
                record = json.loads(line)
                if "metric" in record:
                    json_lines.append(line.strip())
                    if not _dfold_env():  # never persist A/B variant runs
                        record["host_fingerprint"] = _host_fingerprint()
                        with open(last_path, "w") as f:
                            f.write(json.dumps(record))
            except (ValueError, OSError):
                pass

    pump = threading.Thread(target=_pump, daemon=True)
    pump.start()
    try:
        proc.wait(timeout=max(_remaining(), 5.0))
        timed_out = False
    except subprocess.TimeoutExpired:
        proc.kill()
        timed_out = True
    pump.join(timeout=10)
    if timed_out and json_lines:
        print(f"# deadline {DEADLINE_S:.0f}s hit; re-emitting headline",
              file=sys.stderr)
        print(json_lines[-1], flush=True)
    if not json_lines:
        # The worker never produced a headline (e.g. the tunneled device
        # claim wedged before jax.devices() returned — observed to hang
        # indefinitely). Fall back to the last successful measurement on
        # this host, HONESTLY MARKED stale so the record says what it is.
        try:
            with open(last_path) as f:
                stale = json.loads(f.read())
            if stale.pop("host_fingerprint", None) != _host_fingerprint():
                raise ValueError("stale record is from a different host")
            stale["stale"] = True
            # record HOW the fresh run died so a crash (rc != None) is
            # distinguishable from a hung tunnel claim (killed, rc None)
            stale["worker_rc"] = proc.returncode
            print("# worker produced no headline; emitting last successful "
                  "measurement on this host (marked stale)", file=sys.stderr)
            print(json.dumps(stale), flush=True)
            sys.exit(0)
        except (OSError, ValueError):
            pass
    sys.exit(0 if json_lines else (proc.returncode or 1))


def main():
    if len(sys.argv) >= 3 and sys.argv[1] == "--extra":
        _run_extra(sys.argv[2])
    elif len(sys.argv) >= 2 and sys.argv[1] == "--worker":
        _worker()
    else:
        _supervise()


if __name__ == "__main__":
    main()
