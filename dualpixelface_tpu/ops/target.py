"""Target-platform detection for kernel dispatch.

Pallas kernels must decide at TRACE time whether they are lowering for a
real TPU (Mosaic) or need their XLA/interpret twin (CPU tests, dryrun).
`jax.default_backend()` answers "what backend is attached", which is wrong
under AOT compilation: `jax.jit(...).lower(...).compile()` against a
`jax.experimental.topologies` TPU descriptor traces on a CPU-only host but
targets TPU. `DPFACE_TARGET=tpu|cpu` overrides detection for that case
(tools/aot_analyze.py sets it).

Precedence: an explicit `jax.default_device(...)` context wins over the env
var — it is the more local signal, and tools that pin a CPU device for
init (e.g. tools/bench_anm_stage.py) must not be flipped onto the Mosaic
path by an exported DPFACE_TARGET (ADVICE r3). AOT workflows set the env var
*without* a default-device context, so their dispatch is unchanged.
"""
from __future__ import annotations

import os

import jax


def tpu_lowering() -> bool:
    """True when kernels should take their TPU (Mosaic) path."""
    dd = jax.config.jax_default_device
    if dd is not None:
        return dd.platform == "tpu"
    override = os.environ.get("DPFACE_TARGET")
    if override:
        return override == "tpu"
    return jax.default_backend() == "tpu"
