#!/usr/bin/env python
"""Split the ANM stage cost at the reference crop (768x576, batch 4):
quarter-res feature volume [4, 4, 192, 144, 67] -> deform convs vs the rest.

Pieces timed (scalar-readback barriers):
  * table prep (_prep_table) alone
  * full pallas deform_conv3d (prep + kernel + post-transpose + matmul)
  * kernel + matmul minus the post-reshape (upper bound on transpose cost)
  * the 2-D n_convs stack + upsample tail at the same shape
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, warmup=2, iters=10):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
        float(jnp.sum(fn(*args)).astype(jnp.float32))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out).astype(jnp.float32))
    return (time.perf_counter() - t0) / iters


def main():
    from dualpixelface_tpu.ops.deform_conv3d import deform_conv3d
    from dualpixelface_tpu.ops.kernels import deform_gather as dg

    b, d, h, w, cin, cout = 4, 4, 192, 144, 67, 64
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, d, h, w, cin)), jnp.float32)
    off = jnp.asarray(rng.standard_normal((b, d, h, w, 81)) * 2, jnp.float32)
    wt = jnp.asarray(rng.standard_normal((3, 3, 3, cin, cout)) * 0.05, jnp.float32)

    n_chunks = -(-cin // dg.CH)
    prep = jax.jit(lambda x_: dg._prep_table(x_, n_chunks, 4))
    t_prep = timeit(prep, x)
    print(f"table prep:        {t_prep*1e3:7.1f} ms "
          f"(table {np.prod(prep(x).shape)*4/1e9:.2f} GB)")

    cols_fn = jax.jit(lambda x_, o_: dg.deform_gather_cols(x_, o_, interpret=False))
    t_cols = timeit(cols_fn, x, off)
    print(f"prep+kernel+post:  {t_cols*1e3:7.1f} ms")

    full = jax.jit(lambda x_, o_: dg.deform_conv3d_pallas(x_, o_, wt))
    t_full = timeit(full, x, off)
    print(f"full pallas conv:  {t_full*1e3:7.1f} ms")

    pk8 = jax.jit(
        lambda x_, o_: deform_conv3d(x_, o_, wt, impl="packed8", aperture=True)
    )
    t_pk8 = timeit(pk8, x, off)
    print(f"XLA packed8 twin:  {t_pk8*1e3:7.1f} ms")

    # tail: n_convs 2-D stack + upsample at ANM shape
    from flax import linen as nn

    from dualpixelface_tpu.ops.blocks import he_normal_out
    from dualpixelface_tpu.ops.resize import upsample2d_bilinear

    class Tail(nn.Module):
        @nn.compact
        def __call__(self, fv2):
            c = 32
            plan = [(3 * c, 1), (3 * c, 2), (2 * c, 4), (2 * c, 8), (c, 1), (3, 1)]
            bk, d_s, hh, ww, cc = fv2.shape
            feats = fv2.reshape(bk * d_s, hh, ww, cc)
            for li, (ch, dil) in enumerate(plan):
                feats = nn.leaky_relu(
                    nn.Conv(ch, (3, 3), padding=[(dil, dil)] * 2,
                            kernel_dilation=(dil, dil), use_bias=False,
                            kernel_init=he_normal_out, name=f"n_convs{li}")(feats),
                    0.1,
                )
            feats = nn.sigmoid(upsample2d_bilinear(feats, 4))
            return feats.reshape(bk, d_s, feats.shape[1], feats.shape[2], 3).mean(axis=1)

    fv2 = jnp.asarray(rng.standard_normal((b, d, h, w, cout)), jnp.bfloat16)
    tail = Tail()
    vs = tail.init(jax.random.PRNGKey(0), fv2)
    import dualpixelface_tpu.ops.precision as prec

    vs = prec.cast_floating(vs, jnp.bfloat16)
    tail_fn = jax.jit(lambda v, f: tail.apply(v, f))
    t_tail = timeit(tail_fn, vs, fv2)
    print(f"n_convs+upsample:  {t_tail*1e3:7.1f} ms (bf16)")

    # bf16 variants of the deform conv
    xb, ob = x.astype(jnp.bfloat16), off.astype(jnp.bfloat16)
    t_full_b = timeit(full, xb, ob)
    print(f"full pallas bf16in:{t_full_b*1e3:7.1f} ms")


if __name__ == "__main__":
    main()
