"""Shared Flax NN building blocks (channels-last, TPU-native layouts).

Parity target: reference `src/module/asm/basics.py:9-112` (convbn, convbn_3d,
tconvbn, depthwise_separable_conv, BasicBlock, DomainNorm). Re-designed for
TPU: NHWC / NDHWC layouts (XLA's native conv layouts on TPU), explicit
symmetric padding matching torch's `padding=p` semantics, BatchNorm whose
batch statistics are computed over the *global* batch — under pjit with the
batch sharded over the `data` mesh axis this is cross-replica SyncBN by
construction (the reference only gets this with accelerator='ddp',
config_manager.py:57).

All modules take a `dtype`; the default None follows the input/param
promotion (bf16 end-to-end once the step casts params + batch, fp32 when
uncast), so the training policy's cast actually reaches every conv — flax
modules with an explicit fp32 dtype silently promote bf16 inputs back up.
Norm layers still compute their statistics in fp32 internally (flax
`_compute_stats` upcasts half precision), so bf16 here only changes the
activation traffic, not the stats math.
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

# He-normal with fan_out, matching the reference's weight init
# normal_(0, sqrt(2/n)) with n = prod(kernel) * out_channels
# (ref src/model/stereodpnet/mainmodel.py:51-65).
he_normal_out = jax.nn.initializers.variance_scaling(2.0, "fan_out", "normal")

Dtype = Any


def torch_pad(kernel_size: int, dilation: int = 1) -> int:
    """The reference's dilation-aware padding: pad = dilation if dilation > 1
    else (k-1)//2 — for k=3 both equal dilation*(k-1)//2 (ref basics.py:17)."""
    return dilation * (kernel_size - 1) // 2


class ConvBN(nn.Module):
    """2D conv + BatchNorm, no activation (ref basics.py convbn).

    Input/Output: [B, H, W, C]. Padding follows torch's symmetric
    `padding=p` convention exactly (flax 'SAME' differs for stride>1).
    """

    features: int
    kernel_size: int = 3
    strides: int = 1
    pad: int | None = None
    dilation: int = 1
    use_bias: bool = False
    dtype: Dtype = None
    # s2d=True: input is a space-to-depth packed [N, Hc, Wc, 4*Cin] tensor
    # (ops/s2d.py); stride 1 emits packed, stride 2 emits the dense coarse
    # grid. Params ('Conv_0' kernel, 'BatchNorm_0') and BN statistics are
    # identical to the fine path — see the s2d module docstring.
    s2d: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.s2d:
            from dualpixelface_tpu.ops.s2d import S2DBatchNorm, S2DConv

            assert self.pad is None or self.pad == torch_pad(
                self.kernel_size, self.dilation
            ), "s2d path supports torch_pad (SAME) semantics only"
            y = S2DConv(
                self.features, self.kernel_size, self.strides, self.dilation,
                use_bias=self.use_bias, kernel_init=he_normal_out,
                dtype=self.dtype, name="Conv_0",
            )(x)
            if self.strides == 1:  # packed output: BN without leaving 4C lanes
                return S2DBatchNorm(
                    use_running_average=not train, momentum=0.9, epsilon=1e-5,
                    dtype=self.dtype, name="BatchNorm_0",
                )(y)
            return nn.BatchNorm(  # stride-2 emits the dense coarse grid
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, name="BatchNorm_0",
            )(y)
        p = self.pad if self.pad is not None else torch_pad(self.kernel_size, self.dilation)
        x = nn.Conv(
            self.features,
            kernel_size=(self.kernel_size, self.kernel_size),
            strides=(self.strides, self.strides),
            padding=[(p, p), (p, p)],
            kernel_dilation=(self.dilation, self.dilation),
            use_bias=self.use_bias,
            kernel_init=he_normal_out,
            dtype=self.dtype,
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype
        )(x)
        return x


class _DSliceConv3D(nn.Module):
    """Param-compatible stand-in for nn.Conv(3x3x3, pad 1, stride 1 or 2)
    that computes the 3-D conv as ONE 2-D conv with the kd taps folded into
    OUTPUT channels, then two D-shifted adds.

    XLA's TPU 3-D conv runs at single-digit MFU for the cost-volume channel
    widths. The shape rationale (measured, docs/PERFORMANCE.md): the MXU
    wants a large N dim — a D-folded banded conv (N = D*C) hit 88% hardware
    MFU but burned ~10x structural-zero FLOPs; kd-sliced convs (N = C = 32)
    starved the MXU. Here N = 3*Cout with zero structural waste: the conv
    computes y[., kd, co] = (w[kd] * x) once per input plane (D folds into
    the batch), and out[do] = sum_kd y[do + kd - 1, kd] is a pair of cheap
    elementwise adds. The parameter is the same [3,3,3,Cin,Cout] kernel, so
    checkpoints/converters are unaffected.
    """

    features: int
    strides: tuple = (1, 1, 1)
    use_bias: bool = False
    kernel_init: Any = he_normal_out
    bias_init: Any = nn.initializers.zeros
    dtype: Dtype = None
    # kd folding side: "out" (default) folds the 3 kd taps into OUTPUT
    # channels (N = 3*Co for the MXU) + D-shifted adds; "taps" swaps M/N for
    # the co=1 classifier heads; "pallas" is the fused v1 kernel (wins ONLY
    # at the deform offset heads' 3*Co=243 shape, where it is the default);
    # "auto" picks per-site from the on-chip sweeps. Rejected variants: XLA
    # formulations (in/out2/kdsum/bgc, 1.4-2.6x worse by the compiler's
    # cost model) live in tools/aot_micro.py; the epilogue-fused pallas2
    # kernel (lost every on-chip full-chain A/B) lives in
    # tools/attic/conv3d_dslice_v2.py.
    dfold: str = "out"

    @nn.compact
    def __call__(self, x):
        import os

        b, d, h, w, c = x.shape
        co = self.features
        kernel = self.param("kernel", self.kernel_init, (3, 3, 3, c, co))
        dt = x.dtype if self.dtype is None else self.dtype
        sd, sh, sw = self.strides
        do = (d + 2 - 3) // sd + 1
        # DPFACE_DSLICE_FOLD flips the compute path for on-chip A/Bs. It is
        # read at TRACE time: set it before the first jit of a shape — an
        # already-compiled executable will NOT retrace on an env change
        # (construct modules with dfold=... for in-process A/Bs, as
        # tools/bench_dslice_fold.py does).
        dfold = os.environ.get("DPFACE_DSLICE_FOLD", self.dfold)
        if dfold not in ("auto", "out", "pallas", "taps", "s2d", "cpack"):
            raise ValueError(
                f"dfold {dfold!r} not in ('auto', 'out', 'pallas', 'taps', "
                "'s2d', 'cpack') — the rejected A/B variants live in "
                "tools/aot_micro.py (in/out2/kdsum/bgc) and "
                "tools/attic/conv3d_dslice_v2.py (the epilogue-fused pallas2 "
                "kernel, demoted round 5 after losing every on-chip A/B)"
            )
        if dfold == "auto":
            # per-site selection from the on-chip sweeps (2026-08-19,
            # tools/bench_dslice_fold.py + full-model A/Bs;
            # docs/PERFORMANCE.md round 4):
            #  * co=1 classifier heads: 'taps' (1.30 vs 2.03 ms/conv
            #    isolated; full model 39.67 -> 43.43 pairs/s)
            #  * everything else: 'out'. 'cpack' (D-groups-of-4 on lanes)
            #    wins its isolated microbench at the 32-channel stride-1
            #    sites (1.87 vs 2.88 ms) but REGRESSED the full model
            #    (43.43 -> 37.10): the pack/unpack relayouts the isolated
            #    bench amortizes break XLA's fusion in context. It stays
            #    explicitly selectable for future resident-layout work.
            if co == 1 and self.strides == (1, 1, 1):
                dfold = "taps"
            else:
                dfold = "out"
        if dfold == "taps" and not (co == 1 and self.strides == (1, 1, 1)):
            dfold = "out"
        if dfold == "taps":
            # single-output-channel head (the classifier convs): ANY conv
            # formulation puts co on the MXU's N dim — 1 lane of 128, ~0.6%
            # MFU measured. Swap M and N instead: P[k, m] = w[k, :] . x[m, :]
            # puts the 27 taps on M (padded to the MXU tile, but the FLOPs
            # are trivial) and the voxels on N, then the conv is 27 shifted
            # adds of P's MAJOR-dim planes — compact reads, no lane waste
            # (the epilogue-fused pallas2 attempt at these sites lost every
            # on-chip A/B and lives in tools/attic/conv3d_dslice_v2.py).
            wmat = kernel.reshape(27, c).astype(dt)  # [(kd,kh,kw), C]
            p = jax.lax.dot_general(
                wmat, x.astype(dt), (((1,), (4,)), ((), ())),
                preferred_element_type=dt,
            )  # [27, B, D, H, W]
            pp = jnp.pad(p, ((0, 0), (0, 0), (1, 1), (1, 1), (1, 1)))
            acc = None
            k = 0
            for kd in range(3):
                for kh in range(3):
                    for kw in range(3):
                        term = pp[k, :, kd : kd + d, kh : kh + h, kw : kw + w]
                        term = term.astype(jnp.float32)
                        acc = term if acc is None else acc + term
                        k += 1
            out = acc.astype(dt)[..., None]
            if self.use_bias:
                out = out + self.param("bias", self.bias_init, (co,)).astype(out.dtype)
            return out
        if dfold == "pallas" and dt != jnp.bfloat16:
            # f32 doubles every VMEM-resident block: at the 768x576 offset-
            # head shape the kernel's scoped-vmem stack is 35.9M vs the 16M
            # limit (XLA:TPU compile error, seen via eval_at_scale at
            # precision 32). The fused fold is a bf16-serving optimization;
            # f32 keeps the XLA fold.
            dfold = "out"
        if dfold == "pallas" and self.strides == (1, 1, 1):
            # fused Pallas conv (kernels/conv3d_dslice.py): no HBM 3*Co
            # intermediate, no layout copies. Wins (and is the default) at
            # the deform offset heads' 3*Co=243 shape; the hourglass sites
            # keep XLA folds (see the kernel module docstring). Falls back
            # to the XLA twin off-TPU; gradients via custom_vjp.
            from dualpixelface_tpu.ops.kernels.conv3d_dslice import (
                conv3d_dslice_pallas,
            )

            out = conv3d_dslice_pallas(x.astype(dt), kernel.astype(dt))
            if self.use_bias:
                out = out + self.param("bias", self.bias_init, (co,)).astype(out.dtype)
            return out
        if dfold == "pallas":
            # the kernel's stride-2 variant is interpret-verified but its
            # parity-extraction form Mosaic-compiles pathologically slowly
            # (>15 min at the hourglass shape) — strided convs keep XLA
            dfold = "out"
        if dfold == "s2d":
            # measured negative (round 4): the 2x2x2 space-to-depth pack of
            # the stride-2 sites (parities onto channels, dense 2-tap VALID
            # conv, K=8C) lost 1.8-2.4x to the plain strided fold — the
            # major->minor parity relayout costs more than the strided
            # conv's MFU deficit. Variant retired; see docs/PERFORMANCE.md.
            dfold = "out"
        if dfold == "cpack" and not (
            self.strides == (1, 1, 1) and d % 4 == 0 and d >= 4
        ):
            dfold = "out"
        if dfold == "cpack":
            # D-groups-of-4 packed onto channels: the 'out' fold's 2-D conv
            # reads C=32 of 128 input lanes (11% MFU measured at the dres
            # sites); packing 4 D planes onto the lane dim with a 6-plane
            # halo runs the SAME contraction as a dense [3,3,6C,4Co] conv at
            # ~50% MFU (tools/bench_conv_probe.py) — 2x structural-zero
            # FLOPs, >2x net. Out-plane block j takes in-plane blocks
            # j+kd (kd 0..2) of its 6-plane halo window; halo edges are the
            # conv's zero padding.
            g = d // 4
            xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0))).astype(dt)
            xs = jnp.stack([xp[:, 4 * gi : 4 * gi + 6] for gi in range(g)], 1)
            xs = jnp.moveaxis(xs, 2, 4).reshape(b * g, h, w, 6 * c)
            wk = jnp.zeros((3, 3, 6 * c, 4 * co), kernel.dtype)
            for j in range(4):
                for kd in range(3):
                    wk = wk.at[
                        :, :,
                        (j + kd) * c : (j + kd + 1) * c,
                        j * co : (j + 1) * co,
                    ].set(kernel[kd])
            y = jax.lax.conv_general_dilated(
                xs, wk.astype(dt), (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=dt,
            )  # [b*g, h, w, 4*co]
            out = jnp.moveaxis(
                y.reshape(b, g, h, w, 4, co), 4, 2
            ).reshape(b, d, h, w, co)
            if self.use_bias:
                out = out + self.param("bias", self.bias_init, (co,)).astype(out.dtype)
            return out
        assert dfold == "out", dfold
        # [3kd,3,3,C,Co] -> [3,3,C,(kd,Co)]
        k2 = kernel.transpose(1, 2, 3, 0, 4).reshape(3, 3, c, 3 * co)
        y = jax.lax.conv_general_dilated(
            x.reshape(b * d, h, w, c).astype(dt),
            k2.astype(dt),
            (sh, sw),
            [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=dt,
        )
        ho, wo = y.shape[1], y.shape[2]
        # out[do] = sum_kd y[do*sd + kd - 1, kd-th channel group] via pad +
        # D-shifted strided slices. The kd groups are sliced off the 3*Co
        # LANE axis directly — an earlier [..., 3, co] reshape made co=32
        # the minor dim and cost a 0.7 ms layout-flip copy around every
        # hourglass conv, fwd AND bwd (train profile 2026-08-19). (A 0/1-
        # selection conv over the D axis was also tried; ~20 ms slower.)
        y = y.reshape(b, d, ho, wo, 3 * co)
        yp = jnp.pad(y, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
        out = yp[:, 0 : (do - 1) * sd + 1 : sd, :, :, 0:co]
        for kd in (1, 2):
            out = out + yp[
                :, kd : kd + (do - 1) * sd + 1 : sd, :, :, kd * co : (kd + 1) * co
            ]
        if self.use_bias:
            out = out + self.param("bias", self.bias_init, (co,)).astype(out.dtype)
        return out


class _DPackConv3D(nn.Module):
    """Stride-1 3x3x3 pad-1 conv on a RESIDENT D-packed tensor
    [B, G, H, W, 4C] (ops/s2d.dpack layout: 4 D-planes on the lane dim).

    Same contraction as the 'cpack' fold in _DSliceConv3D (a dense
    [3, 3, 6C, 4Co] 2-D conv whose output block j sums kd taps from halo
    blocks j+kd — ~50% MFU at the dres shapes vs 11% for the 'out' fold),
    but input AND output stay packed: the 6-plane halo is rebuilt from the
    packed neighbors with two 1-plane lane slices instead of a full
    pack/unpack pair around every conv (the measured reason per-conv cpack
    lost full-model, docs/PERFORMANCE.md round 4). Halo edges (G-axis pad)
    are the conv's D zero-padding. Declares the identical 'kernel'
    [3, 3, 3, C, Co] parameter as _DSliceConv3D/nn.Conv."""

    features: int
    dtype: Dtype = None

    @nn.compact
    def __call__(self, q):
        import os

        b, g, h, w, c4 = q.shape
        c = c4 // 4
        co = self.features
        kernel = self.param("kernel", he_normal_out, (3, 3, 3, c, co))
        dt = q.dtype if self.dtype is None else self.dtype
        # halo planes: fine plane 4g-1 = last C-block of group g-1,
        # fine plane 4g+4 = first C-block of group g+1 (zeros at the edges)
        prev = jnp.pad(
            q[..., 3 * c :], ((0, 0), (1, 0), (0, 0), (0, 0), (0, 0))
        )[:, :g]
        nxt = jnp.pad(
            q[..., :c], ((0, 0), (0, 1), (0, 0), (0, 0), (0, 0))
        )[:, 1:]
        # halo layout knob (trace-time; on-chip A/B, docs/PERFORMANCE.md
        # round 5): the profiler shows a ~0.4-0.6 ms input-relayout copy in
        # front of every full-scale packed conv — the 6C (=192-lane at C=32)
        # concat lands in a layout the conv relays into T(2,128).
        #   '6c4d' : DEFAULT — concat the 4-D [B*G, H, W, *] views (4-D
        #            operand layout assignment; on-chip 45.84 vs 45.17)
        #   '6c'   : 5-D concat + reshape (round-4 baseline)
        #   '8c'   : pad the halo window to 8C lanes (whole (8,128) lane
        #            tiles at C=32) — LOSES on chip (44.35), kept for A/B
        halo = os.environ.get("DPFACE_DPACK_HALO", "6c4d")
        if halo == "6c4d":
            xs = jnp.concatenate(
                [
                    prev.reshape(b * g, h, w, c),
                    q.reshape(b * g, h, w, 4 * c),
                    nxt.reshape(b * g, h, w, c),
                ],
                axis=-1,
            ).astype(dt)
        elif halo == "8c":
            zt = jnp.zeros(q.shape[:4] + (2 * c,), q.dtype)
            xs = jnp.concatenate([prev, q, nxt, zt], axis=-1)
            xs = xs.reshape(b * g, h, w, 8 * c).astype(dt)
        else:
            xs = jnp.concatenate([prev, q, nxt], axis=-1)
            xs = xs.reshape(b * g, h, w, 6 * c).astype(dt)
        cw = xs.shape[-1]
        wk = jnp.zeros((3, 3, cw, 4 * co), kernel.dtype)
        for j in range(4):
            for kd in range(3):
                wk = wk.at[
                    :, :,
                    (j + kd) * c : (j + kd + 1) * c,
                    j * co : (j + 1) * co,
                ].set(kernel[kd])
        y = jax.lax.conv_general_dilated(
            xs, wk.astype(dt), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=dt,
        )
        return y.reshape(b, g, h, w, 4 * co)


class _DPackConv3DS2(nn.Module):
    """Stride-2 3x3x3 pad-1 conv on a RESIDENT D-packed tensor:
    [B, G, H, W, 4C] -> [B, G/2, H/2, W/2, 4Co] (fine D = 4G, G even).

    Fine output plane 4*go+j reads fine input planes 2*(4*go+j)+kd-1 —
    a 9-plane window [8go-1, 8go+7] per output group: one halo plane (the
    last C-block of group 2go-1, zeros at the edge) plus input groups 2go
    and 2go+1, lane-concatenated to 9C. Output block j takes window plane
    2j+kd for tap kd, so the whole stride-2 3-D conv is ONE dense 2-D conv
    [3, 3, 9C, 4Co] with H/W stride 2 — input and output never leave the
    packed layout. Declares the identical 'kernel' [3,3,3,C,Co] parameter
    as _DSliceConv3D/nn.Conv."""

    features: int
    dtype: Dtype = None

    @nn.compact
    def __call__(self, q):
        b, g, h, w, c4 = q.shape
        assert g % 2 == 0, f"packed stride-2 needs an even group count, got {g}"
        c = c4 // 4
        co = self.features
        kernel = self.param("kernel", he_normal_out, (3, 3, 3, c, co))
        dt = q.dtype if self.dtype is None else self.dtype
        go = g // 2
        q_even = q[:, 0::2]  # groups 2go   (fine planes 8go..8go+3)
        q_odd = q[:, 1::2]   # groups 2go+1 (fine planes 8go+4..8go+7)
        # halo plane 8go-1 = last C-block of group 2go-1 = q_odd[go-1]
        prevlast = jnp.pad(
            q_odd[..., 3 * c :], ((0, 0), (1, 0), (0, 0), (0, 0), (0, 0))
        )[:, :go]
        xs = jnp.concatenate([prevlast, q_even, q_odd], axis=-1)  # 9C lanes
        xs = xs.reshape(b * go, h, w, 9 * c).astype(dt)
        wk = jnp.zeros((3, 3, 9 * c, 4 * co), kernel.dtype)
        for j in range(4):
            for kd in range(3):
                wp = 2 * j + kd  # window plane (0 = fine 8go-1)
                wk = wk.at[
                    :, :, wp * c : (wp + 1) * c, j * co : (j + 1) * co
                ].set(kernel[kd])
        y = jax.lax.conv_general_dilated(
            xs, wk.astype(dt), (2, 2), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=dt,
        )  # [b*go, h/2, w/2, 4co]
        return y.reshape(b, go, y.shape[1], y.shape[2], 4 * co)


class _DPackTConv3D(nn.Module):
    """Transposed 3x3x3 stride-2 conv (torch ConvTranspose3d k3 s2 p1 op1,
    out = exactly 2x in) on a RESIDENT D-packed tensor:
    [B, G, H, W, 4C] -> [B, 2G, 2H, 2W, 4Co] (fine D = 4G).

    Per axis (sub-pixel decomposition, as _PackedTConv3D):
    out[2i] = x[i] w[1]; out[2i+1] = x[i] w[2] + x[i+1] w[0]. Output group
    go holds fine out planes 4go+j, which read fine in planes 2go..2go+2 —
    a 3-plane window per output group (plane 2go+2 zero past the edge):
    even go = blocks 0..2 of input group go/2, odd go = blocks 2,3 plus the
    next group's block 0. The D parities are baked into the kernel scatter
    (output channel blocks j ARE the packed lane order — no D interleave
    op at all); H/W tap pairs ride a 2x2 VALID conv over the +1-padded map
    and interleave in two staged steps. Declares the identical 'kernel'
    [3, 3, 3, Cout, Cin] parameter as nn.ConvTranspose(transpose_kernel)."""

    features: int
    dtype: Dtype = None

    @nn.compact
    def __call__(self, q):
        b, g, h, w, c4 = q.shape
        c = c4 // 4
        co = self.features
        kernel = self.param("kernel", he_normal_out, (3, 3, 3, co, c))
        dt = q.dtype if self.dtype is None else self.dtype
        k = kernel.transpose(0, 1, 2, 4, 3)  # [kd, kh, kw, Cin, Cout]
        go = 2 * g

        # 3-plane windows: even go -> blocks 0..2 of group go/2; odd go ->
        # blocks 2,3 + next group's block 0 (zeros past the top edge)
        nxt0 = jnp.pad(
            q[..., :c], ((0, 0), (0, 1), (0, 0), (0, 0), (0, 0))
        )[:, 1:]
        a = q[..., : 3 * c]                                   # [B, G, .., 3C]
        bwin = jnp.concatenate([q[..., 2 * c :], nxt0], axis=-1)
        xs = jnp.stack([a, bwin], axis=2).reshape(b, go, h, w, 3 * c)

        def kidx(r, t):
            if r == 0:
                return 1 if t == 0 else None
            return 2 if t == 0 else 0

        # D rule on (j, window plane wp): out plane 4go+j reads window
        # planes wp with tap kd — j even: (wp=j//2, kd=1);
        # j odd: (wp=(j-1)//2, kd=2) and (wp=(j-1)//2+1, kd=0)
        dtaps = {
            0: ((0, 1),),
            1: ((0, 2), (1, 0)),
            2: ((1, 1),),
            3: ((1, 2), (2, 0)),
        }
        # channel order (rh, rw, j, co) major->minor so the staged H/W
        # interleave peels rh then rw while j rides in the minor block
        w2 = jnp.zeros((2, 2, 3 * c, 16 * co), k.dtype)
        for rh in (0, 1):
            for rw in (0, 1):
                for th in (0, 1):
                    for tw in (0, 1):
                        kh, kw = kidx(rh, th), kidx(rw, tw)
                        if kh is None or kw is None:
                            continue
                        for j in range(4):
                            for wp, kd in dtaps[j]:
                                r = ((rh * 2 + rw) * 4 + j) * co
                                w2 = w2.at[
                                    th, tw, wp * c : (wp + 1) * c, r : r + co
                                ].set(k[kd, kh, kw])

        xp = jnp.pad(
            xs, ((0, 0), (0, 0), (0, 1), (0, 1), (0, 0))
        ).reshape(b * go, h + 1, w + 1, 3 * c).astype(dt)
        y = jax.lax.conv_general_dilated(
            xp, w2.astype(dt), (1, 1), [(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=dt,
        )  # [B*Go, H, W, 16Co]
        # staged parity interleave (rh then rw), j stays on the lanes
        y = y.reshape(b, go, h, w, 2, 8 * co)
        y = y.transpose(0, 1, 2, 4, 3, 5).reshape(b, go, 2 * h, w, 8 * co)
        # (rw) sits right next to w already: a straight reshape interleaves
        return y.reshape(b, go, 2 * h, 2 * w, 4 * co)


class _PackedTConv3D(nn.Module):
    """Param-compatible stand-in for nn.ConvTranspose(3x3x3, stride 2,
    pad (1,2), transpose_kernel=True) — torch ConvTranspose3d(k=3, s=2, p=1,
    op=1) semantics, out = exactly 2x input.

    flax/XLA lower the transposed conv through input dilation, measured at
    ~2% MFU on TPU. Here the 8 output parities are computed by ONE dense
    2-tap conv whose output channels are (parity, Cout), then interleaved
    (sub-pixel / depth-to-space decomposition): per axis,
    out[2j] = x[j] w[1]; out[2j+1] = x[j] w[2] + x[j+1] w[0].
    The D tap pair folds into input channels so the conv is 2-D.
    Parameter: the same [3,3,3,Cout,Cin] kernel as nn.ConvTranspose with
    transpose_kernel=True, so checkpoints/converters are unaffected.
    """

    features: int
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        b, d, h, w, c = x.shape
        co = self.features
        kernel = self.param("kernel", he_normal_out, (3, 3, 3, co, c))
        dt = x.dtype if self.dtype is None else self.dtype
        k = kernel.transpose(0, 1, 2, 4, 3)  # [kd, kh, kw, Cin, Cout]

        def kidx(r, t):
            # output parity r, tap offset t -> kernel index (None = no tap)
            if r == 0:
                return 1 if t == 0 else None
            return 2 if t == 0 else 0

        # packed kernel [th, tw, (td, Cin), (rd, rh, rw, Cout)]
        w2 = jnp.zeros((2, 2, 2 * c, 8 * co), k.dtype)
        for rd in (0, 1):
            for rh in (0, 1):
                for rw in (0, 1):
                    for td in (0, 1):
                        for th in (0, 1):
                            for tw in (0, 1):
                                kd, kh, kw = kidx(rd, td), kidx(rh, th), kidx(rw, tw)
                                if None in (kd, kh, kw):
                                    continue
                                r = (rd * 4 + rh * 2 + rw) * co
                                w2 = w2.at[
                                    th, tw, td * c : (td + 1) * c, r : r + co
                                ].set(k[kd, kh, kw])

        # x[j], x[j+1] per axis: pad 1 high; D tap pair -> channels
        xp = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 1), (0, 0))).astype(dt)
        v = jnp.concatenate([xp[:, :d], xp[:, 1 : d + 1]], axis=-1)
        y = jax.lax.conv_general_dilated(
            v.reshape(b * d, h + 1, w + 1, 2 * c),
            w2.astype(dt),
            (1, 1),
            [(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=dt,
        )  # [B*D, H, W, 8*Cout]
        # Staged parity interleave — one parity axis per step, the
        # lane-adjacent rw step last at the smallest channel width. The
        # one-shot 8-D transpose was the largest copy family in the 768x576
        # HLO (~5.5 ms compiler-estimated per instance); staging it is
        # 2.4-2.5x cheaper by the same cost model (tools/aot_micro.py). A
        # Pallas depth-to-space epilogue was prototyped and rejected:
        # Mosaic cannot lower the interleave's shape casts.
        y = y.reshape(b, d, h, w, 2, 4 * co)                    # rd -> D (major)
        y = y.transpose(0, 1, 4, 2, 3, 5).reshape(b, 2 * d, h, w, 4 * co)
        y = y.reshape(b, 2 * d, h, w, 2, 2 * co)                # rh -> H
        y = y.transpose(0, 1, 2, 4, 3, 5).reshape(b, 2 * d, 2 * h, w, 2 * co)
        return y.reshape(b, 2 * d, 2 * h, 2 * w, co)            # rw -> W (view)


class ConvBN3D(nn.Module):
    """3D conv + BatchNorm (ref basics.py convbn_3d). Input: [B, D, H, W, C].

    3x3x3 pad-1 convs (stride 1 or 2) automatically use the kd-sliced 2-D
    formulation (_DSliceConv3D — numerically the same conv, much better MXU
    utilization).

    `relu=True` applies the activation in-module (identical math to wrapping
    nn.relu around the call — XLA fuses the BN+relu chain into the conv's
    epilogue on its own). `dfold` forwards to _DSliceConv3D for per-site
    fold selection."""

    features: int
    kernel_size: int | Sequence[int] = 3
    strides: int | Sequence[int] = 1
    pad: int | Sequence[int] | None = None
    use_bias: bool = False
    dtype: Dtype = None
    relu: bool = False
    dfold: str = "out"
    # dpack=True: input/output are RESIDENT D-packed [B, G, H, W, 4C]
    # tensors (ops/s2d.dpack; 3x3x3 pad-1, stride 1 or 2). Same params
    # ('Conv_0' kernel, 'BatchNorm_0'), same outputs and BN statistics —
    # S2DBatchNorm pools the 4 packed D-planes exactly like fine BN.
    # Stride 2 halves the group count (_DPackConv3DS2; needs G even).
    dpack: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        import os

        if self.dpack:
            from dualpixelface_tpu.ops.s2d import S2DBatchNorm

            assert self.kernel_size == 3 and self.strides in (1, 2), (
                "dpack supports 3x3x3 pad-1 stride-1/2 sites only"
            )
            conv = _DPackConv3D if self.strides == 1 else _DPackConv3DS2
            y = conv(self.features, dtype=self.dtype, name="Conv_0")(x)
            y = S2DBatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, name="BatchNorm_0",
            )(y)
            return nn.relu(y) if self.relu else y

        ks = (
            (self.kernel_size,) * 3
            if isinstance(self.kernel_size, int)
            else tuple(self.kernel_size)
        )
        st = (self.strides,) * 3 if isinstance(self.strides, int) else tuple(self.strides)
        if self.pad is None:
            pad = tuple((k - 1) // 2 for k in ks)
        elif isinstance(self.pad, int):
            pad = (self.pad,) * 3
        else:
            pad = tuple(self.pad)
        dslice = (
            ks == (3, 3, 3)
            and st in ((1, 1, 1), (2, 2, 2))
            and pad == (1, 1, 1)
            and not self.use_bias
        )
        dt = x.dtype if self.dtype is None else self.dtype
        bn = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="BatchNorm_0",
        )
        if dslice:
            x = _DSliceConv3D(
                self.features, strides=st, dtype=self.dtype,
                dfold=self.dfold, name="Conv_0",
            )(x)
        else:
            x = nn.Conv(
                self.features,
                kernel_size=ks,
                strides=st,
                padding=[(p, p) for p in pad],
                use_bias=self.use_bias,
                kernel_init=he_normal_out,
                dtype=self.dtype,
            )(x)
        x = bn(x)
        return nn.relu(x) if self.relu else x


class TConvBN3D(nn.Module):
    """3D transposed conv (stride-2 upsampling) + BatchNorm.

    Matches torch ConvTranspose3d(k=3, padding=1, output_padding=1, stride=2)
    used in the PSMNet hourglass (ref stereodpnet/modules.py:219-227): output
    spatial size is exactly 2x input.
    """

    features: int
    dtype: Dtype = None
    # dpack=True: input/output are RESIDENT D-packed tensors
    # ([B, G, .., 4C] -> [B, 2G, 2H, 2W, 4Co], _DPackTConv3D). Same params
    # ('ConvTranspose_0' kernel, 'BatchNorm_0'), outputs and BN statistics.
    dpack: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        # torch ConvTranspose output: (i-1)*s - 2p + k + output_padding = 2i.
        # _PackedTConv3D computes it as a parity-decomposed dense conv (the
        # flax nn.ConvTranspose lowering measured ~2% MFU on TPU); the param
        # is the identical transpose_kernel [3,3,3,O,I] tensor.
        if self.dpack:
            from dualpixelface_tpu.ops.s2d import S2DBatchNorm

            x = _DPackTConv3D(
                self.features, dtype=self.dtype, name="ConvTranspose_0"
            )(x)
            return S2DBatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, name="BatchNorm_0",
            )(x)
        x = _PackedTConv3D(self.features, dtype=self.dtype, name="ConvTranspose_0")(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype
        )(x)
        return x


class DepthwiseSeparableConv(nn.Module):
    """Depthwise kxk + pointwise 1x1 (+BN +PReLU by default), matching
    ref basics.py depthwise_separable_conv(bn=True, relu=True, reluw=0.05)."""

    features: int
    kernel_size: int = 3
    padding: int = 1
    use_bias: bool = False
    bn: bool = True
    relu: bool = True
    reluw: float = 0.05
    dtype: Dtype = None
    # s2d=True: input/output are space-to-depth packed [N, Hc, Wc, 4C]
    # tensors (ops/s2d.py; stride-1 only). Same params ('Conv_0' depthwise,
    # 'Conv_1' pointwise, 'BatchNorm_0'), outputs and BN statistics.
    s2d: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.s2d:
            from dualpixelface_tpu.ops.s2d import (
                S2DBatchNorm,
                S2DConv,
                S2DDepthwiseConv,
            )

            assert self.padding == torch_pad(self.kernel_size), \
                "s2d path supports torch_pad (SAME) semantics only"
            x = S2DDepthwiseConv(
                self.kernel_size, use_bias=self.use_bias,
                kernel_init=he_normal_out, dtype=self.dtype, name="Conv_0",
            )(x)
            x = S2DConv(
                self.features, 1, 1, 1, use_bias=self.use_bias,
                kernel_init=he_normal_out, dtype=self.dtype, name="Conv_1",
            )(x)
            if self.bn:
                x = S2DBatchNorm(
                    use_running_average=not train, momentum=0.9, epsilon=1e-5,
                    dtype=self.dtype, name="BatchNorm_0",
                )(x)
            if self.relu:
                x = PReLU(init=self.reluw)(x)
            return x
        in_ch = x.shape[-1]
        p = self.padding
        x = nn.Conv(
            in_ch,
            kernel_size=(self.kernel_size, self.kernel_size),
            padding=[(p, p), (p, p)],
            feature_group_count=in_ch,
            use_bias=self.use_bias,
            kernel_init=he_normal_out,
            dtype=self.dtype,
        )(x)
        x = nn.Conv(
            self.features, kernel_size=(1, 1), use_bias=self.use_bias,
            kernel_init=he_normal_out, dtype=self.dtype,
        )(x)
        if self.bn:
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype
            )(x)
        if self.relu:
            x = PReLU(init=self.reluw)(x)
        return x


class PReLU(nn.Module):
    """Single-parameter PReLU with configurable init (torch PReLU(init=w))."""

    init: float = 0.05
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        import os

        alpha = self.param("alpha", lambda key: jnp.asarray(self.init, jnp.float32))
        a = alpha.astype(x.dtype)
        # 'maxmin' computes max(x,0) + a*min(x,0) — identical values (and
        # a.e. identical gradients) without the predicate tensor the
        # select_n formulation materializes; trace-time A/B knob for the
        # train-profile select_n copy bucket (docs/PERFORMANCE.md round 4)
        if os.environ.get("DPFACE_PRELU", "where") == "maxmin":
            return jnp.maximum(x, 0) + a * jnp.minimum(x, 0)
        return jnp.where(x >= 0, x, a * x)


class _PerChannelNorm(nn.Module):
    """flax GroupNorm(num_groups=C) twin (same 'scale'/'bias' params, same
    E[x^2]-E[x]^2 fast-variance stats in f32) that normalizes in ONE fused
    pass in the compute dtype: flax's `_normalize` does the sub/mul/add in
    f32, materializing three full-size f32 temps — at the ASM attention's
    [B*D, M, H, W, C] (~340 MB f32) that was several ms per direction."""

    epsilon: float = 1e-5
    dtype: Dtype | None = None
    # None = all dims but (0, last): torch InstanceNorm semantics with dim 0
    # the sample axis. Callers with a different sample axis (e.g. the flat
    # mode-major attention layout) pass the reduction axes explicitly.
    reduce_axes: tuple | None = None
    # groups=G > 1: the lane dim is a PACKED [G, C] stack of G fine-channel
    # groups (the mode-packed ASM attention). Params stay [C] (tiled G-fold),
    # and the statistics pool the G groups per fine channel — the identical
    # reduction set as normalizing the unpacked [.., G, .., C] tensor.
    groups: int = 1

    @nn.compact
    def __call__(self, x, stats=None):
        """stats: optional externally computed (mean, var), f32, broadcastable
        against x — used by the listwise fast-attention path where the (mode,
        h, w) statistics span several unstacked tensors."""
        g = self.groups
        c = x.shape[-1] // g
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        dt = x.dtype if self.dtype is None else self.dtype
        if stats is not None:
            mean, var = stats
        else:
            red = (
                self.reduce_axes
                if self.reduce_axes is not None
                else tuple(range(1, x.ndim - 1))
            )
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=red, keepdims=True)
            if g > 1:  # pool the packed groups per fine channel, re-tile
                sh = mean.shape[:-1]
                mean = jnp.mean(mean.reshape(sh + (g, c)), axis=-2)
                e2 = jnp.mean(jnp.square(xf), axis=red, keepdims=True)
                e2 = jnp.mean(e2.reshape(sh + (g, c)), axis=-2)
                var = e2 - jnp.square(mean)
                mean = jnp.tile(mean, (1,) * len(sh) + (g,)).reshape(
                    sh + (g * c,)
                )
                var = jnp.tile(var, (1,) * len(sh) + (g,)).reshape(sh + (g * c,))
            else:
                var = (
                    jnp.mean(jnp.square(xf), axis=red, keepdims=True)
                    - jnp.square(mean)
                )
        sc = scale if g == 1 else jnp.tile(scale, g)
        bi = bias if g == 1 else jnp.tile(bias, g)
        inv = jax.lax.rsqrt(var + self.epsilon)
        a = (inv * sc.astype(jnp.float32)).astype(dt)
        b = (bi.astype(jnp.float32) - mean * inv * sc.astype(jnp.float32)).astype(dt)
        return x.astype(dt) * a + b


class InstanceNorm(nn.Module):
    """InstanceNorm over all spatial dims, per channel, with affine params
    (torch InstanceNorm3d(affine=True), ref asm.py:138). Channels-last.
    Param tree matches the earlier nn.GroupNorm(num_groups=C) implementation
    (child named GroupNorm_0), so converters/checkpoints are unaffected."""

    epsilon: float = 1e-5
    dtype: Dtype | None = None
    reduce_axes: tuple | None = None
    groups: int = 1

    @nn.compact
    def __call__(self, x, stats=None):
        return _PerChannelNorm(
            epsilon=self.epsilon, dtype=self.dtype,
            reduce_axes=self.reduce_axes, groups=self.groups,
            name="GroupNorm_0",
        )(x, stats=stats)
