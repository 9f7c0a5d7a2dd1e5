"""Adaptive Sampling Module (ASM): sub-pixel shift + masking attention.

Parity target: reference `src/module/asm/asm.py` (subpixel_shift:9-127,
MaskingAttention:131-173). The DP defocus disparity axis is the image y/H
axis (see the axis diagram at ref stereodpnet/modules.py:153-179); `forward`
shifts by +disp, `backward` by -disp.

TPU-first re-design — the reference loops over the D disparity planes, doing
two grid_samples and a full FFT/iFFT pair *per plane per direction*
(stereodpnet/modules.py:185-194). Here all D planes are produced at once:

  * nearest / bilinear: the per-plane shifts are compile-time constants
    (costrange is derived from static config), so each plane is a static
    slice-and-pad — no gather, no grid_sample; XLA fuses the D plane shifts
    into the downstream concat.
  * phase (Fourier) shift: the column shift is always 0 (ref asm.py:64), so
    the reference's 2-D rfft/phase/irfft chain reduces to a 1-D operator
    along H — and since every delta is static, the whole chain constant-
    folds into ONE real [D, H, H] matrix applied as a single MXU matmul
    (phase_shift_multi).

Deviation (documented): the reference's 'nearest' branch samples a grid built
with align-corners normalization through grid_sample's default
align_corners=False, off by a sub-pixel scale factor h/(h-1); we implement the
geometrically exact nearest shift src[round(y+disp)]. The 'bilinear' branch
(align_corners=True) is matched exactly: zero contribution outside [0, H-1].
"""
from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from dualpixelface_tpu.ops.blocks import InstanceNorm, PReLU, he_normal_out


def shift_h_static(x: jnp.ndarray, k: int, axis: int = 1) -> jnp.ndarray:
    """dst[y] = src[y + k] along `axis`, zero-filled out of bounds. k static."""
    if k == 0:
        return x
    n = x.shape[axis]
    if abs(k) >= n:
        return jnp.zeros_like(x)
    pad = [(0, 0)] * x.ndim
    idx = [slice(None)] * x.ndim
    if k > 0:
        idx[axis] = slice(k, None)
        pad[axis] = (0, k)
    else:
        idx[axis] = slice(None, k)
        pad[axis] = (-k, 0)
    return jnp.pad(x[tuple(idx)], pad)


def shift_h_nearest(x: jnp.ndarray, delta: float, axis: int = 1) -> jnp.ndarray:
    """Nearest-neighbor fractional shift: src[round(y + delta)]."""
    return shift_h_static(x, int(np.round(delta)), axis)


def _compat_nearest_index(n: int, delta: float) -> tuple[np.ndarray, np.ndarray]:
    """Reference-exact nearest sampling index along one axis.

    The reference builds an align-corners-normalized grid
    (asm.py:39-41, v/(n-1)*2-1) but samples it through grid_sample's
    default align_corners=False, so the source position is
    (i + delta) * n / (n - 1) - 0.5 — a sub-pixel STRETCH, not a uniform
    shift (it even zeroes the last row/column for even n). np.round is
    half-to-even, matching grid_sample's nearbyint.
    """
    pos = (np.arange(n) + delta) * n / (n - 1) - 0.5
    idx = np.round(pos).astype(np.int64)
    valid = (idx >= 0) & (idx <= n - 1)
    return np.clip(idx, 0, n - 1), valid


def shift_h_nearest_compat(x: jnp.ndarray, delta: float, axis: int = 1) -> jnp.ndarray:
    """Bit-compatible twin of the reference's nearest branch: the H axis gets
    the (stretched) +delta map and the W axis (axis+1) the delta=0 map —
    both remapped, exactly as grid_sample sees the full 2-D grid."""
    h, w = x.shape[axis], x.shape[axis + 1]
    idx_h, ok_h = _compat_nearest_index(h, delta)
    idx_w, ok_w = _compat_nearest_index(w, 0.0)
    out = jnp.take(x, jnp.asarray(idx_h), axis=axis)
    out = jnp.take(out, jnp.asarray(idx_w), axis=axis + 1)
    shape_h = [1] * x.ndim
    shape_h[axis] = h
    shape_w = [1] * x.ndim
    shape_w[axis + 1] = w
    mask = jnp.asarray(ok_h, x.dtype).reshape(shape_h) * jnp.asarray(
        ok_w, x.dtype
    ).reshape(shape_w)
    return out * mask


def shift_h_bilinear(x: jnp.ndarray, delta: float, axis: int = 1) -> jnp.ndarray:
    """Bilinear fractional shift along `axis` with zero padding.

    Matches torch grid_sample(mode='bilinear', align_corners=True,
    padding_mode='zeros') on the reference's +delta row grid (asm.py:35-47):
    each of the two integer corners contributes 0 when outside [0, H-1].
    """
    lo = int(math.floor(delta))
    w = delta - lo
    out = (1.0 - w) * shift_h_static(x, lo, axis)
    if w != 0.0:
        out = out + w * shift_h_static(x, lo + 1, axis)
    return out


def phase_shift_matrix(h: int, deltas: Sequence[float]) -> np.ndarray:
    """[D, H, H] real operator of the circular Fourier shift: for static
    deltas, IDFT . diag(exp(2i*pi*delta*Nr/H)) . DFT collapses to one real
    matrix — the whole rfft/phase/irfft chain becomes a single MXU matmul."""
    freqs = np.fft.fftfreq(h) * h  # integer frequency grid Nr (ref asm.py:67)
    deltas = np.asarray(list(deltas), dtype=np.float64)
    dft = np.fft.fft(np.eye(h))          # [H, H]
    idft = np.conj(dft).T / h
    phase = np.exp(2j * np.pi * (deltas[:, None] / h) * freqs[None, :])  # [D, H]
    mats = np.einsum("yk,dk,kx->dyx", idft, phase, dft)
    return np.ascontiguousarray(mats.real.astype(np.float32))


def phase_shift_multi(x: jnp.ndarray, deltas: Sequence[float], axis: int = 1) -> jnp.ndarray:
    """Fourier (circular) sub-pixel shift for ALL deltas at once.

    x: [B, H, W, C]; returns [B, D, H, W, C] where out[:, i, y] = x[y + deltas[i]]
    (circular). Matches the reference's rfft-phase-irfft chain (asm.py:104-125)
    exactly — but as ONE [D, H, H] x [B, H, WC] matmul on the MXU instead of
    an FFT/iFFT pair (measured 10.6 -> ~0.3 ms at 4x192x144x32; the shift
    operator is static, so the DFTs constant-fold into a real matrix).
    """
    assert axis == 1, "phase shift operates on the H axis of [B, H, W, C]"
    b, h, w, c = x.shape
    mats = jnp.asarray(phase_shift_matrix(h, deltas))  # [D, H, H]
    if x.dtype == jnp.bfloat16:
        # bf16 operands + bf16 output (f32 MXU accumulation internally):
        # a f32 preferred type materializes the [B, D, H, W, C] volume in
        # f32 (~340 MB at the 768x576 cost-volume shape) just to downcast
        return jnp.einsum(
            "dyh,bhwc->bdywc", mats.astype(jnp.bfloat16), x,
            preferred_element_type=jnp.bfloat16,
        )
    out = jnp.einsum(
        "dyh,bhwc->bdywc", mats, x.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    return out.astype(x.dtype)


def subpixel_shift_planes(
    feat: jnp.ndarray,
    disps: Sequence[float],
    direction: str,
    nearest: bool = True,
    bilinear: bool = True,
    phase: bool = True,
    compat_nearest: bool = False,
    layout: str = "stacked",
) -> jnp.ndarray:
    """Shift `feat` [B, H, W, C] by every disparity in `disps` along H, in up
    to three modes simultaneously (ref asm.py:87-127).

    Returns [B, D, M, H, W, C] with M = number of enabled modes, ordered
    (nearest, bilinear, phase) as in the reference's dstfeats list.
    `compat_nearest` reproduces the reference's align-corners-mismatched
    nearest grid bit-for-bit (needed for checkpoint-level parity).
    """
    sign = 1.0 if direction == "forward" else -1.0
    shift_nearest = shift_h_nearest_compat if compat_nearest else shift_h_nearest
    planes_by_mode = []
    if nearest:
        planes_by_mode.append(
            jnp.stack([shift_nearest(feat, sign * d) for d in disps], axis=1)
        )
    if bilinear:
        planes_by_mode.append(
            jnp.stack([shift_h_bilinear(feat, sign * d) for d in disps], axis=1)
        )
    if phase:
        planes_by_mode.append(phase_shift_multi(feat, [sign * d for d in disps]))
    if layout == "list":
        # no mode stack at all: the fast-attention path consumes the modes
        # listwise (elementwise gating + reductions), so XLA fuses the
        # static shifts into the consumers and the [B, D, M, H, W, C]
        # materialization (+ its M-axis relayout copies) never exists
        return planes_by_mode
    if layout == "mpack":
        # MODE-PACKED lanes: [B, D, H, W, M*C], mode-major. The exact
        # attention's conv head then runs block-diagonal at M*C lanes
        # (75% MXU occupancy at C=32 vs 25%) with the mode axis never
        # touching the conv batch — the batch-minor layout flips XLA
        # inserts around the [B*D*?, H, W, 32] folds disappear.
        return jnp.concatenate(planes_by_mode, axis=-1)
    if layout == "flat":
        # mode-MAJOR stack: [M, B, D, H, W, C]. Folding to the conv batch is
        # then a pure major-dim reshape, where the stacked layout's
        # [B, D, M, ...] -> [B*D*M, ...] fold costs XLA a minor-dim relayout
        # copy per direction at 768x576 (tools/aot_analyze.py).
        return jnp.stack(planes_by_mode, axis=0)
    assert layout == "stacked", layout
    return jnp.stack(planes_by_mode, axis=2)  # [B, D, M, H, W, C]


class _ModeFoldedConv(nn.Module):
    """nn.Conv((1, kh, kw)) twin that folds the mode axis into the batch and
    runs a 2-D conv: [N, M, H, W, C] -> [N, M, H, W, F]. The parameter is the
    identical (1, kh, kw, C, F) kernel, so checkpoints/converters see the
    same tree; only the (slow on TPU) 3-D conv lowering is avoided."""

    features: int
    kernel_size: tuple
    padding: int = 0
    dtype: object = None
    # s2d=True: input is PACKED [N, M, Hc, Wc, 4C] (ops/s2d.py) and the fine
    # kernel is scattered into the parity-structured coarse form — identical
    # parameter ((1, kh, kw, C, F)) and math, 4x the lane occupancy at the
    # attention head's C=32 quarter-res shapes. Requires SAME padding
    # (padding == (k-1)//2), which both head convs use.
    s2d: bool = False
    # mpack=M > 0: input is MODE-PACKED [N, H, W, M*C] (mode-major lanes) and
    # the conv runs block-diagonal ([kh, kw, M*C, M*F], per-mode blocks share
    # the one fine kernel) — identical parameter and math, the mode axis
    # never touches the conv batch.
    mpack: int = 0

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        if self.mpack:
            m = self.mpack
            n, h, w, cm = x.shape
            c = cm // m
            f = self.features
            kernel = self.param("kernel", he_normal_out, (1, kh, kw, c, f))
            dt = x.dtype if self.dtype is None else self.dtype
            wk = jnp.zeros((kh, kw, m * c, m * f), kernel.dtype)
            for j in range(m):
                wk = wk.at[:, :, j * c : (j + 1) * c, j * f : (j + 1) * f].set(
                    kernel[0]
                )
            p = self.padding
            return jax.lax.conv_general_dilated(
                x.astype(dt), wk.astype(dt), (1, 1), [(p, p), (p, p)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=dt,
            )
        if self.s2d:
            from dualpixelface_tpu.ops.s2d import scatter_kernel

            assert self.padding == (kh - 1) // 2, "s2d head needs SAME padding"
            n, m, hc, wc, c4 = x.shape
            c = c4 // 4
            kernel = self.param(
                "kernel", he_normal_out, (1, kh, kw, c, self.features)
            )
            dt = x.dtype if self.dtype is None else self.dtype
            kc = scatter_kernel(kernel[0], 1, 1).astype(dt)
            p = (kc.shape[0] - 1) // 2
            y = jax.lax.conv_general_dilated(
                x.reshape(n * m, hc, wc, c4).astype(dt),
                kc,
                (1, 1),
                [(p, p), (p, p)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=dt,
            )
            return y.reshape(n, m, hc, wc, 4 * self.features)
        n, m, h, w, c = x.shape
        kernel = self.param(
            "kernel", he_normal_out, (1, kh, kw, c, self.features)
        )
        dt = x.dtype if self.dtype is None else self.dtype
        p = self.padding
        y = jax.lax.conv_general_dilated(
            x.reshape(n * m, h, w, c).astype(dt),
            kernel[0].astype(dt),
            (1, 1),
            [(p, p), (p, p)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=dt,
        )
        return y.reshape(n, m, h, w, self.features)


class MaskingAttention(nn.Module):
    """Shift-mode gating attention (ref asm.py:131-173).

    Input: [B, D, M, H, W, C] (all disparity planes at once — D folds into the
    batch so the (1,3,3) mask conv, BN, InstanceNorm and softmax-over-M are one
    fused call instead of the reference's per-plane/per-direction loop).
    Output: [B, D, H, W, C] — softmax(activation(mask)) over M gates the
    shifted variants, then mean (or MVSNet-style variance) over M.

    Deviation (documented): train-mode BatchNorm statistics are computed over
    all planes and both call sites jointly rather than per plane-call.
    """

    features: int
    act: str = "sigmoid"
    feature_fetch: bool = False
    # head_s2d: run the (Conv_0 -> BN -> relu -> Conv_1) mask head
    # space-to-depth packed (ops/s2d.py) — exact (same params + BN stats;
    # S2DBatchNorm pools the four parities), 4x the lane occupancy at the
    # head's C=32 quarter-res shapes. Train-profile motivation: the head's
    # fwd+bwd+remat-recompute convs were ~15 ms/step of the b2 768x576
    # train step (docs/PERFORMANCE.md round 4). Requires even H, W.
    head_s2d: bool = False
    # None = follow the input dtype (bf16 under the training policy — halves
    # the [B*D, M, H, W, C] elementwise traffic); fp32 inputs stay exact
    dtype = None

    @nn.compact
    def __call__(
        self,
        x,
        train: bool = False,
        shift_fn=None,
        flat: bool = False,
        mode_list: bool = False,
        mpack: int = 0,
    ):
        """Exact mode (shift_fn=None): x = [B, D, M, H, W, C] pre-shifted
        planes, the conv head runs on every (plane, mode) — the reference
        semantics.

        Fast mode (shift_fn given): x = the UNSHIFTED feature map
        [B, H, W, C]; the conv head runs ONCE and the shifts are applied to
        its output — valid because each mode's sub-pixel shift is a
        translation that commutes with the (shared-weight, per-mode)
        convolution; deviation is confined to rows within the kernel radius
        of the shift seam (+ the InstanceNorm/train-BN statistics).
        D*M x fewer conv FLOPs (the dominant ASM cost, docs/PERFORMANCE.md).
        Parameter tree is identical in both modes. With mode_list=True,
        shift_fn must return the modes as a LIST (layout='list') and the
        mode axis is never materialized — same numerics, fewer copies.
        """
        # resolve the compute dtype explicitly: flax norm layers with
        # dtype=None promote to f32 (the f32 params win the promotion), which
        # would double the [B*D, M, H, W, C] traffic under the bf16 policy
        dt = self.dtype if self.dtype is not None else x.dtype

        # checkpoint_name tags (no-ops unless the caller's remat policy names
        # them): under the default full-remat policy the backward re-runs all
        # four mask-head convs per direction — the dominant cost_volume cost
        # of the b2 768x576 train step (docs/PERFORMANCE.md round 4 profile).
        # Saving just (conv inputs, conv outputs) keeps the recompute purely
        # elementwise at ~3 x 85 MB bf16 per direction.
        from jax.ad_checkpoint import checkpoint_name

        if shift_fn is None and mpack:
            # MODE-PACKED exact path: x = [B, D, H, W, M*C] (mode-major
            # lanes, subpixel_shift_planes layout='mpack'). Every head conv
            # is block-diagonal at M*C lanes with the conv batch B*D, every
            # mode-axis op (BN/IN statistics, softmax, gated mean) a
            # lane-group expression — the exact semantics of the stacked
            # path (same parameter tree, same reduction sets; asserted by
            # tests/test_asm.py) without the [B*D*M(batch), .., 32] folds
            # whose batch-minor conv layouts cost ~2 ms of relayout copies
            # per conv fwd+bwd in the b2 768x576 train step.
            m = mpack
            b, d, h, w, cm = x.shape
            c = cm // m
            f = self.features
            head_in = checkpoint_name(x.reshape(b * d, h, w, cm), "asm_head_in")
            y = head_in
            mask = _ModeFoldedConv(
                f, (3, 3), padding=1, dtype=dt, mpack=m, name="Conv_0"
            )(head_in)
            mask = checkpoint_name(mask, "asm_conv0_out")
            from dualpixelface_tpu.ops.s2d import S2DBatchNorm

            mask = S2DBatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=dt, groups=m, name="BatchNorm_0",
            )(mask)
            mask = nn.relu(mask)
            mask = _ModeFoldedConv(
                f, (1, 1), padding=0, dtype=dt, mpack=m, name="Conv_1"
            )(mask)
            mask = checkpoint_name(mask, "asm_mask_out")
            mask = InstanceNorm(dtype=dt, groups=m)(mask)
            if self.act == "relu":
                mask = PReLU(init=0.05)(mask)
            elif self.act == "sigmoid":
                mask = nn.sigmoid(mask)
            else:
                raise NotImplementedError(f"asm activation {self.act!r}")
            blocks = [mask[..., j * f : (j + 1) * f] for j in range(m)]
            mx = blocks[0]
            for t in blocks[1:]:
                mx = jnp.maximum(mx, t)
            exps = [jnp.exp(t - mx) for t in blocks]
            z = sum(exps)
            ys = [y[..., j * c : (j + 1) * c] for j in range(m)]
            gated = [yv * (e / z) for yv, e in zip(ys, exps)]
            if self.feature_fetch:
                avg = sum(gated) / m
                avg2 = sum(t * t for t in gated) / m
                out = avg2 - avg * avg
            else:
                out = sum(gated) / m
            return out.reshape(b, d, h, w, c)

        if shift_fn is None and flat:
            # mode-MAJOR flat layout [M, B, D, H, W, C]: the conv-batch fold
            # and every (softmax / gate / mean / InstanceNorm) mode-axis op
            # works on MAJOR dims only — no relayout copies. Numerics are
            # identical to the stacked path (same parameter tree, same
            # reduction sets; asserted by tests/test_asm.py).
            m, b, d, h, w, c = x.shape
            y = x.reshape(m * b * d, 1, h, w, c)
            head_in = y
        elif shift_fn is None:
            b, d, m, h, w, c = x.shape
            y = x.reshape(b * d, m, h, w, c)
            head_in = y
        else:
            head_in = x[:, None]  # [B, 1(mode), H, W, C]

        # The (1,3,3)/(1,1,1) convs never mix the mode axis, so they run as
        # 2-D convs with the mode axis folded into the batch — XLA's TPU 3-D
        # conv path is single-digit-MFU even for kd=1. Params keep the exact
        # nn.Conv kernel shapes ((1,3,3,C,F) / (1,1,1,C,F)) for converters.
        head_in = checkpoint_name(head_in, "asm_head_in")
        if shift_fn is None:
            # NOT redundant: rebinding y to the TAGGED value routes the
            # gating path below through the remat-saved residual, so the
            # 'convs' policy's saved tensor is actually reused instead of
            # the backward recomputing the reshape chain that produced y.
            y = head_in
        hs2d = self.head_s2d and head_in.shape[2] % 2 == 0 and head_in.shape[3] % 2 == 0
        if hs2d:
            from dualpixelface_tpu.ops.s2d import S2DBatchNorm, s2d_pack, s2d_unpack

            nh, mh, hh, wh, ch = head_in.shape
            head_in = s2d_pack(
                head_in.reshape(nh * mh, hh, wh, ch)
            ).reshape(nh, mh, hh // 2, wh // 2, 4 * ch)
        mask = _ModeFoldedConv(
            self.features, (3, 3), padding=1, dtype=dt, s2d=hs2d, name="Conv_0"
        )(head_in)
        mask = checkpoint_name(mask, "asm_conv0_out")
        if hs2d:
            mf = mask.shape
            mask = S2DBatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=dt, name="BatchNorm_0",
            )(mask.reshape(mf[0] * mf[1], *mf[2:]))
            mask = nn.relu(mask).reshape(mf)
        else:
            mask = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=dt
            )(mask)
            mask = nn.relu(mask)
        mask = _ModeFoldedConv(
            self.features, (1, 1), padding=0, dtype=dt, s2d=hs2d, name="Conv_1"
        )(mask)
        mask = checkpoint_name(mask, "asm_mask_out")
        if hs2d:
            mf = mask.shape
            mask = s2d_unpack(mask.reshape(mf[0] * mf[1], *mf[2:])).reshape(
                mf[0], mf[1], 2 * mf[2], 2 * mf[3], mf[4] // 4
            )

        if shift_fn is not None and mode_list:
            # LISTWISE fast mode: shift_fn returns the M mode planes as a
            # list of [B, D, H, W, C] tensors (subpixel_shift_planes
            # layout='list'). The mode axis never materializes — every
            # mode-axis op (InstanceNorm stats, softmax, gated mean) is an
            # elementwise expression across the list, so XLA fuses the
            # static slice-shifts straight into the consumers instead of
            # building + relayout-copying two [B, D, M, H, W, C] volumes
            # per direction. Numerics are identical to the stacked fast
            # path (same reduction sets, same shared parameter tree;
            # asserted by tests/test_asm.py).
            y_modes = shift_fn(x)  # list of M x [B, D, H, W, C]
            mask_modes = shift_fn(mask[:, 0])
            m = len(y_modes)
            b, d, h, w, c = y_modes[0].shape
            y_modes = [t.reshape(b * d, h, w, c) for t in y_modes]
            mask_modes = [t.reshape(b * d, h, w, -1) for t in mask_modes]
            # joint InstanceNorm statistics over (mode, h, w) per
            # (plane-sample, channel) — the same set the stacked path's
            # (m, h, w) reduction covers — computed in f32 across the list
            npix = float(m * h * w)
            s1 = sum(
                jnp.sum(t.astype(jnp.float32), axis=(1, 2), keepdims=True)
                for t in mask_modes
            )
            s2 = sum(
                jnp.sum(jnp.square(t.astype(jnp.float32)), axis=(1, 2), keepdims=True)
                for t in mask_modes
            )
            mean = s1 / npix
            var = s2 / npix - jnp.square(mean)
            norm = InstanceNorm(dtype=dt)
            mask_modes = [norm(t, stats=(mean, var)) for t in mask_modes]
            if self.act == "relu":
                prelu = PReLU(init=0.05)
                mask_modes = [prelu(t) for t in mask_modes]
            elif self.act == "sigmoid":
                mask_modes = [nn.sigmoid(t) for t in mask_modes]
            else:
                raise NotImplementedError(f"asm activation {self.act!r}")
            # softmax over the mode list, elementwise across entries
            mx = mask_modes[0]
            for t in mask_modes[1:]:
                mx = jnp.maximum(mx, t)
            exps = [jnp.exp(t - mx) for t in mask_modes]
            z = sum(exps)
            gated = [yv * (e / z) for yv, e in zip(y_modes, exps)]
            if self.feature_fetch:
                avg = sum(gated) / m
                avg2 = sum(t * t for t in gated) / m
                out = avg2 - avg * avg
            else:
                out = sum(gated) / m
            return out.reshape(b, d, h, w, c)

        if shift_fn is not None:
            planes = shift_fn(x)  # [B, D, M, H, W, C]
            b, d, m, h, w, c = planes.shape
            y = planes.reshape(b * d, m, h, w, c)
            mask = shift_fn(mask[:, 0]).reshape(b * d, m, h, w, c)

        if flat and shift_fn is None:
            # mode axis is MAJOR: reshape back to [M, B*D, H, W, F]/[.., C]
            # (pure major split), reduce/softmax over axis 0. InstanceNorm
            # stats stay per (plane-sample, channel): reduce (m, h, w).
            fdim = mask.shape[-1]
            mask = mask.reshape(m, b * d, h, w, fdim)
            y = y.reshape(m, b * d, h, w, c)
            mask = InstanceNorm(dtype=dt, reduce_axes=(0, 2, 3))(mask)
            if self.act == "relu":
                mask = PReLU(init=0.05)(mask)
            elif self.act == "sigmoid":
                mask = nn.sigmoid(mask)
            else:
                raise NotImplementedError(f"asm activation {self.act!r}")
            gate = nn.softmax(mask, axis=0)
            y = y * gate
            if self.feature_fetch:
                avg = jnp.mean(y, axis=0)
                avg2 = jnp.mean(y * y, axis=0)
                out = avg2 - avg * avg
            else:
                out = jnp.mean(y, axis=0)
            return out.reshape(b, d, h, w, c)

        mask = InstanceNorm(dtype=dt)(mask)

        if self.act == "relu":
            mask = PReLU(init=0.05)(mask)
        elif self.act == "sigmoid":
            mask = nn.sigmoid(mask)
        else:
            raise NotImplementedError(f"asm activation {self.act!r}")

        gate = nn.softmax(mask, axis=1)  # softmax over shift-mode axis M
        y = y * gate

        if self.feature_fetch:
            avg = jnp.mean(y, axis=1)
            avg2 = jnp.mean(y * y, axis=1)
            out = avg2 - avg * avg
        else:
            out = jnp.mean(y, axis=1)

        return out.reshape(b, d, h, w, c)
