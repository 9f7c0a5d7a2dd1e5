"""3-D deformable convolution (the reference's "D3D" native CUDA extension).

Parity target: `src/module/dcn3d/` — forward is a trilinear-sampled im2col
(deform_im2col_cuda.cuh:27-72,193-265) followed by a grouped GEMM with bias
(deform_conv_cuda.cu:93-125); the Python wrapper `DeformConvPack_dv2`
(modules/deform_conv.py:295-389) predicts per-tap (dT,dH,dW) offsets with a
zero-initialised Conv3d and returns (output, offset). Sampling semantics are
deformable-conv v1: sample = out_pos*stride - pad + tap*dilation + offset,
trilinear interpolation, each corner contributing only while inside bounds.

TPU-native formulation: channels-last gather-im2col + ONE large matmul.
The eight trilinear corners are accumulated sequentially (bounded peak
memory); the [B, N, K*Cin] column matrix contracts against the
[K*Cin, Cout] weight on the MXU — this is where all the FLOPs live, exactly
the shape XLA tiles best. Gradients (input/offset/weight — the reference's
three backward CUDA kernels, deform_conv_cuda.cu:221-280) come from JAX AD of
the gather formulation: the scatter-add transpose of a gather IS col2im.

A fused Pallas kernel can swap in behind `deform_conv3d` without touching
callers (kernels/ milestone).
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def _triple(v) -> tuple[int, int, int]:
    return (v, v, v) if isinstance(v, int) else tuple(v)


def deform_conv3d(
    x: jnp.ndarray,
    offset: jnp.ndarray,
    weight: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    stride: int | Sequence[int] = 1,
    padding: int | Sequence[int] = 1,
    dilation: int | Sequence[int] = 1,
    impl: str = "packed8",
    aperture: bool = False,
    gather_chunks: int = 1,
) -> jnp.ndarray:
    """Deformable 3-D convolution, channels-last.

    :param x:      [B, D, H, W, Cin]
    :param offset: [B, Do, Ho, Wo, 3*K] — per-tap triples (dD, dH, dW) in tap
                   order k = ((kd*KH)+kh)*KW+kw, channel k*3+{0,1,2}
                   (matches the reference offset layout, deform_conv.py:323-335)
    :param weight: [KD, KH, KW, Cin, Cout] (flax Conv kernel layout)
    :param bias:   [Cout] or None
    :param impl:   'packed8' (default) fetches ALL EIGHT trilinear corners
                   with a single gather index by reading from a corner-shifted
                   8x channel expansion of x; 'packed' packs only the (cy, cx)
                   quad (2 gathers); 'simple' is the plain 8-corner
                   formulation. TPU gathers are index-bound, so index packing
                   is a measured 145 -> 56 -> 32 ms progression at ANM scale
                   (docs/PERFORMANCE.md). All three are tested equivalent.
    :param aperture: clamp sampling positions to +-AP voxels around the
                   output voxel along H/W (the Pallas kernel's windowed
                   semantics, kernels/deform_fused.py) — used as the exact
                   XLA twin for its VJP and its oracle in tests
    :return:       [B, Do, Ho, Wo, Cout]
    """
    if impl == "pallas":
        return _deform_conv3d_pallas_vjp(x, offset, weight, bias)
    if impl in ("packed", "packed8"):
        return _deform_conv3d_packed(
            x, offset, weight, bias, stride, padding, dilation,
            pack_depth=(impl == "packed8"), aperture=aperture,
            gather_chunks=gather_chunks,
        )
    assert impl == "simple", impl
    st = _triple(stride)
    pad = _triple(padding)
    dil = _triple(dilation)

    b, d, h, w, cin = x.shape
    kd, kh, kw, cin_w, cout = weight.shape
    assert cin_w == cin, f"weight Cin {cin_w} != input Cin {cin}"
    k = kd * kh * kw
    bo, do, ho, wo, off_c = offset.shape
    assert off_c == 3 * k, f"offset channels {off_c} != 3*K {3 * k}"
    n = do * ho * wo

    f32 = jnp.float32
    # base sampling positions per output voxel and tap: [N, K] each axis
    zz, yy, xx = jnp.meshgrid(
        jnp.arange(do), jnp.arange(ho), jnp.arange(wo), indexing="ij"
    )
    kz, ky, kx = jnp.meshgrid(
        jnp.arange(kd), jnp.arange(kh), jnp.arange(kw), indexing="ij"
    )
    base_d = (zz.reshape(-1, 1) * st[0] - pad[0] + kz.reshape(1, -1) * dil[0]).astype(f32)
    base_h = (yy.reshape(-1, 1) * st[1] - pad[1] + ky.reshape(1, -1) * dil[1]).astype(f32)
    base_w = (xx.reshape(-1, 1) * st[2] - pad[2] + kx.reshape(1, -1) * dil[2]).astype(f32)

    off = offset.reshape(b, n, k, 3).astype(f32)
    pos_d = base_d[None] + off[..., 0]  # [B, N, K]
    pos_h = base_h[None] + off[..., 1]
    pos_w = base_w[None] + off[..., 2]

    d0 = jnp.floor(pos_d)
    h0 = jnp.floor(pos_h)
    w0 = jnp.floor(pos_w)
    fd = pos_d - d0
    fh = pos_h - h0
    fw = pos_w - w0

    # Gather in [B, Cin, N*K] layout: the huge N*K axis sits in the lane
    # dimension, so nothing pads (the [.., N*K, Cin] layout pads Cin up to the
    # tile width — a 2x HBM expansion observed on v5e for Cin=35/64).
    x_t = jnp.swapaxes(x.reshape(b, d * h * w, cin), 1, 2)  # [B, Cin, DHW]
    cols = jnp.zeros((b, cin, n * k), x.dtype)

    for cz in (0, 1):
        zi = d0 + cz
        wz = (1.0 - fd) if cz == 0 else fd
        z_ok = (zi >= 0) & (zi <= d - 1)
        for cy in (0, 1):
            yi = h0 + cy
            wy = (1.0 - fh) if cy == 0 else fh
            y_ok = (yi >= 0) & (yi <= h - 1)
            for cx in (0, 1):
                xi = w0 + cx
                wx = (1.0 - fw) if cx == 0 else fw
                x_ok = (xi >= 0) & (xi <= w - 1)

                ok = z_ok & y_ok & x_ok
                wgt = (wz * wy * wx) * ok.astype(f32)  # [B, N, K]
                zi_c = jnp.clip(zi, 0, d - 1).astype(jnp.int32)
                yi_c = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
                xi_c = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
                lin = ((zi_c * h + yi_c) * w + xi_c).reshape(b, 1, n * k)
                gathered = jnp.take_along_axis(x_t, lin, axis=2)  # [B, Cin, N*K]
                cols = cols + gathered * wgt.reshape(b, 1, n * k).astype(x.dtype)

    # im2col contraction on the MXU: cols [B, Cin, N, K] x W [Cin, K, Cout]
    cols = cols.reshape(b, cin, n, k)
    w_mat = weight.reshape(k, cin, cout).swapaxes(0, 1)  # [Cin, K, Cout]
    out = jax.lax.dot_general(
        cols, w_mat.astype(cols.dtype),
        dimension_numbers=(((1, 3), (0, 1)), ((), ())),
        preferred_element_type=f32,
    ).astype(x.dtype)  # [B, N, Cout]
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out.reshape(b, do, ho, wo, cout)


def _deform_conv3d_packed(x, offset, weight, bias, stride, padding, dilation,
                          pack_depth=False, aperture=False, gather_chunks=1):
    """Corner-packed gather formulation (same math as 'simple').

    TPU gathers are index-bound, not byte-bound (docs/PERFORMANCE.md): the
    8-corner form issues 8x N*K indices. Here the four (cy, cx) corners of
    each sample are materialized as a 4x channel expansion of a zero-padded
    copy of x, so ONE index fetches the whole quad; only the two depth
    corners remain as separate gathers — 4x fewer indices total.
    """
    st = _triple(stride)
    pad = _triple(padding)
    dil = _triple(dilation)

    b, d, h, w, cin = x.shape
    kd, kh, kw, cin_w, cout = weight.shape
    assert cin_w == cin
    k = kd * kh * kw
    bo, do, ho, wo, off_c = offset.shape
    assert off_c == 3 * k
    n = do * ho * wo
    f32 = jnp.float32

    zz, yy, xx = jnp.meshgrid(jnp.arange(do), jnp.arange(ho), jnp.arange(wo), indexing="ij")
    kz, ky, kx = jnp.meshgrid(jnp.arange(kd), jnp.arange(kh), jnp.arange(kw), indexing="ij")
    base_d = (zz.reshape(-1, 1) * st[0] - pad[0] + kz.reshape(1, -1) * dil[0]).astype(f32)
    base_h = (yy.reshape(-1, 1) * st[1] - pad[1] + ky.reshape(1, -1) * dil[1]).astype(f32)
    base_w = (xx.reshape(-1, 1) * st[2] - pad[2] + kx.reshape(1, -1) * dil[2]).astype(f32)

    off = offset.reshape(b, n, k, 3).astype(f32)
    pos_d = base_d[None] + off[..., 0]
    pos_h = base_h[None] + off[..., 1]
    pos_w = base_w[None] + off[..., 2]
    if aperture:
        from dualpixelface_tpu.ops.kernels.deform_fused import clamp_positions

        out_h = yy.reshape(1, -1, 1).astype(f32)
        out_w = xx.reshape(1, -1, 1).astype(f32)
        pos_h = clamp_positions(pos_h, out_h)
        pos_w = clamp_positions(pos_w, out_w)
    d0 = jnp.floor(pos_d)
    h0 = jnp.floor(pos_h)
    w0 = jnp.floor(pos_w)
    fd = pos_d - d0
    fh = pos_h - h0
    fw = pos_w - w0

    # zero-pad one voxel on every side; corner-expand into channel groups
    P = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    if not pack_depth:
        quads = [
            P[:, :, cy : cy + h + 1, cx : cx + w + 1, :]
            for cy in (0, 1)
            for cx in (0, 1)
        ]
        xq = jnp.concatenate(quads, axis=-1)  # [B, D+2, H+1, W+1, 4*Cin]
        m = (d + 2) * (h + 1) * (w + 1)
        xq_t = jnp.swapaxes(xq.reshape(b, m, 4 * cin), 1, 2)  # [B, 4Cin, M]

    ph = jnp.clip(h0 + 1.0, 0, h).astype(jnp.int32)  # [B, N, K]
    pw = jnp.clip(w0 + 1.0, 0, w).astype(jnp.int32)

    wy = [(1.0 - fh), fh]
    wx = [(1.0 - fw), fw]
    oky = [(h0 >= 0) & (h0 <= h - 1), (h0 + 1 >= 0) & (h0 + 1 <= h - 1)]
    okx = [(w0 >= 0) & (w0 <= w - 1), (w0 + 1 >= 0) & (w0 + 1 <= w - 1)]

    wz_ = [(1.0 - fd), fd]
    okz_ = [(d0 >= 0) & (d0 <= d - 1), (d0 + 1 >= 0) & (d0 + 1 <= d - 1)]

    if pack_depth:
        # ONE gather per sample: all 8 corners packed into channel groups
        # g = cz*4 + cy*2 + cx (x8 has D+1 planes; group cz reads P[pz+cz])
        octs = [
            P[:, cz : cz + d + 1, cy : cy + h + 1, cx : cx + w + 1, :]
            for cz in (0, 1)
            for cy in (0, 1)
            for cx in (0, 1)
        ]
        x8 = jnp.concatenate(octs, axis=-1)  # [B, D+1, H+1, W+1, 8*Cin]
        m8 = (d + 1) * (h + 1) * (w + 1)
        x8_t = jnp.swapaxes(x8.reshape(b, m8, 8 * cin), 1, 2)
        pz = jnp.clip(d0 + 1.0, 0, d).astype(jnp.int32)
        lin_all = ((pz * (h + 1) + ph) * (w + 1) + pw).reshape(b, 1, n * k)
        w8_all = jnp.stack(
            [
                (wz_[cz] * wy[cy] * wx[cx]
                 * (okz_[cz] & oky[cy] & okx[cx]).astype(f32)).reshape(b, n * k)
                for cz in (0, 1)
                for cy in (0, 1)
                for cx in (0, 1)
            ],
            axis=1,
        )
        # gather_chunks > 1 bounds peak memory: the pre-reduce gathered
        # tensor is [B, 8*Cin, N*K] (11.9 GiB bf16 at the b4 768x576 ANM
        # shape — a 24 GiB program with its consumer, the round-4 OOM that
        # kept the exact path unbenchable at the headline shape). The
        # output-voxel axis is padded to equal chunks and gather+reduce+GEMM
        # runs per chunk under lax.scan — ONE traced body (an unrolled
        # python loop compiled minutes at the headline shape), identical
        # math, peak residency divided by the chunk count.
        if gather_chunks > 1:
            w_mat_c = (
                weight.reshape(k, cin, cout).swapaxes(0, 1).astype(x.dtype)
            )  # [Cin, K, Cout]
            npc = -(-n // gather_chunks)  # output voxels per chunk
            padn = npc * gather_chunks - n
            # pad with index 0 / weight 0: the padded voxels contribute
            # nothing and are sliced off the output
            lin_s = jnp.pad(
                lin_all.reshape(b, n, k), ((0, 0), (0, padn), (0, 0))
            ).reshape(b, gather_chunks, npc * k).swapaxes(0, 1)
            w8_s = jnp.pad(
                w8_all.reshape(b, 8, n, k), ((0, 0), (0, 0), (0, padn), (0, 0))
            ).reshape(b, 8, gather_chunks, npc * k).transpose(2, 0, 1, 3)

            def chunk_body(_, xs):
                lin_i, w8_i = xs  # [B, npc*K], [B, 8, npc*K]
                gath = jnp.take_along_axis(
                    x8_t, lin_i[:, None, :], axis=2
                ).reshape(b, 8, cin, npc * k)
                cols_c = jnp.sum(
                    gath * w8_i[:, :, None, :].astype(x.dtype), axis=1
                ).reshape(b, cin, npc, k)
                out_c = jax.lax.dot_general(
                    cols_c, w_mat_c,
                    dimension_numbers=(((1, 3), (0, 1)), ((), ())),
                    preferred_element_type=f32,
                ).astype(x.dtype)  # [B, npc, Cout]
                return _, out_c

            _, outs = jax.lax.scan(chunk_body, 0, (lin_s, w8_s))
            out = outs.transpose(1, 0, 2, 3).reshape(b, npc * gather_chunks, cout)
            out = out[:, :n]
            if bias is not None:
                out = out + bias.astype(out.dtype)
            return out.reshape(b, do, ho, wo, cout)
        gathered = jnp.take_along_axis(x8_t, lin_all, axis=2).reshape(b, 8, cin, n * k)
        cols = jnp.sum(gathered * w8_all[:, :, None, :].astype(x.dtype), axis=1)
    else:
        cols = jnp.zeros((b, cin, n * k), x.dtype)
        for cz in (0, 1):
            pz = jnp.clip(d0 + cz + 1.0, 0, d + 1).astype(jnp.int32)
            lin = ((pz * (h + 1) + ph) * (w + 1) + pw).reshape(b, 1, n * k)
            gathered = jnp.take_along_axis(xq_t, lin, axis=2)  # [B, 4Cin, N*K]
            gathered = gathered.reshape(b, 4, cin, n * k)
            # per-quad-corner weights, group order cy*2+cx
            w4 = jnp.stack(
                [
                    (wz_[cz] * wy[cy] * wx[cx]
                     * (okz_[cz] & oky[cy] & okx[cx]).astype(f32)).reshape(b, n * k)
                    for cy in (0, 1)
                    for cx in (0, 1)
                ],
                axis=1,
            )  # [B, 4, N*K]
            cols = cols + jnp.sum(gathered * w4[:, :, None, :].astype(x.dtype), axis=1)

    cols = cols.reshape(b, cin, n, k)
    w_mat = weight.reshape(k, cin, cout).swapaxes(0, 1)
    out = jax.lax.dot_general(
        cols, w_mat.astype(cols.dtype),
        dimension_numbers=(((1, 3), (0, 1)), ((), ())),
        preferred_element_type=f32,
    ).astype(x.dtype)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out.reshape(b, do, ho, wo, cout)


def clamp_offsets_to_window(offset: jnp.ndarray, kernel_size=(3, 3, 3),
                            padding: int = 1, dilation: int = 1) -> jnp.ndarray:
    """Straight-through per-tap clamp of predicted offsets so every sampling
    position lies inside the Pallas kernel's +-AP window along H and W
    (kernels/deform_fused.clamp_positions: pos in [out-AP, out+AP+1-EPS]).

    With pos = out + (k-1)*dilation - padding + off (3x3x3/p1/d1 geometry),
    the per-tap admissible offset range along H is
    [-(AP-1) - kh, AP+2-EPS - kh] (and the same along W with kw); dD is
    unbounded (the kernel holds the full D extent in VMEM). Offsets clamped
    here make the windowed kernel EXACTLY equal to the reference's unbounded
    sampling (deform_im2col_cuda.cuh:27-72) — the aperture clamp becomes a
    no-op — so a checkpoint TRAINED with this clamp evaluates identically
    under the exact packed8 path and the serving Pallas path. The clamp is a
    documented train-time deviation from the reference (same class as the
    global-batch SyncBN deviation): the reference never bounds its offsets.

    Gradient: straight-through (identity) — a hard clip would zero the
    offset-head gradient once an offset drifts past the window and could
    never pull it back; with the identity gradient the raw offset keeps
    receiving the window-interior signal. Forward values are hard-clamped.
    """
    from dualpixelface_tpu.ops.kernels.deform_fused import AP, EPS

    kd, kh, kw = kernel_size if not isinstance(kernel_size, int) else (kernel_size,) * 3
    k = kd * kh * kw
    assert offset.shape[-1] == 3 * k, (offset.shape, kernel_size)
    # tap order k = ((kz*KH)+ky)*KW+kx, channel k*3+{0 (dD), 1 (dH), 2 (dW)}
    kz, ky, kx = np.meshgrid(np.arange(kd), np.arange(kh), np.arange(kw), indexing="ij")
    center = (np.array([kd, kh, kw]) - 1) // 2  # (pad=1, dil=1 geometry)
    base_h = (ky.reshape(-1) - center[1]) * dilation  # [K]
    base_w = (kx.reshape(-1) - center[2]) * dilation
    big = np.float32(1e9)  # dD unbounded
    lo = np.stack([-big * np.ones(k), -AP - base_h, -AP - base_w], -1)  # [K, 3]
    hi = np.stack([big * np.ones(k), AP + 1 - EPS - base_h, AP + 1 - EPS - base_w], -1)
    lo = jnp.asarray(lo.reshape(3 * k), offset.dtype)
    hi = jnp.asarray(hi.reshape(3 * k), offset.dtype)
    clipped = jnp.clip(offset, lo, hi)
    return offset + jax.lax.stop_gradient(clipped - offset)


def _windowed_xla(x, offset, weight, bias):
    """XLA twin of the Pallas windowed kernel: packed8 gather with the
    identical aperture clamp — used for the kernel's VJP and as its oracle."""
    return _deform_conv3d_packed(
        x, offset, weight, bias, 1, 1, 1, pack_depth=True, aperture=True
    )


def _on_tpu() -> bool:
    from dualpixelface_tpu.ops.target import tpu_lowering

    return tpu_lowering()


@jax.custom_vjp
def _deform_conv3d_pallas_vjp(x, offset, weight, bias):
    if not _on_tpu():
        # identical windowed math without Mosaic (CPU tests / dryrun): the
        # kernel-vs-twin equivalence itself is covered by interpret-mode
        # tests (tests/test_deform_gather_pallas.py)
        return _windowed_xla(x, offset, weight, bias)
    from dualpixelface_tpu.ops.kernels.deform_fused import deform_conv3d_fused

    return deform_conv3d_fused(x, offset, weight, bias)


def _pallas_fwd(x, offset, weight, bias):
    return _deform_conv3d_pallas_vjp(x, offset, weight, bias), (x, offset, weight, bias)


def _pallas_bwd(res, g):
    """Fused Pallas backward (kernels/deform_fused.py): the one-hot-matmul
    forward run in reverse — grad_x via S3 gcols^T accumulated into the slab
    layout, grad_offset via the hat chain, grad_weight grid-accumulated —
    covering the reference's three backward CUDA kernels
    (deform_conv_cuda.cu:221-280) in one pass. Replaces an H-chunked
    jax.vjp of the XLA twin that cost ~1.7 s/conv at the 768x576 train shape
    (per-index gather cost, 12 chunked replays)."""
    from dualpixelface_tpu.ops.kernels.deform_fused import deform_conv3d_fused_bwd

    x, offset, weight, bias = res
    return deform_conv3d_fused_bwd(x, offset, weight, bias, g)


_deform_conv3d_pallas_vjp.defvjp(_pallas_fwd, _pallas_bwd)


def expand_masked_offset(temp: jnp.ndarray, dimension: str, k: int) -> jnp.ndarray:
    """Expand a dimension-masked offset tensor to the full 3*K layout.

    The reference's 'T'/'H'/'W'-subset wrappers predict only len(dimension)
    offset components per tap and scatter them into the full (dT, dH, dW)
    triple with the masked axes pinned to zero (ref modules/deform_conv.py:
    146-200 — in-place channel loops there; one static interleave here).

    :param temp: [..., len(dimension)*K], tap-major — tap i's components sit
                 at channels i*len+j, j indexing the ACTIVE axes in T,H,W order
    :param dimension: subset of 'THW' (order-insensitive, as in the reference)
    :param k: number of kernel taps (KD*KH*KW)
    :return: [..., 3*K] in the deform_conv3d offset layout
    """
    active = [i for i, ax in enumerate("THW") if ax in dimension]
    length = len(active)
    assert temp.shape[-1] == length * k, (temp.shape, dimension, k)
    if length == 3:
        return temp
    t = temp.reshape(temp.shape[:-1] + (k, length))
    parts = []
    j = 0
    for axis in range(3):
        if axis in active:
            parts.append(t[..., j])
            j += 1
        else:
            parts.append(jnp.zeros_like(t[..., 0]))
    full = jnp.stack(parts, axis=-1)  # [..., K, 3]
    return full.reshape(temp.shape[:-1] + (3 * k,))


def _torch_kaiming_uniform(key, shape, dtype=jnp.float32):
    """torch Conv default init: kaiming_uniform_(a=sqrt(5)) ==
    U(-1/sqrt(fan_in), 1/sqrt(fan_in)) (ref deform_conv.py:44-50)."""
    fan_in = int(np.prod(shape[:-1]))
    bound = 1.0 / np.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class DeformConvPack3D(nn.Module):
    """Self-offset-predicting deformable 3-D conv
    (ref DeformConvPack_dv2, deform_conv.py:295-389, dimension='THW').

    A zero-initialised Conv3d predicts 3*K offsets; returns (output, offset).
    `maxsize` is accepted for config parity but unused — the reference's
    clamp is commented out (deform_conv.py:377-379).
    """

    features: int
    kernel_size: Sequence[int] = (3, 3, 3)
    stride: int = 1
    padding: int = 1
    maxsize: float | None = None
    use_bias: bool = True
    impl: str = "pallas"
    # offset_clamp: hard-clamp predicted offsets (straight-through gradient)
    # to the Pallas kernel's +-AP window — clamp_offsets_to_window. Trained
    # with this on, the windowed serving kernel is EXACT (not a 0.5%-budget
    # approximation): the aperture clamp can never bind. Documented
    # train-time deviation from the reference's unbounded offsets.
    offset_clamp: bool = False
    # gather_chunks: chunk the packed8 gather over output voxels — bounds
    # the [B, 8*Cin, N*K] pre-reduce residency (config deform_gather_chunks;
    # needed to run the exact path at the 768x576 headline shape on 16 GB)
    gather_chunks: int = 1

    @nn.compact
    def __call__(self, x):
        ks = _triple(self.kernel_size)
        k = int(np.prod(ks))
        cin = x.shape[-1]

        if ks == (3, 3, 3) and self.stride == 1 and self.padding == 1:
            # kd-folded 2-D form of the same conv (identical param tree) —
            # the plain 3-D conv lowering is a measured bottleneck at the
            # ANM shape (ops/blocks.py _DSliceConv3D)
            from dualpixelface_tpu.ops.blocks import _DSliceConv3D

            # dfold="pallas": the fused dslice kernel wins at THIS shape
            # specifically (3*Co = 243 channel groups make the XLA "out"
            # fold relayout-heavy: 2.49 vs 3.64 ms/conv on v5e,
            # tools/bench_dslice_fold.py), while the hourglass shapes keep
            # the XLA fold (full-model DPFACE_DSLICE_FOLD=pallas measured
            # slower — docs/PERFORMANCE.md round 3).
            offset = _DSliceConv3D(
                3 * k,
                use_bias=True,
                kernel_init=nn.initializers.zeros,
                dfold="pallas",
                name="conv_offset",
            )(x)
        else:
            offset = nn.Conv(
                3 * k,
                kernel_size=ks,
                strides=(self.stride,) * 3,
                padding=[(self.padding, self.padding)] * 3,
                use_bias=True,
                kernel_init=nn.initializers.zeros,
                bias_init=nn.initializers.zeros,
                name="conv_offset",
            )(x)
        if self.offset_clamp and ks == (3, 3, 3) and self.stride == 1 and self.padding == 1:
            offset = clamp_offsets_to_window(offset, ks)

        weight = self.param("weight", _torch_kaiming_uniform, ks + (cin, self.features))
        if self.use_bias:
            fan_in = float(np.prod(ks)) * cin
            bound = 1.0 / np.sqrt(fan_in)
            bias = self.param(
                "bias",
                lambda key, shape: jax.random.uniform(key, shape, jnp.float32, -bound, bound),
                (self.features,),
            )
        else:
            bias = None

        # The Pallas windowed kernel (4-7x the XLA gather, measured in
        # docs/PERFORMANCE.md) requires the ANM geometry: 3x3x3, stride 1,
        # pad 1, D<=4, fp32/bf16 input. Anything else falls back to the
        # unbounded XLA formulation.
        impl = self.impl
        if impl == "pallas" and not (
            ks == (3, 3, 3) and self.stride == 1 and self.padding == 1
            and x.shape[1] <= 4
        ):
            impl = "packed8"

        # Rematerialize in the backward pass: without this, AD saves every
        # corner's gathered/weighted tensor as residuals (8 x ~[B, Cin, N*K]
        # — an OOM at training scale on 16 GB chips); with it the backward
        # recomputes the cheap gathers instead (the standard TPU trade,
        # SURVEY.md: jax.checkpoint to trade FLOPs for HBM). The pallas impl
        # needs no remat: its custom_vjp saves only the raw inputs and the
        # backward recomputes from scratch (remat of a custom_vjp also fails
        # to linearize in jax 0.9).
        def call(x_, o_, w_, b_):
            return deform_conv3d(
                x_, o_, w_, b_, stride=self.stride, padding=self.padding, impl=impl,
                gather_chunks=self.gather_chunks,
            )

        deform = call if impl == "pallas" else jax.checkpoint(call)
        out = deform(x, offset, weight, bias)
        return out, offset


class DeformConv3D(nn.Module):
    """Deformable 3-D conv with EXTERNALLY supplied offsets
    (ref DeformConv, modules/deform_conv.py:15-63): weight/bias params only,
    the caller passes the full [B, Do, Ho, Wo, 3*K] offset tensor. Optionally
    dimension-masked (ref DeformConv_d, deform_conv.py:105-200): with
    dimension a strict subset of 'THW' the offset argument carries only
    len(dimension)*K channels and the masked axes are pinned to zero.
    """

    features: int
    kernel_size: Sequence[int] = (3, 3, 3)
    stride: int = 1
    padding: int = 1
    dilation: int = 1
    dimension: str = "THW"
    maxsize: float | None = None  # accepted for config parity; unused (ref clamp commented out)
    use_bias: bool = True
    impl: str = "packed8"

    @nn.compact
    def __call__(self, x, offset):
        ks = _triple(self.kernel_size)
        k = int(np.prod(ks))
        cin = x.shape[-1]
        offset = expand_masked_offset(offset, self.dimension, k)

        weight = self.param("weight", _torch_kaiming_uniform, ks + (cin, self.features))
        bias = None
        if self.use_bias:
            bound = 1.0 / np.sqrt(float(k) * cin)
            bias = self.param(
                "bias",
                lambda key, shape: jax.random.uniform(key, shape, jnp.float32, -bound, bound),
                (self.features,),
            )
        return deform_conv3d(
            x, offset, weight, bias,
            stride=self.stride, padding=self.padding, dilation=self.dilation,
            impl=self.impl,
        )


class DeformConvPack3D_d(nn.Module):
    """Dimension-masked self-offset-predicting deformable 3-D conv
    (ref DeformConvPack_d, modules/deform_conv.py:206-292): a zero-initialised
    Conv3d predicts len(dimension)*K offset channels, expanded to the full
    (dT, dH, dW) layout with masked axes zeroed. Returns the conv output only
    (the reference Pack_d does not return the offsets; only _dv2 does).
    """

    features: int
    kernel_size: Sequence[int] = (3, 3, 3)
    stride: int = 1
    padding: int = 1
    dimension: str = "THW"
    maxsize: float | None = None
    use_bias: bool = True
    impl: str = "packed8"

    @nn.compact
    def __call__(self, x):
        ks = _triple(self.kernel_size)
        k = int(np.prod(ks))
        cin = x.shape[-1]
        length = len([ax for ax in "THW" if ax in self.dimension])

        temp = nn.Conv(
            length * k,
            kernel_size=ks,
            strides=(self.stride,) * 3,
            padding=[(self.padding, self.padding)] * 3,
            use_bias=True,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="conv_offset",
        )(x)
        offset = expand_masked_offset(temp, self.dimension, k)

        weight = self.param("weight", _torch_kaiming_uniform, ks + (cin, self.features))
        bias = None
        if self.use_bias:
            bound = 1.0 / np.sqrt(float(k) * cin)
            bias = self.param(
                "bias",
                lambda key, shape: jax.random.uniform(key, shape, jnp.float32, -bound, bound),
                (self.features,),
            )
        return deform_conv3d(
            x, offset, weight, bias,
            stride=self.stride, padding=self.padding, impl=self.impl,
        )
