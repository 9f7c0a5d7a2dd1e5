"""Pallas/Mosaic deformable-3D-conv gather kernel (windowed aperture).

The reference's #1 native component is the dcn3d CUDA im2col
(`/root/reference/src/module/dcn3d/src/cuda/deform_im2col_cuda.cuh:193-265`):
per output voxel x tap, a trilinear gather at `out + tap - pad + offset`.
XLA's TPU gather runs at ~15-20 ns per index regardless of locality
(docs/PERFORMANCE.md), which made the ANM deform convs ~85% of StereoDPNet
forward time. This kernel replaces it with VPU-native `dynamic_gather`
(`jnp.take_along_axis` along 128 lanes — the one gather shape Mosaic lowers
on current TPUs).

Design — window-packed lane gather:
  * The only hardware gather is within 128 lanes, so the sampling aperture is
    bounded: positions are clamped to +-AP (=3) voxels around the output
    voxel along H and W (full extent along D). This is a *documented
    TPU-native semantic* — offsets beyond the aperture clamp to its edge
    (gradient 0 there, like the reference's volume boundary). The unbounded
    XLA formulation remains `impl='packed8'`.
  * Table tile per (b, w-block, ho): lanes = (8 delta-h rows x 16 w window),
    rows = (D<=4 planes x C-chunk channels). One lane index resolves BOTH the
    h- and w-selection; the 4 bilinear (h,w) corners are 4 gathers at
    idx, idx+1, idx+16, idx+17; the D axis is a 4-plane hat-weighted sum
    (exactly trilinear + boundary-zeroing in one expression).
  * Samples per block: 4 d_out x 28 taps (27 + 1 zero pad) x 8 w_out = 896
    = 7 tiles of (16 pairs x 8 wo) in lanes.
  * The kernel emits im2col columns; the (tap,cin)->cout contraction runs as
    one XLA matmul on the MXU afterwards (zero-padded weight rows kill the
    pad taps/channels).

Gradients: the op is wrapped in `jax.custom_vjp` in ops/deform_conv3d.py —
backward differentiates the XLA twin with the identical aperture clamp.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

AP = 3          # aperture: sampling clamped to +-AP voxels around the output
DH_ROWS = 8     # delta-h values per window: [-AP, AP+1]
WWIN = 16       # w window lanes per block: [wb*8 - (AP+1), wb*8 + 12)
WBLK = 8        # output columns per block
TAP_PAD = 28    # 27 taps padded to 28 so (d_out, tap) pairs = 4*28 = 112 = 7*16
N_TILES = 7
CH = 40         # channel rows per gather chunk (4 planes x 40 = 160 rows)


def _kernel(n_chunks, d_pad, xw_ref, pos_ref, out_ref):
    """xw_ref:  [1, 1, 1, n_chunks, d_pad*CH, 128]  gather table
    pos_ref:    [1, 1, 1, N_TILES, 3, 128]          (pd, ph_rel, pw_rel)
    out_ref:    [1, 1, 1, N_TILES, n_chunks*CH, 128] im2col columns
    """
    wo_l = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1) % WBLK

    for t in range(N_TILES):
        pd = pos_ref[0, 0, 0, t, 0:1, :]
        ph = pos_ref[0, 0, 0, t, 1:2, :]
        pw = pos_ref[0, 0, 0, t, 2:3, :]

        h0 = jnp.floor(ph)
        w0 = jnp.floor(pw)
        fh = ph - h0
        fw = pw - w0
        lane = (
            (h0.astype(jnp.int32) + AP) * WWIN
            + wo_l
            + w0.astype(jnp.int32)
            + (AP + 1)
        )  # [1, 128]

        w00 = (1.0 - fh) * (1.0 - fw)
        w01 = (1.0 - fh) * fw
        w10 = fh * (1.0 - fw)
        w11 = fh * fw

        # D hat weights: per real plane dp, relu(1 - |pd - dp|) reproduces
        # linear interp over d including zero weight outside [0, D-1]
        wdp = [jnp.maximum(1.0 - jnp.abs(pd - dp), 0.0) for dp in range(d_pad)]

        for ck in range(n_chunks):
            tab = xw_ref[0, 0, 0, ck]  # [d_pad*CH, 128]
            rows = d_pad * CH

            def corner(delta):
                idx = jnp.broadcast_to(lane + delta, (rows, 128))
                g = jnp.take_along_axis(tab, idx, axis=-1)
                g = g.reshape(d_pad, CH, 128)
                acc = g[0] * wdp[0]
                for dp in range(1, d_pad):
                    acc = acc + g[dp] * wdp[dp]
                return acc  # [CH, 128]

            cols = (
                corner(0) * w00
                + corner(1) * w01
                + corner(WWIN) * w10
                + corner(WWIN + 1) * w11
            )
            out_ref[0, 0, 0, t, ck * CH : (ck + 1) * CH, :] = cols


def _prep_table(x, n_chunks, d_pad):
    """x [B, D, H, W, C] -> xw [B, nWB, H, n_chunks, d_pad*CH, 128].

    lanes = (delta_h in [-AP, AP+1]) x (16-wide w window at stride 8);
    rows = (plane, channel-chunk). Zero padding supplies the out-of-volume
    zeros the reference's ok-masks produce.
    """
    b, d, h, w, c = x.shape
    nwb = -(-w // WBLK)
    cpad = n_chunks * CH
    x = jnp.pad(
        x,
        (
            (0, 0),
            (0, d_pad - d),
            (AP, AP + 1),
            (AP + 1, nwb * WBLK - w + WWIN - WBLK - (AP + 1)),
            (0, cpad - c),
        ),
    )
    # w windows: blocks of 8 with 16-wide views -> concat of adjacent 8-blocks
    bw = x.reshape(b, d_pad, h + DH_ROWS - 1, nwb + 1, WBLK, cpad)
    xw = jnp.concatenate([bw[:, :, :, :-1], bw[:, :, :, 1:]], axis=4)
    # [B, d_pad, H+7, nWB, 16, cpad]
    # delta-h stack: row ho reads plane rows ho-AP .. ho+AP+1
    xw = jnp.stack([xw[:, :, dh : dh + h] for dh in range(DH_ROWS)], axis=3)
    # [B, d_pad, H, 8, nWB, 16, cpad]
    xw = xw.transpose(0, 4, 2, 6, 1, 3, 5)  # [B, nWB, H, cpad, d_pad, 8, 16]
    xw = xw.reshape(b, nwb, h, n_chunks, CH, d_pad, DH_ROWS * WWIN)
    xw = xw.transpose(0, 1, 2, 3, 5, 4, 6)  # [B, nWB, H, nck, d_pad, CH, 128]
    return xw.reshape(b, nwb, h, n_chunks, d_pad * CH, 128)


def _prep_positions(offset, d_out, k_dhw, eps):
    """offset [B, Do, Ho, Wo, 3K] -> pos [B, nWB, Ho, N_TILES, 3, 128].

    Per (d_out, tap) pair p = dout*TAP_PAD + tap, lanes = (pair%16)*8 + wo%8:
      pd     = d_out + kd - 1 + off_d            (absolute, unclamped)
      ph_rel = kh - 1 + off_h  clamped to [-AP, AP + 1 - eps]
      pw_rel = kw - 1 + off_w  clamped likewise
    """
    b, do, ho, wo, _ = offset.shape
    k = k_dhw.shape[0]
    off = offset.reshape(b, do, ho, wo, k, 3).astype(jnp.float32)

    kd = k_dhw[:, 0].astype(jnp.float32) - 1.0
    kh = k_dhw[:, 1].astype(jnp.float32) - 1.0
    kw = k_dhw[:, 2].astype(jnp.float32) - 1.0
    douts = jnp.arange(do, dtype=jnp.float32)

    pd = (douts[:, None] + kd[None, :])[None, :, None, None, :] + off[..., 0]
    ph = jnp.clip(kh[None, None, None, None, :] + off[..., 1], -AP, AP + 1 - eps)
    pw = jnp.clip(kw[None, None, None, None, :] + off[..., 2], -AP, AP + 1 - eps)

    pos = jnp.stack([pd, ph, pw], axis=-1)  # [B, Do, Ho, Wo, K, 3]
    pos = jnp.pad(pos, ((0, 0),) * 4 + ((0, TAP_PAD - k), (0, 0)))
    # pairs p = (dout, tap) -> [B, Ho, Wo, 112, 3] (pair axis padded to 112
    # so the 7-tile layout holds for any D <= 4)
    pos = pos.transpose(0, 2, 3, 1, 4, 5).reshape(b, ho, wo, do * TAP_PAD, 3)
    pos = jnp.pad(pos, ((0, 0), (0, 0), (0, 0), (0, 4 * TAP_PAD - do * TAP_PAD), (0, 0)))
    nwb = -(-wo // WBLK)
    pos = jnp.pad(pos, ((0, 0), (0, 0), (0, nwb * WBLK - wo), (0, 0), (0, 0)))
    pos = pos.reshape(b, ho, nwb, WBLK, N_TILES, 16, 3)
    pos = pos.transpose(0, 2, 1, 4, 6, 5, 3)  # [B, nWB, Ho, 7, 3, 16, 8]
    return pos.reshape(b, nwb, ho, N_TILES, 3, 128)


def _tap_grid(kd, kh, kw):
    kz, ky, kx = np.meshgrid(np.arange(kd), np.arange(kh), np.arange(kw), indexing="ij")
    return jnp.asarray(
        np.stack([kz.ravel(), ky.ravel(), kx.ravel()], -1), jnp.int32
    )  # [K, 3]


EPS = 1.0 / 1024.0


def clamp_positions(pos, out_coord):
    """Shared aperture clamp (the XLA twin applies the same) — pos and
    out_coord along one spatial axis."""
    return jnp.clip(pos, out_coord - AP, out_coord + AP + 1 - EPS)


@functools.partial(jax.jit, static_argnames=("interpret",))
def deform_gather_cols(x, offset, interpret=False):
    """im2col columns of the windowed deformable 3-D conv.

    :param x:      [B, D<=4, H, W, C]
    :param offset: [B, D, H, W, 3*27] (stride 1, pad 1, kernel 3x3x3)
    :return:       [B, D, H, W, TAP_PAD*CH*n_chunks] columns, tap-major —
                   contract against zero-padded weights [TAP_PAD*CH*nck, Cout]
    """
    b, d, h, w, c = x.shape
    assert d <= 4, f"kernel supports D<=4 (ANM has D=4); got {d}"
    assert offset.shape == (b, d, h, w, 81), offset.shape
    d_pad = 4
    n_chunks = -(-c // CH)

    xw = _prep_table(x.astype(jnp.float32), n_chunks, d_pad)
    k_dhw = _tap_grid(3, 3, 3)
    pos = _prep_positions(offset, d, k_dhw, EPS)
    nwb = xw.shape[1]

    kernel = functools.partial(_kernel, n_chunks, d_pad)
    cols = pl.pallas_call(
        kernel,
        grid=(b, nwb, h),
        in_specs=[
            pl.BlockSpec(
                (1, 1, 1, n_chunks, d_pad * CH, 128),
                lambda bi, wi, hi: (bi, wi, hi, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, 1, N_TILES, 3, 128),
                lambda bi, wi, hi: (bi, wi, hi, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, 1, N_TILES, n_chunks * CH, 128),
            lambda bi, wi, hi: (bi, wi, hi, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (b, nwb, h, N_TILES, n_chunks * CH, 128), jnp.float32
        ),
        interpret=interpret,
    )(xw, pos)

    # [B, nWB, H, 7, CC, 16, 8] -> [B, D, H, W, 28*CC]
    cc = n_chunks * CH
    cols = cols.reshape(b, nwb, h, N_TILES, cc, 16, WBLK)
    cols = cols.transpose(0, 2, 1, 6, 3, 5, 4)  # [B, H, nWB, 8, 7, 16, CC]
    cols = cols.reshape(b, h, nwb * WBLK, 4 * TAP_PAD, cc)[:, :, :w, : d * TAP_PAD]
    cols = cols.reshape(b, h, w, d, TAP_PAD * cc)
    return cols.transpose(0, 3, 1, 2, 4)  # [B, D, H, W, 28*CC]


def pack_weight(weight, c, cout):
    """[3,3,3,Cin,Cout] -> [TAP_PAD * n_chunks*CH, Cout] zero-padded to match
    the column layout (tap-major, channel chunks of CH)."""
    n_chunks = -(-c // CH)
    wk = weight.reshape(27, c, cout)
    wk = jnp.pad(wk, ((0, TAP_PAD - 27), (0, n_chunks * CH - c), (0, 0)))
    return wk.reshape(TAP_PAD * n_chunks * CH, cout)


def deform_conv3d_pallas(x, offset, weight, bias=None, interpret=None):
    """Windowed deformable conv (stride 1, pad 1, 3x3x3) — forward only;
    callers wrap with custom_vjp (ops/deform_conv3d.py)."""
    if interpret is None:
        # Mosaic only compiles on TPU; CPU tests run the interpreter
        interpret = jax.default_backend() != "tpu"
    b, d, h, w, c = x.shape
    cout = weight.shape[-1]
    cols = deform_gather_cols(x, offset, interpret=interpret)
    wmat = pack_weight(weight.astype(jnp.float32), c, cout)
    out = jax.lax.dot_general(
        cols, wmat,
        dimension_numbers=(((4,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if bias is not None:
        out = out + bias
    return out.astype(x.dtype)
