"""Pure-torch reimplementation of the reference dcn3d CUDA forward, used to
run the reference StereoDPNet with `use_deform=true` on CPU for parity tests
(the shipped CPU stub raises, ref src/module/dcn3d/src/cpu/deform_cpu.cpp:28).

Semantics mirrored exactly:
  * trilinear sampling with per-corner bounds checks and the outer
    (-1, dim) validity guard — ref cuda/deform_im2col_cuda.cuh:27-72
  * im2col loop layout (tap-major offset channels, 3*tap + {d,h,w}) —
    ref cuda/deform_im2col_cuda.cuh:193-265
  * grouped GEMM + bias (group=1 in the ANM) — ref cuda/deform_conv_cuda.cu:93-125
"""
from __future__ import annotations

import itertools

import torch


def dcn_deform_conv_forward(
    x, weight, bias, offset,
    kd, kh, kw, sd, sh, sw, pd, ph, pw, dd, dh, dw,
    group, deformable_groups, im2col_step,
):
    """Drop-in for the DCN extension's `deform_conv_forward` (same positional
    signature, ref functions/deform_conv_func.py:28-35)."""
    assert group == 1 and deformable_groups == 1, "ANM uses group=1"
    x = x.float()
    offset = offset.float()
    b, c, d, h, w = x.shape
    cout = weight.shape[0]
    k = kd * kh * kw
    do = (d + 2 * pd - (dd * (kd - 1) + 1)) // sd + 1
    ho = (h + 2 * ph - (dh * (kh - 1) + 1)) // sh + 1
    wo = (w + 2 * pw - (dw * (kw - 1) + 1)) // sw + 1

    off = offset.view(b, k, 3, do, ho, wo)
    taps = list(itertools.product(range(kd), range(kh), range(kw)))
    tap_d = torch.tensor([i * dd for i, _, _ in taps], dtype=torch.float32)
    tap_h = torch.tensor([j * dh for _, j, _ in taps], dtype=torch.float32)
    tap_w = torch.tensor([kk * dw for _, _, kk in taps], dtype=torch.float32)

    base_d = (torch.arange(do, dtype=torch.float32) * sd - pd).view(1, 1, do, 1, 1)
    base_h = (torch.arange(ho, dtype=torch.float32) * sh - ph).view(1, 1, 1, ho, 1)
    base_w = (torch.arange(wo, dtype=torch.float32) * sw - pw).view(1, 1, 1, 1, wo)

    d_im = base_d + tap_d.view(1, k, 1, 1, 1) + off[:, :, 0]
    h_im = base_h + tap_h.view(1, k, 1, 1, 1) + off[:, :, 1]
    w_im = base_w + tap_w.view(1, k, 1, 1, 1) + off[:, :, 2]

    # outer validity guard (im2col writes 0 outside it)
    valid = (
        (d_im > -1) & (h_im > -1) & (w_im > -1)
        & (d_im < d) & (h_im < h) & (w_im < w)
    ).float()

    d0, h0, w0 = torch.floor(d_im), torch.floor(h_im), torch.floor(w_im)
    ld, lh, lw = d_im - d0, h_im - h0, w_im - w0

    xf = x.reshape(b, c, d * h * w)
    val = torch.zeros(b, c, k, do, ho, wo)
    for cd, ch_, cw in itertools.product((0, 1), repeat=3):
        dc, hc, wc = d0 + cd, h0 + ch_, w0 + cw
        # per-corner bounds (within the outer guard these reduce to the
        # CUDA kernel's low>=0 / high<=dim-1 conditions)
        cvalid = (
            (dc >= 0) & (dc <= d - 1)
            & (hc >= 0) & (hc <= h - 1)
            & (wc >= 0) & (wc <= w - 1)
        ).float()
        wgt = (
            (ld if cd else 1.0 - ld)
            * (lh if ch_ else 1.0 - lh)
            * (lw if cw else 1.0 - lw)
        )
        idx = (
            dc.clamp(0, d - 1) * (h * w)
            + hc.clamp(0, h - 1) * w
            + wc.clamp(0, w - 1)
        ).long()  # [B, K, Do, Ho, Wo]
        flat = idx.reshape(b, 1, -1).expand(b, c, idx.numel() // b)
        g = torch.gather(xf, 2, flat).reshape(b, c, k, do, ho, wo)
        val = val + (wgt * cvalid).unsqueeze(1) * g
    val = val * valid.unsqueeze(1)

    out = torch.einsum(
        "bckn,ock->bon",
        val.reshape(b, c, k, do * ho * wo),
        weight.reshape(cout, c, k).float(),
    ) + bias.float().view(1, cout, 1)
    return out.reshape(b, cout, do, ho, wo)


def install_dcn_forward():
    """Point the shimmed DCN module's forward at the torch reimplementation
    (tests/test_stereodpnet_converter.py installs the module skeleton)."""
    import sys

    sys.modules["DCN"].deform_conv_forward = dcn_deform_conv_forward
