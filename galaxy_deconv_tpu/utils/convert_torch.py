"""Torch-checkpoint migration: reference ``.pth`` state_dicts -> flax params.

Lets users of the reference framework carry their trained weights over
(reference ``saved_models/*.pth``: Tikhonet/ShapeNet XDenseUNet weights;
ResUNet-based ADMM checkpoints).  Tensors are numpy-converted with the
layout maps:

    Conv2d          OIHW        -> HWIO
    depthwise conv  (C,1,k,k)   -> (k,k,1,C)
    ConvTranspose2d (I,O,k,k)   -> (k,k,O,I) flipped spatially (see below)
    Linear          (out,in)    -> (in,out)
    BatchNorm       weight/bias -> scale/bias; running_* -> batch_stats

torch's ConvTranspose2d is the gradient of correlation: output o[s*i+a] +=
x[i] * w[..., a].  flax ConvTranspose is a fractionally-strided
*convolution*, which flips the kernel taps; converting therefore flips the
spatial axes in addition to the axis permutation (verified against torch in
tests/test_convert.py).
"""

from __future__ import annotations

from typing import Mapping

import numpy as np


def _np(t):
    return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)


def conv_kernel(w) -> np.ndarray:
    """OIHW -> HWIO."""
    return _np(w).transpose(2, 3, 1, 0)


def conv_transpose_kernel(w) -> np.ndarray:
    """torch ConvTranspose2d (I, O, kh, kw) -> flax (kh, kw, I, O), spatially flipped."""
    return _np(w)[:, :, ::-1, ::-1].transpose(2, 3, 0, 1).copy()


def dense_kernel(w) -> np.ndarray:
    return _np(w).T


def _bn(sd: Mapping, key: str):
    params = {"scale": _np(sd[f"{key}.weight"]), "bias": _np(sd[f"{key}.bias"])}
    stats = {"mean": _np(sd[f"{key}.running_mean"]), "var": _np(sd[f"{key}.running_var"])}
    return params, stats


# ---------------------------------------------------------------------------
# XDenseUNet  (reference models/XDenseUNet.py -> nets.xdense_unet.XDenseUNet)
# ---------------------------------------------------------------------------

# (torch module path, flax module name, block kind, n_layers)
_XDENSE_LAYOUT = [
    ("input.0", "Conv_0", "conv", None),
    ("input.1", "DenseBlock_0", "dense", 4),
    ("down1.0", "Down_0", "down", None),
    ("down1.1", "DenseBlock_1", "dense", 5),
    ("down2.0", "Down_1", "down", None),
    ("down2.1", "DenseBlock_2", "dense", 6),
    ("body.0", "Down_2", "down", None),
    ("body.1", "DenseBlock_3", "dense", 7),
    ("body.2", "Up_0", "up", None),
    ("up1.0", "DenseBlock_4", "dense", 6),
    ("up1.1", "Up_1", "up", None),
    ("up2.0", "DenseBlock_5", "dense", 5),
    ("up2.1", "Up_2", "up", None),
    ("output.0", "DenseBlock_6", "dense", 4),
    ("output.1", "Conv_1", "conv_bias", None),
]


def convert_xdense_state_dict(sd: Mapping, prefix: str = "") -> tuple[dict, dict]:
    """Reference XDenseUNet state_dict -> (params, batch_stats) subtrees."""
    params: dict = {}
    stats: dict = {}
    for tpath, fname, kind, n_layers in _XDENSE_LAYOUT:
        t = prefix + tpath
        if kind == "conv":
            params[fname] = {"kernel": conv_kernel(sd[f"{t}.weight"])}
        elif kind == "conv_bias":
            params[fname] = {"kernel": conv_kernel(sd[f"{t}.weight"]), "bias": _np(sd[f"{t}.bias"])}
        elif kind == "down":
            bn_p, bn_s = _bn(sd, f"{t}.net.0")
            params[fname] = {"BatchNorm_0": bn_p, "Conv_0": {"kernel": conv_kernel(sd[f"{t}.net.2.weight"])}}
            stats[fname] = {"BatchNorm_0": bn_s}
        elif kind == "up":
            params[fname] = {
                "Conv_0": {"kernel": conv_kernel(sd[f"{t}.net.0.weight"]), "bias": _np(sd[f"{t}.net.0.bias"])}
            }
        elif kind == "dense":
            p: dict = {}
            s: dict = {}
            for i in range(n_layers):
                bn_p, bn_s = _bn(sd, f"{t}.net.{i}.0")
                p[f"BatchNorm_{i}"] = bn_p
                s[f"BatchNorm_{i}"] = bn_s
                p[f"SeparableConv_{i}"] = {
                    "Conv_0": {"kernel": conv_kernel(sd[f"{t}.net.{i}.2.depthewise.weight"])},
                    "Conv_1": {"kernel": conv_kernel(sd[f"{t}.net.{i}.2.pointwise.weight"])},
                }
            params[fname] = p
            stats[fname] = s
    return params, stats


def convert_tikhonet_state_dict(sd: Mapping) -> dict:
    """Reference Tikhonet checkpoint -> flax variables for models.Tikhonet.

    The reference's ``lam`` was never registered (models/Tikhonet.py:39), so
    it is restored at its effective frozen value 1.0.
    """
    from galaxy_deconv_tpu.models.tikhonet import _SOFTPLUS_INV_1

    d_params, d_stats = convert_xdense_state_dict(sd, prefix="denoiser.")
    return {
        "params": {"lam_raw": np.float32(_SOFTPLUS_INV_1), "XDenseUNet_0": d_params},
        "batch_stats": {"XDenseUNet_0": d_stats},
    }


# ---------------------------------------------------------------------------
# ResUNet  (reference models/ResUNet.py -> nets.resunet.ResUNet)
# ---------------------------------------------------------------------------


def convert_resunet_state_dict(sd: Mapping, prefix: str = "", num_blocks: int = 2) -> dict:
    """Reference ResUNet state_dict -> flax params subtree.

    Reference layout: m_head; m_down{1..3} = [nb ResBlocks, strideconv];
    m_body = nb ResBlocks; m_up{3..1} = [convtranspose, nb ResBlocks]; m_tail.
    Flax call order: Conv_0 head; (ResBlock_0..1, DownConv_0) x3; body
    ResBlocks; (UpConvTranspose_0, ResBlocks) x3; Conv_1 tail.
    """
    nb = num_blocks
    params: dict = {}
    rb = 0  # flax ResBlock counter
    dc = 0  # DownConv counter
    uc = 0  # UpConvTranspose counter

    def resblock(tkey):
        return {
            "Conv_0": {"kernel": conv_kernel(sd[f"{tkey}.res.0.weight"])},
            "Conv_1": {"kernel": conv_kernel(sd[f"{tkey}.res.2.weight"])},
        }

    params["Conv_0"] = {"kernel": conv_kernel(sd[f"{prefix}m_head.weight"])}
    for d in (1, 2, 3):
        for i in range(nb):
            params[f"ResBlock_{rb}"] = resblock(f"{prefix}m_down{d}.{i}")
            rb += 1
        params[f"DownConv_{dc}"] = {"Conv_0": {"kernel": conv_kernel(sd[f"{prefix}m_down{d}.{nb}.weight"])}}
        dc += 1
    for i in range(nb):
        params[f"ResBlock_{rb}"] = resblock(f"{prefix}m_body.{i}")
        rb += 1
    for u in (3, 2, 1):
        params[f"UpConvTranspose_{uc}"] = {
            "ConvTranspose_0": {"kernel": conv_transpose_kernel(sd[f"{prefix}m_up{u}.0.weight"])}
        }
        uc += 1
        for i in range(nb):
            params[f"ResBlock_{rb}"] = resblock(f"{prefix}m_up{u}.{i + 1}")
            rb += 1
    params["Conv_1"] = {"kernel": conv_kernel(sd[f"{prefix}m_tail.weight"])}
    return params


# ---------------------------------------------------------------------------
# SubNet  (reference models/unrolled_admm_gaussian.py:43-71 /
#          models/Unrolled_ADMM.py:59-90 -> nets.subnet.SubNet)
# ---------------------------------------------------------------------------


def _subnet_first_dense_kernel(w) -> np.ndarray:
    """First MLP Linear of SubNet: torch (64, 16*8*8+1) -> flax (1025, 64).

    The torch net flattens the conv output in CHW order
    (``x.view(N, 1, 16*8*8)`` from an (N, 16, 8, 8) tensor); flax flattens
    NHWC in HWC order, so the input columns must be re-ordered in addition
    to the usual transpose.  The trailing alpha column stays last.
    """
    w = _np(w)  # (out, in)
    n_feat = w.shape[1] - 1  # 16*8*8, + 1 alpha
    c, h, wd = 16, 8, 8
    assert n_feat == c * h * wd, w.shape
    j = np.arange(n_feat)
    hh, ww, cc = j // (wd * c), (j // c) % wd, j % c  # flax HWC unflatten
    perm = np.concatenate([cc * (h * wd) + hh * wd + ww, [n_feat]])  # torch CHW index
    return w[:, perm].T


def convert_subnet_state_dict(sd: Mapping, prefix: str = "") -> tuple[dict, dict]:
    """Reference SubNet state_dict -> (params, batch_stats) subtrees.

    Layout: 4 x Down(maxpool + DoubleConv[conv BN relu conv BN relu]) then a
    3-layer MLP.  Both the Gaussian (n outputs) and Poisson (2n outputs)
    SubNets share this structure.
    """
    params: dict = {}
    stats: dict = {}
    for i in range(4):
        base = f"{prefix}conv_layers.{i}.maxpool_conv.1.double_conv"
        p: dict = {"Conv_0": {"kernel": conv_kernel(sd[f"{base}.0.weight"]), "bias": _np(sd[f"{base}.0.bias"])}}
        s: dict = {}
        p["BatchNorm_0"], s["BatchNorm_0"] = _bn(sd, f"{base}.1")
        p["Conv_1"] = {"kernel": conv_kernel(sd[f"{base}.3.weight"]), "bias": _np(sd[f"{base}.3.bias"])}
        p["BatchNorm_1"], s["BatchNorm_1"] = _bn(sd, f"{base}.4")
        params[f"DoubleConv_{i}"] = p
        stats[f"DoubleConv_{i}"] = s
    params["Dense_0"] = {
        "kernel": _subnet_first_dense_kernel(sd[f"{prefix}mlp.0.weight"]),
        "bias": _np(sd[f"{prefix}mlp.0.bias"]),
    }
    params["Dense_1"] = {"kernel": dense_kernel(sd[f"{prefix}mlp.2.weight"]), "bias": _np(sd[f"{prefix}mlp.2.bias"])}
    params["Dense_2"] = {"kernel": dense_kernel(sd[f"{prefix}mlp.4.weight"]), "bias": _np(sd[f"{prefix}mlp.4.bias"])}
    return params, stats


# ---------------------------------------------------------------------------
# Whole solvers
# ---------------------------------------------------------------------------


def convert_unrolled_admm_gaussian_state_dict(sd: Mapping) -> dict:
    """Reference UnrolledADMMGaussian (flagship) state_dict -> flax variables
    for :class:`~galaxy_deconv_tpu.models.UnrolledADMMGaussian`.

    Reference attribute layout (models/unrolled_admm_gaussian.py:96-109):
    ``init`` = SubNet, ``Z.net`` = ResUNet(nc=[32,64,128,256]); the X update
    has no parameters.
    """
    sub_p, sub_s = convert_subnet_state_dict(sd, prefix="init.")
    return {
        "params": {"SubNet_0": sub_p, "ResUNet_0": convert_resunet_state_dict(sd, prefix="Z.net.")},
        "batch_stats": {"SubNet_0": sub_s},
    }


def convert_unrolled_admm_state_dict(sd: Mapping, denoiser: str = "ResUNet") -> dict:
    """Reference (Poisson/Gaussian two-dual) Unrolled_ADMM state_dict ->
    flax variables for :class:`~galaxy_deconv_tpu.models.UnrolledADMM`
    (reference models/Unrolled_ADMM.py:153-175: ``init`` = SubNet with 2n
    outputs, ``Z.net`` = ResUNet(nc=[64,128,256,512]) or XDenseUNet)."""
    sub_p, sub_s = convert_subnet_state_dict(sd, prefix="init.")
    params: dict = {"SubNet_0": sub_p}
    stats: dict = {"SubNet_0": sub_s}
    if denoiser == "ResUNet":
        params["ResUNet_0"] = convert_resunet_state_dict(sd, prefix="Z.net.")
    else:
        d_p, d_s = convert_xdense_state_dict(sd, prefix="Z.net.")
        params["XDenseUNet_0"] = d_p
        stats["XDenseUNet_0"] = d_s
    return {"params": params, "batch_stats": stats}


def convert_admmnet_state_dict(sd: Mapping, denoiser: str = "ResUNet") -> dict:
    """Reference ADMMNet state_dict -> flax variables for
    :class:`~galaxy_deconv_tpu.models.ADMMNet` (reference models/ADMMNet.py:
    78-96: the only parameters are the frozen denoiser under ``Z.net``)."""
    if denoiser == "ResUNet":
        return {"params": {"ResUNet_0": convert_resunet_state_dict(sd, prefix="Z.net.")}}
    d_p, d_s = convert_xdense_state_dict(sd, prefix="Z.net.")
    return {"params": {"XDenseUNet_0": d_p}, "batch_stats": {"XDenseUNet_0": d_s}}


def load_reference_tikhonet(pth_path: str) -> dict:
    """Load a reference Tikhonet/ShapeNet .pth checkpoint as flax variables."""
    import torch  # migration-only dependency

    sd = torch.load(pth_path, map_location="cpu")
    return convert_tikhonet_state_dict(sd)
