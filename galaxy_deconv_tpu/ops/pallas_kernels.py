"""Pallas TPU kernels for the hot pointwise stages.

The ADMM x-update chain is FFTs (XLA's TPU FFT, already fast) surrounding a
pointwise complex solve ``X = (conj(H) Y + Z) / (rho + |H|^2)``.  The
spectra are tiny — (2H, W+1) = (96, 49) per galaxy — which is hostile to
the (8, 128) f32 tile: a batch-first layout leaves 79 of 128 lanes masked.

The TPU-native fix implemented here is a **batch-last (structure-of-arrays)
layout**: spectra are viewed as (96*49, B) planes so the galaxy batch fills
the 128-wide lane dimension exactly, and the whole update is one
VMEM-resident elementwise kernel over (8, 128) tiles — one HBM read per
operand, one write, zero intermediate traffic.

**Status: documented negative result — not wired into any model path.**
Measured on v5e (scripts/bench_pallas.py, RESULTS.md throughput table),
the kernel *loses* to XLA's own fusion of the same pointwise chain
(0.036 ms vs 0.031 ms): XLA already emits a single fused elementwise
loop here, so the hand-written kernel only adds the batch-last
transposes.  The solver's former ``use_pallas`` flag was removed in
round 5; the spectral round-trips were instead moved onto the MXU as
fused DFT matmuls (ops/dft.py), which obsoletes this kernel's layout
premise entirely.  The kernel and its tests (interpret mode, CPU) are
kept as the evidence base for that decision.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def x_update_spectral(Yr, Yi, Hr, Hi, Zr, Zi, HtH, rho):
    """jnp reference: (conj(H) * Y + Z) / (rho + HtH), split real/imag.

    All arrays (..., N) broadcastable; rho broadcasts.
    conj(H)*Y = (Hr*Yr + Hi*Yi) + i(Hr*Yi - Hi*Yr).
    """
    denom = rho + HtH
    xr = (Hr * Yr + Hi * Yi + Zr) / denom
    xi = (Hr * Yi - Hi * Yr + Zi) / denom
    return xr, xi


def _solve_kernel(yr, yi, hr, hi, zr, zi, hth, rho, out_r, out_i):
    denom = rho[:] + hth[:]
    recip = 1.0 / denom
    out_r[:] = (hr[:] * yr[:] + hi[:] * yi[:] + zr[:]) * recip
    out_i[:] = (hr[:] * yi[:] - hi[:] * yr[:] + zi[:]) * recip


@functools.partial(jax.jit, static_argnames=("interpret",))
def x_update_spectral_pallas(Yr, Yi, Hr, Hi, Zr, Zi, HtH, rho, interpret: bool = False):
    """Fused elementwise solve on batch-last planes.

    Inputs: (K, B) float32 with K = flattened spectral grid and B the galaxy
    batch (lane axis); ``rho`` is (1, B) broadcast over K via an index_map
    that pins its K-block to 0.
    """
    K, B = Yr.shape
    blk_k = 8
    blk_b = 128

    grid = (pl.cdiv(K, blk_k), pl.cdiv(B, blk_b))
    spec = pl.BlockSpec((blk_k, blk_b), lambda i, j: (i, j), memory_space=pltpu.VMEM)
    rho_spec = pl.BlockSpec((1, blk_b), lambda i, j: (0, j), memory_space=pltpu.VMEM)

    out_shape = [
        jax.ShapeDtypeStruct((K, B), jnp.float32),
        jax.ShapeDtypeStruct((K, B), jnp.float32),
    ]
    return pl.pallas_call(
        _solve_kernel,
        grid=grid,
        in_specs=[spec, spec, spec, spec, spec, spec, spec, rho_spec],
        out_specs=[spec, spec],
        out_shape=out_shape,
        interpret=interpret,
    )(Yr, Yi, Hr, Hi, Zr, Zi, HtH, rho)


def x_update_batch_last(Y, Ht, HtH, z, u, rho, shape, interpret: bool = False):
    """Drop-in x-update (models.unrolled_admm_gaussian.x_update semantics)
    routing the pointwise solve through the Pallas kernel.

    Y, Ht: (B, 2H, W+1) complex64; HtH: (B, 2H, W+1) f32; z, u: (B, H, W);
    rho: (B, 1, 1).  Returns (B, H, W).
    """
    from galaxy_deconv_tpu.ops import fourier

    B = Y.shape[0]
    K = Y.shape[1] * Y.shape[2]
    Zs = fourier.rfft2(fourier.ifftshift2(fourier.pad_double(rho * z - u)))

    def plane(a):
        return jnp.transpose(a.reshape(B, K), (1, 0)).astype(jnp.float32)

    # conj(H): Ht is already conj(H); pass its real/imag directly with the
    # kernel's (Hr, Hi) meaning re/im of conj(H) -> flip the formula sign by
    # passing Hi = -imag(conj(H))? No: kernel computes conj(h)*y from (hr, hi)
    # of h itself, so hand it H = conj(Ht).
    Hr, Hi = plane(jnp.real(Ht)), plane(-jnp.imag(Ht))
    xr, xi = x_update_spectral_pallas(
        plane(jnp.real(Y)),
        plane(jnp.imag(Y)),
        Hr,
        Hi,
        plane(jnp.real(Zs)),
        plane(jnp.imag(Zs)),
        plane(HtH * jnp.ones_like(jnp.real(Y))),
        jnp.broadcast_to(rho.reshape(1, B), (1, B)).astype(jnp.float32),
        interpret=interpret,
    )
    spec = (xr.T + 1j * xi.T).reshape(B, Y.shape[1], Y.shape[2])
    x = fourier.fftshift2(fourier.irfft2(spec, shape))
    return fourier.crop_half(x)
