"""Root-cause the round-3 low-SNR classical-method fingerprint divergence.

Round 3 closed with Richardson-Lucy(30) at SNR 20 scoring 0.5867 here vs
the reference's committed 0.1461 (results_200/Richard-Lucy(30)/
results.json), a non-monotonic FPFS column, and an 8-config population
sweep (figures/population_sweep.json) in which *no* morphology knob moved
the fingerprint distance — the round-4 mandate (VERDICT.md #1) was a
diagnose_wiener-style decomposition naming the property that drives the
gap.

This script runs the three-step decomposition that found it:

1. **Image-swap 2x2** — the reference's shipped COSMOS galaxy + GalSim
   PSF fixture (/root/reference/tutorials/{gt,psf}.pth) rescaled to exact
   SNR 20 through the same conv+noise construction as our galaxies, in
   all four {galaxy} x {PSF} combinations.  Result: the reference's own
   images blow up *worse* than ours through our round-3 estimator
   (median error 1.0 vs 0.48) — the simulated population and PSFs were
   never the cause, which is why the population sweep came up empty.
2. **Estimator swap** — the same RL(30) reconstructions measured with
   (a) the round-3 estimator (FPFS *power-function* moments, Li et al.
   2018: shapelet moments of |F_gal|^2/|F_psf|^2) and (b) a linear FPFS
   estimator (Li & Mandelbaum 2022, the algorithm of the fpfs 3.0.2
   package the reference pins: the same shapelet moments applied to the
   *deconvolved Fourier transform* F_gal/F_psf, with the package's klim
   band limit).  Result: the linear estimator reproduces the reference's
   committed per-method |g_rec| distributions and errors at every SNR
   (RL(30)@20: med |g| 0.32 vs ref 0.32, err 0.16 vs ref 0.146;
   FPFS@100: 0.180/0.43/0.037 vs ref 0.185/0.42/0.039).
3. **Mechanism** — power-function moments rectify noise: E|F_n|^2 > 0
   adds a positive pedestal to every moment, so M00 inflates (shrinking
   e for the PSF-deconvolved FPFS baseline — the collapsed |g|~0.05
   column at SNR 20) while RL's amplified noise adds anisotropic power
   faster than M00 grows (R1E -> 0, |g| -> 4+ tails).  Linear moments
   are zero-mean in the noise: estimates scatter but do not blow up.

Conclusion: the fingerprint gap was a **measurement-layer** parity bug,
fixed by rewriting metrics/shear.py as the linear estimator (one-line
core change in the half-spectrum algebra: D = Re(F_gal/F_psf) instead of
|F_gal|^2/|F_psf|^2, plus the fpfs klim cut).  See RESULTS.md
"Shear-metric validation".

Usage: python scripts/diagnose_rl.py [--n_gal 200] [--out figures/rl_diagnosis.json]
(CPU-forced; runs in ~1 min.)
"""

import argparse
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def power_fpfs(imgs, psf=None, sigma_arcsec=0.6, pix_scale=0.2, const=1.0):
    """The round-3 estimator: FPFS *power-function* moments (frozen here
    as the diagnostic's point of comparison after metrics/shear.py moved
    to the linear algorithm)."""
    import numpy as np

    B, H, W = imgs.shape
    imgs = imgs - imgs.min(axis=(1, 2), keepdims=True)
    D = np.abs(np.fft.fft2(imgs)) ** 2
    if psf is not None:
        P = np.abs(np.fft.fft2(psf)) ** 2
        P = np.maximum(P, 1e-12 * P.max(axis=(-2, -1), keepdims=True))
        D = D / P
    ky = 2 * np.pi * np.fft.fftfreq(H, d=pix_scale)
    kx = 2 * np.pi * np.fft.fftfreq(W, d=pix_scale)
    KY, KX = np.meshgrid(ky, kx, indexing="ij")
    x = (KY**2 + KX**2) * sigma_arcsec**2
    phi = np.arctan2(KX, KY)
    w = np.exp(-x / 2)
    n = 1.0 / (H * W)
    m00 = (D * w).sum(axis=(1, 2)) * n
    m22 = (D * (x / np.sqrt(2)) * w * np.exp(-2j * phi)).sum(axis=(1, 2)) * n
    m40 = (D * ((x**2 - 4 * x + 2) / 2) * w).sum(axis=(1, 2)) * n
    denom = m00 + const
    e1, e2 = m22.real / denom, m22.imag / denom
    s0, s4 = m00 / denom, m40 / denom
    r1e = (s0 - s4) / np.sqrt(2) + np.sqrt(2) * e1 * e1
    g1, g2 = e1 / r1e, e2 / r1e
    return np.stack([g1, g2, np.hypot(g1, g2)], axis=-1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_gal", type=int, default=200)
    ap.add_argument("--data", default="datasets/LSST_23.5_deconv_tpu_10k")
    ap.add_argument("--out", default="figures/rl_diagnosis.json")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    import torch

    from galaxy_deconv_tpu.data.simulate import noise_sigma
    from galaxy_deconv_tpu.metrics import estimate_shear  # linear (post-fix)
    from galaxy_deconv_tpu.models import build_model

    sigma = noise_sigma()
    N = args.n_gal
    root = pathlib.Path(args.data)

    gt_ref = torch.load("/root/reference/tutorials/gt.pth", weights_only=False).numpy().astype(np.float64)
    psf_ref = torch.load("/root/reference/tutorials/psf.pth", weights_only=False).numpy().astype(np.float64)
    gt20_ref = gt_ref * (20.0 * sigma / np.sqrt((gt_ref**2).sum()))
    our_gt = np.asarray(np.load(root / "test/gt_20.npy", mmap_mode="r")[:N], np.float64)
    our_psf = np.asarray(np.load(root / "test/psf.npy", mmap_mode="r")[:N], np.float64)
    our_obs = np.asarray(np.load(root / "test/obs_20.npy", mmap_mode="r")[:N], np.float64)

    def circconv_unit(gt, psf):
        k = np.fft.ifftshift(psf / psf.sum(axis=(-2, -1), keepdims=True), axes=(-2, -1))
        return np.real(np.fft.ifft2(np.fft.fft2(k) * np.fft.fft2(gt)))

    model = build_model("Richard-Lucy(30)")
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 48, 48)), jnp.zeros((1, 48, 48)), jnp.ones((1,)))

    def rl(obs, psf):
        return np.asarray(
            model.apply(v, jnp.asarray(obs, jnp.float32), jnp.asarray(psf, jnp.float32), jnp.ones((obs.shape[0],)))
        )

    def linear(imgs, psf=None):
        if psf is None:
            return np.asarray(estimate_shear(jnp.asarray(imgs, jnp.float32)))
        return np.asarray(
            estimate_shear(jnp.asarray(imgs, jnp.float32), jnp.asarray(psf, jnp.float32), deconv_psf=True)
        )

    rng = np.random.default_rng(7)
    report = {"sigma": sigma, "n_gal": N, "cells": {}}

    def cell(name, gts, psfs, estimator):
        conv = circconv_unit(gts, psfs)
        obs = np.maximum(conv, 0) + sigma * rng.standard_normal(conv.shape)
        rec = rl(obs, psfs)
        g = estimator(rec)
        gtg = estimator(gts)
        err = np.minimum(np.abs(g[:, 2] - gtg[:, 2]), 1)
        row = {
            "g_med": float(np.median(g[:, 2])),
            "g_p90": float(np.percentile(g[:, 2], 90)),
            "err_med": float(np.median(err)),
        }
        report["cells"][name] = row
        print(f"{name:44s} |g| med={row['g_med']:.3f} p90={row['g_p90']:.3f} err={row['err_med']:.4f}")

    print("--- step 1: image-swap 2x2 at SNR 20, round-3 POWER estimator ---")
    rep = lambda a: np.repeat(a[None], N, 0)
    cell("power: ref gal x ref psf", rep(gt20_ref), rep(psf_ref), power_fpfs)
    cell("power: ref gal x our psfs", rep(gt20_ref), our_psf, power_fpfs)
    cell("power: our gals x ref psf", our_gt, rep(psf_ref), power_fpfs)
    cell("power: our gals x our psfs", our_gt, our_psf, power_fpfs)

    print("--- step 2: same cells, LINEAR (fpfs 3.0.2) estimator ---")
    cell("linear: ref gal x ref psf", rep(gt20_ref), rep(psf_ref), linear)
    cell("linear: our gals x our psfs", our_gt, our_psf, linear)

    print("--- step 3: pipeline-true obs_20, both estimators ---")
    rec = rl(our_obs, our_psf)
    for name, est in (("power", power_fpfs), ("linear", linear)):
        g, gtg = est(rec), est(our_gt)
        err = np.minimum(np.abs(g[:, 2] - gtg[:, 2]), 1)
        row = {"g_med": float(np.median(g[:, 2])), "g_p90": float(np.percentile(g[:, 2], 90)),
               "err_med": float(np.median(err))}
        report["cells"][f"stored_obs20_{name}"] = row
        print(f"stored obs_20 RL(30), {name:6s} estimator:      "
              f"|g| med={row['g_med']:.3f} p90={row['g_p90']:.3f} err={row['err_med']:.4f}")
    print("reference committed RL(30)@20 (results_200):  |g| med=0.324 p90=0.818 err=0.1461")

    out = pathlib.Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(report, indent=1))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
