"""The Tikhonet-transplant image-swap experiment (round-4 VERDICT #2/#3).

The transplanted reference ``Tikhonet_Laplacian_50epochs.pth`` checkpoint
scores 0.1043 at SNR 20 on our benchmark vs its committed reference
profile of 0.0723 (results_200/Tikhonet_Laplacian/results.json) — the one
transplant far off its reference numbers, previously explained only by an
off-distribution plausibility argument.  This runs the decisive test the
round-4 RL diagnosis established (scripts/diagnose_rl.py): push the
reference's OWN shipped pixels (/root/reference/tutorials/{gt,psf,obs}.pth
— a real COSMOS galaxy drawn through GalSim) through the transplanted
model and see whether it scores reference-like there.

Cells (per SNR in {20, 100, 200}, N noise realizations of each pixel set):

  ref gal x ref psf   - reference pixels end-to-end
  our gals x our psfs - the benchmark population (matches results_tpu row)
  [control] same two cells through the transplanted ShapeNet, the
  transplant that DOES reproduce its reference profile (0.0752 vs 0.0766
  at SNR 20) — if ShapeNet moves with population and Tikhonet does not,
  the gap is a conversion defect, not population.

Plus a point check: the shipped obs.pth itself (the reference's exact
observed stamp, no re-noising) through the transplant.

Interpretation: if the Tikhonet error on reference pixels drops to the
committed-profile level while our-population cells stay high, the 0.104-
vs-0.072 gap is POPULATION (the parametric benchmark morphology is
further off-distribution for this checkpoint); if it stays high on
reference pixels too, the transplant/conversion is defective.

Caveat recorded in the output: the reference ships ONE fixture galaxy, so
the "ref pixels" cells measure noise-realization scatter of a single
morphology, not a population median.

Usage: python scripts/diagnose_tikhonet.py [--n_gal 500]  (CPU-forced)
"""

import argparse
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_gal", type=int, default=500)
    ap.add_argument("--data", default="datasets/LSST_23.5_deconv_tpu_10k")
    ap.add_argument("--snrs", type=int, nargs="+", default=[20, 100, 200])
    ap.add_argument("--out", default="figures/tikhonet_diagnosis.json")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    import torch

    from galaxy_deconv_tpu.data.simulate import noise_sigma
    from galaxy_deconv_tpu.metrics import estimate_shear
    from galaxy_deconv_tpu.models import build_model
    from galaxy_deconv_tpu.utils import load_reference_tikhonet

    sigma = noise_sigma()
    N = args.n_gal
    root = pathlib.Path(args.data)
    rng = np.random.default_rng(11)

    gt_ref = torch.load("/root/reference/tutorials/gt.pth", weights_only=False).numpy().astype(np.float64)
    psf_ref = torch.load("/root/reference/tutorials/psf.pth", weights_only=False).numpy().astype(np.float64)
    obs_ref = torch.load("/root/reference/tutorials/obs.pth", weights_only=False).numpy().astype(np.float64)

    models = {}
    for label, fname, build in (
        ("Tikhonet_Laplacian", "Tikhonet_Laplacian_50epochs.pth", "Tikhonet_Laplacian"),
        ("ShapeNet", "ShapeNet_Laplacian_50epochs.pth", "ShapeNet"),
    ):
        pth = pathlib.Path("/root/reference/saved_models") / fname
        model = build_model(build)
        variables = load_reference_tikhonet(str(pth))
        models[label] = (model, variables)

    def run(label, obs, psf):
        model, variables = models[label]
        return np.asarray(
            model.apply(variables, jnp.asarray(obs, jnp.float32), jnp.asarray(psf, jnp.float32),
                        jnp.asarray(obs.mean(axis=(-2, -1)), jnp.float32))
        )

    def shear(imgs):
        return np.asarray(estimate_shear(jnp.asarray(imgs, jnp.float32)))

    def circconv_unit(gt, psf):
        k = np.fft.ifftshift(psf / psf.sum(axis=(-2, -1), keepdims=True), axes=(-2, -1))
        return np.real(np.fft.ifft2(np.fft.fft2(k) * np.fft.fft2(gt)))

    report = {"sigma": sigma, "n_gal": N, "caveat": "single reference fixture galaxy", "cells": {}}

    def cell(name, label, gts, psfs, snr):
        # rescale gt flux to the target SNR exactly as the dataset
        # construction does (alpha = snr * sigma / ||gal||_2)
        gts = gts * (snr * sigma / np.sqrt((gts**2).sum(axis=(-2, -1), keepdims=True)))
        conv = circconv_unit(gts, psfs)
        obs = np.maximum(conv, 0) + sigma * rng.standard_normal(conv.shape)
        rec = run(label, obs, psfs)
        g, gtg = shear(rec), shear(gts)
        err = np.minimum(np.abs(g[:, 2] - gtg[:, 2]), 1)
        row = {"err_med": float(np.median(err)), "g_med": float(np.median(g[:, 2])),
               "gt_g_med": float(np.median(gtg[:, 2]))}
        report["cells"][name] = row
        print(f"{name:52s} err_med={row['err_med']:.4f}  |g| med={row['g_med']:.3f}")

    rep = lambda a: np.repeat(a[None], N, 0)
    for snr in args.snrs:
        our_gt = np.asarray(np.load(root / f"test/gt_{snr}.npy", mmap_mode="r")[:N], np.float64)
        our_psf = np.asarray(np.load(root / "test/psf.npy", mmap_mode="r")[:N], np.float64)
        for label in ("Tikhonet_Laplacian", "ShapeNet"):
            cell(f"{label}: ref gal x ref psf @ {snr}", label, rep(gt_ref), rep(psf_ref), snr)
            cell(f"{label}: our gals x our psfs @ {snr}", label, our_gt, our_psf, snr)

    # point check: the exact shipped observed stamp (no re-noising)
    for label in ("Tikhonet_Laplacian", "ShapeNet"):
        rec = run(label, obs_ref[None], psf_ref[None])
        g = shear(rec)[0]
        gtg = shear(gt_ref[None])[0]
        report["cells"][f"{label}: shipped obs.pth point check"] = {
            "g": [float(v) for v in g], "gt_g": [float(v) for v in gtg],
            "err": float(min(abs(g[2] - gtg[2]), 1)),
        }
        print(f"{label}: shipped obs.pth  |g|={g[2]:.4f} vs gt {gtg[2]:.4f}  err={report['cells'][f'{label}: shipped obs.pth point check']['err']:.4f}")

    print("reference committed Tikhonet_Laplacian err med: 0.0723 @20 / 0.0289 @100 / 0.0213 @200")
    print("our benchmark row (results_tpu):               0.1043 @20 /    -    / 0.0355 @200")

    out = pathlib.Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(report, indent=1))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
