"""Cross-estimator consistency check: FPFS vs adaptive moments (VERDICT r4 weak #6).

`metrics/shear.py` (the linear-FPFS estimator) is fingerprint-validated
per cell against the reference's committed real-fpfs outputs; the
HSM-family `metrics/adaptive_moments.py` (the ngmix stand-in) had only
its own metamorphic tests.  This anchors it the other way: measure the
SAME images — benchmark gt and obs at several SNRs, plus Richardson-
Lucy(30) reconstructions — with both estimators and compare

  * the per-galaxy |g| estimates (correlation + median abs difference),
  * the derived benchmark statistic (median ellipticity error vs the
    same-estimator gt), i.e. does the science conclusion survive an
    estimator swap (the classic weak-lensing systematics test).

The two algorithms measure *different* ellipticity definitions (FPFS
shapelet ratio vs second-moment ellipticity), so pointwise equality is
not expected — monotone agreement and a consistent method ranking are.

Usage: python scripts/cross_estimator.py [--n_gal 1000]  (CPU-forced)
Writes figures/cross_estimator.json.
"""

import argparse
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_gal", type=int, default=1000)
    ap.add_argument("--data", default="datasets/LSST_23.5_deconv_tpu_10k")
    ap.add_argument("--snrs", type=int, nargs="+", default=[20, 100, 200])
    ap.add_argument("--out", default="figures/cross_estimator.json")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from galaxy_deconv_tpu.metrics import estimate_shear
    from galaxy_deconv_tpu.metrics.adaptive_moments import estimate_shear_adaptive
    from galaxy_deconv_tpu.models import build_model

    root = pathlib.Path(args.data)
    N = args.n_gal

    rl = build_model("Richard-Lucy(30)")
    v = rl.init(jax.random.PRNGKey(0), jnp.zeros((1, 48, 48)), jnp.zeros((1, 48, 48)), jnp.ones((1,)))
    psf = np.asarray(np.load(root / "test/psf.npy", mmap_mode="r")[:N], np.float32)

    report = {"n_gal": N, "snrs": {}}
    for snr in args.snrs:
        gt = np.asarray(np.load(root / f"test/gt_{snr}.npy", mmap_mode="r")[:N], np.float32)
        obs = np.asarray(np.load(root / f"test/obs_{snr}.npy", mmap_mode="r")[:N], np.float32)
        rec = np.asarray(rl.apply(v, jnp.asarray(obs), jnp.asarray(psf),
                                  jnp.asarray(obs.mean(axis=(-2, -1)))))
        row = {}
        for label, imgs in (("gt", gt), ("obs", obs), ("rl30", rec)):
            f = np.asarray(estimate_shear(jnp.asarray(imgs)))
            a = np.asarray(estimate_shear_adaptive(jnp.asarray(imgs)))
            ok = np.isfinite(f[:, 2]) & np.isfinite(a[:, 2])
            row[label] = {
                "corr_g": float(np.corrcoef(f[ok, 2], a[ok, 2])[0, 1]),
                "corr_g1": float(np.corrcoef(f[ok, 0], a[ok, 0])[0, 1]),
                "med_abs_diff_g": float(np.median(np.abs(f[ok, 2] - a[ok, 2]))),
                "fpfs_med_g": float(np.median(f[ok, 2])),
                "adaptive_med_g": float(np.median(a[ok, 2])),
                "n_finite": int(ok.sum()),
            }
        # benchmark statistic under each estimator: median |g_rec - g_gt|
        for est_name, est in (("fpfs", lambda x: estimate_shear(jnp.asarray(x))),
                              ("adaptive", lambda x: estimate_shear_adaptive(jnp.asarray(x)))):
            gg = np.asarray(est(gt))[:, 2]
            for label, imgs in (("obs_err", obs), ("rl30_err", rec)):
                rg = np.asarray(est(imgs))[:, 2]
                ok = np.isfinite(gg) & np.isfinite(rg)
                row[f"{label}_{est_name}"] = float(np.median(np.minimum(np.abs(rg - gg), 1)[ok]))
        report["snrs"][str(snr)] = row
        print(f"SNR {snr}: gt corr={row['gt']['corr_g']:.3f}  rl30 corr={row['rl30']['corr_g']:.3f}  "
              f"err(rl30) fpfs={row['rl30_err_fpfs']:.4f} adaptive={row['rl30_err_adaptive']:.4f}  "
              f"err(obs) fpfs={row['obs_err_fpfs']:.4f} adaptive={row['obs_err_adaptive']:.4f}", flush=True)

    out = pathlib.Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(report, indent=1))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
