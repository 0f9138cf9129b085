"""Regenerate all benchmark figures from results_tpu/.

The library equivalents of the reference's figure notebooks
(figures/error_snr.ipynb, error_time.ipynb, psf_error.ipynb,
grid_plot.ipynb, analysis.ipynb):

  figures/error_snr.png        median ellipticity error vs SNR
  figures/error_time.png       accuracy-vs-speed scatter
  figures/psf_shear_error.png  robustness to PSF shear systematics
  figures/psf_fwhm_error.png   robustness to PSF FWHM systematics
  figures/gallery.png          obs / reconstruction / gt stamp gallery
  figures/admm_trace.png       per-iteration x/z estimates + rho schedule

Usage: python scripts/make_figures.py [--result results_tpu] [--out figures]
       [--cpu] [--skip_model]  (gallery/trace need a dataset + checkpoint)
"""

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--result", default="results_tpu")
    parser.add_argument("--out", default="figures")
    parser.add_argument("--data", default="datasets/LSST_23.5_deconv_tpu")
    parser.add_argument("--ckpt", default="trained")
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--skip_model", action="store_true",
                        help="results-only figures (no dataset/checkpoint needed)")
    parser.add_argument("--snr", type=int, default=100)
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from galaxy_deconv_tpu.analysis import (
        plot_error_vs_snr,
        plot_error_vs_time,
        plot_psf_error,
    )

    out = pathlib.Path(args.out)
    out.mkdir(exist_ok=True)
    result = pathlib.Path(args.result)
    from galaxy_deconv_tpu.eval import DEFAULT_PSF_ERRS as errs

    methods = sorted(p.name for p in result.iterdir() if (p / "results.json").exists())

    plot_error_vs_snr(result, methods, save_to=out / "error_snr.png")
    plot_error_vs_time(result, methods, snr=args.snr, save_to=out / "error_time.png")
    for kind in ("shear", "fwhm"):
        robust = [m for m in methods if (result / m / f"results_psf_{kind}_err.json").exists()]
        if robust:
            plot_psf_error(result, robust, errs, kind=kind, save_to=out / f"psf_{kind}_error.png")
    print(f"results figures -> {out}")

    if args.skip_model:
        return

    import jax.numpy as jnp
    import numpy as np

    from galaxy_deconv_tpu.analysis import plot_admm_trace, plot_reconstruction_grid
    from galaxy_deconv_tpu.data import GalaxyDataset
    from galaxy_deconv_tpu.models import build_model
    from galaxy_deconv_tpu.train.checkpoint import latest_epoch, restore_checkpoint, unpack_variables

    name = "Gaussian_PnP_ADMM_8iters_MultiScale"
    ep = latest_epoch(args.ckpt, name)
    if not ep or not pathlib.Path(args.data).exists():
        print("no checkpoint/dataset — skipping gallery + trace figures")
        return
    variables = unpack_variables(restore_checkpoint(args.ckpt, name, ep))

    ds = GalaxyDataset(args.data, "test", obs_variant=f"obs_{args.snr}")
    b = ds.batch(np.arange(6))
    obs, psf = jnp.asarray(b["obs"]), jnp.asarray(b["psf"])
    alpha = jnp.asarray(b["alpha"])

    # one analysis-mode run supplies both figures: the final-iteration z IS
    # the model output (unrolled_admm_gaussian returns z_list[-1])
    traced = build_model("Unrolled_ADMM_Gaussian(8)", analysis=True)
    traces = traced.apply(variables, obs, psf, alpha)
    rec = traces["z"][:, -1]
    plot_reconstruction_grid(
        {"observed": np.asarray(obs), "ADMM(8)": np.asarray(rec), "ground truth": b["gt"]},
        save_to=out / "gallery.png",
    )
    plot_admm_trace(traces, sample=0, save_to=out / "admm_trace.png")
    print(f"model figures -> {out}")


if __name__ == "__main__":
    main()
