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
    methods = sorted(p.name for p in result.iterdir() if (p / "results.json").exists())
    errs = (0.003, 0.005, 0.01, 0.02, 0.03, 0.05, 0.07, 0.1, 0.15, 0.2)

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
    from galaxy_deconv_tpu.models import UnrolledADMMGaussian
    from galaxy_deconv_tpu.train.checkpoint import latest_epoch, restore_checkpoint

    name = "Gaussian_PnP_ADMM_8iters_MultiScale"
    ep = latest_epoch(args.ckpt, name)
    if not ep or not pathlib.Path(args.data).exists():
        print("no checkpoint/dataset — skipping gallery + trace figures")
        return
    st = restore_checkpoint(args.ckpt, name, ep)
    params = st["params"] if isinstance(st, dict) else st.params
    stats = st.get("batch_stats") if isinstance(st, dict) else st.batch_stats
    variables = {"params": params, "batch_stats": stats} if stats else {"params": params}

    ds = GalaxyDataset(args.data, "test", obs_variant=f"obs_{args.snr}")
    b = ds.batch(np.arange(6))
    obs, psf = jnp.asarray(b["obs"]), jnp.asarray(b["psf"])
    alpha = jnp.asarray(b["alpha"])

    model = UnrolledADMMGaussian(n_iters=8, features=(32, 64, 128, 256))
    rec = model.apply(variables, obs, psf, alpha)
    plot_reconstruction_grid(
        {"observed": np.asarray(obs), "ADMM(8)": np.asarray(rec), "ground truth": b["gt"]},
        save_to=out / "gallery.png",
    )

    traced = UnrolledADMMGaussian(n_iters=8, features=(32, 64, 128, 256), analysis=True)
    traces = traced.apply(variables, obs, psf, alpha)
    plot_admm_trace(traces, sample=0, save_to=out / "admm_trace.png")
    print(f"model figures -> {out}")


if __name__ == "__main__":
    main()
