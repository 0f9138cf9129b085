"""Run the full benchmark method matrix and write results + RESULTS.md.

Mirrors the reference's test.py method matrix on the framework's own
simulated LSST benchmark: classical baselines, the transplanted
reference Tikhonet checkpoint, and this framework's trained ADMM models.

Usage: python scripts/run_benchmark.py [--data datasets/LSST_23.5_deconv_tpu]
         [--result results_tpu] [--n_gal 1000] [--admm_ckpt saved_models_online]
"""

import argparse
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data", default="datasets/LSST_23.5_deconv_tpu")
    parser.add_argument("--result", default="results_tpu")
    parser.add_argument("--n_gal", type=int, default=1000)
    parser.add_argument("--batch", type=int, default=250)
    parser.add_argument("--admm_ckpt", default="saved_models_online")
    parser.add_argument("--admm_name", default="Gaussian_PnP_ADMM_8iters_MultiScale")
    parser.add_argument("--admm_epoch", type=int, default=0, help="0 = latest")
    parser.add_argument("--skip_time", action="store_true")
    parser.add_argument("--skip_psf", action="store_true")
    args = parser.parse_args()

    import logging

    logging.basicConfig(level=logging.INFO)

    from galaxy_deconv_tpu.analysis import summarize_results
    from galaxy_deconv_tpu.eval import run_psf_error_test, run_shear_test, run_time_test
    from galaxy_deconv_tpu.train.checkpoint import latest_epoch, restore_checkpoint

    snrs = (20, 40, 60, 80, 100, 150, 200)
    methods: dict[str, dict] = {
        "No_Deconv": {},
        "FPFS": {},
        "Wiener": {},
        "Richard-Lucy(10)": {},
        "Richard-Lucy(20)": {},
        "Richard-Lucy(30)": {},
        "Richard-Lucy(50)": {},
        "Richard-Lucy(100)": {},
    }

    # transplanted reference Tikhonet (capability: checkpoint migration)
    ref_pth = pathlib.Path("/root/reference/saved_models/Tikhonet_Laplacian_50epochs.pth")
    if ref_pth.exists():
        from galaxy_deconv_tpu.utils import load_reference_tikhonet

        methods["Tikhonet_Laplacian"] = {"variables": load_reference_tikhonet(str(ref_pth))}

    # this framework's trained flagship
    ep = args.admm_epoch or latest_epoch(args.admm_ckpt, args.admm_name)
    if ep:
        state = restore_checkpoint(args.admm_ckpt, args.admm_name, ep)
        params = state["params"] if isinstance(state, dict) else state.params
        stats = state["batch_stats"] if isinstance(state, dict) else state.batch_stats
        methods["Unrolled_ADMM_Gaussian(8)"] = {
            "variables": {"params": params, "batch_stats": stats},
        }
        print(f"loaded trained ADMM(8) from step {ep}")

    for method, kw in methods.items():
        run_shear_test(method, args.data, args.result, snrs=snrs, n_gal=args.n_gal,
                       batch_size=args.batch, **kw)
        if not args.skip_time:
            run_time_test(method, args.data, args.result, n_gal=args.n_gal,
                          batch_size=args.batch, warmup=1, **kw)

    if not args.skip_psf:
        errs = (0.003, 0.005, 0.01, 0.02, 0.03, 0.05, 0.07, 0.1, 0.15, 0.2)
        for method in ("Richard-Lucy(30)", "Unrolled_ADMM_Gaussian(8)", "Tikhonet_Laplacian"):
            if method in methods:
                for kind in ("shear", "fwhm"):
                    run_psf_error_test(method, args.data, args.result, errs=errs, kind=kind,
                                       n_gal=args.n_gal, batch_size=args.batch,
                                       **methods[method])

    table = summarize_results(args.result, list(methods), snrs)
    out = pathlib.Path("RESULTS.md")
    header = (
        "# RESULTS — TPU framework benchmark\n\n"
        f"Simulated LSST benchmark (JAX-native pipeline), {args.n_gal} test galaxies/SNR,\n"
        "median ellipticity error = median min(|g_rec - g_gt|, 1) on the |g| component\n"
        "(gt_shear measured on noiseless gt stamps, same estimator).  Timing is the\n"
        "full batched deconvolve+measure pipeline per galaxy on one TPU v5e chip.\n\n"
    )
    out.write_text(header + table + "\n\nReference baselines: see BASELINE.md.\n")
    print(table)
    print("wrote RESULTS.md")


if __name__ == "__main__":
    main()
