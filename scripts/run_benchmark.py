"""Run the full benchmark method matrix and write results + RESULTS.md.

Mirrors the reference's test.py method matrix on the framework's own
simulated LSST benchmark: classical baselines, the transplanted
reference Tikhonet checkpoint, and this framework's trained models
(auto-discovered from the checkpoint directory).

Usage: python scripts/run_benchmark.py [--data datasets/LSST_23.5_deconv_tpu]
         [--result results_tpu] [--n_gal 1000] [--ckpt saved_models_online]
"""

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

# result-dir name -> (registry build name, checkpoint run name)
TRAINED_SPECS = {
    "Unrolled_ADMM_Gaussian(8)": ("Unrolled_ADMM_Gaussian(8)", "Gaussian_PnP_ADMM_8iters_MultiScale"),
    # continuation training of the committed flagship (train_zoo --suffix _cont)
    "Unrolled_ADMM_Gaussian(8)_cont": ("Unrolled_ADMM_Gaussian(8)", "Gaussian_PnP_ADMM_8iters_MultiScale_cont"),
    "Unrolled_ADMM_Gaussian(4)": ("Unrolled_ADMM_Gaussian(4)", "Gaussian_PnP_ADMM_4iters_MultiScale"),
    "Unrolled_ADMM_Gaussian(2)": ("Unrolled_ADMM_Gaussian(2)", "Gaussian_PnP_ADMM_2iters_MultiScale"),
    "Tikhonet_Laplacian_tpu": ("Tikhonet_Laplacian", "Tikhonet_Laplacian_MultiScale"),
    "ShapeNet_tpu": ("ShapeNet", "ShapeNet_Laplacian"),
    # continuation of the Meyer-bank shape-constraint training (training-length
    # ablation for the ShapeNet_tpu vs transplanted-ShapeNet gap)
    "ShapeNet_tpu_cont": ("ShapeNet", "ShapeNet_Laplacian_cont"),
    # round-4 continuation toward the reference's ~2M-sample training
    # budget (VERDICT #6; scripts/round4_experiments.sh)
    "ShapeNet_tpu_2M": ("ShapeNet", "ShapeNet_Laplacian_2M"),
    "Unrolled_ADMM_Poisson(8)": ("Unrolled_ADMM(8)", "Poisson_PnP_ADMM_8iters_MultiScale"),
    # bounded-rho schedule variants (every unrolled iteration active;
    # models/unrolled_admm_gaussian.py rho_bounds)
    "Unrolled_ADMM_Gaussian(8)_bounded": ("Unrolled_ADMM_Gaussian_Bounded(8)",
                                          "Gaussian_PnP_ADMM_8iters_Bounded_MultiScale"),
    "Unrolled_ADMM_Gaussian(4)_bounded": ("Unrolled_ADMM_Gaussian_Bounded(4)",
                                          "Gaussian_PnP_ADMM_4iters_Bounded_MultiScale"),
    "Unrolled_ADMM_Gaussian(2)_bounded": ("Unrolled_ADMM_Gaussian_Bounded(2)",
                                          "Gaussian_PnP_ADMM_2iters_Bounded_MultiScale"),
    # reference-protocol runs: fixed 40k dataset, bs 32, constant lr,
    # best-val selection (scripts/reference_protocol.py — the round-3
    # iteration-separation hypothesis test)
    "Unrolled_ADMM_Gaussian(8)_refproto": ("Unrolled_ADMM_Gaussian(8)",
                                           "RefProto_Gaussian_PnP_ADMM_8iters_MultiScale"),
    "Unrolled_ADMM_Gaussian(4)_refproto": ("Unrolled_ADMM_Gaussian(4)",
                                           "RefProto_Gaussian_PnP_ADMM_4iters_MultiScale"),
    "Unrolled_ADMM_Gaussian(2)_refproto": ("Unrolled_ADMM_Gaussian(2)",
                                           "RefProto_Gaussian_PnP_ADMM_2iters_MultiScale"),
    # ShapeNet under the fixed-dataset reference protocol (round-5: the
    # regime-hypothesis test for the denoiser family, VERDICT weak #2)
    "ShapeNet_refproto": ("ShapeNet", "RefProto_ShapeNet_Laplacian_Shape"),
    # the loss-x-model training matrix (reference train.py:58-74; shipped
    # results/Unrolled_ADMM_Gaussian(8)_Shape and (4)_Shape)
    "Unrolled_ADMM_Gaussian(8)_Shape": ("Unrolled_ADMM_Gaussian(8)",
                                        "Gaussian_PnP_ADMM_8iters_Shape"),
    "Unrolled_ADMM_Gaussian(4)_Shape": ("Unrolled_ADMM_Gaussian(4)",
                                        "Gaussian_PnP_ADMM_4iters_Shape"),
    "Unrolled_ADMM_Gaussian(2)_MomentBased": ("Unrolled_ADMM_Gaussian(2)",
                                              "Gaussian_PnP_ADMM_2iters_MomentBased"),
    "Unrolled_ADMM_Gaussian(2)_BestEllipse": ("Unrolled_ADMM_Gaussian(2)",
                                              "Gaussian_PnP_ADMM_2iters_BestEllipse"),
}

# reference shipped checkpoints transplanted through the weight converter
# (capability: checkpoint migration; saved_models/*.pth)
REF_TRANSPLANTS = {
    "Tikhonet_Laplacian": ("Tikhonet_Laplacian", "Tikhonet_Laplacian_50epochs.pth"),
    "Tikhonet_Identity": ("Tikhonet", "Tikhonet_Identity_50epochs.pth"),
    "ShapeNet": ("ShapeNet", "ShapeNet_Laplacian_50epochs.pth"),
}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data", default="datasets/LSST_23.5_deconv_tpu")
    parser.add_argument("--psf_data", default=None,
                        help="dataset root for the perturbed-PSF robustness sweeps "
                             "(default: --data; the 10k main dataset ships without "
                             "PSF sets — see scripts/gen_cpu_datasets.sh)")
    parser.add_argument("--psf_n_gal", type=int, default=None,
                        help="galaxies for the PSF sweeps (default: --n_gal)")
    parser.add_argument("--psnr_n_gal", type=int, default=None,
                        help="galaxies for the PSNR sweep (default: --n_gal; the PSNR "
                             "median is stable well below the 10k shear-sweep size)")
    parser.add_argument("--result", default="results_tpu")
    parser.add_argument("--n_gal", type=int, default=1000)
    parser.add_argument("--batch", type=int, default=250)
    parser.add_argument("--ckpt", default="saved_models_online")
    parser.add_argument("--admm8_epoch", type=int, default=0, help="0 = latest")
    parser.add_argument("--skip_time", action="store_true")
    parser.add_argument("--skip_shear", action="store_true",
                        help="leave accuracy sweeps untouched (e.g. a time-table "
                             "refresh after a harness perf change)")
    parser.add_argument("--skip_psf", action="store_true")
    parser.add_argument("--skip_psnr", action="store_true")
    parser.add_argument("--only", nargs="*", default=None, help="restrict to these result names")
    parser.add_argument("--summarize_only", action="store_true",
                        help="skip all eval sweeps; refresh the RESULTS.md tables from "
                             "whatever results are already on disk (the final stage of a "
                             "staged, resumable pipeline — scripts/round3_eval.sh)")
    parser.add_argument("--cpu", action="store_true",
                        help="force the CPU backend (table refreshes / checkpoint "
                             "discovery shouldn't touch the tunneled TPU)")
    args = parser.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import logging

    logging.basicConfig(level=logging.INFO)

    from galaxy_deconv_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()

    from galaxy_deconv_tpu.analysis import (
        summarize_cis,
        summarize_psf_results,
        summarize_psnr_results,
        summarize_results,
    )
    from galaxy_deconv_tpu.eval import (
        DEFAULT_PSF_ERRS,
        run_psf_error_test,
        run_psnr_test,
        run_shear_test,
        run_time_test,
    )
    from galaxy_deconv_tpu.train.checkpoint import best_epoch, restore_checkpoint, unpack_variables

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

    # transplanted reference checkpoints (capability: checkpoint migration)
    from galaxy_deconv_tpu.utils import load_reference_tikhonet

    for result_name, (build_name, fname) in REF_TRANSPLANTS.items():
        ref_pth = pathlib.Path("/root/reference/saved_models") / fname
        if ref_pth.exists():
            methods[result_name] = {
                "variables": load_reference_tikhonet(str(ref_pth)),
                "build_name": build_name,
            }

    # this framework's trained models (whatever checkpoints exist), looked
    # up in the scratch checkpoint dir first, then the committed trained/ zoo
    for result_name, (build_name, ckpt_name) in TRAINED_SPECS.items():
        src, ep = args.ckpt, best_epoch(args.ckpt, ckpt_name)
        if not ep:
            src, ep = "trained", best_epoch("trained", ckpt_name)
        if result_name == "Unrolled_ADMM_Gaussian(8)" and args.admm8_epoch:
            src, ep = args.ckpt, args.admm8_epoch
        if not ep:
            continue
        st = restore_checkpoint(src, ckpt_name, ep)
        methods[result_name] = {
            "variables": unpack_variables(st),
            "build_name": build_name,
        }
        print(f"loaded {result_name} from {src}/{ckpt_name} step {ep}")

    # ADMMNet: the frozen-denoiser ablation — plugs the separately trained
    # ResUNet denoiser (reference models/ADMMNet.py:51-58 training style)
    dn_src, ep = args.ckpt, best_epoch(args.ckpt, "ResUNet_MultiScale")
    if not ep:
        dn_src, ep = "trained", best_epoch("trained", "ResUNet_MultiScale")
    if ep:
        st = restore_checkpoint(dn_src, "ResUNet_MultiScale", ep)
        params = unpack_variables(st)["params"]
        methods["ADMMNet"] = {"variables": {"params": {"ResUNet_0": params["ResUNet_0"]}},
                              "build_name": "ADMMNet"}
        # scale-matched variant: same frozen denoiser, training-scale inputs
        # (fixes the reference's input-scale quirk — models/admmnet.py)
        methods["ADMMNet_scaled"] = {"variables": {"params": {"ResUNet_0": params["ResUNet_0"]}},
                                     "build_name": "ADMMNet_scaled"}
        # exact Poisson prox: the working PnP-with-frozen-denoiser baseline
        methods["ADMMNet_fixed"] = {"variables": {"params": {"ResUNet_0": params["ResUNet_0"]}},
                                    "build_name": "ADMMNet_fixed"}
        print(f"assembled ADMMNet (+_scaled, +_fixed) from ResUNet_MultiScale step {ep}")

    # ADMMNet_unit: same loop, but the frozen denoiser was *trained* at the
    # loop variable's unit scale (simulate_batch_denoise_unit) — the
    # scale-consistent design the reference's raw-ADU denoise training lacks.
    # With the reference prox ('ADMMNet' build) this isolates denoiser scale
    # only — the O(alpha) v-update pedestal still dominates the loop variable;
    # ADMMNet_unit_fixed pairs the unit denoiser with the exact Poisson prox
    # so the denoiser's benefit is actually measurable.
    un_src, ep = args.ckpt, best_epoch(args.ckpt, "ResUNet_Unit_MultiScale")
    if not ep:
        un_src, ep = "trained", best_epoch("trained", "ResUNet_Unit_MultiScale")
    if ep:
        st = restore_checkpoint(un_src, "ResUNet_Unit_MultiScale", ep)
        params = unpack_variables(st)["params"]
        methods["ADMMNet_unit"] = {"variables": {"params": {"ResUNet_0": params["ResUNet_0"]}},
                                   "build_name": "ADMMNet"}
        methods["ADMMNet_unit_fixed"] = {"variables": {"params": {"ResUNet_0": params["ResUNet_0"]}},
                                         "build_name": "ADMMNet_fixed"}
        print(f"assembled ADMMNet_unit (+_fixed) from ResUNet_Unit_MultiScale step {ep}")

    # the summary tables always cover the full discovered method matrix,
    # even when --only restricts which sweeps run in this invocation
    all_methods = list(methods)
    if args.only:
        methods = {k: v for k, v in methods.items() if k in args.only}

    if args.summarize_only:
        methods = {}

    for method, spec in methods.items():
        kw = dict(spec)
        build_name = kw.pop("build_name", method)
        if not args.skip_shear:
            run_shear_test(build_name, args.data, args.result, snrs=snrs, n_gal=args.n_gal,
                           batch_size=args.batch, result_name=method, **kw)
        if not args.skip_time:
            run_time_test(build_name, args.data, args.result, n_gal=args.n_gal,
                          batch_size=args.batch, warmup=1, result_name=method, **kw)
        if not args.skip_psnr and method != "FPFS":  # FPFS reconstructs nothing
            run_psnr_test(build_name, args.data, args.result, snrs=snrs,
                          n_gal=args.psnr_n_gal or args.n_gal,
                          batch_size=args.batch, result_name=method, **kw)

    if not args.skip_psf:
        psf_data = args.psf_data or args.data
        psf_n_gal = args.psf_n_gal or args.n_gal
        errs = DEFAULT_PSF_ERRS
        # the full method matrix, as in the reference's test_psf.py (its
        # methods dict covers every benchmarked method).  No_Deconv never
        # touches the PSF (rec = obs) — its rows would be constant — but FPFS
        # does (it deconvolves by the perturbed PSF in moment space), so only
        # No_Deconv is skipped.
        for method in methods:
            if method == "No_Deconv":
                continue
            kw = dict(methods[method])
            build_name = kw.pop("build_name", method)
            for kind in ("shear", "fwhm"):
                run_psf_error_test(build_name, psf_data, args.result, errs=errs, kind=kind,
                                   n_gal=psf_n_gal, batch_size=args.batch,
                                   result_name=method, **kw)

    def replace_block(out: pathlib.Path, tag: str, content: str) -> bool:
        start, end = f"<!-- {tag} START -->", f"<!-- {tag} END -->"
        if not (out.exists() and start in out.read_text()):
            return False
        text = out.read_text()
        pre, rest = text.split(start, 1)
        _, post = rest.split(end, 1)
        out.write_text(pre + f"{start}\n{content}\n{end}" + post)
        return True

    # summaries skip methods whose results.json doesn't exist on disk, so
    # using the full matrix here is safe even after --only/--summarize_only
    table = summarize_results(args.result, all_methods, snrs)
    out = pathlib.Path("RESULTS.md")
    ci_methods = [m for m in (
        "Unrolled_ADMM_Gaussian(8)_bounded", "Unrolled_ADMM_Gaussian(4)_bounded",
        "Unrolled_ADMM_Gaussian(2)_bounded", "Unrolled_ADMM_Gaussian(8)",
        "Unrolled_ADMM_Gaussian(4)", "Unrolled_ADMM_Gaussian(2)",
        "Unrolled_ADMM_Gaussian(8)_refproto", "Unrolled_ADMM_Gaussian(4)_refproto",
        "Unrolled_ADMM_Gaussian(2)_refproto", "ShapeNet_refproto",
        "Unrolled_ADMM_Gaussian(8)_Shape", "Unrolled_ADMM_Gaussian(4)_Shape",
        "ShapeNet", "ShapeNet_tpu", "ShapeNet_tpu_2M", "Tikhonet_Laplacian",
        "Richard-Lucy(30)", "FPFS", "No_Deconv") if m in all_methods]
    if ci_methods:
        ci_table = summarize_cis(args.result, ci_methods)
        if not replace_block(out, "CI TABLE", ci_table):
            print(f"(no CI TABLE markers in RESULTS.md; table printed below)\n{ci_table}")
    for kind in ("shear", "fwhm"):
        psf_table = summarize_psf_results(args.result, all_methods, DEFAULT_PSF_ERRS, kind=kind)
        if not replace_block(out, f"PSF {kind.upper()} TABLE", psf_table):
            print(f"(no PSF {kind.upper()} TABLE markers in RESULTS.md; table printed below)\n{psf_table}")
    psnr_table = summarize_psnr_results(args.result, all_methods, snrs)
    if not replace_block(out, "PSNR TABLE", psnr_table):
        print(f"(no PSNR TABLE markers in RESULTS.md; table printed below)\n{psnr_table}")
    if not replace_block(out, "BENCHMARK TABLE", table):
        block = f"<!-- BENCHMARK TABLE START -->\n{table}\n<!-- BENCHMARK TABLE END -->"
        header = (
            "# RESULTS — TPU framework benchmark\n\n"
            f"Simulated LSST benchmark (JAX-native pipeline), {args.n_gal} test galaxies/SNR,\n"
            "median ellipticity error = median min(|g_rec - g_gt|, 1) on the |g| component\n"
            "(gt_shear measured on noiseless gt stamps, same estimator).  Timing is the\n"
            "full batched deconvolve+measure pipeline per galaxy on one TPU v5e chip.\n\n"
        )
        out.write_text(header + block + "\n\nReference baselines: see BASELINE.md.\n")
    print(table)
    print("wrote RESULTS.md")


if __name__ == "__main__":
    main()
