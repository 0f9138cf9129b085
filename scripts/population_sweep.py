"""Population sweep: which galaxy population reproduces the reference's
low-SNR baseline fingerprint? (VERDICT r2 missing #4)

The benchmark regime diverges from the reference's COSMOS benchmark at
SNR 20-40 (e.g. SNR-20 No_Deconv 0.1027 vs ref 0.0805; FPFS 0.2888 vs
0.1557 — BASELINE.md).  The reference's galaxies are real COSMOS stamps
(``generate_data.py:72-111``); ours are parametric Sersic+envelope draws
(``data/simulate.py``).  This script sweeps the population knobs of
``SimulationConfig`` (half-light radius range, Sersic index range,
envelope fraction) and evaluates the *classical* fingerprint methods —
No_Deconv, FPFS, Richardson-Lucy(30) (no training involved, so the
comparison is pure population) — at SNR 20/40 on each config, against the
reference's committed numbers.  The trained flagship and the transplanted
reference ShapeNet checkpoint are also evaluated on each config (domain
shift for the flagship: it was trained on the default population).

Writes figures/population_sweep.json + a markdown table to stdout.
Run on the TPU: python scripts/population_sweep.py [--n_gal 1000]
"""

import argparse
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

# reference fingerprint (BASELINE.md, results_200 recomputation)
REF = {
    20: {"No_Deconv": 0.0805, "FPFS": 0.1557, "Richard-Lucy(30)": 0.1461,
         "Unrolled_ADMM_Gaussian(8)": 0.0656, "ShapeNet": 0.0766},
    40: {"No_Deconv": 0.0619, "FPFS": 0.0734, "Richard-Lucy(30)": 0.0683,
         "Unrolled_ADMM_Gaussian(8)": 0.0499, "ShapeNet": 0.0534},
    # high-SNR rows for the round-5 morphology experiment (VERDICT #7)
    100: {"No_Deconv": 0.0652, "FPFS": 0.0387, "Richard-Lucy(30)": 0.0330,
          "Unrolled_ADMM_Gaussian(8)": 0.0251, "ShapeNet": 0.0276},
    150: {"No_Deconv": 0.0718, "FPFS": 0.0278, "Richard-Lucy(30)": 0.0269,
          "Unrolled_ADMM_Gaussian(8)": 0.0188, "ShapeNet": 0.0207},
    200: {"No_Deconv": 0.0684, "FPFS": 0.0257, "Richard-Lucy(30)": 0.0236,
          "Unrolled_ADMM_Gaussian(8)": 0.0175, "ShapeNet": 0.0225},
}

# config name -> SimulationConfig overrides
CONFIGS = {
    "default": {},
    "no_envelope": dict(env_frac_max=0.0),
    "strong_envelope": dict(env_frac_min=0.5, env_frac_max=0.9),
    "small_gal": dict(hlr_min=0.08, hlr_max=0.4),
    "large_gal": dict(hlr_min=0.2, hlr_max=1.0),
    "cuspy": dict(sersic_n_min=1.0, sersic_n_max=4.0),
    "exponential": dict(sersic_n_min=1.0, sersic_n_max=1.0),
    "large_no_env": dict(hlr_min=0.2, hlr_max=1.0, env_frac_max=0.0),
    # clumpy cores: 4 off-center Gaussian knots carrying 5-15% of the flux
    # (the round-5 high-SNR morphology experiment — the one COSMOS property
    # the smooth parametric population lacks; VERDICT #7)
    "clumpy": dict(knot_frac_min=0.05, knot_frac_max=0.15),
    "very_clumpy": dict(knot_frac_min=0.15, knot_frac_max=0.35),
}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--n_gal", type=int, default=1000)
    parser.add_argument("--chunk", type=int, default=250)
    parser.add_argument("--snrs", type=int, nargs="+", default=[20, 40])
    parser.add_argument("--out", default="figures/population_sweep.json")
    parser.add_argument("--configs", nargs="*", default=None,
                        help="restrict to these config names (default: all)")
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from galaxy_deconv_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()

    from galaxy_deconv_tpu.data.simulate import SimulationConfig, simulate_batch_at_snr
    from galaxy_deconv_tpu.metrics import estimate_shear
    from galaxy_deconv_tpu.models import build_model
    from galaxy_deconv_tpu.train.checkpoint import best_epoch, restore_checkpoint, unpack_variables
    from galaxy_deconv_tpu.utils import load_reference_tikhonet

    # method name -> jitted (obs, psf, alpha) -> rec  (None = measured directly)
    rl = build_model("Richard-Lucy(30)")
    rl_vars = rl.init(jax.random.PRNGKey(0), jnp.zeros((1, 48, 48)), jnp.zeros((1, 48, 48)), jnp.ones((1,)))
    apply_fns = {"Richard-Lucy(30)": jax.jit(lambda o, p, a: rl.apply(rl_vars, o, p, a))}

    src, ep = "trained", best_epoch("trained", "Gaussian_PnP_ADMM_8iters_MultiScale")
    if ep:
        admm = build_model("Unrolled_ADMM_Gaussian(8)")
        admm_vars = unpack_variables(restore_checkpoint(src, "Gaussian_PnP_ADMM_8iters_MultiScale", ep))
        apply_fns["Unrolled_ADMM_Gaussian(8)"] = jax.jit(lambda o, p, a: admm.apply(admm_vars, o, p, a))

    ref_pth = pathlib.Path("/root/reference/saved_models/ShapeNet_Laplacian_50epochs.pth")
    if ref_pth.exists():
        sn = build_model("ShapeNet")
        sn_vars = load_reference_tikhonet(str(ref_pth))
        apply_fns["ShapeNet"] = jax.jit(lambda o, p, a: sn.apply(sn_vars, o, p, a))

    report = {"n_gal": args.n_gal, "reference": REF, "configs": {}}
    names = args.configs or list(CONFIGS)
    for name in names:
        cfg = SimulationConfig(**CONFIGS[name])
        rows = {}
        for snr in args.snrs:
            errs = {m: [] for m in ["No_Deconv", "FPFS", *apply_fns]}
            for c in range(0, args.n_gal, args.chunk):
                key = jax.random.PRNGKey(31415 + c)
                b = simulate_batch_at_snr(key, args.chunk, float(snr), cfg)
                obs, psf, gt = b["obs"], b["psf"], b["gt"]
                # alpha = mean(obs): the reference's convention
                # (utils/utils_data.py:100-101), used by BOTH the online
                # training and the dataset eval — feeding the true
                # generation alpha here puts SubNet out of distribution
                alpha = obs.mean(axis=(-2, -1))
                gt_shear = np.asarray(estimate_shear(gt))
                def med(rec_shear):
                    return np.minimum(np.abs(np.asarray(rec_shear) - gt_shear), 1)[:, 2]
                errs["No_Deconv"].append(med(estimate_shear(obs)))
                errs["FPFS"].append(med(estimate_shear(obs, psf, deconv_psf=True)))
                for m, fn in apply_fns.items():
                    errs[m].append(med(estimate_shear(fn(obs, psf, alpha))))
            rows[snr] = {m: float(np.median(np.concatenate(v))) for m, v in errs.items()}
            line = "  ".join(f"{m}={v:.4f}(ref {REF[snr].get(m, float('nan')):.4f})"
                             for m, v in rows[snr].items())
            print(f"{name} @ SNR {snr}: {line}", flush=True)
        # fingerprint distance: mean relative error vs the reference's
        # classical rows (the population-only signal)
        classical = ["No_Deconv", "FPFS", "Richard-Lucy(30)"]
        d = np.mean([abs(rows[s][m] - REF[s][m]) / REF[s][m]
                     for s in args.snrs for m in classical])
        rows["fingerprint_dist"] = float(d)
        print(f"{name}: fingerprint distance {d:.3f}")
        report["configs"][name] = rows

    out = pathlib.Path(args.out)
    out.parent.mkdir(exist_ok=True)
    out.write_text(json.dumps(report, indent=1))

    # markdown table
    hdr = ["config"] + [f"{m}@{s}" for s in args.snrs for m in ("No_Deconv", "FPFS", "Richard-Lucy(30)")] + ["dist"]
    print("\n| " + " | ".join(hdr) + " |")
    print("|" + "---|" * len(hdr))
    ref_row = ["**reference**"] + [f"**{REF[s][m]:.4f}**" for s in args.snrs
                                   for m in ("No_Deconv", "FPFS", "Richard-Lucy(30)")] + ["0"]
    print("| " + " | ".join(ref_row) + " |")
    for name in names:
        rows = report["configs"][name]
        cells = [name] + [f"{rows[s][m]:.4f}" for s in args.snrs
                          for m in ("No_Deconv", "FPFS", "Richard-Lucy(30)")]
        cells.append(f"{rows['fingerprint_dist']:.3f}")
        print("| " + " | ".join(cells) + " |")
    print(f"\nwrote {out}")


if __name__ == "__main__":
    main()
