"""Commit the evidence behind the rho-collapse diagnosis (VERDICT r2 #1/weak-3).

Runs the flagship UnrolledADMMGaussian checkpoints in ``analysis=True`` mode
over a test batch and records the *population* statistics of the SubNet
rho schedule (reference ``models/unrolled_admm_gaussian.py:43-71`` SubNet ->
per-iteration penalty rho), plus the per-iteration progress of the iterate
(relative z change), which measures the *effective* unrolled depth:
an iteration with rho ~ 1e-6 leaves z essentially untouched
(x-update -> pure likelihood solve, z-update input rho*x + u ~ u).

Outputs:
  figures/rho_schedule.json   per-iteration rho quantiles + z-progress stats
  figures/rho_schedule.png    log-rho schedule, unbounded vs bounded variants

CPU-runnable (small batch): ``python scripts/rho_trace.py --cpu``.
"""

import argparse
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

# result-label -> (build name, ckpt run name)
SPECS = {
    "Unrolled_ADMM_Gaussian(8)": ("Unrolled_ADMM_Gaussian(8)", "Gaussian_PnP_ADMM_8iters_MultiScale"),
    "Unrolled_ADMM_Gaussian(4)": ("Unrolled_ADMM_Gaussian(4)", "Gaussian_PnP_ADMM_4iters_MultiScale"),
    "Unrolled_ADMM_Gaussian(2)": ("Unrolled_ADMM_Gaussian(2)", "Gaussian_PnP_ADMM_2iters_MultiScale"),
    "Unrolled_ADMM_Gaussian(8)_bounded": ("Unrolled_ADMM_Gaussian_Bounded(8)",
                                          "Gaussian_PnP_ADMM_8iters_Bounded_MultiScale"),
    "Unrolled_ADMM_Gaussian(4)_bounded": ("Unrolled_ADMM_Gaussian_Bounded(4)",
                                          "Gaussian_PnP_ADMM_4iters_Bounded_MultiScale"),
    "Unrolled_ADMM_Gaussian(2)_bounded": ("Unrolled_ADMM_Gaussian_Bounded(2)",
                                          "Gaussian_PnP_ADMM_2iters_Bounded_MultiScale"),
}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data", default="datasets/LSST_23.5_deconv_tpu_10k")
    parser.add_argument("--batch", type=int, default=128)
    parser.add_argument("--out", default="figures")
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from galaxy_deconv_tpu.data import GalaxyDataset
    from galaxy_deconv_tpu.models import build_model
    from galaxy_deconv_tpu.train.checkpoint import best_epoch, restore_checkpoint, unpack_variables

    ds = GalaxyDataset(args.data, "test")  # random-SNR observations
    b = ds.batch(np.arange(args.batch))
    obs, psf, alpha = jnp.asarray(b["obs"]), jnp.asarray(b["psf"]), jnp.asarray(b["alpha"])

    report = {"data": args.data, "batch": args.batch, "models": {}}
    for label, (build_name, ckpt_name) in SPECS.items():
        src, ep = "saved_models_online", best_epoch("saved_models_online", ckpt_name)
        if not ep:
            src, ep = "trained", best_epoch("trained", ckpt_name)
        if not ep:
            print(f"{label}: no checkpoint, skipping")
            continue
        variables = unpack_variables(restore_checkpoint(src, ckpt_name, ep))
        model = build_model(build_name, analysis=True)
        traces = model.apply(variables, obs, psf, alpha)
        rho = np.asarray(traces["rho"])[..., 0, 0]  # (B, n)
        z = np.asarray(traces["z"], np.float64)  # (B, n, H, W)
        # relative progress of the iterate at each unrolled step; step 0 is
        # measured against the Wiener initialization z0 = traces' first input,
        # which we don't record — report steps 1..n-1 (n-1 deltas)
        dz = np.linalg.norm(np.diff(z, axis=1), axis=(2, 3))
        zn = np.linalg.norm(z[:, 1:], axis=(2, 3))
        rel_dz = dz / np.maximum(zn, 1e-12)  # (B, n-1)
        # an iteration is "active" if it moves the iterate by >1% relative
        active = (rel_dz > 0.01).sum(axis=1) + 1  # +1: the first step always counts
        report["models"][label] = {
            "ckpt": f"{src}/{ckpt_name}_{ep}epochs",
            "rho_q10": np.quantile(rho, 0.10, axis=0).tolist(),
            "rho_median": np.median(rho, axis=0).tolist(),
            "rho_q90": np.quantile(rho, 0.90, axis=0).tolist(),
            "rel_z_change_median": np.median(rel_dz, axis=0).tolist(),
            "effective_iters_median": float(np.median(active)),
            "effective_iters_mean": float(active.mean()),
        }
        med = ", ".join(f"{v:.3g}" for v in report["models"][label]["rho_median"])
        print(f"{label} (step {ep}): median rho per iter = [{med}]; "
              f"effective iters (median) = {report['models'][label]['effective_iters_median']:.1f}")

    out = pathlib.Path(args.out)
    out.mkdir(exist_ok=True)
    with open(out / "rho_schedule.json", "w") as f:
        json.dump(report, f, indent=1)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 2, figsize=(10, 4))
    for label, stats in report["models"].items():
        n = len(stats["rho_median"])
        it = np.arange(1, n + 1)
        style = dict(marker="o", ls="--" if "bounded" in label else "-")
        line, = axes[0].plot(it, stats["rho_median"], label=label, **style)
        axes[0].fill_between(it, stats["rho_q10"], stats["rho_q90"],
                             alpha=0.15, color=line.get_color())
        axes[1].plot(np.arange(2, n + 1), stats["rel_z_change_median"],
                     label=label, color=line.get_color(), **style)
    axes[0].set_yscale("log")
    axes[0].set_xlabel("unrolled iteration")
    axes[0].set_ylabel(r"SubNet $\rho_i$ (median, 10-90%)")
    axes[0].axhspan(0.1, 10.0, color="0.9", zorder=0, label=r"bounded $\rho$ range")
    axes[1].set_yscale("log")
    axes[1].set_xlabel("unrolled iteration")
    axes[1].set_ylabel(r"median $\|z_i - z_{i-1}\| / \|z_i\|$")
    axes[1].axhline(0.01, color="0.6", lw=0.8, ls=":")
    axes[0].legend(fontsize=7)
    fig.suptitle("SubNet penalty schedule and effective unrolled depth")
    fig.tight_layout()
    fig.savefig(out / "rho_schedule.png", dpi=150)
    print(f"wrote {out}/rho_schedule.json and {out}/rho_schedule.png")


if __name__ == "__main__":
    main()
