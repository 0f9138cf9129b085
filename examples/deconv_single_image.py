"""Tutorial: deconvolve a single galaxy stamp and measure its shear.

The TPU-framework equivalent of the reference's tutorials/deconv.ipynb:
load (obs, psf), build the flagship model, restore trained weights (or use
Richardson-Lucy if none are available), reconstruct, and estimate shear.

Run:  python examples/deconv_single_image.py [--checkpoint trained --epoch 0]
(--epoch 0 auto-discovers the latest checkpoint; falls back to
Richardson-Lucy when none exists)
"""

import argparse
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def load_stamp():
    """Load the demo stamp from the first packed benchmark dataset found."""
    for name in ("LSST_23.5_deconv_tpu", "LSST_23.5_deconv_tpu_10k"):
        root = pathlib.Path("datasets") / name / "test"
        if not root.exists():
            continue
        # the benchmark layout stores fixed-SNR variants (obs_100 etc.);
        # the plain layout a single obs
        obs_file = root / "obs.npy"
        if not obs_file.exists():
            obs_file = root / "obs_100.npy"
        gt_file = root / "gt.npy"
        if not gt_file.exists():
            gt_file = root / "gt_100.npy"
        obs = np.load(obs_file, mmap_mode="r")[0].astype(np.float32)
        psf = np.load(root / "psf.npy", mmap_mode="r")[0].astype(np.float32)
        gt = np.load(gt_file, mmap_mode="r")[0].astype(np.float32)
        return obs, psf, gt
    raise SystemExit("no dataset found — run: python -m galaxy_deconv_tpu.cli generate ...")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoint", type=str, default="trained")
    parser.add_argument("--epoch", type=int, default=0, help="0 = latest in --checkpoint")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from galaxy_deconv_tpu.metrics import estimate_shear, psnr
    from galaxy_deconv_tpu.models import build_model

    obs, psf, gt = load_stamp()
    obs_b, psf_b = jnp.asarray(obs[None]), jnp.asarray(psf[None])
    alpha = jnp.asarray([float(obs.mean())])

    from galaxy_deconv_tpu.train.checkpoint import latest_epoch

    run_name = "Gaussian_PnP_ADMM_8iters_MultiScale"
    epoch = args.epoch or latest_epoch(args.checkpoint, run_name)
    if epoch:
        from galaxy_deconv_tpu.train import restore_checkpoint

        model = build_model("Unrolled_ADMM_Gaussian(8)")
        state = restore_checkpoint(args.checkpoint, run_name, epoch)
        variables = {"params": state["params"], "batch_stats": state["batch_stats"]}
        name = "Unrolled ADMM (8)"
    else:
        model = build_model("Richard-Lucy(30)")
        variables = model.init(jax.random.PRNGKey(0), obs_b, psf_b, alpha)
        name = "Richardson-Lucy (30)"

    rec = np.asarray(model.apply(variables, obs_b, psf_b, alpha))[0]

    g_gt = np.asarray(estimate_shear(jnp.asarray(gt[None])))[0]
    g_obs = np.asarray(estimate_shear(obs_b))[0]
    g_rec = np.asarray(estimate_shear(jnp.asarray(rec[None])))[0]

    print(f"method: {name}")
    print(f"gt  shear: g1={g_gt[0]:+.4f} g2={g_gt[1]:+.4f} |g|={g_gt[2]:.4f}")
    print(f"obs shear: |g|={g_obs[2]:.4f}  err={abs(g_obs[2]-g_gt[2]):.4f}")
    print(f"rec shear: |g|={g_rec[2]:.4f}  err={abs(g_rec[2]-g_gt[2]):.4f}")
    print(f"psnr(obs, gt)={float(psnr(obs[None], gt[None])[0]):.2f}  psnr(rec, gt)={float(psnr(rec[None], gt[None])[0]):.2f}")


if __name__ == "__main__":
    main()
