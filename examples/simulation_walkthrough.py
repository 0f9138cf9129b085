"""Tutorial: build one simulated LSST observation step by step.

The TPU-framework equivalent of the reference's
tutorials/image_simulation.ipynb: sample PSF + galaxy parameters, render
the atmospheric/optical PSF and the Sersic galaxy at 4x resolution,
FFT-convolve, downsample to the 48x48 LSST field of view, add CCD noise,
and display every intermediate product.

Run:  python examples/simulation_walkthrough.py [--out figures/simulation_walkthrough.png]
(uses the CPU backend so it can run alongside a TPU training job)
"""

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default="figures/simulation_walkthrough.png")
    parser.add_argument("--seed", type=int, default=7)
    parser.add_argument("--snr", type=float, default=100.0)
    args = parser.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from galaxy_deconv_tpu.data.simulate import (
        SimulationConfig,
        average_downsample,
        noise_sigma,
        observe,
        render_galaxy,
        render_psf,
        sample_params,
    )
    from galaxy_deconv_tpu.metrics import estimate_shear

    cfg = SimulationConfig()
    key = jax.random.PRNGKey(args.seed)
    params = jax.tree.map(lambda p: p[0], sample_params(key, 1, cfg))

    print("sampled parameters:")
    for k in ("atmos_fwhm", "atmos_e", "gal_g", "gal_beta", "sersic_n", "half_light_radius"):
        if k in params:
            print(f"  {k:12s} = {float(params[k]):+.4f}")

    # 1. PSF at 4x resolution: analytic Kolmogorov MTF x pupil-plane
    #    Zernike optics (reference generate_data.py get_LSST_PSF, :16-69)
    psf_hi = render_psf(params, cfg)

    # 2. Sheared Sersic galaxy at 4x resolution (reference
    #    get_COSMOS_Galaxy, generate_data.py:72-111)
    gal_hi = render_galaxy(params, cfg)

    # 3. Flux scaling to the target SNR: alpha = snr * sigma / ||gal||_2
    #    at fov resolution (reference generate_data.py:241-244)
    sigma = noise_sigma(cfg.pixel_scale)
    gal_fov = average_downsample(gal_hi, cfg.upsample)
    alpha = args.snr * sigma / jnp.sqrt((gal_fov**2).sum())
    gt_hi = alpha * gal_hi
    gt = alpha * gal_fov

    # 4. Convolve + 4x downsample + CCD noise (generate_data.py:246-257)
    noise = sigma * jax.random.normal(jax.random.fold_in(key, 1), (cfg.fov_pixels, cfg.fov_pixels))
    obs = observe(gt_hi[None], psf_hi[None], noise[None], cfg)
    psf = average_downsample(psf_hi, cfg.upsample)

    g = np.asarray(estimate_shear(gt[None]))[0]
    g1 = float(params["gal_g"] * jnp.cos(2 * params["gal_beta"]))
    g2 = float(params["gal_g"] * jnp.sin(2 * params["gal_beta"]))
    print(f"\ntrue shear (g1, g2) = ({g1:+.4f}, {g2:+.4f})")
    print(f"measured on gt stamp: ({g[0]:+.4f}, {g[1]:+.4f})")
    print(f"stamp SNR = ||gt||/sigma = {float(jnp.sqrt((gt**2).sum())) / sigma:.1f} (target {args.snr})")

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    panels = [
        ("PSF (4x res)", np.asarray(psf_hi)),
        ("galaxy (4x res)", np.asarray(gt_hi)),
        ("PSF (fov)", np.asarray(psf)),
        ("ground truth (fov)", np.asarray(gt)),
        ("observation", np.asarray(obs[0])),
    ]
    fig, axes = plt.subplots(1, len(panels), figsize=(3 * len(panels), 3))
    for ax, (title, img) in zip(axes, panels):
        ax.imshow(img, cmap="magma", origin="lower")
        ax.set_title(title, fontsize=10)
        ax.set_xticks([]), ax.set_yticks([])
    fig.tight_layout()
    pathlib.Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(args.out, dpi=120, bbox_inches="tight")
    print(f"\nwrote {args.out}")


if __name__ == "__main__":
    main()
