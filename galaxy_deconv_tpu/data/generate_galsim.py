"""GalSim/COSMOS dataset generation (optional, exact reference parity).

The JAX simulator (:mod:`simulate`) is the default data source; this module
reproduces the reference's *exact* GalSim pipeline — real COSMOS galaxies,
GalSim Kolmogorov+OpticalPSF rendering, seed 31415, identical parameter
distributions (reference ``generate_data.py``) — for environments where
``galsim`` and the COSMOS 23.5 catalog are installed, writing directly into
this framework's packed layout.

Import is gated: calling any entry point without galsim raises a clear
error; the rest of the framework never depends on it.
"""

from __future__ import annotations

import json
import pathlib

import numpy as np

from galaxy_deconv_tpu.data.simulate import CCD, get_flux


def _require_galsim():
    try:
        import galsim  # noqa: F401

        return galsim
    except ImportError as e:
        raise ImportError(
            "galsim is not installed; use galaxy_deconv_tpu.data.simulate (the "
            "JAX-native pipeline) or install galsim + the COSMOS 23.5 catalog."
        ) from e


def _draw_psf(galsim, rngs, fov_pixels, pixel_scale, upsample, g1_err=0.0, g2_err=0.0, fwhm=None):
    p = rngs
    atmos = galsim.Kolmogorov(fwhm=fwhm if fwhm is not None else p["atmos_fwhm"], flux=1.0)
    atmos = atmos.shear(e=p["atmos_e"], beta=p["atmos_beta"] * galsim.radians)
    optics = galsim.OpticalPSF(
        p["lam_over_diam"],
        defocus=p["defocus"],
        coma1=p["coma1"],
        coma2=p["coma2"],
        astig1=p["astig1"],
        astig2=p["astig2"],
        spher=p["spher"],
        trefoil1=p["trefoil1"],
        trefoil2=p["trefoil2"],
        obscuration=p["obscuration"],
        flux=1.0,
    )
    psf = galsim.Convolve([atmos, optics]).shear(g1=g1_err, g2=g2_err)
    img = galsim.ImageF(fov_pixels * upsample, fov_pixels * upsample)
    psf.drawImage(img, scale=pixel_scale / upsample, method="auto")
    return img.array.astype(np.float32)


def _down(x: np.ndarray, rate: int) -> np.ndarray:
    H, W = x.shape
    return x.reshape(H // rate, rate, W // rate, rate).mean(axis=(1, 3))


def observe_numpy(gal_hi: np.ndarray, psf_hi: np.ndarray, sigma: float, snr: float,
                  rng: np.random.Generator, upsample: int = 4):
    """The pure-NumPy observation core (reference generate_data.py:241-257):
    scale flux so ||down(gt)||_2 = snr * sigma, FFT-convolve at high
    resolution, downsample, clip negatives, add Gaussian noise.

    Returns (obs, gt) at the downsampled (fov) resolution.  Testable
    without galsim — the galsim entry point routes through this.
    """
    gal_down = _down(gal_hi, upsample)
    alpha = snr * sigma / np.sqrt((gal_down**2).sum())
    gt_hi = alpha * gal_hi
    conv = np.fft.ifftshift(np.fft.irfft2(np.fft.rfft2(psf_hi) * np.fft.rfft2(gt_hi), gt_hi.shape)).real
    conv = np.maximum(_down(conv, upsample), 0.0)
    obs = (conv + rng.normal(0.0, sigma, conv.shape)).astype(np.float32)
    return obs, _down(gt_hi, upsample).astype(np.float32)


def write_packed_dataset(root, stores, variants, perturbed, meta) -> pathlib.Path:
    """Write the packed .npy layout consumed by
    :class:`galaxy_deconv_tpu.data.GalaxyDataset` (pure NumPy; testable
    without galsim)."""
    root = pathlib.Path(root)
    for split, fields in stores.items():
        d = root / split
        d.mkdir(parents=True, exist_ok=True)
        for name, arrs in fields.items():
            np.save(d / f"{name}.npy", np.stack(arrs))
        n = len(fields["obs"])
        obs_arr = np.stack(fields["obs"])
        np.save(d / "alpha.npy", obs_arr.mean(axis=(1, 2)).astype(np.float32))
        for name in ("snr", "gal_g1", "gal_g2"):
            np.save(d / f"{name}.npy", np.zeros(n, np.float32))
    for name, arrs in {**variants, **perturbed}.items():
        np.save(root / "test" / f"{name}.npy", np.stack(arrs))
    with open(root / "info.json", "w") as f:
        json.dump(meta, f)
    return root


def generate_cosmos_dataset(
    data_path,
    cosmos_dir: str,
    n_train: int = 40000,
    sample: str = "23.5",
    fov_pixels: int = 48,
    pixel_scale: float = 0.2,
    upsample: int = 4,
    seed: int = 31415,
    snrs=(20, 40, 60, 80, 100, 150, 200),
    shear_errs=(0.003, 0.005, 0.01, 0.02, 0.03, 0.05, 0.07, 0.1, 0.15, 0.2),
    fwhm_errs=(0.003, 0.005, 0.01, 0.02, 0.03, 0.05, 0.07, 0.1, 0.15, 0.2),
):
    """Generate the reference's LSST/COSMOS benchmark with GalSim into the
    packed layout.  Parameter distributions follow reference
    generate_data.py:179-235 exactly."""
    galsim = _require_galsim()
    root = pathlib.Path(data_path)
    catalog = galsim.RealGalaxyCatalog(dir=cosmos_dir, sample=sample)
    n_total = catalog.nobjects
    sequence = np.arange(n_total)
    np.random.default_rng(seed).shuffle(sequence)

    rng_base = galsim.BaseDeviate(seed=seed)
    rng = galsim.UniformDeviate(seed=seed)
    rng_defocus = galsim.GaussianDeviate(rng_base, mean=0.0, sigma=0.36)
    rng_gauss = galsim.GaussianDeviate(rng_base, mean=0.0, sigma=0.07)
    fwhms = np.array([0.45, 0.55, 0.65, 0.75, 0.85, 0.95])
    freqs = np.array([0.0, 20.0, 17.0, 13.0, 9.0, 0.0])
    tab = galsim.LookupTable(x=fwhms, f=freqs, interpolant="spline")
    xs = np.linspace(fwhms[0], fwhms[-1], 100)
    fs = np.array([tab(x) for x in xs]) / tab.integrate()
    rng_fwhm = galsim.DistDeviate(seed=rng_base, function=galsim.LookupTable(x=xs, f=fs, interpolant="spline"))
    rng_shear = galsim.DistDeviate(seed=rng, function=lambda x: x, x_min=0.01, x_max=0.05)
    rng_snr = galsim.DistDeviate(seed=rng, function=lambda x: 1 / (x**0.7), x_min=18, x_max=220, npoints=1000)

    sky = get_flux(CCD["sky_brightness"], CCD["exp_time"], CCD["zero_point"], CCD["gain"], CCD["qe"]) * pixel_scale**2
    sigma = float(np.sqrt(sky + (CCD["read_noise"] * CCD["qe"] / CCD["gain"]) ** 2))

    n_test = n_total - n_train
    stores = {"train": {k: [] for k in ("obs", "psf", "gt")}, "test": {k: [] for k in ("obs", "psf", "gt")}}
    variants = {f"obs_{s}": [] for s in snrs} | {f"gt_{s}": [] for s in snrs}
    perturbed = {f"psf_shear_err_{e}": [] for e in shear_errs} | {f"psf_fwhm_err_{e}": [] for e in fwhm_errs}

    for k in range(n_total):
        idx = int(sequence[k])
        p = dict(
            atmos_fwhm=rng_fwhm(),
            atmos_e=0.01 + 0.02 * rng(),
            atmos_beta=2 * np.pi * rng(),
            defocus=rng_defocus(),
            astig1=rng_gauss(),
            astig2=rng_gauss(),
            coma1=rng_gauss(),
            coma2=rng_gauss(),
            spher=rng_gauss(),
            trefoil1=rng_gauss(),
            trefoil2=rng_gauss(),
            obscuration=0.1 + 0.4 * rng(),
            lam_over_diam=0.017 + 0.007 * rng(),
        )
        psf_hi = _draw_psf(galsim, p, fov_pixels, pixel_scale, upsample)

        gal = galsim.RealGalaxy(catalog, index=idx)
        gal = gal.rotate(2 * np.pi * rng() * galsim.radians)
        gal = gal.shear(g=rng_shear(), beta=2 * np.pi * rng() * galsim.radians)
        gal = gal.magnify(1 + rng() * 0.1)
        img = galsim.ImageF(fov_pixels * upsample, fov_pixels * upsample)
        gal = galsim.Convolve([catalog.getPSF(idx), gal])
        gal.drawImage(img, scale=pixel_scale / upsample, offset=(2 * rng() - 1, 2 * rng() - 1), method="auto")
        gal_hi = np.maximum(img.array.astype(np.float32), 0.0)

        def observe(snr_val, rng_np):
            return observe_numpy(gal_hi, psf_hi, sigma, snr_val, rng_np, upsample)

        rng_np = np.random.default_rng(seed + k)
        obs, gt = observe(rng_snr(), rng_np)
        split = "train" if k < n_train else "test"
        stores[split]["obs"].append(obs)
        stores[split]["psf"].append(_down(psf_hi, upsample))
        stores[split]["gt"].append(gt)

        if k >= n_train:
            for s in snrs:
                o, g = observe(s, rng_np)
                variants[f"obs_{s}"].append(o)
                variants[f"gt_{s}"].append(g)
            for e in shear_errs:
                g1e = e if rng() > 0.5 else -e
                g2e = e if rng() > 0.5 else -e
                perturbed[f"psf_shear_err_{e}"].append(
                    _down(_draw_psf(galsim, p, fov_pixels, pixel_scale, upsample, g1e, g2e), upsample)
                )
            for e in fwhm_errs:
                f = p["atmos_fwhm"] + (e if rng() > 0.5 else -e)
                f = f + 2 * e if f < 0 else f
                perturbed[f"psf_fwhm_err_{e}"].append(
                    _down(_draw_psf(galsim, p, fov_pixels, pixel_scale, upsample, fwhm=f), upsample)
                )

    meta = dict(n_train=n_train, n_test=n_test, fov_pixels=fov_pixels, pixel_scale=pixel_scale,
                upsample=upsample, seed=seed, snrs=list(snrs), shear_errs=list(shear_errs),
                fwhm_errs=list(fwhm_errs), generator="galsim/COSMOS")
    return write_packed_dataset(root, stores, variants, perturbed, meta)
