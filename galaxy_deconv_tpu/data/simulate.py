"""LSST-like galaxy image simulation, natively in JAX.

Capability parity with the reference's GalSim pipeline
(``generate_data.py``): per sample it draws

* an **atmospheric PSF** — Kolmogorov profile with FWHM from the empirical
  seeing distribution (spline table on [0.45, 0.95] arcsec,
  ``generate_data.py:185-190``), sheared by a small distortion
  e ~ U(0.01, 0.03) at a random angle;
* an **optical PSF** — obscured pupil with Noll Zernike aberrations
  (defocus N(0, 0.36); astigmatism/coma/trefoil/spherical N(0, 0.07);
  obscuration U(0.1, 0.5); lam/diam U(0.017, 0.024) arcsec,
  ``generate_data.py:213-222``);
* a **galaxy** — sheared (|g| ~ p(x) ∝ x on [0.01, 0.05]), rotated,
  magnified U(1, 1.1), sub-pixel offset U(-1, 1) px — the reference draws
  real COSMOS galaxies; without the COSMOS catalog this module draws
  parametric Sersic profiles (random index, size, intrinsic ellipticity)
  convolved with an HST-like Gaussian, which preserves the statistical
  structure of the benchmark (the GalSim/COSMOS path lives in
  ``generate_galsim.py`` for exact parity when installed);
* the **observation** — FFT convolution at 4x upsampling (192x192 at
  0.05 arcsec), 4x average downsampling, and Gaussian sky+read noise with
  the LSST CCD constants (``generate_data.py:194-202``); flux scaled so
  that alpha = snr * sigma / ||downsample(gal)||_2 with snr drawn
  log-uniform-ish (p ∝ x^-0.7 on [18, 220]).

TPU-first design: everything is Fourier-domain and batched.  The optical
OTF is the pupil autocorrelation — computed with one padded FFT per sample
and sampled onto the (sheared) image frequency grid with bilinear
interpolation, so PSF shear/fwhm systematics (the ``psf_shear_err_*`` /
``psf_fwhm_err_*`` robustness sets, ``generate_data.py:291-315``) are pure
coordinate transforms with no re-rendering.  A batch of stamps is one
jitted call; there is no per-object Python.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from galaxy_deconv_tpu.ops.resize import average_downsample

# ---------------------------------------------------------------------------
# CCD / sky constants (reference generate_data.py:194-202)
# ---------------------------------------------------------------------------

CCD = dict(
    exp_time=30.0,  # s (2x15s visits)
    sky_brightness=20.48,  # i-band AB mag / arcsec^2
    zero_point=27.85,  # AB mag producing 1 e-/s
    gain=2.3,  # e-/ADU
    qe=0.94,
    read_noise=8.8,  # e-/pixel
)


def get_flux(ab_magnitude: float, exp_time: float, zero_point: float, gain: float, qe: float) -> float:
    """AB magnitude -> flux in ADU/arcsec^2 (reference utils/utils_data.py:10-23)."""
    return exp_time * zero_point * 10 ** (-0.4 * (ab_magnitude - 24)) * qe / gain


def noise_sigma(pixel_scale: float = 0.2) -> float:
    """Total per-pixel Gaussian noise sigma in ADU (sky + read)."""
    sky_level_pixel = (
        get_flux(CCD["sky_brightness"], CCD["exp_time"], CCD["zero_point"], CCD["gain"], CCD["qe"])
        * pixel_scale**2
    )
    return float(np.sqrt(sky_level_pixel + (CCD["read_noise"] * CCD["qe"] / CCD["gain"]) ** 2))


# ---------------------------------------------------------------------------
# Config
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class SimulationConfig:
    fov_pixels: int = 48
    pixel_scale: float = 0.2  # arcsec / output pixel
    upsample: int = 4
    pupil_n: int = 512  # samples across the pupil diameter
    pupil_pad: int = 1024  # FFT grid for the pupil autocorrelation
    hst_fwhm: float = 0.1  # arcsec, HST-like pre-convolution of galaxies
    snr_min: float = 18.0
    snr_max: float = 220.0
    snr_power: float = 0.7  # p(snr) ∝ snr^-power
    # parametric-galaxy population (the COSMOS stand-in): half-light radius
    # log-uniform on [hlr_min, hlr_max] arcsec, Sersic index uniform on
    # [sersic_n_min, sersic_n_max], intrinsic axis ratio uniform on
    # [q_int_min, 1].  Calibrated so the measured gt/obs shear statistics of
    # the benchmark match the reference's results_200 population (see
    # scripts/calibrate_population.py and RESULTS.md).
    hlr_min: float = 0.12
    hlr_max: float = 0.7
    sersic_n_min: float = 0.5
    sersic_n_max: float = 1.5
    q_int_min: float = 0.25
    # two-component option: a diffuse exponential envelope around the
    # shape-bearing core (COSMOS real galaxies pair clumpy cores with
    # low-surface-brightness disks; the envelope carries photons — raising
    # flux at fixed ||gt||_2, i.e. at fixed nominal SNR — while the core
    # sets the small-scale shape that seeing dilutes).  env_frac is the
    # envelope's flux fraction (sampled uniform on [min, max]),
    # env_size_ratio its half-light radius relative to the core's, and
    # env_ellip_ratio scales the envelope's intrinsic ellipticity relative
    # to the core's (1 = same shape, 0 = round halo).
    env_frac_min: float = 0.0
    env_frac_max: float = 0.8
    env_size_ratio: float = 4.0
    env_ellip_ratio: float = 0.5
    # clumpy cores (round-5 high-SNR morphology experiment, VERDICT #7):
    # n_knots off-center Gaussian knots in the *intrinsic* frame (so they
    # shear/rotate with the galaxy) carrying a total flux fraction sampled
    # uniform on [knot_frac_min, knot_frac_max], positions uniform in a
    # disk of knot_r_scale x half-light-radius, each knot a Gaussian of
    # knot_sigma arcsec (marginally resolved at HST scale).  Off by
    # default (knot_frac_max = 0 compiles them away); the COSMOS real
    # galaxies the reference draws have exactly this kind of small-scale
    # structure that the smooth Sersic+envelope stand-in lacks.
    n_knots: int = 4
    knot_frac_min: float = 0.0
    knot_frac_max: float = 0.0
    knot_sigma: float = 0.05
    knot_r_scale: float = 0.6

    @property
    def n_hi(self) -> int:
        return self.fov_pixels * self.upsample

    @property
    def scale_hi(self) -> float:
        return self.pixel_scale / self.upsample


# ---------------------------------------------------------------------------
# Shear algebra
# ---------------------------------------------------------------------------


def reduced_shear_matrix(g1, g2):
    """Area-preserving shear matrix mapping source -> image coordinates."""
    norm = 1.0 / jnp.sqrt(jnp.maximum(1.0 - g1**2 - g2**2, 1e-8))
    return norm * jnp.array([[1.0 + g1, g2], [g2, 1.0 - g1]])


def distortion_to_g(e):
    """Distortion |e| -> reduced shear |g| (e = 2g/(1+g^2))."""
    return e / (1.0 + jnp.sqrt(jnp.maximum(1.0 - e**2, 0.0)))


# ---------------------------------------------------------------------------
# Atmospheric (Kolmogorov) MTF
# ---------------------------------------------------------------------------

_KOLM_FWHM_RATIO = 0.975865  # FWHM = 0.976 lambda/r0 for Kolmogorov


def kolmogorov_mtf(nu_x, nu_y, fwhm):
    """Long-exposure Kolmogorov MTF exp(-3.44 (lambda nu / r0)^{5/3})
    parameterized by FWHM (arcsec); nu in cycles/arcsec."""
    lam_over_r0 = fwhm / _KOLM_FWHM_RATIO
    nu = jnp.sqrt(nu_x**2 + nu_y**2)
    return jnp.exp(-3.44 * (lam_over_r0 * nu) ** (5.0 / 3.0))


# ---------------------------------------------------------------------------
# Optical OTF via pupil autocorrelation
# ---------------------------------------------------------------------------

# Circular Noll Zernikes Z4..Z11 (the aberrations GalSim's OpticalPSF takes).


def _zernike_phase(rho, theta, defocus, a1, a2, c1, c2, t1, t2, spher):
    z4 = jnp.sqrt(3.0) * (2 * rho**2 - 1)
    z5 = jnp.sqrt(6.0) * rho**2 * jnp.sin(2 * theta)
    z6 = jnp.sqrt(6.0) * rho**2 * jnp.cos(2 * theta)
    z7 = jnp.sqrt(8.0) * (3 * rho**3 - 2 * rho) * jnp.sin(theta)
    z8 = jnp.sqrt(8.0) * (3 * rho**3 - 2 * rho) * jnp.cos(theta)
    z9 = jnp.sqrt(8.0) * rho**3 * jnp.sin(3 * theta)
    z10 = jnp.sqrt(8.0) * rho**3 * jnp.cos(3 * theta)
    z11 = jnp.sqrt(5.0) * (6 * rho**4 - 6 * rho**2 + 1)
    return (
        defocus * z4 + a1 * z5 + a2 * z6 + c1 * z7 + c2 * z8 + t1 * z9 + t2 * z10 + spher * z11
    )


def optical_autocorr(params: dict, cfg: SimulationConfig) -> jnp.ndarray:
    """Pupil autocorrelation on a (pad, pad) grid, fftshifted to center,
    normalized to 1 at zero shift.  Grid spacing: D / pupil_n per sample."""
    n, pad = cfg.pupil_n, cfg.pupil_pad
    xs = (jnp.arange(pad) - pad // 2) / (n / 2.0)  # pupil coords in aperture-radius units
    X, Y = jnp.meshgrid(xs, xs, indexing="xy")
    rho = jnp.sqrt(X**2 + Y**2)
    theta = jnp.arctan2(Y, X)
    aperture = (rho <= 1.0) & (rho >= params["obscuration"])
    phase = _zernike_phase(
        rho,
        theta,
        params["defocus"],
        params["astig1"],
        params["astig2"],
        params["coma1"],
        params["coma2"],
        params["trefoil1"],
        params["trefoil2"],
        params["spher"],
    )
    pupil = jnp.where(aperture, jnp.exp(2j * jnp.pi * phase), 0.0)
    amp = jnp.abs(jnp.fft.fft2(jnp.fft.ifftshift(pupil))) ** 2
    acorr = jnp.fft.fftshift(jnp.fft.ifft2(amp)).real
    return acorr / acorr[pad // 2, pad // 2]


def sample_optical_otf(acorr: jnp.ndarray, nu_x, nu_y, lam_over_diam, cfg: SimulationConfig):
    """Sample the pupil autocorrelation at shifts lambda*nu (bilinear).

    The autocorrelation grid spacing is D/pupil_n; a frequency nu
    (cycles/arcsec) corresponds to a pupil shift of lam_over_diam * nu
    aperture-diameters = that * pupil_n grid samples.
    """
    pad = cfg.pupil_pad
    sx = lam_over_diam * nu_x * cfg.pupil_n
    sy = lam_over_diam * nu_y * cfg.pupil_n
    coords = jnp.stack([sy + pad // 2, sx + pad // 2])
    return jax.scipy.ndimage.map_coordinates(acorr, coords, order=1, mode="constant", cval=0.0)


# ---------------------------------------------------------------------------
# PSF rendering
# ---------------------------------------------------------------------------


def _freq_grid(n: int, scale: float):
    """rfft2 frequency grid (cycles/arcsec) for an (n, n) image."""
    fy = jnp.fft.fftfreq(n, d=scale)
    fx = jnp.fft.rfftfreq(n, d=scale)
    return jnp.meshgrid(fy, fx, indexing="ij")


def render_psf(params: dict, cfg: SimulationConfig, g1_err=0.0, g2_err=0.0, fwhm=None) -> jnp.ndarray:
    """Draw one (n_hi, n_hi) PSF image with unit flux, centered.

    ``g1_err/g2_err`` shear the overall PSF (systematic-error sets);
    ``fwhm`` overrides the atmospheric seeing (FWHM-error sets).
    """
    n, s = cfg.n_hi, cfg.scale_hi
    NUY, NUX = _freq_grid(n, s)

    # overall error shear: a profile sheared by S, p_s(x) = p(S^-1 x), has
    # OTF_s(nu) = OTF(S^T nu) (det S = 1), so sample the base MTF at S^T nu.
    # reduced_shear_matrix is symmetric, S^T = S; using S(-g) here would
    # render the PSF sheared by -g (sign verified by the signed-shear test).
    Serr_T = reduced_shear_matrix(g1_err, g2_err).T
    nux = Serr_T[0, 0] * NUX + Serr_T[0, 1] * NUY
    nuy = Serr_T[1, 0] * NUX + Serr_T[1, 1] * NUY

    # atmospheric shear (distortion e at angle beta)
    g_atm = distortion_to_g(params["atmos_e"])
    b = params["atmos_beta"]
    ga1, ga2 = g_atm * jnp.cos(2 * b), g_atm * jnp.sin(2 * b)
    Satm_T = reduced_shear_matrix(ga1, ga2).T
    anux = Satm_T[0, 0] * nux + Satm_T[0, 1] * nuy
    anuy = Satm_T[1, 0] * nux + Satm_T[1, 1] * nuy

    fwhm_val = params["atmos_fwhm"] if fwhm is None else fwhm
    mtf_atm = kolmogorov_mtf(anux, anuy, fwhm_val)

    acorr = optical_autocorr(params, cfg)
    otf_opt = sample_optical_otf(acorr, nux, nuy, params["lam_over_diam"], cfg)

    # pixel MTF of the high-res sampling (drawImage method='auto' integrates
    # the profile over pixels)
    mtf_pix = jnp.sinc(NUX * s) * jnp.sinc(NUY * s)

    otf = mtf_atm * otf_opt * mtf_pix
    # Center the PSF at the stamp's true center (n-1)/2 — a half-pixel shift
    # from the fftshift grid point — matching GalSim's drawImage placement on
    # even stamps (and the galaxy renderer below), so obs/gt/psf all share
    # the same sub-pixel registration.
    fy = jnp.fft.fftfreq(n)[:, None]
    fx = jnp.fft.rfftfreq(n)[None, :]
    # shift by -0.5 px on each axis: f(x + 0.5) <-> F(nu) e^{+2 pi i nu 0.5},
    # moving the fftshift grid point n//2 to the true center (n-1)/2
    shift = jnp.exp(+2j * jnp.pi * (fy + fx) * 0.5)
    psf = jnp.fft.fftshift(jnp.fft.irfft2(otf * shift, (n, n)))
    psf = jnp.maximum(psf, 0.0)
    return psf / psf.sum()


# ---------------------------------------------------------------------------
# Galaxy rendering (parametric Sersic; COSMOS path in generate_galsim.py)
# ---------------------------------------------------------------------------


def _sersic_b(n):
    return 2.0 * n - 1.0 / 3.0 + 4.0 / (405.0 * n)


def render_galaxy(params: dict, cfg: SimulationConfig) -> jnp.ndarray:
    """Draw one (n_hi, n_hi) galaxy image, unit flux, lensing applied.

    Pipeline (matching the reference's composition order,
    ``generate_data.py:95-106``): intrinsic profile -> rotate(theta) ->
    shear(g, beta) -> magnify(mu) -> sub-pixel offset -> HST-like PSF.
    """
    n, s = cfg.n_hi, cfg.scale_hi
    half = (n - 1) / 2.0
    xs = (jnp.arange(n) - half) * s
    X, Y = jnp.meshgrid(xs, xs, indexing="xy")
    # offsets are in units of the high-res drawn pixel (reference drawImage offset)
    X = X - params["dx"] * s
    Y = Y - params["dy"] * s

    # lensing: image coords -> source coords through inverse magnification+shear
    root_mu = jnp.sqrt(params["gal_mu"])
    g = params["gal_g"]
    beta = params["gal_beta"]
    g1, g2 = g * jnp.cos(2 * beta), g * jnp.sin(2 * beta)
    Sinv = reduced_shear_matrix(-g1, -g2)  # inverse of shear(g1, g2)
    xs_ = (Sinv[0, 0] * X + Sinv[0, 1] * Y) / root_mu
    ys_ = (Sinv[1, 0] * X + Sinv[1, 1] * Y) / root_mu

    # intrinsic frame: rotate by theta + intrinsic position angle
    ang = params["theta"] + params["phi_int"]
    ca, sa = jnp.cos(ang), jnp.sin(ang)
    u = ca * xs_ + sa * ys_
    v = -sa * xs_ + ca * ys_
    q = params["q_int"]
    r = jnp.sqrt((u * jnp.sqrt(q)) ** 2 + (v / jnp.sqrt(q)) ** 2)

    ns = params["sersic_n"]
    re = params["half_light_radius"]
    gal = jnp.exp(-_sersic_b(ns) * ((r / re + 1e-12) ** (1.0 / ns) - 1.0))
    gal = gal / gal.sum()

    # clumpy core: off-center Gaussian knots in the intrinsic (u, v) frame
    # so they are lensed/rotated with the host (see SimulationConfig)
    if cfg.knot_frac_max > 0.0:
        knots = jnp.zeros_like(gal)
        inv_two_s2 = 1.0 / (2.0 * cfg.knot_sigma**2)
        for k in range(cfg.n_knots):
            du = u - params["knot_u"][k]
            dv = v - params["knot_v"][k]
            knots = knots + params["knot_f"][k] * jnp.exp(-(du * du + dv * dv) * inv_two_s2)
        knots = knots / jnp.maximum(knots.sum(), 1e-12)
        frac = params["knot_frac"]
        gal = (1.0 - frac) * gal + frac * knots

    # optional diffuse exponential envelope (see SimulationConfig)
    if cfg.env_frac_max > 0.0:
        qe = 1.0 - (1.0 - q) * cfg.env_ellip_ratio
        re_env = cfg.env_size_ratio * re
        r_env = jnp.sqrt((u * jnp.sqrt(qe)) ** 2 + (v / jnp.sqrt(qe)) ** 2)
        env = jnp.exp(-_sersic_b(1.0) * (r_env / re_env + 1e-12 - 1.0))
        frac = params["env_frac"]
        gal = (1.0 - frac) * gal + frac * env / env.sum()

    # HST-like Gaussian pre-convolution (stand-in for the COSMOS HST PSF)
    sigma_hst = cfg.hst_fwhm / 2.3548
    NUY, NUX = _freq_grid(n, s)
    mtf_hst = jnp.exp(-2 * (jnp.pi**2) * (sigma_hst**2) * (NUX**2 + NUY**2))
    gal = jnp.fft.irfft2(jnp.fft.rfft2(gal) * mtf_hst, (n, n))
    gal = jnp.maximum(gal, 0.0)
    return gal / gal.sum()


# ---------------------------------------------------------------------------
# Parameter sampling (distributions of generate_data.py:204-235)
# ---------------------------------------------------------------------------

_FWHM_X = np.array([0.45, 0.55, 0.65, 0.75, 0.85, 0.95])
_FWHM_F = np.array([0.0, 20.0, 17.0, 13.0, 9.0, 0.0])


@functools.lru_cache(maxsize=None)
def _fwhm_inverse_cdf(npoints: int = 512):
    """Inverse CDF table of the empirical seeing distribution (linear interp
    of the reference's spline table — init-time numpy)."""
    xs = np.linspace(_FWHM_X[0], _FWHM_X[-1], npoints)
    pdf = np.interp(xs, _FWHM_X, _FWHM_F)
    cdf = np.cumsum(pdf)
    cdf = cdf / cdf[-1]
    # numpy (not jnp) so the lru_cache never captures tracers
    return xs.astype(np.float32), cdf.astype(np.float32)


def sample_params(key: jax.Array, n: int, cfg: SimulationConfig) -> dict:
    """Draw all per-sample simulation parameters for a batch of size n."""
    ks = jax.random.split(key, 20)
    u = lambda k, lo, hi: jax.random.uniform(k, (n,), minval=lo, maxval=hi)
    g = lambda k, sd: sd * jax.random.normal(k, (n,))

    xs, cdf = _fwhm_inverse_cdf()
    fwhm = jnp.interp(jax.random.uniform(ks[0], (n,)), jnp.asarray(cdf), jnp.asarray(xs))

    # p(x) ∝ x on [a, b]  (galaxy shear magnitude)
    a, b_ = 0.01, 0.05
    gal_g = jnp.sqrt(jax.random.uniform(ks[1], (n,)) * (b_**2 - a**2) + a**2)

    # p(x) ∝ x^-p on [lo, hi]  (SNR)
    p = cfg.snr_power
    lo, hi = cfg.snr_min, cfg.snr_max
    t = jax.random.uniform(ks[2], (n,))
    snr = (t * (hi ** (1 - p) - lo ** (1 - p)) + lo ** (1 - p)) ** (1.0 / (1 - p))

    return dict(
        atmos_fwhm=fwhm,
        atmos_e=u(ks[3], 0.01, 0.03),
        atmos_beta=u(ks[4], 0.0, 2 * np.pi),
        defocus=g(ks[5], 0.36),
        astig1=g(ks[6], 0.07),
        astig2=g(ks[7], 0.07),
        coma1=g(ks[8], 0.07),
        coma2=g(ks[9], 0.07),
        spher=g(ks[10], 0.07),
        trefoil1=g(ks[11], 0.07),
        trefoil2=g(ks[12], 0.07),
        obscuration=u(ks[13], 0.1, 0.5),
        lam_over_diam=u(ks[14], 0.017, 0.024),
        gal_g=gal_g,
        gal_beta=u(ks[15], 0.0, 2 * np.pi),
        gal_mu=u(ks[16], 1.0, 1.1),
        theta=u(ks[17], 0.0, 2 * np.pi),
        dx=u(ks[18], -1.0, 1.0),
        dy=u(ks[19], -1.0, 1.0),
        snr=snr,
        # parametric-galaxy intrinsics (this framework's COSMOS stand-in)
        sersic_n=u(jax.random.fold_in(key, 101), cfg.sersic_n_min, cfg.sersic_n_max),
        half_light_radius=jnp.exp(
            u(jax.random.fold_in(key, 102), np.log(cfg.hlr_min), np.log(cfg.hlr_max))
        ),
        # axis-ratio range chosen so the measured gt |g| distribution matches
        # the reference benchmark's (median ~0.16, p90 ~0.4 — the COSMOS
        # population as seen by FPFS in results_200/No_Deconv gt_shear)
        q_int=u(jax.random.fold_in(key, 103), cfg.q_int_min, 1.0),
        env_frac=u(jax.random.fold_in(key, 105), cfg.env_frac_min, cfg.env_frac_max),
        phi_int=u(jax.random.fold_in(key, 104), 0.0, 2 * np.pi),
        **_sample_knot_params(key, n, cfg),
    )


def _sample_knot_params(key: jax.Array, n: int, cfg: SimulationConfig) -> dict:
    """Clumpy-core knot intrinsics: positions uniform in a disk of
    knot_r_scale x half-light radius, near-equal normalized fluxes, total
    knot flux fraction uniform on [knot_frac_min, knot_frac_max]."""
    K = cfg.n_knots
    # re-derive the same per-sample hlr drawn in sample_params (same key/fold)
    hlr = jnp.exp(jax.random.uniform(
        jax.random.fold_in(key, 102), (n,),
        minval=np.log(cfg.hlr_min), maxval=np.log(cfg.hlr_max)))
    kr = jax.random.fold_in(key, 106)
    rad = cfg.knot_r_scale * hlr[:, None] * jnp.sqrt(jax.random.uniform(kr, (n, K)))
    ang = jax.random.uniform(jax.random.fold_in(key, 107), (n, K), minval=0.0, maxval=2 * np.pi)
    f = jax.random.uniform(jax.random.fold_in(key, 108), (n, K), minval=0.5, maxval=1.5)
    return dict(
        knot_u=rad * jnp.cos(ang),
        knot_v=rad * jnp.sin(ang),
        knot_f=f / f.sum(axis=1, keepdims=True),
        knot_frac=jax.random.uniform(jax.random.fold_in(key, 109), (n,),
                                     minval=cfg.knot_frac_min, maxval=cfg.knot_frac_max),
    )


# ---------------------------------------------------------------------------
# Full observation synthesis
# ---------------------------------------------------------------------------


_downsample = average_downsample


def observe(gt_hi: jnp.ndarray, psf_hi: jnp.ndarray, noise: jnp.ndarray, cfg: SimulationConfig):
    """FFT-convolve at high resolution, downsample, add noise
    (reference generate_data.py:246-257).  Returns the observed stamp at
    fov resolution.

    The PSF stamp is centered at (n-1)/2 (render_psf); dividing out that
    centering phase before the product makes the circular convolution leave
    the galaxy's registration untouched, so obs and gt land on identical
    sub-pixel coordinates (no post-hoc fftshift roll needed)."""
    n = gt_hi.shape[-1]
    fy = jnp.fft.fftfreq(n)[:, None]
    fx = jnp.fft.rfftfreq(n)[None, :]
    decenter = jnp.exp(+2j * jnp.pi * (fy + fx) * ((n - 1) / 2.0))
    conv = jnp.fft.irfft2(
        jnp.fft.rfft2(psf_hi) * decenter * jnp.fft.rfft2(gt_hi), gt_hi.shape[-2:]
    )
    conv = _downsample(conv, cfg.upsample)
    conv = jnp.maximum(conv, 0.0)
    obs = conv + noise
    return obs


@functools.partial(jax.jit, static_argnames=("n", "cfg"))
def simulate_batch(key: jax.Array, n: int, cfg: SimulationConfig = SimulationConfig()) -> dict:
    """Simulate a batch: returns dict with obs/psf/gt (n, fov, fov) float32,
    per-sample alpha, snr, and true shear (gal_g1, gal_g2)."""
    kp, kn = jax.random.split(key)
    params = sample_params(kp, n, cfg)
    sigma = noise_sigma(cfg.pixel_scale)

    def one(i):
        p = jax.tree.map(lambda a: a[i], params)
        psf_hi = render_psf(p, cfg)
        gal_hi = render_galaxy(p, cfg)
        return psf_hi, gal_hi

    psf_hi, gal_hi = jax.lax.map(one, jnp.arange(n))

    gal_down = _downsample(gal_hi, cfg.upsample)
    alpha = params["snr"] * sigma / jnp.sqrt((gal_down**2).sum(axis=(-2, -1)))
    gt_hi = alpha[:, None, None] * gal_hi

    noise = sigma * jax.random.normal(kn, (n, cfg.fov_pixels, cfg.fov_pixels))
    obs = observe(gt_hi, psf_hi, noise, cfg)

    g1 = params["gal_g"] * jnp.cos(2 * params["gal_beta"])
    g2 = params["gal_g"] * jnp.sin(2 * params["gal_beta"])
    return dict(
        obs=obs.astype(jnp.float32),
        psf=_downsample(psf_hi, cfg.upsample).astype(jnp.float32),
        gt=_downsample(gt_hi, cfg.upsample).astype(jnp.float32),
        alpha=alpha.astype(jnp.float32),
        snr=params["snr"].astype(jnp.float32),
        gal_g1=g1.astype(jnp.float32),
        gal_g2=g2.astype(jnp.float32),
    )


@functools.partial(jax.jit, static_argnames=("n", "cfg"))
def simulate_batch_denoise(key: jax.Array, n: int, cfg: SimulationConfig = SimulationConfig()) -> dict:
    """Denoising-task variant (reference generate_data.py:337-452): no PSF
    convolution — obs = gt + CCD noise.  SNR drawn p ∝ x^-0.44 on [18, 320]
    as in the reference's denoise generator."""
    kp, kn = jax.random.split(key)
    params = sample_params(kp, n, cfg)
    # reference denoise-task SNR distribution
    p, lo, hi = 0.44, 18.0, 320.0
    t = jax.random.uniform(jax.random.fold_in(kp, 55), (n,))
    snr = (t * (hi ** (1 - p) - lo ** (1 - p)) + lo ** (1 - p)) ** (1.0 / (1 - p))
    sigma = noise_sigma(cfg.pixel_scale)

    gal_hi = jax.lax.map(lambda i: render_galaxy(jax.tree.map(lambda a: a[i], params), cfg), jnp.arange(n))
    gal_down = _downsample(gal_hi, cfg.upsample)
    alpha = snr * sigma / jnp.sqrt((gal_down**2).sum(axis=(-2, -1)))
    gt = alpha[:, None, None] * gal_down
    obs = gt + sigma * jax.random.normal(kn, gt.shape)
    g1 = params["gal_g"] * jnp.cos(2 * params["gal_beta"])
    g2 = params["gal_g"] * jnp.sin(2 * params["gal_beta"])
    return dict(
        obs=obs.astype(jnp.float32),
        psf=jnp.zeros_like(obs),
        gt=gt.astype(jnp.float32),
        alpha=alpha.astype(jnp.float32),
        snr=snr.astype(jnp.float32),
        gal_g1=g1.astype(jnp.float32),
        gal_g2=g2.astype(jnp.float32),
    )


@functools.partial(jax.jit, static_argnames=("n", "cfg"))
def simulate_batch_denoise_unit(key: jax.Array, n: int, cfg: SimulationConfig = SimulationConfig()) -> dict:
    """Unit-scale denoising task: the same stamps as
    :func:`simulate_batch_denoise` divided by their per-sample flux scale
    alpha, so obs = gal + noise/alpha lives on the scale of the ADMM loop
    variable (x in [0, 1], reference models/ADMMNet.py:96-101 init).  A
    denoiser trained here is scale-consistent with ADMMNet's z-update
    input x + u1 (reference ``:123``), unlike the reference's raw-ADU
    denoise training (generate_data.py:423-431)."""
    b = simulate_batch_denoise(key, n, cfg)
    a = b["alpha"][:, None, None]
    return {**b, "obs": (b["obs"] / a).astype(jnp.float32), "gt": (b["gt"] / a).astype(jnp.float32)}


# fixed_snr is traced (0-d scalar), NOT static: one compilation serves every
# SNR variant in the benchmark sweep
@functools.partial(jax.jit, static_argnames=("n", "cfg"))
def simulate_batch_at_snr(key: jax.Array, n: int, fixed_snr: float, cfg: SimulationConfig = SimulationConfig()) -> dict:
    """Same galaxies/PSFs as :func:`simulate_batch` for this key, but flux
    scaled to a fixed SNR (the reference's obs_{snr} test variants)."""
    kp, kn = jax.random.split(key)
    params = sample_params(kp, n, cfg)
    params = dict(params, snr=jnp.full((n,), fixed_snr, jnp.float32))
    sigma = noise_sigma(cfg.pixel_scale)

    def one(i):
        p = jax.tree.map(lambda a: a[i], params)
        return render_psf(p, cfg), render_galaxy(p, cfg)

    psf_hi, gal_hi = jax.lax.map(one, jnp.arange(n))
    gal_down = _downsample(gal_hi, cfg.upsample)
    alpha = params["snr"] * sigma / jnp.sqrt((gal_down**2).sum(axis=(-2, -1)))
    gt_hi = alpha[:, None, None] * gal_hi
    noise = sigma * jax.random.normal(kn, (n, cfg.fov_pixels, cfg.fov_pixels))
    obs = observe(gt_hi, psf_hi, noise, cfg)
    g1 = params["gal_g"] * jnp.cos(2 * params["gal_beta"])
    g2 = params["gal_g"] * jnp.sin(2 * params["gal_beta"])
    return dict(
        obs=obs.astype(jnp.float32),
        psf=_downsample(psf_hi, cfg.upsample).astype(jnp.float32),
        gt=_downsample(gt_hi, cfg.upsample).astype(jnp.float32),
        alpha=alpha.astype(jnp.float32),
        snr=params["snr"],
        gal_g1=g1.astype(jnp.float32),
        gal_g2=g2.astype(jnp.float32),
    )


# shear_err/fwhm_err are traced scalars, NOT static: the 20 robustness
# error levels share one compilation instead of recompiling the full
# optics pipeline per level
@functools.partial(jax.jit, static_argnames=("n", "cfg"))
def simulate_perturbed_psfs(
    key: jax.Array,
    n: int,
    cfg: SimulationConfig = SimulationConfig(),
    shear_err: float = 0.0,
    fwhm_err: float = 0.0,
) -> jnp.ndarray:
    """PSFs with systematic errors for the robustness sweeps
    (reference generate_data.py:291-315): each sample's true PSF re-rendered
    with an extra +-shear_err on (g1, g2) or +-fwhm_err on the seeing."""
    kp, ke = jax.random.split(key)
    params = sample_params(kp, n, cfg)
    signs = jnp.where(jax.random.uniform(ke, (n, 3)) > 0.5, 1.0, -1.0)

    def one(i):
        p = jax.tree.map(lambda a: a[i], params)
        g1e = signs[i, 0] * shear_err
        g2e = signs[i, 1] * shear_err
        fwhm = p["atmos_fwhm"] + signs[i, 2] * fwhm_err
        fwhm = jnp.where(fwhm < 0, fwhm + 2 * fwhm_err, fwhm)
        return render_psf(p, cfg, g1_err=g1e, g2_err=g2e, fwhm=fwhm)

    psf_hi = jax.lax.map(one, jnp.arange(n))
    return _downsample(psf_hi, cfg.upsample).astype(jnp.float32)
