"""Adaptive-moments (elliptical-Gaussian-fit) shear estimation.

The reference ships an alternative shear measurement based on ngmix's
maximum-likelihood Gaussian mixtures (``utils/utils_ngmix.py``, notebook
only).  The TPU-native equivalent here is the classic adaptive-moments
fixed point (HSM/KSB family, Hirata & Seljak 2003): iterate an elliptical
Gaussian weight until its covariance matches the weighted second moments of
the stamp — the fixed point is exactly the best-fit elliptical Gaussian,
giving centroid, size T, and ellipticity per stamp.

For a Gaussian image with covariance S and weight covariance W the weighted
moments measure P = (S^-1 + W^-1)^-1; the update W <- 2P has S as its fixed
point.  Everything is batched closed-form 2x2 algebra under lax.fori_loop —
one jitted call for the whole galaxy set, no per-object python (the ngmix
path runs one EM + LM fit per galaxy on CPU).

When the real ``ngmix`` package is installed,
:func:`estimate_shear_ngmix_reference` provides the cross-check path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("n_iter",))
def adaptive_moments(images: jnp.ndarray, n_iter: int = 30) -> dict[str, jnp.ndarray]:
    """Best-fit elliptical Gaussian of each (B, H, W) stamp.

    Returns dict of (B,) arrays: cx, cy (pixels), T = Mxx + Myy,
    e1, e2 (distortion definition), flux (weighted amplitude proxy),
    converged (bool-ish residual measure).
    """
    B, H, W = images.shape
    images = jnp.maximum(images, 0.0)
    ys = jnp.arange(H, dtype=jnp.float32)[None, :, None]
    xs = jnp.arange(W, dtype=jnp.float32)[None, None, :]

    def weighted_moments(state):
        cx, cy, mxx, mxy, myy = state
        det = jnp.maximum(mxx * myy - mxy**2, 1e-6)
        wxx = myy / det
        wxy = -mxy / det
        wyy = mxx / det
        dx = xs - cx[:, None, None]
        dy = ys - cy[:, None, None]
        q = wxx[:, None, None] * dx**2 + 2 * wxy[:, None, None] * dx * dy + wyy[:, None, None] * dy**2
        w = jnp.exp(-0.5 * q)
        iw = images * w
        tot = iw.sum(axis=(-2, -1)) + 1e-12
        ncx = (iw * xs).sum(axis=(-2, -1)) / tot
        ncy = (iw * ys).sum(axis=(-2, -1)) / tot
        dx = xs - ncx[:, None, None]
        dy = ys - ncy[:, None, None]
        pxx = (iw * dx * dx).sum(axis=(-2, -1)) / tot
        pxy = (iw * dx * dy).sum(axis=(-2, -1)) / tot
        pyy = (iw * dy * dy).sum(axis=(-2, -1)) / tot
        return ncx, ncy, pxx, pxy, pyy, tot

    def body(_, state):
        cx, cy, mxx, mxy, myy = state
        ncx, ncy, pxx, pxy, pyy, _ = weighted_moments(state)
        # W <- 2P, floored to stay positive-definite
        nxx = jnp.maximum(2 * pxx, 0.25)
        nyy = jnp.maximum(2 * pyy, 0.25)
        nxy = jnp.clip(2 * pxy, -jnp.sqrt(nxx * nyy) * 0.99, jnp.sqrt(nxx * nyy) * 0.99)
        return (ncx, ncy, nxx, nxy, nyy)

    init = (
        jnp.full((B,), (W - 1) / 2.0),
        jnp.full((B,), (H - 1) / 2.0),
        jnp.full((B,), 4.0),
        jnp.zeros((B,)),
        jnp.full((B,), 4.0),
    )
    cx, cy, mxx, mxy, myy = jax.lax.fori_loop(0, n_iter, body, init)
    _, _, pxx, pxy, pyy, flux = weighted_moments((cx, cy, mxx, mxy, myy))
    resid = jnp.abs(2 * pxx - mxx) + jnp.abs(2 * pyy - myy) + 2 * jnp.abs(2 * pxy - mxy)

    T = mxx + myy
    e1 = (mxx - myy) / jnp.maximum(T, 1e-6)
    e2 = 2 * mxy / jnp.maximum(T, 1e-6)
    return {"cx": cx, "cy": cy, "T": T, "e1": e1, "e2": e2, "flux": flux, "resid": resid}


@functools.partial(jax.jit, static_argnames=("n_iter",))
def estimate_shear_adaptive(images: jnp.ndarray, n_iter: int = 30) -> jnp.ndarray:
    """(B, H, W) -> (B, 3) of (g1, g2, |g|): adaptive-moments distortion
    converted to reduced shear (e = 2g/(1+|g|^2))."""
    m = adaptive_moments(images, n_iter)
    e = jnp.sqrt(m["e1"] ** 2 + m["e2"] ** 2)
    e_safe = jnp.clip(e, 1e-12, 0.999)
    g_over_e = 1.0 / (1.0 + jnp.sqrt(jnp.maximum(1.0 - e_safe**2, 0.0)))
    g1 = m["e1"] * g_over_e
    g2 = m["e2"] * g_over_e
    return jnp.stack([g1, g2, jnp.hypot(g1, g2)], axis=-1)


def estimate_shear_ngmix_reference(obs: np.ndarray, psf: np.ndarray):
    """CPU cross-check via the real ngmix package when installed
    (the reference's bootstrapper recipe, utils/utils_ngmix.py)."""
    import ngmix  # optional dependency

    jac = ngmix.DiagonalJacobian(row=obs.shape[0] / 2, col=obs.shape[1] / 2, scale=0.2)
    psf_obs = ngmix.Observation(psf, jacobian=jac)
    o = ngmix.Observation(obs, jacobian=jac, psf=psf_obs)
    am = ngmix.admom.AdmomFitter()
    res = am.go(o, 0.3)
    return res["e1"], res["e2"]
