"""Per-component profile of the headline bench pipeline (round-5 perf attack).

The MFU/roofline report (scripts/mfu.py, RESULTS.md) says the ADMM(8)
pipeline sustains 43.4% MFU and is nominally HBM-bound — but XLA's
"bytes accessed" over-counts post-fusion traffic, and 50% of the ResUNet
conv FLOPs run at narrow channel widths (32/64) that cannot fill the
128-lane MXU.  This script separates the candidate ceilings by *measured
time* rather than modeled bytes:

  full       - the exact bench.py pipeline (model fwd + shear measure)
  model      - solver forward only
  shear      - measurement only
  denoiser8  - 8 sequential ResUNet passes (the conv budget, no FFT)
  fftpath    - spectra + Wiener init + 8x (x-update + dual), denoiser
               replaced by identity (the FFT/pointwise budget, no convs)
  conv_s{i}  - one 3x3 conv at each UNet stage's (spatial, channels) to
               get achieved TFLOP/s per stage (MXU-lane-utilization probe)
  loop{n}    - full pipeline under an on-device lax.fori_loop of n reps
               (separates per-dispatch host/tunnel overhead from device time)

Writes figures/op_profile.json.  Run alone (tunnel discipline: one TPU
client at a time).
"""

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--repeats", type=int, default=40)
    ap.add_argument("--dtype", default="bfloat16", choices=["float32", "bfloat16"])
    ap.add_argument("--out", default="figures/op_profile.json")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from galaxy_deconv_tpu.metrics import estimate_shear
    from galaxy_deconv_tpu.models import UnrolledADMMGaussian
    from galaxy_deconv_tpu.models.unrolled_admm_gaussian import (
        gaussian_spectra,
        wiener_init,
        x_update,
    )
    from galaxy_deconv_tpu.nets import ResUNet
    from galaxy_deconv_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    dtype = jnp.dtype(args.dtype)
    B = args.batch
    rng = np.random.default_rng(0)
    obs = jnp.asarray(np.abs(rng.standard_normal((B, 48, 48))).astype(np.float32) * 20)
    psf = jnp.asarray(np.abs(rng.standard_normal((B, 48, 48))).astype(np.float32))
    psf = psf / psf.sum(axis=(1, 2), keepdims=True) / 16.0
    alpha = jnp.asarray(np.full((B,), 50.0, np.float32))

    model = UnrolledADMMGaussian(n_iters=8, features=(32, 64, 128, 256), dtype=dtype)
    variables = model.init(jax.random.PRNGKey(0), obs[:1], psf[:1], alpha[:1])

    report = {"batch": B, "repeats": args.repeats, "dtype": args.dtype,
              "device": str(jax.devices()[0]), "timings_ms": {}, "gal_per_sec": {}}

    def timed(name, fn, *xs, reps=args.repeats, flops_per_call=None):
        f = jax.jit(fn)
        out = f(*xs)
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(reps):
            out = f(*xs)
        # host fetch fences the tunneled stream (DESIGN.md risk #10)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        dt = (time.time() - t0) / reps
        entry = {"ms_per_call": dt * 1e3, "gal_per_sec": B / dt}
        if flops_per_call:
            entry["tflops_per_sec"] = flops_per_call / dt / 1e12
        report["timings_ms"][name] = entry
        print(f"{name:14s} {dt * 1e3:8.3f} ms  {B / dt:10.0f} gal/s"
              + (f"  {entry['tflops_per_sec']:6.1f} TF/s" if flops_per_call else ""))
        return dt

    # --- full pipeline / model / shear ---
    def pipeline(o, p, a):
        return estimate_shear(model.apply(variables, o, p, a))

    t_full = timed("full", pipeline, obs, psf, alpha)
    timed("model", lambda o, p, a: model.apply(variables, o, p, a), obs, psf, alpha)
    timed("shear", estimate_shear, obs)

    # --- denoiser-only x8 (sequential, mirrors the unrolled loop) ---
    dn = ResUNet(features=(32, 64, 128, 256), dtype=dtype)
    x48 = obs[..., None]
    dn_vars = dn.init(jax.random.PRNGKey(0), x48[:1])

    def denoiser8(x):
        for _ in range(8):
            x = dn.apply(dn_vars, x)
        return x

    timed("denoiser8", denoiser8, x48)
    timed("denoiser1", lambda x: dn.apply(dn_vars, x), x48)

    # --- FFT/pointwise path only (identity denoiser), both spectral impls ---
    def make_fftpath(impl):
        def fftpath(y, p, a):
            y = jnp.maximum(y, 0.0)
            shape = (48, 48)
            Y, Ht, HtH = gaussian_spectra(y, p, impl)
            z = wiener_init(Y, Ht, HtH, a, shape, impl)
            u = jnp.zeros_like(y)
            for _ in range(8):
                rho = jnp.full((y.shape[0], 1, 1), 0.5, jnp.float32)
                x = x_update(Y, Ht, HtH, z, u, rho, shape, impl)
                z = x  # identity "denoiser"
                u = u + rho * (x - z)
            return z

        return fftpath

    timed("fftpath_xla", make_fftpath("xla"), obs, psf, alpha)
    timed("fftpath_dft", make_fftpath("matmul"), obs, psf, alpha)

    # --- per-stage conv probe: achieved TFLOP/s vs channel width ---
    stages = [(48, 32), (24, 64), (12, 128), (6, 256)]
    import flax.linen as nn

    for s, c in stages:
        x = jnp.zeros((B, s, s, c), dtype)
        conv = nn.Conv(c, (3, 3), padding="SAME", use_bias=False, dtype=dtype)
        cv = conv.init(jax.random.PRNGKey(0), x)

        def conv_n(x, conv=conv, cv=cv):
            for _ in range(16):  # enough work to swamp dispatch
                x = conv.apply(cv, x)
            return x

        flops = 16 * 2 * B * s * s * 9 * c * c
        timed(f"conv_{s}x{s}x{c}", conv_n, x, flops_per_call=flops)

    # --- dispatch-overhead probe: on-device repeat loop ---
    def pipeline_loop(o, p, a, n):
        # the carry feeds the next iteration's input so XLA cannot hoist the
        # loop-invariant body out of the while (which would time an empty loop)
        def body(_, carry):
            o2 = o + 1e-12 * carry[0, 0]
            return estimate_shear(model.apply(variables, o2, p, a))

        return jax.lax.fori_loop(0, n, body, jnp.zeros((B, 3)))

    for n in (8,):
        f = jax.jit(lambda o, p, a: pipeline_loop(o, p, a, n))
        out = f(obs, psf, alpha)
        jax.block_until_ready(out)
        reps = max(args.repeats // n, 3)
        t0 = time.time()
        for _ in range(reps):
            out = f(obs, psf, alpha)
        np.asarray(out)
        dt = (time.time() - t0) / (reps * n)
        report["timings_ms"][f"loop{n}"] = {"ms_per_call": dt * 1e3, "gal_per_sec": B / dt}
        print(f"{'loop%d' % n:14s} {dt * 1e3:8.3f} ms  {B / dt:10.0f} gal/s   (per-iteration, on-device loop)")

    report["dispatch_overhead_ms"] = (
        report["timings_ms"]["full"]["ms_per_call"] - report["timings_ms"]["loop8"]["ms_per_call"]
    )
    out_path = pathlib.Path(args.out)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    out_path.write_text(json.dumps(report, indent=1))
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
