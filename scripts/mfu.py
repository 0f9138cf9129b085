"""MFU / roofline report for the headline bench pipeline (VERDICT #5).

FLOPs come from XLA's compiled-executable cost analysis of exactly the
`bench.py` pipeline (flagship UnrolledADMMGaussian(8) forward + on-device
shear measurement); throughput comes from a live `bench.py`-style timed run
(or ``--gal_per_sec`` to reuse a recorded number, e.g. while the TPU is
busy training).  Reports FLOPs/galaxy, sustained TFLOP/s, % of v5e peak,
and the roofline position (arithmetic intensity vs the HBM knee).

The denoiser-only cost is measured separately so the report can split
MXU-eligible conv FLOPs (8 ResUNet passes/galaxy) from the FFT/pointwise
remainder — the reference has no analogous measurement (its timing is
test.py:110-192 wall-clock only).

Usage: python scripts/mfu.py [--batch 256] [--gal_per_sec N] [--cpu-flops]
"""

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

# TPU v5e (v5 lite) single-chip peaks, from the public spec sheet
V5E_PEAK_BF16 = 197e12  # FLOP/s
V5E_PEAK_FP32 = V5E_PEAK_BF16 / 2  # fp32 runs the MXU at half rate
V5E_HBM_BW = 819e9      # bytes/s


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=256)
    parser.add_argument("--repeats", type=int, default=40)
    parser.add_argument("--dtype", default="bfloat16", choices=["float32", "bfloat16"])
    parser.add_argument("--gal_per_sec", type=float, default=None,
                        help="skip the timed run and use this measured throughput")
    parser.add_argument("--cpu-flops", action="store_true",
                        help="count FLOPs on the CPU backend (no TPU needed; FLOP "
                             "counts are algorithmic and backend-independent)")
    args = parser.parse_args()

    import jax

    if args.cpu_flops and args.gal_per_sec is None:
        parser.error("--cpu-flops requires --gal_per_sec (cannot time on CPU)")
    if args.cpu_flops:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from galaxy_deconv_tpu.metrics import estimate_shear
    from galaxy_deconv_tpu.models import UnrolledADMMGaussian

    rng = np.random.default_rng(0)
    B = args.batch
    obs = jnp.asarray(np.abs(rng.standard_normal((B, 48, 48))).astype(np.float32) * 20)
    psf = jnp.asarray(np.abs(rng.standard_normal((B, 48, 48))).astype(np.float32))
    psf = psf / psf.sum(axis=(1, 2), keepdims=True) / 16.0
    alpha = jnp.asarray(np.full((B,), 50.0, np.float32))

    model = UnrolledADMMGaussian(n_iters=8, features=(32, 64, 128, 256), dtype=jnp.dtype(args.dtype))
    variables = model.init(jax.random.PRNGKey(0), obs[:1], psf[:1], alpha[:1])

    def pipeline(obs, psf, alpha):
        rec = model.apply(variables, obs, psf, alpha)
        return estimate_shear(rec)

    compiled = jax.jit(pipeline).lower(obs, psf, alpha).compile()
    cost = compiled.cost_analysis()
    cost = cost[0] if isinstance(cost, (list, tuple)) else cost
    flops = float(cost.get("flops", 0.0))
    bytes_accessed = float(cost.get("bytes accessed", 0.0))

    # denoiser-only cost: isolates the MXU-eligible conv work (the z-update
    # ResUNet runs once per ADMM iteration = 8x per galaxy)
    from galaxy_deconv_tpu.nets import ResUNet

    dn = ResUNet(features=(32, 64, 128, 256), dtype=jnp.dtype(args.dtype))
    x48 = jnp.zeros((B, 48, 48, 1), jnp.dtype(args.dtype))
    dn_vars = dn.init(jax.random.PRNGKey(0), x48)
    dn_cost = jax.jit(lambda v, x: dn.apply(v, x)).lower(dn_vars, x48).compile().cost_analysis()
    dn_cost = dn_cost[0] if isinstance(dn_cost, (list, tuple)) else dn_cost
    dn_flops = float(dn_cost.get("flops", 0.0))

    if args.gal_per_sec is not None:
        gal_per_sec = args.gal_per_sec
        timed = "supplied"
    else:
        fn = jax.jit(pipeline)
        fn(obs, psf, alpha).block_until_ready()
        t0 = time.time()
        for _ in range(args.repeats):
            out = fn(obs, psf, alpha)
        np.asarray(out)  # host fetch fences the stream (DESIGN.md risk #10)
        gal_per_sec = args.repeats * B / (time.time() - t0)
        timed = "measured"

    flops_per_gal = flops / B
    conv_flops_per_gal = 8 * dn_flops / B
    tflops = gal_per_sec * flops_per_gal / 1e12
    # MFU against the dtype-matched peak (fp32 halves the MXU rate)
    peak = V5E_PEAK_BF16 if args.dtype == "bfloat16" else V5E_PEAK_FP32
    mfu = tflops * 1e12 / peak
    intensity = flops / bytes_accessed if bytes_accessed else float("nan")
    knee = peak / V5E_HBM_BW  # FLOP/byte where HBM stops binding

    report = {
        "batch": B,
        "dtype": args.dtype,
        "gal_per_sec": round(gal_per_sec, 1),
        "throughput_source": timed,
        "flops_per_galaxy": round(flops_per_gal),
        "conv_flops_per_galaxy_8xResUNet": round(conv_flops_per_gal),
        # estimate only: compares a standalone-compiled ResUNet's FLOPs to
        # the fused full-pipeline count; XLA fusion/remat can shift either
        "conv_fraction_estimate": round(conv_flops_per_gal / flops_per_gal, 3),
        "sustained_tflops": round(tflops, 1),
        "peak_tflops_dtype_matched": round(peak / 1e12, 1),
        "mfu_vs_dtype_peak": round(mfu, 4),
        "bytes_accessed_per_galaxy": round(bytes_accessed / B),
        "arithmetic_intensity_flop_per_byte": round(intensity, 1),
        "v5e_roofline_knee_flop_per_byte": round(knee, 1),
        "hbm_bound": bool(intensity < knee),
    }
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
