"""Headline benchmark: 8-iter Unrolled-ADMM inference throughput per chip.

Measures the full evaluation pipeline — flagship UnrolledADMMGaussian(8)
forward + on-device FPFS-style shear measurement — on large batches, and
reports galaxies/sec/chip.  Baseline: the reference's PyTorch single-GPU
pipeline at batch size 1 including CPU FPFS measurement, 0.0590 s/galaxy
(~17 gal/s) from results_200/Unrolled_ADMM_Gaussian(8)/results.json.

Prints ONE JSON line:
  {"metric": "galaxies_per_sec_per_chip_admm8", "value": N,
   "unit": "gal/s/chip", "vs_baseline": N/17}
"""

import argparse
import json
import sys
import time

BASELINE_GAL_PER_SEC = 1.0 / 0.0590  # reference 8-iter ADMM incl. shear measure


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=256,
                        help="256 is the measured throughput-optimal batch on v5e, re-tuned "
                             "after the round-5 matmul-DFT spectral path (ops/dft.py): "
                             "B=128/256/512/1024 -> 10.9k/11.8k/11.1k/9.7k gal/s")
    parser.add_argument("--repeats", type=int, default=40)
    parser.add_argument("--quick", action="store_true", help="small batch / few repeats")
    parser.add_argument("--cpu", action="store_true", help="force CPU backend")
    parser.add_argument("--dtype", type=str, default="bfloat16", choices=["float32", "bfloat16"],
                        help="denoiser/SubNet compute dtype (FFT solves stay fp32; bf16 verified "
                             "accuracy-neutral on the trained flagship — see RESULTS.md)")
    args = parser.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.quick:
        args.batch, args.repeats = 64, 3

    import jax.numpy as jnp
    import numpy as np

    from galaxy_deconv_tpu.metrics import estimate_shear
    from galaxy_deconv_tpu.models import UnrolledADMMGaussian
    from galaxy_deconv_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)

    rng = np.random.default_rng(0)
    B = args.batch
    obs = jnp.asarray(np.abs(rng.standard_normal((B, 48, 48))).astype(np.float32) * 20)
    psf = jnp.asarray(np.abs(rng.standard_normal((B, 48, 48))).astype(np.float32))
    psf = psf / psf.sum(axis=(1, 2), keepdims=True) / 16.0
    alpha = jnp.asarray(np.full((B,), 50.0, np.float32))

    model = UnrolledADMMGaussian(n_iters=8, features=(32, 64, 128, 256), dtype=jnp.dtype(args.dtype))
    variables = model.init(jax.random.PRNGKey(0), obs[:1], psf[:1], alpha[:1])

    @jax.jit
    def pipeline(obs, psf, alpha):
        rec = model.apply(variables, obs, psf, alpha)
        return estimate_shear(rec)

    # compile + warmup
    pipeline(obs, psf, alpha).block_until_ready()
    t0 = time.time()
    for _ in range(args.repeats):
        out = pipeline(obs, psf, alpha)
    # Fetch the result to the host inside the timed region: over the tunneled
    # backend block_until_ready can return before remote execution completes
    # (DESIGN.md risk #10); a device->host copy cannot.  Calls are serialized
    # on the single device stream, so fetching the last output fences all
    # preceding repeats too.
    np.asarray(out)
    elapsed = time.time() - t0

    gal_per_sec = args.repeats * B / elapsed
    print(f"{args.repeats} x {B} galaxies in {elapsed:.3f}s", file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": "galaxies_per_sec_per_chip_admm8",
                "value": round(gal_per_sec, 1),
                "unit": "gal/s/chip",
                "vs_baseline": round(gal_per_sec / BASELINE_GAL_PER_SEC, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
