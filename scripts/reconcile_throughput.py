"""Reconcile the headline bench throughput with the eval-harness throughput.

Round-2 left an unexplained 8.6x gap between `bench.py` (9.2k gal/s,
batch 256, bf16, device-resident inputs) and the committed eval `time`
entries (~1.1k gal/s for ADMM(8), fp32, batch 250, memmap + H2D per
batch).  This script measures the flagship pipeline's throughput under
each configuration step between the two, so the gap decomposes into its
actual causes:

  A. eval harness as committed        (fp32, batch 250, disk -> H2D per batch)
  B. A + bench batch size             (fp32, batch 256)
  C. B + bf16 denoiser                (bf16, batch 256)
  D. C with device-resident inputs    (= bench.py configuration)

Writes figures/throughput_reconciliation.json and prints the table.
Run on the TPU (this is a timing experiment): python scripts/reconcile_throughput.py
"""

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data", default="datasets/LSST_23.5_deconv_tpu_10k")
    parser.add_argument("--n_gal", type=int, default=4000)
    parser.add_argument("--ckpt_name", default="Gaussian_PnP_ADMM_8iters_MultiScale")
    parser.add_argument("--out", default="figures/throughput_reconciliation.json")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from galaxy_deconv_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    import numpy as np

    from galaxy_deconv_tpu.data import GalaxyDataset
    from galaxy_deconv_tpu.eval.harness import _batched_rec_shear, make_apply_fn
    from galaxy_deconv_tpu.metrics import estimate_shear
    from galaxy_deconv_tpu.models import build_model
    from galaxy_deconv_tpu.train.checkpoint import best_epoch, restore_checkpoint, unpack_variables

    src, ep = "saved_models_online", best_epoch("saved_models_online", args.ckpt_name)
    if not ep:
        src, ep = "trained", best_epoch("trained", args.ckpt_name)
    variables = unpack_variables(restore_checkpoint(src, args.ckpt_name, ep))
    ds = GalaxyDataset(args.data, "test")

    rows = {}

    def harness_config(label, batch, dtype):
        apply_fn = make_apply_fn("Unrolled_ADMM_Gaussian(8)", variables, dtype=jnp.dtype(dtype))
        n = (args.n_gal // batch) * batch
        _batched_rec_shear(apply_fn, ds, batch, batch, "x")  # warm-up/compile
        t0 = time.time()
        _batched_rec_shear(apply_fn, ds, n, batch, "x")
        dt = time.time() - t0
        # the harness input mode changed in round 5: bulk upload per variant
        # + on-device slicing (eval/harness.py _rec_shear_bulk) replaced the
        # per-batch H2D round-trips this ladder originally diagnosed
        rows[label] = {"batch": batch, "dtype": dtype,
                       "input": "memmap -> bulk upload + on-device slicing",
                       "gal_per_sec": round(n / dt, 1)}
        print(f"{label}: {n / dt:.0f} gal/s")

    harness_config("A_eval_harness_fp32_b250", 250, "float32")
    harness_config("B_plus_batch256", 256, "float32")
    harness_config("C_plus_bf16", 256, "bfloat16")

    # D: bench.py configuration — same model+measure pipeline, inputs already
    # on device, repeats over one resident batch (bench.py methodology incl.
    # the host-fetch fence)
    model = build_model("Unrolled_ADMM_Gaussian(8)", dtype=jnp.bfloat16)
    b = ds.batch(np.arange(256))
    obs, psf, alpha = jnp.asarray(b["obs"]), jnp.asarray(b["psf"]), jnp.asarray(b["alpha"])

    @jax.jit
    def pipeline(obs, psf, alpha):
        return estimate_shear(model.apply(variables, obs, psf, alpha))

    np.asarray(pipeline(obs, psf, alpha))
    reps = max(args.n_gal // 256, 10)
    t0 = time.time()
    for _ in range(reps):
        out = pipeline(obs, psf, alpha)
    np.asarray(out)  # host fetch fences the stream
    dt = time.time() - t0
    rows["D_device_resident_bf16_b256"] = {"batch": 256, "dtype": "bfloat16",
                                           "input": "device-resident",
                                           "gal_per_sec": round(reps * 256 / dt, 1)}
    print(f"D_device_resident_bf16_b256: {reps * 256 / dt:.0f} gal/s")

    out = pathlib.Path(args.out)
    out.parent.mkdir(exist_ok=True)
    report = {"ckpt": f"{src}/{args.ckpt_name}_{ep}epochs", "n_gal": args.n_gal, "configs": rows}
    out.write_text(json.dumps(report, indent=1))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
