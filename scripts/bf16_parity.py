"""bf16-vs-fp32 accuracy parity on the current flagship + benchmark.

VERDICT round-3 weak #4: the bf16-neutrality numbers in RESULTS.md were
measured on the round-2 population/checkpoints and went stale after the
retrain and the new benchmark.  This re-measures on the current best
flagship checkpoint and the 10k benchmark dataset (and, after the
round-4 metric fix, under the linear-FPFS estimator): the flagship is
run with the denoiser/SubNet in fp32 and in bf16 (FFT solves stay fp32
in both — models/unrolled_admm_gaussian.py dtype), and the benchmark
metric compared per SNR.

Usage: python scripts/bf16_parity.py [--n_gal 2000] [--out figures/bf16_parity.json]
"""

import argparse
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="datasets/LSST_23.5_deconv_tpu_10k")
    ap.add_argument("--n_gal", type=int, default=2000)
    ap.add_argument("--batch", type=int, default=250)
    ap.add_argument("--snrs", type=int, nargs="+", default=[20, 100, 200])
    ap.add_argument("--ckpt", default="saved_models_online")
    ap.add_argument("--ckpt_name", default="Gaussian_PnP_ADMM_8iters_MultiScale")
    ap.add_argument("--out", default="figures/bf16_parity.json")
    args = ap.parse_args()

    import jax.numpy as jnp
    import numpy as np

    from galaxy_deconv_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()

    from galaxy_deconv_tpu.data.dataset import GalaxyDataset
    from galaxy_deconv_tpu.eval.harness import _batched_rec_shear, make_apply_fn
    from galaxy_deconv_tpu.metrics import estimate_shear
    from galaxy_deconv_tpu.train.checkpoint import best_epoch, restore_checkpoint, unpack_variables

    src, ep = args.ckpt, best_epoch(args.ckpt, args.ckpt_name)
    if not ep:
        src, ep = "trained", best_epoch("trained", args.ckpt_name)
    variables = unpack_variables(restore_checkpoint(src, args.ckpt_name, ep))
    print(f"flagship checkpoint: {src}/{args.ckpt_name} step {ep}")

    report = {"ckpt": f"{src}/{args.ckpt_name}_{ep}", "data": args.data,
              "n_gal": args.n_gal, "rows": {}}
    for dtype in ("float32", "bfloat16"):
        apply_fn = make_apply_fn("Unrolled_ADMM_Gaussian(8)", variables, dtype=jnp.dtype(dtype))
        for snr in args.snrs:
            ds = GalaxyDataset(args.data, "test", obs_variant=f"obs_{snr}")
            rec = _batched_rec_shear(apply_fn, ds, args.n_gal, args.batch, "model")
            gt = np.asarray(estimate_shear(jnp.asarray(ds.gt[: args.n_gal].astype(np.float32))))
            err = float(np.median(np.minimum(np.abs(rec[:, 2] - gt[: len(rec), 2]), 1)))
            report["rows"].setdefault(str(snr), {})[dtype] = err
            print(f"{dtype:9s} snr={snr:3d}: median err {err:.4f}")

    out = pathlib.Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(report, indent=1))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
