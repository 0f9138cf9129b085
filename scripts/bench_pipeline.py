"""Input-pipeline throughput probe (the reference's utils/num_workers.py
analog: it benchmarked DataLoader worker counts; here the two input paths
are the on-device simulator and the packed-memmap dataset reader).

Measures galaxies/sec of
  * ``simulate_batch`` (the online-training input path) per batch size,
  * ``GalaxyDataset`` + ``iterate_batches`` host reads (the offline path),
  * host->device transfer of those batches.

Usage: python scripts/bench_pipeline.py [--data datasets/LSST_23.5_deconv_tpu]
         [--cpu] [--batches 64 256]
"""

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data", default="datasets/LSST_23.5_deconv_tpu")
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--batches", type=int, nargs="*", default=[64, 256, 1024])
    parser.add_argument("--repeats", type=int, default=10)
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from galaxy_deconv_tpu.data import GalaxyDataset, SimulationConfig, iterate_batches
    from galaxy_deconv_tpu.data.simulate import simulate_batch

    cfg = SimulationConfig()
    print(f"device: {jax.devices()[0]}")

    for B in args.batches:
        sim = jax.jit(lambda k: simulate_batch(k, B, cfg))
        out = sim(jax.random.PRNGKey(0))
        jax.block_until_ready(out)
        t0 = time.time()
        for i in range(args.repeats):
            out = sim(jax.random.PRNGKey(i))
        # device->host fetch fences execution even over the tunneled backend,
        # where block_until_ready can return early (DESIGN.md risk #10)
        jax.tree.map(np.asarray, out)
        dt = (time.time() - t0) / args.repeats
        print(f"simulate_batch B={B}: {B / dt:,.0f} gal/s ({dt * 1e3:.1f} ms/batch)")

    root = pathlib.Path(args.data)
    if root.exists():
        ds = GalaxyDataset(root, "train")
        for B in args.batches:
            if B > len(ds):
                continue
            n = 0
            t0 = time.time()
            for b in iterate_batches(ds, B, shuffle=True, seed=0):
                n += b["obs"].shape[0]
            host_dt = time.time() - t0
            # host->device transfer of the same pass
            t0 = time.time()
            for b in iterate_batches(ds, B, shuffle=True, seed=0):
                arrs = jax.device_put((b["obs"], b["psf"], b["alpha"], b["gt"]))
                jax.block_until_ready(arrs)
            np.asarray(arrs[0][0, 0])  # fence the final transfer to the host
            h2d_dt = time.time() - t0
            print(f"dataset read B={B}: {n / host_dt:,.0f} gal/s host, "
                  f"{n / h2d_dt:,.0f} gal/s incl. device_put")
    else:
        print(f"(no dataset at {root}; skipping reader benchmark)")


if __name__ == "__main__":
    main()
