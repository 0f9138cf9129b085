"""Data-parallel scaling measurement.

On real hardware this measures galaxies/sec of the DP train step at 1 chip,
1 host (all local chips), and N hosts (run one process per host with
jax.distributed env vars; parallel.initialize_distributed handles bring-up).
Without a multi-chip slice it still runs end-to-end on the virtual CPU mesh
(XLA_FLAGS=--xla_force_host_platform_device_count=8) to validate the
sharding mechanics and collective insertion; absolute CPU numbers are not
meaningful.

Usage:
  python scripts/scaling.py                 # real backend, all devices
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python scripts/scaling.py --cpu       # virtual 8-device mesh
"""

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--per_device_batch", type=int, default=32)
    parser.add_argument("--steps", type=int, default=10)
    parser.add_argument("--n_iters", type=int, default=2)
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from galaxy_deconv_tpu.losses import MultiScaleLoss
    from galaxy_deconv_tpu.models import UnrolledADMMGaussian
    from galaxy_deconv_tpu.parallel import (
        initialize_distributed,
        make_mesh,
        replicated_sharding,
        shard_batch,
    )
    from galaxy_deconv_tpu.train import create_train_state, make_train_step
    from galaxy_deconv_tpu.train.state import default_optimizer

    initialize_distributed()
    n_total = len(jax.devices())
    print(f"{jax.process_count()} process(es), {n_total} device(s): {jax.devices()[0]}")

    rng = np.random.default_rng(0)

    def make_batch(n):
        obs = np.abs(rng.standard_normal((n, 48, 48))).astype(np.float32) * 20
        psf = np.abs(rng.standard_normal((n, 48, 48))).astype(np.float32)
        psf = psf / psf.sum(axis=(1, 2), keepdims=True) / 16.0
        return {"obs": obs, "psf": psf, "alpha": np.full((n,), 50.0, np.float32), "gt": obs * 0.5}

    model = UnrolledADMMGaussian(n_iters=args.n_iters, features=(32, 64, 128, 256))
    optimizer = default_optimizer()

    sizes = sorted({1, max(1, n_total // 2), n_total})
    results = {}
    for nd in sizes:
        mesh = make_mesh(nd)
        global_batch = args.per_device_batch * nd
        batch = make_batch(global_batch)
        state, opt = create_train_state(model, jax.random.PRNGKey(0), batch, optimizer)
        state = jax.device_put(state, replicated_sharding(mesh))
        sharded = shard_batch(batch, mesh)
        step = make_train_step(model, MultiScaleLoss(), opt, donate=False)
        state, loss = step(state, sharded)  # compile
        float(loss)
        t0 = time.time()
        for _ in range(args.steps):
            state, loss = step(state, sharded)
        # fetch the final loss VALUE: over a tunneled backend (axon),
        # block_until_ready on the remote ref can return before execution
        # finishes and under-times the loop; a host fetch cannot
        float(loss)
        dt = (time.time() - t0) / args.steps
        rate = global_batch / dt
        results[nd] = rate
        print(f"{nd} device(s): {rate:.0f} gal/s train  ({rate / results[sizes[0]] / nd * sizes[0]:.2f} scaling eff.)")


if __name__ == "__main__":
    main()
