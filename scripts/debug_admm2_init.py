"""Forensics for the admm2_bounded init wedge (round-3: watchdog fired at
600s in the init path 4x across rounds 2-3, while admm4_bounded/admm8_bounded
trained fine with the identical protocol).

Walks the train_zoo init path for the admm2_bounded spec step by step with
wall-clock prints and a faulthandler traceback dump on SIGUSR1 + an
automatic dump after --hang_dump seconds, so a wedge shows exactly which
device call blocks.

Usage: timeout 900 python -u scripts/debug_admm2_init.py
       (then: kill -USR1 <pid> from another shell to get a live stack)
"""

import faulthandler
import pathlib
import signal
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

faulthandler.register(signal.SIGUSR1)
faulthandler.dump_traceback_later(600, exit=True)  # auto-dump + exit on hang

T0 = time.time()


def mark(msg):
    print(f"[{time.time() - T0:7.1f}s] {msg}", flush=True)


def main():
    mark("importing jax")
    import jax
    import numpy as np

    mark(f"devices: {jax.devices()}")

    from galaxy_deconv_tpu.data.simulate import SimulationConfig, simulate_batch
    from galaxy_deconv_tpu.losses import build_loss
    from galaxy_deconv_tpu.models import UnrolledADMMGaussian
    from galaxy_deconv_tpu.train import create_train_state
    from galaxy_deconv_tpu.train.state import default_optimizer

    cfg = SimulationConfig()
    model = UnrolledADMMGaussian(features=(32, 64, 128, 256), n_iters=2, rho_bounds=(0.1, 10.0))

    mark("simulate_batch(2) — first device call")
    sample = jax.tree.map(np.asarray, simulate_batch(jax.random.PRNGKey(0), 2, cfg))
    sample["alpha"] = sample["obs"].mean(axis=(1, 2))
    mark("simulate_batch done")

    optimizer = default_optimizer(1e-4, schedule="cosine", total_steps=4000)
    mark("create_train_state (model.init on device)")
    state, optimizer = create_train_state(model, jax.random.PRNGKey(0), sample, optimizer)
    mark("create_train_state done")

    import orbax.checkpoint as ocp

    mark("orbax restore of warm-start checkpoint")
    with ocp.PyTreeCheckpointer() as ckptr:
        warm = ckptr.restore(str(pathlib.Path("trained/Gaussian_PnP_ADMM_2iters_MultiScale_15000epochs").resolve()))
    state = state.replace(params=jax.tree.map(np.asarray, warm["params"]),
                          batch_stats=jax.tree.map(np.asarray, warm.get("batch_stats", state.batch_stats)))
    mark("warm-start applied")

    from galaxy_deconv_tpu.train.online import fit_online

    mark("fit_online 30 steps (compiles the scanned train step)")
    state, hist = fit_online(model, state, optimizer, build_loss("MultiScale"),
                             n_steps=30, batch_size=64, sim_cfg=cfg, seed=0,
                             log_every=10, val_every=0, model_name="debug_admm2",
                             save_path="/tmp/debug_admm2", save_every=0, steps_per_call=10)
    mark(f"30 steps done, train_loss tail: {hist['train_loss'][-1] if hist['train_loss'] else 'n/a'}")


if __name__ == "__main__":
    main()
