"""Online training: simulation fused into the jitted train step.

The classic pipeline (simulate offline -> store -> load -> H2D -> step) is
host-I/O-bound on TPU; since this framework's simulator is itself JAX, the
TPU-native alternative is to *fuse data generation into the training
program*: each step takes only a PRNG key, renders a fresh batch of
galaxies/PSFs/observations on-device, and immediately trains on it.  No
dataset ever touches the host, every galaxy is seen once (infinite data, no
overfitting), and the whole step is one XLA program.

This has no counterpart in the reference (which trains on 40k fixed stamps,
``train.py:83-108``); offline training on stored datasets remains available
via ``train.loop.fit`` for exact-protocol parity.
"""

from __future__ import annotations

import logging
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from galaxy_deconv_tpu.data import simulate as sim
from galaxy_deconv_tpu.train.state import TrainState, update_is_good

logger = logging.getLogger("galaxy_deconv_tpu.train.online")


def _online_step_body(
    model,
    loss_fn: Callable,
    optimizer,
    batch_size: int,
    sim_cfg: sim.SimulationConfig,
    sampler: Callable,
):
    """Un-jitted (state, key) -> (state, loss) body shared by the one-step
    and scanned trainers."""

    def step(state: TrainState, key: jax.Array):
        batch = sampler(key, batch_size, sim_cfg)
        # training contract parity: alpha = per-sample mean of the
        # observation (utils/utils_data.py:100), not the simulation truth
        alpha = batch["obs"].mean(axis=(-2, -1))

        def loss_of(params):
            variables = {"params": params}
            mutable = []
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
                mutable = ["batch_stats"]
            if mutable:
                rec, updated = model.apply(variables, batch["obs"], batch["psf"], alpha, True, mutable=mutable)
            else:
                rec = model.apply(variables, batch["obs"], batch["psf"], alpha, True)
                updated = {}
            return loss_fn(batch["gt"], rec), updated.get("batch_stats", state.batch_stats)

        (loss, new_stats), grads = jax.value_and_grad(loss_of, has_aux=True)(state.params)
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        # failure containment: skip the whole update on a non-finite loss
        # OR non-finite update (see train.state.update_is_good)
        good = update_is_good(loss, updates)
        new_params = jax.tree.map(lambda p, u: jnp.where(good, p + u, p), state.params, updates)
        new_opt = jax.tree.map(
            lambda a, b: jnp.where(good, a, b) if hasattr(a, "shape") and a.shape == getattr(b, "shape", None) else a,
            new_opt, state.opt_state,
        )
        new_stats = jax.tree.map(lambda a, b: jnp.where(good, a, b), new_stats, state.batch_stats)
        return (
            TrainState(step=state.step + 1, params=new_params, batch_stats=new_stats, opt_state=new_opt),
            loss,
        )

    return step


def make_online_train_step(
    model,
    loss_fn: Callable,
    optimizer,
    batch_size: int,
    sim_cfg: sim.SimulationConfig = sim.SimulationConfig(),
    donate: bool = True,
    sampler: Callable = sim.simulate_batch,
):
    """(state, key) -> (state, loss): render a fresh batch and train on it.

    ``sampler``: simulate_batch (deconvolution task, default) or
    simulate_batch_denoise (denoiser pre-training).
    """
    step = _online_step_body(model, loss_fn, optimizer, batch_size, sim_cfg, sampler)
    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_online_train_scan(
    model,
    loss_fn: Callable,
    optimizer,
    batch_size: int,
    steps_per_call: int,
    sim_cfg: sim.SimulationConfig = sim.SimulationConfig(),
    sampler: Callable = sim.simulate_batch,
):
    """(state, keys[steps_per_call]) -> (state, losses[steps_per_call]).

    Fuses ``steps_per_call`` full train steps (simulation included) into ONE
    XLA program via lax.scan.  At small batch sizes the per-step dispatch
    over the host<->TPU link dominates wall-clock; scanning amortizes it so
    the chip stays busy back-to-back.  Semantically identical to calling
    :func:`make_online_train_step` ``steps_per_call`` times.
    """
    step = _online_step_body(model, loss_fn, optimizer, batch_size, sim_cfg, sampler)

    def scan_steps(state: TrainState, keys: jax.Array):
        return jax.lax.scan(step, state, keys)

    return jax.jit(scan_steps, donate_argnums=(0,))


def make_online_eval_step(model, loss_fn: Callable, batch_size: int, sim_cfg=sim.SimulationConfig(),
                          sampler: Callable = sim.simulate_batch):
    """(state, key) -> loss on a freshly simulated batch (eval-mode BN)."""

    def step(state: TrainState, key: jax.Array):
        batch = sampler(key, batch_size, sim_cfg)
        alpha = batch["obs"].mean(axis=(-2, -1))
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        rec = model.apply(variables, batch["obs"], batch["psf"], alpha, False)
        return loss_fn(batch["gt"], rec)

    return jax.jit(step)


def fit_online(
    model,
    state: TrainState,
    optimizer,
    loss_fn: Callable,
    n_steps: int,
    batch_size: int = 64,
    sim_cfg: sim.SimulationConfig = sim.SimulationConfig(),
    seed: int = 0,
    log_every: int = 100,
    val_every: int = 500,
    val_batches: int = 4,
    model_name: str = "model",
    save_path: Optional[str] = None,
    save_every: int = 5000,
    sampler: Callable = sim.simulate_batch,
    steps_per_call: int = 1,
    stall_timeout_s: Optional[float] = 600.0,
):
    """Online training loop.  Validation uses fixed held-out keys (the same
    simulated galaxies every time), so val losses are comparable across the
    run.  Returns (state, history).

    ``steps_per_call > 1`` fuses that many steps into one lax.scan'd XLA
    call (same data/update sequence; losses still recorded per step) —
    log/val/save cadences snap to multiples of it.

    ``stall_timeout_s``: failure detection for wedged device RPCs — if no
    train/eval call completes for this long, the process exits with
    :data:`~galaxy_deconv_tpu.utils.watchdog.STALL_EXIT_CODE` so a
    supervisor can restart from the last saved checkpoint (see
    ``utils.watchdog``).  None disables.  The default comfortably exceeds
    the first-call compile time (~20-40s) and any normal fused-scan call.
    """
    from galaxy_deconv_tpu.train.checkpoint import save_checkpoint
    from galaxy_deconv_tpu.utils.watchdog import StallWatchdog

    k = max(1, steps_per_call)
    if k > 1:
        # snap cadences (and the step budget) to whole fused calls
        log_every, val_every, save_every, n_steps = (
            max(k, k * (v // k)) if v else v
            for v in (log_every, val_every, save_every, n_steps)
        )
        train_scan = make_online_train_scan(model, loss_fn, optimizer, batch_size, k,
                                            sim_cfg, sampler=sampler)
    else:
        train_step = make_online_train_step(model, loss_fn, optimizer, batch_size, sim_cfg, sampler=sampler)
    eval_step = make_online_eval_step(model, loss_fn, batch_size, sim_cfg, sampler=sampler)

    key = jax.random.PRNGKey(seed)
    val_keys = [jax.random.fold_in(jax.random.PRNGKey(seed + 777), i) for i in range(val_batches)]

    history = {"step": [], "train_loss": [], "val_loss": [], "best_step": 0}
    best_val = float("inf")
    window = []
    t0 = time.time()
    with StallWatchdog(stall_timeout_s, name=f"fit_online[{model_name}]") as dog:
        for i in range(0, n_steps, k) if k > 1 else range(n_steps):
            if k > 1:
                keys = jnp.stack([jax.random.fold_in(key, i + j) for j in range(k)])
                state, losses = train_scan(state, keys)
                window.extend(np.asarray(losses, np.float32).tolist())
                i = i + k - 1  # cadence checks below fire on the last fused step
                loss = window[-1]
            else:
                state, loss = train_step(state, jax.random.fold_in(key, i))
                window.append(float(loss))
            dog.beat()  # np.asarray/float above synced the device call
            if log_every and (i + 1) % log_every == 0:
                rate = (i + 1) * batch_size / (time.time() - t0)
                logger.info("step %d: train=%.5g (%.0f gal/s)", i + 1, np.mean(window[-log_every:]), rate)
            if val_every and (i + 1) % val_every == 0:
                val = float(np.mean([float(eval_step(state, vk)) for vk in val_keys]))
                dog.beat()
                history["step"].append(i + 1)
                history["train_loss"].append(float(np.mean(window[-val_every:])))
                history["val_loss"].append(val)
                logger.info("step %d: val=%.5g", i + 1, val)
                if val < best_val:
                    best_val = val
                    history["best_step"] = i + 1
                    if save_path:
                        save_checkpoint(save_path, model_name, i + 1, state)
            if save_path and save_every and (i + 1) % save_every == 0:
                save_checkpoint(save_path, model_name, i + 1, state)
    history["galaxies_per_sec"] = len(window) * batch_size / (time.time() - t0)
    if save_path:
        # records which checkpoint is the best-val one (consumed by
        # checkpoint.best_epoch / scripts/export_trained.py)
        import json
        import pathlib

        with open(pathlib.Path(save_path) / f"{model_name}_history.json", "w") as f:
            json.dump(history, f)
    return state, history
