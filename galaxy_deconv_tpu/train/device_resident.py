"""Device-resident offline training.

For stored datasets that fit in HBM (the 40k-stamp benchmark train split is
~1 GB), uploading the whole split once and gathering minibatches *on
device* removes the per-step host->device transfer entirely — the step
takes only an index vector.  This is the offline counterpart of the online
mode's zero-I/O property; use plain ``train.fit`` when the data exceeds
HBM.
"""

from __future__ import annotations

import logging
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from galaxy_deconv_tpu.data.dataset import GalaxyDataset, train_val_indices
from galaxy_deconv_tpu.train.state import TrainState, update_is_good

logger = logging.getLogger("galaxy_deconv_tpu.train.device_resident")


def upload_split(ds: GalaxyDataset, limit: Optional[int] = None) -> dict:
    """Load (up to ``limit``) samples of a split into device memory."""
    n = len(ds) if limit is None else min(limit, len(ds))
    obs = np.asarray(ds.obs[:n], np.float32)
    data = {
        "obs": jnp.asarray(obs),
        "psf": jnp.asarray(np.asarray(ds.psf[:n], np.float32)),
        "gt": jnp.asarray(np.asarray(ds.gt[:n], np.float32)),
        "alpha": jnp.asarray(obs.mean(axis=(-2, -1))),
    }
    return data


def make_indexed_train_step(model, loss_fn: Callable, optimizer, data: dict, donate: bool = True):
    """(state, idx) -> (state, loss): gather the minibatch on device.

    ``data`` is threaded into the jitted function as an *argument*, never
    a closure: a closed-over device array is baked into the lowered
    program as a constant, and at 40k stamps (~1 GB) that constant makes
    the tunneled compile RPC effectively unbounded (observed: >30 min,
    twice, for the flagship's fused step).  As an argument the split is a
    zero-copy parameter of every call instead.
    """
    step = _indexed_step_fn(model, loss_fn, optimizer)
    jitted = jax.jit(step, donate_argnums=(0,) if donate else ())

    def call(state: TrainState, idx: jnp.ndarray):
        return jitted(state, idx, data)

    return call


def make_indexed_multi_step(model, loss_fn: Callable, optimizer, data: dict, donate: bool = True):
    """(state, idxs[K, B]) -> (state, mean loss): K train steps fused into
    one ``lax.scan``'d XLA call — over the tunneled backend the per-call
    dispatch latency dominates a 32-stamp step, so fusing K steps cuts an
    epoch's round-trips by K (the offline counterpart of
    ``fit_online(steps_per_call=...)``).  ``data`` is an argument of the
    jitted call, not a closure — see :func:`make_indexed_train_step`."""
    step = _indexed_step_fn(model, loss_fn, optimizer)

    def multi(state: TrainState, idxs: jnp.ndarray, data: dict):
        state, losses = jax.lax.scan(lambda st, idx: step(st, idx, data), state, idxs)
        return state, losses.mean()

    jitted = jax.jit(multi, donate_argnums=(0,) if donate else ())

    def call(state: TrainState, idxs: jnp.ndarray):
        return jitted(state, idxs, data)

    return call


def _indexed_step_fn(model, loss_fn: Callable, optimizer):
    def step(state: TrainState, idx: jnp.ndarray, data: dict):
        batch = {k: v[idx] for k, v in data.items()}

        def loss_of(params):
            variables = {"params": params}
            mutable = []
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
                mutable = ["batch_stats"]
            if mutable:
                rec, updated = model.apply(
                    variables, batch["obs"], batch["psf"], batch["alpha"], True, mutable=mutable
                )
            else:
                rec = model.apply(variables, batch["obs"], batch["psf"], batch["alpha"], True)
                updated = {}
            return loss_fn(batch["gt"], rec), updated.get("batch_stats", state.batch_stats)

        (loss, new_stats), grads = jax.value_and_grad(loss_of, has_aux=True)(state.params)
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        good = update_is_good(loss, updates)
        new_params = jax.tree.map(lambda p, u: jnp.where(good, p + u, p), state.params, updates)
        # revert opt state and BN stats too on a bad step — otherwise one
        # NaN-grad step poisons Adam's moments and training silently stalls
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


def fit_device_resident(
    model,
    state: TrainState,
    optimizer,
    loss_fn: Callable,
    dataset: GalaxyDataset,
    n_epochs: int = 10,
    batch_size: int = 32,
    train_val_split: float = 0.8,
    seed: int = 0,
    model_name: str = "model",
    save_path: Optional[str] = None,
    limit: Optional[int] = None,
):
    """Epoch training over a device-resident split.  Returns (state, history)."""
    from galaxy_deconv_tpu.train.checkpoint import save_checkpoint

    data = upload_split(dataset, limit)
    n = int(data["obs"].shape[0])
    tr_idx, va_idx = train_val_indices(n, train_val_split, seed)
    step = make_indexed_train_step(model, loss_fn, optimizer, data)

    def eval_loss(idx):
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        rec = model.apply(variables, data["obs"][idx], data["psf"][idx], data["alpha"][idx], False)
        return float(loss_fn(data["gt"][idx], rec))

    rng = np.random.default_rng(seed)
    history = {"train_loss": [], "val_loss": [], "epoch_time": []}
    best = float("inf")
    for epoch in range(n_epochs):
        t0 = time.time()
        order = tr_idx.copy()
        rng.shuffle(order)
        losses = []
        for s in range(0, len(order) - batch_size + 1, batch_size):
            state, loss = step(state, jnp.asarray(order[s : s + batch_size]))
            losses.append(float(loss))
        val = eval_loss(jnp.asarray(va_idx[: min(len(va_idx), 512)]))
        history["train_loss"].append(float(np.mean(losses)))
        history["val_loss"].append(val)
        history["epoch_time"].append(time.time() - t0)
        logger.info("epoch %d: train=%.4g val=%.4g (%.1fs)", epoch + 1, history["train_loss"][-1], val,
                    history["epoch_time"][-1])
        if save_path and (val < best or (epoch + 1) % 5 == 0):
            best = min(best, val)
            save_checkpoint(save_path, model_name, epoch + 1, state)
    return state, history
