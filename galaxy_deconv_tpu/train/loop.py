"""Jitted train/eval steps and the training loop.

The train step is one donated jitted function: forward (train-mode BN),
loss, backward, clip+Adam update.  Under a data mesh the batch arrives
sharded along axis 0 and parameters replicated; XLA's SPMD partitioner
inserts the gradient all-reduce over ICI — no explicit collectives needed
(the shard_map/psum spelling lives in tests/test_parallel.py as the
explicit equivalent).

Loop behavior mirrors reference ``train.py:80-146``: val eval every
``eval_every`` steps, full train+val eval per epoch, checkpoint on new best
val loss or every 5 epochs, loss curves returned.  The reference's two
*extra* full-train passes per epoch (``train.py:111-119``) are replaced by
an O(1) running mean of the epoch's minibatch losses.
"""

from __future__ import annotations

import logging
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from galaxy_deconv_tpu.data.dataset import GalaxyDataset, iterate_batches, train_val_indices
from galaxy_deconv_tpu.train.state import TrainState, update_is_good

logger = logging.getLogger("galaxy_deconv_tpu.train")


def make_train_step(model, loss_fn: Callable, optimizer, donate: bool = True):
    """Build the jitted train step: (state, batch) -> (state, loss)."""

    def step(state: TrainState, batch: dict):
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
            # reference convention: loss_fn(gt, rec) (train.py:87)
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

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_eval_step(model, loss_fn: Callable):
    """Jitted eval step: (state, batch) -> loss (eval-mode BN)."""

    def step(state: TrainState, batch: dict):
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        rec = model.apply(variables, batch["obs"], batch["psf"], batch["alpha"], False)
        return loss_fn(batch["gt"], rec)

    return jax.jit(step)


def fit(
    model,
    state: TrainState,
    optimizer,
    loss_fn: Callable,
    dataset: GalaxyDataset,
    n_epochs: int = 10,
    batch_size: int = 32,
    train_val_split: float = 0.8,
    eval_every: int = 25,
    seed: int = 0,
    model_name: str = "model",
    save_path: Optional[str] = None,
    mesh=None,
    pretrained_epochs: int = 0,
    max_val_batches: int = 50,
    stall_timeout_s: Optional[float] = 600.0,
):
    """Training loop.  Returns (state, history dict).

    ``stall_timeout_s``: wedged-device-RPC detection, as in
    :func:`galaxy_deconv_tpu.train.online.fit_online` (see
    ``utils.watchdog``); None disables.
    """
    from galaxy_deconv_tpu.train.checkpoint import save_checkpoint
    from galaxy_deconv_tpu.utils.watchdog import StallWatchdog

    train_step = make_train_step(model, loss_fn, optimizer)
    eval_step = make_eval_step(model, loss_fn)

    tr_idx, va_idx = train_val_indices(len(dataset), train_val_split, seed)
    place = (lambda b: b) if mesh is None else _make_placer(mesh)

    history = {"train_loss": [], "val_loss": [], "epoch_time": [], "best_step": 0}
    val_loss_min, epoch_min = float("inf"), 0

    def run_val():
        losses = []
        for i, vb in enumerate(iterate_batches(dataset, batch_size, indices=va_idx, drop_last=False)):
            if i >= max_val_batches:
                break
            losses.append(float(eval_step(state, place(vb))))
        return float(np.mean(losses)) if losses else float("nan")

    # context manager: the watchdog must be disarmed on ANY exit (incl.
    # exceptions), else the leaked daemon thread os._exit(75)'s the process
    # 600s later even though nothing is wedged
    with StallWatchdog(stall_timeout_s, name=f"fit[{model_name}]") as dog:
        for epoch in range(n_epochs):
            t0 = time.time()
            epoch_losses = []
            for it, batch in enumerate(
                iterate_batches(dataset, batch_size, shuffle=True, seed=seed + epoch, indices=tr_idx)
            ):
                state, loss = train_step(state, place(batch))
                epoch_losses.append(float(loss))
                dog.beat()  # float(loss) synced the device call
                if eval_every and (it + 1) % eval_every == 0:
                    logger.info(
                        "[%d: %d] train_loss=%.4g val_loss=%.4g",
                        epoch + 1, it + 1, np.mean(epoch_losses[-eval_every:]), run_val(),
                    )
                    dog.beat()

            train_loss = float(np.mean(epoch_losses)) if epoch_losses else float("nan")
            val_loss = run_val()
            dog.beat()
            history["train_loss"].append(train_loss)
            history["val_loss"].append(val_loss)
            history["epoch_time"].append(time.time() - t0)
            logger.info("epoch %d: train=%.4g val=%.4g (%.1fs)", epoch + 1, train_loss, val_loss, history["epoch_time"][-1])

            if val_loss < val_loss_min or (epoch + 1) % 5 == 0:
                if val_loss < val_loss_min:
                    val_loss_min, epoch_min = val_loss, epoch
                    # checkpoint-name epoch of the best-val save, consumed by
                    # checkpoint.best_epoch so eval loads best-val by default
                    history["best_step"] = epoch + 1 + pretrained_epochs
                if save_path:
                    save_checkpoint(save_path, model_name, epoch + 1 + pretrained_epochs, state)

    history["best_epoch"] = epoch_min
    if save_path:
        import json
        import pathlib

        with open(pathlib.Path(save_path) / f"{model_name}_history.json", "w") as f:
            json.dump(history, f)
    return state, history


def _make_placer(mesh):
    from galaxy_deconv_tpu.parallel import shard_batch

    return lambda b: shard_batch(b, mesh)
