"""Train state: parameters, BN statistics, optimizer state."""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any  # empty dict for BN-free models
    opt_state: Any


def update_is_good(loss: jnp.ndarray, updates) -> jnp.ndarray:
    """Failure-containment predicate for a train step: True iff the loss
    AND every optimizer update entry are finite.  A finite loss can still
    come with NaN/inf grads (e.g. a prox sqrt at 0) — applying such an
    update corrupts params irrecoverably (observed on a Poisson-ADMM run),
    so the step must be skipped entirely."""
    finite_updates = jax.tree.reduce(
        jnp.logical_and,
        jax.tree.map(lambda u: jnp.isfinite(u).all(), updates),
        jnp.asarray(True),
    )
    return jnp.isfinite(loss) & finite_updates


def default_optimizer(
    lr: float = 2e-4,
    clip_norm: float = 1.0,
    schedule: Optional[str] = None,
    total_steps: Optional[int] = None,
) -> optax.GradientTransformation:
    """Adam with global-norm clipping (reference train.py:76,90: clip 1.0).

    ``schedule='cosine'`` decays lr to lr/10 over ``total_steps`` (useful
    for the online mode where one pass = the whole run).
    """
    if schedule == "cosine":
        lr = optax.cosine_decay_schedule(lr, total_steps, alpha=0.1)
    elif schedule is not None:
        raise ValueError(f"unknown schedule {schedule!r}")
    return optax.chain(optax.clip_by_global_norm(clip_norm), optax.adam(lr))


def create_train_state(
    model,
    key: jax.Array,
    sample_batch: dict,
    optimizer: Optional[optax.GradientTransformation] = None,
    frozen_mask_fn: Optional[Callable] = None,
) -> tuple[TrainState, optax.GradientTransformation]:
    """Initialize model variables + optimizer state from a sample batch.

    ``frozen_mask_fn(params) -> pytree of bool`` marks subtrees to exclude
    from updates (ADMMNet's frozen pretrained denoiser).
    """
    variables = model.init(key, sample_batch["obs"], sample_batch["psf"], sample_batch["alpha"])
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    if optimizer is None:
        optimizer = default_optimizer()
    if frozen_mask_fn is not None:
        optimizer = optax.multi_transform(
            {"train": optimizer, "frozen": optax.set_to_zero()},
            jax.tree.map(lambda frozen: "frozen" if frozen else "train", frozen_mask_fn(params)),
        )
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=optimizer.init(params),
    )
    return state, optimizer
