"""Checkpointing via orbax.

Capability parity with the reference's ``torch.save(state_dict)`` scheme
(reference ``train.py:137-143``): checkpoints are named
``{model_name}_{epoch}epochs`` so runs resume with ``pretrained_epochs``
exactly as the reference CLI does — but the full train state (params, BN
stats, *and optimizer state*, which the reference silently drops) is saved.
"""

from __future__ import annotations

import pathlib
import re
from typing import Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from galaxy_deconv_tpu.train.state import TrainState


def _ckpt_dir(save_path, model_name: str, epoch: int) -> pathlib.Path:
    return pathlib.Path(save_path).resolve() / f"{model_name}_{epoch}epochs"


def save_checkpoint(save_path, model_name: str, epoch: int, state: TrainState) -> pathlib.Path:
    path = _ckpt_dir(save_path, model_name, epoch)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, jax.tree.map(np.asarray, state), force=True)
    return path


def restore_checkpoint(save_path, model_name: str, epoch: int, template: Optional[TrainState] = None) -> TrainState:
    path = _ckpt_dir(save_path, model_name, epoch)
    with ocp.PyTreeCheckpointer() as ckptr:
        restored = ckptr.restore(path, item=template)
    if template is not None and not isinstance(restored, TrainState):
        restored = TrainState(**restored)
    return restored


def unpack_variables(state) -> dict:
    """Restored checkpoint (TrainState or orbax dict) -> flax variables dict.

    Tolerates checkpoints without BN statistics (BN-free models save an
    empty/absent batch_stats collection).
    """
    params = state["params"] if isinstance(state, dict) else state.params
    stats = state.get("batch_stats") if isinstance(state, dict) else state.batch_stats
    return {"params": params, "batch_stats": stats} if stats else {"params": params}


def best_epoch(save_path, model_name: str) -> int:
    """Best-validation epoch recorded by ``fit_online``'s history file,
    falling back to :func:`latest_epoch` when no history exists."""
    hist = pathlib.Path(save_path) / f"{model_name}_history.json"
    if hist.exists():
        import json

        best = json.loads(hist.read_text()).get("best_step", 0)
        if best and _ckpt_dir(save_path, model_name, best).exists():
            return best
    return latest_epoch(save_path, model_name)


def latest_epoch(save_path, model_name: str) -> int:
    """Highest saved epoch for a run name, 0 if none."""
    root = pathlib.Path(save_path)
    if not root.exists():
        return 0
    pat = re.compile(re.escape(model_name) + r"_(\d+)epochs$")
    epochs = [int(m.group(1)) for p in root.iterdir() if (m := pat.match(p.name))]
    return max(epochs, default=0)
