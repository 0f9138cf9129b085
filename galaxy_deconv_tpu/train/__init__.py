"""Training driver (L3): jitted train step, loop, checkpointing.

Capability parity with reference ``train.py`` — Adam + global-norm grad
clip(1.0), periodic validation, best-val / every-5-epoch checkpoints with
the reference's run-name scheme — redesigned TPU-first: a single donated
jitted train step over a data-parallel mesh (gradients all-reduced by XLA),
orbax checkpoints of params + optimizer state (the reference loses
optimizer state on resume), and in-pipeline metrics.
"""

from galaxy_deconv_tpu.train.state import TrainState, create_train_state
from galaxy_deconv_tpu.train.loop import make_train_step, make_eval_step, fit
from galaxy_deconv_tpu.train.checkpoint import save_checkpoint, restore_checkpoint, latest_epoch

__all__ = [
    "TrainState",
    "create_train_state",
    "fit",
    "latest_epoch",
    "make_eval_step",
    "make_train_step",
    "restore_checkpoint",
    "save_checkpoint",
]
