"""Training infrastructure (L2/L5): schedules, optimizers, EMA, checkpoints.

TPU-first rebuild of the reference's utils/utils.py infra + per-script loops:
precomputed schedule arrays indexed by a traced step (exactly how the
reference indexes its numpy schedules), optax chains for AdamW/SGD/RMSprop/
LARS with the reference's param-group WD masking, EMA as a tree_map, and
orbax checkpoints that import/export the reference `.pth` layouts.
"""

from cerebra.train.schedules import cosine_scheduler, barlow_learning_rate  # noqa: F401
from cerebra.train.optim import (  # noqa: F401
    make_optimizer,
    no_weight_decay_mask,
    per_param_clip,
    cancel_last_layer_grads,
)
from cerebra.train.ema import ema_update  # noqa: F401
