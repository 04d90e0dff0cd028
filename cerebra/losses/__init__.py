"""Losses (L4): pure functions, collective-aware via axis_name.

Reference inventory (SURVEY.md §2.5) rebuilt as stateless functions; the DINO
center EMA — the only stateful bit — is threaded explicitly and reduced with
`pmean` over the data axis (≡ the reference's all_reduce-sum ÷ world_size,
dino/main_dino.py:471-481).
"""

from cerebra.losses.dino import (  # noqa: F401
    DinoCenterState,
    teacher_temp_schedule,
    dino_multicrop_loss,
    dino_single_pair_loss,
    update_center,
)
from cerebra.losses.feature_dist import (  # noqa: F401
    feature_distribution_loss_v1,
    feature_distribution_loss_v2,
    feature_distribution_loss_v3,
)
from cerebra.losses.kd import hinton_kd_loss, kl_kd_smooth_l1_loss  # noqa: F401
from cerebra.losses.cosine import (  # noqa: F401
    cosine_embedding_loss,
    cosine_similarity_loss,
)
from cerebra.losses.barlow import barlow_twins_loss  # noqa: F401
