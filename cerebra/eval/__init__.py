"""Evaluation: exact L2 retrieval, per-class Recall/Precision, channel sweeps.

Replaces the reference's only native dependency — faiss IndexFlatL2
(utils/Utilities.py:45-55 and 6 clones) — with fused on-device matmul top-k,
and its hours-long greedy channel-discovery Python loops
(TestRetrieval_Perils_DiscoverChannels.py:125-353) with batched
per-channel distance tensors.
"""

from cerebra.eval.retrieval import l2_topk, retrieval_recall_precision  # noqa: F401
from cerebra.eval.scores import build_class_scores, evaluate, save_score_artifacts  # noqa: F401
from cerebra.eval.channel_discovery import (  # noqa: F401
    per_channel_distances,
    greedy_channel_discovery,
)
