from newsreclib_tpu.metrics.functional import (
    binary_auc,
    diversity_at_k,
    generalized_jaccard,
    harmonic_mean,
    mrr,
    ndcg_at_k,
    personalization_at_k,
)
from newsreclib_tpu.metrics.collector import RankingMetrics, StreamingEval

__all__ = [
    "binary_auc",
    "mrr",
    "ndcg_at_k",
    "diversity_at_k",
    "personalization_at_k",
    "generalized_jaccard",
    "harmonic_mean",
    "StreamingEval",
    "RankingMetrics",
]
