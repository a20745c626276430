"""Evaluation: rank metrics + per-task evaluators."""

from unimp_tpu.evals.metrics import (
    hit_at_k,
    mrr_at_k,
    ndcg_at_k,
    f1_score,
)
from unimp_tpu.evals.evaluators import (
    evaluate_rec,
    evaluate_search,
    evaluate_exp,
    evaluate_img_sel,
    evaluate_img_gen,
    EVALUATORS,
)

__all__ = [
    "hit_at_k",
    "mrr_at_k",
    "ndcg_at_k",
    "f1_score",
    "evaluate_rec",
    "evaluate_search",
    "evaluate_exp",
    "evaluate_img_sel",
    "evaluate_img_gen",
    "EVALUATORS",
]
