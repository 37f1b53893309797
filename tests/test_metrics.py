"""Unit tests for newsreclib_tpu.metrics against sklearn + hand-computed
golden values (the reference has no metric unit tests; SURVEY.md §4 calls for
golden-value coverage)."""

import numpy as np
import jax.numpy as jnp
import pytest
from sklearn.metrics import roc_auc_score

from newsreclib_tpu.metrics import functional as F


def test_binary_auc_matches_sklearn(rng):
    preds = rng.normal(size=500).astype(np.float32)
    targets = (rng.random(500) < 0.3).astype(np.int32)
    got = float(F.binary_auc(jnp.asarray(preds), jnp.asarray(targets)))
    want = roc_auc_score(targets, preds)
    assert abs(got - want) < 1e-6


def test_binary_auc_with_ties(rng):
    preds = rng.integers(0, 5, size=300).astype(np.float32)  # heavy ties
    targets = (rng.random(300) < 0.4).astype(np.int32)
    got = float(F.binary_auc(jnp.asarray(preds), jnp.asarray(targets)))
    want = roc_auc_score(targets, preds)
    assert abs(got - want) < 1e-6


def test_binary_auc_degenerate():
    preds = jnp.asarray([0.1, 0.2, 0.3])
    assert float(F.binary_auc(preds, jnp.asarray([1, 1, 1]))) == 0.0
    assert float(F.binary_auc(preds, jnp.asarray([0, 0, 0]))) == 0.0


def test_mrr_golden():
    scores = jnp.asarray([[0.9, 0.1, 0.5, 0.7], [0.1, 0.9, 0.2, 0.3]])
    labels = jnp.asarray([[0.0, 1.0, 0.0, 0.0], [0.0, 0.0, 1.0, 1.0]])
    mask = jnp.ones((2, 4), dtype=bool)
    got = np.asarray(F.mrr(scores, labels, mask))
    # row0: positive is the lowest score -> rank 4 -> 1/4
    # row1: positives ranked 2nd (0.3) and 3rd (0.2) -> first at rank 2 -> 1/2
    np.testing.assert_allclose(got, [0.25, 0.5], atol=1e-6)


def test_mrr_empty_target_counts_zero():
    scores = jnp.asarray([[0.9, 0.1]])
    labels = jnp.zeros((1, 2))
    mask = jnp.ones((1, 2), dtype=bool)
    assert float(F.mrr(scores, labels, mask)[0]) == 0.0


def test_mrr_respects_mask():
    # masked high-score slot must not shift ranks
    scores = jnp.asarray([[5.0, 0.9, 0.1]])
    labels = jnp.asarray([[0.0, 1.0, 0.0]])
    mask = jnp.asarray([[False, True, True]])
    np.testing.assert_allclose(np.asarray(F.mrr(scores, labels, mask)), [1.0], atol=1e-6)


def test_ndcg_golden():
    # single impression: positives at pred-ranks 1 and 3 of 4
    scores = jnp.asarray([[0.9, 0.8, 0.7, 0.6]])
    labels = jnp.asarray([[1.0, 0.0, 1.0, 0.0]])
    mask = jnp.ones((1, 4), dtype=bool)
    dcg = 1.0 / np.log2(2) + 1.0 / np.log2(4)
    idcg = 1.0 / np.log2(2) + 1.0 / np.log2(3)
    got = float(F.ndcg_at_k(scores, labels, mask, k=4)[0])
    assert abs(got - dcg / idcg) < 1e-6


def test_ndcg_topk_cutoff():
    scores = jnp.asarray([[0.9, 0.8, 0.7, 0.6]])
    labels = jnp.asarray([[0.0, 0.0, 0.0, 1.0]])
    mask = jnp.ones((1, 4), dtype=bool)
    assert float(F.ndcg_at_k(scores, labels, mask, k=2)[0]) == 0.0


def test_ndcg_matches_sklearn(rng):
    from sklearn.metrics import ndcg_score

    scores = rng.normal(size=(8, 12)).astype(np.float32)
    labels = (rng.random((8, 12)) < 0.25).astype(np.float32)
    labels[0, 0] = 1.0  # ensure at least one non-empty row
    mask = np.ones((8, 12), dtype=bool)
    got = np.asarray(F.ndcg_at_k(jnp.asarray(scores), jnp.asarray(labels), jnp.asarray(mask), k=5))
    for i in range(8):
        if labels[i].sum() == 0:
            assert got[i] == 0.0
        else:
            want = ndcg_score(labels[None, i], scores[None, i], k=5)
            assert abs(float(got[i]) - want) < 1e-5


def test_diversity_golden():
    # top-3 of 4 candidates; classes of top-3 = [1, 1, 2] -> H([2/3,1/3])
    scores = jnp.asarray([[0.9, 0.8, 0.7, 0.6]])
    aspects = jnp.asarray([[1, 1, 2, 3]])
    mask = jnp.ones((1, 4), dtype=bool)
    p = np.asarray([2 / 3, 1 / 3])
    want = -(p * np.log(p)).sum() / np.log(4)
    got = float(F.diversity_at_k(scores, aspects, mask, k=3, num_classes=4)[0])
    assert abs(got - want) < 1e-6


def test_diversity_single_class_is_zero():
    scores = jnp.asarray([[0.9, 0.8]])
    aspects = jnp.asarray([[2, 2]])
    mask = jnp.ones((1, 2), dtype=bool)
    assert float(F.diversity_at_k(scores, aspects, mask, k=2, num_classes=4)[0]) == 0.0


def test_personalization_golden():
    # top-2 predicted classes: [1, 2]; history classes: [1, 1, 3]
    scores = jnp.asarray([[0.9, 0.8, 0.1]])
    cand_aspects = jnp.asarray([[1, 2, 3]])
    cand_mask = jnp.ones((1, 3), dtype=bool)
    hist_aspects = jnp.asarray([[1, 1, 3]])
    hist_mask = jnp.ones((1, 3), dtype=bool)
    # counts pred: c1=1, c2=1; hist: c1=2, c3=1
    # min: c1 -> 1; max: c1=2, c2=1, c3=1 -> 4; jaccard = 1/4
    got = float(
        F.personalization_at_k(
            scores, cand_aspects, cand_mask, hist_aspects, hist_mask, k=2, num_classes=5
        )[0]
    )
    assert abs(got - 0.25) < 1e-6


def test_generalized_jaccard_identity():
    c = jnp.asarray([[1.0, 2.0, 3.0]])
    np.testing.assert_allclose(np.asarray(F.generalized_jaccard(c, c)), [1.0], atol=1e-6)


def test_harmonic_mean():
    got = float(F.harmonic_mean(jnp.asarray([1.0, 2.0])))
    assert abs(got - 4.0 / 3.0) < 1e-6
