"""Parity tests: biscuit_tpu.stats.roc vs sklearn conventions, and the
reference's Youden-J selection idiom (threshold.py:151-152 et al.)."""

import numpy as np
import pytest

sklearn_metrics = pytest.importorskip("sklearn.metrics")

from biscuit_tpu.stats.roc import (
    auc_and_youden,
    auc_score,
    roc_curve,
    trapezoid_auc,
    youden_threshold,
)


def _reference_youden(tpr, fpr, thresh):
    """The exact selection idiom used by the reference."""
    max_j = max(zip(tpr, fpr), key=lambda x: x[0] - x[1])
    return thresh[list(zip(tpr, fpr)).index(max_j)]


@pytest.mark.parametrize("seed", range(8))
@pytest.mark.parametrize("n", [10, 100, 1000])
def test_roc_curve_matches_sklearn(seed, n):
    rng = np.random.default_rng(seed)
    y_true = rng.integers(0, 2, n)
    if y_true.sum() == 0:
        y_true[0] = 1
    if y_true.sum() == n:
        y_true[0] = 0
    # Mix of continuous scores and heavy ties.
    y_score = np.round(rng.random(n), 2 if seed % 2 else 6)

    fpr, tpr, thr = roc_curve(y_true, y_score)
    s_fpr, s_tpr, s_thr = sklearn_metrics.roc_curve(y_true, y_score)
    np.testing.assert_array_equal(fpr, s_fpr)
    np.testing.assert_array_equal(tpr, s_tpr)
    np.testing.assert_array_equal(thr, s_thr)
    assert trapezoid_auc(fpr, tpr) == sklearn_metrics.auc(s_fpr, s_tpr)


@pytest.mark.parametrize("seed", range(8))
def test_youden_matches_reference_idiom(seed):
    rng = np.random.default_rng(100 + seed)
    n = 500
    y_true = rng.integers(0, 2, n)
    y_score = np.round(rng.random(n), 2)  # ties force interesting curves
    fpr, tpr, thr = roc_curve(y_true, y_score)
    assert youden_threshold(fpr, tpr, thr) == _reference_youden(tpr, fpr, thr)


def test_degenerate_single_class_is_nan():
    with np.testing.suppress_warnings() as sup:
        sup.filter(UserWarning)
        fpr, tpr, thr = roc_curve([1, 1, 1], [0.2, 0.5, 0.7])
        assert np.all(np.isnan(fpr))
        assert not np.any(np.isnan(thr))
        assert np.isnan(auc_score([1, 1, 1], [0.2, 0.5, 0.7]))


def test_non_binary_labels_raise():
    with pytest.raises(ValueError):
        roc_curve([0, 1, 2], [0.1, 0.2, 0.3])


def test_perfect_separation():
    auc, thresh = auc_and_youden([0, 0, 1, 1], [0.1, 0.2, 0.8, 0.9])
    assert auc == 1.0
    assert thresh == 0.8


def test_known_geometry():
    # Hand-computed: y=[0,0,1,1], p=[.1,.4,.35,.8] (classic sklearn example)
    y = [0, 0, 1, 1]
    p = [0.1, 0.4, 0.35, 0.8]
    fpr, tpr, thr = roc_curve(y, p)
    np.testing.assert_allclose(fpr, [0.0, 0.0, 0.5, 0.5, 1.0])
    np.testing.assert_allclose(tpr, [0.0, 0.5, 0.5, 1.0, 1.0])
    np.testing.assert_allclose(thr, [np.inf, 0.8, 0.4, 0.35, 0.1])
    assert trapezoid_auc(fpr, tpr) == 0.75
