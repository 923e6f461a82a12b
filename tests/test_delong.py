"""DeLong tests: vectorized midranks vs a straightforward O(n^2) oracle, and
statistical sanity of variance/p-values (reference delong.py behavior with
the np.float bug fixed — SURVEY.md §2.1)."""

import numpy as np
import pytest
import scipy.stats

from biscuit_tpu.delong import (
    calc_pvalue,
    compute_midrank,
    delong_roc_test,
    delong_roc_variance,
)
from biscuit_tpu.stats.roc import auc_score


def _midrank_oracle(x):
    """Direct transcription of the Sun & Xu midrank definition."""
    J = np.argsort(x, kind="mergesort")
    Z = x[J]
    N = len(x)
    T = np.zeros(N, dtype=np.float64)
    i = 0
    while i < N:
        j = i
        while j < N and Z[j] == Z[i]:
            j += 1
        T[i:j] = 0.5 * (i + j - 1)
        i = j
    T2 = np.empty(N, dtype=np.float64)
    T2[J] = T + 1
    return T2


@pytest.mark.parametrize("seed", range(5))
def test_midrank_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    x = np.round(rng.random(1000), 2)  # heavy ties
    np.testing.assert_array_equal(compute_midrank(x), _midrank_oracle(x))


def test_midrank_no_ties():
    x = np.array([0.3, 0.1, 0.2])
    np.testing.assert_array_equal(compute_midrank(x), [3.0, 1.0, 2.0])


def test_delong_auc_matches_roc_auc():
    rng = np.random.default_rng(0)
    y = rng.integers(0, 2, 500)
    p = rng.random(500) + 0.5 * y
    auc, var = delong_roc_variance(y, p)
    assert auc == pytest.approx(auc_score(y, p), abs=1e-12)
    assert var > 0


def test_delong_test_similar_predictions_not_significant():
    rng = np.random.default_rng(1)
    y = rng.integers(0, 2, 200)
    p = rng.random(200) + 0.5 * y  # overlapping classes, AUC < 1
    p2 = p + 1e-3 * rng.standard_normal(200)  # nearly identical classifier
    logp = delong_roc_test(y, p, p2)
    assert logp.item() > np.log10(0.05)  # not significant


def test_delong_test_discriminates():
    rng = np.random.default_rng(2)
    y = rng.integers(0, 2, 2000)
    good = y + 0.2 * rng.standard_normal(2000)
    bad = rng.random(2000)
    logp = delong_roc_test(y, good, bad)
    assert logp.item() < -10  # overwhelmingly significant


def test_variance_shrinks_with_n():
    rng = np.random.default_rng(3)
    vars_ = []
    for n in (100, 1000):
        y = np.r_[np.zeros(n // 2, int), np.ones(n // 2, int)]
        p = y + rng.standard_normal(n)
        _, v = delong_roc_variance(y, p)
        vars_.append(float(v))
    assert vars_[1] < vars_[0]


def test_calc_pvalue_formula():
    aucs = np.array([0.9, 0.8])
    sigma = np.array([[0.001, 0.0], [0.0, 0.001]])
    z = abs(0.1) / np.sqrt(0.002)
    expected = np.log10(2) + scipy.stats.norm.logsf(z) / np.log(10)
    assert calc_pvalue(aucs, sigma).item() == pytest.approx(expected)
