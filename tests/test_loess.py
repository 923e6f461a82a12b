"""Parity check for threshold._loess_smooth (VERDICT r2 weak-6).

scikit-misc (the reference's LOESS, threshold.py:97-110) and statsmodels
are not installed in this environment, so the fit is validated against an
independent implementation written here from the textbook definition:
weighted least squares on a [1, x] design via np.linalg.lstsq with
tricube weights over the k nearest neighbors — a different solve path
from _loess_smooth's mean-centered covariance closed form. Identical
definitions must agree to float tolerance.

The confidence band (se) has no exact skmisc counterpart and is
documented as a deliberate deviation in threshold.py's header; here we
only pin its qualitative contract (positive, finite).
"""

from __future__ import annotations

import numpy as np

from biscuit_tpu.threshold import _loess_smooth


def _loess_reference(x, y, frac=0.75):
    """Independent local linear regression: per-point tricube-weighted
    least squares solved with lstsq."""
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    n = x.size
    k = max(2, int(np.ceil(frac * n)))
    fit = np.empty(n)
    for i in range(n):
        d = np.abs(x - x[i])
        idx = np.argsort(d, kind="stable")[:k]
        h = d[idx].max()
        w = (1 - np.clip(d[idx] / (h if h > 0 else 1.0), 0, 1) ** 3) ** 3
        sw = np.sqrt(w)
        design = np.stack([np.ones(k), x[idx] - x[i]], axis=1)
        coef, *_ = np.linalg.lstsq(design * sw[:, None], y[idx] * sw,
                                   rcond=None)
        fit[i] = coef[0]
    return fit


def test_loess_fit_matches_independent_wls():
    rng = np.random.default_rng(3)
    x = np.sort(rng.uniform(0, 1, 20))
    y = np.sin(2 * x) + rng.normal(0, 0.1, 20)
    fit, se = _loess_smooth(x, y)
    ref = _loess_reference(x, y)
    np.testing.assert_allclose(fit, ref, atol=1e-10)
    assert np.all(np.isfinite(se)) and np.all(se >= 0)


def test_loess_fit_matches_independent_wls_binary_y():
    """The production use: calibration of a 0/1 correctness indicator
    against uncertainty (plot_uncertainty's right panel)."""
    rng = np.random.default_rng(9)
    x = np.sort(rng.uniform(0, 0.5, 40))
    y = (rng.uniform(0, 1, 40) < (1 - x)).astype(float)
    fit, se = _loess_smooth(x, y)
    ref = _loess_reference(x, y)
    np.testing.assert_allclose(fit, ref, atol=1e-10)


def test_loess_recovers_linear_signal():
    """On exactly linear data the local linear fit is exact regardless of
    the weighting (LOESS degree-1 reproduces polynomials of degree 1)."""
    x = np.linspace(0, 1, 25)
    y = 2.5 * x - 0.7
    fit, _ = _loess_smooth(x, y)
    np.testing.assert_allclose(fit, y, atol=1e-9)


def test_loess_frac_window():
    """Smaller frac tracks local structure more closely."""
    rng = np.random.default_rng(5)
    x = np.linspace(0, 2 * np.pi, 30)
    y = np.sin(x)
    loose, _ = _loess_smooth(x, y, frac=0.9)
    tight, _ = _loess_smooth(x, y, frac=0.3)
    assert np.abs(tight - y).mean() < np.abs(loose - y).mean()
