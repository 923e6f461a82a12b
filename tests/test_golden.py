"""Golden regression tests: exact pinned outputs of the statistics pipeline
on a deterministic synthetic dataset (SURVEY.md §4.2 — the stand-in for the
reference's 'bitwise-comparable CSVs' requirement). Any change to the ROC
conventions, threshold detection, fold aggregation, or groupby semantics
will break these exact values."""

import sys
from os.path import dirname

import pytest

sys.path.insert(0, dirname(__file__))
from test_threshold import make_preds

from biscuit_tpu import threshold

GOLDEN_FROM_CV = {
    "tile_uq": 0.09890317328695383,
    "slide_uq": 0.06150041183104834,
    "tile_pred": 0.5531135959769432,
    "slide_pred": 0.5057396178945194,
}
GOLDEN_APPLY = {
    "auc": 1.0,
    "percent_incl": 0.975,
    "acc": 0.9743589743589743,
    "sensitivity": 0.95,
    "specificity": 1.0,
}


def test_from_cv_golden():
    dfs = [make_preds(seed=s, acc=0.8) for s in range(3)]
    agg = threshold.from_cv([d.copy() for d in dfs])
    for k, v in GOLDEN_FROM_CV.items():
        assert agg[k] == pytest.approx(v, abs=1e-12), k


def test_apply_golden():
    dfs = [make_preds(seed=s, acc=0.8) for s in range(3)]
    agg = threshold.from_cv([d.copy() for d in dfs])
    res, _ = threshold.apply(make_preds(seed=99, acc=0.8), **agg)
    for k, v in GOLDEN_APPLY.items():
        assert float(res[k]) == pytest.approx(v, abs=1e-12), k
