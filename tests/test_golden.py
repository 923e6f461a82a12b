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


class TestBiscuitAlias:
    """`import biscuit` compatibility surface (reference __init__.py:1-9)."""

    def test_reference_imports(self):
        import biscuit
        from biscuit import delong, errors, hp, threshold, utils  # noqa
        from biscuit.threshold import apply, detect, from_cv  # noqa
        from biscuit.utils import find_cv, get_model_results  # noqa
        from biscuit.delong import delong_roc_test, delong_roc_variance  # noqa

        assert biscuit.__version__ == "1.0.1"
        assert biscuit.Experiment.__name__ == "Experiment"
        assert set(biscuit.__all__) >= {
            "hp", "experiment", "utils", "errors", "delong",
            "find_cv", "get_model_results", "Experiment",
        }

    def test_alias_golden_parity(self):
        from biscuit import threshold as alias_threshold

        dfs = [make_preds(seed=s, acc=0.8) for s in range(3)]
        agg = alias_threshold.from_cv([d.copy() for d in dfs])
        for k, v in GOLDEN_FROM_CV.items():
            assert agg[k] == pytest.approx(v, abs=1e-12), k

    def test_hp_nature2022_instance(self):
        from biscuit import hp

        assert hp.nature2022.model == "xception"
        assert hp.nature2022.tile_px == 299
        assert hp.nature2022.batch_size == 128
        assert hp.nature2022.dropout == 0.1
        assert hp.nature2022.normalizer == "reinhard_fast"
        assert hp.nature2022.augment == "xyrjb"
