"""Experiment-level parallelism: Experiment.run with
train_kwargs={'n_submeshes': N} dispatches independent (experiment, fold)
trainings onto disjoint device submeshes (SURVEY.md §2.5) and produces the
same artifacts as the sequential path.

The sequential baseline is pinned to one 4-device submesh so both runs use
identical per-device batch layouts — any divergence is then a real
concurrency bug, not a reduction-order artifact.
"""

import json
import os
import sys
from os.path import join

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(__file__))
from test_experiment import build_project, tiny_hp  # noqa: E402

from biscuit_tpu.experiment import Experiment  # noqa: E402

LADDER = {"ZC": {"out1": 6, "out2": 6}}
STEPS = [2, 3]


def _run(tmp, name, seed_proj, train_kwargs):
    P = build_project(tmp, name, 16, seed=seed_proj)
    exp = Experiment(P, outcome="cohort", outcome1="LUAD", outcome2="LUSC",
                     outdir=str(tmp / f"{name}_results"))
    exp.train_kwargs = dict(train_kwargs)
    exp.run(LADDER, steps=STEPS, hp=tiny_hp())
    return exp


def _model_map(P):
    """{dir-suffix: full path} for every model dir (strips the run number,
    which is allocation-order dependent under concurrency)."""
    return {
        d[6:]: join(P.models_dir, d) for d in os.listdir(P.models_dir)
    }


@pytest.fixture(scope="module")
def both_runs(tmp_path_factory):
    from biscuit_tpu.parallel.scheduler import partition_submeshes

    tmp = tmp_path_factory.mktemp("submesh")
    sub0 = partition_submeshes(2)[0]
    seq = _run(tmp, "seq", 0, {"seed": 0, "mesh": sub0})
    par = _run(tmp, "par", 0, {"seed": 0, "n_submeshes": 2})
    return seq, par


class TestSubmeshExperiment:
    def test_same_model_set(self, both_runs):
        seq, par = both_runs
        seq_dirs = _model_map(seq.train_project)
        par_dirs = _model_map(par.train_project)
        assert set(seq_dirs) == set(par_dirs)
        # steps [2, 3] on one experiment: 3 CV folds + 3 UQ folds
        assert len(seq_dirs) == 6

    def test_results_logs_match(self, both_runs):
        seq, par = both_runs
        seq_dirs = _model_map(seq.train_project)
        par_dirs = _model_map(par.train_project)
        for suffix, sdir in seq_dirs.items():
            s = pd.read_csv(join(sdir, "results_log.csv"))
            p = pd.read_csv(join(par_dirs[suffix], "results_log.csv"))
            assert list(s.columns) == list(p.columns)
            for col in s.columns:
                for sv, pv in zip(s[col], p[col]):
                    if isinstance(sv, str) and sv.startswith("{"):
                        sj, pj = json.loads(sv), json.loads(pv)
                        assert sj.keys() == pj.keys()
                        for kk in sj:
                            np.testing.assert_allclose(
                                sj[kk], pj[kk], atol=1e-5,
                                err_msg=f"{suffix} {col} {kk}")
                    elif isinstance(sv, float):
                        np.testing.assert_allclose(sv, pv, atol=1e-5)
                    else:
                        assert sv == pv, f"{suffix} {col}"

    def test_predictions_match(self, both_runs):
        seq, par = both_runs
        seq_dirs = _model_map(seq.train_project)
        par_dirs = _model_map(par.train_project)
        compared = 0
        for suffix, sdir in seq_dirs.items():
            fname = "tile_predictions_val_epoch1.csv"
            if not os.path.exists(join(sdir, fname)):
                continue
            s = pd.read_csv(join(sdir, fname)).sort_values(
                ["slide", "loc_x", "loc_y"]).reset_index(drop=True)
            p = pd.read_csv(join(par_dirs[suffix], fname)).sort_values(
                ["slide", "loc_x", "loc_y"]).reset_index(drop=True)
            # slide names differ only by the project-name prefix (seq/par)
            assert [x[3:] for x in s["slide"]] == [x[3:] for x in p["slide"]]
            for col in s.columns:
                if s[col].dtype.kind == "f":
                    np.testing.assert_allclose(
                        s[col].to_numpy(), p[col].to_numpy(), atol=1e-4,
                        err_msg=f"{suffix} {col}")
            compared += 1
        assert compared >= 3  # all UQ folds carry validation predictions

    def test_splits_written_once_and_identical(self, both_runs):
        seq, par = both_runs
        s = json.load(open(join(seq.train_project.root, "splits_ZC.json")))
        p = json.load(open(join(par.train_project.root, "splits_ZC.json")))
        # slide names differ only by the project-name prefix
        strip = lambda fold, pre: sorted(x[len(pre):] for x in fold)
        for k in s["folds"]:
            assert strip(s["folds"][k], "seq") == strip(p["folds"][k], "par")
        assert not [f for f in os.listdir(par.train_project.root)
                    if ".tmp." in f]


class TestSubmeshFailureSemantics:
    def test_failed_fold_raises_and_resumes(self, tmp_path, monkeypatch):
        """A fold crashing under concurrent dispatch surfaces the error
        (matching sequential semantics) while completed folds' artifacts
        survive; a clean rerun resumes only the missing fold (§5.3
        fold-level idempotence under the scheduler)."""
        import biscuit_tpu.train.trainer as trainer_mod

        P = build_project(tmp_path, "fl", 16, seed=0)
        exp = Experiment(P, outcome="cohort", outcome1="LUAD",
                         outcome2="LUSC", outdir=str(tmp_path / "res"))
        exp.train_kwargs = {"seed": 0, "n_submeshes": 2}

        real = trainer_mod._train_single

        def flaky(*args, **kwargs):
            if kwargs.get("kfold") == 2:
                raise RuntimeError("injected fold-2 failure")
            return real(*args, **kwargs)

        monkeypatch.setattr(trainer_mod, "_train_single", flaky)
        with pytest.raises(RuntimeError, match="injected"):
            exp.run(LADDER, steps=[2], hp=tiny_hp())
        monkeypatch.setattr(trainer_mod, "_train_single", real)

        from biscuit_tpu import utils

        done_before = [
            k for k in (1, 2, 3)
            if utils.model_exists(P, "EXP_ZC", outcome="cohort", kfold=k)
        ]
        assert 2 not in done_before and len(done_before) >= 1

        exp.run(LADDER, steps=[2], hp=tiny_hp())
        for k in (1, 2, 3):
            m = utils.find_model(P, "EXP_ZC", outcome="cohort", kfold=k)
            assert os.path.exists(join(m, "results_log.csv"))


class TestNestedCVSubmesh:
    def test_nested_cv_dispatches_inner_folds(self, tmp_path):
        """ADVICE r2: step 4 (nested UQ CV — the largest training volume
        of the published protocol) dispatches its (outer, inner) folds
        through the SubmeshScheduler; concurrent and sequential runs
        produce the same inner-model artifact set."""
        from biscuit_tpu import utils
        from biscuit_tpu.parallel.scheduler import (
            SubmeshScheduler, partition_submeshes)

        hp = tiny_hp(uq=True)

        def build_and_outer(name, mesh=None):
            P = build_project(tmp_path, name, 16, seed=0)
            exp = Experiment(P, outcome="cohort", outcome1="LUAD",
                             outcome2="LUSC",
                             outdir=str(tmp_path / f"{name}_res"))
            exp.train_kwargs = {"seed": 0}
            exp.train(hp=hp, label="EXP_NS_UQ", val_k_fold=2, val_k=[1, 2],
                      val_strategy="k-fold", splits="splits_NS.json",
                      seed=0, mesh=mesh)
            return exp

        sub0 = partition_submeshes(2)[0]
        seq = build_and_outer("nseq", mesh=sub0)
        seq.train_nested_cv(hp=hp, label="EXP_NS_UQ", outer_k=2, inner_k=2,
                            val_strategy="k-fold", seed=0, mesh=sub0)

        par = build_and_outer("npar")
        par.train_nested_cv(hp=hp, label="EXP_NS_UQ", outer_k=2, inner_k=2,
                            val_strategy="k-fold", seed=0,
                            scheduler=SubmeshScheduler(n_submeshes=2))

        for exp in (seq, par):
            for outer in (1, 2):
                for inner in (1, 2):
                    assert utils.model_exists(
                        exp.train_project, f"EXP_NS_UQ-k{outer}",
                        outcome="cohort", kfold=inner,
                    ), (exp.train_project.root, outer, inner)
