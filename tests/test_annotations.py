"""Pin experiment construction on the REAL reference annotations.

The reference ships the actual study annotations
(/root/reference/annotations/tcga.csv — 991 rows with
patient,slide,cohort,order,order2,site — and cptac.csv — 1306 eval
slides) and calibrates its experiment matrix to them. The tcga file
embeds 50 synthetic GAN rows (slides gan0..gan49, site == 'GAN',
carrying the 50 highest 'order' values), which `add` must skip for the
real-slide selections (reference experiment.py:125-128) and draw from
only via the `gan=` fraction (125-143). What remains is exactly 467
LUAD / 474 LUSC real slides — the full-dataset counts the 'AA' rung
hardcodes (reference experiment.py:176-178), with ZERO headroom: the
published full-dataset run uses every real slide. Ladder subsets select
the first-N slides per cohort under the 'order' column (forward runs) or
'order2' (the published reverse-ordering replicates, experiment.py:
101-122), and cross-validation preserves the real TCGA site codes (39
sites) within folds.

These tests exercise `Experiment.add`/`config` and `kfold_split` against
those files read IN PLACE (never copied into the repo; `add` mutates its
input, so it operates on a tmp-path copy made at test runtime).
Expectations are computed independently with raw pandas/numpy — not by
re-running the implementation.
"""

import hashlib
import os
import shutil

import numpy as np
import pandas as pd
import pytest

REF_ANN = "/root/reference/annotations"
TCGA = os.path.join(REF_ANN, "tcga.csv")
CPTAC = os.path.join(REF_ANN, "cptac.csv")

pytestmark = pytest.mark.skipif(
    not (os.path.exists(TCGA) and os.path.exists(CPTAC)),
    reason="reference annotations not available",
)


def _sha(path):
    with open(path, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()


# ---------------------------------------------------------------------------
# Raw-file facts the experiment matrix is calibrated against
# ---------------------------------------------------------------------------


class TestRawAnnotations:
    def test_tcga_schema_and_counts(self):
        t = pd.read_csv(TCGA, dtype=str)
        assert list(t.columns) == [
            "patient", "slide", "cohort", "order", "order2", "site",
        ]
        assert len(t) == 991
        gan = t[t["site"] == "GAN"]
        real = t[t["site"] != "GAN"]
        # 50 embedded GAN rows, 25 per cohort, named gan0..gan49.
        assert len(gan) == 50
        assert dict(gan["cohort"].value_counts()) == {"LUAD": 25,
                                                      "LUSC": 25}
        assert set(gan["slide"]) == {f"gan{i}" for i in range(50)}
        # The real-slide cohort counts are EXACTLY the hardcoded 'AA'
        # rung (reference experiment.py:176-178): the full-dataset run
        # consumes every real slide with zero headroom.
        counts = real["cohort"].value_counts()
        assert counts["LUAD"] == 467
        assert counts["LUSC"] == 474
        # One slide per patient, no duplicates: the slide<->patient seam
        # utils.py's 6/11-char dir slicing depends on.
        assert t["slide"].is_unique and t["patient"].is_unique
        assert real["site"].nunique() == 39

    def test_tcga_order_columns_are_permutations(self):
        """'order' and 'order2' are both permutations of 1..991, the GAN
        rows hold the 50 highest 'order' values (so descending real-slide
        selections stay below them), and the two columns are distinct
        orderings ('order2' drives the published reverse-ordering
        replicate, reference experiment.py:101-122)."""
        t = pd.read_csv(TCGA)
        for col in ("order", "order2"):
            vals = np.sort(t[col].to_numpy())
            np.testing.assert_array_equal(vals, np.arange(1, 992))
        gan_orders = t.loc[t["site"] == "GAN", "order"]
        assert gan_orders.min() == 942  # 991 - 49
        assert (t["order"] != t["order2"]).any()

    def test_cptac_schema_and_counts(self):
        c = pd.read_csv(CPTAC, dtype=str)
        # Eval annotations carry no order/site/GAN rows: the whole cohort
        # is always evaluated (reference experiment.py eval path).
        assert list(c.columns) == ["patient", "slide", "cohort"]
        assert len(c) == 1306
        counts = c["cohort"].value_counts()
        assert counts["LUAD"] == 644
        assert counts["LUSC"] == 662
        assert c["slide"].is_unique
        assert not c["slide"].str.startswith("gan").any()


# ---------------------------------------------------------------------------
# Experiment.add / config on the real training annotations
# ---------------------------------------------------------------------------


def _make_experiment(tmp_path):
    from biscuit_tpu.experiment import Experiment
    from biscuit_tpu.project import Project

    proj = Project(
        str(tmp_path / "proj"), annotations=str(tmp_path / "tcga.csv"),
        name="TCGA", create=True,
    )
    return Experiment(proj, outdir=str(tmp_path / "results"))


def _expected_selection(ann, cohort, n, order_col, descending, gan=False):
    """Independent expectation: the n slides of `cohort` ranked by the
    numeric order column, drawn from the real rows (site != GAN) — or
    from the GAN rows when gan=True (reference experiment.py:125-143).
    Orders are unique, so there are no ties to resolve."""
    mask = (ann["site"] == "GAN") if gan else (ann["site"] != "GAN")
    sub = ann[mask & (ann["cohort"] == cohort)].copy()
    sub["_o"] = pd.to_numeric(sub[order_col])
    sub = sub.sort_values("_o", ascending=not descending)
    return set(sub["slide"].head(n))


class TestAddOnRealAnnotations:
    @pytest.fixture()
    def ann_copy(self, tmp_path):
        # `add` writes the include_{label} column back into its input
        # file, so it runs on a runtime copy; the reference CSV itself
        # stays read-only (hash-checked by test_configure_readonly_drive).
        dst = str(tmp_path / "tcga.csv")
        shutil.copyfile(TCGA, dst)
        return dst

    @pytest.mark.parametrize(
        "label,n1,n2",
        [("AA", 467, 474), ("R", 250, 250), ("G", 50, 50), ("ZD", 5, 5)],
    )
    def test_forward_selection(self, tmp_path, ann_copy, label, n1, n2):
        exp = _make_experiment(tmp_path)
        exp.add(ann_copy, label, out1=n1, out2=n2)
        raw = pd.read_csv(TCGA, dtype=str)
        out = pd.read_csv(ann_copy, dtype=str)
        col = out[f"include_{label}"]
        sel = set(out.loc[col == "include", "slide"])
        assert (col == "include").sum() == n1 + n2
        assert not any(s.startswith("gan") for s in sel)
        assert sel == (
            _expected_selection(raw, "LUAD", n1, "order", False)
            | _expected_selection(raw, "LUSC", n2, "order", False)
        )

    def test_order2_selects_the_reverse_ordering_replicate(
        self, tmp_path, ann_copy
    ):
        """order_col='order2' (ref experiment.py:101-103) must pick a
        different concrete subset for mid-ladder sizes — the published
        study's independent orderings."""
        exp = _make_experiment(tmp_path)
        exp.add(ann_copy, "R1", out1=250, out2=250, order_col="order")
        exp.add(ann_copy, "R2", out1=250, out2=250, order_col="order2")
        raw = pd.read_csv(TCGA, dtype=str)
        out = pd.read_csv(ann_copy, dtype=str)
        sel1 = set(out.loc[out["include_R1"] == "include", "slide"])
        sel2 = set(out.loc[out["include_R2"] == "include", "slide"])
        assert sel2 == (
            _expected_selection(raw, "LUAD", 250, "order2", False)
            | _expected_selection(raw, "LUSC", 250, "order2", False)
        )
        assert sel1 != sel2

    def test_reverse_order_flag(self, tmp_path, ann_copy):
        """order='r' sorts descending (ref experiment.py:118-122): the
        selection comes from the tail of the REAL-slide ordering — the
        GAN rows hold the 50 highest raw order values but must never
        enter a real-slide selection."""
        exp = _make_experiment(tmp_path)
        exp.add(ann_copy, "Gr", out1=50, out2=50, order="r")
        raw = pd.read_csv(TCGA, dtype=str)
        out = pd.read_csv(ann_copy, dtype=str)
        sel = set(out.loc[out["include_Gr"] == "include", "slide"])
        assert not any(s.startswith("gan") for s in sel)
        assert sel == (
            _expected_selection(raw, "LUAD", 50, "order", True)
            | _expected_selection(raw, "LUSC", 50, "order", True)
        )

    def test_gan_fraction_draws_from_embedded_gan_rows(self, tmp_path,
                                                       ann_copy):
        """gan=0.1 on a 100-slide rung adds round(0.1*50)=5 GAN slides
        per cohort, selected from the embedded gan0..gan49 rows by order
        (reference experiment.py:123-143)."""
        exp = _make_experiment(tmp_path)
        exp.add(ann_copy, "Gg", out1=50, out2=50, gan=0.1)
        raw = pd.read_csv(TCGA, dtype=str)
        out = pd.read_csv(ann_copy, dtype=str)
        sel = set(out.loc[out["include_Gg"] == "include", "slide"])
        gan_sel = {s for s in sel if s.startswith("gan")}
        assert len(sel) == 110 and len(gan_sel) == 10
        assert gan_sel == (
            _expected_selection(raw, "LUAD", 5, "order", False, gan=True)
            | _expected_selection(raw, "LUSC", 5, "order", False, gan=True)
        )

    def test_config_aa_rung_consumes_every_real_slide(self, tmp_path,
                                                      ann_copy):
        """config()'s hardcoded full-dataset rung (467/474) equals the
        real-file cohort counts exactly — add() succeeds with zero
        spare slides and includes all 941 real rows."""
        from biscuit_tpu.experiment import Experiment

        cfg = Experiment.config("{}", ["AA"], 1)
        assert cfg == {"AA": {"out1": 467, "out2": 474}}
        exp = _make_experiment(tmp_path)
        exp.add(ann_copy, "AA", **cfg["AA"])
        out = pd.read_csv(ann_copy, dtype=str)
        inc = out[out["include_AA"] == "include"]
        assert len(inc) == 941
        assert set(inc["slide"]) == set(
            out.loc[out["site"] != "GAN", "slide"]
        )
        # One more slide than available must fail add()'s guard.
        with pytest.raises(AssertionError):
            exp.add(ann_copy, "AAx", out1=468, out2=474)


# ---------------------------------------------------------------------------
# Site-preserved cross-validation over the real TCGA site codes
# ---------------------------------------------------------------------------


class TestSitePreservedSplitsRealSites:
    def test_kfold_is_site_disjoint_and_balanced(self):
        from biscuit_tpu.train.splits import kfold_split

        t = pd.read_csv(TCGA, dtype=str)
        t = t[t["site"] != "GAN"]  # split real slides, as training does
        labels = {
            r.slide: (0 if r.cohort == "LUAD" else 1)
            for r in t.itertuples()
        }
        sites = {r.slide: r.site for r in t.itertuples()}
        folds = kfold_split(list(t["slide"]), labels, sites=sites, k=3,
                            seed=0)
        # Every slide in exactly one fold.
        all_slides = sorted(s for f in folds.values() for s in f)
        assert all_slides == sorted(t["slide"])
        # Site-preservation: each real site code lands wholly in one fold.
        site_fold = {}
        for fold, members in folds.items():
            for s in members:
                site = sites[s]
                assert site_fold.setdefault(site, fold) == fold, (
                    f"site {site} split across folds"
                )
        # Balance on the real distribution (largest site, Site-67, holds
        # 125/941 real slides): fold sizes within 15% of even and both
        # cohorts present at a sane ratio per fold (raw prevalence is
        # 49.6% LUAD).
        for fold, members in folds.items():
            assert abs(len(members) - 941 / 3) <= 0.15 * 941 / 3
            frac = np.mean([labels[s] == 0 for s in members])
            assert 0.35 <= frac <= 0.65, f"fold {fold} LUAD frac {frac}"


# ---------------------------------------------------------------------------
# The CV protocol end-to-end on real annotation metadata
# ---------------------------------------------------------------------------


class TestLadderOnRealAnnotations:
    def test_run_step2_trains_real_slide_selection(self, tmp_path):
        """Experiment.run(step 2) with the REAL tcga.csv as the project
        annotations (tmp copy; run() writes include columns into its
        experiments.csv): the ZD rung selects the 10 lowest-order real
        slides, 3-fold site-preserved CV runs on their real site codes,
        and the artifact tree materializes under the real slide names."""
        import sys

        sys.path.insert(0, os.path.dirname(__file__))
        from test_experiment import tiny_hp, write_tiles

        from biscuit_tpu import utils
        from biscuit_tpu.experiment import Experiment
        from biscuit_tpu.project import Project

        raw = pd.read_csv(TCGA, dtype=str)
        selected = sorted(
            _expected_selection(raw, "LUAD", 5, "order", False)
            | _expected_selection(raw, "LUSC", 5, "order", False)
        )
        labels = dict(zip(raw["slide"], raw["cohort"]))

        ann_copy = str(tmp_path / "tcga.csv")
        shutil.copyfile(TCGA, ann_copy)
        tfr = tmp_path / "tfr"
        tfr.mkdir()
        rng = np.random.default_rng(0)
        for s in selected:
            write_tiles(tfr, s, 0 if labels[s] == "LUAD" else 1,
                        hard=False, rng=rng, n=8)

        P = Project(str(tmp_path / "proj"), annotations=ann_copy,
                    name="TCGA", create=True)
        P.add_source("SRC", tfrecords=str(tfr))
        exp = Experiment(P, outcome="cohort", outcome1="LUAD",
                         outcome2="LUSC", outdir=str(tmp_path / "results"))
        exp.train_kwargs = {"seed": 0, "validate_on_batch": 8,
                            "validation_steps": 2}
        exp.run({"ZD": {"out1": 5, "out2": 5}}, steps=[2], hp=tiny_hp())

        # The run-scoped annotations got the include column for exactly
        # the expected real slides.
        exps = pd.read_csv(os.path.join(P.root, "experiments.csv"),
                           dtype=str)
        inc = sorted(exps.loc[exps["include_ZD"] == "include", "slide"])
        assert inc == selected

        # 3 CV folds trained over the real slides; every selected slide
        # was validated on exactly once across folds (k-fold coverage),
        # under its real TCGA name.
        val_slides = []
        for k in (1, 2, 3):
            d = utils.find_model(P, "EXP_ZD", outcome="cohort", kfold=k)
            assert os.path.exists(os.path.join(d, "results_log.csv")), d
            tile_df = pd.read_csv(
                os.path.join(d, "tile_predictions_val_epoch1.csv"))
            val_slides.extend(tile_df["slide"].unique())
        assert sorted(val_slides) == selected

        # The folds preserved the real site codes (Site-29 holds 3 of the
        # 10 slides across BOTH cohorts; Site-69 two): no site's slides
        # are validated in more than one fold.
        sites = dict(zip(raw["slide"], raw["site"]))
        fold_of = {}
        for k in (1, 2, 3):
            d = utils.find_model(P, "EXP_ZD", outcome="cohort", kfold=k)
            tile_df = pd.read_csv(
                os.path.join(d, "tile_predictions_val_epoch1.csv"))
            for s in tile_df["slide"].unique():
                site = sites[s]
                assert fold_of.setdefault(site, k) == k, (
                    f"site {site} validated in folds {fold_of[site]} and {k}"
                )


# ---------------------------------------------------------------------------
# Results-free CLI drive: configure projects straight on the reference files
# ---------------------------------------------------------------------------


class TestConfigureCliOnReferenceAnnotations:
    def test_configure_readonly_drive(self, tmp_path):
        from click.testing import CliRunner

        from biscuit_tpu.cli.configure import configure_projects
        from biscuit_tpu.project import Project

        sha_before = (_sha(TCGA), _sha(CPTAC))
        out = str(tmp_path / "projects")
        r = CliRunner()
        res = r.invoke(
            configure_projects,
            [
                "--train_anns", TCGA, "--val_anns", CPTAC,
                "--train_slides", str(tmp_path / "s1"),
                "--val_slides", str(tmp_path / "s2"),
                "--out", out, "--extract", "False",
            ],
        )
        assert res.exit_code == 0, res.output
        # Projects reference the files in place; the datasets load the
        # real cohorts (941 real + 50 GAN training slides, 1306 eval).
        tP = Project(os.path.join(out, "training"))
        assert tP.annotations == TCGA
        lbl, unique = tP.dataset().labels("cohort")
        assert sorted(unique) == ["LUAD", "LUSC"]
        assert len(lbl) == 991
        vP = Project(os.path.join(out, "evaluation"))
        vlbl, _ = vP.dataset().labels("cohort")
        assert len(vlbl) == 1306
        # The reference files were never written to.
        assert (_sha(TCGA), _sha(CPTAC)) == sha_before
