"""Behavioral tests for the UQ thresholding core against the reference
semantics (/root/reference/biscuit/threshold.py), using synthetic prediction
frames with known ROC geometry."""

import numpy as np
import pandas as pd
import pytest

from biscuit_tpu import errors, threshold


def make_preds(
    n_slides=40,
    tiles_per_slide=25,
    acc=0.9,
    uq_signal=True,
    seed=0,
    n_patients=None,
    no_hard_slides=False,
):
    """Synthetic tile predictions: slides alternate class; a fraction of
    tiles are 'hard' (wrong side of 0.5) and hard tiles get high uncertainty
    when uq_signal is True."""
    rng = np.random.default_rng(seed)
    rows = []
    for s in range(n_slides):
        y = s % 2
        patient = f"pt{s % (n_patients or n_slides)}"
        # 20% of slides are genuinely hard: tile majority lands on the wrong
        # side, producing slide-level errors for slide-threshold detection.
        hard_slide = rng.random() < 0.2 and acc < 1.0 and not no_hard_slides
        slide_acc = 0.35 if hard_slide else acc
        for _ in range(tiles_per_slide):
            correct = rng.random() < slide_acc
            if correct:
                y_pred = rng.uniform(0.55, 0.99) if y else rng.uniform(0.01, 0.45)
                # 10% of correct tiles look uncertain anyway (imperfect signal)
                unc = (rng.uniform(0.2, 0.5) if rng.random() < 0.1
                       else rng.uniform(0.0, 0.1))
            else:
                y_pred = rng.uniform(0.01, 0.45) if y else rng.uniform(0.55, 0.99)
                # 30% of wrong tiles slip under the uncertainty signal
                leak = rng.random() < 0.3
                unc = (rng.uniform(0.0, 0.1) if (leak or not uq_signal)
                       else rng.uniform(0.2, 0.5))
            rows.append(
                dict(
                    slide=f"slide{s}",
                    patient=patient,
                    y_true=y,
                    y_pred=y_pred,
                    uncertainty=unc,
                )
            )
    return pd.DataFrame(rows)


class TestProcessTilePredictions:
    def test_columns_and_flags(self):
        df = make_preds()
        out, thresh = threshold.process_tile_predictions(df.copy(), pred_thresh=0.5)
        for c in ("error", "correct", "incorrect", "y_pred_bin"):
            assert c in out.columns
        assert thresh == 0.5
        # correct/incorrect are complements
        assert (out["correct"].astype(int) + out["incorrect"] == 1).all()
        # binary call respects the threshold
        assert ((out["y_pred"] >= 0.5) == out["y_pred_bin"].astype(bool)).all()

    def test_detect_threshold(self):
        df = make_preds()
        _, thresh = threshold.process_tile_predictions(df.copy(), pred_thresh="detect")
        assert 0.0 < thresh < 1.0

    def test_nan_raises(self):
        df = make_preds()
        df.loc[0, "y_pred"] = np.nan
        with pytest.raises(errors.PredsContainNaNError):
            threshold.process_tile_predictions(df)

    def test_patient_mapping(self):
        df = make_preds().drop(columns=["patient"])
        patients = {f"slide{i}": f"P{i // 2}" for i in range(40)}
        out, _ = threshold.process_tile_predictions(df, patients=patients)
        assert out["patient"].iloc[0] == "P0"


class TestProcessGroupPredictions:
    def test_group_means_first_appearance_order(self):
        df = make_preds(n_slides=6)
        # Shuffle rows; group order must follow first appearance, not sort.
        df = df.sample(frac=1.0, random_state=1).reset_index(drop=True)
        out, _ = threshold.process_group_predictions(df, 0.5, "slide")
        expected_order = [
            lv for lv in pd.unique(df["slide"]) if pd.notna(lv)
        ]
        assert out["slide"].tolist() == expected_order
        # Means match manual computation.
        for _, row in out.iterrows():
            sub = df[df["slide"] == row["slide"]]
            assert row["y_pred"] == pytest.approx(sub["y_pred"].mean())
            assert row["uncertainty"] == pytest.approx(sub["uncertainty"].mean())

    def test_y_true_uint8_cast(self):
        # Impure group: mean label 0.5 -> uint8 floor to 0 (reference quirk,
        # threshold.py:197-200).
        df = pd.DataFrame(
            {
                "slide": ["a", "a"],
                "y_true": [0, 1],
                "y_pred": [0.1, 0.9],
                "uncertainty": [0.01, 0.01],
            }
        )
        out, _ = threshold.process_group_predictions(df, 0.5, "slide")
        assert out["y_true"].iloc[0] == 0

    def test_empty_raises(self):
        df = pd.DataFrame(columns=["slide", "y_true", "y_pred", "uncertainty"])
        with pytest.raises(errors.ROCFailedError):
            threshold.process_group_predictions(df, 0.5, "slide")

    def test_missing_columns(self):
        with pytest.raises(ValueError):
            threshold.process_group_predictions(
                pd.DataFrame({"slide": ["a"], "y_pred": [0.5]}), 0.5, "slide"
            )


class TestDetect:
    def test_detects_all_thresholds(self):
        df = make_preds(acc=0.85)
        thresh, auc = threshold.detect(df.copy())
        assert thresh["tile_uq"] is not None
        assert 0 < thresh["tile_uq"]
        assert thresh["tile_pred"] is not None
        assert auc is not None and auc > 0.8
        # Uncertain tiles carry the signal: threshold separates 0.1 / 0.2 bands
        assert 0.05 < thresh["tile_uq"] < 0.55

    def test_fixed_tile_uq(self):
        df = make_preds()
        thresh, _ = threshold.detect(df.copy(), tile_uq=0.15)
        assert thresh["tile_uq"] == 0.15

    def test_slide_uq_not_detect_falls_back_half(self):
        # Reference quirk threshold.py:461-463: non-'detect' slide_uq -> 0.5.
        df = make_preds()
        thresh, _ = threshold.detect(df.copy(), slide_uq=None)
        assert thresh["slide_uq"] == 0.5

    def test_nan_returns_empty(self):
        df = make_preds()
        df.loc[0, "y_pred"] = np.nan
        thresh, auc = threshold.detect(df)
        assert all(v is None for v in thresh.values())
        assert auc is None

    def test_perfect_model_degrades_to_undetectable(self):
        # 100% tile accuracy -> zero incorrect tiles -> single-class tile-UQ
        # ROC. The reference raises an uncaught ValueError from its Youden
        # idiom (threshold.py:423-424, nan tuples never match in list.index)
        # which crashes its whole results assembly; we DELIBERATELY fix the
        # quirk (shaken out by benchmarks/run_full_matrix.py at grid scale)
        # by returning the same empty-thresholds contract as the other
        # undetectable cases, so from_cv skips the fold instead.
        df = make_preds(acc=1.0)
        thresh, auc = threshold.detect(df.copy())
        assert all(v is None for v in thresh.values())
        assert auc is None

    def test_correct_slides_no_slide_threshold(self):
        # Incorrect tiles exist, but after tile-UQ filtering every slide is
        # correct -> slide_uq None (threshold.py:445-448).
        df = make_preds(acc=0.9, no_hard_slides=True)
        thresh, auc = threshold.detect(df.copy())
        assert thresh["slide_uq"] is None
        assert auc == 1.0


class TestApply:
    def test_apply_improves_or_keeps_auc(self):
        train = make_preds(seed=1, acc=0.8)
        test = make_preds(seed=2, acc=0.8)
        thresh, _ = threshold.detect(train.copy())
        res, s_df = threshold.apply(
            test.copy(),
            tile_uq=thresh["tile_uq"],
            slide_uq=thresh["slide_uq"],
            tile_pred=thresh["tile_pred"],
            slide_pred=thresh["slide_pred"],
        )
        base = threshold.apply(
            test.copy(), tile_uq=0, slide_uq=0, tile_pred=0.5, slide_pred=0.5
        )[0]
        assert res["auc"] >= base["auc"]
        assert 0 < res["percent_incl"] <= 1
        assert s_df is not None

    def test_keep_low_confidence_complements(self):
        df = make_preds(seed=3, acc=0.8)
        thresh, _ = threshold.detect(df.copy())
        hi, hi_df = threshold.apply(
            df.copy(), keep="high_confidence", **{
                k: thresh[k] for k in ("tile_uq", "slide_uq", "tile_pred", "slide_pred")}
        )
        lo, lo_df = threshold.apply(
            df.copy(), keep="low_confidence", **{
                k: thresh[k] for k in ("tile_uq", "slide_uq", "tile_pred", "slide_pred")}
        )
        # Complementary cohorts partition the post-tile-filter slides.
        assert len(hi_df) + len(lo_df) == hi["percent_incl"] * 40 + lo["percent_incl"] * 40
        assert set(hi_df["slide"]).isdisjoint(set(lo_df["slide"]))

    def test_patient_level(self):
        df = make_preds(seed=4).drop(columns=["patient"])
        patients = {f"slide{i}": f"P{i}" for i in range(40)}
        res, s_df = threshold.apply(
            df, tile_uq=0.5, slide_uq=0.5, patients=patients, level="patient"
        )
        assert "patient" in s_df.columns

    def test_patient_level_requires_patients(self):
        with pytest.raises(AssertionError):
            threshold.apply(make_preds(), 0.1, 0.1, level="patient")


class TestFromCV:
    def test_aggregation_min_max_mean(self):
        dfs = [make_preds(seed=s, acc=0.8) for s in range(3)]
        per_fold = [threshold.detect(d.copy())[0] for d in dfs]
        agg = threshold.from_cv([d.copy() for d in dfs])
        assert agg["tile_uq"] == pytest.approx(
            min(f["tile_uq"] for f in per_fold))
        assert agg["slide_uq"] == pytest.approx(
            max(f["slide_uq"] for f in per_fold))
        assert agg["tile_pred"] == pytest.approx(
            np.mean([f["tile_pred"] for f in per_fold]))
        assert agg["slide_pred"] == pytest.approx(
            np.mean([f["slide_pred"] for f in per_fold]))

    def test_missing_columns_raise(self):
        with pytest.raises(ValueError):
            threshold.from_cv([pd.DataFrame({"y_true": [1]})])

    def test_degenerate_fold_skipped_good_folds_aggregate(self):
        # One all-correct fold (single-class error ROC, the reference's
        # crash case) among good folds: the degenerate fold is skipped and
        # aggregation runs over the good ones — the exact situation the
        # full-matrix sitting hit in its GAN arm's nested CV.
        good = [make_preds(seed=s, acc=0.8) for s in range(2)]
        degenerate = make_preds(seed=9, acc=1.0)
        agg = threshold.from_cv([d.copy() for d in good] + [degenerate])
        per_fold = [threshold.detect(d.copy())[0] for d in good]
        assert agg["tile_uq"] == pytest.approx(
            min(f["tile_uq"] for f in per_fold))

    def test_all_folds_undetectable_raises(self):
        # Folds with incorrect tiles but no incorrect slides are skipped;
        # when every fold is skipped, from_cv raises (threshold.py:540-543).
        dfs = [make_preds(seed=s, acc=0.9, no_hard_slides=True) for s in range(2)]
        with pytest.raises(errors.ThresholdError):
            threshold.from_cv(dfs)

    def test_two_stage_nested_protocol(self):
        # The protocol used by Experiment.thresholds_from_nested_cv
        # (experiment.py:967-978): first detect tile_uq only, then slide.
        dfs = [make_preds(seed=s, acc=0.8) for s in range(3)]
        tile_uq = threshold.from_cv(
            [d.copy() for d in dfs], tile_uq="detect", slide_uq=None,
            tile_pred="detect", slide_pred="detect",
        )["tile_uq"]
        thresholds = threshold.from_cv(
            [d.copy() for d in dfs], tile_uq=tile_uq, slide_uq="detect",
            tile_pred="detect", slide_pred="detect",
        )
        assert isinstance(tile_uq, float)
        assert thresholds["tile_uq"] == tile_uq
        assert thresholds["slide_uq"] is not None
