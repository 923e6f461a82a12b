"""Content-level assertions for the figure layer (VERDICT r4 weak-6).

`Experiment.display`'s paired t-tests and LOESS panel, and
`threshold.plot_uncertainty`'s calibration panel, are checked against
independently computed values — not just "an SVG exists". Reference
counterparts: /root/reference/biscuit/experiment.py:186-486 (display /
plot_uq_calibration), /root/reference/biscuit/threshold.py:15-122
(plot_uncertainty).
"""

import numpy as np
import pandas as pd
import pytest
from scipy import stats as scipy_stats

from biscuit_tpu import threshold
from biscuit_tpu.experiment import Experiment


def _results_frame():
    """Fixed synthetic cross-val results frame: two ladder sizes x 3 folds
    x {all, include} UQ arms, values chosen so the paired differences have
    nonzero variance (a zero-variance difference makes t degenerate)."""
    rows = []
    data = {
        150: {"all": [(0.80, 0.78), (0.85, 0.83), (0.82, 0.81)],
              "include": [(0.88, 0.86), (0.86, 0.87), (0.91, 0.90)]},
        200: {"all": [(0.84, 0.83), (0.87, 0.86), (0.86, 0.88)],
              "include": [(0.90, 0.91), (0.92, 0.90), (0.89, 0.92)]},
    }
    for n_slides, arms in data.items():
        for uq, vals in arms.items():
            for fold, (p_auc, s_auc) in enumerate(vals, start=1):
                rows.append(dict(
                    id=f"E{n_slides}", fold=fold, n_slides=n_slides,
                    uq=uq, patient_auc=p_auc, slide_auc=s_auc,
                ))
    return pd.DataFrame(rows), data


def _bare_experiment(tmp_path):
    exp = Experiment.__new__(Experiment)
    exp.outdir = str(tmp_path)
    exp.outcome, exp.outcome1, exp.outcome2 = "cohort", "LUAD", "LUSC"
    return exp


class TestDisplayContent:
    def test_paired_ttest_matches_independent_computation(self, tmp_path,
                                                          capsys):
        """display()'s printed paired one-sided p-values equal the textbook
        paired-t computation (mean/sd of differences + Student-t CDF) —
        independent of scipy.stats.ttest_rel's internals."""
        df, data = _results_frame()
        exp = _bare_experiment(tmp_path)
        exp.display(df, eval_dfs={}, ttest_uq_groups=("all", "include"))
        out = capsys.readouterr().out

        # Parse "Paired t-tests (patient-level):" blocks -> {level: {n: p}}.
        printed = {}
        level = None
        for line in out.splitlines():
            if line.startswith("Paired t-tests ("):
                level = line.split("(")[1].split("-")[0]
                printed[level] = {}
            elif level and "p =" in line:
                toks = line.split()
                printed[level][int(toks[0])] = float(toks[-1])

        assert set(printed) == {"patient", "slide"}
        for level, col in (("patient", 0), ("slide", 1)):
            for n_slides, arms in data.items():
                a = np.array([v[col] for v in arms["all"]])
                b = np.array([v[col] for v in arms["include"]])
                d = a - b
                t_stat = d.mean() / (d.std(ddof=1) / np.sqrt(d.size))
                p_expected = scipy_stats.t.cdf(t_stat, d.size - 1)
                assert printed[level][n_slides] == pytest.approx(
                    p_expected, rel=1e-9), (level, n_slides)

    def test_loess_panel_receives_sorted_auc_series(self, tmp_path,
                                                    monkeypatch):
        """The middle crossval panel's LOESS is fed exactly the results
        frame's (n_slides, slide_auc) pairs sorted by n_slides (float32 x,
        finite-filtered y) — display imports _loess_smooth from
        biscuit_tpu.threshold at call time, so patching the module
        attribute intercepts the real call."""
        df, _ = _results_frame()
        # Inject one NaN slide_auc to exercise the finite filter.
        df = pd.concat([df, pd.DataFrame([dict(
            id="E300", fold=1, n_slides=300, uq="all",
            patient_auc=0.9, slide_auc=np.nan)])], ignore_index=True)
        captured = {}

        def fake_loess(x, y, frac=0.75):
            captured["x"], captured["y"] = np.asarray(x), np.asarray(y)
            return np.zeros_like(np.asarray(y), dtype=float), \
                np.zeros_like(np.asarray(y), dtype=float)

        monkeypatch.setattr(threshold, "_loess_smooth", fake_loess)
        exp = _bare_experiment(tmp_path)
        exp.display(df, eval_dfs={}, ttest_uq_groups=None)

        srt = df.sort_values(by=["n_slides"])
        finite = np.isfinite(srt["slide_auc"].to_numpy())
        assert np.array_equal(
            captured["x"],
            srt["n_slides"].to_numpy().astype(np.float32)[finite])
        assert np.array_equal(
            captured["y"], srt["slide_auc"].to_numpy()[finite])
        assert captured["y"].size == len(df) - 1  # NaN row dropped


class TestPlotUncertaintyPanels:
    @pytest.fixture()
    def frame(self):
        rng = np.random.default_rng(3)
        n = 40
        y_true = np.repeat([0, 1], n // 2)
        y_pred = np.clip(y_true * 0.6 + rng.normal(0.2, 0.18, n), 0, 1)
        unc = rng.uniform(0.0, 0.3, n)
        correct = ((y_pred >= 0.5) & (y_true == 1)) | (
            (y_pred < 0.5) & (y_true == 0))
        return pd.DataFrame(dict(
            slide=[f"s{i}" for i in range(n)], y_true=y_true,
            y_pred=y_pred, uncertainty=unc, correct=correct,
            incorrect=(~correct).astype(int),
        ))

    def test_calibration_panel_plots_sorted_correctness(self, frame):
        """Right panel: the '+' series is (uncertainty, correct-as-float)
        sorted by uncertainty; the fit line is _loess_smooth of exactly
        that series (recomputed independently here)."""
        import matplotlib.pyplot as plt

        threshold.plot_uncertainty(frame, kind="slide", threshold=0.15)
        axes = plt.gcf().axes
        pts = axes[2].lines[0].get_xydata()
        fit = axes[2].lines[1].get_xydata()
        plt.close("all")

        srt = frame.sort_values(by=["uncertainty"])
        x = srt["uncertainty"].to_numpy()
        y = srt["correct"].astype(float).to_numpy()
        assert np.array_equal(pts[:, 0], x)
        assert np.array_equal(pts[:, 1], y)
        z, _se = threshold._loess_smooth(x, y)
        assert np.allclose(fit[:, 1], z)

    def test_threshold_scatter_split(self, frame):
        """Middle panel: the four scatter collections partition the frame
        by (above/below threshold) x (correct/incorrect) with exact
        counts, and the threshold line sits at the given level."""
        import matplotlib.pyplot as plt

        thr = 0.15
        threshold.plot_uncertainty(frame, kind="slide", threshold=thr)
        ax = plt.gcf().axes[1]
        sizes = [len(c.get_offsets()) for c in ax.collections]
        hline = ax.lines[0].get_ydata()[0]
        plt.close("all")

        above = frame[frame["uncertainty"] >= thr]
        below = frame[frame["uncertainty"] < thr]
        expected = [int(above["correct"].sum()),
                    int((~above["correct"]).sum()),
                    int(below["correct"].sum()),
                    int((~below["correct"]).sum())]
        assert sizes == expected
        assert sum(sizes) == len(frame)
        assert hline == thr
