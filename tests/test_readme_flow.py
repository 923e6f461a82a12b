"""Reference-README switchover drive: the 'Custom projects: full
experiment' script from /root/reference/README.md:270-341 executed
against THIS framework through the ``import biscuit`` alias, with no
call-shape changes — the documented user journey of the reference must
run unchanged here (swap `sf.Project` for the biscuit_tpu Project; that
is the one documented substitution, the reference's own Project comes
from slideflow).

Scale deviations (documented, not semantic): tiny Xception/32px instead
of the published 299px config, 2x2 nested folds instead of 3x5, and
``plt.show()`` replaced by a savefig check (headless box). Every call
keeps the README's argument SHAPE (kwargs by the README's names).
"""

import dataclasses
import io

import matplotlib
import numpy as np
import pandas as pd
import pytest

matplotlib.use("Agg")

import biscuit  # noqa: E402  (the alias package under test)
from biscuit import Experiment  # noqa: E402


def _build_source(tmp, n_slides=24, tiles_per=6, seed=2):
    """The threshold-stage-survivable corpus recipe of
    test_experiment.write_tiles: 20% 'hard' slides whose tiles mostly
    carry no class signal, so detect() sees incorrect slides and leaky
    uncertainty (the verify-skill gotcha: a perfect model raises
    ThresholdError)."""
    from PIL import Image

    from biscuit_tpu.data.tfrecord import TFRecordWriter

    rng = np.random.default_rng(seed)
    rows = []
    tfr = tmp / "tfrecords"
    tfr.mkdir()
    for i in range(n_slides):
        label = i % 2
        hard = (i % 5) == 0
        rows.append(
            dict(
                patient=f"TCGA-{i:02d}-P",
                slide=f"sl{i}",
                some_header="class1" if label == 0 else "class2",
                site=f"{i // 2}",
            )
        )
        with TFRecordWriter(str(tfr / f"sl{i}.tfrecords")) as w:
            for t in range(tiles_per):
                img = rng.integers(40, 120, (32, 32, 3)).astype(np.uint8)
                if rng.random() <= (0.2 if hard else 0.95):
                    ch = 0 if label == 0 else 2
                    img[..., ch] = np.clip(img[..., ch] + 100, 0, 255)
                buf = io.BytesIO()
                Image.fromarray(img).save(buf, format="PNG")
                w.write_tile(f"sl{i}", buf.getvalue(), loc_x=t, loc_y=0)
    ann_path = str(tmp / "annotations.csv")
    pd.DataFrame(rows).to_csv(ann_path, index=False)
    return ann_path, str(tfr)


@pytest.fixture(scope="module")
def readme_run(tmp_path_factory):
    """The README script, start to finish."""
    from biscuit_tpu.project import Project

    tmp = tmp_path_factory.mktemp("readme")
    ann_path, tfr_path = _build_source(tmp)

    # --- "Set up a project" (README:279-290) ---
    project = Project(
        str(tmp / "project"),
        annotations=ann_path,
        create=True,
    )
    project.add_source(
        name="TCGA_LUNG",
        tfrecords=tfr_path,
    )

    # --- "Set up the experiment" (README:298-304) ---
    experiment = Experiment(
        train_project=project,
        outcome="some_header",
        outcome1="class1",
        outcome2="class2",
        outdir=str(tmp / "results"),
    )

    # --- "Train cross-validation (CV) UQ models" (README:306-313) ---
    # README: hp = biscuit.hp.nature2022; hp.uq = True. Same object,
    # shrunk for the 1-core test box (replace() so the module singleton
    # stays pristine for other tests).
    hp = dataclasses.replace(
        biscuit.hp.nature2022,
        model="xception_tiny", tile_px=32, tile_um=32, batch_size=16,
        epochs=[1], early_stop=False, hidden_layer_width=32,
        learning_rate=3e-3, normalizer=None, augment="xy", uq_samples=4,
    )
    hp.uq = True
    experiment.train(
        hp=hp,
        label="EXPERIMENT",
        save_predictions="csv",
        val_k_fold=2, val_k=[1, 2], val_strategy="k-fold",
        splits="splits_readme.json", seed=0,
    )

    # --- "Train the nested CV models (for thresholds)" (README:315-316) ---
    experiment.train_nested_cv(hp=hp, label="EXPERIMENT",
                               outer_k=2, inner_k=2,
                               val_strategy="k-fold", seed=0)
    return project, experiment


class TestReadmeFlow:
    def test_cv_models_and_results(self, readme_run):
        """README:318-330 — find_cv + get_model_results + pt_auc print."""
        project, _ = readme_run
        cv_models = biscuit.find_cv(
            project=project,
            label="EXPERIMENT",
            outcome="some_header",
            k=2,
        )
        assert len(cv_models) == 2
        for m in cv_models:
            results = biscuit.get_model_results(
                m,
                outcome="some_header",
                epoch=1)
            assert 0.0 <= results["pt_auc"] <= 1.0

    def test_thresholds_and_calibration_plot(self, readme_run, tmp_path):
        """README:331-341 — thresholds_from_nested_cv + plot_uq_calibration
        with the README's exact `**thresh` passing convention."""
        import matplotlib.pyplot as plt

        _, experiment = readme_run
        df, thresh = experiment.thresholds_from_nested_cv(
            label="EXPERIMENT",
            outer_k=2, inner_k=2,
        )
        assert {"tile_uq", "slide_uq", "slide_pred"} <= set(thresh)
        assert len(df)  # outer-fold validation rows
        experiment.plot_uq_calibration(
            label="EXPERIMENT",
            k=2,  # matches the scaled-down 2-fold CV (README default: 3)
            **thresh,
        )
        out = tmp_path / "calibration.png"
        plt.savefig(out)  # README does plt.show(); headless box saves
        plt.close("all")
        assert out.stat().st_size > 0

    def test_alias_is_tpu_package(self):
        """`import biscuit` IS the TPU framework (version-parity pin)."""
        import biscuit_tpu

        assert biscuit.threshold is biscuit_tpu.threshold
        assert biscuit.__version__ == "1.0.1"
