"""End-to-end tests for the model/trainer/UQ stack on a synthetic project
(tiny Xception, 32px tiles, CPU). Verifies the SURVEY.md §2.4 on-disk
contract end to end: train -> model dirs -> discovery -> predictions ->
thresholds."""

import io
import json
import os
from os.path import join

import numpy as np
import pandas as pd
import pytest

from biscuit_tpu import utils
from biscuit_tpu.hp import ModelParams


def tiny_hp(**kw):
    base = dict(
        model="xception_tiny",
        tile_px=32,
        tile_um=32,
        batch_size=16,
        epochs=[1],
        early_stop=False,
        dropout=0.1,
        uq=False,
        hidden_layer_width=32,
        hidden_layers=2,
        learning_rate=3e-3,
        normalizer=None,
        augment="xy",
        uq_samples=8,
    )
    base.update(kw)
    return ModelParams(**base)


def make_tile(label, rng):
    """Class-separable synthetic tile: class 0 reddish, class 1 bluish."""
    img = rng.integers(40, 120, (32, 32, 3)).astype(np.uint8)
    if label == 0:
        img[..., 0] = np.clip(img[..., 0] + 100, 0, 255)
    else:
        img[..., 2] = np.clip(img[..., 2] + 100, 0, 255)
    return img


@pytest.fixture(scope="module")
def synthetic_project(tmp_path_factory):
    from PIL import Image

    from biscuit_tpu.data.tfrecord import TFRecordWriter
    from biscuit_tpu.project import Project

    tmp = tmp_path_factory.mktemp("proj")
    rng = np.random.default_rng(0)
    n_slides, tiles_per = 12, 16
    # site pairs one LUAD with one LUSC so folds stay class-balanced
    ann = pd.DataFrame(
        [
            dict(
                patient=f"TCGA-{i:02d}-P",
                slide=f"sl{i}",
                cohort="LUAD" if i % 2 == 0 else "LUSC",
                site=f"{i // 2}",
            )
            for i in range(n_slides)
        ]
    )
    ann_path = str(tmp / "ann.csv")
    ann.to_csv(ann_path, index=False)
    tfr_dir = tmp / "tfr"
    tfr_dir.mkdir()
    for i in range(n_slides):
        label = i % 2
        with TFRecordWriter(str(tfr_dir / f"sl{i}.tfrecords")) as w:
            for t in range(tiles_per):
                buf = io.BytesIO()
                Image.fromarray(make_tile(label, rng)).save(buf, format="PNG")
                w.write_tile(f"sl{i}", buf.getvalue(), loc_x=t, loc_y=0)
    P = Project(str(tmp / "root"), annotations=ann_path, name="synth",
                create=True)
    P.add_source("SRC", tfrecords=str(tfr_dir))
    return P


class TestModel:
    def test_forward_shapes(self):
        import jax
        import jax.numpy as jnp

        from biscuit_tpu.models.xception import build_model

        hp = tiny_hp()
        model = build_model(hp)
        x = jnp.zeros((2, 32, 32, 3), jnp.float32)
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            x, train=False,
        )
        logits = model.apply(variables, x, train=False)
        assert logits.shape == (2, 2)
        assert logits.dtype == jnp.float32
        feats = model.apply(variables, x, train=False, method="features")
        assert feats.shape == (2, 128)  # tiny exit width

    def test_jitted_init_matches_eager_and_caches(self):
        """trainer.init_model is jitted + cached per module structure
        (full-matrix profiling: eager flax init cost ~1.4 s/training =
        28% of the grid's wall). The contract: bit-identical params to
        the eager ``model.init`` on the same seed, distinct across
        seeds, and a cache hit for a structurally-equal rebuilt module."""
        import time

        import jax
        import jax.numpy as jnp

        from biscuit_tpu.models.xception import build_model
        from biscuit_tpu.train.trainer import init_model

        hp = tiny_hp()
        model = build_model(hp)
        p1, bs1 = init_model(model, hp, jax.random.PRNGKey(5))
        eager = model.init(
            {"params": jax.random.PRNGKey(5),
             "dropout": jax.random.PRNGKey(5)},
            jnp.zeros((2, 32, 32, 3), jnp.float32), train=False,
        )
        for got, want in zip(jax.tree.leaves(p1),
                             jax.tree.leaves(eager["params"])):
            np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
        # Distinct seed -> distinct weights.
        p2, _ = init_model(build_model(hp), hp, jax.random.PRNGKey(6))
        assert any(
            not np.array_equal(np.asarray(a), np.asarray(b))
            for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)))
        # Rebuilt (structurally equal) module hits the jit cache: replay
        # must be far below a fresh trace+compile (~seconds).
        t0 = time.perf_counter()
        init_model(build_model(hp), hp, jax.random.PRNGKey(7))
        assert time.perf_counter() - t0 < 0.5

    def test_train_changes_bn_stats(self):
        import jax
        import jax.numpy as jnp

        from biscuit_tpu.models.xception import build_model

        hp = tiny_hp()
        model = build_model(hp)
        x = jnp.ones((2, 32, 32, 3), jnp.float32)
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            x, train=False,
        )
        _, updates = model.apply(
            variables, x, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(2)},
        )
        assert "batch_stats" in updates


class TestUQ:
    @pytest.fixture(scope="class")
    def model_and_state(self):
        import jax
        import jax.numpy as jnp

        from biscuit_tpu.models.xception import build_model

        hp = tiny_hp(uq=True)
        model = build_model(hp)
        x = jnp.asarray(
            np.random.default_rng(0).uniform(0, 255, (4, 32, 32, 3)),
            jnp.float32,
        )
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            x, train=False,
        )
        return model, variables["params"], variables["batch_stats"], x

    def test_fast_equals_full_distribution(self, model_and_state):
        import jax

        from biscuit_tpu.train.uq import mc_dropout_full, mc_dropout_predict

        model, params, bs, x = model_and_state
        key = jax.random.PRNGKey(3)
        m_fast, s_fast = mc_dropout_predict(model, params, bs, x, key, k=64,
                                            use_pallas=False)
        m_full, s_full = mc_dropout_full(model, params, bs, x, key, k=64)
        # Same stochastic graph, same key ordering -> identical results.
        np.testing.assert_allclose(m_fast, m_full, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(s_fast, s_full, rtol=1e-4, atol=1e-5)

    def test_uncertainty_positive_and_probs_normalized(self, model_and_state):
        import jax

        from biscuit_tpu.train.uq import mc_dropout_predict

        model, params, bs, x = model_and_state
        mean, std = mc_dropout_predict(
            model, params, bs, x, jax.random.PRNGKey(0), k=16,
            use_pallas=False,
        )
        np.testing.assert_allclose(np.asarray(mean).sum(-1), 1.0, rtol=1e-5)
        assert (np.asarray(std) >= 0).all()
        assert np.asarray(std).max() > 0  # dropout produces spread

    def test_deterministic_given_key(self, model_and_state):
        import jax

        from biscuit_tpu.train.uq import mc_dropout_predict

        model, params, bs, x = model_and_state
        a = mc_dropout_predict(model, params, bs, x, jax.random.PRNGKey(5),
                               k=8, use_pallas=False)
        b = mc_dropout_predict(model, params, bs, x, jax.random.PRNGKey(5),
                               k=8, use_pallas=False)
        np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))


class TestPallasHead:
    """Interpret-mode checks of the fused MC-dropout head kernel (the real
    TPU run is covered by the 'tpu'-marked test below and bench.py)."""

    def _params(self, f=128, h=128, c=2, seed=0):
        import jax

        from biscuit_tpu.models.xception import Head

        head = Head(num_classes=c, hidden_layers=2, hidden_width=h)
        feats = jax.random.normal(jax.random.PRNGKey(seed), (16, f))
        params = head.init(
            {"params": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)},
            feats,
        )["params"]
        return params, feats, head

    def test_zero_dropout_matches_dense(self):
        import jax
        import jax.numpy as jnp

        from biscuit_tpu.ops.mcd_head import mcd_head_pallas

        params, feats, head = self._params()
        mean, std = mcd_head_pallas(
            params, feats, jax.random.PRNGKey(0), k=4, dropout=0.0,
            interpret=True,
        )
        ref_logits = head.apply({"params": params}, feats)
        ref = jax.nn.softmax(ref_logits, axis=-1)
        # bf16 matmuls in the kernel vs f32 reference
        np.testing.assert_allclose(mean, np.asarray(ref), atol=2e-2)
        np.testing.assert_allclose(std, 0.0, atol=1e-6)

    def test_unaligned_batch_padding(self):
        import jax

        from biscuit_tpu.ops.mcd_head import mcd_head_pallas

        params, feats, _ = self._params()
        mean, std = mcd_head_pallas(
            params, feats[:13], jax.random.PRNGKey(0), k=2, dropout=0.0,
            interpret=True,
        )
        assert mean.shape == (13, 2)
        np.testing.assert_allclose(np.asarray(mean).sum(-1), 1.0, rtol=1e-5)


@pytest.mark.tpu
class TestPallasHeadTPU:
    def test_kernel_on_chip(self):
        import jax

        from biscuit_tpu.models.xception import Head
        from biscuit_tpu.ops.mcd_head import mcd_head_pallas

        head = Head(num_classes=2, hidden_layers=2, hidden_width=1024)
        feats = jax.random.normal(jax.random.PRNGKey(0), (256, 2048))
        params = head.init(
            {"params": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)},
            feats,
        )["params"]
        mean, std = mcd_head_pallas(params, feats, jax.random.PRNGKey(3),
                                    k=30, dropout=0.1)
        assert mean.shape == (256, 2)
        np.testing.assert_allclose(np.asarray(mean).sum(-1), 1.0, rtol=1e-3)

    def test_kernel_statistics_match_lax(self):
        import jax

        from biscuit_tpu.models.xception import Head
        from biscuit_tpu.ops.mcd_head import mcd_head_pallas

        head = Head(num_classes=2, hidden_layers=2, hidden_width=128,
                    dropout=0.3)
        feats = jax.random.normal(jax.random.PRNGKey(0), (32, 128))
        params = head.init(
            {"params": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)},
            feats,
        )["params"]
        k = 512
        mean_p, std_p = mcd_head_pallas(params, feats, jax.random.PRNGKey(3),
                                        k=k, dropout=0.3)

        def one(rng):
            logits = head.apply(
                {"params": params}, feats, mc_dropout=True,
                rngs={"dropout": rng},
            )
            return jax.nn.softmax(logits, -1)

        probs = jax.vmap(one)(jax.random.split(jax.random.PRNGKey(9), k))
        # Different RNG streams -> statistical agreement only.
        np.testing.assert_allclose(
            np.asarray(mean_p), np.asarray(probs.mean(0)), atol=0.06
        )
        np.testing.assert_allclose(
            np.asarray(std_p), np.asarray(probs.std(0)), atol=0.06
        )


class TestTrainerEndToEnd:
    @pytest.fixture(scope="class")
    def trained(self, synthetic_project):
        hp = tiny_hp(uq=True)
        dirs = synthetic_project.train(
            "cohort", exp_label="EXP_T_UQ", params=hp,
            val_k_fold=3, val_strategy="k-fold",
        )
        return synthetic_project, dirs

    def test_model_dirs_and_discovery(self, trained):
        P, dirs = trained
        assert len(dirs) == 3
        found = utils.find_cv(P, "EXP_T_UQ", outcome="cohort", k=3)
        assert sorted(found) == sorted(dirs)
        assert utils.model_exists(P, "EXP_T_UQ", outcome="cohort", kfold=2)

    def test_results_log_contract(self, trained):
        P, dirs = trained
        res = utils.get_model_results(dirs[0], epoch=1, outcome="cohort")
        for k in ("pt_auc", "slide_auc", "tile_auc", "opt_thresh"):
            assert res[k] is not None
        assert 0 <= res["tile_auc"] <= 1

    def test_tile_predictions_contract(self, trained):
        P, dirs = trained
        df = pd.read_csv(join(dirs[0], "tile_predictions_val_epoch1.csv"))
        for col in ("slide", "cohort_y_true0", "cohort_y_pred1",
                    "cohort_uncertainty1"):
            assert col in df.columns
        utils.rename_cols(df, "cohort")
        assert {"y_true", "y_pred", "uncertainty"} <= set(df.columns)
        assert not df["y_pred"].isna().any()
        assert ((df["y_pred"] >= 0) & (df["y_pred"] <= 1)).all()
        assert (df["uncertainty"] >= 0).all()

    def test_df_from_cv_and_detect(self, trained):
        from biscuit_tpu import threshold

        P, dirs = trained
        dfs = utils.df_from_cv(P, "EXP_T_UQ", outcome="cohort", k=3)
        assert len(dfs) == 3
        # A fold where the tiny model is perfect has zero incorrect tiles,
        # and the reference's detect() then dies in the Youden list.index
        # NaN idiom (threshold.py:424-425; parity pinned in
        # test_reference_parity.py). Guarantee the plumbing is exercised by
        # flipping a few predictions so 'incorrect' is non-empty.
        df = dfs[0].copy()
        flip = df.index[:3]
        df.loc[flip, "y_pred"] = 1.0 - df.loc[flip, "y_pred"]
        df.loc[flip, "uncertainty"] = df["uncertainty"].max() + 0.1
        th, auc = threshold.detect(df)
        assert th["tile_pred"] is not None

    def test_learns_separable_classes(self, trained):
        P, dirs = trained
        aucs = [
            utils.get_model_results(d, epoch=1, outcome="cohort")["tile_auc"]
            for d in dirs
        ]
        # Color-separable classes: even a tiny model should learn this.
        assert np.mean(aucs) > 0.85

    def test_slide_manifest(self, trained):
        P, dirs = trained
        m = pd.read_csv(join(dirs[0], "slide_manifest.csv"))
        assert set(m["dataset"]) == {"training", "validation"}
        slides = utils.get_slides_from_model_manifest(dirs[0],
                                                      dataset="training")
        assert len(slides) == 8  # 12 slides, 3-fold -> 8 train


class TestSaveEvalInterface:
    @pytest.fixture(scope="class")
    def full_model(self, synthetic_project):
        hp = tiny_hp(uq=True)
        dirs = synthetic_project.train(
            "cohort", exp_label="EXP_T_FULL", params=hp,
            val_strategy="none", save_model=True,
        )
        model_path = utils.find_model(
            synthetic_project, "EXP_T_FULL", outcome="cohort", epoch=1
        )
        return synthetic_project, model_path

    def test_checkpoint_saved(self, full_model):
        P, model_path = full_model
        assert os.path.exists(join(model_path, "model.msgpack"))
        assert json.load(open(join(model_path, "params.json")))["outcome"] == "cohort"

    def test_uncertainty_interface(self, full_model):
        import jax

        from biscuit_tpu.train.uq import UncertaintyInterface

        P, model_path = full_model
        iface = UncertaintyInterface(model_path, k=4)
        tiles = np.stack(
            [make_tile(i % 2, np.random.default_rng(i)) for i in range(4)]
        )
        probs, unc = iface(tiles, key=jax.random.PRNGKey(0))
        assert probs.shape == (4, 2)
        assert unc.shape == (4, 2)
        np.testing.assert_allclose(np.asarray(probs).sum(-1), 1.0, rtol=1e-4)

    def test_uncertainty_interface_int8_trunk(self, full_model):
        """Science guard for the opt-in w8a8 trunk (ops/int8_trunk.py) on a
        TRAINED model: calibration-phase batches answer through the exact
        f32 path; once >=calib_tiles tiles are seen the quantized trunk
        takes over and must agree with f32 in class calls and closely in
        probability on class-signal tiles."""
        import jax

        from biscuit_tpu.train.uq import UncertaintyInterface

        P, model_path = full_model
        calib = np.stack(
            [make_tile(i % 2, np.random.default_rng(200 + i))
             for i in range(8)]
        )
        tiles = np.stack(
            [make_tile(i % 2, np.random.default_rng(100 + i))
             for i in range(8)]
        )
        key = jax.random.PRNGKey(0)
        iface = UncertaintyInterface(model_path, k=8)
        iface8 = UncertaintyInterface(model_path, k=8, int8_trunk=True,
                                      calib_tiles=8)
        # Batch 1 lands in the calibration window: exact f32 answers.
        p_cal, _ = iface(calib, key=key)
        p_cal8, _ = iface8(calib, key=key)
        np.testing.assert_array_equal(np.asarray(p_cal), np.asarray(p_cal8))
        assert iface8._qw is not None  # frozen after >=8 tiles
        # Batch 2 runs quantized.
        probs, unc = iface(tiles, key=key)
        probs8, unc8 = iface8(tiles, key=key)
        probs, probs8 = np.asarray(probs), np.asarray(probs8)
        # actually quantized: some perturbation vs the f32 path
        assert (np.abs(probs8 - probs).max() > 0
                or np.abs(np.asarray(unc8) - np.asarray(unc)).max() > 0)
        assert np.all(np.isfinite(probs8))
        np.testing.assert_allclose(probs8.sum(-1), 1.0, rtol=1e-4)
        # Same argmax everywhere the f32 model is confident; close probs.
        confident = np.abs(probs[:, 1] - 0.5) > 0.1
        assert (probs8.argmax(-1)[confident]
                == probs.argmax(-1)[confident]).all()
        assert np.abs(probs8 - probs).max() < 0.08, np.abs(
            probs8 - probs).max()

    def test_int8_calibration_persistence(self, full_model, tmp_path):
        """calibration_path: a second process loads the frozen scales and
        serves quantized from its very first batch, bitwise-matching the
        calibrating process's post-freeze outputs."""
        import jax

        from biscuit_tpu.train.uq import UncertaintyInterface

        P, model_path = full_model
        cal_json = str(tmp_path / "int8_calibration.json")
        calib = np.stack(
            [make_tile(i % 2, np.random.default_rng(300 + i))
             for i in range(8)]
        )
        tiles = np.stack(
            [make_tile(i % 2, np.random.default_rng(400 + i))
             for i in range(8)]
        )
        key = jax.random.PRNGKey(3)
        a = UncertaintyInterface(model_path, k=8, int8_trunk=True,
                                 calib_tiles=8, calibration_path=cal_json)
        a(calib, key=key)  # freezes + saves
        assert os.path.exists(cal_json)
        pa, ua = a(tiles, key=key)
        b = UncertaintyInterface(model_path, k=8, int8_trunk=True,
                                 calib_tiles=8, calibration_path=cal_json)
        assert b._qw is not None  # ready before any batch
        pb, ub = b(tiles, key=key)
        np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))
        np.testing.assert_array_equal(np.asarray(ua), np.asarray(ub))

    def test_int8_calibration_guards(self, full_model, tmp_path):
        """Stale/foreign calibration files are ignored (recalibrate), and
        an unwritable calibration_path must not abort serving."""
        import jax
        import json as _json

        from biscuit_tpu.train.uq import UncertaintyInterface

        P, model_path = full_model
        cal_json = str(tmp_path / "cal.json")
        tiles = np.stack(
            [make_tile(i % 2, np.random.default_rng(500 + i))
             for i in range(8)]
        )
        a = UncertaintyInterface(model_path, k=8, int8_trunk=True,
                                 calib_tiles=8, calibration_path=cal_json)
        a(tiles, key=jax.random.PRNGKey(0))
        blob = _json.load(open(cal_json))
        assert blob["weights_blake2b"] and "scales" in blob
        # Tamper: different weights fingerprint -> loader must reject.
        blob["weights_blake2b"] = "0" * 32
        _json.dump(blob, open(cal_json, "w"))
        b = UncertaintyInterface(model_path, k=8, int8_trunk=True,
                                 calib_tiles=8, calibration_path=cal_json)
        assert b._qw is None  # recalibrates instead of loading stale scales
        # Unwritable path: freeze succeeds in memory, serving continues.
        c = UncertaintyInterface(
            model_path, k=8, int8_trunk=True, calib_tiles=8,
            calibration_path=str(tmp_path / "no_such_dir" / "cal.json"))
        c(tiles, key=jax.random.PRNGKey(0))  # freezes; save fails silently
        assert c._qw is not None
        probs, _ = c(tiles, key=jax.random.PRNGKey(1))
        assert np.all(np.isfinite(np.asarray(probs)))

    def test_int8_calibration_corrupt_files(self, full_model, tmp_path):
        """Corrupt/truncated/incomplete calibration files must fall back to
        recalibration, never crash the constructor; a failed atomic save
        must not leak its .tmp file."""
        import jax
        import json as _json

        from biscuit_tpu.train.uq import UncertaintyInterface

        P, model_path = full_model
        tiles = np.stack(
            [make_tile(i % 2, np.random.default_rng(600 + i))
             for i in range(8)]
        )
        # Produce a valid blob once so we can corrupt variations of it.
        good = str(tmp_path / "good.json")
        a = UncertaintyInterface(model_path, k=8, int8_trunk=True,
                                 calib_tiles=8, calibration_path=good)
        a(tiles, key=jax.random.PRNGKey(0))
        blob = _json.load(open(good))

        # 1. Truncated JSON (partial copy / disk-full artifact).
        trunc = tmp_path / "trunc.json"
        trunc.write_text(open(good).read()[:40])
        b = UncertaintyInterface(model_path, k=8, int8_trunk=True,
                                 calib_tiles=8,
                                 calibration_path=str(trunc))
        assert b._qw is None  # recalibrates

        # 2. Valid JSON, scales is not a dict.
        bad_scales = tmp_path / "bad_scales.json"
        bad_scales.write_text(_json.dumps({**blob, "scales": [1, 2, 3]}))
        c = UncertaintyInterface(model_path, k=8, int8_trunk=True,
                                 calib_tiles=8,
                                 calibration_path=str(bad_scales))
        assert c._qw is None

        # 3. Passes digest/format guards but a conv site is missing ->
        #    prepare_int8_trunk KeyError is caught, recalibrates.
        incomplete = dict(blob)
        incomplete["scales"] = {
            k: v for k, v in blob["scales"].items() if k != "conv1"}
        inc = tmp_path / "incomplete.json"
        inc.write_text(_json.dumps(incomplete))
        d = UncertaintyInterface(model_path, k=8, int8_trunk=True,
                                 calib_tiles=8, calibration_path=str(inc))
        assert d._qw is None

        # 4. Non-numeric scale value -> TypeError caught, recalibrates.
        garbled = dict(blob)
        garbled["scales"] = dict(blob["scales"], conv1="oops")
        gar = tmp_path / "garbled.json"
        gar.write_text(_json.dumps(garbled))
        e = UncertaintyInterface(model_path, k=8, int8_trunk=True,
                                 calib_tiles=8, calibration_path=str(gar))
        assert e._qw is None

        # 5. save_calibration failure cleans up its temp file: point the
        #    path at an existing directory so os.replace raises after the
        #    tmp was written.
        asdir = tmp_path / "iam_a_dir"
        asdir.mkdir()
        f = UncertaintyInterface(model_path, k=8, int8_trunk=True,
                                 calib_tiles=8, calibration_path=str(asdir))
        f(tiles, key=jax.random.PRNGKey(0))  # freeze; save fails non-fatally
        assert f._qw is not None
        leftovers = [p for p in tmp_path.iterdir()
                     if p.name.startswith("iam_a_dir.tmp.")]
        assert leftovers == []

    def test_evaluate_project(self, full_model):
        P, model_path = full_model
        results = P.evaluate(model_path, "cohort")
        assert utils.eval_exists(P, "EXP_T_FULL", outcome="cohort", epoch=1)
        eval_dir = utils.find_eval(P, "EXP_T_FULL", outcome="cohort", epoch=1)
        res = utils.get_eval_results(eval_dir, outcome="cohort")
        assert res["tile_auc"] is not None
        tile_df = pd.read_csv(join(eval_dir, "tile_predictions_eval.csv"))
        assert "cohort_uncertainty1" in tile_df.columns
        yt, yp = utils.read_group_predictions(
            join(eval_dir, "patient_predictions_cohort_eval.csv")
        )
        assert len(yt) == 12


class TestCheckpointResume:
    def test_in_run_checkpoint_and_resume(self, synthetic_project, tmp_path):
        """Orbax in-run checkpointing (SURVEY.md 5.4): a re-launched run
        restores the latest checkpoint and fast-forwards."""
        import shutil

        from biscuit_tpu import utils
        from biscuit_tpu.train.checkpoint import RunCheckpointer

        hp = tiny_hp()
        dirs = synthetic_project.train(
            "cohort", exp_label="EXP_CKPT", params=hp,
            val_strategy="none", checkpoint_every=4,
        )
        model_dir = dirs[0]
        assert os.path.exists(join(model_dir, "ckpt"))
        import jax

        from biscuit_tpu.models.xception import build_model
        from biscuit_tpu.train.trainer import init_model, make_optimizer

        model = build_model(hp)
        tx = make_optimizer(hp)
        params, bs = init_model(model, hp, jax.random.PRNGKey(0))
        opt = tx.init(params)
        ck = RunCheckpointer(model_dir, every=4)
        p2, bs2, opt2, step = ck.maybe_restore(params, bs, opt)
        ck.close()
        assert step >= 4  # restored a saved step
        # restored params differ from fresh init (training happened)
        leaf = jax.tree_util.tree_leaves(p2)[0]
        fresh = jax.tree_util.tree_leaves(params)[0]
        assert not np.array_equal(np.asarray(leaf), np.asarray(fresh))


class TestParquetPredictions:
    def test_parquet_save_and_read(self, synthetic_project):
        from biscuit_tpu import utils

        hp = tiny_hp(uq=True)
        dirs = synthetic_project.train(
            "cohort", exp_label="EXP_PQ", params=hp,
            val_k=[1], val_strategy="k-fold", save_predictions="parquet",
        )
        assert os.path.exists(
            join(dirs[0], "tile_predictions_val_epoch1.parquet.gzip")
        )
        assert not os.path.exists(
            join(dirs[0], "tile_predictions_val_epoch1.csv")
        )
        # df_from_cv's parquet fallback reads it (k=1 fold)
        dfs = utils.df_from_cv(synthetic_project, "EXP_PQ",
                               outcome="cohort", k=1)
        assert {"y_true", "y_pred", "uncertainty"} <= set(dfs[0].columns)
        # results_log opt_thresh resolves via the parquet patient file
        res = utils.get_model_results(dirs[0], epoch=1, outcome="cohort")
        assert res["opt_thresh"] is not None


class TestResNetFamily:
    @pytest.mark.parametrize("arch,fdim", [("resnet_tiny", 64),
                                           ("resnet18", 512)])
    def test_forward_and_features(self, arch, fdim):
        import jax
        import jax.numpy as jnp

        from biscuit_tpu.models.xception import build_model, feature_dim

        hp = tiny_hp(model=arch)
        model = build_model(hp)
        assert feature_dim(hp) == fdim
        x = jnp.zeros((2, 32, 32, 3), jnp.float32)
        variables = model.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)},
            x, train=False,
        )
        logits = model.apply(variables, x, train=False)
        assert logits.shape == (2, 2)
        feats = model.apply(variables, x, train=False, method="features")
        assert feats.shape == (2, fdim)

    def test_uq_fast_path_works_on_resnet(self):
        import jax
        import jax.numpy as jnp

        from biscuit_tpu.models.xception import build_model
        from biscuit_tpu.train.uq import mc_dropout_full, mc_dropout_predict

        hp = tiny_hp(model="resnet_tiny", uq=True)
        model = build_model(hp)
        x = jnp.asarray(
            np.random.default_rng(0).uniform(0, 255, (2, 32, 32, 3)),
            jnp.float32,
        )
        variables = model.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)},
            x, train=False,
        )
        params, bs = variables["params"], variables["batch_stats"]
        key = jax.random.PRNGKey(2)
        fast = mc_dropout_predict(model, params, bs, x, key, k=16,
                                  use_pallas=False)
        full = mc_dropout_full(model, params, bs, x, key, k=16)
        np.testing.assert_allclose(fast[0], full[0], rtol=1e-5, atol=1e-5)

    def test_trains_end_to_end(self, synthetic_project):
        dirs = synthetic_project.train(
            "cohort", exp_label="EXP_RN", params=tiny_hp(model="resnet_tiny"),
            val_k=[1], val_strategy="k-fold",
        )
        res = utils.get_model_results(dirs[0], epoch=1, outcome="cohort")
        assert 0 <= res["tile_auc"] <= 1

    def test_unknown_arch_raises(self):
        from biscuit_tpu.models.xception import XceptionClassifier
        import jax
        import jax.numpy as jnp

        model = XceptionClassifier(arch="nope")
        with pytest.raises(ValueError):
            model.init({"params": jax.random.PRNGKey(0),
                        "dropout": jax.random.PRNGKey(1)},
                       jnp.zeros((1, 32, 32, 3)), train=False)


class TestEarlyStop:
    def test_early_stop_halts_and_records(self, synthetic_project):
        """slideflow EMA semantics: after ema_observations validation checks
        the EMA initializes; training stops on the first EMA decline past the
        early_stop_patience epoch floor, recording early_stop_batch (reused
        as the FULL model's step budget via utils.find_cv_early_stop)."""
        hp = tiny_hp(
            epochs=[8],  # long budget the stop should cut short
            early_stop=True, early_stop_patience=0,
            ema_observations=3,  # tiny run: initialize the EMA quickly
        )
        dirs = synthetic_project.train(
            "cohort", exp_label="EXP_ES", params=hp,
            val_k=[1], val_strategy="k-fold",
            validate_on_batch=2, validation_steps=1,
        )
        log_df = pd.read_csv(join(dirs[0], "results_log.csv"))
        row = log_df.iloc[0]
        assert "early_stop_batch" in log_df.columns
        total_budget = 8 * 8  # epochs * steps_per_epoch (128 tiles / 16)
        assert row["early_stop_batch"] < total_budget
        # training halted: train_log's last step is the early-stop step
        tl = pd.read_csv(join(dirs[0], "train_log.csv"))
        assert tl["step"].max() <= row["early_stop_batch"] + 10
        # predictions were still written under the declared epoch name
        assert os.path.exists(join(dirs[0],
                                   "tile_predictions_val_epoch8.csv"))
        # Round-trip (step-5 contract, experiment.py:358-370): the recorded
        # batch feeds find_cv_early_stop, which becomes the FULL model's
        # steps_per_epoch_override.
        from biscuit_tpu import utils as bt_utils
        stop = bt_utils.find_cv_early_stop(
            synthetic_project, "EXP_ES", outcome="cohort", k=1
        )
        assert stop == round(row["early_stop_batch"])

    def test_patience_floor_blocks_early_stop(self, synthetic_project):
        """early_stop_patience is an EPOCH floor: with patience beyond the
        training budget, early stop can never trigger."""
        hp = tiny_hp(
            epochs=[2], early_stop=True, early_stop_patience=99,
            ema_observations=2,
        )
        dirs = synthetic_project.train(
            "cohort", exp_label="EXP_ES_PAT", params=hp,
            val_k=[1], val_strategy="k-fold",
            validate_on_batch=2, validation_steps=1,
        )
        log_df = pd.read_csv(join(dirs[0], "results_log.csv"))
        assert ("early_stop_batch" not in log_df.columns
                or pd.isna(log_df.iloc[0].get("early_stop_batch")))


class TestGroupPredictionsFrame:
    def test_mixed_label_group_uses_uint8_mean(self):
        """Group labels are uint8(mean(y_true)) exactly like
        threshold.process_group_predictions (threshold.py:197-200) — NOT
        max(). With 2-of-3 positive tiles the mean is 0.67 -> uint8 0."""
        import numpy as np
        from biscuit_tpu.train.trainer import group_predictions_frame

        tile_df = pd.DataFrame({
            "slide": ["s1", "s1", "s1", "s2", "s2"],
            "y_true": [1, 1, 0, 0, 0],
            "loc_x": [0] * 5, "loc_y": [0] * 5,
        })
        probs = np.array([[0.2, 0.8]] * 5)
        g = group_predictions_frame(tile_df, probs, {}, "slide")
        assert list(g["slide"]) == ["s1", "s2"]
        # uint8(mean([1,1,0])) = uint8(0.667) = 0 — matches the reference's
        # truncating cast, not a majority vote or max.
        assert list(g["y_true1"]) == [0, 0]
        assert g["y_true1"].dtype == np.uint8

    def test_pure_group_labels_roundtrip(self):
        import numpy as np
        from biscuit_tpu.train.trainer import group_predictions_frame

        tile_df = pd.DataFrame({
            "slide": ["a", "a", "b", "b"],
            "y_true": [1, 1, 0, 0],
            "loc_x": [0] * 4, "loc_y": [0] * 4,
        })
        probs = np.array([[0.3, 0.7]] * 4)
        g = group_predictions_frame(tile_df, probs, {"a": "p1", "b": "p2"},
                                    "patient")
        assert list(g["y_true1"]) == [1, 0]
        assert list(g["percent_tiles_positive1"]) == [1.0, 1.0]
