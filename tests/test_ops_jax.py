"""Jittable ROC/threshold ops vs the host (sklearn-parity) implementations,
plus GAN path and submesh scheduler tests."""

import numpy as np
import pytest


class TestAucJax:
    @pytest.mark.parametrize("seed", range(4))
    def test_matches_host_auc(self, seed):
        import jax.numpy as jnp

        from biscuit_tpu.ops.roc_jax import auc_jax
        from biscuit_tpu.stats.roc import auc_score

        rng = np.random.default_rng(seed)
        y = rng.integers(0, 2, 400)
        p = np.round(rng.random(400), 2)  # heavy ties
        got = float(auc_jax(jnp.asarray(y), jnp.asarray(p)))
        want = auc_score(y, p)
        assert got == pytest.approx(want, abs=1e-6)

    def test_mask_excludes_padding(self):
        import jax.numpy as jnp

        from biscuit_tpu.ops.roc_jax import auc_jax
        from biscuit_tpu.stats.roc import auc_score

        rng = np.random.default_rng(9)
        y = rng.integers(0, 2, 100)
        p = rng.random(100)
        y_pad = np.r_[y, np.ones(28, int)]
        p_pad = np.r_[p, rng.random(28)]
        mask = np.r_[np.ones(100), np.zeros(28)]
        got = float(auc_jax(jnp.asarray(y_pad), jnp.asarray(p_pad),
                            jnp.asarray(mask)))
        assert got == pytest.approx(auc_score(y, p), abs=1e-6)

    def test_single_class_nan(self):
        import jax.numpy as jnp

        from biscuit_tpu.ops.roc_jax import auc_jax

        assert np.isnan(float(auc_jax(jnp.ones(10), jnp.linspace(0, 1, 10))))


class TestYoudenJax:
    @pytest.mark.parametrize("seed", range(4))
    def test_matches_host_threshold(self, seed):
        import jax.numpy as jnp

        from biscuit_tpu.ops.roc_jax import youden_threshold_jax
        from biscuit_tpu.stats.roc import roc_curve, youden_threshold

        rng = np.random.default_rng(10 + seed)
        y = rng.integers(0, 2, 300)
        p = np.round(rng.random(300), 2)
        fpr, tpr, thr = roc_curve(y, p)
        want = youden_threshold(fpr, tpr, thr)
        got, j = youden_threshold_jax(jnp.asarray(y), jnp.asarray(p))
        assert float(got) == pytest.approx(want)

    def test_uncertainty_threshold(self):
        import jax.numpy as jnp

        from biscuit_tpu.ops.roc_jax import uncertainty_threshold_jax

        rng = np.random.default_rng(1)
        incorrect = rng.integers(0, 2, 200)
        unc = 0.1 * rng.random(200) + 0.3 * incorrect
        thresh, j = uncertainty_threshold_jax(
            jnp.asarray(incorrect), jnp.asarray(unc)
        )
        # uncertainty separates correct/incorrect around 0.3
        assert 0.05 < float(thresh) < 0.45
        assert float(j) > 0.8


class TestSegmentOps:
    def test_group_reduce_matches_pandas(self):
        import jax.numpy as jnp
        import pandas as pd

        from biscuit_tpu.ops.roc_jax import group_reduce

        rng = np.random.default_rng(2)
        n, groups = 500, 17
        seg = rng.integers(0, groups, n)
        yp = rng.random(n)
        yt = (seg % 2).astype(np.float32)[np.arange(n) * 0 + np.arange(n) % 1]
        yt = (seg % 2).astype(np.float32)
        u = rng.random(n)
        out = group_reduce(
            jnp.asarray(yt), jnp.asarray(yp), jnp.asarray(u),
            jnp.asarray(seg), groups,
        )
        df = pd.DataFrame({"seg": seg, "yp": yp, "yt": yt, "u": u})
        g = df.groupby("seg").mean()
        np.testing.assert_allclose(
            np.asarray(out["y_pred"])[g.index], g["yp"], rtol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(out["uncertainty"])[g.index], g["u"], rtol=1e-5
        )
        # uint8-style floor cast parity
        np.testing.assert_array_equal(
            np.asarray(out["y_true"])[g.index],
            g["yt"].to_numpy().astype(np.uint8),
        )

    def test_apply_thresholds_matches_host(self):
        import jax.numpy as jnp

        from biscuit_tpu import threshold
        from biscuit_tpu.ops.roc_jax import apply_thresholds_jax

        # Synthetic tile predictions over 30 slides.
        rng = np.random.default_rng(3)
        rows = []
        for s in range(30):
            y = s % 2
            hard = rng.random() < 0.3
            for _ in range(20):
                ok = rng.random() < (0.4 if hard else 0.9)
                ypred = rng.uniform(0.55, 1) if ok == bool(y) else rng.uniform(0, 0.45)
                wrong = (ypred >= 0.5) != bool(y)
                u = rng.uniform(0.2, 0.5) if (wrong and rng.random() < 0.7) \
                    else rng.uniform(0, 0.15)
                rows.append((f"s{s}", y, ypred, u))
        import pandas as pd

        df = pd.DataFrame(rows, columns=["slide", "y_true", "y_pred",
                                         "uncertainty"])
        params = dict(tile_uq=0.2, slide_uq=0.18, tile_pred=0.5,
                      slide_pred=0.5)
        host, _ = threshold.apply(df.copy(), **params)

        slides = {s: i for i, s in enumerate(pd.unique(df["slide"]))}
        seg = df["slide"].map(slides).to_numpy()
        dev = apply_thresholds_jax(
            jnp.asarray(df["y_true"].to_numpy()),
            jnp.asarray(df["y_pred"].to_numpy()),
            jnp.asarray(df["uncertainty"].to_numpy()),
            jnp.asarray(seg), len(slides), **params,
        )
        assert float(dev["auc"]) == pytest.approx(host["auc"], abs=1e-6)
        assert float(dev["percent_incl"]) == pytest.approx(
            host["percent_incl"], abs=1e-6)
        assert float(dev["acc"]) == pytest.approx(host["acc"], abs=1e-6)
        assert float(dev["sensitivity"]) == pytest.approx(
            host["sensitivity"], abs=1e-6)
        assert float(dev["specificity"]) == pytest.approx(
            host["specificity"], abs=1e-6)


class TestGan:
    def test_resize_batch(self):
        from biscuit_tpu.gan import resize_batch

        imgs = np.random.default_rng(0).integers(
            0, 255, (2, 64, 64, 3), dtype=np.uint8
        )
        out = np.asarray(resize_batch(imgs, 32))
        assert out.shape == (2, 32, 32, 3)
        # mean preserved approximately by bilinear resize
        assert abs(out.mean() - imgs.mean()) < 2.0

    def test_add_gan_annotations(self, tmp_path):
        import pandas as pd

        from biscuit_tpu.gan import add_gan_annotations

        ann = pd.DataFrame(
            dict(patient=["P0"], slide=["s0"], cohort=["LUAD"],
                 order=["0"])
        )
        path = str(tmp_path / "ann.csv")
        ann.to_csv(path, index=False)
        add_gan_annotations(path, {"gan_a": "LUAD", "gan_b": "LUSC"})
        out = pd.read_csv(path, dtype=str)
        assert len(out) == 3
        gan_rows = out[out["site"] == "GAN"]
        assert len(gan_rows) == 2
        assert (gan_rows["gan"] == "1").all()
        # idempotent
        add_gan_annotations(path, {"gan_a": "LUAD"})
        assert len(pd.read_csv(path)) == 3


class TestSubmeshScheduler:
    def test_partition_and_run(self):
        import jax

        from biscuit_tpu.parallel.scheduler import SubmeshScheduler

        sched = SubmeshScheduler(n_submeshes=4)
        assert len(sched.meshes) == 4
        assert sum(m.devices.size for m in sched.meshes) == 8

        def task(mesh):
            import jax.numpy as jnp

            x = jax.device_put(
                jnp.arange(mesh.devices.size * 4.0),
                jax.sharding.NamedSharding(
                    mesh, jax.sharding.PartitionSpec("data")
                ),
            )
            return float(jnp.sum(x * 2))

        results = sched.run([task] * 6)
        assert all(isinstance(r, float) for r in results)

    def test_exception_collected(self):
        from biscuit_tpu.parallel.scheduler import SubmeshScheduler

        sched = SubmeshScheduler(n_submeshes=2)

        def bad(mesh):
            raise RuntimeError("boom")

        results = sched.run([bad, lambda m: 42])
        assert isinstance(results[0], RuntimeError)
        assert results[1] == 42


class TestDelongJax:
    @pytest.mark.parametrize("seed", range(3))
    def test_variance_matches_host(self, seed):
        import jax.numpy as jnp

        from biscuit_tpu.delong import delong_roc_variance
        from biscuit_tpu.ops.roc_jax import delong_variance_jax

        rng = np.random.default_rng(seed)
        y = rng.integers(0, 2, 300)
        if y.sum() in (0, 300):
            y[0] = 1 - y[0]
        p = np.round(rng.random(300) + 0.4 * y, 2)  # ties + signal
        h_auc, h_var = delong_roc_variance(y, p)
        d_auc, d_var = delong_variance_jax(jnp.asarray(y), jnp.asarray(p))
        assert float(d_auc) == pytest.approx(h_auc, abs=1e-5)
        assert float(d_var) == pytest.approx(float(np.squeeze(h_var)),
                                             rel=1e-4, abs=1e-8)

    def test_variance_with_mask(self):
        import jax.numpy as jnp

        from biscuit_tpu.delong import delong_roc_variance
        from biscuit_tpu.ops.roc_jax import delong_variance_jax

        rng = np.random.default_rng(5)
        y = rng.integers(0, 2, 200)
        p = rng.random(200) + 0.3 * y
        y_pad = np.r_[y, np.ones(56, int)]
        p_pad = np.r_[p, rng.random(56)]
        mask = np.r_[np.ones(200), np.zeros(56)]
        h_auc, h_var = delong_roc_variance(y, p)
        d_auc, d_var = delong_variance_jax(
            jnp.asarray(y_pad), jnp.asarray(p_pad), jnp.asarray(mask)
        )
        assert float(d_auc) == pytest.approx(h_auc, abs=1e-5)
        assert float(d_var) == pytest.approx(float(np.squeeze(h_var)),
                                             rel=1e-4, abs=1e-8)

    @pytest.mark.parametrize("seed", range(2))
    def test_paired_test_matches_host(self, seed):
        import jax.numpy as jnp

        from biscuit_tpu.delong import delong_roc_test
        from biscuit_tpu.ops.roc_jax import delong_test_jax

        rng = np.random.default_rng(10 + seed)
        y = rng.integers(0, 2, 250)
        a = rng.random(250) + 0.5 * y
        b = rng.random(250) + 0.2 * y
        h = float(np.squeeze(delong_roc_test(y, a, b)))
        d = float(delong_test_jax(jnp.asarray(y), jnp.asarray(a),
                                  jnp.asarray(b)))
        assert d == pytest.approx(h, rel=1e-3, abs=1e-3)
