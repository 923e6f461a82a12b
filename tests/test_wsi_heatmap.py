"""WSI reading/QC/extraction, heatmap grid inference, and feature/mosaic
maps on synthetic slides (capability rows E3, E7, E8, E9 of SURVEY.md
§2.3)."""

import io
import os
from os.path import join

import numpy as np
import pandas as pd
import pytest


def make_slide_image(path, size=256, tissue_blobs=6, seed=0):
    """White background with dark pink 'tissue' blobs."""
    from PIL import Image

    rng = np.random.default_rng(seed)
    img = np.full((size, size, 3), 245, np.uint8)
    yy, xx = np.mgrid[0:size, 0:size]
    for _ in range(tissue_blobs):
        cy, cx = rng.integers(40, size - 40, 2)
        r = rng.integers(25, 50)
        m = (yy - cy) ** 2 + (xx - cx) ** 2 < r * r
        img[m] = [170, 90, 140]
        img[m] = np.clip(
            img[m] + rng.normal(0, 25, img[m].shape), 0, 255
        ).astype(np.uint8)
    Image.fromarray(img).save(path)
    return img


class TestWSI:
    def test_grid_and_extraction(self, tmp_path):
        from biscuit_tpu.data.slide import WSI

        p = str(tmp_path / "slide1.png")
        make_slide_image(p)
        wsi = WSI(p, tile_px=32, tile_um=32, mpp=1.0)
        assert wsi.extract_px == 32
        assert wsi.grid_x == 8 and wsi.grid_y == 8
        tiles = list(wsi.build_generator()())
        assert len(tiles) == 64
        assert tiles[0]["image"].shape == (32, 32, 3)

    def test_qc_drops_background(self, tmp_path):
        from biscuit_tpu.data.slide import WSI

        p = str(tmp_path / "slide2.png")
        make_slide_image(p)
        wsi = WSI(p, tile_px=32, tile_um=32, mpp=1.0, qc="both")
        kept = list(wsi.build_generator()())
        assert 0 < len(kept) < 64  # background tiles dropped
        # kept tiles contain tissue (darker content)
        for t in kept:
            assert t["image"].mean() < 240

    def test_tile_um_resize(self, tmp_path):
        from biscuit_tpu.data.slide import WSI

        p = str(tmp_path / "slide3.png")
        make_slide_image(p)
        # 64um tiles at 1 mpp -> 64px regions resized to 32px
        wsi = WSI(p, tile_px=32, tile_um=64, mpp=1.0)
        assert wsi.extract_px == 64
        t = next(wsi.build_generator()())
        assert t["image"].shape == (32, 32, 3)

    def test_extract_to_tfrecord(self, tmp_path):
        from biscuit_tpu.data.slide import WSI
        from biscuit_tpu.data.tfrecord import count_records

        p = str(tmp_path / "slide4.png")
        make_slide_image(p)
        wsi = WSI(p, tile_px=32, tile_um=32, mpp=1.0, qc="otsu")
        out = str(tmp_path / "slide4.tfrecords")
        n = wsi.extract_tiles(out)
        assert n > 0
        assert count_records(out) == n

    def test_extract_tiles_for_project(self, tmp_path):
        from biscuit_tpu.project import Project

        slides_dir = tmp_path / "slides"
        slides_dir.mkdir()
        for i in range(3):
            make_slide_image(str(slides_dir / f"ws{i}.png"), seed=i)
        ann = pd.DataFrame(
            dict(patient=[f"P{i}" for i in range(3)],
                 slide=[f"ws{i}" for i in range(3)],
                 cohort=["LUAD", "LUSC", "LUAD"])
        )
        ann_path = str(tmp_path / "ann.csv")
        ann.to_csv(ann_path, index=False)
        P = Project(str(tmp_path / "proj"), annotations=ann_path,
                    name="wsi", create=True)
        P.add_source(
            "S", slides=str(slides_dir),
            tfrecords=str(tmp_path / "proj" / "tfrecords"),
        )
        report = P.extract_tiles(tile_px=32, tile_um=32, qc="otsu", mpp=1.0)
        assert len(report) == 3
        ds = P.dataset(tile_px=32, tile_um=32)
        assert len(ds.tfrecords()) == 3
        # PDF extraction report with sample thumbnails (slideflow parity).
        assert os.path.exists(
            join(P.root, "tile_extraction_report_32px_32um.pdf"))
        assert os.path.exists(join(P.root, "extraction_report_32px.csv"))
        # Idempotent: re-extraction skips existing tfrecords.
        report2 = P.extract_tiles(tile_px=32, tile_um=32, qc="otsu", mpp=1.0)
        assert len(report2) == 0


@pytest.fixture(scope="module")
def tiny_saved_model(tmp_path_factory):
    """A trained+saved tiny model for heatmap/mosaic tests."""
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from test_model_trainer import make_tile, tiny_hp

    from biscuit_tpu import utils
    from biscuit_tpu.data.tfrecord import TFRecordWriter
    from biscuit_tpu.project import Project
    from PIL import Image

    tmp = tmp_path_factory.mktemp("hm")
    rng = np.random.default_rng(0)
    tfr = tmp / "tfr"
    tfr.mkdir()
    rows = []
    for i in range(8):
        rows.append(dict(patient=f"P{i}", slide=f"s{i}",
                         cohort="LUAD" if i % 2 == 0 else "LUSC"))
        with TFRecordWriter(str(tfr / f"s{i}.tfrecords")) as w:
            for t in range(8):
                buf = io.BytesIO()
                Image.fromarray(make_tile(i % 2, rng)).save(buf, format="PNG")
                w.write_tile(f"s{i}", buf.getvalue(), loc_x=t, loc_y=0)
    ann_path = str(tmp / "ann.csv")
    pd.DataFrame(rows).to_csv(ann_path, index=False)
    P = Project(str(tmp / "proj"), annotations=ann_path, name="hm",
                create=True)
    P.add_source("S", tfrecords=str(tfr))
    P.train("cohort", exp_label="HM", params=tiny_hp(uq=True),
            val_strategy="none", save_model=True)
    model_path = utils.find_model(P, "HM", outcome="cohort", epoch=1)
    return P, model_path, tmp


class TestHeatmap:
    def test_heatmap_grid(self, tiny_saved_model, tmp_path):
        from biscuit_tpu.heatmap import Heatmap

        P, model_path, tmp = tiny_saved_model
        slide_path = str(tmp_path / "hs.png")
        make_slide_image(slide_path, size=128)
        hm = Heatmap(slide_path, model_path, batch_size=16)
        assert hm.logits.shape == (4, 4, 2)
        assert hm.uncertainty.shape == (4, 4, 1)
        computed = hm.logits[:, :, 1] != -99.0
        assert computed.all()  # no QC -> full grid computed
        # probabilities in range
        assert ((hm.logits[computed] >= 0) & (hm.logits[computed] <= 1)).all()
        hm.save(str(tmp_path / "out"))
        assert os.path.exists(join(str(tmp_path / "out"), "hs-preds.png"))
        assert os.path.exists(
            join(str(tmp_path / "out"), "hs-uncertainty.png")
        )

    def test_heatmap_from_servable_matches_checkpoint(self, tiny_saved_model,
                                                      tmp_path):
        """A *.biscuit artifact drives the same grid as the checkpoint it
        was exported from (serving fleets heatmap without model code)."""
        from biscuit_tpu import serve
        from biscuit_tpu.heatmap import Heatmap

        P, model_path, tmp = tiny_saved_model
        slide_path = str(tmp_path / "hs3.png")
        make_slide_image(slide_path, size=128, seed=5)
        art = serve.export_servable(
            model_path, out_path=str(tmp_path / "hm.biscuit"),
            batch_size=16)
        hm_a = Heatmap(slide_path, art, batch_size=16)
        hm_m = Heatmap(slide_path, model_path, batch_size=16)
        # Same PRNGKey(0) schedule both paths; exported-vs-live jit
        # boundaries drift ~1e-4 (test_serve.py measured).
        np.testing.assert_allclose(hm_a.logits, hm_m.logits,
                                   rtol=5e-3, atol=5e-4)
        np.testing.assert_allclose(hm_a.uncertainty, hm_m.uncertainty,
                                   rtol=5e-3, atol=5e-4)
        with pytest.raises(ValueError, match="bakes K="):
            Heatmap(slide_path, art, k=3)

    def test_uq_masking_workflow(self, tiny_saved_model, tmp_path):
        # The Figure-5 masking idiom (results.py:222-227) works on our arrays.
        from biscuit_tpu.heatmap import Heatmap

        P, model_path, tmp = tiny_saved_model
        slide_path = str(tmp_path / "hs2.png")
        make_slide_image(slide_path, size=128, seed=3)
        hm = Heatmap(slide_path, model_path, batch_size=16)
        thresh = float(np.median(hm.uncertainty[hm.uncertainty > -99]))
        uq_mask = hm.uncertainty[:, :, 0] > thresh
        hm.logits[uq_mask, :] = [-1, -1]
        assert (hm.logits[uq_mask] == -1).all()


class TestMosaic:
    def test_features_and_maps(self, tiny_saved_model, tmp_path):
        from biscuit_tpu.mosaic import (
            generate_features,
            generate_mosaic,
            slide_map_from_features,
        )

        P, model_path, tmp = tiny_saved_model
        tfrecords = P.dataset().tfrecords()
        features, meta, tiles = generate_features(
            model_path, tfrecords, max_tiles=4, keep_tiles=True,
            cache=str(tmp_path / "cache.npz"),
        )
        assert features.shape == (32, 128)  # 8 slides x 4 tiles, tiny F=128
        assert len(meta) == 32
        assert tiles.shape[0] == 32

        smap = slide_map_from_features(features, meta, tiles)
        smap.label_by_uncertainty(1)
        assert (smap.labels >= 0).all()
        smap.label_by_slide()
        assert len(set(smap.labels)) == 8
        smap.save(str(tmp_path / "map.png"))
        assert os.path.exists(str(tmp_path / "map.png"))

        mosaic_img = generate_mosaic(features, meta, tiles, grid=4)
        assert mosaic_img.shape == (4 * 32, 4 * 32, 3)
        # cache round-trip
        f2, m2, t2 = generate_features(
            model_path, tfrecords, max_tiles=4, keep_tiles=True,
            cache=str(tmp_path / "cache.npz"),
        )
        np.testing.assert_array_equal(features, f2)


class TestCLISmoke:
    def test_helps(self):
        from click.testing import CliRunner

        from biscuit_tpu.cli.configure import configure_projects
        from biscuit_tpu.cli.results import show_results
        from biscuit_tpu.cli.train import train_models

        r = CliRunner()
        for cmd in (configure_projects, train_models, show_results):
            result = r.invoke(cmd, ["--help"])
            assert result.exit_code == 0, result.output

    def test_num_range(self):
        from biscuit_tpu.cli.train import num_range

        assert num_range("1-6") == [1, 2, 3, 4, 5, 6]
        assert num_range("1,3,5") == [1, 3, 5]
        assert num_range("4") == [4]


class TestROI:
    def test_points_in_polygon(self):
        from biscuit_tpu.data.slide import points_in_polygon

        square = np.array([[10, 10], [50, 10], [50, 50], [10, 50]], float)
        pts = np.array([[30, 30], [5, 5], [49, 49], [60, 30]], float)
        np.testing.assert_array_equal(
            points_in_polygon(pts, square), [True, False, True, False]
        )

    def test_roi_inside_filtering(self, tmp_path):
        from biscuit_tpu.data.slide import WSI

        p = str(tmp_path / "roi_slide.png")
        make_slide_image(p)
        # ROI covering the left half of the 256px slide.
        roi_csv = str(tmp_path / "roi_slide.csv")
        pd.DataFrame(
            {
                "roi_name": ["r1"] * 4,
                "x_base": [0, 128, 128, 0],
                "y_base": [0, 0, 256, 256],
            }
        ).to_csv(roi_csv, index=False)
        wsi_all = WSI(p, 32, 32, mpp=1.0)
        wsi_in = WSI(p, 32, 32, mpp=1.0, rois=roi_csv, roi_method="inside")
        wsi_out = WSI(p, 32, 32, mpp=1.0, rois=roi_csv, roi_method="outside")
        n_all = len(wsi_all.coords())
        n_in = len(wsi_in.coords())
        n_out = len(wsi_out.coords())
        assert n_in + n_out == n_all
        assert 0 < n_in < n_all
        # inside tiles have center x < 128
        for _, _, x, y in wsi_in.coords():
            assert x + 16 < 128

    def test_roi_ignore_keeps_all(self, tmp_path):
        from biscuit_tpu.data.slide import WSI

        p = str(tmp_path / "roi2.png")
        make_slide_image(p)
        roi = [np.array([[0, 0], [10, 0], [10, 10]], float)]
        wsi = WSI(p, 32, 32, mpp=1.0, rois=roi, roi_method="ignore")
        assert len(wsi.coords()) == 64


class TestTileExport:
    def test_export_by_uncertainty(self, tiny_saved_model, tmp_path):
        from biscuit_tpu.heatmap import export_tiles_by_uncertainty

        P, model_path, tmp = tiny_saved_model
        slide_path = str(tmp_path / "ex.png")
        make_slide_image(slide_path, size=128)
        n_incl, n_excl = export_tiles_by_uncertainty(
            slide_path, model_path, tile_uq=0.5, outdir=str(tmp_path / "out"),
            batch_size=16,
        )
        assert n_incl + n_excl == 16  # 4x4 grid
        incl = os.listdir(join(str(tmp_path / "out"), "uq_incl"))
        excl = os.listdir(join(str(tmp_path / "out"), "uq_excl"))
        assert len(incl) == n_incl and len(excl) == n_excl
        # filenames carry slide, grid loc, and the uncertainty value
        if incl:
            assert incl[0].startswith("ex-")


class TestShardedNumerics:
    def test_dp_sharded_matches_single_device(self):
        """SURVEY.md 4.4: sharded == unsharded numerics for one train step."""
        import jax
        import jax.numpy as jnp
        import numpy as np
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        import sys
        sys.path.insert(0, os.path.dirname(__file__))
        from test_model_trainer import tiny_hp

        from biscuit_tpu.models.xception import build_model
        from biscuit_tpu.train.trainer import (
            init_model, make_optimizer, make_train_step,
        )

        # f32 compute so any mismatch is a sharding bug, not bf16 tiling
        hp = tiny_hp(batch_size=16, augment="", compute_dtype="float32")
        model = build_model(hp)
        tx = make_optimizer(hp)
        params, bs = init_model(model, hp, jax.random.PRNGKey(0))
        opt = tx.init(params)
        rng = np.random.default_rng(0)
        images = rng.integers(0, 255, (16, 32, 32, 3)).astype(np.uint8)
        labels = rng.integers(0, 2, 16).astype(np.int32)
        mask = np.ones(16, np.float32)
        key = jax.random.PRNGKey(7)

        step_fn = make_train_step(model, tx, hp, normalizer=None)
        losses = {}
        for n_dev in (1, 8):
            mesh = Mesh(np.asarray(jax.devices()[:n_dev]), ("data",))
            b = NamedSharding(mesh, P("data"))
            r = NamedSharding(mesh, P())
            fn = jax.jit(step_fn, in_shardings=(r, r, r, b, b, b, r))
            p2, bs2, opt2, metrics = fn(
                jax.device_put(params, r), jax.device_put(bs, r),
                jax.device_put(opt, r), jax.device_put(images, b),
                jax.device_put(labels, b), jax.device_put(mask, b), key,
            )
            losses[n_dev] = (
                float(metrics["loss"]),
                float(jnp.mean(jax.tree_util.tree_leaves(p2)[0])),
            )
        assert losses[1][0] == pytest.approx(losses[8][0], rel=1e-5)
        assert losses[1][1] == pytest.approx(losses[8][1], rel=1e-4)
