"""Native C++ loader tests: CRC32C parity, decode parity with PIL, tfrecord
indexing parity, and the threaded batch read+decode pipeline."""

import io
import os

import numpy as np
import pytest

pytest.importorskip("biscuit_tpu.data.native_loader")
from biscuit_tpu.data import native_loader as nl

if not nl.available():
    try:
        nl.build()
    except Exception:
        pytest.skip("native library unavailable and unbuildable",
                    allow_module_level=True)


def _png(img):
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    return buf.getvalue()


class TestNative:
    def test_crc32c_parity_with_python(self):
        from biscuit_tpu.data.tfrecord import _crc_table

        assert nl.native_crc32c(b"123456789") == 0xE3069283
        assert nl.native_crc32c(b"") == 0
        rng = np.random.default_rng(0)
        data = rng.integers(0, 255, 10000, dtype=np.uint8).tobytes()
        # parity with the pure-python table implementation
        table = _crc_table().tolist()
        crc = 0xFFFFFFFF
        for b in data:
            crc = table[(crc ^ b) & 0xFF] ^ (crc >> 8)
        assert nl.native_crc32c(data) == (crc ^ 0xFFFFFFFF)

    def test_png_decode_bit_exact(self):
        rng = np.random.default_rng(1)
        img = rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
        dec = nl.native_decode(_png(img))
        np.testing.assert_array_equal(dec, img)

    def test_jpeg_decode_matches_pil(self):
        from PIL import Image

        rng = np.random.default_rng(2)
        img = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, format="JPEG", quality=85)
        raw = buf.getvalue()
        dec = nl.native_decode(raw)
        pil = np.asarray(Image.open(io.BytesIO(raw)).convert("RGB"))
        np.testing.assert_array_equal(dec, pil)

    def test_garbage_returns_none(self):
        assert nl.native_decode(b"not an image at all") is None

    def test_index_parity(self, tmp_path):
        from biscuit_tpu.data.tfrecord import TFRecordWriter, load_index

        path = str(tmp_path / "t.tfrecords")
        with TFRecordWriter(path, index=False) as w:
            for i in range(20):
                w.write_tile(f"s{i}", bytes(10 + i))
        native_idx = nl.native_index_tfrecord(path)
        py_idx = load_index(path)
        np.testing.assert_array_equal(native_idx, py_idx)

    def test_batch_read_decode(self, tmp_path):
        from biscuit_tpu.data.tfrecord import TFRecordWriter

        rng = np.random.default_rng(3)
        path = str(tmp_path / "b.tfrecords")
        tiles = []
        with TFRecordWriter(path, index=False) as w:
            for i in range(10):
                img = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
                tiles.append(img)
                w.write_tile(f"slide{i}", _png(img), loc_x=i * 7, loc_y=i)
        offsets = nl.native_index_tfrecord(path)
        imgs, slides, locs, labels, ok = nl.native_read_decode_batch(
            path, offsets, 32, verify_crc=True
        )
        assert ok == 10
        assert slides == [f"slide{i}" for i in range(10)]
        np.testing.assert_array_equal(locs[:, 0], np.arange(10) * 7)
        for i in range(10):
            np.testing.assert_array_equal(imgs[i], tiles[i])

    def test_batch_wrong_tile_size_flagged(self, tmp_path):
        from biscuit_tpu.data.tfrecord import TFRecordWriter

        rng = np.random.default_rng(4)
        path = str(tmp_path / "w.tfrecords")
        with TFRecordWriter(path, index=False) as w:
            w.write_tile("a", _png(rng.integers(0, 255, (32, 32, 3),
                                                dtype=np.uint8)))
            w.write_tile("b", _png(rng.integers(0, 255, (16, 16, 3),
                                                dtype=np.uint8)))
        offsets = nl.native_index_tfrecord(path)
        imgs, slides, locs, labels, ok = nl.native_read_decode_batch(
            path, offsets, 32
        )
        assert ok == 1
        assert locs[1, 0] == -1  # mismatched tile flagged

    def test_pipeline_native_vs_python_paths(self, tmp_path):
        from biscuit_tpu.data.pipeline import TileBatcher
        from biscuit_tpu.data.tfrecord import TFRecordWriter

        rng = np.random.default_rng(5)
        paths = []
        for s in range(3):
            p = str(tmp_path / f"sl{s}.tfrecords")
            with TFRecordWriter(p) as w:
                for t in range(7):
                    img = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
                    w.write_tile(f"sl{s}", _png(img), loc_x=t, loc_y=s)
            paths.append(p)
        labels = {f"sl{s}": s % 2 for s in range(3)}
        kw = dict(labels=labels, batch_size=8, shuffle=False, infinite=False,
                  tile_px=32)
        native_batches = list(TileBatcher(paths, use_native=True, **kw))
        python_batches = list(TileBatcher(paths, use_native=False, **kw))
        assert len(native_batches) == len(python_batches) == 3
        for nb, pb in zip(native_batches, python_batches):
            np.testing.assert_array_equal(nb["image"], pb["image"])
            assert nb["slide"] == pb["slide"]
            np.testing.assert_array_equal(nb["label"], pb["label"])
            np.testing.assert_array_equal(nb["loc"], pb["loc"])
            np.testing.assert_array_equal(nb["mask"], pb["mask"])


class TestTiledTiff:
    """Native libtiff region reader (bounded-memory WSI ingestion; the
    reference stack reads .svs via slideflow's libvips/openslide C path)."""

    def _img(self, h=200, w=300, seed=0):
        rng = np.random.default_rng(seed)
        return rng.integers(0, 255, (h, w, 3), dtype=np.uint8)

    def test_region_reads_bitwise_vs_pil(self, tmp_path):
        from PIL import Image

        from biscuit_tpu.data.native_loader import TiledTiff, write_tiled_tiff

        img = self._img()
        p = str(tmp_path / "t.tiff")
        write_tiled_tiff(p, img, tile=64)
        # PIL decodes the same file independently — cross-decoder check.
        np.testing.assert_array_equal(
            np.asarray(Image.open(p).convert("RGB")), img)
        t = TiledTiff(p)
        assert (t.width, t.height) == (300, 200)
        for (x, y, w, h) in [(0, 0, 64, 64), (50, 40, 128, 100),
                             (63, 63, 2, 2), (0, 0, 300, 200)]:
            np.testing.assert_array_equal(
                t.read_region(x, y, w, h), img[y:y + h, x:x + w])
        # Out-of-image area reads as zeros.
        edge = t.read_region(250, 150, 100, 100)
        np.testing.assert_array_equal(edge[:50, :50], img[150:, 250:])
        assert (edge[50:] == 0).all() and (edge[:, 50:] == 0).all()
        t.close()

    def test_jpeg_tiles_close(self, tmp_path):
        from biscuit_tpu.data.native_loader import TiledTiff, write_tiled_tiff

        # Smooth gradient image: JPEG-representable content (random noise
        # is JPEG's worst case and would diverge wildly at any quality).
        yy, xx = np.mgrid[0:200, 0:300]
        img = np.stack([(xx * 255 // 300), (yy * 255 // 200),
                        ((xx + yy) * 255 // 500)], -1).astype(np.uint8)
        p = str(tmp_path / "j.svs")
        write_tiled_tiff(p, img, tile=64, jpeg=True)
        t = TiledTiff(p)
        got = t.read_region(0, 0, 300, 200).astype(np.int16)
        assert np.abs(got - img.astype(np.int16)).mean() < 4  # lossy JPEG
        t.close()

    def test_striped_tiff_rejected(self, tmp_path):
        from PIL import Image

        from biscuit_tpu.data.native_loader import TiledTiff

        p = str(tmp_path / "striped.tiff")
        Image.fromarray(self._img()).save(p)  # PIL writes striped TIFF
        with pytest.raises(OSError, match="tiled"):
            TiledTiff(p)

    def test_wsi_uses_native_path_and_extracts(self, tmp_path):
        from biscuit_tpu.data.native_loader import write_tiled_tiff
        from biscuit_tpu.data.slide import WSI

        img = self._img(h=256, w=256, seed=2)
        img[:128] = 30   # dark "tissue" half so Otsu QC keeps tiles
        p = str(tmp_path / "wsi.tiff")
        write_tiled_tiff(p, img, tile=64)
        wsi = WSI(p, tile_px=32, tile_um=32, mpp=1.0, qc="otsu")
        assert wsi._tiled is not None
        tile = wsi.read_tile(0, 0)
        np.testing.assert_array_equal(tile, img[:32, :32])
        out = str(tmp_path / "wsi.tfrecords")
        n = wsi.extract_tiles(out)
        assert n > 0 and os.path.exists(out)

    def test_thumbnail_bounded(self, tmp_path):
        from biscuit_tpu.data.native_loader import TiledTiff, write_tiled_tiff

        img = self._img(h=300, w=500, seed=3)
        p = str(tmp_path / "th.tiff")
        write_tiled_tiff(p, img, tile=64)
        t = TiledTiff(p)
        th = t.thumbnail(max_px=100)
        assert max(th.shape[:2]) <= 100
        # Mean-pooled thumbnail tracks the source's global statistics.
        assert abs(float(th.mean()) - float(img.mean())) < 4
        t.close()

    def test_pyramid_levels_and_thumbnail_from_level(self, tmp_path):
        from biscuit_tpu.data.native_loader import TiledTiff, write_tiled_tiff

        base = self._img(h=256, w=256, seed=4)
        # Half-res level: 2x2 mean pool of the base.
        lvl1 = base.reshape(128, 2, 128, 2, 3).mean((1, 3)).astype(np.uint8)
        p = str(tmp_path / "pyr.svs")
        write_tiled_tiff(p, base, tile=64)
        write_tiled_tiff(p, lvl1, tile=64, append=True)
        assert TiledTiff.levels(p) == [(256, 256), (128, 128)]
        t0 = TiledTiff(p, level=0)
        t1 = TiledTiff(p, level=1)
        assert (t0.width, t1.width) == (256, 128)
        np.testing.assert_array_equal(t1.read_region(0, 0, 128, 128), lvl1)
        # thumbnail(max_px=128) picks the 128px level, not the base.
        th = t0.thumbnail(max_px=128)
        np.testing.assert_array_equal(th, lvl1)
        t0.close()
        t1.close()

    def test_aperio_mpp_parsed(self, tmp_path, monkeypatch):
        from types import SimpleNamespace

        from biscuit_tpu.data.slide import WSI

        # A WSI whose PIL handle advertises an Aperio-style description.
        from biscuit_tpu.data.native_loader import write_tiled_tiff

        p = str(tmp_path / "ap.svs")
        write_tiled_tiff(p, self._img(h=128, w=128, seed=5), tile=64)
        wsi = WSI(p, tile_px=32, tile_um=32, mpp=None)
        fake = SimpleNamespace(tag_v2={270: "Aperio Format\n|AppMag = 20"
                                            "|MPP = 0.4963|"}, size=(128, 128))
        wsi._img = fake
        assert abs(wsi._detect_mpp() - 0.4963) < 1e-9

    def test_wsi_reads_from_matched_pyramid_level(self, tmp_path):
        from biscuit_tpu.data.native_loader import write_tiled_tiff
        from biscuit_tpu.data.slide import WSI

        base = self._img(h=256, w=256, seed=6)
        lvl1 = base.reshape(128, 2, 128, 2, 3).mean((1, 3)).astype(np.uint8)
        p = str(tmp_path / "lvl.svs")
        write_tiled_tiff(p, base, tile=64)
        write_tiled_tiff(p, lvl1, tile=64, append=True)
        # extract 64px windows -> 32px tiles: downsample 2 == level 1.
        wsi = WSI(p, tile_px=32, tile_um=64, mpp=1.0)
        assert wsi._read_level is not None and wsi._level_ds == 2.0
        tile = wsi.read_tile(0, 0)
        assert tile.shape == (32, 32, 3)
        # lpx == tile_px here, so the tile is exactly the level-1 region.
        np.testing.assert_array_equal(tile, lvl1[:32, :32])
        tile2 = wsi.read_tile(64, 128)
        np.testing.assert_array_equal(tile2, lvl1[64:96, 32:64])

        # Without a usable level (tile_um == tile_px), base level is used.
        wsi2 = WSI(p, tile_px=32, tile_um=32, mpp=1.0)
        assert wsi2._read_level is None

    def test_tissue_mask_scale_from_pyramid_thumbnail(self, tmp_path):
        """Regression: _thumb_scale must come from the mask's actual shape
        — recomputing the downsample desynchronizes when the QC thumbnail
        is read from a pyramid level (compound scale)."""
        from biscuit_tpu.data.native_loader import write_tiled_tiff
        from biscuit_tpu.data.slide import WSI

        # Non-power-of-two base: the pre-fix code recomputed
        # ceil(3000/1024) = 3, but the actual compound scale is level
        # ds 2 x in-level thumbnail ds 2 = 4 — sizes where the two
        # coincide (e.g. 2048) would not pin the bug.
        H = W = 3000
        base = np.full((H, W, 3), 240, np.uint8)   # white background
        base[:, : W // 2] = 40                     # left half = dark tissue
        lvl1 = base.reshape(1500, 2, 1500, 2, 3).mean((1, 3)).astype(
            np.uint8)
        p = str(tmp_path / "big.svs")
        write_tiled_tiff(p, base, tile=256)
        write_tiled_tiff(p, lvl1, tile=256, append=True)
        wsi = WSI(p, tile_px=64, tile_um=64, mpp=1.0, qc="otsu")
        # Thumbnail came from level 1 (1500px) downsampled 2x, so the
        # mask is 750 wide and the scale is exactly 4 slide px/mask px.
        assert wsi._tissue_mask.shape[1] == 750
        assert wsi._thumb_scale == 4.0
        # Tissue decisions line up with the slide halves, including the
        # rightmost column (which a desynced scale rejects).
        assert wsi._tile_is_tissue(0, 0)
        assert wsi._tile_is_tissue(W // 2 - 128, 0)
        assert not wsi._tile_is_tissue(W // 2 + 64, 0)
        assert not wsi._tile_is_tissue(W - 64, H - 64)

    def test_garbage_file_raises_cleanly(self, tmp_path):
        from biscuit_tpu.data.native_loader import TiledTiff

        p = str(tmp_path / "junk.svs")
        with open(p, "wb") as f:
            f.write(b"definitely not a tiff" * 100)
        with pytest.raises(OSError):
            TiledTiff(p)
        with pytest.raises(OSError):
            TiledTiff.levels(p)
