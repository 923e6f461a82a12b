"""Data-plane tests: proto/tfrecord round-trips, CRC framing, stain
normalization, standardization, augmentation, dataset filters, and
site-preserving splits."""

import json
import os

import numpy as np
import pandas as pd
import pytest

from biscuit_tpu.data import proto, tfrecord


class TestProto:
    def test_roundtrip_mixed(self):
        feats = {
            "slide": b"TCGA-01-0001",
            "image_raw": bytes(range(256)),
            "loc_x": [123],
            "loc_y": [456],
            "floats": [1.5, -2.25],
        }
        enc = proto.encode_example(feats)
        dec = proto.decode_example(enc)
        assert dec["slide"] == b"TCGA-01-0001"
        assert dec["image_raw"] == bytes(range(256))
        assert dec["loc_x"] == [123]
        assert dec["loc_y"] == [456]
        assert dec["floats"] == [1.5, -2.25]

    def test_negative_int64(self):
        enc = proto.encode_example({"v": [-5, 2**40]})
        assert proto.decode_example(enc)["v"] == [-5, 2**40]

    def test_multi_bytes(self):
        enc = proto.encode_example({"v": [b"a", b"bc"]})
        assert proto.decode_example(enc)["v"] == [b"a", b"bc"]

    def test_tf_compat_if_available(self):
        tf = pytest.importorskip("tensorflow")
        feats = {"slide": b"s1", "loc_x": [7], "f": [0.5]}
        enc = proto.encode_example(feats)
        ex = tf.train.Example()
        ex.ParseFromString(enc)
        assert ex.features.feature["slide"].bytes_list.value[0] == b"s1"
        assert ex.features.feature["loc_x"].int64_list.value[0] == 7


class TestTFRecord:
    def test_crc32c_known_vectors(self):
        # RFC 3720 test vectors for CRC32C.
        assert tfrecord.crc32c(b"") == 0x0
        assert tfrecord.crc32c(b"123456789") == 0xE3069283
        assert tfrecord.crc32c(bytes(32)) == 0x8A9136AA

    def test_write_read_roundtrip(self, tmp_path):
        path = str(tmp_path / "test.tfrecords")
        with tfrecord.TFRecordWriter(path) as w:
            for i in range(10):
                w.write_tile(f"slide{i}", bytes([i] * 50), loc_x=i, loc_y=2 * i)
        recs = list(tfrecord.read_examples(path, verify=True))
        assert len(recs) == 10
        assert recs[3]["slide"] == b"slide3"
        assert recs[3]["loc_x"] == [3]
        assert recs[3]["image_raw"] == bytes([3] * 50)

    def test_index_and_random_access(self, tmp_path):
        path = str(tmp_path / "t.tfrecords")
        with tfrecord.TFRecordWriter(path) as w:
            for i in range(5):
                w.write_tile(f"s{i}", b"x" * (i + 1))
        idx = tfrecord.load_index(path)
        assert len(idx) == 5
        with open(path, "rb") as f:
            ex = tfrecord.read_example_at(f, idx[4])
        assert ex["slide"] == b"s4"
        assert tfrecord.count_records(path) == 5

    def test_index_rebuild_without_sidecar(self, tmp_path):
        path = str(tmp_path / "t.tfrecords")
        with tfrecord.TFRecordWriter(path, index=False) as w:
            w.write_tile("a", b"1")
            w.write_tile("b", b"22")
        assert tfrecord.count_records(path) == 2

    def test_corruption_detected(self, tmp_path):
        path = str(tmp_path / "t.tfrecords")
        with tfrecord.TFRecordWriter(path) as w:
            w.write_tile("a", b"payload")
        data = bytearray(open(path, "rb").read())
        data[-6] ^= 0xFF  # flip a payload byte
        open(path, "wb").write(bytes(data))
        with pytest.raises(IOError):
            list(tfrecord.read_records(path, verify=True))


class TestNormalize:
    def test_self_normalization_identity(self):
        from biscuit_tpu.data.normalize import ReinhardFastNormalizer

        rng = np.random.default_rng(0)
        img = rng.uniform(30, 220, (64, 64, 3)).astype(np.float32)
        norm = ReinhardFastNormalizer().fit(img)
        out = np.asarray(norm(img))
        # Normalizing an image to its own statistics is (nearly) identity.
        assert np.abs(out - img).mean() < 1.0

    def test_output_matches_target_stats(self):
        from biscuit_tpu.data.normalize import (
            ReinhardFastNormalizer,
            rgb_to_lab,
        )

        rng = np.random.default_rng(1)
        img = rng.uniform(30, 220, (64, 64, 3)).astype(np.float32)
        norm = ReinhardFastNormalizer()
        out = rgb_to_lab(np.asarray(norm(img)))
        means = np.asarray(out).reshape(-1, 3).mean(axis=0)
        np.testing.assert_allclose(
            means, np.asarray(norm.target_means), atol=2.0
        )

    def test_batch_matches_single(self):
        from biscuit_tpu.data.normalize import ReinhardFastNormalizer

        rng = np.random.default_rng(2)
        imgs = rng.uniform(20, 230, (3, 32, 32, 3)).astype(np.float32)
        norm = ReinhardFastNormalizer()
        batch = np.asarray(norm(imgs))
        for i in range(3):
            np.testing.assert_allclose(
                batch[i], np.asarray(norm(imgs[i])), rtol=1e-4, atol=1e-3
            )

    def test_per_image_standardization_matches_tf_semantics(self):
        from biscuit_tpu.data.normalize import per_image_standardization

        rng = np.random.default_rng(3)
        x = rng.uniform(0, 255, (2, 16, 16, 3)).astype(np.float32)
        out = np.asarray(per_image_standardization(x))
        for i in range(2):
            xi = x[i]
            expected = (xi - xi.mean()) / max(xi.std(), 1.0 / np.sqrt(xi.size))
            np.testing.assert_allclose(out[i], expected, rtol=1e-4, atol=1e-4)
        # standardized: zero mean, unit-ish std
        assert abs(out[0].mean()) < 1e-4


class TestAugment:
    def test_flips_preserve_content(self):
        import jax

        from biscuit_tpu.data.augment import augment_batch

        rng = np.random.default_rng(4)
        imgs = rng.uniform(0, 255, (8, 16, 16, 3)).astype(np.float32)
        out = np.asarray(
            augment_batch(imgs, jax.random.PRNGKey(0), augment="xyr")
        )
        # Flips/rotations permute pixels: per-image sums invariant.
        np.testing.assert_allclose(
            out.sum(axis=(1, 2, 3)), imgs.sum(axis=(1, 2, 3)), rtol=1e-5
        )

    def test_rot90_decomposition_bitwise(self):
        """The transpose+flip rotation must match jnp.rot90 (via the
        vmapped-switch baseline) bitwise — both are index permutations."""
        import jax
        import jax.numpy as jnp

        from biscuit_tpu.data.augment import (
            _rot90_batch,
            _rot90_batch_switch,
        )

        rng = np.random.default_rng(11)
        imgs = jnp.asarray(rng.uniform(0, 255, (8, 9, 9, 3)), jnp.float32)
        k = jnp.asarray([0, 1, 2, 3, 3, 2, 1, 0])
        np.testing.assert_array_equal(
            np.asarray(_rot90_batch(imgs, k)),
            np.asarray(_rot90_batch_switch(imgs, k)))
        # Non-square tiles are rejected loudly (odd rotations change the
        # shape; the switch formulation also could not express them).
        rect = jnp.asarray(rng.uniform(0, 255, (4, 6, 9, 3)), jnp.float32)
        with pytest.raises(ValueError, match="square"):
            _rot90_batch(rect, jnp.asarray([0, 2, 0, 2]))

    def test_blur_shifted_fma_matches_conv(self):
        """The shifted-FMA blur witness must match the production
        vmapped-conv formulation (same taps, same SAME zero padding)."""
        import jax.numpy as jnp

        from biscuit_tpu.data.augment import (
            BLUR_SIGMAS,
            _blur_batch,
            _blur_batch_shift,
        )

        rng = np.random.default_rng(12)
        imgs = jnp.asarray(rng.uniform(-2, 2, (6, 17, 13, 3)), jnp.float32)
        sidx = jnp.asarray(rng.integers(0, len(BLUR_SIGMAS), 6))
        apply = jnp.asarray([True, False, True, True, False, True])
        a = np.asarray(_blur_batch(imgs, sidx, apply))
        b = np.asarray(_blur_batch_shift(imgs, sidx, apply))
        np.testing.assert_allclose(a, b, rtol=2e-6, atol=2e-6)

    def test_dihedral_collapse_bitwise(self):
        """The one-pass dihedral (flips+rotation) must equal the
        sequential flip-x, flip-y, rot90^k composition bitwise for all
        16 (fx, fy, k) combinations."""
        import jax.numpy as jnp

        from biscuit_tpu.data.augment import (
            _dihedral_batch,
            _rot90_batch,
        )

        rng = np.random.default_rng(13)
        combos = [(fx, fy, k) for fx in (0, 1) for fy in (0, 1)
                  for k in range(4)]
        imgs = jnp.asarray(rng.uniform(0, 255, (16, 9, 9, 3)), jnp.float32)
        fx = jnp.asarray([c[0] for c in combos], bool)
        fy = jnp.asarray([c[1] for c in combos], bool)
        k = jnp.asarray([c[2] for c in combos])
        seq = imgs
        seq = jnp.where(fx[:, None, None, None], seq[:, :, ::-1], seq)
        seq = jnp.where(fy[:, None, None, None], seq[:, ::-1], seq)
        seq = _rot90_batch(seq, k)
        out = _dihedral_batch(imgs, fx, fy, k)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(seq))

    def test_deterministic_given_key(self):
        import jax

        from biscuit_tpu.data.augment import augment_batch

        imgs = np.random.default_rng(5).uniform(0, 255, (4, 8, 8, 3)).astype(
            np.float32
        )
        a = np.asarray(augment_batch(imgs, jax.random.PRNGKey(7)))
        b = np.asarray(augment_batch(imgs, jax.random.PRNGKey(7)))
        np.testing.assert_array_equal(a, b)

    def test_blur_standardize_commute(self):
        """Augmentation-order deviation (augment.py module docstring): we
        standardize then augment; slideflow augments first. Blur has a
        normalized kernel, so in the image interior it commutes with the
        affine per-image standardization: blur(std(x)) == std-parameters-
        of-x applied to blur(x). At the <=3-pixel boundary band the SAME
        zero padding breaks the additive part (padding pulls toward 0 =
        the image mean in standardized space, vs 0 = black in image
        space) — the documented residual deviation."""
        import jax.numpy as jnp

        from biscuit_tpu.data.augment import _blur_batch

        rng = np.random.default_rng(11)
        imgs = rng.uniform(0, 255, (4, 16, 16, 3)).astype(np.float32)
        mean = imgs.mean(axis=(1, 2, 3), keepdims=True)
        std = imgs.std(axis=(1, 2, 3), keepdims=True)
        sigma_idx = np.array([0, 1, 2, 3])
        apply = np.ones(4, bool)
        blur = lambda x: np.asarray(  # noqa: E731
            _blur_batch(jnp.asarray(x), jnp.asarray(sigma_idx),
                        jnp.asarray(apply)))
        lhs = blur((imgs - mean) / std)          # standardize-then-augment
        rhs = (blur(imgs) - mean) / std          # augment-then-affine
        m = 3  # kernel radius: full support -> exact commutation
        np.testing.assert_allclose(lhs[:, m:-m, m:-m], rhs[:, m:-m, m:-m],
                                   atol=1e-4)
        # The edge band genuinely differs (zero-padding asymmetry).
        assert np.abs(lhs[:, 0] - rhs[:, 0]).max() > 1e-3

    def test_jpeg_host_aug(self):
        from biscuit_tpu.data.augment import jpeg_augment_host

        img = np.random.default_rng(6).integers(
            0, 255, (32, 32, 3), dtype=np.uint8
        )
        rng = np.random.default_rng(0)
        outs = [jpeg_augment_host(img, rng) for _ in range(10)]
        # Some applications occur; output shape/dtype preserved.
        assert any(not np.array_equal(o, img) for o in outs)
        assert all(o.shape == img.shape and o.dtype == np.uint8 for o in outs)


def _make_annotations(n=30):
    rows = []
    for i in range(n):
        rows.append(
            dict(
                patient=f"TCGA-{i:02d}-{1000+i}",
                slide=f"slide{i}",
                cohort="LUAD" if i % 2 == 0 else "LUSC",
                site=f"{i % 5:02d}",
            )
        )
    return pd.DataFrame(rows)


class TestDataset:
    def test_labels_and_patients(self):
        from biscuit_tpu.dataset import Dataset

        ds = Dataset(_make_annotations())
        labels, unique = ds.labels("cohort")
        assert unique == ["LUAD", "LUSC"]
        assert labels["slide0"] == 0
        assert labels["slide1"] == 1
        assert ds.patients()["slide3"] == "TCGA-03-1003"

    def test_filters(self):
        from biscuit_tpu.dataset import Dataset

        ann = _make_annotations()
        ann["include_T"] = ["include" if i < 10 else "exclude" for i in range(30)]
        ds = Dataset(ann).filter({"include_T": ["include"]})
        assert len(ds.slides()) == 10

    def test_sites_from_column_and_barcode(self):
        from biscuit_tpu.dataset import Dataset

        ann = _make_annotations()
        ds = Dataset(ann)
        assert ds.sites()["slide7"] == "02"
        ds2 = Dataset(ann.drop(columns=["site"]))
        # Barcode chars 5:7 of 'TCGA-07-1007' -> '07'
        assert ds2.sites()["slide7"] == "07"


class TestSplits:
    def test_site_preservation_and_balance(self, tmp_path):
        from biscuit_tpu.train.splits import kfold_split

        ann = _make_annotations(60)
        labels = {r.slide: (0 if r.cohort == "LUAD" else 1)
                  for r in ann.itertuples()}
        sites = dict(zip(ann["slide"], ann["site"]))
        folds = kfold_split(
            list(ann["slide"]), labels, sites, k=3,
            splits_path=str(tmp_path / "splits.json"),
        )
        # Partition
        all_slides = sorted(sum(folds.values(), []))
        assert all_slides == sorted(ann["slide"])
        # Site preservation
        slide_fold = {s: f for f, ss in folds.items() for s in ss}
        for site in set(sites.values()):
            site_folds = {slide_fold[s] for s, st in sites.items() if st == site}
            assert len(site_folds) == 1
        # Cache hit returns identical folds
        folds2 = kfold_split(
            list(ann["slide"]), labels, sites, k=3,
            splits_path=str(tmp_path / "splits.json"),
        )
        assert folds == folds2

    def test_class_balance_without_sites(self):
        from biscuit_tpu.train.splits import kfold_split

        labels = {f"s{i}": i % 2 for i in range(90)}
        folds = kfold_split([f"s{i}" for i in range(90)], labels, None, k=3)
        for f in folds.values():
            assert len(f) == 30
            assert sum(labels[s] for s in f) == 15


class TestProject:
    def test_create_load_roundtrip(self, tmp_path):
        from biscuit_tpu.project import Project

        ann = _make_annotations()
        ann_path = str(tmp_path / "ann.csv")
        ann.to_csv(ann_path, index=False)
        root = str(tmp_path / "proj")
        p = Project(root, annotations=ann_path, name="test", create=True)
        p.add_source("SRC", tfrecords=str(tmp_path / "tfr"))
        p2 = Project(root)
        assert p2.name == "test"
        assert p2.sources == ["SRC"]
        ds = p2.dataset()
        assert len(ds.slides()) == 30
        assert os.path.isdir(p2.models_dir)
        assert json.load(open(os.path.join(root, "settings.json")))["name"] == "test"


class TestPrefetchBatcher:
    def _make_tfr(self, tmp_path, n=20):
        import io

        from PIL import Image

        from biscuit_tpu.data.tfrecord import TFRecordWriter

        rng = np.random.default_rng(0)
        p = str(tmp_path / "pf.tfrecords")
        with TFRecordWriter(p) as w:
            for t in range(n):
                buf = io.BytesIO()
                Image.fromarray(
                    rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)
                ).save(buf, format="PNG")
                w.write_tile("s", buf.getvalue(), loc_x=t)
        return p

    def test_finite_stream_slow_consumer(self, tmp_path):
        """Regression: the end-of-stream sentinel must survive a full queue
        (a lost sentinel deadlocks the consumer)."""
        import time

        from biscuit_tpu.data.pipeline import PrefetchBatcher, TileBatcher

        p = self._make_tfr(tmp_path)
        pf = PrefetchBatcher(
            TileBatcher([p], {"s": 1}, batch_size=4, shuffle=False,
                        infinite=False, tile_px=16),
            depth=1,
        )
        got = 0
        for batch in pf:  # slow consumer: queue fills + stream ends early
            time.sleep(0.2)
            got += 1
        assert got == 5
        pf.close()

    def test_matches_unprefetched(self, tmp_path):
        from biscuit_tpu.data.pipeline import PrefetchBatcher, TileBatcher

        p = self._make_tfr(tmp_path)
        kw = dict(batch_size=8, shuffle=False, infinite=False, tile_px=16)
        plain = list(TileBatcher([p], {"s": 1}, **kw))
        pre = list(PrefetchBatcher(TileBatcher([p], {"s": 1}, **kw)))
        assert len(plain) == len(pre)
        for a, b in zip(plain, pre):
            np.testing.assert_array_equal(a["image"], b["image"])

    def test_infinite_stream_close(self, tmp_path):
        import time

        from biscuit_tpu.data.pipeline import PrefetchBatcher, TileBatcher

        p = self._make_tfr(tmp_path)
        pf = PrefetchBatcher(
            TileBatcher([p], {"s": 1}, batch_size=4, shuffle=True,
                        infinite=True, tile_px=16),
            depth=2,
        )
        it = iter(pf)
        for _ in range(7):
            next(it)
        t0 = time.time()
        pf.close()
        assert time.time() - t0 < 3  # close() must not hang

    def test_empty_batcher_raises(self, tmp_path):
        from biscuit_tpu.data.pipeline import TileBatcher

        b = TileBatcher([], {}, batch_size=4, infinite=True, tile_px=16)
        with pytest.raises(ValueError):
            next(iter(b))

    def test_degenerate_sites_fall_back(self):
        from biscuit_tpu.train.splits import kfold_split

        # All slides share one site: site preservation infeasible -> must
        # fall back to slide-level splits (regression for the empty-fold
        # deadlock chain).
        labels = {f"s{i}": i % 2 for i in range(12)}
        sites = {f"s{i}": "?" for i in range(12)}
        folds = kfold_split(list(labels), labels, sites, k=3)
        assert all(len(f) == 4 for f in folds.values())
