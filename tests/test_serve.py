"""Serialized AOT servables (biscuit_tpu/serve.py, jax.export roundtrip).

CPU, tiny Xception. The servable bakes weights + preprocessing + the
K-pass MC-dropout head into one StableHLO artifact; these tests pin the
container format, numerical equivalence with the live inference path on
the same key, the any-n padding contract, and the guard rails
(multi-platform x fused validation, foreign-file rejection).

Reference seam: the artifact replaces slideflow's per-process model
reconstruction (/root/reference/results.py:234-257) — no counterpart
exists there, so the contract under test is this repo's own
(serve.py docstring)."""

import json

import jax
import numpy as np
import pytest
from test_model_trainer import tiny_hp

from biscuit_tpu import serve
from biscuit_tpu.data.normalize import inference_preprocess, make_normalizer
from biscuit_tpu.train.trainer import (
    init_model,
    load_checkpoint,
    save_checkpoint,
)
from biscuit_tpu.train.uq import mc_dropout_predict
from biscuit_tpu.models.xception import build_model

BATCH = 8


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    hp = tiny_hp(uq=True)
    model = build_model(hp)
    params, batch_stats = init_model(model, hp, jax.random.PRNGKey(3))
    root = tmp_path_factory.mktemp("servable_model")
    sub = save_checkpoint(str(root), params, batch_stats, hp, epoch=1,
                          outcome="cohort", label="tiny", kfold=None)
    return sub


@pytest.fixture(scope="module")
def artifact(model_dir):
    return serve.export_servable(model_dir, batch_size=BATCH)


def _tiles(n, px=32, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (n, px, px, 3), dtype=np.uint8)


class TestContainer:
    def test_header(self, artifact, model_dir):
        sv = serve.load_servable(artifact)
        h = sv.header
        assert h["format_version"] == 2
        assert h["arch"] == "xception_tiny"
        assert h["batch_size"] == BATCH and sv.batch_size == BATCH
        assert h["tile_px"] == 32
        assert h["k"] == 8  # tiny_hp uq_samples
        assert h["weights_blake2b"] == serve._weights_digest(model_dir)
        assert "cpu" in sv.platforms
        # v2 carries named programs; the default export bakes features too.
        assert set(h["programs"]) == {"uq", "features"}
        assert sv.has_features and sv.features_k == 8

    def test_reads_v1_containers(self, model_dir, tmp_path):
        """Backward compat: a v1 body (one unnamed UQ program filling the
        container) still loads; features are absent by construction."""
        p2 = serve.export_servable(model_dir, batch_size=4,
                                   out_path=str(tmp_path / "v2.biscuit"),
                                   with_features=False)
        header, programs = serve._read_container(p2)
        v1_header = {k: v for k, v in header.items()
                     if k not in ("programs", "features_k")}
        v1_header["format_version"] = 1
        hdr = json.dumps(v1_header).encode()
        p1 = tmp_path / "v1.biscuit"
        p1.write_bytes(serve._MAGIC + len(hdr).to_bytes(8, "little") + hdr
                       + programs["uq"])
        sv = serve.load_servable(str(p1))
        assert sv.header["format_version"] == 1
        assert not sv.has_features and sv.features_k is None
        m, s = sv(_tiles(4))
        assert m.shape == (4, 2)
        with pytest.raises(ValueError, match="without the feature program"):
            sv.features_exact(_tiles(4))

    def test_default_output_path(self, artifact, model_dir):
        assert artifact.endswith("servable.biscuit")
        assert artifact.startswith(model_dir)

    def test_rejects_foreign_file(self, tmp_path):
        p = tmp_path / "not_a_servable.bin"
        p.write_bytes(b"PK\x03\x04 definitely a zip")
        with pytest.raises(ValueError, match="bad magic"):
            serve.load_servable(str(p))

    def test_rejects_truncated_artifact(self, artifact, tmp_path):
        """Cutting the body mid-program fails loudly at load ("truncated
        or corrupt; re-export"), not as an opaque jax.export.deserialize
        error at first dispatch."""
        raw = open(artifact, "rb").read()
        p = tmp_path / "truncated.biscuit"
        p.write_bytes(raw[: len(raw) - 1000])
        with pytest.raises(ValueError,
                           match="truncated or corrupt|checksum mismatch"):
            serve.load_servable(str(p))

    def test_rejects_bitrot(self, artifact, tmp_path):
        """A single flipped bit inside a program body trips that program's
        blake2b checksum with an actionable message."""
        raw = bytearray(open(artifact, "rb").read())
        hdr_len = int.from_bytes(raw[len(serve._MAGIC):len(serve._MAGIC) + 8],
                                 "little")
        body_start = len(serve._MAGIC) + 8 + hdr_len
        raw[body_start + 500] ^= 0x40
        p = tmp_path / "bitrot.biscuit"
        p.write_bytes(bytes(raw))
        with pytest.raises(ValueError, match="checksum mismatch.*re-export"):
            serve.load_servable(str(p))

    def test_header_carries_checksums(self, artifact):
        header, programs = serve._read_container(artifact)
        assert set(header["checksums"]) == set(programs)
        # Artifacts exported before the checksums field still load: same
        # header minus "checksums" verifies nothing but reads fine.
        assert serve.load_servable(artifact).header["checksums"]

    def test_is_servable_artifact_sniffs_magic(self, artifact, model_dir,
                                               tmp_path):
        """Artifact detection keys on the container magic, not the filename
        — exports may carry any -o name (heatmap.py dispatches on this)."""
        import shutil

        renamed = tmp_path / "fleet_artifact_v1"  # no extension at all
        shutil.copyfile(artifact, renamed)
        assert serve.is_servable_artifact(str(renamed))
        assert not serve.is_servable_artifact(model_dir)  # a directory
        foreign = tmp_path / "model.biscuit"  # suffix lies
        foreign.write_bytes(b"not a container")
        assert not serve.is_servable_artifact(str(foreign))
        assert not serve.is_servable_artifact(str(tmp_path / "absent"))

    def test_rejects_future_format(self, artifact, tmp_path):
        raw = open(artifact, "rb").read()
        n = int.from_bytes(raw[len(serve._MAGIC):len(serve._MAGIC) + 8],
                           "little")
        hdr_at = len(serve._MAGIC) + 8
        header = json.loads(raw[hdr_at:hdr_at + n])
        header["format_version"] = 99
        hdr = json.dumps(header).encode()
        p = tmp_path / "future.biscuit"
        p.write_bytes(serve._MAGIC + len(hdr).to_bytes(8, "little") + hdr
                      + raw[hdr_at + n:])
        with pytest.raises(ValueError, match="format 99"):
            serve.load_servable(str(p))


class TestNumerics:
    def test_matches_live_inference(self, artifact, model_dir):
        """The exported program reproduces the live path on the same key."""
        model, params, batch_stats, hp, _ = load_checkpoint(model_dir)
        normalizer = make_normalizer(hp.normalizer)
        tiles = _tiles(BATCH)
        key = jax.random.PRNGKey(42)
        sv = serve.load_servable(artifact)
        got_m, got_s = sv.call_exact(tiles, key=key)
        x = inference_preprocess(jax.numpy.asarray(tiles), normalizer)
        want_m, want_s = mc_dropout_predict(
            model, params, batch_stats, x, key, k=hp.uq_samples)
        # Same math, same key, but a different jit boundary: the exported
        # program fuses differently than the live eager/jit path, so f32
        # rounding drifts ~3e-5 through the 2-hidden-layer head (measured).
        # The dropout masks ARE identical (same key/threefry) — a mask
        # mismatch would show up as O(1) row differences, not 1e-5.
        np.testing.assert_allclose(np.asarray(got_m), np.asarray(want_m),
                                   rtol=5e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(got_s), np.asarray(want_s),
                                   rtol=5e-4, atol=1e-4)

    def test_probs_are_probs(self, artifact):
        sv = serve.load_servable(artifact)
        m, s = sv(_tiles(BATCH))
        np.testing.assert_allclose(m.sum(axis=1), 1.0, atol=1e-5)
        assert (s >= 0).all()

    def test_explicit_key_is_deterministic(self, artifact):
        sv = serve.load_servable(artifact)
        key = jax.random.PRNGKey(7)
        a = sv(_tiles(BATCH), key=key)
        b = sv(_tiles(BATCH), key=key)
        np.testing.assert_array_equal(a[0], b[0])
        np.testing.assert_array_equal(a[1], b[1])

    def test_internal_key_stream_advances(self, artifact):
        sv = serve.load_servable(artifact)
        tiles = _tiles(BATCH)
        a = sv(tiles)
        b = sv(tiles)
        # Same tiles, fresh dropout keys: the MC std differs.
        assert not np.array_equal(a[1], b[1])


class TestPadding:
    def test_partial_batch(self, artifact):
        """Rows of a padded partial batch match the same rows computed
        at full batch (per-tile independence: inference BN + per-image
        standardization)."""
        sv = serve.load_servable(artifact)
        tiles = _tiles(BATCH)
        key = jax.random.PRNGKey(11)
        full_m, full_s = sv.call_exact(tiles, key=key)
        part_m, part_s = sv(tiles[:5], key=key)
        assert part_m.shape == (5, full_m.shape[1])
        np.testing.assert_allclose(part_m, np.asarray(full_m)[:5],
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(part_s, np.asarray(full_s)[:5],
                                   rtol=1e-5, atol=1e-6)

    def test_chunking_beyond_batch(self, artifact):
        sv = serve.load_servable(artifact)
        m, s = sv(_tiles(2 * BATCH + 3))
        assert m.shape[0] == 2 * BATCH + 3 and s.shape[0] == 2 * BATCH + 3

    def test_single_tile_rank3(self, artifact):
        sv = serve.load_servable(artifact)
        m, s = sv(_tiles(1)[0])
        assert m.shape[0] == 1

    def test_empty_batch(self, artifact):
        """n=0 keeps the any-n contract (a QC-filtered tile list can come
        back empty): (0, C) out, not a np.concatenate crash."""
        sv = serve.load_servable(artifact)
        m, s = sv(np.zeros((0, 32, 32, 3), np.uint8))
        assert m.shape == (0, 2) and s.shape[0] == 0


class TestFeatures:
    """The feature program (E9 off the artifact): pooled-trunk activations
    + K-pass head baked alongside the UQ program, so UMAP mosaics and
    SlideMaps run from the deployment artifact alone."""

    def test_export_roundtrip_is_bitwise(self, artifact, model_dir):
        """features_exact == the SAME preprocess->trunk->head chain jitted
        as one program: serialize -> deserialize -> execute adds zero drift.

        Measured (2026-08-20, cpu): max abs diff 0.0 — the deserialized
        StableHLO is the same program, so XLA compiles it identically.
        This is the real export-roundtrip pin; staged-vs-one-program
        numerics are covered (with the measured tolerance) by
        test_matches_live_feature_path below."""
        import jax.numpy as jnp

        from biscuit_tpu.data.normalize import per_image_standardization
        from biscuit_tpu.train.uq import mc_dropout_head, trunk_features

        model, params, batch_stats, hp, _ = load_checkpoint(model_dir)
        normalizer = make_normalizer(hp.normalizer)
        tiles = _tiles(BATCH, seed=2)
        key = jax.random.PRNGKey(31)
        sv = serve.load_servable(artifact)
        got_f, got_m, got_s = sv.features_exact(tiles, key=key)

        def infer_features(images_u8, key_data):
            x = images_u8.astype(jnp.float32)
            if normalizer is not None:
                x = normalizer(x)
            x = per_image_standardization(x)
            feats = trunk_features(model, params, batch_stats, x)
            k2 = jax.random.wrap_key_data(key_data)
            mean, std = mc_dropout_head(model, params, batch_stats, feats,
                                        k2, k=sv.features_k)
            return feats, mean, std

        want_f, want_m, want_s = jax.jit(infer_features)(
            tiles, jax.random.key_data(key))
        np.testing.assert_array_equal(np.asarray(got_f), np.asarray(want_f))
        np.testing.assert_array_equal(np.asarray(got_m), np.asarray(want_m))
        np.testing.assert_array_equal(np.asarray(got_s), np.asarray(want_s))

    def test_matches_live_feature_path(self, artifact, model_dir):
        """features_exact ~= the STAGED trunk-features + mc_dropout_head
        chain on the same key (the computation mosaic.generate_features
        runs from a checkpoint, stage by stage).

        Tolerance is calibrated, not aspirational: the exported program
        jits preprocess+trunk+head as ONE program, the staged path runs
        them as separate compilations, and XLA picks different fusions —
        each changing where the bf16 trunk rounds. Measured drift
        (2026-08-20, cpu, tiny trunk, B=8): max abs 1.28e-3, p99 ~31 bf16
        ulps, with rel-diff up to 1.0 on ReLU-boundary elements; the
        export roundtrip itself is bitwise (see
        test_export_roundtrip_is_bitwise). atol=5e-3/rtol=0.02 is the
        same family the sibling exported-vs-live chip tests use."""
        import jax.numpy as jnp

        from biscuit_tpu.data.normalize import per_image_standardization
        from biscuit_tpu.train.uq import mc_dropout_head

        model, params, batch_stats, hp, _ = load_checkpoint(model_dir)
        normalizer = make_normalizer(hp.normalizer)
        tiles = _tiles(BATCH, seed=2)
        key = jax.random.PRNGKey(31)
        sv = serve.load_servable(artifact)
        got_f, got_m, got_s = sv.features_exact(tiles, key=key)

        x = jnp.asarray(tiles).astype(jnp.float32)
        if normalizer is not None:
            x = normalizer(x)
        x = per_image_standardization(x)
        want_f = model.apply({"params": params, "batch_stats": batch_stats},
                             x, train=False, method="features")
        want_m, want_s = mc_dropout_head(model, params, batch_stats, want_f,
                                         key, k=sv.features_k)
        np.testing.assert_allclose(np.asarray(got_f), np.asarray(want_f),
                                   rtol=0.02, atol=5e-3)
        np.testing.assert_allclose(np.asarray(got_m), np.asarray(want_m),
                                   rtol=0.02, atol=5e-3)
        np.testing.assert_allclose(np.asarray(got_s), np.asarray(want_s),
                                   rtol=0.02, atol=5e-3)

    def test_any_n_contract(self, artifact):
        sv = serve.load_servable(artifact)
        f, m, s = sv.features(_tiles(BATCH + 3, seed=4))
        assert f.shape[0] == BATCH + 3 and f.ndim == 2
        assert m.shape == (BATCH + 3, 2) and s.shape == (BATCH + 3, 2)
        f0, m0, s0 = sv.features(np.zeros((0, 32, 32, 3), np.uint8))
        assert f0.shape[0] == 0 and m0.shape == (0, 2)

    def test_sharded_features_match_per_shard_singles(self, artifact):
        single = serve.load_servable(artifact)
        sharded = serve.load_sharded_servable(artifact)
        assert sharded.has_features
        tiles = _tiles(sharded.global_batch, seed=6)
        key = jax.random.PRNGKey(41)
        got_f, got_m, _ = sharded.features_exact(tiles, key=key)
        got_f, got_m = np.asarray(got_f), np.asarray(got_m)
        b = sharded.batch_size
        for i in range(sharded.n_shards):
            want_f, want_m, _ = single.features_exact(
                tiles[i * b:(i + 1) * b], key=jax.random.fold_in(key, i))
            np.testing.assert_allclose(got_f[i * b:(i + 1) * b],
                                       np.asarray(want_f),
                                       rtol=2e-5, atol=1e-6)
            np.testing.assert_allclose(got_m[i * b:(i + 1) * b],
                                       np.asarray(want_m),
                                       rtol=2e-5, atol=1e-6)

    def test_generate_features_from_artifact(self, artifact, model_dir,
                                             tmp_path):
        """mosaic.generate_features accepts the artifact path directly and
        reproduces the checkpoint-driven dump (same batch size + key
        schedule -> same rows up to the export jit boundary), then the
        SlideMap/mosaic flow runs off it."""
        import io

        from PIL import Image

        from biscuit_tpu.data.tfrecord import TFRecordWriter
        from biscuit_tpu.mosaic import (
            generate_features,
            generate_mosaic,
            slide_map_from_features,
        )

        rng = np.random.default_rng(1)
        for i in range(2):
            slide = f"fs{i}"
            with TFRecordWriter(str(tmp_path / f"{slide}.tfrecords")) as w:
                for t in range(6):
                    buf = io.BytesIO()
                    Image.fromarray(rng.integers(0, 256, (32, 32, 3),
                                                 dtype=np.uint8)
                                    ).save(buf, format="PNG")
                    w.write_tile(slide, buf.getvalue(), loc_x=t, loc_y=t)
        paths = sorted(str(p) for p in tmp_path.glob("*.tfrecords"))

        feats_a, meta_a, tiles_a = generate_features(
            artifact, paths, max_tiles=6, keep_tiles=True)
        # The live path with the artifact's batch size and k: identical
        # batch boundaries -> identical key schedule.
        feats_c, meta_c, _ = generate_features(
            model_dir, paths, max_tiles=6, batch_size=BATCH, k=8)
        assert feats_a.shape == feats_c.shape == (12, feats_a.shape[1])
        np.testing.assert_allclose(feats_a, feats_c, rtol=5e-4, atol=1e-4)
        assert [m["slide"] for m in meta_a] == [m["slide"] for m in meta_c]
        for ma, mc in zip(meta_a, meta_c):
            assert ma["loc"] == mc["loc"]
            np.testing.assert_allclose(ma["probs"], mc["probs"],
                                       rtol=5e-4, atol=1e-4)
            np.testing.assert_allclose(ma["uncertainty"], mc["uncertainty"],
                                       rtol=5e-4, atol=1e-4)

        # The downstream E9 surface runs off the artifact dump alone.
        sm = slide_map_from_features(feats_a, meta_a, tiles_a)
        sm.label_by_uncertainty()
        out = sm.save(str(tmp_path / "map.png"))
        assert out.endswith(".png")
        mosaic = generate_mosaic(feats_a, meta_a, tiles_a, grid=4)
        assert mosaic.shape == (4 * 32, 4 * 32, 3)

    def test_featureless_artifact_raises_in_generate_features(
            self, model_dir, tmp_path):
        from biscuit_tpu.mosaic import generate_features

        p = serve.export_servable(model_dir, batch_size=4,
                                  out_path=str(tmp_path / "nf.biscuit"),
                                  with_features=False)
        sv = serve.load_servable(p)
        assert not sv.has_features
        with pytest.raises(ValueError, match="no feature program"):
            generate_features(p, ["unused.tfrecords"])


class TestExportCLI:
    def test_cli_exports_and_prints_path(self, model_dir, tmp_path):
        from click.testing import CliRunner

        from biscuit_tpu.cli.export import main

        out = str(tmp_path / "cli.biscuit")
        r = CliRunner().invoke(
            main, [model_dir, "-o", out, "-b", "4", "--no-fused"])
        assert r.exit_code == 0, r.output
        assert out in r.output
        sv = serve.load_servable(out)
        assert sv.batch_size == 4

    def test_cli_rejects_multiplatform_fused(self, model_dir):
        from click.testing import CliRunner

        from biscuit_tpu.cli.export import main

        r = CliRunner().invoke(
            main, [model_dir, "--platform", "cpu", "--platform", "tpu",
                   "--fused"])
        assert r.exit_code != 0
        assert isinstance(r.exception, ValueError)


@pytest.mark.tpu
class TestServableTPU:
    """Fused-kernel export on the real chip: the Mosaic custom calls
    (`tpu_custom_call`) must survive serialize -> deserialize -> execute,
    and the served numbers must match live fused inference."""

    def test_fused_export_roundtrip_on_chip(self, tmp_path):
        from biscuit_tpu.hp import nature2022_params

        hp = nature2022_params()
        model = build_model(hp)
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            params, batch_stats = init_model(model, hp,
                                             jax.random.PRNGKey(0))
        sub = save_checkpoint(str(tmp_path), params, batch_stats, hp,
                              epoch=1, outcome="cohort", label="tpu",
                              kfold=None)
        path = serve.export_servable(sub, batch_size=64)

        # The auto-gated artifact on a TPU host bakes the Pallas kernels.
        _, programs = serve._read_container(path)
        assert b"tpu_custom_call" in programs["uq"]

        sv = serve.load_servable(path)
        assert "tpu" in sv.platforms
        tiles = _tiles(64, px=hp.tile_px, seed=3)
        key = jax.random.PRNGKey(17)
        got_m, got_s = sv.call_exact(tiles, key=key)

        model2, params2, batch_stats2, hp2, _ = load_checkpoint(sub)
        x = inference_preprocess(jax.numpy.asarray(tiles),
                                 make_normalizer(hp2.normalizer))
        want_m, want_s = mc_dropout_predict(
            model2, params2, batch_stats2, x, key, k=hp2.uq_samples)
        # Same fused path, same key; bf16 trunk + fusion-boundary drift.
        np.testing.assert_allclose(np.asarray(got_m), np.asarray(want_m),
                                   rtol=0.02, atol=0.02)
        np.testing.assert_allclose(np.asarray(got_s), np.asarray(want_s),
                                   rtol=0.05, atol=0.02)

    def test_fused_artifact_under_shard_map_on_chip(self, tmp_path):
        """The Mosaic custom calls (fused preprocess/middle/head) must
        execute when the exported program is the shard_map body — the
        ShardedServable path on real hardware. One chip = a 1-device
        mesh: that already drives the whole jit -> shard_map ->
        call_exported -> tpu_custom_call lowering chain (multi-device
        adds only the batch scatter; the per-device program is
        identical), which interpret-mode CPU runs cannot reach
        (io_callback kernels aren't partitionable — DEPLOYMENT.md)."""
        from jax.sharding import Mesh

        from biscuit_tpu.hp import nature2022_params

        hp = nature2022_params()
        hp.uq_samples = 8  # keep the chip roundtrip cheap
        model = build_model(hp)
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            params, batch_stats = init_model(model, hp,
                                             jax.random.PRNGKey(0))
        sub = save_checkpoint(str(tmp_path), params, batch_stats, hp,
                              epoch=1, outcome="cohort", label="tpush",
                              kfold=None)
        path = serve.export_servable(sub, batch_size=32)

        mesh = Mesh(np.asarray(jax.devices("tpu")[:1]), ("data",))
        ssv = serve.ShardedServable(path, mesh=mesh)
        assert ssv.n_shards == 1 and ssv.global_batch == 32
        tiles = _tiles(32, px=hp.tile_px, seed=5)
        key = jax.random.PRNGKey(23)
        got_m, got_s = ssv.call_exact(tiles, key=key)

        # Shard 0 of the sharded program == the plain servable on
        # fold_in(key, 0): the mesh wrapper must not change the math.
        sv = serve.load_servable(path)
        want_m, want_s = sv.call_exact(tiles, key=jax.random.fold_in(key, 0))
        np.testing.assert_allclose(np.asarray(got_m), np.asarray(want_m),
                                   rtol=2e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(got_s), np.asarray(want_s),
                                   rtol=2e-5, atol=1e-6)


class TestGuards:
    def test_nontpu_platform_requires_unfused(self, model_dir):
        """Fused kernels get baked when fusion is requested (or the auto
        gate picks it on a TPU host); any non-TPU target platform then
        cannot lower. The guard must fire for a SINGLE non-TPU platform
        too, not just the multi-platform case — platforms=("cpu",) on a
        TPU host would otherwise hit an obscure Mosaic lowering error."""
        with pytest.raises(ValueError, match="use_fused=False"):
            serve.export_servable(model_dir, batch_size=4,
                                  platforms=("cpu", "tpu"), use_fused=True)
        with pytest.raises(ValueError, match="use_fused=False"):
            serve.export_servable(model_dir, batch_size=4,
                                  platforms=("cpu",), use_fused=True)

    def test_auto_gate_on_tpu_host_rejects_cpu_platform(self, model_dir):
        if jax.default_backend() != "tpu":
            pytest.skip("auto gate bakes fused kernels only on a TPU host")
        with pytest.raises(ValueError, match="use_fused=False"):
            serve.export_servable(model_dir, batch_size=4,
                                  platforms=("cpu",))

    def test_fused_requires_tpu_host(self, model_dir):
        if jax.default_backend() == "tpu":
            pytest.skip("fused export is legal on a TPU host")
        with pytest.raises(ValueError, match="TPU host"):
            serve.export_servable(model_dir, batch_size=4, use_fused=True)

    def test_explicit_unfused_exports(self, model_dir, tmp_path):
        p = serve.export_servable(model_dir, batch_size=4,
                                  out_path=str(tmp_path / "s.biscuit"),
                                  use_fused=False)
        sv = serve.load_servable(p)
        m, _ = sv(_tiles(4))
        assert m.shape == (4, 2)


class TestSharded:
    """Data-parallel fan-out (ShardedServable): one single-device artifact
    served over the 8-device CPU mesh via shard_map. Pins the SPMD
    decomposition against per-shard single-device calls, the fold_in key
    schedule, and the any-n contract at global-batch granularity."""

    @pytest.fixture(scope="class")
    def sharded(self, artifact):
        sv = serve.load_sharded_servable(artifact)
        assert sv.n_shards == len(jax.devices())
        return sv

    def test_matches_per_shard_single_device_calls(self, sharded, artifact):
        """Row block i of the sharded call == a single-device call on that
        block with key fold_in(key, i): the mesh changes WHERE each shard
        runs, not what it computes."""
        single = serve.load_servable(artifact)
        n = sharded.global_batch
        tiles = _tiles(n, seed=3)
        key = jax.random.PRNGKey(21)
        got_m, got_s = sharded.call_exact(tiles, key=key)
        got_m, got_s = np.asarray(got_m), np.asarray(got_s)
        b = sharded.batch_size
        for i in range(sharded.n_shards):
            want_m, want_s = single.call_exact(
                tiles[i * b:(i + 1) * b], key=jax.random.fold_in(key, i))
            np.testing.assert_allclose(got_m[i * b:(i + 1) * b],
                                       np.asarray(want_m),
                                       rtol=2e-5, atol=1e-6)
            np.testing.assert_allclose(got_s[i * b:(i + 1) * b],
                                       np.asarray(want_s),
                                       rtol=2e-5, atol=1e-6)

    def test_shards_draw_independent_dropout_masks(self, sharded):
        """The SAME tile replicated across every shard must get different
        MC stds per shard — fold_in gives each shard its own mask stream
        (identical keys would silently correlate the K samples fleet-wide)."""
        one = _tiles(1, seed=5)[0]
        tiles = np.broadcast_to(one, (sharded.global_batch,) + one.shape)
        _, s = sharded.call_exact(tiles, key=jax.random.PRNGKey(2))
        s = np.asarray(s)
        b = sharded.batch_size
        # First row of each shard: same input, different key stream.
        firsts = s[::b]
        assert len(np.unique(firsts)) > 1

    def test_any_n_and_determinism(self, sharded):
        n = sharded.global_batch + 5
        tiles = _tiles(n, seed=7)
        key = jax.random.PRNGKey(9)
        m1, s1 = sharded(tiles, key=key)
        m2, s2 = sharded(tiles, key=key)
        assert m1.shape == (n, 2) and s1.shape[0] == n
        np.testing.assert_array_equal(m1, m2)
        np.testing.assert_array_equal(s1, s2)
        np.testing.assert_allclose(m1.sum(axis=1), 1.0, atol=1e-5)

    def test_wrong_shape_raises(self, sharded):
        with pytest.raises(ValueError, match="sharded servable expects"):
            sharded.call_exact(_tiles(sharded.global_batch - 1))

    def test_internal_key_stream_advances(self, sharded):
        tiles = _tiles(sharded.global_batch, seed=11)
        a = sharded.call_exact(tiles)
        b = sharded.call_exact(tiles)
        assert not np.array_equal(np.asarray(a[1]), np.asarray(b[1]))

    def test_empty_batch(self, sharded):
        m, s = sharded(np.zeros((0, 32, 32, 3), np.uint8))
        assert m.shape == (0, 2) and s.shape[0] == 0


class TestPredict:
    """Servable batch scoring (serve.predict_tfrecords + cli.predict):
    artifact + tfrecords -> the reference tile-prediction contract, rows
    matching the servable called by hand on the same tiles."""

    @pytest.fixture(scope="class")
    def corpus(self, tmp_path_factory):
        import io

        from PIL import Image

        from biscuit_tpu.data.tfrecord import TFRecordWriter

        rng = np.random.default_rng(0)
        root = tmp_path_factory.mktemp("predict_corpus")
        tiles = {}
        for i in range(3):
            slide = f"sl{i}"
            imgs = rng.integers(0, 256, (7, 32, 32, 3), dtype=np.uint8)
            tiles[slide] = imgs
            with TFRecordWriter(str(root / f"{slide}.tfrecords")) as w:
                for t in range(7):
                    buf = io.BytesIO()
                    Image.fromarray(imgs[t]).save(buf, format="PNG")
                    w.write_tile(slide, buf.getvalue(), loc_x=t, loc_y=2 * t)
        return root, tiles

    def test_frame_contract_and_rows(self, artifact, corpus):
        root, tiles = corpus
        paths = sorted(str(p) for p in root.glob("*.tfrecords"))
        sv = serve.load_servable(artifact)
        key = jax.random.PRNGKey(3)
        df = serve.predict_tfrecords(
            sv, paths, labels={"sl0": 0, "sl1": 1}, outcome="cohort",
            key=key)
        assert list(df.columns) == [
            "slide", "loc_x", "loc_y", "cohort_y_true0", "cohort_y_pred0",
            "cohort_y_pred1", "cohort_uncertainty0", "cohort_uncertainty1"]
        assert len(df) == 21
        # unlabeled slide -> -1; labeled slides carry their label
        assert set(df[df.slide == "sl2"].cohort_y_true0) == {-1}
        assert set(df[df.slide == "sl1"].cohort_y_true0) == {1}
        assert sorted(df[df.slide == "sl1"].loc_y) == [2 * t for t in range(7)]
        # Rows match the servable called by hand on the same tile bytes:
        # the batcher reads slides in order, so batch 1 (BATCH=8) is
        # sl0's 7 tiles + sl1's first — same key split as predict's loop.
        k1 = jax.random.split(key)[1]
        first = np.concatenate([tiles["sl0"], tiles["sl1"][:1]])
        want_m, _ = sv.call_exact(first, key=k1)
        np.testing.assert_allclose(
            df.cohort_y_pred1.to_numpy()[:8],
            np.asarray(want_m)[:, 1], rtol=1e-5, atol=1e-6)

    def test_sharded_scoring_same_frame_shape(self, artifact, corpus):
        root, _ = corpus
        paths = sorted(str(p) for p in root.glob("*.tfrecords"))
        ssv = serve.load_sharded_servable(artifact)
        df = serve.predict_tfrecords(ssv, paths, outcome="cohort")
        assert len(df) == 21
        assert np.isfinite(df.cohort_y_pred1).all()
        assert (df.cohort_y_true0 == -1).all()

    def test_cli(self, artifact, corpus, tmp_path):
        import pandas as pd
        from click.testing import CliRunner

        from biscuit_tpu.cli.predict import main

        root, _ = corpus
        ann = pd.DataFrame({
            "slide": ["sl0", "sl1", "sl2"],
            "cohort": ["LUAD", "LUSC", "LUAD"],
        })
        ann_path = str(tmp_path / "ann.csv")
        ann.to_csv(ann_path, index=False)
        out = str(tmp_path / "preds.csv")
        r = CliRunner().invoke(main, [
            artifact, str(root), "-o", out, "--annotations", ann_path,
            "--seed", "1"])
        assert r.exit_code == 0, r.output
        df = pd.read_csv(out)
        assert len(df) == 21
        # LUAD=0/LUSC=1 (sorted unique — the Dataset.labels convention)
        assert set(df[df.slide == "sl0"].cohort_y_true0) == {0}
        assert set(df[df.slide == "sl1"].cohort_y_true0) == {1}
        # deterministic with --seed (same sharding -> same key schedule)
        out2 = str(tmp_path / "preds2.csv")
        r2 = CliRunner().invoke(main, [
            artifact, str(root), "-o", out2, "--annotations", ann_path,
            "--seed", "1"])
        assert r2.exit_code == 0, r2.output
        pd.testing.assert_frame_equal(df, pd.read_csv(out2))


    def test_cli_labels_numeric_slide_ids_join_as_strings(self, artifact,
                                                          tmp_path):
        """Annotations with numeric-looking slide IDs / outcome codes must
        join and sort as STRINGS (the project.py dtype=str convention) —
        pandas type inference would otherwise key the labels dict by ints
        and every y_true0 silently falls back to -1."""
        import io as _io

        import pandas as pd
        from PIL import Image
        from click.testing import CliRunner

        from biscuit_tpu.cli.predict import main
        from biscuit_tpu.data.tfrecord import TFRecordWriter

        rng = np.random.default_rng(0)
        tfr = tmp_path / "numeric"
        tfr.mkdir()
        for sl in ("0123", "7"):
            with TFRecordWriter(str(tfr / f"{sl}.tfrecords")) as w:
                buf = _io.BytesIO()
                Image.fromarray(rng.integers(0, 256, (32, 32, 3),
                                             dtype=np.uint8)
                                ).save(buf, format="PNG")
                w.write_tile(sl, buf.getvalue(), loc_x=0, loc_y=0)
        ann = str(tmp_path / "num_ann.csv")
        # Outcome codes 2 and 10: string sort gives ["10", "2"], so
        # "10"->0 and "2"->1 — matching Dataset.labels, NOT numeric order.
        pd.DataFrame({"slide": ["0123", "7"], "cohort": ["2", "10"]}
                     ).to_csv(ann, index=False)
        out = str(tmp_path / "num_preds.csv")
        r = CliRunner().invoke(main, [
            artifact, str(tfr), "-o", out, "--annotations", ann])
        assert r.exit_code == 0, r.output
        df = pd.read_csv(out, dtype={"slide": str})
        assert set(df[df.slide == "0123"].cohort_y_true0) == {1}
        assert set(df[df.slide == "7"].cohort_y_true0) == {0}

    def test_cli_label_order_guards(self, artifact, corpus, tmp_path,
                                    model_dir):
        """Class-index safety (ADVICE r4): a predict-time CSV with a
        SUBSET of the training outcomes must not silently remap indices.
        Single-class annotations error without a pinned order; --classes
        pins the training order (single-class then scores correctly);
        values outside the pinned order error; an artifact exported from
        a checkpoint carrying outcome_labels pins the order by itself."""
        import pandas as pd
        from click.testing import CliRunner

        from biscuit_tpu.cli.predict import main

        root, _ = corpus
        ann = str(tmp_path / "one_class.csv")
        pd.DataFrame({"slide": ["sl0", "sl1", "sl2"],
                      "cohort": ["LUSC", "LUSC", "LUSC"]}
                     ).to_csv(ann, index=False)
        out = str(tmp_path / "p.csv")
        r = CliRunner().invoke(main, [artifact, str(root), "-o", out,
                                      "--annotations", ann])
        assert r.exit_code != 0
        assert "only one outcome value" in r.output
        # --classes pins training order: LUSC -> index 1 even though it is
        # the only (and alphabetically first) value present.
        r = CliRunner().invoke(main, [artifact, str(root), "-o", out,
                                      "--annotations", ann,
                                      "--classes", "LUAD,LUSC"])
        assert r.exit_code == 0, r.output
        assert set(pd.read_csv(out).cohort_y_true0) == {1}
        # A value outside the pinned order is an error, not a reindex.
        r = CliRunner().invoke(main, [artifact, str(root), "-o", out,
                                      "--annotations", ann,
                                      "--classes", "ADENO,SQUAM"])
        assert r.exit_code != 0
        assert "not in the training class order" in r.output

    def test_artifact_outcome_labels_pin_order(self, model_dir, corpus,
                                               tmp_path):
        """save_checkpoint(outcome_labels=...) -> servable header ->
        predict CLI: the training order rides the artifact, so single-class
        annotations score with training indices and no flag."""
        import pandas as pd
        from click.testing import CliRunner

        from biscuit_tpu.cli.predict import main
        from biscuit_tpu.train.trainer import load_checkpoint, save_checkpoint

        _, params, batch_stats, hp, _ = load_checkpoint(model_dir)
        root2 = tmp_path / "labeled_model"
        sub = save_checkpoint(str(root2), params, batch_stats, hp, epoch=1,
                              outcome="cohort", label="tiny", kfold=None,
                              outcome_labels=["LUAD", "LUSC"])
        art = serve.export_servable(sub, batch_size=BATCH)
        assert serve.load_servable(art).header["outcome_labels"] == \
            ["LUAD", "LUSC"]
        corp_root, _ = corpus
        ann = str(tmp_path / "one_class.csv")
        pd.DataFrame({"slide": ["sl0", "sl1", "sl2"],
                      "cohort": ["LUSC", "LUSC", "LUSC"]}
                     ).to_csv(ann, index=False)
        out = str(tmp_path / "p.csv")
        r = CliRunner().invoke(main, [art, str(corp_root), "-o", out,
                                      "--annotations", ann])
        assert r.exit_code == 0, r.output
        assert set(pd.read_csv(out).cohort_y_true0) == {1}

    def test_distributed_single_process_degrade(self, artifact, corpus,
                                                tmp_path):
        """predict_tfrecords_distributed single-process: every claim is won
        locally, the shard roundtrips through workdir, and the merged frame
        keeps the input tfrecord order. (The real 2-host fleet — claims
        split across OS processes, failure abort, cross-host determinism —
        is pinned in test_distributed.py.)"""
        from biscuit_tpu.data.tfrecord import TFRecordWriter

        root, _ = corpus
        paths = sorted(str(p) for p in root.glob("*.tfrecords"))
        # A QC'd-empty tfrecord must contribute no rows, not abort the
        # fleet (scored per-file, it would raise TileBatcher's no-tiles
        # error without the load_index skip).
        empty = str(tmp_path / "empty_slide.tfrecords")
        with TFRecordWriter(empty):
            pass
        sv = serve.load_servable(artifact)
        wd = str(tmp_path / "scored")
        df = serve.predict_tfrecords_distributed(
            sv, paths + [empty], wd, outcome="cohort",
            key=jax.random.PRNGKey(5))
        assert len(df) == 21
        assert df.slide.tolist() == (["sl0"] * 7 + ["sl1"] * 7
                                     + ["sl2"] * 7)
        assert "_src" not in df.columns
        # Per-file fold_in(key, i) schedule: file i scored alone with
        # fold_in(key, i) reproduces the distributed rows exactly.
        alone = serve.predict_tfrecords(
            sv, [paths[1]], outcome="cohort",
            key=jax.random.fold_in(jax.random.PRNGKey(5), 1))
        np.testing.assert_array_equal(
            df[df.slide == "sl1"].cohort_y_pred1.to_numpy(),
            alone.cohort_y_pred1.to_numpy())
        # CLI --distributed degrades the same way.
        from click.testing import CliRunner

        from biscuit_tpu.cli.predict import main

        out = str(tmp_path / "dpred.csv")
        r = CliRunner().invoke(main, [
            artifact, str(root), "-o", out, "--seed", "5",
            "--distributed", str(tmp_path / "scored_cli")])
        assert r.exit_code == 0, r.output
        import pandas as pd

        got = pd.read_csv(out)
        assert len(got) == 21


class TestPredictSlides:
    """Direct-WSI scoring (serve.predict_slides): the reference Fig-5
    per-tile loop (results.py:234-257) driven through the artifact."""

    @pytest.fixture(scope="class")
    def slide(self, tmp_path_factory):
        from test_wsi_heatmap import make_slide_image

        p = str(tmp_path_factory.mktemp("wsi") / "slideA.png")
        make_slide_image(p)
        return p

    def test_matches_by_hand_generator(self, artifact, slide):
        from biscuit_tpu.data.slide import WSI

        sv = serve.load_servable(artifact)
        assert sv.tile_um == 32  # header records tile_um now
        key = jax.random.PRNGKey(13)
        df = serve.predict_slides(sv, [slide], mpp=1.0, qc=None, key=key)
        assert len(df) == 64  # 256px slide / 32px grid, no QC
        assert (df.cohort_y_true0 == -1).all()
        assert df.slide.unique().tolist() == ["slideA"]
        # First batch by hand: same tiles, same key schedule.
        gen = WSI(slide, tile_px=32, tile_um=32, mpp=1.0).build_generator(
            include_loc="grid")
        tiles = [t["image"] for t in gen()][:BATCH]
        k1 = jax.random.split(key)[1]
        want_m, _ = sv.call_exact(np.stack(tiles), key=k1)
        np.testing.assert_allclose(
            df.cohort_y_pred1.to_numpy()[:BATCH],
            np.asarray(want_m)[:, 1], rtol=1e-5, atol=1e-6)

    def test_qc_drops_background(self, artifact, slide):
        sv = serve.load_servable(artifact)
        df = serve.predict_slides(sv, [slide], mpp=1.0, qc="both")
        assert 0 < len(df) < 64

    def test_max_tiles_caps_per_slide(self, artifact, slide):
        """max_tiles (CLI --max-tiles) caps the grid per slide — the
        slide-mode twin of the per-tfrecord cap, previously silently
        ignored with --slides."""
        sv = serve.load_servable(artifact)
        df = serve.predict_slides(sv, [slide, slide], mpp=1.0, qc=None,
                                  max_tiles=5)
        assert len(df) == 10  # 5 per slide, not 5 total or 64+64

    def test_distributed_single_process_degrade(self, artifact, slide,
                                                tmp_path):
        """predict_slides_distributed: one claim per slide through the
        shared claim/merge driver (_distributed_claim_map — the fleet
        protocol itself is pinned cross-process via the tfrecords path in
        test_distributed.py); slide i always scores with fold_in(key, i)."""
        sv = serve.load_servable(artifact)
        key = jax.random.PRNGKey(4)
        df = serve.predict_slides_distributed(
            sv, [slide, slide], str(tmp_path / "scored"), mpp=1.0, qc=None,
            key=key)
        assert len(df) == 128
        alone = serve.predict_slides(sv, [slide], mpp=1.0, qc=None,
                                     key=jax.random.fold_in(key, 1))
        np.testing.assert_array_equal(
            df.cohort_y_pred1.to_numpy()[64:],
            alone.cohort_y_pred1.to_numpy())
        # CLI: --slides composes with --distributed.
        from click.testing import CliRunner

        from biscuit_tpu.cli.predict import main

        out = str(tmp_path / "dslides.csv")
        r = CliRunner().invoke(main, [
            artifact, slide, "--slides", "--mpp", "1.0", "--qc", "none",
            "-o", out, "--no-sharded", "--seed", "4",
            "--distributed", str(tmp_path / "scored_cli")])
        assert r.exit_code == 0, r.output
        import pandas as pd

        assert len(pd.read_csv(out)) == 64

    def test_cli_slides_mode(self, artifact, slide, tmp_path):
        import pandas as pd
        from click.testing import CliRunner

        from biscuit_tpu.cli.predict import main

        out = str(tmp_path / "wsi_preds.csv")
        r = CliRunner().invoke(main, [
            artifact, slide, "--slides", "--mpp", "1.0", "--qc", "none",
            "-o", out, "--no-sharded"])
        assert r.exit_code == 0, r.output
        df = pd.read_csv(out)
        assert len(df) == 64
        assert np.isfinite(df.cohort_y_pred1).all()
