"""w8a8 quantized trunk (ops/int8_trunk.py).

Three layers of evidence, all on the tiny arch (CPU):
1. Structural parity — the module's functional forward in calibrate (f32)
   mode must match the Flax graph (models/xception.py) closely; this
   catches wrong padding/relu_first/BN-fold structure independent of
   quantization error.
2. Quantization error bounds — w8a8 features stay directionally faithful
   (cosine) and bounded in relative L2 vs the f32 trunk.
3. UQ wiring — mc_dropout_predict(int8_qw=...) returns valid, close
   probability/uncertainty outputs, with calibration accumulated across
   batches through Int8Calibrator.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny():
    from biscuit_tpu.hp import ModelParams
    from biscuit_tpu.models.xception import build_model

    hp = ModelParams(model="xception_tiny", tile_px=64, tile_um=64,
                     hidden_layer_width=64, hidden_layers=2, dropout=0.1,
                     normalizer=None)
    model = build_model(hp)
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((2, 64, 64, 3), jnp.float32)
    variables = model.init({"params": rng, "dropout": rng}, x, train=False)
    return model, variables["params"], variables["batch_stats"]


def _batch(seed, n=4, px=64):
    # Standardized-tile statistics: ~N(0, 1) per pixel (the trunk input
    # after per_image_standardization).
    gen = np.random.default_rng(seed)
    return jnp.asarray(gen.standard_normal((n, px, px, 3)), jnp.float32)


class TestStructuralParity:
    def test_calibrate_mode_matches_flax_graph(self, tiny):
        from biscuit_tpu.ops.int8_trunk import (
            calibrate_int8_trunk,
            _fold_trunk,
            _forward,
            _middle_fn,
        )
        from biscuit_tpu.models.xception import ARCHS

        model, params, batch_stats = tiny
        x = _batch(1)
        ref = model.apply({"params": params, "batch_stats": batch_stats},
                          x, train=False, method="features")
        cfg = ARCHS[model.arch]
        fw = _fold_trunk(params, batch_stats, cfg)
        mid = _middle_fn(model, params, batch_stats)
        got, sites = _forward(x, fw, None, cfg, mid)
        # bf16 casts between ops bound the agreement; structure errors
        # (padding, relu_first, BN fold) produce O(1) deviations.
        rel = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
        assert rel < 2e-2, rel
        # Every MXU conv site must have been recorded.
        n_entry = len(cfg["entry_blocks"])
        expected = 2 + 3 * (n_entry + 1) + len(cfg["exit_convs"])
        assert len(sites) == expected, sorted(sites)

    def test_calibration_scales_positive_finite(self, tiny):
        from biscuit_tpu.ops.int8_trunk import calibrate_int8_trunk

        model, params, batch_stats = tiny
        scales = calibrate_int8_trunk(model, params, batch_stats, _batch(2))
        assert all(np.isfinite(s) and s > 0 for s in scales.values())


class TestQuantizationError:
    def test_features_close_to_f32(self, tiny):
        from biscuit_tpu.ops.int8_trunk import (
            calibrate_int8_trunk,
            prepare_int8_trunk,
            trunk_features_int8,
        )

        model, params, batch_stats = tiny
        scales = calibrate_int8_trunk(model, params, batch_stats, _batch(3))
        qw = prepare_int8_trunk(model, params, batch_stats, scales)
        x = _batch(4)  # held-out batch (not the calibration batch)
        ref = model.apply({"params": params, "batch_stats": batch_stats},
                          x, train=False, method="features")
        got = trunk_features_int8(model, params, batch_stats, x, qw)
        ref_n = np.asarray(ref, np.float64)
        got_n = np.asarray(got, np.float64)
        cos = np.sum(ref_n * got_n, axis=1) / (
            np.linalg.norm(ref_n, axis=1) * np.linalg.norm(got_n, axis=1))
        assert cos.min() > 0.98, cos
        rel = (np.linalg.norm(got_n - ref_n, axis=1)
               / np.linalg.norm(ref_n, axis=1))
        assert rel.max() < 0.2, rel

    def test_quant_middle_features_close_to_f32(self, tiny):
        """quant_middle=True quantizes the middle-flow pointwise convs too;
        features must stay faithful, and the qw tree must carry the middle
        entries that trunk_features_int8 keys the in-module path on."""
        from biscuit_tpu.models.xception import ARCHS
        from biscuit_tpu.ops.int8_trunk import (
            calibrate_int8_trunk,
            prepare_int8_trunk,
            trunk_features_int8,
        )

        model, params, batch_stats = tiny
        scales = calibrate_int8_trunk(model, params, batch_stats, _batch(3),
                                      quant_middle=True)
        n_middle = ARCHS[model.arch]["middle_repeats"] * 3
        assert sum(1 for s in scales if s.startswith("middle")) == n_middle
        qw = prepare_int8_trunk(model, params, batch_stats, scales)
        assert sum(1 for n, v in qw.items()
                   if n.startswith("middle") and isinstance(v, dict)
                   and v["k"].dtype == jnp.int8) == n_middle
        x = _batch(4)
        ref = model.apply({"params": params, "batch_stats": batch_stats},
                          x, train=False, method="features")
        got = trunk_features_int8(model, params, batch_stats, x, qw)
        ref_n = np.asarray(ref, np.float64)
        got_n = np.asarray(got, np.float64)
        cos = np.sum(ref_n * got_n, axis=1) / (
            np.linalg.norm(ref_n, axis=1) * np.linalg.norm(got_n, axis=1))
        assert cos.min() > 0.98, cos
        rel = (np.linalg.norm(got_n - ref_n, axis=1)
               / np.linalg.norm(ref_n, axis=1))
        assert rel.max() < 0.25, rel

    def test_int8_kernels_are_int8(self, tiny):
        from biscuit_tpu.ops.int8_trunk import (
            calibrate_int8_trunk,
            prepare_int8_trunk,
        )

        model, params, batch_stats = tiny
        scales = calibrate_int8_trunk(model, params, batch_stats, _batch(5))
        qw = prepare_int8_trunk(model, params, batch_stats, scales)
        n_q = sum(1 for v in qw.values()
                  if isinstance(v, dict) and v["k"].dtype == jnp.int8)
        assert n_q == len(scales)
        # Depthwise kernels stay in the compute dtype (VPU path).
        assert all(v.dtype == jnp.bfloat16 for v in qw.values()
                   if not isinstance(v, dict))


class TestUQWiring:
    def test_mc_dropout_predict_int8(self, tiny):
        from biscuit_tpu.ops.int8_trunk import (
            Int8Calibrator,
            prepare_int8_trunk,
        )
        from biscuit_tpu.train.uq import mc_dropout_predict

        model, params, batch_stats = tiny
        x = _batch(6)
        # Accumulating calibration: absmax is the running max over batches
        # (order-independent union), and n_tiles tracks coverage.
        cal = Int8Calibrator(model, params, batch_stats)
        cal.update(_batch(7))
        s1 = cal.scales()
        cal.update(_batch(8) * 3.0)  # wider activations must widen scales
        s2 = cal.scales()
        assert cal.n_tiles == 8
        assert all(s2[k] >= s1[k] for k in s1)
        assert any(s2[k] > s1[k] for k in s1)
        qw = prepare_int8_trunk(model, params, batch_stats, s2)
        key = jax.random.PRNGKey(0)
        mean8, std8 = mc_dropout_predict(
            model, params, batch_stats, x, key, k=8, int8_qw=qw)
        mean, std = mc_dropout_predict(
            model, params, batch_stats, x, key, k=8)
        assert np.all(np.isfinite(mean8)) and np.all(np.isfinite(std8))
        np.testing.assert_allclose(np.asarray(mean8).sum(axis=1), 1.0,
                                   atol=1e-5)
        # Same dropout keys, perturbed features: predictions track the
        # f32 path closely at random init.
        np.testing.assert_allclose(np.asarray(mean8), np.asarray(mean),
                                   atol=0.05)

    def test_non_xception_arch_rejected(self, tiny):
        from biscuit_tpu.train.uq import mc_dropout_predict

        model, params, batch_stats = tiny
        object.__setattr__(model, "arch", "resnet18")
        try:
            with pytest.raises(ValueError, match="int8 trunk"):
                mc_dropout_predict(model, params, batch_stats, _batch(9),
                                   jax.random.PRNGKey(0), k=2,
                                   int8_qw={"dummy": 1})
        finally:
            object.__setattr__(model, "arch", "xception_tiny")
